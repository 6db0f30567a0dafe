package graft

import graft.expr.TextStatsExpressions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based equivalence for the native text-stat expressions
  * (RepStats, NGrams, CountInSet, RollingHash31, HashedTfDot,
  * QuantizeI8): each must agree with the HOF/builtin formulation it
  * replaced on RANDOM adversarial inputs — unicode (multi-byte + a
  * surrogate-pair emoji), empty tokens from doubled spaces, 0/1-token
  * docs, tiny vocabularies forcing gram collisions — not only the
  * curated ExprSpec cases. One Spark job evaluates each whole generated
  * batch (per-string jobs would dominate the test).
  */
class TextStatsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // vocabulary biased toward collisions and unicode edge cases; the empty
  // token arises naturally from doubled separators when docs join
  private val word: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("a", "b", "the", "w0", "w1", "w2"),
    2 -> Gen.oneOf("的", "é", "ß", "αβ"),
    1 -> Gen.const("😀"),
    1 -> Gen.const(""))

  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 25)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private def docsDf(seed: Long, n: Int) = {
    val params = org.scalacheck.Gen.Parameters.default
    val docs = (0 until n).flatMap(i =>
      doc.apply(params, org.scalacheck.rng.Seed(seed + i)))
    docs.toDF("text")
  }

  test("RepStats ≡ explode + double group-by on random unicode docs") {
    val df = docsDf(101L, 300).withColumn("doc_id",
      monotonically_increasing_id()).localCheckpoint(true)
    val t = split(col("text"), " ")
    val rs = TextStatsExpressions.repStats(t)
    val native = df.select(col("doc_id"),
        rs.getField("n_distinct").as("nd"), rs.getField("max_bigram").as("mb"))
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val bigrams = transform(
      sequence(lit(1), greatest(size(t) - 1, lit(1))),
      i => array_join(slice(t, i, lit(2)), " "))
    val hof = df.select(col("doc_id"),
        size(array_distinct(t)).cast("long").as("nd"), explode(bigrams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"), first("nd").as("nd"))
      .groupBy("doc_id").agg(first("nd").as("nd"), max("c").as("mb"))
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(native == hof)
  }

  test("NGrams ≡ array_distinct(transform(...)) incl. order, n in 2..6") {
    val df = docsDf(211L, 300)
    for (n <- 2 to 6) {
      val t = split(col("text"), " ")
      val native = TextStatsExpressions.ngrams(t, n)
      val hof = array_distinct(transform(
        sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
        i => array_join(slice(t, i, lit(n)), " ")))
      assert(df.filter(not(native <=> hof)).count() == 0L, s"n=$n")
    }
  }

  test("CountInSet ≡ filter-HOF count, incl. the empty-string member") {
    val df = docsDf(307L, 300)
    val t = split(col("text"), " ")
    for (words <- Seq(Seq("the", "a"), Seq("的", "😀"), Seq(""), Seq("zzz"))) {
      val native = TextStatsExpressions.countInSet(t, words)
      val hof = size(filter(t, x => x.isInCollection(words))).cast("long")
      assert(df.filter(native =!= hof).count() == 0L, s"words=$words")
    }
  }

  test("RollingHash31 ≡ per-character aggregate fold on random unicode docs") {
    val df = docsDf(401L, 300)
    val hof = aggregate(split(col("text"), ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)
    val native = TextStatsExpressions.rollingHash(col("text"))
    assert(df.filter(native =!= hof).count() == 0L)
  }

  test("HashedTfDot ≡ transform + element_at fold for several bucket counts") {
    val df = docsDf(503L, 300)
    val t = split(col("text"), " ")
    for (d <- Seq(8, 64, 1024)) {
      val w = (0 until d).map(i => ((i * 13 + 5) % 21 - 10).toDouble)
      val native = TextStatsExpressions.hashedTfDot(t, w)
      val hof = aggregate(
        transform(t, tok => element_at(typedlit(w),
          (pmod(TextStatsExpressions.rollingHash(tok), lit(d.toLong)) + 1)
            .cast("int"))),
        lit(0.0), (acc, x) => acc + x)
      assert(df.filter(native =!= hof).count() == 0L, s"d=$d")
    }
  }

  test("QuantizeI8: scale/codes invariants on random vectors") {
    val rnd = new scala.util.Random(607)
    val vecs = Seq.fill(200)(Array.fill(16)(
      (rnd.nextGaussian() * (if (rnd.nextInt(10) == 0) 1e4 else 1.0)).toFloat))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("vec_id", "embedding")
    val q = TextStatsExpressions.quantizeI8(col("embedding"))
    val rows = df.select(col("vec_id"), q.getField("scale").as("s"),
        q.getField("codes").as("c"))
      .orderBy("vec_id").collect()
    vecs.zip(rows).foreach { case ((_, v), r) =>
      val scale = r.getDouble(1)
      val codes = r.getSeq[Byte](2)
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      assert(scale == maxAbs / 127.0)
      assert(codes.length == v.length)
      // every code in range, max-magnitude element saturates to ±127
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (maxAbs > 0) {
        val iMax = v.indexWhere(x => math.abs(x.toDouble) == maxAbs)
        assert(math.abs(codes(iMax).toInt) == 127)
        // reconstruction within half a quantization step
        codes.zip(v).foreach { case (c, x) =>
          assert(math.abs(c * scale - x) <= scale / 2 + 1e-9 * maxAbs)
        }
      } else assert(codes.forall(_ == 0))
    }
  }

  test("bpeTokenCountCol: regex alternation equals direct greedy longest-match") {
    import graft.text.TextAnalysis
    // reference: per word, repeatedly consume the longest vocabulary
    // prefix at the cursor (1-char fallback) — the WordPiece greedy rule
    // the longest-first alternation is claimed to implement
    def ref(text: String): Long = text.split(" ", -1).map { w =>
      var i = 0; var n = 0L
      while (i < w.length) {
        val m = TextAnalysis.BpeVocab
          .filter(v => w.startsWith(v, i)).map(_.length)
          .maxOption.getOrElse(1)
        n += 1; i += m
      }
      n
    }.sum
    val hand = Seq(
      "the table scan",          // vocab hits: the=1, t+able=2, sc+an=2
      "", " ", "a  b",           // empties and doubled separators
      "zzz qqq",                 // pure fallback words
      "überresolution data",     // non-ASCII falls back per char
      "transformation")          // long chains of merges
    val rnd = new scala.util.Random(509)
    val words = Seq("the", "table", "scan", "window", "data", "stream",
      "transformation", "überkid", "x", "qu", "counterexample", "")
    val docs = hand ++ Seq.fill(120)(
      Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    val got = docs.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "text")
      .select(col("i"), TextAnalysis.bpeTokenCountCol(col("text")).as("n"))
      .orderBy("i").collect().map(_.getLong(1)).toSeq
    assert(got == docs.map(ref), docs.zip(got).zip(docs.map(ref))
      .filter { case ((_, g), r) => g != r }.take(3).toString)
    // the pattern never counts separators: spaces-only text is 0 tokens
    assert(ref("   ") == 0 && got(hand.indexOf(" ")) == 0L)
    // NULL text propagates NULL (the nTokensCol / DuckDB len() contract),
    // never a silent 0
    val nullRow = Seq((0, Option.empty[String])).toDF("i", "text")
      .select(TextAnalysis.bpeTokenCountCol(col("text")).as("n"))
      .collect()(0)
    assert(nullRow.isNullAt(0), nullRow.toString)
  }

  /** Independent reference for GopherRepStats, written against Scala
    * collections with sliding windows (nothing shared with the
    * expression's gram-table construction): code-point lengths,
    * (count DESC, length DESC, UTF-8-unsigned-byte ASC) top-gram
    * tie-break, and union-of-spans dup coverage.
    */
  private def refGopherRep(text: String): Seq[Long] = {
    val tokens = text.split(" ", -1).toSeq // Spark split keeps trailing empties
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    val total = tokens.map(cp).sum
    val tops = (2 to 4).map { n =>
      if (tokens.length < n) 0L
      else {
        val slices = tokens.sliding(n).toVector
        val counts = slices.groupBy(_.mkString(" "))
          .map { case (g, o) => (g, (o.size.toLong, o.head.map(cp).sum)) }
        val (_, (bc, bl)) = counts.toSeq.sortWith {
          case ((g1, (c1, l1)), (g2, (c2, l2))) =>
            if (c1 != c2) c1 > c2
            else if (l1 != l2) l1 > l2
            else java.util.Arrays.compareUnsigned(
              g1.getBytes("UTF-8"), g2.getBytes("UTF-8")) < 0
        }.head
        bc * bl
      }
    }
    val dups = (5 to 10).map { n =>
      if (tokens.length < n) 0L
      else {
        val grams = tokens.sliding(n).map(_.mkString(" ")).toVector
        val counts = grams.groupBy(identity).map { case (g, o) => (g, o.size) }
        val covered = Array.fill(tokens.length)(false)
        for (i <- grams.indices; if counts(grams(i)) >= 2;
             j <- i until i + n) covered(j) = true
        tokens.indices.collect { case i if covered(i) => cp(tokens(i)) }.sum
      }
    }
    (total +: tops) ++ dups
  }

  test("keepOneExact/Preferred ≡ the signature window they replaced") {
    // random docs with heavy dup mass (tiny vocab, short docs) — the
    // argmin-aggregate + semi-join rewrite must keep EXACTLY the rows
    // the row_number window kept, including (priority, id) tie-breaks
    import org.apache.spark.sql.expressions.Window
    val base = docsDf(307L, 300).withColumn("doc_id",
        monotonically_increasing_id())
      .withColumn("pri", pmod(col("doc_id"), lit(3)))
      .localCheckpoint(true)
    val sig = array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
    def winForm(order: Seq[org.apache.spark.sql.Column]) = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(sig).orderBy(order: _*)))
      .filter(col("__rn") === 1).drop("__rn")
      .select("doc_id").as[Long].collect().toSet
    val exactNew = graft.curation.Curation.keepOneExact(base,
        col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(exactNew == winForm(Seq(col("doc_id"))))
    val prefNew = graft.curation.Curation.keepOnePreferred(base,
        col("text"), col("doc_id"), col("pri"))
      .select("doc_id").as[Long].collect().toSet
    assert(prefNew == winForm(Seq(col("pri"), col("doc_id"))))
    // the hashed 8-byte-key twins (c16b's PB-scale path) keep the
    // identical sets — xxhash64 collisions are the only divergence
    // channel and 300 docs over a tiny vocab can't produce one
    val exactHashed = graft.curation.Curation.keepOneExact(base,
        col("text"), col("doc_id"), hashSig = true)
      .select("doc_id").as[Long].collect().toSet
    assert(exactHashed == exactNew)
    val prefHashed = graft.curation.Curation.keepOnePreferred(base,
        col("text"), col("doc_id"), col("pri"), hashSig = true)
      .select("doc_id").as[Long].collect().toSet
    assert(prefHashed == prefNew)
  }

  test("GopherRepStats ≡ sliding-window reference on random unicode docs") {
    // repetitive vocabulary (tiny alphabet) so dup-{5..10}-grams and
    // top-gram count ties actually occur; unicode words exercise the
    // code-point-vs-UTF-16 length split (😀 is a surrogate pair) and
    // the unsigned-byte tie-break order
    val df = docsDf(202L, 400).withColumn("doc_id",
      monotonically_increasing_id()).localCheckpoint(true)
    val rs = TextStatsExpressions.gopherRepStats(split(col("text"), " "))
    val fields = "total_chars" +: ((2 to 4).map(n => s"top${n}_chars") ++
      (5 to 10).map(n => s"dup${n}_chars"))
    val native = df.select(col("doc_id"), col("text"),
        struct(fields.map(f => rs.getField(f).as(f)): _*).as("s"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getStruct(2).toSeq.map(_.asInstanceOf[Long])))
    native.foreach { case (text, got) =>
      val want = refGopherRep(text)
      assert(got == want, s"doc <$text>: got $got want $want")
    }
  }
}
