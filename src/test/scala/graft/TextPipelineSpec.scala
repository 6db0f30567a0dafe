package graft

import graft.text.{Perceptron, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed oracles for the round-13 published-pipeline reports:
  * Gopher rule panel (c29), CCNet perplexity terciles (c30), DSIR
  * importance weights (c31), exact ROC-AUC (c32).
  */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("gopherRules: each rule fails exactly the crafted offender") {
    val docs = Seq(
      // passes all but stopwords (no GopherStops member)
      (1L, "them cats sat onto mats"),
      // symbols only: fails mean-word-len, symbol-ratio, alpha, stopwords
      (2L, "# … ab..."),
      // all five pass
      (3L, "to be and that with"),
      // below the word-count floor; also no stopwords
      (4L, "word")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRulesReport(docs, col("text"),
        minWords = 2L, maxWords = 5L)
      .orderBy("rule").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1_word_count", 3L, 1L),
      ("2_mean_word_len", 3L, 1L),
      ("3_symbol_ratio", 3L, 1L),
      ("4_alpha_words", 3L, 1L),
      ("5_stopwords", 1L, 3L),
      ("6_all_rules", 1L, 3L)))
  }

  test("gopherRules: '...' runs, '#' and '…' chars all count as symbols") {
    // "a. .. ab" has no 3-dot run; "ab... cd" has one (3 chars)
    val docs = Seq((1L, "ab... cd"), (2L, "a. .. ab")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRulesReport(docs, col("text"),
        minWords = 1L, maxWords = 10L)
      .orderBy("rule").as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // doc 1: sym3 = 3, n = 2 -> 30 <= 6 false (fail); doc 2: sym3 = 0
    assert(got("3_symbol_ratio") == 1L)
  }

  test("gopherRules: NULL-text docs count as failing every rule") {
    val docs = Seq((1L, Option("to be and that with")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRulesReport(docs, col("text"),
        minWords = 2L, maxWords = 5L)
      .orderBy("rule").as[(String, Long, Long)].collect().toSeq
    // the NULL doc is in n_docs and fails all rows; the real doc passes
    assert(got.forall { case (_, p, f) => p == 1L && f == 1L })
  }

  test("gopherRepetitionMetrics: hand-computed suite + union-of-spans coverage") {
    val docs = Seq(
      (1L, "a b a b c"),       // top2 "a b"x2; top3/top4 tie -> gram ASC
      (2L, "a a a a a a"),     // two OVERLAPPING dup-5-gram spans
      (3L, "aa bb cc d")       // top2 all x1: length DESC picks "aa bb"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetitionMetrics(docs, col("text"),
        col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq)
    // (doc_id, total, top2, top3, top4, dup5..dup10, keep)
    assert(got(0) == Seq(1L, 5L, 4L, 3L, 4L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    // union coverage: spans 1-5 and 2-6 cover all 6 chars ONCE, never 10
    assert(got(1) == Seq(2L, 6L, 10L, 12L, 12L, 6L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(got(2) == Seq(3L, 7L, 4L, 6L, 7L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("gopherRepetitionMetrics: an unrepetitive doc passes every threshold") {
    val docs = Seq((1L, ('a' to 'z').map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetitionMetrics(docs, col("text"),
        col("doc_id")).select("keep").as[Long].collect()
    assert(got.toSeq == Seq(1L)) // top2 2/26 < 20% etc.
  }

  test("perplexityBuckets: single-token docs land in hand-ranked terciles") {
    // corpus counts: a=3, b=2, c=1 (total 6); lp(a) > lp(b) > lp(c)
    val docs = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "x", "a"),
        (4L, "x", "b"), (5L, "x", "b"), (6L, "x", "c"))
      .toDF("doc_id", "lang", "text")
    val lpA = r6(math.log(3.0 / 6)); val lpB = r6(math.log(2.0 / 6))
    val lpC = r6(math.log(1.0 / 6))
    val got = TextAnalysis.perplexityBuckets(docs, col("text"), col("doc_id"),
        col("lang"))
      .orderBy("bucket").as[(String, String, Long, Double, Double)]
      .collect().toSeq
    // desc order (d1 d2 d3 d4 d5 d6) -> ntile(3): {d1,d2} {d3,d4} {d5,d6}
    assert(got == Seq(
      ("x", "head", 2L, lpA, lpA),
      ("x", "middle", 2L, lpB, lpA),
      ("x", "tail", 2L, lpC, lpB)))
  }

  test("perplexityBuckets: terciles are assigned per language partition") {
    // identical doc multisets per lang -> identical per-lang censuses
    val docs = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "x", "b"),
        (11L, "y", "a"), (12L, "y", "a"), (13L, "y", "b"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.perplexityBuckets(docs, col("text"), col("doc_id"),
        col("lang"))
      .as[(String, String, Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4, t._5)).toSet)
      .toMap
    assert(got("x") == got("y"))
    // 3 docs per lang -> one per tercile
    assert(got("x").size == 3 && got("x").forall(_._2 == 1L))
  }

  test("dsirWeights: hand-computed smoothed log-ratios, decimal-summed") {
    def bucket(s: String, b: Int): Int =
      (s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L) % b).toInt
    // tokens: 'a' -> bucket 97%4=1 (cr=2, ct=2), 'b' -> 98%4=2 (cr=1, ct=0)
    assert(bucket("a", 4) == 1 && bucket("b", 4) == 2)
    val docs = Seq((1L, "en", "a a"), (2L, "de", "b")).toDF("doc_id", "lang", "text")
    val lpB1 = r6(math.log(3.0 / 6) - math.log(3.0 / 7)) // (ct+1)/(Nt+B) vs (cr+1)/(Nr+B)
    val lpB2 = r6(math.log(1.0 / 6) - math.log(2.0 / 7))
    val got = TextAnalysis.dsirWeights(docs, col("text"), col("doc_id"),
        col("lang") === "en", buckets = 4)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, r6(2 * lpB1)), (2L, 1L, lpB2)))
  }

  test("dsirScore against a persisted model ≡ the composed dsirWeights") {
    val docs = Seq((1L, "en", "a a b"), (2L, "de", "b c"), (3L, "en", "c a"))
      .toDF("doc_id", "lang", "text")
    val model = TextAnalysis.dsirModel(docs, col("text"),
      col("lang") === "en", buckets = 8)
    val viaModel = TextAnalysis.dsirScore(docs, model, col("text"),
      col("doc_id"), buckets = 8).orderBy("doc_id").collect().toSeq
    val composed = TextAnalysis.dsirWeights(docs, col("text"), col("doc_id"),
      col("lang") === "en", buckets = 8).orderBy("doc_id").collect().toSeq
    assert(viaModel == composed)
  }

  test("publishedFunnel: each crafted doc exits at its hand-placed stage") {
    // G: 24 distinct 4-letter words + 2 stopwords — passes the rule
    // panel (n=26, sumLen=104 in [78,260], 2 stopwords) AND the t25
    // suite (all-distinct tokens: top4 = 16*100 = 1600 <= 16*104)
    val g = (('a' to 'x').map(c => s"$c$c$c$c") ++ Seq("that", "with"))
      .mkString(" ")
    val docs = Seq(
      (1L, g, "x"),                       // survives everything -> 5_kept
      (2L, g, "x"),                       // exact dup of 1 -> 4_duplicate
      (3L, g, "x"),                       // tercile 3 of the G trio -> 3_ccnet_tail
      (4L, "word", "x"),                  // < 2 words -> 1_gopher_rules
      (5L, "to be and that with", "x")    // rules pass (sumLen 15 = n*3);
        //   top2 "that with" = 8 chars > 20% of 15 -> 2_repetition
    ).toDF("doc_id", "text", "lang")
    val got = graft.curation.Curation.publishedFunnel(docs,
        minWords = 2L, maxWords = 60L)
      .orderBy("stage").as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("1_gopher_rules", 1L, 5L, 0.2, 1L),
      ("2_repetition", 1L, 4L, 0.25, 5L),
      ("3_ccnet_tail", 1L, 3L, r6(1.0 / 3), 26L),
      ("4_duplicate", 1L, 2L, 0.5, 26L),
      ("5_kept", 1L, 1L, 1.0, 26L)))
  }

  test("dsirTopK: rank-k by (weight desc, doc_id), ties to smaller id") {
    // same corpus as the hand-computed weights test: d1 weight 2·lpB1 > 0,
    // d2 weight lpB2 < 0; add d3 as an exact-dup of d1 (tied weight)
    val docs = Seq((1L, "en", "a a"), (2L, "de", "b"), (3L, "de", "a a"))
      .toDF("doc_id", "lang", "text")
    val top2 = TextAnalysis.dsirTopK(docs, col("text"), col("doc_id"),
        col("lang") === "en", k = 2, buckets = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(top2 == Seq(1L, 3L)) // tied positives before the negative, id order
    val top1 = TextAnalysis.dsirTopK(docs, col("text"), col("doc_id"),
        col("lang") === "en", k = 1, buckets = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(top1 == Seq(1L))
  }

  test("ccnetFilter: keeps head+middle per lang, cutoff = worst kept score") {
    // corpus counts: a=3, b=2, c=1; terciles {d1,d2} {d3,d4} {d5,d6}
    val docs = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "x", "a"),
        (4L, "x", "b"), (5L, "x", "b"), (6L, "x", "c"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.ccnetFilter(docs, col("text"), col("doc_id"),
        col("lang"))
      .as[(String, Long, Long, Double)].collect().toSeq
    // kept = d1..d4 (4 docs, 4 tokens); worst kept = d4's lp(b)
    assert(got == Seq(("x", 4L, 4L, r6(math.log(2.0 / 6)))))
  }

  test("ccnetKeepIdsScalable ≡ ccnetKeepIds across bucket widths") {
    // random multi-lang corpus with a mega language (90% of docs) and
    // plenty of score ties — the quota reformulation (keep n − n÷3)
    // must reproduce the ntile(3) head+middle set exactly
    val rnd = new scala.util.Random(1531L)
    val words = Seq("a", "b", "c", "d", "e")
    val docs = (1L to 200L).map { i =>
      val lg = if (i % 10 != 0) "mega" else Seq("de", "fr")((i % 2).toInt)
      val txt = (1 to 1 + rnd.nextInt(5))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      (i, lg, txt)
    }.toDF("doc_id", "lang", "text")
    val exact = TextAnalysis.ccnetKeepIds(docs, col("text"), col("doc_id"),
      col("lang")).as[Long].collect().toSet
    for (w <- Seq(1L, 50000L, 1000000000L)) {
      val got = TextAnalysis.ccnetKeepIdsScalable(docs, col("text"),
          col("doc_id"), col("lang"), bucketWidth = w)
        .as[Long].collect().toSet
      assert(got == exact, s"mismatch at width=$w")
    }
    // boundary-split conf (level-2 tie-id sub-buckets) keeps the set
    // bit-identical — the giant width puts EVERY score in one level-1
    // bucket, the degenerate shape the split handles
    spark.conf.set("spark.graft.boundarySplit", "true")
    try {
      val split = TextAnalysis.ccnetKeepIdsScalable(docs, col("text"),
          col("doc_id"), col("lang"), bucketWidth = 1000000000L)
        .as[Long].collect().toSet
      assert(split == exact)
    } finally spark.conf.unset("spark.graft.boundarySplit")
  }

  test("rocAuc: tie-aware rank-sum on a hand-ranked score set") {
    // score = cnt under w = {0 -> 1, bias -> 0}: pos {3, 1}, neg {2, 1}
    // ascending avg ranks: 1 -> 1.5 (tied), 2 -> 3, 3 -> 4
    // R+ = 1.5 + 4 = 5.5; AUC = (11 - 2*3) / (2*2*2) = 5/8
    val feats = Seq((1L, 1, 0, 3L), (2L, 1, 0, 1L),
        (3L, -1, 0, 2L), (4L, -1, 0, 1L))
      .toDF("doc_id", "y", "dim", "cnt")
    val w = Map(-1 -> 0L, 0 -> 1L)
    val got = Perceptron.rocAuc(feats, w)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((2L, 2L, 5L, 8L, 0.625)))
  }

  test("gainsTable: hand-computed operating points on the rocAuc fixture") {
    // scores: pos {3, 1}, neg {2, 1} -> histogram s=3:(1,1) s=2:(1,0)
    // s=1:(2,1); tot_pos=2, tot_n=4
    val feats = Seq((1L, 1, 0, 3L), (2L, 1, 0, 1L),
        (3L, -1, 0, 2L), (4L, -1, 0, 1L))
      .toDF("doc_id", "y", "dim", "cnt")
    val got = Perceptron.gainsTable(feats, Map(-1 -> 0L, 0 -> 1L))
      .orderBy(col("cutoff").desc)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      (3L, 1L, 1L, 1L, 1L, 1.0, 0.5, 0.25),   // keep >= 3: pure, half recall
      (2L, 1L, 0L, 2L, 1L, 0.5, 0.5, 0.5),    // keep >= 2: dilution, no gain
      (1L, 2L, 1L, 4L, 2L, 0.5, 1.0, 1.0)))   // keep all
  }

  test("rocAuc: all-tied scores give exactly 1/2; separation gives 1") {
    val w = Map(-1 -> 0L, 0 -> 1L)
    val tied = Seq((1L, 1, 0, 2L), (2L, -1, 0, 2L))
      .toDF("doc_id", "y", "dim", "cnt")
    val t = Perceptron.rocAuc(tied, w).as[(Long, Long, Long, Long, Double)].head()
    assert(t == ((1L, 1L, 1L, 2L, 0.5)))
    val sep = Seq((1L, 1, 0, 5L), (2L, -1, 0, 1L))
      .toDF("doc_id", "y", "dim", "cnt")
    val s = Perceptron.rocAuc(sep, w).as[(Long, Long, Long, Long, Double)].head()
    assert(s == ((1L, 1L, 2L, 2L, 1.0)))
  }
}
