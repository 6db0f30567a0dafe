package graft

import graft.dedup.Dedup
import graft.etl.{Clean, RedsetSchema}
import graft.sim.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior: empty frames, empty edge sets, k > corpus —
  * the states a production pipeline hits on day one.
  */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Clean on an empty frame keeps schema, zero rows") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], RedsetSchema.rawSchema)
    val c = Clean(empty)
    assert(c.count() == 0)
    assert(c.schema.fieldNames.toSeq == RedsetSchema.schema.fieldNames.toSeq)
    assert(Clean.flatten(c).count() == 0)
  }

  test("keepOnePerComponent with no edges keeps every doc") {
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val noEdges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.keepOnePerComponent(docs, col("doc_id"), noEdges).count() == 2)
  }

  test("knn with k larger than the corpus returns the whole corpus ranked") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.bruteForceKnn(emb, 0L, k = 10).collect()
    assert(r.length == 2)
    assert(r.head.getLong(0) == 1L) // nearest first
  }

  test("jaccard ops tolerate single-token and empty-ish docs") {
    val docs = Seq((1L, "a", "s"), (2L, "a", "s"), (3L, "", "s"))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.jaccardPairs(docs, col("text"), col("doc_id"), "source", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    val prefix = Dedup.jaccardPairsPrefix(docs, col("text"), col("doc_id"), "source", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix == pairs)
  }

  test("flatten plan stays lambda-free (codegen guard)") {
    // ParseTableIds replaced the transform/filter HOF chain; a lambda
    // reappearing in the flatten path would silently drop the whole
    // projection out of whole-stage codegen (the round-4 2.5-5x cliff)
    val raw = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], RedsetSchema.rawSchema)
    val plan = Clean.flatten(Clean(raw)).queryExecution.executedPlan.toString
    assert(plan.contains("graft_table_ids"), plan)
    assert(!plan.contains("lambdafunction"), plan)
    assert(!plan.contains("transform("), plan)
  }

  test("round-6 ops tolerate degenerate docs: single token, empty text, adjacent PII") {
    import graft.curation.Curation
    import graft.text.TextAnalysis
    val docs = Seq((1L, "a", "s"), (2L, "", "s")).toDF("doc_id", "text", "source")
    // single-line (no \n) corpus: boilerplate removal is the identity when
    // under minDocs, keeps the doc row even for empty text
    val bl = Curation.stripBoilerplateLines(docs, col("text"), col("doc_id"), 5)
      .orderBy("doc_id").collect()
    assert(bl.length == 2 && bl(0).getString(1) == "a" && bl(1).getString(1) == "")
    // unigramLogProb on a 1-token corpus: p=1 per token -> logprob 0 ... and
    // the empty-text doc contributes one "" token, still grouped
    val lp = TextAnalysis.unigramLogProb(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(lp.length == 2)
    // adjacent PII with no separators between classes
    val pii = TextAnalysis.redactPii(
      Seq((1L, "a@b.co +12345678 1.2.3.4")).toDF("doc_id", "text"),
      col("text"), col("doc_id")).head()
    assert(pii.getString(1) == "<EMAIL> <PHONE> <IP>")
    // containment: single-token inner docs are excluded by the >= ngram rule
    val cp = Dedup.containmentPairs(
      Seq((1L, "a", "s"), (2L, "a b c d", "s")).toDF("doc_id", "text", "source"),
      col("text"), col("doc_id"), "source").count()
    assert(cp == 0L)
    // temperature thresholds on one key: keeps everything
    val thr = Curation.temperatureThresholds(docs, col("source")).head()
    assert(thr.getLong(2) == 1000000L)
  }

  test("round-7 ops tolerate degenerate inputs") {
    import graft.ops.{Intervals, PageRank}
    import graft.text.TextAnalysis

    // PageRank: empty edge frame → no nodes, empty result (not a crash)
    val noEdges = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(PageRank.ranks(noEdges, iters = 2).count() == 0)

    // PageRank: self-loop-only graph keeps all mass on the node
    val selfLoop = Seq(("a", "a", 1L)).toDF("src", "dst", "w")
    val r = PageRank.ranks(selfLoop, iters = 3).collect()
    assert(r.length == 1 && r.head.getLong(1) > 999999990000L)

    // overlapJoin: empty right side → empty output with the overlap col
    val left = Seq((1L, 10L,
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
      Option.empty[java.sql.Timestamp])).toDF("key", "iv_id", "a", "b")
    val noRight = Seq.empty[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("key", "sid", "s", "t")
    val ov = Intervals.overlapJoin(left, noRight, Seq("key"), "a", "b", "s", "t")
    assert(ov.count() == 0 && ov.columns.contains("overlap_ms"))

    // PMI: a corpus where nothing clears minCount → empty, not a crash
    val sparse = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    assert(TextAnalysis.pmiCollocations(sparse, col("text"), col("doc_id"),
      minCount = 5, k = 10).count() == 0)

    // readability: empty string tokenizes to one empty word (w=1, sy=0)
    // and must yield a finite negative grade, not NULL or a crash
    val deg = Seq((1L, ""), (2L, "xyz qqq")).toDF("doc_id", "text")
    val g = TextAnalysis.readabilityGrade(deg, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(g(1L) < 0) // no words, no syllables → far below grade 0
    assert(g(2L) < 0) // vowel-free tokens → syllable count 0

    // MMR: poolK larger than the corpus ranks everything; k capped by pool
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Similarity.mmrRerank(emb, queryVecId = 0L, poolK = 1000, k = 3)
      .collect()
    assert(m.length == 3 && m.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("temperatureSample: NULL keys are a sampled group, not a silent drop") {
    import graft.curation.Curation
    // 8 null-key docs + 2 'b' docs: n_min = 2, so the null group's
    // threshold is sqrt(2/8)·1e6 = 500000 — null-key docs must flow
    // through the null-safe threshold join and be sampled at that rate,
    // never dropped wholesale (and never treated as threshold-free).
    val df = (1 to 8).map(i => (Option.empty[String], s"null doc number $i")) ++
      Seq((Some("b"), "doc b one"), (Some("b"), "doc b two"))
    val docs = df.toDF("src", "text")
    val thr = Curation.temperatureThresholds(docs, col("src"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(thr(None) == 500000L && thr(Some("b")) == 1000000L)
    val kept = Curation.temperatureSample(docs, col("src"), col("text"))
    // both 'b' docs always survive (threshold = mod); the null group keeps
    // only docs whose content hash lands under 500000 — a strict subset
    // decided per doc, and repeat runs agree (deterministic)
    val k1 = kept.collect().map(r => (Option(r.getString(0)), r.getString(1))).toSet
    assert(k1.count(_._1.contains("b")) == 2)
    assert(k1.count(_._1.isEmpty) < 8)
    val k2 = Curation.temperatureSample(docs, col("src"), col("text"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1))).toSet
    assert(k1 == k2)
  }

  test("semanticDedup: embedding length != dim fails fast, not mis-buckets") {
    val emb = Seq((0L, Array(1.0f, 0.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Similarity.semanticDedup(emb, nBits = 4, threshold = 0.9, dim = 8).count()
    }
    assert(e.getMessage.contains("semanticDedup"), e.getMessage)
    // matching dim works on the same frame
    assert(Similarity.semanticDedup(emb, nBits = 4, threshold = 0.9, dim = 3)
      .count() >= 1)
  }

  test("keepOneNearDup and the cluster histogram handle an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.keepOneNearDup(empty, col("text"), col("doc_id"), 0.9)
      .count() == 0)
    assert(Dedup.nearDupClusterHistogram(empty, col("text"), col("doc_id"), 0.9)
      .count() == 0)
  }

  test("lshDedupAgreement on an all-singleton corpus guards zero denominators") {
    // every doc unique and dissimilar: no exact pairs, no LSH pairs —
    // both ratios must come out 0.0 (guarded), not NULL/NaN
    val docs = (0L until 6L).map(i =>
      (i, (0 until 8).map(j => s"u${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val r = Dedup.lshDedupAgreement(docs, col("text"), col("doc_id"),
      threshold = 0.9, numHashes = 8, bands = 2).head()
    assert(r.getAs[Long]("n_docs") == 6L)
    assert(r.getAs[Long]("pairs_exact") == 0L)
    assert(r.getAs[Long]("pairs_lsh") == 0L)
    assert(r.getAs[Double]("pair_precision") == 0.0)
    assert(r.getAs[Double]("pair_recall") == 0.0)
  }

  test("lshDedupAgreement is perfect when LSH and exact clusterings coincide") {
    // two exact-dup families: identical token sets collide in every band
    // AND are jaccard-1.0 pairs, so both clusterings agree exactly
    val fam = (f: Int) => (0 until 10).map(j => s"f${f}_$j").mkString(" ")
    val docs = Seq((1L, fam(0)), (2L, fam(0)), (3L, fam(1)), (4L, fam(1)),
      (5L, fam(1))).toDF("doc_id", "text")
    val r = Dedup.lshDedupAgreement(docs, col("text"), col("doc_id"),
      threshold = 0.9, numHashes = 8, bands = 2).head()
    assert(r.getAs[Long]("pairs_exact") == 4L)   // C(2,2)+C(3,2) = 1+3
    assert(r.getAs[Long]("pairs_lsh") == 4L)
    assert(r.getAs[Long]("pairs_both") == 4L)
    assert(r.getAs[Double]("pair_precision") == 1.0)
    assert(r.getAs[Double]("pair_recall") == 1.0)
  }

  test("q1 plan pushes the shipdate filter and prunes columns (guard)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!scan.contains("l_comment"), "projection must prune unused columns")
  }

  test("version-management ops on degenerate inputs") {
    import graft.curation.Curation
    val a = Seq((1L, Some("x y")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Option[String])].collect().toSet
    // a changelog removing an id A never had is a harmless no-op
    val ghost = Seq((99L, "removed", None: Option[String]))
      .toDF("doc_id", "status", "text")
    assert(asSet(Curation.applyCorpusDiff(a, ghost)) == asSet(a))
    // compaction with FULL-census inputs (keepUnchanged upstream) equals
    // compaction of the thin logs — unchanged rows are algebra-neutral
    val b = Seq((1L, Some("x y CHANGED"))).toDF("doc_id", "text")
    def cl(x: org.apache.spark.sql.DataFrame,
           y: org.apache.spark.sql.DataFrame) =
      Curation.corpusDiff(x, y).join(y, Seq("doc_id"), "left")
    val thin = Curation.compactChangelog(cl(a, b), cl(b, b))
      .as[(Long, String, Option[String])].collect().toSet
    val census = Curation.compactChangelog(
      Curation.compactChangelog(cl(a, b), cl(b, b).limit(0),
        keepUnchanged = true),
      cl(b, b), keepUnchanged = false)
      .as[(Long, String, Option[String])].collect().toSet
    assert(thin == census)
    // first publish: refreshAudit against an EMPTY corpus — everything
    // added, nothing can be a dup of existing content
    val audit = Curation.refreshAudit(a.limit(0), a)
      .as[(String, Long)].collect().toMap
    assert(audit("added") == 2L && audit("added_dup_of_existing") == 0L)
    // epochs = 1 is a single deterministic permutation
    assert(Curation.epochShuffle(a, $"doc_id", epochs = 1).count() == 2L)
    // full diff of a frame against itself is all-unchanged with equal images
    val self = Curation.corpusDiffFull(a, a)
      .as[(Long, String, Option[String], Option[String])].collect()
    assert(self.forall(r => r._2 == "unchanged" && r._3 == r._4))
  }
}
