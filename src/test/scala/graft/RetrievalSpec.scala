package graft

import graft.text.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat dog cat"),
    (2L, "dog fish"),
    (3L, "cat cat cat cat"),
    (4L, "bird")).toDF("doc_id", "text")

  test("invertedIndex: df/total_tf/postings hand-check") {
    val idx = Retrieval.invertedIndex(corpus, col("text"), col("doc_id"))
      .orderBy("term")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(idx === Seq(
      ("bird", 1L, 1L, "4:1"),
      ("cat", 2L, 6L, "1:2,3:4"),
      ("dog", 2L, 2L, "1:1,2:1"),
      ("fish", 1L, 1L, "2:1")))
  }

  test("bm25TopK: ranking favors rarer terms and saturating tf; ties break on doc_id") {
    // Query "cat dog": doc 1 matches both terms, docs 2 and 3 one each.
    val top = Retrieval.bm25TopK(corpus, col("text"), col("doc_id"),
        Seq(7 -> Seq("cat", "dog")), k = 10)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).take(1) === Array(1L)) // both-term doc first
    assert(top.map(_.getLong(2)).toSet === Set(1L, 2L, 3L)) // bird never matches
    assert(top.map(_.getLong(1)).toSeq === (1L to top.length.toLong))
    // Scores strictly ordered (desc) with doc_id tiebreak.
    val scores = top.map(_.getDouble(3)).toSeq
    assert(scores === scores.sorted.reverse)
    // tf saturation: doc 3 has 4x the cat tf of doc 1's 2 but scores
    // less than 2x doc 1's cat-only contribution would suggest — and in
    // particular cannot overtake the two-term doc.
    assert(top.head.getDouble(3) > top(1).getDouble(3))
  }

  test("bm25TopK: duplicate query terms collapse (bag-of-words contract)") {
    val once = Retrieval.bm25TopK(corpus, col("text"), col("doc_id"),
      Seq(0 -> Seq("cat")), k = 10).select("doc_id", "score").collect()
    val twice = Retrieval.bm25TopK(corpus, col("text"), col("doc_id"),
      Seq(0 -> Seq("cat", "cat")), k = 10).select("doc_id", "score").collect()
    assert(once.map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      twice.map(r => (r.getLong(0), r.getDouble(1))).toSet)
  }

  test("bm25ScoreWithStats reproduces bm25TopK scores bit-exactly from frozen stats") {
    import graft.text.Retrieval
    val queries = Seq(7 -> Seq("cat", "dog"), 8 -> Seq("fish", "unseen_term"))
    val stats = Retrieval.bm25CorpusStats(corpus, col("text"), col("doc_id"), queries)
    assert(stats.nDocs == 4L && stats.totalLen == 10L)
    assert(!stats.idf6.contains("unseen_term")) // absent term: no idf row
    val scored = Retrieval.bm25ScoreWithStats(corpus, col("text"), col("doc_id"),
        queries, stats)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val topk = Retrieval.bm25TopK(corpus, col("text"), col("doc_id"), queries, k = 10)
      .collect()
      .map(r => (r.getInt(0), r.getLong(2)) -> r.getDouble(3)).toMap
    topk.foreach { case ((qid, doc), s) =>
      val (s7, s8) = scored(doc)
      assert((if (qid == 7) s7 else s8) == s, s"q$qid doc$doc")
    }
    // docs matching no query term score exactly 0 in the projection form
    assert(scored(4L)._1 == 0.0 && scored(4L)._2 == 0.0)
  }

  test("rrfFuse: overlap sums both contributions, absence contributes zero") {
    val l1 = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val l2 = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
    val fused = graft.text.Retrieval.rrfFuse(Seq(l1, l2))
      .orderBy(col("rrf_nano").desc, col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val r1 = 1000000000L / 61; val r2 = 1000000000L / 62
    // doc 20: rank 2 in l1 + rank 1 in l2 — the hybrid winner
    assert(fused.toSeq == Seq((20L, r2 + r1), (10L, r1), (30L, r2)))
  }

  test("bm25TopK plan: rank filter becomes WindowGroupLimit; query frames broadcast") {
    val plan = Retrieval.bm25TopK(corpus, col("text"), col("doc_id"),
        Seq(0 -> Seq("cat", "dog")), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected per-partition top-k pushdown, got:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast query-term join, got:\n$plan")
  }
}
