package graft

import graft.curation.Curation
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based bit-identity for the two-phase quota/prefix-sum
  * machinery: RANDOM key skews, sort-value distributions (modal,
  * negative, NULL-bearing), tie-id spans, bucket widths and the
  * boundary-split switch must all reproduce the window forms exactly —
  * the hand-written CurationSpec cases cover the designed-for shapes,
  * this covers the ones nobody designed for. One generated corpus per
  * scenario; each equivalence is a whole-frame set compare.
  */
class QuotaPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a generated corpus row: (doc_id, key, n_tokens, quality-option)
  private type Doc = (Long, String, Long, Option[Long])

  private def corpus(seed: Long): Seq[Doc] = {
    val p = Gen.Parameters.default.withSize(60)
    def run[A](g: Gen[A], s: Long): A =
      g.apply(p, org.scalacheck.rng.Seed(s)).getOrElse(sys.error("gen failed"))
    val nKeys = run(Gen.chooseNum(1, 6), seed)
    val skewed = run(Gen.prob(0.5), seed + 1)
    val modal = run(Gen.prob(0.5), seed + 2)
    val sparseIds = run(Gen.prob(0.4), seed + 3)
    val nulls = run(Gen.prob(0.5), seed + 4)
    val rows = run(Gen.chooseNum(50, 400), seed + 5)
    (1 to rows).map { i =>
      val keyIdx =
        if (skewed && i % 10 != 0) 0
        else run(Gen.chooseNum(0, nKeys - 1), seed + 100 + i)
      val q: Option[Long] =
        if (nulls && i % 11 == 0) None
        else if (modal && i % 10 != 3) Some(7L)
        else Some(run(Gen.chooseNum(-30L, 30L), seed + 200 + i))
      val id =
        if (sparseIds) i.toLong * 982451653L
        else i.toLong
      (id, s"k$keyIdx", 1L + run(Gen.chooseNum(0L, 9L), seed + 300 + i), q)
    }
  }

  test("quotaPerKeyScalable ≡ window form on 12 random corpora × widths × split") {
    for (seed <- 1L to 12L) {
      val df = corpus(seed * 977L)
        .toDF("doc_id", "key", "n_tokens", "quality")
        .localCheckpoint(true)
      val n = (seed % 5).toInt * 13 // 0, 13, 26, 39, 52
      val exact = Curation.quotaPerKey(df, col("key"), n,
          Seq(col("quality").asc, col("doc_id")))
        .select("doc_id").as[Long].collect().toSet
      for (w <- Seq(1L, 8L); split <- Seq(false, true)) {
        val got = Curation.quotaPerKeyScalable(df, col("key"), n,
            col("quality"), col("doc_id"), bucketWidth = w,
            boundarySplit = Some(split))
          .select("doc_id").as[Long].collect().toSet
        assert(got == exact, s"seed=$seed n=$n w=$w split=$split")
      }
      org.apache.spark.sql.graftbridge.Bridge.release(df)
    }
  }

  test("tokenBudgetMixScalable ≡ window form on 12 random corpora × widths × split") {
    for (seed <- 1L to 12L) {
      val df = corpus(seed * 1259L)
        .toDF("doc_id", "key", "n_tokens", "quality")
        .localCheckpoint(true)
      val budget = Seq(0L, 25L, 120L, 1000000L)((seed % 4).toInt)
      val exact = Curation.tokenBudgetMix(df, col("n_tokens"), col("key"),
          Seq(col("quality").asc, col("doc_id")), budget)
        .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSet
      for (w <- Seq(1L, 8L); split <- Seq(false, true)) {
        val got = Curation.tokenBudgetMixScalable(df, col("n_tokens"),
            col("key"), col("quality"), col("doc_id"), budget,
            bucketWidth = w, boundarySplit = Some(split))
          .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSet
        assert(got == exact, s"seed=$seed budget=$budget w=$w split=$split")
      }
      org.apache.spark.sql.graftbridge.Bridge.release(df)
    }
  }
}
