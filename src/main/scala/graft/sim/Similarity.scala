package graft.sim

import graft.fns.Fns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * `bruteForceKnn` is the exact baseline: broadcast the query vector, one
  * codegen'd projection computing cosine, then TakeOrderedAndProject for
  * the top-k — a single scan, no shuffle of the corpus. At 100 TB this is
  * still the right *verification* path; the serving path is `lshAnn`,
  * which prunes the scan to LSH buckets (random-hyperplane signs) so each
  * query touches corpus_size / 2^nBits candidates in expectation.
  */
object Similarity {

  /** Exact top-k by cosine against the vector with id `queryVecId`.
    * Ordering is on the 6-decimal-rounded cosine with vec_id tie-break —
    * total and engine-portable (QDef determinism contract).
    */
  def bruteForceKnn(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    emb.where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(Fns.cosineSim(col("embedding"), col("qv")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  // Deterministic hyperplane weights from splitmix64 — computed once at
  // plan time and embedded as array literals, so the per-row work is just
  // nBits fused dot products (no per-row-per-dim hashing).
  private def hyperplanes(nBits: Int, dim: Int): Seq[Seq[Double]] = {
    def splitmix(x0: Long): Long = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0 until nBits).map { i =>
      (0 until dim).map { d =>
        (math.floorMod(splitmix(i.toLong * 1000003L + d), 2001L) - 1000L) / 1000.0
      }
    }
  }

  /** Random-hyperplane LSH bucket id (nBits sign bits). Deterministic, no
    * stored model. Pure expressions; the bucket computation fuses into the
    * scan and the bucket column is what you'd z-order/bucket the parquet
    * layout by at scale.
    */
  def lshBucket(embedding: Column, nBits: Int, dim: Int): Column = {
    val bits = hyperplanes(nBits, dim).zipWithIndex.map { case (w, i) =>
      val proj = aggregate(
        zip_with(embedding, typedlit(w), (v, ww) => v.cast("double") * ww),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates are vectors whose LSH bucket is within
    * Hamming distance 1 of the query's bucket (multi-probe over nBits+1
    * buckets), ranked by exact cosine. Expected candidate set:
    * corpus · (nBits+1) / 2^nBits.
    */
  def lshAnn(emb: DataFrame, queryVecId: Long, k: Int, nBits: Int,
             dim: Int = 64): DataFrame = {
    val withBucket = emb.withColumn("bucket", lshBucket(col("embedding"), nBits, dim))
    val q = withBucket.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"), col("bucket").as("q_bucket"))
    withBucket.where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .where(bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= 1)
      .select(col("vec_id"), col("label"),
        round(Fns.cosineSim(col("embedding"), col("qv")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
