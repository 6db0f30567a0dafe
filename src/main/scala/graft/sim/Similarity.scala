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

  /** Random-hyperplane LSH bucket id (nBits sign bits). Hyperplane
    * component w(i,d) is derived from xxhash64(i,d) — deterministic, no
    * stored model. Pure expressions; the bucket computation fuses into the
    * scan and the bucket column is what you'd z-order/bucket the parquet
    * layout by at scale.
    */
  def lshBucket(embedding: Column, nBits: Int): Column = {
    val dims = sequence(lit(0), size(embedding) - 1)
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(embedding, dims, (v, d) =>
          v.cast("double") *
            ((pmod(xxhash64(lit(i), d), lit(2001L)).cast("double") - 1000.0) / 1000.0)),
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
  def lshAnn(emb: DataFrame, queryVecId: Long, k: Int, nBits: Int): DataFrame = {
    val withBucket = emb.withColumn("bucket", lshBucket(col("embedding"), nBits))
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
