package graft

import graft.sim.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic synthetic corpus: 3 tight clusters in 8-d
  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian().toFloat))
    (0 until 60).map { i =>
      val c = centers(i % 3)
      val v = c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, v, i % 3)
    }.toDF("vec_id", "embedding", "label")
  }

  test("bruteForceKnn returns k nearest, same-cluster first, ordered desc") {
    val top = Similarity.bruteForceKnn(emb, queryVecId = 0L, k = 10).collect()
    assert(top.length == 10)
    val cos = top.map(_.getAs[Double]("cosine"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    // query is cluster 0; its 19 same-cluster neighbors dominate the top-10
    assert(top.forall(_.getAs[Int]("label") == 0))
  }

  test("lshAnn recall@10 vs brute force on clustered data") {
    val exact = Similarity.bruteForceKnn(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshAnn(emb, 0L, k = 10, nBits = 4, dim = 8)
      .collect().map(_.getLong(0)).toSet
    // tight clusters: same-cluster vectors land in the query's bucket (or
    // hamming-1 probes); require recall >= 0.7 deterministically (seeded)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall exact=$exact approx=$approx")
  }

  test("ivfAnn recall@10 vs brute force on clustered data") {
    val exact = Similarity.bruteForceKnn(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfAnn(emb, 0L, k = 10,
      nCentroids = 3, nProbe = 1, iters = 3)
      .collect().map(_.getLong(0)).toSet
    // 3 tight clusters, 3 centroids: the query's list holds its cluster
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=$approx")
  }

  test("langId predicts the dominant stopword language") {
    val docs = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "el perro y la casa de que en un")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es"))
  }

  test("quality metrics compute token count / avg length / stopword ratio") {
    val docs = Seq((1L, "the a bb ccc")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityMetrics(docs, col("text"), col("doc_id")).head()
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(math.abs(r.getAs[Double]("avg_token_len") - 9.0 / 4) < 1e-9)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-9)
  }
}
