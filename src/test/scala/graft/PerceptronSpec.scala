package graft

import graft.text.Perceptron
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PerceptronSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("features: rolling-hash dims, multiplicity counts, bias row per doc") {
    def refDim(s: String, dims: Int): Int =
      (s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L) % dims).toInt
    val docs = Seq((1L, "en", "Ab ab zz zz zz"), (2L, "de", ""))
      .toDF("doc_id", "lang", "text")
    val got = Perceptron.features(docs, col("text"), col("doc_id"),
        when(col("lang") === "en", lit(1)).otherwise(lit(-1)), dims = 8)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, refDim("ab", 8), 2L),
      (1L, 1, refDim("zz", 8), 3L),
      (1L, 1, -1, 1L),
      // word-less doc still gets its bias row — it stays scoreable
      (2L, -1, -1, 1L)))
  }

  test("train: hand-run batch perceptron on a separable 2-dim problem") {
    val feats = Seq(
      (1L, 1, 0, 2L), (1L, 1, -1, 1L),   // doc 1: x=[2,0], y=+1
      (2L, -1, 1, 3L), (2L, -1, -1, 1L)  // doc 2: x=[0,3], y=-1
    ).toDF("doc_id", "y", "dim", "cnt")
    val (w, trace) = Perceptron.train(feats, k = 2, dims = 2)
    // iter 1: all scores 0 -> both misclassified (margin <= 0 counts);
    // update: dim0 += +1*2, dim1 += -1*3, bias += (+1) + (-1) = 0.
    // iter 2: margins 4 and 9 -> zero mistakes, weights unchanged.
    assert(trace == Seq((1, 2L), (2, 0L)))
    assert(w == Map(-1 -> 0L, 0 -> 2L, 1 -> -3L))
    val acc = Perceptron.accuracyReport(feats, w)
      .as[(Int, Long, Long)].collect().toSet
    assert(acc == Set((1, 1L, 1L), (-1, 1L, 1L)))
  }

  test("train: pocket keeps the earliest fewest-mistakes candidate") {
    // d1: x=[2], y=+1; d2: x=[1], y=-1.
    // it1 evaluates w0=0: 2 mistakes; update (both docs): dim0 += 2-1=+1,
    //   bias += 1-1=0 -> w1={0:1, b:0}.
    // it2 evaluates w1: d1 margin 2 ok, d2 margin 1 -> 1 mistake; pocket
    //   = w1. update over {d2}: dim0 -= 1, bias -= 1 -> w2={0:0, b:-1}.
    // it3 evaluates w2: d1 margin -1 mistake, d2 margin -1 correct -> 1
    //   mistake; TIE with the pocket -> earliest wins, pocket stays w1.
    val feats = Seq(
      (1L, 1, 0, 2L), (1L, 1, -1, 1L),
      (2L, -1, 0, 1L), (2L, -1, -1, 1L)
    ).toDF("doc_id", "y", "dim", "cnt")
    val (w, trace) = Perceptron.train(feats, k = 3, dims = 1)
    assert(trace == Seq((1, 2L), (2, 1L), (3, 1L)))
    assert(w == Map(-1 -> 0L, 0 -> 1L))
  }

  test("train: zero-weight degenerate stays all-mistakes but converges in form") {
    // single doc with only a bias feature and y=-1: iter 1 misclassifies
    // (0 margin), bias -> -1, iter 2 margin = (-1)(-1) = 1 > 0 correct
    val feats = Seq((1L, -1, -1, 1L)).toDF("doc_id", "y", "dim", "cnt")
    val (w, trace) = Perceptron.train(feats, k = 2, dims = 2)
    assert(trace == Seq((1, 1L), (2, 0L)))
    assert(w(-1) == -1L)
  }
}
