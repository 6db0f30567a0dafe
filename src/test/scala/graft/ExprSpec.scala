package graft

import graft.fns.Fns
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native DotProductF is bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(200)((
      Array.fill(64)(rnd.nextGaussian().toFloat),
      Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = df.select((Fns.dot(col("a"), col("b")) - hof).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff == 0.0) // identical accumulation order -> identical bits
  }

  test("null inputs yield null (nullIntolerant)") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(Fns.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("graft_dot is SQL-callable after registration") {
    graft.ext.GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("v")
    try {
      val got = spark.sql("SELECT graft_dot(a, b) FROM v").as[Double].head()
      assert(got == 11.0)
    } finally spark.sql("DROP VIEW IF EXISTS v")
  }

  test("graft_table_ids is SQL-callable, default and explicit sentinel") {
    graft.ext.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_table_ids('[7, 999999, 12]')").as[Seq[Long]].head()
    assert(got == Seq(7L, 12L))
    val custom = spark.sql(
      "SELECT graft_table_ids('[7, 999999, 12]', 12L)").as[Seq[Long]].head()
    assert(custom == Seq(7L, 999999L))
  }
}
