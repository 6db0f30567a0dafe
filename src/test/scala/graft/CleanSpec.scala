package graft

import graft.etl.{Clean, RedsetSchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rawRow(over: Map[String, String]): Row = {
    val base = RedsetSchema.rawSchema.fieldNames.map(n => over.getOrElse(n, null)).toSeq
    Row(base: _*)
  }

  private def mkRaw(rows: Seq[Map[String, String]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(rawRow)), RedsetSchema.rawSchema)

  test("clean types, defaults, and normalizes (X6-X9)") {
    val df = Clean(mkRaw(Seq(Map(
      "instance_id" -> "7", "query_id" -> "1",
      "arrival_timestamp" -> "2024-03-01 10:00:00",
      "query_type" -> "  SELECT ", "mbytes_scanned" -> "12.0",
      "was_aborted" -> "true", "read_table_ids" -> "90,156",
      "feature_fingerprint" -> "NULL"))))
    val r = df.head()
    assert(df.schema("instance_id").dataType.typeName == "long")
    assert(r.getAs[Long]("instance_id") == 7L)
    assert(r.getAs[String]("query_type") == "select")
    assert(r.getAs[Long]("mbytes_scanned") == 12L)
    assert(r.getAs[Boolean]("was_aborted"))
    assert(!r.getAs[Boolean]("was_cached")) // null -> false
    assert(r.getAs[String]("feature_fingerprint") == "UNKNOWN") // "NULL" -> default
    assert(r.getAs[Long]("user_id") == -0L) // null numeric -> 0
    assert(r.getAs[java.sql.Timestamp]("arrival_timestamp").toString
      .startsWith("2024-03-01 10:00:00"))
  }

  test("clean drops rows with no table references (F2)") {
    val df = Clean(mkRaw(Seq(
      Map("query_id" -> "1", "read_table_ids" -> "90"),
      Map("query_id" -> "2", "read_table_ids" -> "[]", "write_table_ids" -> "[]"),
      Map("query_id" -> "3")))) // both null
    assert(df.select("query_id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("unparseable timestamp coerces to epoch (X7)") {
    val df = Clean(mkRaw(Seq(Map(
      "query_id" -> "1", "read_table_ids" -> "5",
      "arrival_timestamp" -> "not-a-time"))))
    assert(df.head().getAs[java.sql.Timestamp]("arrival_timestamp").getTime == 0L)
  }

  test("flatten explodes id lists and nulls the 999999 sentinel (X10/F8)") {
    val df = Clean(mkRaw(Seq(
      Map("query_id" -> "1", "instance_id" -> "1",
        "arrival_timestamp" -> "2024-03-01 00:00:00", "query_type" -> "select",
        "read_table_ids" -> "90,156,999999", "write_table_ids" -> "[]"))))
    val flat = Clean.flatten(df)
    val reads = flat.select("read_table_id").collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    assert(reads.toSet == Set(90L, 156L)) // sentinel removed, not kept as null row beyond explode_outer
    // write side had no ids -> write_table_id is null but rows survive
    assert(flat.count() == 2)
    assert(flat.filter(col("write_table_id").isNull).count() == 2)
  }

  test("native ParseTableIds ≡ the HOF parse chain (X10 de-HOF)") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.LongType
    // the formulation ParseTableIds replaced, kept here as the spec twin
    def idsHof(c: Column): Column =
      filter(
        transform(split(regexp_replace(c, "[\\[\\]\\s]", ""), ","),
          s => when(s.try_cast(LongType) === RedsetSchema.NullTableId,
            lit(null).cast(LongType)).otherwise(s.try_cast(LongType))),
        x => x.isNotNull)
    val cases = Seq(
      "[1, 104]", "[]", "", "UNKNOWN", "[999999]", "[999999, 7]",
      "1,2,3", "[ 12 ,  999999 , 0 ]", "1 2", "a,1,b", "[1,,2]", "1,",
      ",1", "+5,-5", "12.7", "9223372036854775807", "9223372036854775808",
      "-9223372036854775808", "--3", "+", "[[7]]", "٥", "  ", "[null]",
      "0x1F", "1\t2,3\n4", "999999999999999999999999,8")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    val both = df.select(
      graft.expr.TableIdExpressions.tableIds(col("s"), RedsetSchema.NullTableId).as("native"),
      idsHof(col("s")).as("hof")).collect()
    both.zip(cases).foreach { case (r, in) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"input '$in'")
    }
    // null propagates like the HOF chain (null string → null array)
    val nullRow = spark.sql("SELECT CAST(NULL AS STRING) AS s")
      .select(graft.expr.TableIdExpressions.tableIds(col("s"), 999999L).as("n"))
      .head()
    assert(nullRow.isNullAt(0))
  }

  test("clean is idempotent") {
    val once = Clean(mkRaw(Seq(Map(
      "query_id" -> "1", "read_table_ids" -> "90,156",
      "arrival_timestamp" -> "2024-03-01 10:00:00", "query_type" -> "Select"))))
    // re-cleaning an already-clean frame (stringified back) changes nothing
    val again = Clean(once.select(once.columns.map(c => col(c).cast("string").as(c)): _*))
    assert(once.collect().toSeq == again.collect().toSeq)
  }
}
