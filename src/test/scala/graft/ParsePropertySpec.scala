package graft

import graft.etl.RedsetSchema
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based equivalence: the native ParseTableIds expression must
  * agree with the HOF chain it replaced on RANDOM inputs, not only the
  * curated CleanSpec cases. One Spark job evaluates a whole generated
  * batch (collecting per-string jobs would dominate the test).
  */
class ParsePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def idsHof(c: org.apache.spark.sql.Column) =
    filter(
      transform(split(regexp_replace(c, "[\\[\\]\\s]", ""), ","),
        s => when(s.try_cast(LongType) === RedsetSchema.NullTableId,
          lit(null).cast(LongType)).otherwise(s.try_cast(LongType))),
      x => x.isNotNull)

  // tokens biased toward the interesting space: ids, sentinel, signs,
  // overflow, junk words, weird whitespace, stray brackets, unicode digits
  private val token: Gen[String] = Gen.frequency(
    5 -> Gen.chooseNum(0L, 2000L).map(_.toString),
    2 -> Gen.const("999999"),
    1 -> Gen.oneOf("+", "-", "+7", "-7", "", " ", "  "),
    1 -> Gen.oneOf("9223372036854775807", "9223372036854775808",
      "-9223372036854775809", "00012", "1.5", "1e3", "0x1F", "null", "NULL",
      "abc", "٣", "１２"),
    1 -> Gen.listOfN(3, Gen.oneOf('0', '9', 'a', '[', ']', ' ', '\t', ',',
      '+', '-', '.')).map(_.mkString))

  private val listString: Gen[String] = for {
    toks <- Gen.listOf(token)
    open <- Gen.oneOf("", "[", "[ ", " [")
    close <- Gen.oneOf("", "]", " ]", "] ")
    sep <- Gen.oneOf(",", ", ", " ,", " , ")
  } yield open + toks.mkString(sep) + close

  test("ParseTableIds == HOF chain on 2000 random list strings") {
    val cases = Gen.listOfN(2000, listString)
      .apply(Gen.Parameters.default.withSize(40), org.scalacheck.rng.Seed(42L))
      .getOrElse(sys.error("gen failed"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(Row(_)), 8),
      StructType(Seq(StructField("s", StringType))))
    val diff = df.select(col("s"),
        graft.expr.TableIdExpressions.tableIds(col("s"), RedsetSchema.NullTableId)
          .as("native"),
        idsHof(col("s")).as("hof"))
      .filter(not(col("native") === col("hof")))
      .collect()
    assert(diff.isEmpty,
      diff.take(5).map(_.getString(0)).mkString("mismatch on: [", " | ", "]"))
  }
}
