package graft

import graft.ops.Profile
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("columnProfile: null handling, exact distincts, string-rendered min/max") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "tag")
    val got = Profile.columnProfile(df, Seq("id", "tag"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // count(col) skips nulls; count(DISTINCT col) skips nulls too.
    assert(got("id") == ("id", 4L, 4L, "1", "4"))
    assert(got("tag") == ("tag", 3L, 2L, "a", "b"))
  }
}
