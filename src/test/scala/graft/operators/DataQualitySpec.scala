package graft.operators

import graft.SparkTestBase

class DataQualitySpec extends SparkTestBase {
  import spark.implicits._
  import DataQuality._

  private def rep(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.as[(String, Long, Long, Boolean)].collect()
      .map { case (n, v, t, p) => n -> ((v, t, p)) }.toMap

  test("report: hand-computed violations across all scan check kinds") {
    val df = Seq(
      (Some(1L), Some(5.0), Some("A")),
      (Some(2L), Some(50.0), Some("B")),   // range violation
      (Some(2L), None, Some("C")),         // dup key, null range col, bad accepted
      (None, Some(-1.0), Some("A"))        // null key, range violation
    ).toDF("k", "x", "cat")
    val r = rep(report(df, Seq(
      NotNull("k"), Unique("k"), InRange("x", 0.0, 10.0), Accepted("cat", Seq("A", "B")))))
    assert(r("not_null:k") == ((1L, 4L, false)))
    assert(r("unique:k") == ((1L, 3L, false)))      // 3 non-null keys, 2 distinct
    assert(r("in_range:x") == ((2L, 4L, false)))    // 50 and −1; NULL ignored
    assert(r("accepted:cat") == ((1L, 4L, false)))  // C
  }

  test("report: ppm tolerance passes a small null fraction, 0 ppm fails it") {
    val df = (1 to 999).map(i => Some(i)).:+(None).toDF("k")
    assert(rep(report(df, Seq(NotNull("k", maxNullFracPpm = 2000))))
      .apply("not_null:k")._3)
    assert(!rep(report(df, Seq(NotNull("k"))))("not_null:k")._3)
  }

  test("referential: orphans counted, clean FK passes") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = rep(referential(fact, "fk", dim, "pk", "fk:test"))
    assert(r("fk:test") == ((1L, 3L, false))) // 9 orphaned; NULL not counted
    val clean = rep(referential(Seq(1L, 2L).toDF("fk"), "fk", dim, "pk", "fk:ok"))
    assert(clean("fk:ok") == ((0L, 2L, true)))
  }
}
