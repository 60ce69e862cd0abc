package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("pruned top-k equals the full window top-k") {
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(2000)(i => (i % 17L, rnd.shuffle((1 to 100000).toList).head.toDouble, s"p$i"))
      .distinctBy(r => (r._1, r._2)) // unique ord per key → unambiguous top-k
    val df = data.toDF("k", "ord", "payload").repartition(8)

    val got = TopK.perKey(df, "k", "ord", k = 5)
      .select("k", "ord").as[(Long, Double)].collect().toSet

    val w = Window.partitionBy(col("k")).orderBy(col("ord").desc)
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("k", "ord").as[(Long, Double)].collect().toSet

    assert(got == want)
  }

  test("ties broken deterministically by the tieBreak columns") {
    val df = Seq((1L, 10.0, "b"), (1L, 10.0, "a"), (1L, 10.0, "c"), (1L, 9.0, "z"))
      .toDF("k", "ord", "name").repartition(3)
    val got = TopK.perKey(df, "k", "ord", k = 2, tieBreak = Seq("name"))
      .select("name").as[String].collect().toSet
    assert(got == Set("a", "b"))
  }

  test("numeric tie-breaks compare typed, not lexicographically") {
    // All rows tie on ord within one key; the window keeps the k smallest
    // tie values NUMERICALLY (asc). A lexicographic prune would keep
    // id=10 ("10" < "9") and evict id=9 when >k tied rows share a
    // partition — coalesce(1) forces exactly that layout.
    val df = Seq.tabulate(12)(i => (1L, 5.0, (i + 3).toLong)) // ids 3..14
      .toDF("k", "ord", "id").coalesce(1)
    val got = TopK.perKey(df, "k", "ord", k = 2, tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 4L))
  }

  test("mixed-type tie-break columns (string, date) match the window pass") {
    val d = java.sql.Date.valueOf(_: String)
    val df = Seq(
      (1L, 7.0, "x", d("2024-01-02")), (1L, 7.0, "x", d("2024-01-01")),
      (1L, 7.0, "a", d("2024-06-01")), (1L, 7.0, "x", d("2024-01-03")))
      .toDF("k", "ord", "s", "dt").coalesce(1)
    val got = TopK.perKey(df, "k", "ord", k = 2, tieBreak = Seq("s", "dt"))
      .select("s", "dt").as[(String, java.sql.Date)].collect().toSet
    assert(got == Set(("a", d("2024-06-01")), ("x", d("2024-01-01"))))
  }
}
