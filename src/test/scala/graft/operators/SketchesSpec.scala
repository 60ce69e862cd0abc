package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("HLL estimate lands within 4 standard errors of a known cardinality") {
    val n = 20000
    val df = (1 to n).map(i => s"value_$i").toDF("v")
    val est = Sketches.hllDistinct(df, col("v")).collect()(0).getDouble(0)
    val se = 1.04 / math.sqrt(256.0) // b=8
    assert(math.abs(est - n) / n < 4 * se, s"estimate $est for true $n")
  }

  test("HLL small-range regime: exact-ish via linear counting, and duplicates don't move it") {
    val df = (1 to 50).map(i => s"k$i").toDF("v")
    val est = Sketches.hllDistinct(df, col("v")).collect()(0).getDouble(0)
    assert(math.abs(est - 50) < 6, s"linear-counting estimate $est for true 50")
    // registers are max-merged: multiplicity is invisible to the sketch
    val dup = df.unionAll(df).unionAll(df)
    val est2 = Sketches.hllDistinct(dup, col("v")).collect()(0).getDouble(0)
    assert(est2 == est)
  }

  test("HLL registers max-merge across corpus slices") {
    val a = (1 to 3000).map(i => s"x$i").toDF("v")
    val b = (2000 to 5000).map(i => s"x$i").toDF("v") // overlaps a
    val whole = Sketches.hllDistinct(a.unionAll(b), col("v")).collect()(0).getDouble(0)
    val merged = Sketches.hllEstimate(
      Sketches.hllRegisters(a, col("v")).unionAll(Sketches.hllRegisters(b, col("v")))
        .groupBy("bucket").agg(max(col("register")).cast("int").as("register")))
      .collect()(0).getDouble(0)
    assert(merged == whole, s"merged $merged != whole-corpus $whole")
  }

  test("HLL of empty input estimates 0") {
    val empty = Seq.empty[String].toDF("v")
    assert(Sketches.hllDistinct(empty, col("v")).collect()(0).getDouble(0) == 0.0)
  }

  test("CMS never underestimates and is exact for isolated heavy keys") {
    val skewed = (1 to 5000).map(_ => "hot") ++ (1 to 2000).map(i => s"cold_$i")
    val df = skewed.toDF("v")
    val cms = Sketches.cmsTable(df, col("v"))
    val items = df.distinct()
    val est = Sketches.cmsLookup(cms, items, "v")
      .join(df.groupBy("v").agg(count(lit(1)).as("true_cnt")), Seq("v"))
      .select(col("v"), col("est_count"), col("true_cnt")).collect()
    est.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"CMS underestimated ${r.getString(0)}")
    }
    val hot = est.find(_.getString(0) == "hot").get
    // 2000 cold keys spread over 1024 cells add ~2 to any counter; the
    // hot estimate must stay within that colliding mass
    assert(hot.getLong(1) - hot.getLong(2) <= 50, s"hot overshoot ${hot.getLong(1)}")
  }

  test("CMS tables sum-merge across slices") {
    val a = (1 to 300).map(i => s"k${i % 20}").toDF("v")
    val b = (1 to 500).map(i => s"k${i % 30}").toDF("v")
    val whole = Sketches.cmsLookup(
      Sketches.cmsTable(a.unionAll(b), col("v")), a.unionAll(b).distinct(), "v")
    val merged = Sketches.cmsLookup(
      Sketches.cmsTable(a, col("v")).unionAll(Sketches.cmsTable(b, col("v")))
        .groupBy("row", "cell").agg(sum(col("cnt")).as("cnt")),
      a.unionAll(b).distinct(), "v")
    assert(merged.orderBy("v").collect().toSeq == whole.orderBy("v").collect().toSeq)
  }
}
