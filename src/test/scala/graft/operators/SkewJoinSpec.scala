package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key (1) with many rows, plus cold keys
    val big = ((1 to 500).map(i => (1L, s"hot$i")) ++ Seq((2L, "cold"), (3L, "cold3")))
      .toDF("k", "payload")
    val small = Seq((1L, "dim1"), (2L, "dim2"), (4L, "dim4")).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).select("k", "payload", "dim")
      .as[(Long, String, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "dim").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 501)
  }

  test("salted join spreads the hot key over multiple salts") {
    val big = (1 to 100).map(i => (1L, i)).toDF("k", "v")
    val salts = big.withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1)
  }

  test("salted collect_list gathers all values per key") {
    val df = ((1 to 50).map(i => (1L, s"v$i")) ++ Seq((2L, "x"))).toDF("k", "v")
    val got = SkewJoin.saltedCollectList(df, "k", "v", saltFactor = 4)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).toSet == (1 to 50).map(i => s"v$i").toSet)
    assert(got(2L) == Seq("x"))
  }
}
