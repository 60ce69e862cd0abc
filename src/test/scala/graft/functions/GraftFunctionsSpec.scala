package graft.functions

import graft.SparkTestBase

class GraftFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("native vector functions usable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_dot(a, b) AS d, vec_norm(a) AS n FROM vecs")
      .as[(Double, Double)].head()
    assert(r._1 == 11.0)
    assert(math.abs(r._2 - math.sqrt(5.0)) < 1e-12)
    // fixed-point dot: weights pre-scaled to the pico grid
    val fp = spark.sql(
      "SELECT vec_dot_fixed_point(a, array(3e12d, 4e12d)) FROM vecs")
      .as[Long].head()
    assert(fp == 11L * 1000000000000L)
  }

  test("SQL text primitives agree with the Column API definitions") {
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val docs = Seq("  Hello   WORLD  ", "one two three", "").toDF("t")
    docs.createOrReplaceTempView("docs_fn")
    val viaSql = spark.sql(
      """SELECT graft_token_count(t), graft_fingerprint(t), graft_fingerprint_md5(t)
        |FROM docs_fn""".stripMargin)
      .as[(Int, Long, String)].collect().toSeq
    val viaCol = docs.select(
      graft.operators.TextAnalysis.tokenCount(col("t")),
      graft.operators.TextAnalysis.fingerprint(col("t")),
      graft.operators.TextAnalysis.fingerprintMd5(col("t")))
      .as[(Int, Long, String)].collect().toSeq
    assert(viaSql == viaCol)
    // normalization collapses case + whitespace
    val same = spark.sql(
      "SELECT graft_fingerprint('a  B') = graft_fingerprint('A b')").as[Boolean].head()
    assert(same)
  }

  test("graft_hamming = popcount(xor), hand-computed") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT graft_hamming(0, 0), graft_hamming(255, 0),
        |  graft_hamming(CAST(-1 AS BIGINT), 0), graft_hamming(5, 6)
        |FROM (SELECT 1)""".stripMargin)
      .as[(Int, Int, Int, Int)].head()
    assert(got == ((0, 8, 64, 2))) // 5 xor 6 = 0b011
  }
}
