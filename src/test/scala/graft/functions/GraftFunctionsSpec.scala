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
  }
}
