package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val und = (1L to 1000L).map(i => (i % 100, i % 37)).toDF("u", "v")
      .distinct().repartition(col("u"))
    val cv = und.groupBy("u").agg(count(lit(1)).cast("long").as("cv")).localCheckpoint(true)
    val nv = und.join(broadcast(cv.select(col("u").as("v"), col("cv"))), "v").select(col("u"), col("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u").orderBy(col("cv").desc)
    val h = nv.groupBy("u", "cv").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .groupBy("u").agg(max(least(col("cum"), col("cv"))).cast("long").as("cv"))
    h.explain("formatted")
    spark.stop()
  }
}
