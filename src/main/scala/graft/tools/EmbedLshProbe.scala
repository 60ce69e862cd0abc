package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway evidence probe for the dd_embed_cosine sf3 wall: bucket-size
  * histogram and candidate-pair mass of [[graft.operators.Similarity]]'s
  * embedding-LSH index at a given SF dir — is the 35×-bytes-on-3×-data
  * breach bucket skew (a few giant buckets going quadratic) or true
  * near-dup cluster growth (30-replica clusters are C(30,2) pairs by
  * construction)?
  *
  * Usage: `sbt "runMain graft.tools.EmbedLshProbe <sfDir>"`. */
object EmbedLshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val dim = 64; val numBits = 12; val numTables = 4
    val b = (0 until numTables).map(i =>
      struct(lit(i).as("tbl"),
        Similarity.lshBucket(col("vec"), dim, numBits, seed = 7L + i).as("bucket")))
    val base = e.select(col("id"), explode(array(b: _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .localCheckpoint(true)
    val sizes = base.groupBy("tbl", "bucket").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    println("[lshprobe] top-10 buckets by size:")
    sizes.orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"[lshprobe]   tbl=${r.get(0)} bucket=${r.get(1)} n=${r.get(2)}"))
    val cand = sizes.agg(sum(col("n") * (col("n") - 1) / 2)).head.getAs[Any](0)
    val rows = e.count()
    val buckets = sizes.count()
    println(s"[lshprobe] rows=$rows buckets=$buckets rawCandidatePairs(preDedup)=$cand")
    spark.stop()
  }
}
