package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the test star schema — one parquet per table under a
  * scale-factor directory. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table stores TIMESTAMP(NANOS) which Spark cannot represent
    * natively; `nanosAsLong` reads `ts` as int64 nanoseconds since epoch —
    * bit-exact with DuckDB's `epoch_ns(ts)`, which is what the oracle uses.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }
}
