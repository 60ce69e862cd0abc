package graft.sources

import graft.schema.TypeInference
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schemaless CSV ingestion with the reference's sample-based type
  * sniffing (neo4j_export.py:1221-1244): read everything as string, infer
  * integer/float/boolean/string per column from the first row, cast.
  * `NULL` sentinels become real nulls — the inverse of
  * [[graft.export.CsvPackageWriter]]'s restval convention.
  *
  * (Spark's own `inferSchema` does two passes over the full file; this
  * matches the reference's one-sample semantics and reads the data once,
  * which matters when the CSV is a 100 TB directory.)
  */
object CsvSource {

  def readTyped(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.options(graft.export.CsvPackageWriter.CsvOptions).csv(path)
    val sample = raw.take(1).headOption
    val cols = raw.columns.zipWithIndex.map { case (c, i) =>
      val sampleValue = sample.map(r => Option(r.getString(i)).getOrElse("")).getOrElse("")
      val sparkType = TypeInference.fromSample(sampleValue) match {
        case "integer" => "bigint"
        case "float"   => "double"
        case "boolean" => "boolean"
        case _         => "string"
      }
      when(col(c) === "NULL", lit(null)).otherwise(col(c)).cast(sparkType).as(c)
    }
    raw.select(cols.toSeq: _*)
  }
}
