package graft.schema

import org.apache.spark.sql.types._

/** Property-type tokens for the importer model: integer | float | boolean |
  * string — the reference's `_infer_type` vocabulary
  * (neo4j_export.py:1221-1244).
  */
object TypeInference {

  /** Token from a Catalyst type. The reference infers types from CSV
    * *sample strings*, so a timestamp round-trips as "string"
    * (int()/float() both fail on "2024-01-15 00:00:00"); we match that for
    * temporal/complex types while using the real schema for numerics —
    * strictly more accurate than one-sample sniffing and free at any scale.
    */
  def fromCatalyst(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType       => "float"
    case BooleanType                                   => "boolean"
    case _                                             => "string"
  }

  /** Token from a single sample string — byte-for-byte the reference's
    * fallback chain (neo4j_export.py:1221-1244): int → float → boolean →
    * string, with ""/"NULL" → string. Used for schemaless CSV input where
    * no Catalyst schema exists yet. */
  def fromSample(value: String): String = {
    if (value == null || value.isEmpty || value == "NULL") return "string"
    if (value.toIntOption.isDefined || value.toLongOption.isDefined) return "integer"
    if (value.toDoubleOption.isDefined) return "float"
    if (value.toLowerCase == "true" || value.toLowerCase == "false") return "boolean"
    "string"
  }
}
