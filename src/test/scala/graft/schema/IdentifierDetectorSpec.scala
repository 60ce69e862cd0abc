package graft.schema

import graft.SparkTestBase

/** Hand-computed oracles for the reference's 5-rule identifier priority
  * (neo4j_export.py:132-175). */
class IdentifierDetectorSpec extends SparkTestBase {
  import spark.implicits._

  test("rule 1: unique constraint wins over everything") {
    val df = Seq((1L, "a", 10L)).toDF("id", "name", "acctkey")
    val cat = GraphCatalog.empty.withUnique("L", "name")
    assert(IdentifierDetector.detect(df, "L", cat) == "name")
  }

  test("rule 2: property named id (case-insensitive)") {
    val df = Seq((1L, "a", 10L)).toDF("ID", "name", "userid")
    assert(IdentifierDetector.detect(df, "L") == "ID")
  }

  test("rule 3: *id suffix, shortest name wins") {
    val df = Seq((1L, 2L, "x")).toDF("customerid", "xid", "name")
    assert(IdentifierDetector.detect(df, "L") == "xid")
  }

  test("rule 4: all-unique-valued column (original order, sentinel-aware)") {
    // 'aaa' repeats; 'uniq' is unique but contains the "NULL" sentinel in
    // one row — the reference drops sentinels before the uniqueness test,
    // so uniq still qualifies and, coming before 'partial' in ORIGINAL
    // property order (neo4j_export.py:163), wins even though 'partial'
    // sorts before it alphabetically.
    val df = Seq(("x", "u1", "x"), ("x", "u2", "y"), ("x", "NULL", "z"))
      .toDF("aaa", "uniq", "partial")
    assert(IdentifierDetector.detect(df, "L") == "uniq")
  }

  test("rule 5: fallback to first property in original order") {
    // 'aaa' sorts first but 'bbb' is the first property — the reference
    // falls back to properties[0] (neo4j_export.py:171)
    val df = Seq(("x", "p"), ("x", "p")).toDF("bbb", "aaa")
    assert(IdentifierDetector.detect(df, "L") == "bbb")
  }
}
