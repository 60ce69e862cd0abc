package graft.operators

import graft.SparkTestBase
import graft.model.{RelPattern, RelSchema, PropertyMeta}

class BuildersSpec extends SparkTestBase {
  import spark.implicits._

  test("node table: sentinel-id rows dropped, id-first sorted columns") {
    val df = Seq(("1", "x", "a"), ("", "y", "b"), ("NULL", "z", "c"), ("2", "w", "d"))
      .toDF("key", "zz", "aa")
    val out = NodeTableBuilder.build(df, "key")
    assert(out.columns.toSeq == Seq("key", "aa", "zz"))
    assert(out.select("key").as[String].collect().sorted.toSeq == Seq("1", "2"))
  }

  test("map-typed ingest: observed-key union, NULL restval, unseen key absent") {
    val df = Seq(
      (1L, Map("a" -> "1", "b" -> "2")),
      (2L, Map("b" -> "3", "c" -> "4")),
      (3L, Map.empty[String, String]))
      .toDF("id", "props")
    val out = NodeTableBuilder.fromPropertyMap(df, "id", "props")
    // id first, then the union of OBSERVED keys sorted; no column for
    // keys observed nowhere
    assert(out.columns.toSeq == Seq("id", "a", "b", "c"))
    val rows = out.as[(Long, Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, Some("1"), Some("2"), None),
      (2L, None, Some("3"), Some("4")),
      (3L, None, None, None)))
    // composes with the export-shaped builder: null-id filtering applies
    val withNullId = Seq(
      (Some(1L), Map("a" -> "1")), (None, Map("a" -> "x")))
      .toDF("id", "props")
    val built = NodeTableBuilder.build(
      NodeTableBuilder.fromPropertyMap(withNullId, "id", "props"), "id")
    assert(built.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("rel table: dangling endpoints dropped, label-prefixed columns") {
    val edges = Seq((1L, 10L, 0.5), (2L, 99L, 0.7), (7L, 10L, 0.9)).toDF("src", "dst", "w")
    val srcIds = Seq(1L, 2L).toDF("id")
    val dstIds = Seq(10L, 11L).toDF("id")
    val (out, schema) = RelTableBuilder.build(
      RelPattern("User", "LIKES", "Item"), edges, "src", "dst", "user_id", "item_id",
      relProps = Seq("w"), srcNodeIds = Some(srcIds), dstNodeIds = Some(dstIds))
    assert(out.columns.toSeq == Seq("User_user_id", "Item_item_id", "w"))
    // (2,99) dangling dst; (7,10) dangling src
    assert(out.count() == 1)
    assert(schema.srcColName == "User_user_id" && schema.dstColName == "Item_item_id")
  }

  test("self-relationship gets _source/_target suffixes") {
    val rs = RelSchema(RelPattern("Person", "KNOWS", "Person"), "pid", "pid",
      Seq(PropertyMeta("since", "integer", nullable = true)))
    assert(rs.srcColName == "Person_pid_source")
    assert(rs.dstColName == "Person_pid_target")
    assert(rs.orderedColumnNames == Seq("Person_pid_source", "Person_pid_target", "since"))
  }

  test("rel pattern discovery finds distinct triples") {
    val edges = Seq(
      ("A", "R", "B"), ("A", "R", "B"), ("A", "R", "C"), ("B", "S", "C"))
      .toDF("sl", "rt", "dl")
    val pats = RelPatternDiscovery.discover(edges, "sl", "rt", "dl")
    assert(pats == Seq(
      RelPattern("A", "R", "B"), RelPattern("A", "R", "C"), RelPattern("B", "S", "C")))
  }
}
