package graft.model

import java.nio.file.Files
import graft.SparkTestBase

class PropertyGraphIOSpec extends SparkTestBase {

  test("save/load round trip preserves tables, schema and identifiers") {
    val g0 = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft-pgio").toString
    PropertyGraphIO.save(g0, root, bucketsPerTable = 4)
    val g1 = PropertyGraphIO.load(spark, root)
    assert(g1.nodes.keySet == g0.nodes.keySet)
    assert(g1.rels.keySet == g0.rels.keySet)
    assert(g1.schema.identifierOf("Order").contains("o_orderkey"))
    assert(g1.nodes("Supplier").count() == g0.nodes("Supplier").count())
    val p = RelPattern("Order", "CONTAINS", "Part")
    assert(g1.rels(p).count() == g0.rels(p).count())
    assert(g1.rels(p).columns.take(2).toSeq == Seq("Order_o_orderkey", "Part_p_partkey"))
  }

  test("z-ordered node layout: identical rows back, tight per-file boxes on both dims") {
    import org.apache.spark.sql.functions._
    val g0 = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft-pgio-z").toString
    PropertyGraphIO.save(g0, root, bucketsPerTable = 8,
      zOrderNodes = Map("Customer" -> (("c_nationkey", "c_custkey"))))
    val g1 = PropertyGraphIO.load(spark, root)
    // layout is content-transparent: the full customer table round-trips
    val c0 = g0.nodes("Customer").orderBy("c_custkey").collect().toSeq
    val c1 = g1.nodes("Customer").orderBy("c_custkey").collect().toSeq
    assert(c1 == c0)
    // and physically clustered: several files, each covering a narrow
    // c_nationkey slice (the FIRST interleaved dim) instead of all 25
    val boxes = g1.nodes("Customer")
      .groupBy(input_file_name())
      .agg((max(col("c_nationkey")) - min(col("c_nationkey"))).cast("long").as("r"))
      .select(col("r")).collect().map(_.getLong(0))
    assert(boxes.length > 1)
    assert(boxes.count(_ < 25) > boxes.length / 2,
      s"per-file nationkey ranges not tight: ${boxes.mkString(",")}")
    // the manifest records the physical layout per label
    val layouts = PropertyGraphIO.tableLayouts(root)
    assert(layouts("Customer") == "zorder(c_nationkey,c_custkey)")
    assert(layouts("Order") == "hash")
    // unknown label fails fast
    intercept[IllegalArgumentException](
      PropertyGraphIO.save(g0, root, zOrderNodes = Map("Nope" -> (("a", "b")))))
  }

  test("upsert replaces matched ids, appends new ones, old generation survives until vacuum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val g0 = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft-pgio-upsert").toString
    PropertyGraphIO.save(g0, root, bucketsPerTable = 2)
    val nation = g0.nodes("Nation")
    val n0 = nation.count()

    // batch: rewrite nations 0 and 1, add nation 990
    val batch = nation.where(col("n_nationkey") < 2)
      .withColumn("n_name", org.apache.spark.sql.functions.lit("REWRITTEN"))
      .unionByName(nation.where(col("n_nationkey") === 3)
        .withColumn("n_nationkey", org.apache.spark.sql.functions.lit(990L)))
    PropertyGraphIO.upsertNodes(spark, root, "Nation", batch, bucketsPerTable = 2)

    val g1 = PropertyGraphIO.load(spark, root)
    val after = g1.nodes("Nation")
    assert(after.count() == n0 + 1)
    assert(after.where(col("n_name") === "REWRITTEN").count() == 2)
    assert(after.where(col("n_nationkey") === 990L).count() == 1)
    // unmatched rows untouched
    assert(after.where(col("n_nationkey") === 5L).count() == 1)

    // a second upsert stacks on the first; duplicate keys in a batch reject
    val batch2 = after.where(col("n_nationkey") === 990L)
      .withColumn("n_name", org.apache.spark.sql.functions.lit("V2"))
    PropertyGraphIO.upsertNodes(spark, root, "Nation", batch2, bucketsPerTable = 2)
    val g2 = PropertyGraphIO.load(spark, root)
    assert(g2.nodes("Nation").where(col("n_name") === "V2").count() == 1)
    assert(g2.nodes("Nation").count() == n0 + 1)
    intercept[IllegalArgumentException] {
      PropertyGraphIO.upsertNodes(spark, root, "Nation", batch2.unionByName(batch2))
    }

    // rel upsert keyed on the endpoint pair
    val p = RelPattern("Customer", "IN_NATION", "Nation")
    val relsBefore = g2.rels(p).count()
    val relBatch = g2.rels(p).limit(1)
      .withColumn("Nation_n_nationkey", org.apache.spark.sql.functions.lit(990L))
    PropertyGraphIO.upsertRels(spark, root, p.key, relBatch)
    assert(PropertyGraphIO.load(spark, root).rels(p).count() == relsBefore + 1)

    // vacuum drops superseded generations, keeps the live one
    val tableRoot = java.nio.file.Paths.get(root, "nodes", "Nation")
    def gens() = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(tableRoot)
      try s.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("gen-")).toSet
      finally s.close()
    }
    assert(gens() == Set("gen-1", "gen-2"))
    // retain=1 keeps the most recent superseded generation (rollback window)
    PropertyGraphIO.vacuum(root, retain = 1)
    assert(gens() == Set("gen-1", "gen-2"))
    PropertyGraphIO.vacuum(root)
    assert(gens() == Set("gen-2"))
    assert(PropertyGraphIO.load(spark, root).nodes("Nation").count() == n0 + 1)
  }

  test("time travel: every retained generation reads as its own snapshot") {
    import org.apache.spark.sql.functions.{col, lit}
    val g0 = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft-pgio-tt").toString
    PropertyGraphIO.save(g0, root, bucketsPerTable = 2)
    val nation = g0.nodes("Nation")
    val n0 = nation.count()
    val b1 = nation.where(col("n_nationkey") < 2).withColumn("n_name", lit("G1"))
    PropertyGraphIO.upsertNodes(spark, root, "Nation", b1, bucketsPerTable = 2)
    val b2 = nation.where(col("n_nationkey") === 3)
      .withColumn("n_nationkey", lit(990L)).withColumn("n_name", lit("NEW"))
    PropertyGraphIO.upsertNodes(spark, root, "Nation", b2, bucketsPerTable = 2)

    assert(PropertyGraphIO.nodeGenerations(root, "Nation") ==
      Seq((0L, false), (1L, false), (2L, true)))
    // gen 0: the original save — no G1, no 990
    val at0 = PropertyGraphIO.loadNodesAt(spark, root, "Nation", 0L)
    assert(at0.count() == n0 && at0.where(col("n_name") === "G1").count() == 0)
    // gen 1: G1 applied, 990 absent
    val at1 = PropertyGraphIO.loadNodesAt(spark, root, "Nation", 1L)
    assert(at1.where(col("n_name") === "G1").count() == 2)
    assert(at1.where(col("n_nationkey") === 990L).count() == 0)
    // gen 2 = current
    val at2 = PropertyGraphIO.loadNodesAt(spark, root, "Nation", 2L)
    assert(at2.where(col("n_nationkey") === 990L).count() == 1)
    assert(at2.count() == n0 + 1)

    // vacuum shrinks the time-travel window; reads past it fail loudly
    PropertyGraphIO.vacuum(root)
    assert(PropertyGraphIO.nodeGenerations(root, "Nation") ==
      Seq((0L, false), (2L, true)))
    intercept[IllegalArgumentException](
      PropertyGraphIO.loadNodesAt(spark, root, "Nation", 1L))
    assert(PropertyGraphIO.loadNodesAt(spark, root, "Nation", 2L).count() == n0 + 1)
  }

  test("CDC diff classifies inserts, updates and (reversed) deletes; unchanged rows absent") {
    import org.apache.spark.sql.functions.{col, lit}
    val g0 = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft-pgio-cdc").toString
    PropertyGraphIO.save(g0, root, bucketsPerTable = 2)
    val nation = g0.nodes("Nation")
    val b1 = nation.where(col("n_nationkey") < 2).withColumn("n_name", lit("G1"))
      .unionByName(nation.where(col("n_nationkey") === 3)
        .withColumn("n_nationkey", lit(990L)).withColumn("n_name", lit("NEW")))
    PropertyGraphIO.upsertNodes(spark, root, "Nation", b1, bucketsPerTable = 2)

    val fwd = PropertyGraphIO.cdcNodes(spark, root, "Nation", 0L, 1L)
      .select(col("op"), col("n_nationkey"), col("__after.n_name").as("after"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fwd == Set(("update", 0L), ("update", 1L), ("insert", 990L)))
    // reversed direction: the insert becomes a delete
    val rev = PropertyGraphIO.cdcNodes(spark, root, "Nation", 1L, 0L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rev == Set(("update", 0L), ("update", 1L), ("delete", 990L)))
    // identical generations diff to nothing
    assert(PropertyGraphIO.cdcNodes(spark, root, "Nation", 1L, 1L).count() == 0)
  }
}
