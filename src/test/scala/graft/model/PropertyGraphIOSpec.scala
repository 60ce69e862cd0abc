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
}
