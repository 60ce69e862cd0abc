package graft.export

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.model.TpchGraph

class ExporterSpec extends SparkTestBase {

  private lazy val outDir = {
    val dir = Files.createTempDirectory("graft-export").toString
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    GraphExporter.exportAll(g, dir, formatVersion = "3.0", singleFileCsv = true, createZip = true)
    dir
  }

  test("node CSVs written with identifier-first header and NULL restval convention") {
    val customer = Paths.get(outDir, "Customer.csv")
    assert(Files.exists(customer))
    val header = Files.readAllLines(customer).get(0)
    assert(header == "c_custkey,c_acctbal,c_mktsegment,c_name,c_nationkey")
  }

  test("relationship CSVs use pattern-key filenames and label-prefixed columns") {
    val rel = Paths.get(outDir, "Customer_PLACED_Order.csv")
    assert(Files.exists(rel))
    val header = Files.readAllLines(rel).get(0)
    assert(header == "Customer_c_custkey,Order_o_orderkey")
  }

  test("v3 model structure: ids, mappings, constraints") {
    val model = Files.readString(Paths.get(outDir, "neo4j_importer_model.json"))
    assert(model.contains(""""version": "3.0.0""""))
    assert(model.contains(""""$id": "nl:0""""))
    assert(model.contains(""""$id": "n:0""""))
    assert(model.contains(""""token": "Customer""""))
    assert(model.contains(""""token": "PLACED""""))
    assert(model.contains(""""constraintType": "uniqueness""""))
    assert(model.contains(""""nodeKeyProperties""""))
    // from/to mappings carry the #-prefixed property refs (v3 quirk)
    assert(model.contains("\"#p:"))
    // node property ids are p:<node>_<prop>
    assert(model.contains(""""$id": "p:0_0""""))
  }

  test("zip contains all CSVs and the model json") {
    val zipPath = Paths.get(outDir).resolveSibling(
      s"${Paths.get(outDir).getFileName}-export.zip")
    assert(Files.exists(zipPath))
    val zf = new java.util.zip.ZipFile(zipPath.toFile)
    try {
      val names = zf.entries().asIterator()
      var entries = Set.empty[String]
      while (names.hasNext) entries += names.next().getName
      assert(entries.contains("neo4j_importer_model.json"))
      assert(entries.contains("Customer.csv"))
      assert(entries.contains("Order_CONTAINS_Part.csv"))
    } finally zf.close()
  }

  test("v2.4 model: global property counter, from/to on types, index/constraint sections") {
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-export24").toString
    GraphExporter.exportAll(g, dir, formatVersion = "2.4.0", createZip = false)
    val model = Files.readString(Paths.get(dir, "neo4j_importer_model.json"))
    assert(model.contains(""""version": "2.4.0-beta.0""""))
    assert(model.contains(""""$id": "nl:n0""""))
    assert(model.contains(""""$id": "p:1""""))
    assert(model.contains(""""indexes""""))
    assert(model.contains("c_mktsegment_Customer_idx"))
    assert(model.contains("c_custkey_Customer_uniq"))
  }

  test("round trip: import the exported package back into a PropertyGraph") {
    val g0 = graft.model.TpchGraph.load(spark, "/root/testdata/sf0.001")
    val g1 = GraphImporter.fromPackage(spark, outDir)
    assert(g1.nodes.keySet == g0.nodes.keySet)
    assert(g1.rels.keySet == g0.rels.keySet)
    // counts survive the round trip
    assert(g1.nodes("Customer").count() == g0.nodes("Customer").count())
    val pattern = graft.model.RelPattern("Order", "CONTAINS", "Part")
    assert(g1.rels(pattern).count() == g0.rels(pattern).count())
    // identifiers recovered from nodeKeyProperties
    assert(g1.schema.identifierOf("Customer").contains("c_custkey"))
    // typed columns: quantity came back numeric and sums agree
    import org.apache.spark.sql.functions._
    val s0 = g0.rels(pattern).agg(sum(col("l_quantity").cast("decimal(18,2)"))).head().getDecimal(0)
    val s1 = g1.rels(pattern).agg(sum(col("l_quantity").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(s0 == s1)
  }

  test("distributed (multi-part) export zips part files under their csv dir") {
    val dir = Files.createTempDirectory("graft-multipart").toString
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val res = GraphExporter.exportAll(g, dir, singleFileCsv = false, createZip = true)
    val zip = new java.util.zip.ZipFile(res.zipPath.get)
    try {
      val entries = scala.jdk.CollectionConverters.EnumerationHasAsScala(zip.entries())
        .asScala.map(_.getName).toSeq
      assert(entries.contains("neo4j_importer_model.json"))
      assert(entries.exists(e => e.startsWith("Customer.csv/") && e.endsWith(".csv")),
        s"expected Customer.csv/part entries, got ${entries.take(8)}")
      // and the multi-part package round-trips through the importer
      val re = GraphImporter.fromPackage(spark, dir)
      assert(re.nodes("Customer").count() == g.nodes("Customer").count())
    } finally zip.close()
  }

  test("CSV quotes escape RFC-4180 style (doubled quote) and round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-quote").toString
    val df = Seq((1L, """say "hi" now"""), (2L, "plain")).toDF("id", "note")
    CsvPackageWriter.write(df, dir, "Quoted", singleFile = true)
    val lines = Files.readAllLines(Paths.get(dir, "Quoted.csv"))
    // python csv / Data Importer dialect: "say ""hi"" now", never \"
    assert(lines.contains("""1,"say ""hi"" now""""), s"got: $lines")
    assert(!lines.toString.contains("\\\""))
    val back = spark.read.options(CsvPackageWriter.CsvOptions)
      .csv(s"$dir/Quoted.csv").orderBy("id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.toSeq == Seq(("1", """say "hi" now"""), ("2", "plain")))
  }

  test("multi-label mapping exports one table per label and round-trips the model") {
    import graft.model.{NodeMapping, TableGraphMapper}
    val catalog = graft.schema.GraphCatalog.empty
      .withUnique("Supplier", "s_suppkey")
      .withUnique("Vendor", "s_name")
    val mapper = new TableGraphMapper(
      Seq(NodeMapping("Supplier", "supplier", extraLabels = Seq("Vendor"))), Nil, catalog)
    val g = mapper.load(spark, "/root/testdata/sf0.001")
    // one node table per label, each under its own identifier
    assert(g.nodes.keySet == Set("Supplier", "Vendor"))
    assert(g.schema.labels.map(l => l.label -> l.identifier).toMap ==
      Map("Supplier" -> "s_suppkey", "Vendor" -> "s_name"))
    // per-label column order: identifier first
    assert(g.nodes("Supplier").columns.head == "s_suppkey")
    assert(g.nodes("Vendor").columns.head == "s_name")
    // the model JSON carries both labels and survives a package round trip
    val dir = Files.createTempDirectory("graft-multilabel").toString
    GraphExporter.exportAll(g, dir, formatVersion = "3.0", singleFileCsv = true, createZip = false)
    val re = GraphImporter.fromPackage(spark, dir)
    assert(re.nodes.keySet == Set("Supplier", "Vendor"))
    assert(re.schema.labels.map(l => l.label -> l.identifier).toMap ==
      Map("Supplier" -> "s_suppkey", "Vendor" -> "s_name"))
    assert(re.nodes("Supplier").count() == g.nodes("Supplier").count())
    assert(re.nodes("Vendor").count() == g.nodes("Vendor").count())
  }

  test("v0.1 model: legacy layout with deterministic identifiers") {
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-export01").toString
    GraphExporter.exportAll(g, dir, formatVersion = "0.1.0", createZip = false)
    val model = Files.readString(Paths.get(dir, "neo4j_importer_model.json"))
    assert(model.contains(""""version": "0.1.0-beta.0""""))
    assert(model.contains(""""caption": "Customer""""))
    assert(model.contains(""""fileSchemas""""))
    // deterministic: generating twice yields identical output
    val dir2 = Files.createTempDirectory("graft-export01b").toString
    GraphExporter.exportAll(g, dir2, formatVersion = "0.1.0", createZip = false)
    val model2 = Files.readString(Paths.get(dir2, "neo4j_importer_model.json"))
    assert(model == model2)
  }
}
