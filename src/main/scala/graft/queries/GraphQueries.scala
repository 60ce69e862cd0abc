package graft.queries

import graft.Tables
import graft.model.{NodeMapping, RelPattern, TableGraphMapper, TpchGraph}
import graft.operators.{NodeTableBuilder, RelTableBuilder}
import graft.schema.{GraphCatalog, IdentifierDetector, SchemaInference, TypeInference}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph-ETL queries (SURVEY §2.1–§2.4): the reference's export pipeline
  * steps, each as a DataFrame transform whose result DuckDB can reproduce
  * in ANSI SQL.
  */
object GraphQueries {

  // ---------------------------------------------------------------- nodes

  /** Node table for Customer: identifier detected via the declared unique
    * constraint (rule 1), NULL-id filter, id-first/rest-sorted columns —
    * export_nodes re-expressed (neo4j_export.py:269-332). */
  def nodesCustomer(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "customer")
    val id = IdentifierDetector.detect(df, "Customer", TpchGraph.catalog)
    NodeTableBuilder.build(df, id)
  }

  def nodesPart(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "part")
    val id = IdentifierDetector.detect(df, "Part", TpchGraph.catalog)
    NodeTableBuilder.build(df, id)
  }

  // ---------------------------------------------------------------- rels

  /** Customer-PLACED->Order edge table: endpoint columns named
    * {Label}_{idProp} (neo4j_export.py:383-390), source endpoint validated
    * by semi-join against the Customer node table. */
  def relCustomerPlacedOrder(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val customerIds = Tables(s, dir, "customer").select(col("c_custkey"))
    RelTableBuilder.build(
      RelPattern("Customer", "PLACED", "Order"), orders,
      srcFk = "o_custkey", dstFk = "o_orderkey",
      srcIdProp = "c_custkey", dstIdProp = "o_orderkey",
      relProps = Nil, srcNodeIds = Some(customerIds))._1
  }

  /** Order-CONTAINS->Part edge table with relationship properties
    * (lineitem measures), endpoints validated both sides. l_shipdate is
    * surfaced as DATE (values are midnight-aligned). */
  def relOrderContainsPart(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .withColumn("l_shipdate", to_date(col("l_shipdate")))
    val orderIds = Tables(s, dir, "orders").select(col("o_orderkey"))
    val partIds = Tables(s, dir, "part").select(col("p_partkey"))
    RelTableBuilder.build(
      RelPattern("Order", "CONTAINS", "Part"), li,
      srcFk = "l_orderkey", dstFk = "l_partkey",
      srcIdProp = "o_orderkey", dstIdProp = "p_partkey",
      relProps = Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      srcNodeIds = Some(orderIds), dstNodeIds = Some(partIds))._1
  }

  def relSupplierInNation(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables(s, dir, "supplier")
    val nationIds = Tables(s, dir, "nation").select(col("n_nationkey"))
    RelTableBuilder.build(
      RelPattern("Supplier", "LOCATED_IN", "Nation"), sup,
      srcFk = "s_suppkey", dstFk = "s_nationkey",
      srcIdProp = "s_suppkey", dstIdProp = "n_nationkey",
      relProps = Nil, dstNodeIds = Some(nationIds))._1
  }

  // ------------------------------------------------------------ patterns

  /** Relationship-pattern inventory with edge counts — the reference's
    * DISTINCT pattern discovery (neo4j_export.py:342-354) over the whole
    * mapped graph. */
  def relPatterns(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    val counts = TpchGraph.edges.map { em =>
      val df = g.rels(em.pattern)
      df.agg(count(lit(1)).as("n_edges"))
        .select(
          lit(em.srcLabel).as("src_label"),
          lit(em.relType).as("rel_type"),
          lit(em.dstLabel).as("dst_label"),
          col("n_edges"))
    }
    counts.reduce(_.unionAll(_))
  }

  // ------------------------------------------------------------- degrees

  /** Out-degree of Customer along PLACED — groupBy on the edge source key
    * (map-side partial agg; no graph library needed for degrees). */
  def degreeOutCustomer(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    g.rels(RelPattern("Customer", "PLACED", "Order"))
      .groupBy(col("Customer_c_custkey"))
      .agg(count(lit(1)).as("out_degree"))
  }

  /** In-degree of Nation along Customer IN_NATION. */
  def degreeInNation(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    g.rels(RelPattern("Customer", "IN_NATION", "Nation"))
      .groupBy(col("Nation_n_nationkey"))
      .agg(count(lit(1)).as("in_degree"))
  }

  /** 2-hop traversal via joins — Nation ←IN_NATION– Customer –PLACED→
    * Order –CONTAINS→ Part: distinct parts reachable from each nation.
    * OLTP-style traversal maps onto co-partitioned equi-joins; Catalyst
    * broadcasts the dims and the fact tables shuffle once. */
  def traverseNationParts(s: SparkSession, dir: String): DataFrame = {
    val n = Tables(s, dir, "nation")
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count_distinct(col("l_partkey")).as("n_distinct_parts"),
        count(lit(1)).as("n_paths"))
  }

  // ----------------------------------------------------- schema/metadata

  /** Per-property metadata for Customer — the apoc.meta.data analog
    * (neo4j_export.py:58-81): one distributed agg pass, result is
    * schema-sized. */
  def schemaCustomer(s: SparkSession, dir: String): DataFrame = schemaOf(s, dir, "customer")
  def schemaLineitem(s: SparkSession, dir: String): DataFrame = schemaOf(s, dir, "lineitem")

  /** ANALYZE-style profile of orders: nulls, exact distinct, min/max per
    * column from ONE scan ([[SchemaInference.profile]]). */
  def profileOrders(s: SparkSession, dir: String): DataFrame =
    SchemaInference.profile(Tables(s, dir, "orders"))

  private def schemaOf(s: SparkSession, dir: String, table: String): DataFrame = {
    val stats = SchemaInference.columnStats(Tables(s, dir, table))
    val rows = stats.map(cs => Row(cs.name, cs.typeToken, cs.total, cs.nonNull))
    s.createDataFrame(
      s.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("property", StringType, nullable = false),
        StructField("type_token", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nonnull", LongType, nullable = false))))
  }

  /** Node census of the mapped graph — per label, how many valid nodes
    * (the reference's export summary counts, neo4j_export.py:1324-1326). */
  def graphNodeCount(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    TpchGraph.nodes.map { nm =>
      g.nodes(nm.label).agg(count(lit(1)).as("n_nodes"))
        .select(lit(nm.label).as("label"), col("n_nodes"))
    }.reduce(_.unionAll(_))
  }

  /** Edge census per relationship type (summed across patterns). */
  def graphEdgeCount(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    TpchGraph.edges.map { em =>
      g.rels(em.pattern).agg(count(lit(1)).as("n"))
        .select(lit(em.relType).as("rel_type"), col("n"))
    }.reduce(_.unionAll(_))
      .groupBy(col("rel_type")).agg(sum(col("n")).cast("long").as("n_edges"))
  }

  /** Identifier-candidate statistics for Customer — the distributed form
    * of rule 4's uniqueness probe (neo4j_export.py:162-167). */
  def identifierStats(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "customer")
    val cols = df.columns.sorted.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"n_$c"), count_distinct(col(c)).as(s"d_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = cols.zipWithIndex.map { case (c, i) =>
      Row(c, r.getLong(2 * i), r.getLong(2 * i + 1), r.getLong(2 * i) == r.getLong(2 * i + 1))
    }
    s.createDataFrame(
      s.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("property", StringType, nullable = false),
        StructField("n_nonnull", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("all_unique", BooleanType, nullable = false))))
  }

  /** Uniqueness-constraint validation over every declared constraint —
    * SHOW CONSTRAINTS (neo4j_export.py:83-130) plus an actual data check
    * the reference trusts the database for. */
  def constraintCheck(s: SparkSession, dir: String): DataFrame = {
    val checks = TpchGraph.catalog.constraints.map { c =>
      val label = c.labels.head
      val table = TpchGraph.nodes.find(_.label == label).get.table
      val prop = c.properties.head
      Tables(s, dir, table)
        .agg(count(col(prop)).as("n_nonnull"), count_distinct(col(prop)).as("n_distinct"))
        .select(
          lit(label).as("label"), lit(prop).as("property"),
          col("n_nonnull"), col("n_distinct"),
          (col("n_nonnull") === col("n_distinct")).as("valid"))
    }
    checks.reduce(_.unionAll(_))
  }

  /** Sample-based type inference (neo4j_export.py:1221-1244) applied to the
    * deterministic min-string rendering of a column — integer → float →
    * boolean → string fallback chain as a codegen'd expression. */
  def typeInfer(s: SparkSession, dir: String): DataFrame = {
    // Python-int() semantics: only pure digit strings are integers
    // ("100.0" is NOT — unlike SQL try_cast, which truncates).
    def classify(sample: org.apache.spark.sql.Column) =
      when(sample.isNull || sample === "" || sample === "NULL", "string")
        .when(regexp_like(sample, lit("^[+-]?[0-9]+$")), "integer")
        .when(sample.try_cast(DoubleType).isNotNull, "float")
        .when(lower(sample).isin("true", "false"), "boolean")
        .otherwise("string")
    val part = Tables(s, dir, "part")
    val samples = part.agg(
      min(col("p_partkey").cast("string")).as("s_p_partkey"),
      min(col("p_retailprice").cast("string")).as("s_p_retailprice"),
      min(col("p_name")).as("s_p_name"),
      min(col("p_size").cast("string")).as("s_p_size"))
    samples.select(
      explode(array(
        struct(lit("p_partkey").as("property"), classify(col("s_p_partkey")).as("token")),
        struct(lit("p_retailprice").as("property"), classify(col("s_p_retailprice")).as("token")),
        struct(lit("p_name").as("property"), classify(col("s_p_name")).as("token")),
        struct(lit("p_size").as("property"), classify(col("s_p_size")).as("token")))).as("kv"))
      .select(col("kv.property"), col("kv.token"))
  }

  // ------------------------------------------------------------- null id

  /** NULL-identifier filter accounting (neo4j_export.py:303-313): per
    * label, rows total vs rows with a usable identifier. */
  def nullIdFilter(s: SparkSession, dir: String): DataFrame = {
    val labels = Seq(("Customer", "customer", "c_custkey"), ("Order", "orders", "o_orderkey"),
      ("Part", "part", "p_partkey"))
    labels.map { case (label, table, id) =>
      val df = Tables(s, dir, table)
      df.agg(
        count(lit(1)).as("n_total"),
        count(when(NodeTableBuilder.validId(df, id), 1)).as("n_valid"))
        .select(lit(label).as("label"), col("n_total"), col("n_valid"))
    }.reduce(_.unionAll(_))
  }

  // ------------------------------------------------------- export flagship

  /** Flagship export pipeline, driver-checked end-to-end: exportAll writes
    * the full CSV+model-JSON+zip package (neo4j_export.py:1278-1333) to a
    * temp dir, GraphImporter parses the written model back, and the query
    * renders the round-tripped node/relationship mapping table — label,
    * csv file, key property, column count. The mapping is schema-sized and
    * SF-invariant, so the oracle is a VALUES literal. Any breakage in
    * CsvPackageWriter, ModelV3, ZipPackager or GraphImporter surfaces here
    * as a row/hash mismatch. */
  def modelMappings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_model_mappings").toString
    try {
      val g = TpchGraph.load(s, dir)
      // distributed (multi-part) CSV write — the only mode that holds at
      // scale; the single-file rename path keeps its own spec coverage
      graft.export.GraphExporter.exportAll(g, out, singleFileCsv = false, createZip = true)
      val re = graft.export.GraphImporter.fromPackage(s, out)
      val nodeRows = re.schema.labels.map { ls =>
        ("node", ls.label, s"${ls.label}.csv", ls.identifier,
          re.nodes(ls.label).columns.length.toLong)
      }
      val relRows = re.schema.rels.map { rs =>
        val df = re.rels(rs.pattern)
        ("rel", rs.pattern.key, s"${rs.pattern.key}.csv",
          df.columns.take(2).mkString("->"), df.columns.length.toLong)
      }
      // the result is a driver-local literal — the package dir is done
      (nodeRows ++ relRows).toDF("kind", "name", "csv_file", "key_property", "n_columns")
    } finally graft.tools.Fs.deleteRecursively(out)
  }

  /** Path-pattern matching compiled to joins: every Customer→Order→Part
    * path, aggregated per part (SURVEY §2.4; PatternMatch scaladoc). */
  def patternMatch(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    graft.operators.PatternMatch
      .find(g, "Customer-[PLACED]->Order-[CONTAINS]->Part")
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_paths"),
        count_distinct(col("customer_id")).as("n_customers"))
  }

  /** Hash-partitioned at-rest graph layout round trip: save the full
    * PropertyGraph (parquet per label/pattern + schema manifest), load it
    * back, and report per-table row counts — exercising PropertyGraphIO
    * end to end under the driver's gate. */
  def graphIoRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pgio").toString
    try {
    val g = TpchGraph.load(s, dir)
    // lineitem-free subgraph: the layout/manifest/round-trip machinery is
    // fully exercised by 5 labels + 4 patterns; re-writing the two
    // 600k-row lineitem rel tables here would only re-price what
    // g_model_mappings already pays
    val keep = Set("Region", "Nation", "Customer", "Supplier", "Order")
    val keepRels = Set("Nation_IN_REGION_Region", "Customer_IN_NATION_Nation",
      "Supplier_LOCATED_IN_Nation", "Customer_PLACED_Order")
    val sub = graft.model.PropertyGraph(
      nodes = g.nodes.view.filterKeys(keep).toMap,
      rels = g.rels.filter { case (p, _) => keepRels(p.key) },
      schema = graft.model.GraphSchema(
        labels = g.schema.labels.filter(l => keep(l.label)),
        rels = g.schema.rels.filter(r => keepRels(r.pattern.key)),
        constraints = g.schema.constraints,
        indexes = g.schema.indexes))
    graft.model.PropertyGraphIO.save(sub, root)
    val re = graft.model.PropertyGraphIO.load(s, root)
    val nodeRows = re.nodes.toSeq.map { case (label, df) => ("node", label, df.count()) }
    val relRows = re.rels.toSeq.map { case (p, df) => ("rel", p.key, df.count()) }
    // counts are materialized above — the at-rest layout can be reclaimed
    (nodeRows ++ relRows).toDF("kind", "name", "n_rows")
    } finally graft.tools.Fs.deleteRecursively(root)
  }

  /** Incremental mutation path, driver-checked end to end: save a
    * Nation+Region subgraph to the at-rest layout, upsert a batch that
    * REWRITES nations 0-4 and APPENDS a new nation 990 (the Cypher
    * MERGE+SET shape the reference's source store is maintained by), load
    * the flipped generation back and render the merged table. Any
    * breakage in generation writing, pointer flipping, anti-join merge
    * semantics or `_current` resolution surfaces as a row/hash
    * mismatch. */
  def graphUpsert(s: SparkSession, dir: String): DataFrame = {
    import graft.model.{GraphSchema, LabelSchema, PropertyGraph, PropertyGraphIO, RelPattern, RelSchema}
    val root = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    try {
      val nation = graft.Tables(s, dir, "nation")
      val region = graft.Tables(s, dir, "region")
      val pat = RelPattern("Nation", "IN_REGION", "Region")
      val g = PropertyGraph(
        nodes = Map("Nation" -> nation, "Region" -> region),
        rels = Map(pat -> nation.select(
          col("n_nationkey").as("Nation_n_nationkey"),
          col("n_regionkey").as("Region_r_regionkey"))),
        schema = GraphSchema(
          labels = Seq(LabelSchema("Nation", "n_nationkey", Nil),
            LabelSchema("Region", "r_regionkey", Nil)),
          rels = Seq(RelSchema(pat, "n_nationkey", "r_regionkey", Nil))))
      PropertyGraphIO.save(g, root, bucketsPerTable = 2)
      val batch = nation.where(col("n_nationkey") < 5)
        .withColumn("n_name", lit("UPSERTED"))
        .unionByName(nation.where(col("n_nationkey") === 10)
          .withColumn("n_nationkey", lit(990))
          .withColumn("n_name", lit("NEWLAND"))
          .withColumn("n_regionkey", lit(0)))
      PropertyGraphIO.upsertNodes(s, root, "Nation", batch, bucketsPerTable = 2)
      // localCheckpoint materializes the merged generation into block
      // storage so the scratch dir can be reclaimed under the lazy result
      PropertyGraphIO.load(s, root).nodes("Nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .localCheckpoint(true)
    } finally graft.tools.Fs.deleteRecursively(root)
  }

  /** Time travel over the copy-on-write layout: save the Nation table,
    * upsert twice (each upsert writes a NEW whole-snapshot generation and
    * flips `_current`), then read ALL generations still inside the vacuum
    * retention window — generation 0 (the original save), 1 and 2 — as
    * one unioned history frame. The oracle replays each snapshot's merge
    * semantics from `nation` directly, so the on-disk generation chain is
    * hash-checked end to end, not just counted. */
  /** Shared fixture for the time-travel/CDC queries: save the Nation
    * table, then two upserts — gen-1 rewrites keys <5 to V1 and inserts
    * 990, gen-2 rewrites keys <3 to V2 and inserts 991. Caller deletes
    * the returned scratch root. */
  private def threeGenerationRoot(s: SparkSession, dir: String): String = {
    import graft.model.{GraphSchema, LabelSchema, PropertyGraph, PropertyGraphIO}
    val root = java.nio.file.Files.createTempDirectory("graft_timetravel").toString
    val nation = graft.Tables(s, dir, "nation")
    val g = PropertyGraph(
      nodes = Map("Nation" -> nation),
      rels = Map.empty,
      schema = GraphSchema(
        labels = Seq(LabelSchema("Nation", "n_nationkey", Nil)), rels = Nil))
    PropertyGraphIO.save(g, root, bucketsPerTable = 2)
    val b1 = nation.where(col("n_nationkey") < 5)
      .withColumn("n_name", lit("V1"))
      .unionByName(nation.where(col("n_nationkey") === 10)
        .withColumn("n_nationkey", lit(990))
        .withColumn("n_name", lit("NEWLAND"))
        .withColumn("n_regionkey", lit(0)))
    PropertyGraphIO.upsertNodes(s, root, "Nation", b1, bucketsPerTable = 2)
    val b2 = nation.where(col("n_nationkey") < 3)
      .withColumn("n_name", lit("V2"))
      .unionByName(nation.where(col("n_nationkey") === 10)
        .withColumn("n_nationkey", lit(991))
        .withColumn("n_name", lit("NEWLAND2"))
        .withColumn("n_regionkey", lit(1)))
    PropertyGraphIO.upsertNodes(s, root, "Nation", b2, bucketsPerTable = 2)
    root
  }

  def graphTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import graft.model.PropertyGraphIO
    val root = threeGenerationRoot(s, dir)
    try {
      PropertyGraphIO.nodeGenerations(root, "Nation")
        .map { case (gen, _) =>
          PropertyGraphIO.loadNodesAt(s, root, "Nation", gen)
            .select(lit(gen).as("generation"), col("n_nationkey"),
              col("n_name"), col("n_regionkey"))
        }
        .reduce(_ unionByName _)
        .localCheckpoint(true)
    } finally graft.tools.Fs.deleteRecursively(root)
  }

  /** Change-data-capture read over the generation chain (48d): what
    * changed between the original save (gen 0) and the current snapshot
    * (gen 2) — inserts 990/991 and the V1/V2 rewrites of keys <5, no
    * deletes (upsert never removes). The oracle re-derives every change
    * row from `nation` and the two batch definitions. */
  def graphCdc(s: SparkSession, dir: String): DataFrame = {
    import graft.model.PropertyGraphIO
    val root = threeGenerationRoot(s, dir)
    try {
      PropertyGraphIO.cdcNodes(s, root, "Nation", fromGen = 0L, toGen = 2L)
        .select(col("op"), col("n_nationkey"),
          col("__before.n_name").as("name_before"),
          col("__after.n_name").as("name_after"))
        .localCheckpoint(true)
    } finally graft.tools.Fs.deleteRecursively(root)
  }

  /** Rel-table generation fixture for the CDC twin: Nation—IN_REGION→
    * Region with a `since` property (key·10), then two upserts keyed on
    * the endpoint pair — gen-1 rewrites since of pairs with key < 5 to
    * −1 and inserts (990, 0, 990); gen-2 rewrites pairs with key < 3 to
    * −2 and inserts (991, 1, 991). */
  private def threeGenerationRelRoot(s: SparkSession, dir: String): String = {
    import graft.model.{GraphSchema, LabelSchema, PropertyGraph, PropertyGraphIO,
      RelPattern, RelSchema}
    val root = java.nio.file.Files.createTempDirectory("graft_cdcrels").toString
    val nation = graft.Tables(s, dir, "nation")
    val region = graft.Tables(s, dir, "region")
    // rel tables follow the RelSchema column convention
    // <SrcLabel>_<srcIdProp> for their endpoint pair
    val rel = nation.select(col("n_nationkey").as("Nation_n_nationkey"),
      col("n_regionkey").as("Region_r_regionkey"),
      (col("n_nationkey").cast("long") * 10L).as("since"))
    val pattern = RelPattern("Nation", "IN_REGION", "Region")
    val g = PropertyGraph(
      nodes = Map("Nation" -> nation, "Region" -> region),
      rels = Map(pattern -> rel),
      schema = GraphSchema(
        labels = Seq(LabelSchema("Nation", "n_nationkey", Nil),
          LabelSchema("Region", "r_regionkey", Nil)),
        rels = Seq(RelSchema(pattern, "n_nationkey", "n_regionkey", Nil))))
    PropertyGraphIO.save(g, root, bucketsPerTable = 2)
    val b1 = rel.where(col("Nation_n_nationkey") < 5).withColumn("since", lit(-1L))
      .unionByName(rel.where(col("Nation_n_nationkey") === 10)
        .withColumn("Nation_n_nationkey", lit(990))
        .withColumn("Region_r_regionkey", lit(0))
        .withColumn("since", lit(990L)))
    PropertyGraphIO.upsertRels(s, root, pattern.key, b1, bucketsPerTable = 2)
    val b2 = rel.where(col("Nation_n_nationkey") < 3).withColumn("since", lit(-2L))
      .unionByName(rel.where(col("Nation_n_nationkey") === 10)
        .withColumn("Nation_n_nationkey", lit(991))
        .withColumn("Region_r_regionkey", lit(1))
        .withColumn("since", lit(991L)))
    PropertyGraphIO.upsertRels(s, root, pattern.key, b2, bucketsPerTable = 2)
    root
  }

  /** Relationship CDC over the generation chain (48d twin): what changed
    * between the saved rel table (gen 0) and the current snapshot
    * (gen 2), keyed on the endpoint pair — property updates for keys <5,
    * pair inserts 990/991, no deletes. */
  def graphCdcRels(s: SparkSession, dir: String): DataFrame = {
    import graft.model.PropertyGraphIO
    val root = threeGenerationRelRoot(s, dir)
    try {
      PropertyGraphIO.cdcRels(s, root, "Nation_IN_REGION_Region",
          fromGen = 0L, toGen = 2L)
        .select(col("op"), col("Nation_n_nationkey").as("n_nationkey"),
          col("Region_r_regionkey").as("n_regionkey"),
          col("__before.since").as("since_before"),
          col("__after.since").as("since_after"))
        .localCheckpoint(true)
    } finally graft.tools.Fs.deleteRecursively(root)
  }

  /** Schema-evolution diff between two exports, driver-checked: the
    * "before" schema is the real graph's schema with Supplier (label +
    * its two patterns) and Customer.c_mktsegment removed — the shape of
    * yesterday's model missing what today's source gained. ModelDiff must
    * report exactly the additions; the mapping is schema-sized and
    * SF-invariant, so the oracle is a VALUES literal. */
  def modelDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val after = TpchGraph.load(s, dir).schema
    val before = graft.model.GraphSchema(
      labels = after.labels.filterNot(_.label == "Supplier")
        .map(l => if (l.label == "Customer")
          l.copy(properties = l.properties.filterNot(_.name == "c_mktsegment"))
        else l),
      rels = after.rels.filterNot(r =>
        r.pattern.srcLabel == "Supplier" || r.pattern.dstLabel == "Supplier"),
      constraints = after.constraints,
      indexes = after.indexes)
    graft.export.ModelDiff.diff(before, after)
      .map(e => (e.kind, e.name, e.change, e.detail))
      .toDF("kind", "name", "change", "detail")
  }

  /** All three importer-model format generators, driver-checked: generate
    * each model from the SAME export metadata (no CSV writes), render to
    * JSON text, parse the text back, and report structural entry counts
    * per section — validating generator + renderer + parser for every
    * format the reference emits (v3.0 neo4j_export.py:460, v2.4
    * :731, v0.1 :1042). */
  def modelVersions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.export._
    val g = TpchGraph.load(s, dir)
    val (nodes, rels) = GraphExporter.buildExports(g)
    def size(v: JValue): Long = v match {
      case JArr(items) => items.size.toLong
      case JObj(fields) => fields.size.toLong
      case _ => -1L
    }
    import JsonParser.JOps
    val rows = Seq("3.0", "2.4.0", "0.1.0").map { ver =>
      val parsed = JsonParser.parse(
        ImporterModel.generate(ver, nodes, rels, g.schema.constraints, g.schema.indexes).render())
      val version = (parsed / "version").str
      ver match {
        case "3.0" =>
          val schema = parsed / "dataModel" / "graphSchemaRepresentation" / "graphSchema"
          (version, size(schema / "nodeLabels"), size(schema / "relationshipObjectTypes"),
            size(parsed / "dataModel" / "graphMappingRepresentation" / "dataSourceSchema" / "tableSchemas"))
        case "2.4.0" =>
          val schema = parsed / "dataModel" / "graphSchemaRepresentation" / "graphSchema"
          (version, size(schema / "nodeLabels"),
            size(parsed / "dataModel" / "graphMappingRepresentation" / "relationshipMappings"),
            size(parsed / "dataModel" / "graphMappingRepresentation" / "dataSourceSchema" / "tableSchemas"))
        case _ =>
          (version, size(parsed / "graph" / "nodes"), size(parsed / "graph" / "relationships"),
            size(parsed / "dataModel" / "fileModel" / "fileSchemas"))
      }
    }
    rows.toDF("version", "n_node_entries", "n_rel_entries", "n_table_entries")
  }

  /** Filtered path pattern — the `(c:Customer {segment})` fragment: the
    * predicate anchors the traversal (reaches the customer scan before any
    * hop join), so the whole path enumeration runs over the selective
    * subset. */
  def patternFiltered(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    graft.operators.PatternMatch
      .find(g, "Customer-[PLACED]->Order-[CONTAINS]->Part",
        Map("customer_id" -> (col("c_mktsegment") === "BUILDING")))
      .agg(count(lit(1)).as("n_paths"),
        count_distinct(col("customer_id")).as("n_customers"),
        count_distinct(col("part_id")).as("n_parts"))
  }

  /** OPTIONAL MATCH fragment: every customer, left-joined to its
    * >400k-value orders — customers with none survive with a NULL order
    * binding (the predicate lives INSIDE the optional hop, Cypher
    * semantics). Output is per-customer: total customers preserved,
    * matched order count, and null-binding count — non-vacuous at every
    * SF (most customers have no 400k order). */
  def optionalMatch(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    graft.operators.PatternMatch
      .find(g, "Customer-[PLACED?]->Order",
        Map("order_id" -> (col("o_totalprice") > 400000.0)))
      .agg(count_distinct(col("customer_id")).as("n_customers"),
        count(col("order_id")).as("n_matched_orders"),
        sum(when(col("order_id").isNull, 1L).otherwise(0L)).as("n_unmatched"))
  }

  /** Negation fragment (`WHERE NOT (o)-[:CONTAINS]->(:Part {p_size>45})`):
    * BUILDING customers' orders that contain NO large part — the negated
    * hop compiles to a pre-filtered left_anti join. */
  def negationMatch(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    graft.operators.PatternMatch
      .find(g, "Customer-[PLACED]->Order-[!CONTAINS]->Part",
        Map("customer_id" -> (col("c_mktsegment") === "BUILDING"),
          "part_id" -> (col("p_size") > 45)))
      .agg(count(lit(1)).as("n_orders"),
        count_distinct(col("customer_id")).as("n_customers"))
  }

  /** Multi-label vertices: a table declared under several labels exports
    * once PER label (the reference's `MATCH (n:label) RETURN n` runs label
    * by label — neo4j_export.py:281-292 — so a :Supplier:Vendor node
    * appears in both label tables), with identifier detection PER label:
    * Supplier keys on its s_suppkey unique constraint, Vendor on its own
    * s_name constraint, so the two exports apply DIFFERENT null-identifier
    * filters. Output: both per-label export tables, tagged. */
  def multilabelNodes(s: SparkSession, dir: String): DataFrame = {
    val catalog = GraphCatalog.empty
      .withUnique("Supplier", "s_suppkey")
      .withUnique("Vendor", "s_name")
    val mapper = new TableGraphMapper(
      Seq(NodeMapping("Supplier", "supplier", extraLabels = Seq("Vendor"))), Nil, catalog)
    val g = mapper.load(s, dir)
    g.nodes.toSeq.sortBy(_._1).map { case (label, df) =>
      df.select(lit(label).as("label"), col("s_suppkey"), col("s_name"))
    }.reduce(_ unionAll _)
  }

  /** Schemaless (map-typed) node ingest: documents become property MAPS
    * with heterogeneous keys — `lang` everywhere, `flag` on every third
    * doc, `words` only on long docs — and NodeTableBuilder.fromPropertyMap
    * rebuilds the tabular view as the union of OBSERVED keys with NULL
    * restval (the reference's per-node property-map data model,
    * neo4j_export.py:285-292). The key union is computed distributively;
    * the oracle replays the per-key presence rules in SQL. */
  def mapProperties(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val asMap = docs.select(col("doc_id"), map_filter(map(
      lit("lang"), col("lang"),
      lit("flag"), when(col("doc_id") % 3 === 0, lit("y")).otherwise(lit(null)),
      lit("words"), when(length(col("text")) > 200, length(col("text")).cast("string"))
        .otherwise(lit(null))), (_, v) => v.isNotNull).as("props"))
    NodeTableBuilder.fromPropertyMap(asMap, "doc_id", "props")
  }

  /** Variable-length path matching (`-[*1..2]->`, any relationship
    * type) from a filtered Customer anchor: per (customer, end label,
    * end node, length), how many distinct paths reach it — 1-hop lands
    * on Nation/Order, 2-hop on Region/Part/Supplier. Path multiplicity
    * is Cypher's (each relationship instance extends a distinct path:
    * a part on two line numbers of one order counts twice). */
  def varPaths(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    val anchored = g.copy(nodes = g.nodes.updated("Customer",
      g.nodes("Customer").where(col("c_custkey") < 500)))
    graft.operators.PatternMatch.findVarLength(anchored, "Customer", minHops = 1, maxHops = 2)
  }

  /** UNDIRECTED hop (`-[REL]-`): same-nation customer pairs across two
    * market segments. The second IN_NATION hop has no forward schema
    * pattern Nation→Customer, so the undirected compilation traverses
    * Customer-[IN_NATION]->Nation REVERSED — and both segment predicates
    * push into the traversal as semi-joins. The id inequality post-filter
    * canonicalizes the pair (join semantics have no Cypher relationship-
    * uniqueness; without it c1 = c2 rows would appear — walk semantics,
    * as documented on findVarLength). Aggregated per nation so the
    * output stays dimension-sized at every SF. */
  def undirectedMatch(s: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph.load(s, dir)
    graft.operators.PatternMatch.find(
      g, "Customer-[IN_NATION]->Nation-[IN_NATION]-Customer",
      Map("customer_id_1" -> (col("c_mktsegment") === "BUILDING"),
        "customer_id_2" -> (col("c_mktsegment") === "MACHINERY")))
      .where(col("customer_id_1") < col("customer_id_2"))
      .groupBy(col("nation_id"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("customer_id_1")).as("n_building"),
        count_distinct(col("customer_id_2")).as("n_machinery"))
  }

  /** Multi-type hop (`-[R1|R2]->`): the TPC-H mapping extended with a
    * row-filtered second edge type between Order and Part — RETURNED
    * covers the l_returnflag = 'R' lineitems (EdgeMapping.rowFilter, the
    * conditional-edge import model) — then one pattern traverses the
    * union. Path multiplicity is Cypher's: a returned lineitem matches
    * BOTH types and contributes two paths. */
  def multitypeMatch(s: SparkSession, dir: String): DataFrame = {
    val g = MultiTypeGraph.load(s, dir)
    graft.operators.PatternMatch.find(
      g, "Customer-[PLACED]->Order-[CONTAINS|RETURNED]->Part",
      Map("customer_id" -> (col("c_mktsegment") === "AUTOMOBILE")))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_paths"),
        count_distinct(col("order_id")).as("n_orders"))
  }

  private object MultiTypeGraph {
    import graft.model.{EdgeMapping, TableGraphMapper, TpchGraph}
    private val mapper = new TableGraphMapper(
      TpchGraph.nodes,
      TpchGraph.edges :+ EdgeMapping("RETURNED", "lineitem",
        "Order", "l_orderkey", "Part", "l_partkey",
        rowFilter = Some("l_returnflag = 'R'")),
      TpchGraph.catalog)
    def load(s: SparkSession, dir: String): graft.model.PropertyGraph = mapper.load(s, dir)
  }

  /** The catalog's constraint/index inventory as rows — the engine-side
    * `SHOW CONSTRAINTS` / `SHOW INDEXES` surface (reference
    * neo4j_export.py:83-130,177-227), driver-checked. */
  def catalogInventory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cat = TpchGraph.catalog
    val rows =
      cat.constraints.map(c =>
        ("constraint", c.constraintType, c.name, c.labels.mkString(","), c.properties.mkString(","))) ++
      cat.indexes.map(i =>
        ("index", i.indexType, i.name, i.labels.mkString(","), i.properties.mkString(",")))
    rows.toDF("kind", "subtype", "name", "labels", "properties")
  }

  /** The SQL-registered native text primitives, exercised THROUGH
    * `spark.sql` (not the Column API) so the driver checks the function
    * registration + Catalyst builders end to end. */
  def sqlFunctions(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables(s, dir, "documents").createOrReplaceTempView("g_sqlfn_docs")
    s.sql("""SELECT doc_id,
             CAST(graft_token_count(text) AS BIGINT) AS n_tokens,
             CAST(graft_hamming(doc_id, doc_id DIV 2) AS BIGINT) AS ham,
             graft_fingerprint_md5(text) AS fp_md5
             FROM g_sqlfn_docs""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_catalog_inventory" -> (catalogInventory _),
    "g_sql_functions" -> (sqlFunctions _),
    "g_var_paths" -> (varPaths _),
    "g_map_properties" -> (mapProperties _),
    "g_multilabel_nodes" -> (multilabelNodes _),
    "g_pattern_filtered" -> (patternFiltered _),
    "g_undirected_match" -> (undirectedMatch _),
    "g_multitype_match" -> (multitypeMatch _),
    "g_optional_match" -> (optionalMatch _),
    "g_negation_match" -> (negationMatch _),
    "g_model_versions" -> (modelVersions _),
    "g_graph_io_roundtrip" -> (graphIoRoundtrip _),
    "g_graph_upsert" -> (graphUpsert _),
    "g_graph_time_travel" -> (graphTimeTravel _),
    "g_graph_cdc" -> (graphCdc _),
    "g_graph_cdc_rels" -> (graphCdcRels _),
    "g_model_diff" -> (modelDiff _),
    "g_pattern_match" -> (patternMatch _),
    "g_model_mappings" -> (modelMappings _),
    "g_nodes_customer" -> (nodesCustomer _),
    "g_nodes_part" -> (nodesPart _),
    "g_rel_customer_placed_order" -> (relCustomerPlacedOrder _),
    "g_rel_order_contains_part" -> (relOrderContainsPart _),
    "g_rel_supplier_in_nation" -> (relSupplierInNation _),
    "g_rel_patterns" -> (relPatterns _),
    "g_traverse_nation_parts" -> (traverseNationParts _),
    "g_degree_out_customer" -> (degreeOutCustomer _),
    "g_degree_in_nation" -> (degreeInNation _),
    "g_schema_customer" -> (schemaCustomer _),
    "g_schema_lineitem" -> (schemaLineitem _),
    "g_profile_orders" -> (profileOrders _),
    "g_graph_node_count" -> (graphNodeCount _),
    "g_graph_edge_count" -> (graphEdgeCount _),
    "g_identifier_stats" -> (identifierStats _),
    "g_constraint_check" -> (constraintCheck _),
    "g_type_infer" -> (typeInfer _),
    "g_null_id_filter" -> (nullIdFilter _))

  private val profileOrdersOracle: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    cols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_value,
         |  CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  val oracles: Map[String, String] = Map(
    "g_optional_match" ->
      """WITH big AS (SELECT o_custkey, o_orderkey FROM orders
        |  WHERE o_totalprice > 400000.0 AND o_custkey IS NOT NULL AND o_orderkey IS NOT NULL),
        |j AS (SELECT c.c_custkey, b.o_orderkey
        |  FROM customer c LEFT JOIN big b ON b.o_custkey = c.c_custkey
        |  WHERE c.c_custkey IS NOT NULL)
        |SELECT COUNT(DISTINCT c_custkey) AS n_customers,
        |  COUNT(o_orderkey) AS n_matched_orders,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM j""".stripMargin,
    "g_negation_match" ->
      """WITH co AS (
        |  SELECT c.c_custkey, o.o_orderkey
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey IS NOT NULL
        |    AND o.o_orderkey IS NOT NULL),
        |has_big AS (
        |  SELECT DISTINCT l.l_orderkey FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_size > 45 AND l.l_orderkey IS NOT NULL)
        |SELECT COUNT(*) AS n_orders, COUNT(DISTINCT c_custkey) AS n_customers
        |FROM co WHERE o_orderkey NOT IN (SELECT l_orderkey FROM has_big)""".stripMargin,
    "g_profile_orders" -> profileOrdersOracle,
    "g_catalog_inventory" ->
      """SELECT * FROM (VALUES
        |  ('constraint', 'uniqueness', 'r_regionkey_Region_uniq',   'Region',   'r_regionkey'),
        |  ('constraint', 'uniqueness', 'n_nationkey_Nation_uniq',   'Nation',   'n_nationkey'),
        |  ('constraint', 'uniqueness', 'c_custkey_Customer_uniq',   'Customer', 'c_custkey'),
        |  ('constraint', 'uniqueness', 's_suppkey_Supplier_uniq',   'Supplier', 's_suppkey'),
        |  ('constraint', 'uniqueness', 'p_partkey_Part_uniq',       'Part',     'p_partkey'),
        |  ('constraint', 'uniqueness', 'o_orderkey_Order_uniq',     'Order',    'o_orderkey'),
        |  ('index',      'default',    'c_mktsegment_Customer_idx', 'Customer', 'c_mktsegment'),
        |  ('index',      'default',    'o_orderdate_Order_idx',     'Order',    'o_orderdate')
        |) AS t(kind, subtype, name, labels, properties)""".stripMargin,
    // the registered SQL functions replay as their defining expressions:
    // token count over whitespace split with the empty-text guard,
    // hamming = popcount(xor), md5 fingerprint of lower/trim/whitespace-
    // collapsed content
    "g_sql_functions" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        |  CAST(bit_count(xor(doc_id, doc_id // 2)) AS BIGINT) AS ham,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents""".stripMargin,
    // variable-length paths as a UNION of fixed-hop join chains; the
    // null-endpoint filters mirror RelTableBuilder, and counts replay
    // path multiplicity (lineitem rows, not distinct pairs)
    "g_var_paths" ->
      """WITH c AS (SELECT c_custkey FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_custkey < 500),
        |paths AS (
        |  SELECT CAST(cu.c_custkey AS VARCHAR) AS src_id, 'Nation' AS dst_label,
        |    CAST(cu.c_nationkey AS VARCHAR) AS dst_id, 1 AS hops
        |  FROM customer cu JOIN c ON cu.c_custkey = c.c_custkey
        |  WHERE cu.c_nationkey IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(o_custkey AS VARCHAR), 'Order', CAST(o_orderkey AS VARCHAR), 1
        |  FROM orders JOIN c ON o_custkey = c.c_custkey
        |  WHERE o_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(cu.c_custkey AS VARCHAR), 'Region', CAST(n.n_regionkey AS VARCHAR), 2
        |  FROM customer cu JOIN c ON cu.c_custkey = c.c_custkey
        |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  WHERE cu.c_nationkey IS NOT NULL AND n.n_nationkey IS NOT NULL
        |    AND n.n_regionkey IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(o_custkey AS VARCHAR), 'Part', CAST(l_partkey AS VARCHAR), 2
        |  FROM orders JOIN c ON o_custkey = c.c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(o_custkey AS VARCHAR), 'Supplier', CAST(l_suppkey AS VARCHAR), 2
        |  FROM orders JOIN c ON o_custkey = c.c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderkey IS NOT NULL AND l_suppkey IS NOT NULL)
        |SELECT src_id, dst_label, dst_id, CAST(hops AS BIGINT) AS hops,
        |  COUNT(*) AS n_paths
        |FROM paths GROUP BY src_id, dst_label, dst_id, hops""".stripMargin,
    // observed-key union with NULL restval, replayed as per-key presence
    // rules; every key observed somewhere is a column for ALL rows
    "g_map_properties" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'y' END AS flag,
        |  lang,
        |  CASE WHEN length(text) > 200 THEN CAST(length(text) AS VARCHAR) END AS words
        |FROM documents""".stripMargin,
    // per-label export of a multi-label table: one row set per label,
    // each under its label's own identifier filter (s_suppkey numeric →
    // IS NOT NULL; s_name string → the reference's None/""/"NULL" rule)
    "g_multilabel_nodes" ->
      """SELECT 'Supplier' AS label, s_suppkey, s_name
        |FROM supplier WHERE s_suppkey IS NOT NULL
        |UNION ALL
        |SELECT 'Vendor', s_suppkey, s_name
        |FROM supplier WHERE s_name IS NOT NULL AND s_name <> '' AND s_name <> 'NULL'""".stripMargin,
    // undirected hop ≡ the IN_NATION edge table joined from both ends
    // (the second join is the same customer→nation FK, traversed in
    // reverse); null filters mirror RelTableBuilder's endpoint rules
    "g_undirected_match" ->
      """SELECT a.c_nationkey AS nation_id, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT a.c_custkey) AS n_building,
        |  COUNT(DISTINCT b.c_custkey) AS n_machinery
        |FROM customer a JOIN customer b ON a.c_nationkey = b.c_nationkey
        |WHERE a.c_mktsegment = 'BUILDING' AND b.c_mktsegment = 'MACHINERY'
        |  AND a.c_custkey < b.c_custkey
        |  AND a.c_custkey IS NOT NULL AND a.c_nationkey IS NOT NULL
        |  AND b.c_custkey IS NOT NULL
        |GROUP BY a.c_nationkey""".stripMargin,
    // multi-type hop ≡ UNION ALL of the two edge selections (RETURNED is
    // the rowFilter subset, so returned lineitems contribute two paths)
    "g_multitype_match" ->
      """WITH e AS (
        |  SELECT l_orderkey AS ok, l_partkey AS part_id FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |  UNION ALL
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
        |SELECT e.part_id, COUNT(*) AS n_paths,
        |  COUNT(DISTINCT o.o_orderkey) AS n_orders
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN e ON e.ok = o.o_orderkey
        |WHERE c.c_mktsegment = 'AUTOMOBILE'
        |  AND c.c_custkey IS NOT NULL AND o.o_orderkey IS NOT NULL
        |GROUP BY e.part_id""".stripMargin,
    "g_pattern_filtered" ->
      """SELECT COUNT(*) AS n_paths,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND l_partkey IS NOT NULL""".stripMargin,
    // 6 labels, 6 patterns, 12 CSV tables; v0.1 lists node fileSchemas
    // only — a replicated reference quirk (neo4j_export.py:1042-1219,
    // ModelV01 scaladoc)
    "g_model_versions" ->
      """SELECT * FROM (VALUES
        |  ('3.0.0',        CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(12 AS BIGINT)),
        |  ('2.4.0-beta.0', 6, 6, 12),
        |  ('0.1.0-beta.0', 6, 6, 6)
        |) AS t(version, n_node_entries, n_rel_entries, n_table_entries)""".stripMargin,
    "g_model_diff" ->
      """SELECT * FROM (VALUES
        |  ('node_label', 'Supplier', 'added', 's_suppkey'),
        |  ('property', 'Customer.c_mktsegment', 'added', 'string'),
        |  ('rel_pattern', 'Order_SUPPLIED_BY_Supplier', 'added', 'Order->Supplier'),
        |  ('rel_pattern', 'Supplier_LOCATED_IN_Nation', 'added', 'Supplier->Nation')
        |) AS t(kind, name, change, detail)""".stripMargin,
    "g_graph_upsert" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey < 5 THEN 'UPSERTED' ELSE n_name END AS n_name,
        |  n_regionkey
        |FROM nation
        |UNION ALL SELECT 990, 'NEWLAND', 0""".stripMargin,
    "g_graph_cdc" ->
      """SELECT 'update' AS op, n_nationkey, n_name AS name_before,
        |  CASE WHEN n_nationkey < 3 THEN 'V2' ELSE 'V1' END AS name_after
        |FROM nation WHERE n_nationkey < 5
        |UNION ALL SELECT 'insert', 990, CAST(NULL AS VARCHAR), 'NEWLAND'
        |UNION ALL SELECT 'insert', 991, CAST(NULL AS VARCHAR), 'NEWLAND2'""".stripMargin,
    "g_graph_cdc_rels" ->
      """SELECT 'update' AS op, n_nationkey, n_regionkey,
        |  CAST(n_nationkey AS BIGINT) * 10 AS since_before,
        |  CAST(CASE WHEN n_nationkey < 3 THEN -2 ELSE -1 END AS BIGINT) AS since_after
        |FROM nation WHERE n_nationkey < 5
        |UNION ALL SELECT 'insert', 990, 0, CAST(NULL AS BIGINT), 990
        |UNION ALL SELECT 'insert', 991, 1, CAST(NULL AS BIGINT), 991""".stripMargin,
    "g_graph_time_travel" ->
      """SELECT CAST(0 AS BIGINT) AS generation, n_nationkey, n_name, n_regionkey FROM nation
        |UNION ALL
        |SELECT 1, n_nationkey,
        |  CASE WHEN n_nationkey < 5 THEN 'V1' ELSE n_name END, n_regionkey FROM nation
        |UNION ALL SELECT 1, 990, 'NEWLAND', 0
        |UNION ALL
        |SELECT 2, n_nationkey,
        |  CASE WHEN n_nationkey < 3 THEN 'V2'
        |       WHEN n_nationkey < 5 THEN 'V1' ELSE n_name END, n_regionkey FROM nation
        |UNION ALL SELECT 2, 990, 'NEWLAND', 0
        |UNION ALL SELECT 2, 991, 'NEWLAND2', 1""".stripMargin,
    "g_graph_io_roundtrip" ->
      """SELECT 'node' AS kind, 'Region' AS name, COUNT(*) AS n_rows FROM region WHERE r_regionkey IS NOT NULL
        |UNION ALL SELECT 'node', 'Nation', COUNT(*) FROM nation WHERE n_nationkey IS NOT NULL
        |UNION ALL SELECT 'node', 'Customer', COUNT(*) FROM customer WHERE c_custkey IS NOT NULL
        |UNION ALL SELECT 'node', 'Supplier', COUNT(*) FROM supplier WHERE s_suppkey IS NOT NULL
        |UNION ALL SELECT 'node', 'Order', COUNT(*) FROM orders WHERE o_orderkey IS NOT NULL
        |UNION ALL SELECT 'rel', 'Nation_IN_REGION_Region', COUNT(*) FROM nation
        |  WHERE n_nationkey IS NOT NULL AND n_regionkey IS NOT NULL
        |UNION ALL SELECT 'rel', 'Customer_IN_NATION_Nation', COUNT(*) FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
        |UNION ALL SELECT 'rel', 'Supplier_LOCATED_IN_Nation', COUNT(*) FROM supplier
        |  WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL
        |UNION ALL SELECT 'rel', 'Customer_PLACED_Order', COUNT(*) FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL""".stripMargin,
    "g_pattern_match" ->
      """SELECT l_partkey AS part_id, COUNT(*) AS n_paths,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_partkey IS NOT NULL
        |GROUP BY l_partkey""".stripMargin,
    "g_model_mappings" ->
      """SELECT * FROM (VALUES
        |  ('node', 'Region',   'Region.csv',   'r_regionkey', CAST(2 AS BIGINT)),
        |  ('node', 'Nation',   'Nation.csv',   'n_nationkey', 3),
        |  ('node', 'Customer', 'Customer.csv', 'c_custkey',   5),
        |  ('node', 'Supplier', 'Supplier.csv', 's_suppkey',   4),
        |  ('node', 'Part',     'Part.csv',     'p_partkey',   6),
        |  ('node', 'Order',    'Order.csv',    'o_orderkey',  6),
        |  ('rel', 'Nation_IN_REGION_Region',    'Nation_IN_REGION_Region.csv',    'Nation_n_nationkey->Region_r_regionkey',  2),
        |  ('rel', 'Customer_IN_NATION_Nation',  'Customer_IN_NATION_Nation.csv',  'Customer_c_custkey->Nation_n_nationkey',  2),
        |  ('rel', 'Supplier_LOCATED_IN_Nation', 'Supplier_LOCATED_IN_Nation.csv', 'Supplier_s_suppkey->Nation_n_nationkey',  2),
        |  ('rel', 'Customer_PLACED_Order',      'Customer_PLACED_Order.csv',      'Customer_c_custkey->Order_o_orderkey',    2),
        |  ('rel', 'Order_CONTAINS_Part',        'Order_CONTAINS_Part.csv',        'Order_o_orderkey->Part_p_partkey',        10),
        |  ('rel', 'Order_SUPPLIED_BY_Supplier', 'Order_SUPPLIED_BY_Supplier.csv', 'Order_o_orderkey->Supplier_s_suppkey',    4)
        |) AS t(kind, name, csv_file, key_property, n_columns)""".stripMargin,
    "g_nodes_customer" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment, c_name, c_nationkey
        |FROM customer WHERE c_custkey IS NOT NULL""".stripMargin,
    "g_nodes_part" ->
      """SELECT p_partkey, p_brand, p_name, p_retailprice, p_size, p_type
        |FROM part WHERE p_partkey IS NOT NULL""".stripMargin,
    "g_rel_customer_placed_order" ->
      """SELECT o_custkey AS "Customer_c_custkey", o_orderkey AS "Order_o_orderkey"
        |FROM orders o
        |WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
        |  AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,
    "g_rel_order_contains_part" ->
      """SELECT l_orderkey AS "Order_o_orderkey", l_partkey AS "Part_p_partkey",
        |  l_discount, l_extendedprice, l_linenumber, l_linestatus, l_quantity,
        |  l_returnflag, CAST(l_shipdate AS DATE) AS l_shipdate, l_tax
        |FROM lineitem l
        |WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  AND EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)""".stripMargin,
    "g_rel_supplier_in_nation" ->
      """SELECT s_suppkey AS "Supplier_s_suppkey", s_nationkey AS "Nation_n_nationkey"
        |FROM supplier s
        |WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL
        |  AND EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)""".stripMargin,
    "g_rel_patterns" ->
      """SELECT 'Nation' AS src_label, 'IN_REGION' AS rel_type, 'Region' AS dst_label,
        |  (SELECT count(*) FROM nation WHERE n_nationkey IS NOT NULL AND n_regionkey IS NOT NULL) AS n_edges
        |UNION ALL SELECT 'Customer', 'IN_NATION', 'Nation',
        |  (SELECT count(*) FROM customer WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL)
        |UNION ALL SELECT 'Supplier', 'LOCATED_IN', 'Nation',
        |  (SELECT count(*) FROM supplier WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL)
        |UNION ALL SELECT 'Customer', 'PLACED', 'Order',
        |  (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL)
        |UNION ALL SELECT 'Order', 'CONTAINS', 'Part',
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
        |UNION ALL SELECT 'Order', 'SUPPLIED_BY', 'Supplier',
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL)""".stripMargin,
    "g_traverse_nation_parts" ->
      """SELECT n_name, count(DISTINCT l_partkey) AS n_distinct_parts, count(*) AS n_paths
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "g_degree_out_customer" ->
      """SELECT o_custkey AS "Customer_c_custkey", count(*) AS out_degree
        |FROM orders WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
        |GROUP BY o_custkey""".stripMargin,
    "g_degree_in_nation" ->
      """SELECT c_nationkey AS "Nation_n_nationkey", count(*) AS in_degree
        |FROM customer WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
        |GROUP BY c_nationkey""".stripMargin,
    "g_schema_customer" ->
      """SELECT 'c_custkey' AS property, 'integer' AS type_token,
        |  (SELECT count(*) FROM customer) AS n_rows, (SELECT count(c_custkey) FROM customer) AS n_nonnull
        |UNION ALL SELECT 'c_name', 'string', (SELECT count(*) FROM customer), (SELECT count(c_name) FROM customer)
        |UNION ALL SELECT 'c_nationkey', 'integer', (SELECT count(*) FROM customer), (SELECT count(c_nationkey) FROM customer)
        |UNION ALL SELECT 'c_acctbal', 'float', (SELECT count(*) FROM customer), (SELECT count(c_acctbal) FROM customer)
        |UNION ALL SELECT 'c_mktsegment', 'string', (SELECT count(*) FROM customer), (SELECT count(c_mktsegment) FROM customer)""".stripMargin,
    "g_schema_lineitem" ->
      """SELECT 'l_orderkey' AS property, 'integer' AS type_token,
        |  (SELECT count(*) FROM lineitem) AS n_rows, (SELECT count(l_orderkey) FROM lineitem) AS n_nonnull
        |UNION ALL SELECT 'l_partkey', 'integer', (SELECT count(*) FROM lineitem), (SELECT count(l_partkey) FROM lineitem)
        |UNION ALL SELECT 'l_suppkey', 'integer', (SELECT count(*) FROM lineitem), (SELECT count(l_suppkey) FROM lineitem)
        |UNION ALL SELECT 'l_linenumber', 'integer', (SELECT count(*) FROM lineitem), (SELECT count(l_linenumber) FROM lineitem)
        |UNION ALL SELECT 'l_quantity', 'float', (SELECT count(*) FROM lineitem), (SELECT count(l_quantity) FROM lineitem)
        |UNION ALL SELECT 'l_extendedprice', 'float', (SELECT count(*) FROM lineitem), (SELECT count(l_extendedprice) FROM lineitem)
        |UNION ALL SELECT 'l_discount', 'float', (SELECT count(*) FROM lineitem), (SELECT count(l_discount) FROM lineitem)
        |UNION ALL SELECT 'l_tax', 'float', (SELECT count(*) FROM lineitem), (SELECT count(l_tax) FROM lineitem)
        |UNION ALL SELECT 'l_returnflag', 'string', (SELECT count(*) FROM lineitem), (SELECT count(l_returnflag) FROM lineitem)
        |UNION ALL SELECT 'l_linestatus', 'string', (SELECT count(*) FROM lineitem), (SELECT count(l_linestatus) FROM lineitem)
        |UNION ALL SELECT 'l_shipdate', 'string', (SELECT count(*) FROM lineitem), (SELECT count(l_shipdate) FROM lineitem)""".stripMargin,
    "g_graph_node_count" ->
      """SELECT 'Region' AS label, (SELECT count(*) FROM region WHERE r_regionkey IS NOT NULL) AS n_nodes
        |UNION ALL SELECT 'Nation', (SELECT count(*) FROM nation WHERE n_nationkey IS NOT NULL)
        |UNION ALL SELECT 'Customer', (SELECT count(*) FROM customer WHERE c_custkey IS NOT NULL)
        |UNION ALL SELECT 'Supplier', (SELECT count(*) FROM supplier WHERE s_suppkey IS NOT NULL)
        |UNION ALL SELECT 'Part', (SELECT count(*) FROM part WHERE p_partkey IS NOT NULL)
        |UNION ALL SELECT 'Order', (SELECT count(*) FROM orders WHERE o_orderkey IS NOT NULL)""".stripMargin,
    "g_graph_edge_count" ->
      """SELECT 'IN_REGION' AS rel_type, (SELECT count(*) FROM nation WHERE n_nationkey IS NOT NULL AND n_regionkey IS NOT NULL) AS n_edges
        |UNION ALL SELECT 'IN_NATION', (SELECT count(*) FROM customer WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL)
        |UNION ALL SELECT 'LOCATED_IN', (SELECT count(*) FROM supplier WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL)
        |UNION ALL SELECT 'PLACED', (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL)
        |UNION ALL SELECT 'CONTAINS', (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
        |UNION ALL SELECT 'SUPPLIED_BY', (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL)""".stripMargin,
    "g_identifier_stats" ->
      """SELECT 'c_acctbal' AS property, count(c_acctbal) AS n_nonnull, count(DISTINCT c_acctbal) AS n_distinct,
        |  count(c_acctbal) = count(DISTINCT c_acctbal) AS all_unique FROM customer
        |UNION ALL SELECT 'c_custkey', count(c_custkey), count(DISTINCT c_custkey),
        |  count(c_custkey) = count(DISTINCT c_custkey) FROM customer
        |UNION ALL SELECT 'c_mktsegment', count(c_mktsegment), count(DISTINCT c_mktsegment),
        |  count(c_mktsegment) = count(DISTINCT c_mktsegment) FROM customer
        |UNION ALL SELECT 'c_name', count(c_name), count(DISTINCT c_name),
        |  count(c_name) = count(DISTINCT c_name) FROM customer
        |UNION ALL SELECT 'c_nationkey', count(c_nationkey), count(DISTINCT c_nationkey),
        |  count(c_nationkey) = count(DISTINCT c_nationkey) FROM customer""".stripMargin,
    "g_constraint_check" ->
      """SELECT 'Region' AS label, 'r_regionkey' AS property, count(r_regionkey) AS n_nonnull,
        |  count(DISTINCT r_regionkey) AS n_distinct, count(r_regionkey) = count(DISTINCT r_regionkey) AS valid FROM region
        |UNION ALL SELECT 'Nation', 'n_nationkey', count(n_nationkey), count(DISTINCT n_nationkey),
        |  count(n_nationkey) = count(DISTINCT n_nationkey) FROM nation
        |UNION ALL SELECT 'Customer', 'c_custkey', count(c_custkey), count(DISTINCT c_custkey),
        |  count(c_custkey) = count(DISTINCT c_custkey) FROM customer
        |UNION ALL SELECT 'Supplier', 's_suppkey', count(s_suppkey), count(DISTINCT s_suppkey),
        |  count(s_suppkey) = count(DISTINCT s_suppkey) FROM supplier
        |UNION ALL SELECT 'Part', 'p_partkey', count(p_partkey), count(DISTINCT p_partkey),
        |  count(p_partkey) = count(DISTINCT p_partkey) FROM part
        |UNION ALL SELECT 'Order', 'o_orderkey', count(o_orderkey), count(DISTINCT o_orderkey),
        |  count(o_orderkey) = count(DISTINCT o_orderkey) FROM orders""".stripMargin,
    "g_type_infer" ->
      """WITH s AS (SELECT
        |  min(CAST(p_partkey AS VARCHAR)) AS s_p_partkey,
        |  min(CAST(p_retailprice AS VARCHAR)) AS s_p_retailprice,
        |  min(p_name) AS s_p_name,
        |  min(CAST(p_size AS VARCHAR)) AS s_p_size FROM part)
        |SELECT 'p_partkey' AS property, CASE
        |  WHEN s_p_partkey IS NULL OR s_p_partkey = '' OR s_p_partkey = 'NULL' THEN 'string'
        |  WHEN regexp_full_match(s_p_partkey, '[+-]?[0-9]+') THEN 'integer'
        |  WHEN TRY_CAST(s_p_partkey AS DOUBLE) IS NOT NULL THEN 'float'
        |  WHEN lower(s_p_partkey) IN ('true','false') THEN 'boolean' ELSE 'string' END AS token FROM s
        |UNION ALL SELECT 'p_retailprice', CASE
        |  WHEN s_p_retailprice IS NULL OR s_p_retailprice = '' OR s_p_retailprice = 'NULL' THEN 'string'
        |  WHEN regexp_full_match(s_p_retailprice, '[+-]?[0-9]+') THEN 'integer'
        |  WHEN TRY_CAST(s_p_retailprice AS DOUBLE) IS NOT NULL THEN 'float'
        |  WHEN lower(s_p_retailprice) IN ('true','false') THEN 'boolean' ELSE 'string' END FROM s
        |UNION ALL SELECT 'p_name', CASE
        |  WHEN s_p_name IS NULL OR s_p_name = '' OR s_p_name = 'NULL' THEN 'string'
        |  WHEN regexp_full_match(s_p_name, '[+-]?[0-9]+') THEN 'integer'
        |  WHEN TRY_CAST(s_p_name AS DOUBLE) IS NOT NULL THEN 'float'
        |  WHEN lower(s_p_name) IN ('true','false') THEN 'boolean' ELSE 'string' END FROM s
        |UNION ALL SELECT 'p_size', CASE
        |  WHEN s_p_size IS NULL OR s_p_size = '' OR s_p_size = 'NULL' THEN 'string'
        |  WHEN regexp_full_match(s_p_size, '[+-]?[0-9]+') THEN 'integer'
        |  WHEN TRY_CAST(s_p_size AS DOUBLE) IS NOT NULL THEN 'float'
        |  WHEN lower(s_p_size) IN ('true','false') THEN 'boolean' ELSE 'string' END FROM s""".stripMargin,
    "g_null_id_filter" ->
      """SELECT 'Customer' AS label, (SELECT count(*) FROM customer) AS n_total,
        |  (SELECT count(c_custkey) FROM customer) AS n_valid
        |UNION ALL SELECT 'Order', (SELECT count(*) FROM orders), (SELECT count(o_orderkey) FROM orders)
        |UNION ALL SELECT 'Part', (SELECT count(*) FROM part), (SELECT count(p_partkey) FROM part)""".stripMargin)
}
