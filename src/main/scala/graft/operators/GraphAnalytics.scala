package graft.operators

import graft.model.PropertyGraph
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph analytics (SURVEY §2.4) — the "GraphX/Pregel for analytics"
  * half of the engine's north star.
  *
  * Node labels have independent key spaces (c_custkey=1 and o_orderkey=1
  * are different vertices), so vertices get a global 64-bit id:
  * labelIndex << 44 | key (keys < 2^44, label count < 2^20). The encoding
  * is reversible, so results come back as (label, node_id) DataFrames.
  */
object GraphAnalytics {

  private val LabelShift = 44

  /** Unified edge list of a PropertyGraph: one DataFrame of encoded
    * (src, dst) global vertex ids. Labels are indexed in sorted order for
    * determinism. */
  def unifiedEdges(g: PropertyGraph): (DataFrame, Seq[String]) = {
    val labels = g.nodes.keys.toSeq.sorted
    val index = labels.zipWithIndex.toMap
    val parts = g.rels.toSeq.sortBy(_._1.key).map { case (pattern, df) =>
      val Seq(srcCol, dstCol) = df.columns.take(2).toSeq
      Seq(srcCol, dstCol).foreach { c =>
        import org.apache.spark.sql.types._
        val ok = df.schema(c).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        require(ok,
          s"graph analytics need integral node ids; ${pattern.key}.$c is ${df.schema(c).dataType} " +
            "(hash string ids to long before calling, e.g. xxhash64)")
      }
      df.select(
        (col(srcCol).cast("long") + lit(index(pattern.srcLabel).toLong << LabelShift)).as("src"),
        (col(dstCol).cast("long") + lit(index(pattern.dstLabel).toLong << LabelShift)).as("dst"))
    }
    (parts.reduce(_.unionAll(_)), labels)
  }

  /** Decode global vertex ids back to (label, node_id). */
  def decode(df: DataFrame, idCol: String, labels: Seq[String]): DataFrame = {
    val labelArr = array(labels.map(lit): _*)
    df.withColumn("label", element_at(labelArr, (shiftright(col(idCol), LabelShift) + 1).cast("int")))
      .withColumn("node_id", col(idCol).bitwiseAND(lit((1L << LabelShift) - 1)))
      .drop(idCol)
  }

  private def toGraphX(edges: DataFrame): Graph[Int, Int] = {
    val edgeRdd: RDD[Edge[Int]] = edges.select(col("src"), col("dst")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRdd, defaultValue = 0)
  }

  /** Static PageRank over the unified graph. */
  def pageRank(g: PropertyGraph, numIter: Int = 10, resetProb: Double = 0.15): DataFrame = {
    val (edges, labels) = unifiedEdges(g)
    val spark = edges.sparkSession
    val ranks = toGraphX(edges).staticPageRank(numIter, resetProb).vertices
    import spark.implicits._
    decode(ranks.toDF("vid", "pagerank"), "vid", labels)
      .select(col("label"), col("node_id"), col("pagerank"))
  }

  /** Connected components (undirected) via GraphX. */
  def connectedComponents(g: PropertyGraph): DataFrame = {
    val (edges, labels) = unifiedEdges(g)
    val spark = edges.sparkSession
    val cc = toGraphX(edges).connectedComponents().vertices
    import spark.implicits._
    decode(cc.toDF("vid", "component"), "vid", labels)
      .select(col("label"), col("node_id"), col("component"))
  }

  /** Per-vertex triangle counts via GraphX (canonicalized edges). */
  def triangleCounts(g: PropertyGraph): DataFrame = {
    val (edges, labels) = unifiedEdges(g)
    val spark = edges.sparkSession
    val canonical = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    val tc = toGraphX(canonical).triangleCount().vertices
    import spark.implicits._
    decode(tc.toDF("vid", "triangles"), "vid", labels)
      .select(col("label"), col("node_id"), col("triangles").cast("long").as("triangles"))
  }

  /** Degree distribution of the unified graph: how many vertices have each
    * (in+out) degree — the classic first look at any 100 TB graph. */
  def degreeDistribution(g: PropertyGraph): DataFrame = {
    val (edges, _) = unifiedEdges(g)
    val deg = edges.select(col("src").as("vid"))
      .unionAll(edges.select(col("dst").as("vid")))
      .groupBy("vid").agg(count(lit(1)).as("degree"))
    deg.groupBy("degree").agg(count(lit(1)).as("n_vertices"))
  }
}

/** Pregel-style iterative propagation on DataFrames (SURVEY §2.4 #19).
  *
  * GraphX keeps the graph as RDDs with full lineage; at very large scale
  * (or many iterations) lineage growth and RDD serialization become the
  * bottleneck. This loop keeps everything in DataFrames — joins get AQE
  * skew handling, Tungsten encoding, and codegen — and truncates the plan
  * with localCheckpoint every few rounds, which is the standard recipe for
  * iterative DataFrame algorithms.
  */
object DataFramePregel {

  /** Iterate `step` until convergence or maxIter. `step` maps the current
    * vertex DataFrame to the next one; convergence = no row changed
    * (exceptAll probe). Each round is eagerly localCheckpoint'ed: the
    * convergence probe forces computation anyway, and truncating lineage
    * keeps round N's plan O(1) instead of O(N). */
  def iterate(vertices: DataFrame, maxIter: Int)(step: DataFrame => DataFrame): DataFrame = {
    var current = vertices.localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val next = step(current).localCheckpoint(true)
      if (next.exceptAll(current).limit(1).count() == 0) converged = true
      else current = next
      i += 1
    }
    current
  }

  /** Connected components by iterative min-id propagation — each round a
    * vertex adopts the smallest component id among itself and its
    * neighbors. Undirected: edges used in both directions.
    *
    * Convergence probe: component ids only ever decrease, so the sum of
    * components strictly decreases until fixpoint — a one-row aggregate
    * per round instead of a full exceptAll diff (which would shuffle the
    * entire vertex set twice per iteration).
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 30): DataFrame = {
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionAll(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .localCheckpoint(true)
    var vs = und.select(col("a").as("vid")).distinct()
      .withColumn("component", col("vid"))
      .localCheckpoint(true)
    var prevSum = BigDecimal(-1)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val msgs = und.join(vs, und("a") === vs("vid"))
        .select(col("b").as("vid"), col("component"))
      val next = vs.unionAll(msgs)
        .groupBy("vid").agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
      val sumNow = BigDecimal(s)
      if (sumNow == prevSum) converged = true else { prevSum = sumNow; vs = next }
      i += 1
    }
    vs
  }
}
