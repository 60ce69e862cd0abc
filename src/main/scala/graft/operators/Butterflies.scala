package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Butterfly (2×2 biclique) counting over a bipartite graph — the
  * bipartite analog of triangle counting and the basis of bipartite
  * clustering coefficients and dense-region discovery (Wang et al.,
  * VLDB 2014; Sanei-Mehri et al., KDD 2018). A butterfly is a pair of
  * left vertices sharing a pair of right vertices (a 4-cycle).
  *
  * Counted from the SMALLER side's wedges: per left pair (u, v) with w
  * common right neighbors there are C(w, 2) butterflies, so
  * total = Σ C(w, 2) — one self-join on the right key and one
  * map-side-combined count, never a 4-way join. The wedge join is the
  * quadratic-in-hot-key shape (a right vertex of degree d contributes
  * C(d, 2) wedge rows), so `maxRightDegree` drops pathological hubs
  * exactly like Dedup's `maxBucketSize` — the counts then read "over
  * the ≤cap-degree subgraph", the standard practice for web-scale
  * bipartite graphs where a single hub otherwise dominates both
  * runtime and signal.
  */
object Butterflies {

  /** Global butterfly statistics of the (leftCol, rightCol) bipartite
    * edge set: one row with n_edges, n_wedges (left pairs × common
    * neighbors), n_butterflies. */
  def globalCount(edges: DataFrame, leftCol: String, rightCol: String,
      maxRightDegree: Int = 10000): DataFrame = {
    // the capped edge list feeds both the wedge join (twice, as the two
    // self-join sides) and the edge count — materialize it once or the
    // dedup + degree-cap subplan re-executes per consumer (the
    // loop-invariant rule; the audit showed 20 exchanges without this)
    val e = dedupCapped(edges, leftCol, rightCol, maxRightDegree)
      .localCheckpoint(true)
    val wedges = wedgesOf(e)
    val stats = wedges.agg(
      sum(col("w")).cast("long").as("n_wedges"),
      sum(expr("(w * (w - 1)) div 2")).cast("long").as("n_butterflies"))
    e.agg(count(lit(1)).as("n_edges")).crossJoin(stats)
      .select(col("n_edges"),
        coalesce(col("n_wedges"), lit(0L)).as("n_wedges"),
        coalesce(col("n_butterflies"), lit(0L)).as("n_butterflies"))
  }

  /** Per-left-vertex butterfly participation: for vertex u,
    * Σ_v C(common(u,v), 2) over all partners v. */
  def perLeftVertex(edges: DataFrame, leftCol: String, rightCol: String,
      maxRightDegree: Int = 10000): DataFrame = {
    val wedges = wedgesOf(
      dedupCapped(edges, leftCol, rightCol, maxRightDegree).localCheckpoint(true))
    val perPair = wedges.select(col("a"), col("b"),
      expr("(w * (w - 1)) div 2").cast("long").as("bf"))
    perPair.select(col("a").as("vid"), col("bf"))
      .unionAll(perPair.select(col("b").as("vid"), col("bf")))
      .groupBy("vid").agg(sum(col("bf")).cast("long").as("butterflies"))
      .where(col("butterflies") > 0)
  }

  private def dedupCapped(edges: DataFrame, leftCol: String, rightCol: String,
      maxRightDegree: Int): DataFrame = {
    val e = edges.select(col(leftCol).as("l"), col(rightCol).as("r")).distinct()
    val deg = e.groupBy("r").agg(count(lit(1)).as("rd"))
    e.join(deg.where(col("rd") <= maxRightDegree).select("r"), "r")
  }

  /** (a < b, w): left pairs and their common-right-neighbor counts over
    * an already-capped (l, r) edge list. */
  private def wedgesOf(e: DataFrame): DataFrame =
    e.as("x").join(e.as("y"), Seq("r"))
      .where(col("x.l") < col("y.l"))
      .groupBy(col("x.l").as("a"), col("y.l").as("b"))
      .agg(count(lit(1)).as("w"))
}
