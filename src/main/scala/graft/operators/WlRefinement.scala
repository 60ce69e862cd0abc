package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 1-dimensional Weisfeiler–Leman vertex refinement (color refinement) —
  * the structural-fingerprint primitive under graph-isomorphism tests
  * and WL graph kernels (Shervashidze et al., JMLR 2011), and the
  * theoretical ceiling of message-passing GNN expressiveness: after r
  * rounds two vertices share a color iff their depth-r neighborhood
  * trees agree.
  *
  * color₀(v) = degree; colorᵣ(v) = H(colorᵣ₋₁(v) ‖ sorted multiset of
  * neighbor colorᵣ₋₁). H is the engine-portable 60-bit md5
  * ([[Dedup.md5Long]]) over a canonical string form, so every round
  * replays bit-for-bit in SQL — the injective-enough relabeling the
  * algorithm needs, with no driver-side dictionary (the textbook
  * "compress labels to consecutive ints" step needs a global sorted
  * dictionary per round; a collision-negligible 60-bit hash gives the
  * same partition refinement as one distributed map).
  *
  * Scale shape per round: one edge⋈color equi-join (colors shuffle,
  * 16 bytes/vertex — never adjacency lists) and one map-side-combined
  * sort-agg per vertex; rounds checkpoint to cut lineage. Colors are
  * comparable ACROSS graphs (no per-graph dictionary), so per-color
  * histograms of two graphs diff directly — the WL-kernel feature map.
  */
object WlRefinement {

  /** Per-vertex WL colors after `rounds` refinement rounds over the
    * UNDIRECTED simple graph of `edges` (src/dst columns; directions
    * merged, self-loops dropped). Returns (vid, color). */
  def wlColors(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    var colors = und.groupBy("src").agg(count(lit(1)).cast("long").as("color"))
      .withColumnRenamed("src", "vid")
    for (_ <- 1 to rounds) {
      val nbr = und.join(colors.withColumnRenamed("vid", "dst"), "dst")
        .groupBy("src")
        .agg(concat_ws(",",
          transform(array_sort(collect_list(col("color"))), c => c.cast("string")))
          .as("ncs"))
        .withColumnRenamed("src", "vid")
      colors = colors.join(nbr, "vid")
        .select(col("vid"),
          Dedup.md5Long(concat(col("color").cast("string"), lit("|"), col("ncs")))
            .as("color"))
        .localCheckpoint(true)
    }
    colors
  }

  /** WL-kernel feature map: color → vertex count after `rounds`.
    * Histograms of two graphs join on color for the kernel product. */
  def wlHistogram(edges: DataFrame, rounds: Int): DataFrame =
    wlColors(edges, rounds).groupBy("color")
      .agg(count(lit(1)).as("n_vertices"))
}
