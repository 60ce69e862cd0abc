package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landmark (pivot) distance features — the embedding standard for
  * distance estimation and graph-ML features (Potamias et al., CIKM
  * 2009): pick L landmarks, compute every vertex's hop distance to
  * EACH landmark, and d(u,v) upper-bounds as min_l d(u,l)+d(l,v) with
  * no per-query traversal.
  *
  * Landmarks are the L minimum-md5(seed, vid) vertices — derandomized,
  * content-deterministic, engine-replayable (the [[Mis]] priority
  * trick applied to selection). Distances run as ONE labeled BFS: the
  * frontier state is (vid, landmark, dist) and each round is one
  * edge⋈state join + a min-combine keyed (vid, landmark) — L wavefronts
  * share every scan instead of running L separate traversals
  * (multi-source labeled relaxation, the [[GraphAnalytics.ssspDistances]]
  * shape with the landmark riding the key). Unreached (vertex,
  * landmark) pairs are absent — sparse output, as at scale a bounded
  * `rounds` horizon is also the memory bound: state never exceeds
  * reached-pairs rows.
  */
object Landmarks {

  /** (vid, landmark, dist) hop distances for every reached pair after
    * `rounds` BFS rounds over the undirected graph.
    *
    * FRONTIER rounds, keyed (vid, landmark) — the
    * [[GraphAnalytics.ssspDistancesWithStats]] recipe with the landmark
    * riding the key: a (vid, landmark) pair settles at its true hop
    * distance the round it is first reached, so each round relaxes only
    * the pairs reached LAST round, per-round state is bit-identical to
    * the dense relaxation (the SQL oracle replays dense rounds
    * unchanged), and an empty frontier short-circuits the remaining
    * identity rounds. State is DENSE-INIT: all V × L pairs from round 0
    * (dist NULL = unreached, `fresh` marking the wavefront),
    * localCheckpoint-ed each round (flat plans — see the sssp scaladoc
    * for why persist alone grows the driver-side plan ~4×/round); the
    * merge streams the state through a BroadcastHashJoin against the
    * wavefront-sized relaxed messages, and the min-combine keyed
    * (vid, landmark) runs in place on the v-pinned edge cache —
    * HashPartitioning(v) satisfies the (v, landmark) clustering. Three
    * jobs and zero exchange per round in broadcast mode. The L× state
    * (V × L rows vs the sparse reached-pairs form) is the price of the
    * exchange-free merge; L is small by the operator's contract (a
    * handful of pivots), so the trade wins. */
  def landmarkDistances(edges: DataFrame, nLandmarks: Int, rounds: Int,
      seed: Long = 7L, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(nLandmarks >= 1 && rounds >= 0, "need nLandmarks >= 1, rounds >= 0")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v"))
    // one shuffle stages the edge list: repartition by the message key v
    // first, then the dedup distinct runs exchange-free on top
    // (HashPartitioning(v) satisfies the (u, v) clustering) and the
    // result is already pinned for the rounds (the sssp staging shape,
    // volume-GATED the same way via GraphAnalytics.volumeStage: sized
    // below the config cap, bare and unpinned once the cap binds)
    val undRowsBound = 2 * e0.count()
    val (eSrc, undParts) = GraphAnalytics.volumeStage(e0, undRowsBound)
    val und = GraphAnalytics.persistPinned(GraphAnalytics.repartitionSized(
        eSrc.unionAll(eSrc.select(col("v").as("u"), col("u").as("v"))),
        undParts, col("v")).distinct(), undRowsBound)
    val verts = und.select(col("u").as("vid")).distinct().localCheckpoint(true)
    val useBroadcast =
      verts.count() * nLandmarks <= GraphAnalytics.maxBroadcastVerticesDyn
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (useBroadcast) broadcast(df) else df
    val landmarks = verts
      .withColumn("p", Dedup.md5Long(concat(lit(s"$seed:"), col("vid").cast("string"))))
      .orderBy(col("p").asc, col("vid").asc).limit(nLandmarks)
      .select(col("vid").as("landmark")).localCheckpoint(true)
    var dist = verts
      .crossJoin(broadcast(landmarks))
      .select(col("vid"), col("landmark"),
        when(col("vid") === col("landmark"), lit(0L)).as("dist"))
      .withColumn("fresh", col("dist").isNotNull)
      .localCheckpoint(true)
    var moved = -1L
    var r = 0
    while (r < rounds && moved != 0L) {
      r += 1
      val frontier = dist.where(col("fresh"))
        .select(col("vid"), col("landmark"), col("dist"))
      val relaxed = und.join(maybeBroadcast(frontier), und("u") === frontier("vid"))
        .select(und("v").as("vid"), col("landmark"), (col("dist") + 1).as("nd"))
        .groupBy("vid", "landmark").agg(min(col("nd")).as("nd"))
      val merged = dist.join(maybeBroadcast(relaxed), Seq("vid", "landmark"), "left_outer")
        .select(col("vid"), col("landmark"),
          least(coalesce(col("dist"), col("nd")), coalesce(col("nd"), col("dist"))).as("dist"),
          (col("nd").isNotNull && col("dist").isNull).as("fresh"))
        .localCheckpoint(false)
      // the round's single materializing action + short-circuit
      moved = merged.where(col("fresh")).count()
      dist = merged
    }
    val out = dist.where(col("dist").isNotNull)
      .select(col("vid"), col("landmark"), col("dist")).localCheckpoint(true)
    und.unpersist(blocking = false)
    out
  }
}
