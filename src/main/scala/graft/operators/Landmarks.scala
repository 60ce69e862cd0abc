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
    * `rounds` BFS rounds over the undirected graph. */
  def landmarkDistances(edges: DataFrame, nLandmarks: Int, rounds: Int,
      seed: Long = 7L, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(nLandmarks >= 1 && rounds >= 0, "need nLandmarks >= 1, rounds >= 0")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v"))
    val und = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(true)
    val landmarks = und.select(col("u")).distinct()
      .withColumn("p", Dedup.md5Long(concat(lit(s"$seed:"), col("u").cast("string"))))
      .orderBy(col("p").asc, col("u").asc).limit(nLandmarks)
      .select(col("u").as("landmark")).localCheckpoint(true)
    var dist = landmarks
      .select(col("landmark").as("vid"), col("landmark"), lit(0L).as("dist"))
      .localCheckpoint(true)
    (1 to rounds).foreach { i =>
      val relaxed = und.join(dist, und("u") === dist("vid"))
        .select(und("v").as("vid"), col("landmark"), (col("dist") + 1).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("vid", "landmark").agg(min(col("dist")).as("dist"))
      if (i % 2 == 0 || i == rounds) dist = dist.localCheckpoint(true)
    }
    dist
  }
}
