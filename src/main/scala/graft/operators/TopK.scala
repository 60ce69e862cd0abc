package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed top-k per key with bounded memory (SURVEY §4).
  *
  * `Window.partitionBy(key).orderBy(ord)` + `row_number <= k` shuffles and
  * sorts EVERY row of every key. At 100 TB that is the bottleneck: the
  * winner set is tiny but the whole input moves. This operator prunes
  * first — each input partition keeps at most k rows per key via a local
  * bounded heap (mapPartitions, no shuffle), so the subsequent exact
  * window pass sees ≤ numPartitions·k rows per key instead of all of them.
  * Spark's own InferWindowGroupLimit performs a similar local prune for
  * rank-like windows; this form works for any (key, ordering) pair and
  * documents the pattern explicitly.
  */
object TopK {

  /** Top `k` rows per `keyCol`, largest `ordCol` first. Deterministic
    * final ordering: ties broken by the remaining columns' window order is
    * delegated to `tieBreak`. */
  def perKey(df: DataFrame, keyCol: String, ordCol: String, k: Int,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(k > 0, "k must be positive")
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val ordIdx = schema.fieldIndex(ordCol)
    val tieIdx = tieBreak.map(schema.fieldIndex)

    // local prune: bounded heap of k rows per key per partition
    val pruned = df.mapPartitions { it =>
      val heaps = scala.collection.mutable.Map.empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      // Exact typed comparison: routing longs through doubleValue() loses
      // precision above 2^53 and could evict the true top-k row before the
      // exact window pass. NULL ordering values sort as smallest (evicted
      // first), matching the final window's desc-nulls-last order.
      def cmpOrdValue(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _)    => -1
        case (_, null)    => 1
        case (x: java.lang.Byte, y: java.lang.Byte)       => x.compareTo(y)
        case (x: java.lang.Short, y: java.lang.Short)     => x.compareTo(y)
        case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
        case (x: java.lang.Long, y: java.lang.Long)       => x.compareTo(y)
        case (x: java.lang.Float, y: java.lang.Float)     => x.compareTo(y)
        case (x: java.lang.Double, y: java.lang.Double)   => x.compareTo(y)
        case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
        case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
        case (x: String, y: String)                       => x.compareTo(y)
        case (x: java.sql.Date, y: java.sql.Date)         => x.compareTo(y)
        case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
        case (x: java.time.LocalDate, y: java.time.LocalDate) => x.compareTo(y)
        case (x: java.time.Instant, y: java.time.Instant) => x.compareTo(y)
        case (x, _) => throw new IllegalArgumentException(
          s"unsupported ordering column type: ${x.getClass.getName}")
      }
      // Tie-break comparison is TYPED per column, same comparator as the
      // ordering column: the exact window pass sorts tie columns typed
      // ascending, and a lexicographic fallback diverges for numerics
      // ("10" < "9") — the local prune could then evict a row the window
      // would keep when >k rows tie on ordCol.
      def cmpTie(a: Row, b: Row): Int = {
        var i = 0
        while (i < tieIdx.length) {
          val c = cmpOrdValue(a.getAs[Any](tieIdx(i)), b.getAs[Any](tieIdx(i)))
          if (c != 0) return c
          i += 1
        }
        0
      }
      // min-heap: the WORST row (smallest ord, then largest tie value —
      // the window sorts ties ascending, so larger loses) gets the highest
      // priority so dequeue() drops it
      implicit val ord: Ordering[Row] = new Ordering[Row] {
        def compare(a: Row, b: Row): Int = {
          val c = -cmpOrdValue(a.getAs[Any](ordIdx), b.getAs[Any](ordIdx))
          if (c != 0) c else cmpTie(a, b)
        }
      }
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.getAs[Any](keyIdx),
          scala.collection.mutable.PriorityQueue.empty[Row])
        h.enqueue(r)
        if (h.size > k) h.dequeue() // drop current worst
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))

    // exact pass over the pruned survivors
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).desc +: tieBreak.map(col(_).asc): _*)
    pruned.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .drop("__rank")
  }
}
