package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Immutable open-addressing long→long hash map, built once on the
  * driver and shared via a plain `SparkContext.broadcast` — the data
  * structure behind [[BroadcastLongMapLookup]].
  *
  * Why not a SQL broadcast join: a `BroadcastExchange` rebuilds its
  * hash relation from scratch on EVERY query execution (exchange reuse
  * does not span executions), so a round loop that broadcasts a V-row
  * value table pays a driver-side collect + UnsafeRow-page build +
  * torrent serialize per round — the measured ~0.5 s zero-job gap in
  * the coreness trace. A manual broadcast of this map is built from the
  * round's ALREADY-COLLECTED result rows (no extra collect job), with
  * two primitive-array writes per entry, and the base generation is
  * broadcast ONCE — later rounds ship only a small overlay.
  *
  * Layout: power-of-two capacity at ≤0.5 load factor, linear probing,
  * key 0 kept out-of-band (0 is the empty-slot marker). Lookups are a
  * murmur-scrambled probe over two long arrays — no boxing, safe for
  * concurrent readers after construction, and the generated code calls
  * [[get]] directly from whole-stage codegen. */
final class LongLongMap private (
    keys: Array[Long], vals: Array[Long], mask: Int,
    hasZero: Boolean, zeroVal: Long) extends Serializable {

  /** Value for `k`, or `default` when absent. */
  def get(k: Long, default: Long): Long = {
    if (k == 0L) return if (hasZero) zeroVal else default
    var i = LongLongMap.scramble(k) & mask
    var kk = keys(i)
    while (kk != 0L) {
      if (kk == k) return vals(i)
      i = (i + 1) & mask
      kk = keys(i)
    }
    default
  }

  def size: Int = { var n = 0; var i = 0
    while (i < keys.length) { if (keys(i) != 0L) n += 1; i += 1 }
    n + (if (hasZero) 1 else 0) }

  /** All (key, value) pairs, driver-side — the fold path: merging an
    * outgrown overlay back into a new base generation. */
  def pairs: Iterator[(Long, Long)] = {
    val live = keys.indices.iterator.filter(keys(_) != 0L)
      .map(i => (keys(i), vals(i)))
    if (hasZero) Iterator((0L, zeroVal)) ++ live else live
  }
}

object LongLongMap {
  /** 64-bit finalizer (splitmix64's mixer): maps clustered vertex ids
    * to uniform probe starts so linear probing stays O(1). */
  private[functions] def scramble(k: Long): Int = {
    var z = k + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt
  }

  val Empty: LongLongMap = build(Iterator.empty, 0)

  /** Build from (key, value) pairs; a later duplicate key overwrites an
    * earlier one (the overlay-accumulation contract). */
  def build(pairs: Iterator[(Long, Long)], sizeHint: Int): LongLongMap = {
    var cap = 16
    while (cap < sizeHint * 2) cap <<= 1 // ≤0.5 load factor
    var keys = new Array[Long](cap)
    var vals = new Array[Long](cap)
    var mask = cap - 1
    var n = 0
    var hasZero = false
    var zeroVal = 0L
    def put(k: Long, v: Long): Unit = {
      var i = scramble(k) & mask
      while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
      if (keys(i) == 0L) n += 1
      keys(i) = k; vals(i) = v
    }
    pairs.foreach { case (k, v) =>
      if (k == 0L) { hasZero = true; zeroVal = v }
      else {
        if ((n + 1) * 2 > cap) { // grow (sizeHint was an underestimate)
          val ok = keys; val ov = vals
          cap <<= 1; mask = cap - 1; n = 0
          keys = new Array[Long](cap); vals = new Array[Long](cap)
          var i = 0
          while (i < ok.length) { if (ok(i) != 0L) put(ok(i), ov(i)); i += 1 }
        }
        put(k, v)
      }
    }
    new LongLongMap(keys, vals, mask, hasZero, zeroVal)
  }
}

/** Codegen value lookup into a broadcast overlay+base [[LongLongMap]]
  * pair: `overlay.getOrElse(k, base.getOrElse(k, default))`.
  *
  * This is the round-loop replacement for a per-round V-row broadcast
  * hash join (see [[LongLongMap]]): the base generation broadcasts
  * once, each round broadcasts only the rows that changed, and the
  * probe is two primitive-array lookups inside whole-stage codegen — a
  * join operator disappears from the plan entirely, so partitioning
  * and ordering of the probed stream flow through untouched.
  *
  * `Absent` ([[Long.MinValue]]) is the internal miss sentinel; stored
  * values must never equal it (vertex values in every caller are ≥ 0). */
case class BroadcastLongMapLookup(child: Expression,
    @transient overlay: Broadcast[LongLongMap],
    @transient base: Broadcast[LongLongMap],
    default: Long) extends UnaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val o = overlay.value
  @transient private lazy val b = base.value

  override def nullSafeEval(k: Any): Any = {
    val key = k.asInstanceOf[Long]
    val ov = o.get(key, Long.MinValue)
    if (ov != Long.MinValue) ov else b.get(key, default)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val oRef = ctx.addReferenceObj("overlayBc", overlay,
      classOf[Broadcast[LongLongMap]].getName)
    val bRef = ctx.addReferenceObj("baseBc", base,
      classOf[Broadcast[LongLongMap]].getName)
    val cls = classOf[LongLongMap].getName
    // one Broadcast.value() per generated-class instance, not per row
    val oMap = ctx.addMutableState(cls, "overlayMap",
      v => s"$v = ($cls) $oRef.value();")
    val bMap = ctx.addMutableState(cls, "baseMap",
      v => s"$v = ($cls) $bRef.value();")
    nullSafeCodeGen(ctx, ev, k => {
      val ov = ctx.freshName("ov")
      s"""
         |long $ov = $oMap.get($k, java.lang.Long.MIN_VALUE);
         |${ev.value} = ($ov != java.lang.Long.MIN_VALUE) ? $ov : $bMap.get($k, ${default}L);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastLongMapLookup =
    copy(child = newChild)
}

object BroadcastLongMapLookup {
  def apply(key: Column, overlay: Broadcast[LongLongMap],
      base: Broadcast[LongLongMap], default: Long): Column =
    ColumnBridge.column(new BroadcastLongMapLookup(
      ColumnBridge.expression(key), overlay, base, default))
}
