package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (SURVEY §2.7).
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) evaluate a
  * lambda per element in interpreted mode — microseconds per element.
  * These expressions generate a tight primitive loop inside whole-stage
  * codegen (nanoseconds per element), which is the difference between an
  * ANN rerank being free and being the bottleneck at 100 TB.
  */
private object VecCodegen {
  /** Java accessor snippet for an array element of the given type. */
  def getter(elem: DataType, arr: String, i: String): String = elem match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case t => throw new IllegalArgumentException(s"vector element type $t unsupported")
  }

  def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => throw new IllegalArgumentException(s"expected array, got $t")
  }

  def reader(elem: DataType): (ArrayData, Int) => Double = elem match {
    case FloatType  => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case t => throw new IllegalArgumentException(s"vector element type $t unsupported")
  }
}

/** Dot product of two float/double array columns, in double. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  @transient private lazy val readL = VecCodegen.reader(VecCodegen.elemType(left))
  @transient private lazy val readR = VecCodegen.reader(VecCodegen.elemType(right))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += readL(a, i) * readR(b, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val ga = VecCodegen.getter(VecCodegen.elemType(left), a, i)
      val gb = VecCodegen.getter(VecCodegen.elemType(right), b, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $ga * $gb; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Fixed-point dot: Σ floor(xᵢ·wᵢ + 0.5) as an exact BIGINT, where the
  * RIGHT side carries weights ALREADY SCALED to the integer grid (e.g.
  * plane·10¹² for a pico grid) — the ENGINE-PORTABLE dot.
  *
  * A plain float dot is not portable: IEEE addition is non-associative
  * and engines disagree on association — DuckDB's list_dot_product
  * switches to an unrolled kernel at ≥32 elements, it rebalances even
  * an explicit left-deep `a+b+c+…` SQL chain into a tree, and its
  * constant folder merges `(v·p)·10¹²` into `v·(p·10¹²)`, each worth a
  * last-ulp divergence at a floor boundary (all three measured). Here
  * every term is ONE column×literal multiply, one add, one floor —
  * identical doubles in, identical integer out, and the integer SUM is
  * order-independent. Pre-scaling the weights driver-side is what
  * removes the foldable 3-operand chain. Quantization costs 0.5 grid
  * units per term — noise against any approximate-similarity use. The
  * 6dp-DECIMAL text-score recipe, packaged as a codegen expression.
  *
  * Overflow headroom: |xᵢ·wᵢ| < 2^63/n per element — any normalized
  * embedding on the pico grid qualifies by 5+ orders. */
case class VecDotFixedPoint(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  @transient private lazy val readL = VecCodegen.reader(VecCodegen.elemType(left))
  @transient private lazy val readR = VecCodegen.reader(VecCodegen.elemType(right))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(readL(a, i) * readR(b, i) + 0.5).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val ga = VecCodegen.getter(VecCodegen.elemType(left), a, i)
      val gb = VecCodegen.getter(VecCodegen.elemType(right), b, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) java.lang.Math.floor($ga * $gb + 0.5);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotFixedPoint =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float/double array column, in double. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  @transient private lazy val read = VecCodegen.reader(VecCodegen.elemType(child))

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = read(a, i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val ga = VecCodegen.getter(VecCodegen.elemType(child), a, i)
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = $ga; $s += $x * $x; }
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Exact squared L2 distance on the integer grid: the float/double vector
  * LEFT is quantized per element as floor(xᵢ·scale + 0.5) and compared to
  * the ALREADY-QUANTIZED BIGINT vector RIGHT (a centroid), returning
  * Σ (qᵢ − cᵢ)² as an exact BIGINT.
  *
  * Same portability argument as [[VecDotFixedPoint]]: quantization is
  * per-element (no float-association ambiguity to disagree on) and the
  * integer sum is order-independent, so a DuckDB replay via
  * `list_transform` + `list_sum` lands on the identical integer — which
  * makes distributed k-means (KMeans.scala) oracle-checkable round by
  * round. Codegen keeps it one tight primitive loop per row per centroid.
  *
  * Overflow headroom: |qᵢ − cᵢ| ≤ 2·|x|·scale; at the micro grid
  * (scale=10⁶) and |x| ≤ 10³ each term is ≤ 4·10¹⁸/n for n ≤ 4 — any
  * normalized embedding is 6+ orders below that. */
case class VecQuantL2(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  @transient private lazy val readL = VecCodegen.reader(VecCodegen.elemType(left))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = math.floor(readL(a, i) * scale + 0.5).toLong - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val ga = VecCodegen.getter(VecCodegen.elemType(left), a, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = (long) java.lang.Math.floor($ga * ${scale}D + 0.5) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecQuantL2 =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API wrappers around the native expressions. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vec_dot_fixed_point(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotFixedPoint(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vec_norm(a: Column): Column =
    ColumnBridge.column(VecNorm(ColumnBridge.expression(a)))
  def vec_quant_l2(v: Column, centroid: Column, scale: Double): Column =
    ColumnBridge.column(VecQuantL2(ColumnBridge.expression(v),
      ColumnBridge.expression(centroid), scale))
}
