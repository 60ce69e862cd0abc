package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column
  * API. Two paths:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (cluster-wide, config-driven);
  *   - [[GraftFunctions.register]] for an existing session.
  *
  * Beyond the custom codegen expressions (VecDot/VecNorm), the
  * highest-traffic text primitives are registered as Catalyst trees of
  * BUILT-IN expressions — SQL users get the identical semantics the
  * Column API (TextAnalysis) defines, with whole-stage codegen intact.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.{BinaryType, IntegerType}

  private def normalized(text: Expression): Expression =
    RegExpReplace(Lower(StringTrim(text)), Literal("\\s+"), Literal(" "))

  /** Whitespace token count with the empty-text guard —
    * TextAnalysis.tokenCount as a Catalyst tree. */
  private def tokenCount(text: Expression): Expression =
    If(EqualTo(Length(StringTrim(text)), Literal(0)),
      Literal(0),
      Size(StringSplit(StringTrim(text), Literal("\\s+"), Literal(-1))))

  /** Hamming distance between two 64-bit signatures (the simhash
    * comparison primitive): popcount(a XOR b), a tree of two built-in
    * codegen expressions. */
  private def hamming(a: Expression, b: Expression): Expression =
    BitwiseCount(BitwiseXor(Cast(a, org.apache.spark.sql.types.LongType),
      Cast(b, org.apache.spark.sql.types.LongType)))

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "vec_dot_fixed_point" -> (es => VecDotFixedPoint(es(0), es(1))),
    "vec_norm" -> (es => VecNorm(es.head)),
    "vec_quant_l2" -> (es => VecQuantL2(es(0), es(1), {
      require(es(2).foldable, "vec_quant_l2 scale must be a literal")
      es(2).eval() match {
        case d: java.lang.Double => d.doubleValue()
        case other => other.toString.toDouble
      }
    })),
    "graft_token_count" -> (es => tokenCount(es.head)),
    "graft_hamming" -> (es => hamming(es(0), es(1))),
    "graft_fingerprint" -> (es => XxHash64(Seq(normalized(es.head)), 42L)),
    "graft_fingerprint_md5" -> (es => Md5(Cast(normalized(es.head), BinaryType))))

  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** Session-extensions entry point: injects the native vector functions at
  * session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
