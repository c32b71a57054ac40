package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The r1 implementation expressed the dot product as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — higher-order functions are
  * interpreted (no codegen) and allocate an intermediate 64-element array per
  * pair, which made the pairwise-cosine operators the 85%-of-bench hotspot.
  * This expression participates in whole-stage codegen as a tight primitive
  * loop over `ArrayData` (same left-to-right accumulation order, so results —
  * and the DuckDB `list_sum` oracles — are bit-identical to the r1 plans).
  *
  * Elements must be non-null (embedding vectors are); a null ARRAY input
  * yields null via the standard BinaryExpression null contract. Mismatched
  * lengths (a ragged vector, a wrong-dim hyperplane) THROW rather than
  * silently truncating — the DuckDB oracles iterate the full vector length,
  * so a truncated dot product would surface only as an opaque hash mismatch,
  * or not at all in oracle-less production use.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"graft_dot: mismatched vector lengths $n vs ${y.numElements()}")
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: mismatched vector lengths " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object VectorFunctions {

  /** Register `graft_dot` on the given session's function registry
    * (idempotent). Operators call this lazily so any session — the driver's,
    * Verify's, Bench's, a test's — can run them without special setup.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")

  /** Codegen'd dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    * unsigned first-8-hex-chars of md5("&lt;plane&gt;_&lt;dim&gt;") / 2^32 - 0.5.
    * Engine-neutral — DuckDB oracles recompute the identical value with
    * `('0x' || substr(md5(p || '_' || j), 1, 8))::BIGINT / 4294967296.0 - 0.5`.
    * Computed ONCE here on the driver and shipped as literals, instead of
    * per-row md5 evaluation (the r1 plans re-derived every plane component
    * for every vector).
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$dim".getBytes("UTF-8"))
    val hex = digest.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
  }

  /** The full plane as an array<double> literal column. */
  def planeLit(plane: Int, dim: Int): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    array((0 until dim).map(j => lit(planeComponent(plane, j))): _*)
  }
}
