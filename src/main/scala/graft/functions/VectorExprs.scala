package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element accessor selection for the fused vector expressions: the
  * engine's vector columns are `array<float>` (stored embeddings) OR
  * `array<double>` (the feature-hashed text embeddings) — reading a
  * double-backed ArrayData through getFloat silently returns garbage,
  * so the accessor is resolved from the child's dataType at plan time
  * and baked into both eval and the generated code.
  */
private[functions] object VecElem {
  def isDouble(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The ArrayData accessor name for codegen. */
  def accessor(dt: DataType): String =
    if (isDouble(dt)) "getDouble" else "getFloat"

  @inline def read(a: ArrayData, i: Int, dbl: Boolean): Double =
    if (dbl) a.getDouble(i) else a.getFloat(i).toDouble
}

/** Fused, codegen'd vector primitives over `array<float>` columns.
  *
  * The higher-order-function spellings (`aggregate(zip_with(...))`) are
  * `CodegenFallback` in Spark — inside a WholeStageCodegen stage they
  * still evaluate interpreted, row at a time, allocating an
  * intermediate array per zip_with. These expressions run the same
  * arithmetic as a tight primitive loop inside generated code: the
  * difference between an ANN candidate scan that streams and one that
  * boxes.
  *
  * Numeric contract (the oracle-parity invariant shared with
  * [[CosineSimilarity]]): accumulate in double, sequentially,
  * left-to-right from a 0.0 seed, each float element cast to double
  * before the arithmetic — bit-identical to the HOF fold, so swapping
  * a HOF call site for the fused form can never move a hash-checked
  * result.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (VecElem.isDouble(left.dataType),
      VecElem.isDouble(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += VecElem.read(x, i, xd) * VecElem.read(y, i, yd)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ga, gb) = (VecElem.accessor(left.dataType),
        VecElem.accessor(right.dataType))
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$ga($i) * (double) $b.$gb($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — the exact-re-rank scorer of the PQ arc and
  * the metric IVF cell assignment minimizes. Same fold contract as
  * [[DotProduct]]: `sum_i ((double)a_i − (double)b_i)²` accumulated
  * sequentially from 0.0.
  */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_dist_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (VecElem.isDouble(left.dataType),
      VecElem.isDouble(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = VecElem.read(x, i, xd) - VecElem.read(y, i, yd)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ga, gb) = (VecElem.accessor(left.dataType),
        VecElem.accessor(right.dataType))
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.$ga($i) - (double) $b.$gb($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Register both primitives on the session (idempotent); usable from
    * SQL text and, via the column helpers, the DataFrame API.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_dist_sq", exprs => L2DistanceSq(exprs.head, exprs(1)), "built-in")
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("dot_f", a, b)
  }

  def l2DistSq(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("l2_dist_sq", a, b)
  }
}
