// Hosted inside org.apache.spark.sql so the expression can use the
// private[sql] pieces of the expression API (AbstractDataType for implicit
// input casting, ExpressionUtils for the Column bridge) — the standard way
// to ship a native expression as a third-party library. The public entry
// point is graft.functions.ArrayMath.
package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>` columns.
  *
  * The embedding-similarity hot path evaluates one dot product per
  * candidate pair — at near-dup thresholds that is O(n²) per block, so the
  * per-pair cost decides feasibility. Spark's `zip_with`/`aggregate`
  * higher-order functions evaluate an interpreted lambda per ELEMENT
  * (~µs-scale per pair at 64 dims); this expression compiles to a tight
  * primitive loop over the two `UnsafeArrayData` buffers inside whole-stage
  * codegen — no allocation, no virtual calls, JIT-vectorizable.
  *
  * Null semantics: null if either array is null (nullIntolerant); elements
  * are read as primitive doubles (callers guarantee element-non-null, which
  * holds for anything cast from the parquet `array<float>` embeddings).
  * Lengths may differ; the shorter prefix is used.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Internal Column bridge — use graft.functions.ArrayMath instead. */
object bridge {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  def collectTopK(e: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.aggregate
        .GraftCollectTopK(ExpressionUtils.expression(e), k, reverse))

  /** (name, info, builder) triple shared by the SQL registration paths. */
  val dotProductFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product expects 2 arguments, got ${children.length}")
      DotProduct(children.head, children(1))
    })

  /** `collect_top_k(e, k[, reverse])` as a SQL aggregate — the bounded
    * per-group heap behind [[graft.functions.TopK]], exposed so SQL users
    * get shuffle-bounded top-k without the window row_number idiom.
    */
  val collectTopKFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("collect_top_k"),
    new ExpressionInfo(
      "org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK",
      "collect_top_k"),
    org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectTopK
      .builder _)

  /** Register graft's SQL functions into an already-running session's
    * function registry (the in-session twin of [[graft.GraftExtensions]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Seq(dotProductFunction, collectTopKFunction,
      textBridge.langIdFunction, textBridge.fingerprintFunction,
      textBridge.nfcNormalizeFunction).foreach {
      case (id, info, builder) =>
        cs.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
