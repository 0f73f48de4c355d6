// Hosted inside org.apache.spark.sql for the same reason as
// DotProductExpr.scala: the private[sql] Column bridge. Public entry
// points are graft.functions.TextFns.
package org.apache.spark.sql.graftfns

import graft.ops.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static call targets for the generated code of [[LangId]] /
  * [[Fingerprint]] (a Scala `object` emits Java static forwarders, so
  * janino can call these without `MODULE$` plumbing). They take and return
  * `UTF8String`, so the only per-row conversion left is the one
  * `toString` the heuristics' char-level logic genuinely needs — no
  * CatalystTypeConverters, no closure dispatch, no codegen fence like
  * `ScalaUDF`.
  */
object TextExprHelpers {
  def langId(t: UTF8String): UTF8String =
    UTF8String.fromString(TextAnalysis.langIdOf(t.toString))

  def fingerprint(t: UTF8String, n: Int): Long =
    TextAnalysis.fingerprintOf(t.toString, n)

  def nfc(t: UTF8String): UTF8String = {
    val s = t.toString
    // Fast path: Normalizer.isNormalized is a cheap scan and true for
    // virtually every document of a mostly-ASCII corpus — skip the
    // allocating normalize() call (and the UTF8String re-encode) unless
    // the string actually contains a decomposed sequence.
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Native expression form of [[graft.ops.TextAnalysis.langIdOf]]: keeps
  * the language-ID heuristic inside whole-stage codegen on the document
  * hot path (a ScalaUDF here costs per-row converter allocation + a
  * codegen boundary at 100 TB).
  */
case class LangId(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    TextExprHelpers.langId(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftfns.TextExprHelpers.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** Native expression form of [[graft.ops.TextAnalysis.fingerprintOf]]
  * (winnowing min-rolling-hash over `n`-token windows), codegen'd for the
  * same reason as [[LangId]]. `n` is a literal parameter, not a child —
  * the window width is a plan-time constant.
  */
case class Fingerprint(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    TextExprHelpers.fingerprint(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftfns.TextExprHelpers.fingerprint($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): Fingerprint =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization pass a multilingual corpus needs BEFORE any
  * byte-level dedup or fingerprinting ("café" composed and decomposed
  * must hash identically). Matches DuckDB's `nfc_normalize` semantics
  * (both defer to the Unicode canonical-composition tables). The
  * already-normalized fast path avoids per-row allocation on
  * mostly-ASCII corpora, so the hot path stays cheap at 100 TB.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    TextExprHelpers.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftfns.TextExprHelpers.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Internal Column bridge — use graft.functions.TextFns instead. */
object textBridge {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  def langId(c: Column): Column =
    ExpressionUtils.column(LangId(ExpressionUtils.expression(c)))

  def fingerprint(c: Column, n: Int): Column =
    ExpressionUtils.column(Fingerprint(ExpressionUtils.expression(c), n))

  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))

  /** `nfc_normalize(text)` as a SQL function (name-compatible with
    * DuckDB's built-in).
    */
  val nfcNormalizeFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"nfc_normalize expects 1 argument, got ${children.length}")
      NfcNormalize(children.head)
    })

  /** `lang_id(text)` as a SQL function (see [[graft.GraftExtensions]]). */
  val langIdFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("lang_id"),
    new ExpressionInfo(classOf[LangId].getName, "lang_id"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"lang_id expects 1 argument, got ${children.length}")
      LangId(children.head)
    })

  /** `fingerprint(text, n)` as a SQL function; `n` must be a foldable
    * integer — the window width is a plan-time constant of the
    * expression, exactly as in the Column API.
    */
  val fingerprintFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("fingerprint"),
    new ExpressionInfo(classOf[Fingerprint].getName, "fingerprint"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"fingerprint expects 2 arguments, got ${children.length}")
      // Any foldable integral expression works (1+2, CAST(3 AS BIGINT),
      // a plain literal): fold it at registration time and range-check.
      val nArg = children(1)
      val n = nArg match {
        case e if e.foldable => e.eval() match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long    => l.longValue()
          case s: java.lang.Short   => s.longValue()
          case b: java.lang.Byte    => b.longValue()
          case other => throw new IllegalArgumentException(
            "fingerprint's second argument must be a foldable integer, " +
              s"got ${if (other == null) "NULL" else other} from $e")
        }
        case other => throw new IllegalArgumentException(
          "fingerprint's second argument must be a foldable integer, " +
            s"got non-foldable $other")
      }
      require(n >= 1 && n <= Int.MaxValue,
        s"fingerprint window width must be in [1, ${Int.MaxValue}], got $n")
      Fingerprint(children.head, n.toInt)
    })
}
