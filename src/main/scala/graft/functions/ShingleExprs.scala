package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingle expressions.
  *
  * The composed formulations (split → transform → concat_ws /
  * substr → array_distinct) are the oracle's executable spec, but
  * they run through interpreted higher-order lambdas: per-element
  * expression evaluation, boxed intermediates, and (for character
  * grams) substr's per-call boundary scan. These natives do one pass
  * over the row — O(tokens·k) / O(bytes) — and emit into the
  * surrounding WholeStageCodegen stage as a single static call.
  *
  * Bit-identity with the composed forms (pinned in ExtensionsSpec):
  * split on a single space KEEPING empty tokens, k-grams joined by
  * one space, distinct keeps FIRST occurrence order, short inputs
  * yield an empty array.
  */
case class WordShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"word_shingles expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(c), k))

  def compute(text: UTF8String, k: Int): ArrayData = {
    // limit -1: trailing empty tokens preserved, same as Spark's
    // split(text, " ") and DuckDB string_split
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen += sb.toString
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s): Any).toArray)
  }
}

/** Character k-grams — see [[WordShinglesExpr]] scaladoc. Walks the
  * UTF-8 bytes once to index codepoint boundaries (matching Spark's
  * codepoint-based substr/length semantics), then emits each k-char
  * window as a byte slice: O(bytes + grams·k), where the composed
  * substr-per-position form pays a boundary scan per gram.
  */
case class CharShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"char_shingles expects a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CharShinglesExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShinglesExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShinglesExpr {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(CharShinglesExpr(ColumnBridge.expression(c), k))

  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    // codepoint start offsets (UTF-8 continuation bytes are 10xxxxxx)
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { offs(n) = b; n += 1 }
      b += 1
    }
    offs(n) = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= n - k) {
      seen += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, offs(i), offs(i + k)))
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s => s: Any).toArray)
  }
}
