package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for each seed s in 0 until numHashes,
  * the lexicographic minimum of md5("s|" + shingle) over the input
  * shingle array, as lowercase hex — exactly the composed
  * formulation in Dedup.minhashSignature (bit-identity pinned in
  * ExtensionsSpec) and the DuckDB oracle's min(md5(s || '|' ||
  * shingle)).
  *
  * Why native: one digest per (seed, shingle) either way, but the
  * mins are tracked as raw 16-byte digests in a single pass (byte
  * comparison ≡ hex-string comparison since hex preserves unsigned
  * byte order), with no per-element UTF8String materialization or
  * higher-order-function plumbing; hex is rendered once per seed at
  * the end.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  def apply(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), numHashes))

  private val hex = "0123456789abcdef".toCharArray

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Array[Byte]](numHashes)
    val md = MessageDigest.getInstance("MD5")
    var s = 0
    while (s < numHashes) {
      val prefix = (s.toString + "|").getBytes(StandardCharsets.UTF_8)
      var i = 0
      while (i < n) {
        // null shingles are skipped — md5(null) is null and array_min
        // ignores nulls in the composed formulation, so the native
        // path must not NPE (nor let a null win the min)
        if (!shingles.isNullAt(i)) {
          val sh = shingles.getUTF8String(i)
          md.reset()
          md.update(prefix)
          md.update(sh.getBytes)
          val d = md.digest()
          if (mins(s) == null || compareUnsigned(d, mins(s)) < 0) mins(s) = d
        }
        i += 1
      }
      s += 1
    }
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = if (mins(j) == null) null else UTF8String.fromString(toHex(mins(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  private def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(hex((bytes(i) >> 4) & 0xf)).append(hex(bytes(i) & 0xf))
      i += 1
    }
    sb.toString
  }
}
