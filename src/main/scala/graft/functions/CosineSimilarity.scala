package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * ArrayType(FloatType) columns, with whole-stage codegen
  * (doGenCode): a single fused loop, no per-row array allocations —
  * unlike the zip_with+aggregate composition, which materializes an
  * intermediate array and boxes through the higher-order-function
  * machinery. On brute-force similarity scans this is the hot inner
  * loop, so it is the one place the engine drops below the
  * DataFrame API (SURVEY §7.4: custom expressions only where
  * built-ins can't express it efficiently).
  *
  * Bit-compatibility: accumulates dot/norms left-to-right in double,
  * exactly like VectorFunctions.dot's ordered fold, so swapping the
  * implementations never changes results (oracle-checked).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null on length mismatch (see below), independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects two array<float> arguments, got ${left.dataType} and ${right.dataType}")
  }

  // Length-mismatched inputs yield NULL — matching the composed
  // cosineFold exactly (zip_with null-pads the shorter side and the
  // fold propagates the null); silently truncating would diverge from
  // the bit-identity contract the SQL surface promises.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xv = (double) $a.getFloat($i);
         |    double yv = (double) $b.getFloat($i);
         |    $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** Column-level entry point (classic-mode expression wrapping). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
