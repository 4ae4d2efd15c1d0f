package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native one-pass posting-list pair expansion.
  *
  * The composed form — nested `transform` over `sequence` counters
  * with `element_at` lookups, flattened and exploded — is the
  * oracle-mirrorable spec, but higher-order lambdas run interpreted:
  * per-pair closure invocation, boxed rows, and an intermediate
  * array-of-arrays that `flatten` copies again. These natives emit
  * the i<j pairs of a (sorted, ≤maxDf-bounded) posting list in one
  * tight loop — the hot inner stage of the n-gram Jaccard and
  * MinHash-LSH dedup pipelines.
  *
  * Emission order is identical to the composed form (outer i, inner
  * j), pinned in ExtensionsSpec.
  */
case class PostingPairsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PostingPairsExpr.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"posting_pairs expects array<struct<long,long>>, got $other"
      )
  }

  override def nullSafeEval(input: Any): Any =
    PostingPairsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PostingPairsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PostingPairsExpr {
  private[functions] val outType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("doc_a", LongType, nullable = false),
        StructField("n_a", LongType, nullable = false),
        StructField("doc_b", LongType, nullable = false),
        StructField("n_b", LongType, nullable = false),
      )
    ),
    containsNull = false,
  )

  def apply(c: Column): Column =
    ColumnBridge.column(PostingPairsExpr(ColumnBridge.expression(c)))

  def compute(ds: ArrayData): ArrayData = {
    val n = ds.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ds.getStruct(i, 2)
      ids(i) = r.getLong(0)
      szs(i) = r.getLong(1)
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(
          Array[Any](ids(i), szs(i), ids(j), szs(j))
        ): InternalRow
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Pair expansion over a plain sorted id list (the MinHash band-bucket
  * shape: ids only, no carried sizes) — see [[PostingPairsExpr]].
  */
case class IdPairsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IdPairsExpr.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"id_pairs expects array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    IdPairsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdPairsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IdPairsExpr {
  private[functions] val outType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("doc_a", LongType, nullable = false),
        StructField("doc_b", LongType, nullable = false),
      )
    ),
    containsNull = false,
  )

  def apply(c: Column): Column =
    ColumnBridge.column(IdPairsExpr(ColumnBridge.expression(c)))

  def compute(ds: ArrayData): ArrayData = {
    val n = ds.numElements()
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = ds.getLong(i); i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](ids(i), ids(j))): InternalRow
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
