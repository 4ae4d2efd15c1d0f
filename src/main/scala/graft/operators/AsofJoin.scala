package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY §2.3 notes
  * it as absent in the reference too; it's table stakes for
  * time-series enrichment, so the engine ships it).
  *
  * For each left row, attach the latest right row with
  * rightTime <= leftTime within the same key (inclusive backward
  * as-of). Implemented the scalable way (union + ordered
  * last-non-null window), not a per-key loop:
  *
  *   1. tag both inputs and union them (no join!);
  *   2. one shuffle: partition by key, sort by (time, side) with the
  *      right side first at equal timestamps (inclusive semantics);
  *   3. running last(payload, ignoreNulls) carries the most recent
  *      right payload forward onto each left row.
  *
  * Cost at 100 TB: exactly one exchange of left+right on the key —
  * the same lower bound as a sort-merge join — and the window keeps
  * O(1) state per row. Right rows must be unique per (key, time) for
  * determinism; pre-aggregate otherwise.
  */
object AsofJoin {

  /** @param payloadCols right-side columns to attach; they surface as
    *                    a struct column named `asof` on the output.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: Column,
      rightTime: Column,
      payloadCols: Seq[String],
      inner: Boolean = true,
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = leftCols.filterNot(_ == key)

    val r0 = right
      .withColumn("__payload", struct(payloadCols.map(col): _*))
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(0))
      .select(col(key), col("__t"), col("__side"), col("__payload"))
    val payloadType = r0.schema("__payload").dataType

    val l0 = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
      .select((Seq(key, "__t", "__side", "__payload") ++ carried).map(col): _*)
    val rAligned = carried
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((Seq(key, "__t", "__side", "__payload") ++ carried).map(col): _*)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l0
      .unionByName(rAligned)
      .withColumn("asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col("asof")): _*)
    if (inner) joined.filter(col("asof").isNotNull) else joined
  }
}
