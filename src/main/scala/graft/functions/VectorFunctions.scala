package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, composed
  * from codegen'd built-ins (zip_with / aggregate / transform) — no
  * UDFs, so the expressions stay inside WholeStageCodegen and run at
  * scan speed over 100 TB.
  *
  * Determinism: every reduction is an ordered left fold over the
  * array (functions.aggregate), so results are bit-reproducible and
  * match an equivalent sequential computation in the DuckDB oracle.
  */
object VectorFunctions {

  /** Ordered left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Ordered-fold cosine from built-ins — the reference formulation
    * the DuckDB oracle mirrors (and the spec for [[cosine]]).
    */
  def cosineFold(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native codegen expression (single fused
    * loop, no intermediate arrays). Bit-identical to [[cosineFold]]
    * by construction (same left-to-right double accumulation), which
    * CosineSimilaritySpec pins.
    */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Deterministic pseudo-random ±1 hyperplane component for
    * (plane, dim), derived from md5 — reproducible in any engine
    * with an md5 function, no RNG state.
    */
  def planeComponent(plane: Int, dim: Column): Column =
    when(substring(md5(concat(lit(s"$plane|"), dim.cast("string"))), 1, 1) >= "8", lit(1.0))
      .otherwise(lit(-1.0))

  /** Signed projection of an embedding onto pseudo-random plane p:
    * sum_d emb[d] * s(p,d). The sign vector follows the embedding's
    * OWN length — a fixed length would null-pad zip_with on other
    * dims and silently collapse every vector into one LSH bucket.
    */
  def planeProjection(emb: Column, plane: Int): Column = {
    val signs = transform(sequence(lit(0), size(emb) - 1), d => planeComponent(plane, d))
    dot(emb, signs)
  }

  /** LSH bucket id from `numPlanes` sign bits (random-hyperplane /
    * SRP hashing: cosine-similar vectors collide with high
    * probability).
    */
  def lshBucket(emb: Column, numPlanes: Int): Column =
    (0 until numPlanes)
      .map(p => when(planeProjection(emb, p) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
}
