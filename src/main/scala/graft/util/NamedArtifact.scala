package graft.util

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted artifacts addressed by NAME.
  *
  * A memoized `df.persist` has an invalidation hole: if the only
  * reference to the DataFrame is soft (see [[SessionCache]]) and it
  * gets GC-cleared, the storage blocks stay registered but nothing
  * can reach them — rebuilding the plan does not help when the plan
  * contains typed-aggregator lambdas, because closures never compare
  * equal and plan canonicalization cannot match them. Registering the
  * artifact as a temp view and caching THROUGH THE CATALOG
  * (`spark.catalog.cacheTable`) makes the name the handle: dropping
  * by name reaches the cached entry no matter what happened to our
  * references. Temp views are session-scoped, so lifetime matches
  * [[SessionCache]] scoping exactly.
  */
object NamedArtifact {

  /** Register `df` as temp view `name`, cache it MEMORY_AND_DISK, and
    * return the view-backed frame (whose plan the cache registry
    * matches by the stored view definition, closure-safe).
    *
    * Any SAME-NAME artifact is uncached FIRST: a rebuild after the
    * memoizing soft reference was GC-cleared (without an intervening
    * invalidate) would otherwise `createOrReplaceTempView` over the
    * old definition and — because closure-bearing plans never
    * canonical-match — register a SECOND cache entry while the first
    * entry's storage blocks stay pinned with no name left to reach
    * them. Uncache-then-replace makes rebuild idempotent: at most one
    * cache entry ever exists per name, so drop-by-name always frees
    * every block this helper pinned.
    */
  def cache(spark: SparkSession, name: String, df: => DataFrame): DataFrame = {
    // Reuse path (round 14): if the SAME-NAME view is already
    // registered AND catalog-cached, hand back the live entry instead
    // of uncache-and-recompute. Artifact names encode their full build
    // key (dir, or dir|params) by the viewName convention, so within a
    // session a name hit IS the same definition — and the memoizing
    // SessionCache holds values only SOFTLY, so under heap pressure
    // the in-JVM reference dies while the catalog cache (MEMORY_AND_
    // DISK — it spills, it does not vanish) stays materialized. The
    // pre-fix behavior recomputed the whole artifact on every such
    // GC-cleared rebuild: the full r14 bench measured several
    // artifact-family gates paying their shared build a SECOND time
    // mid-run (hybrid_rrf_ivfpq, bm25_era_drift, the lm family) on an
    // 8 GiB heap. The uncache-then-replace below remains for genuine
    // (re)builds — first build, or rebuild after drop — keeping at
    // most one cache entry per name.
    if (Try(spark.catalog.isCached(name)).getOrElse(false)) {
      spark.table(name)
    } else {
      Try(spark.catalog.uncacheTable(name))
      df.createOrReplaceTempView(name)
      if (!spark.catalog.isCached(name)) {
        spark.catalog.cacheTable(name, StorageLevel.MEMORY_AND_DISK)
      }
      spark.table(name)
    }
  }

  /** Uncache and drop the view; safe when it never existed (the
    * GC-cleared-entry case invalidation exists to cover).
    */
  def drop(spark: SparkSession, name: String): Unit = {
    Try(spark.catalog.uncacheTable(name))
    spark.catalog.dropTempView(name)
    ()
  }

  /** A collision-free session-unique view name for a directory-keyed
    * artifact (temp view names cannot contain '/').
    *
    * The name must encode the FULL build key (r14 advice): since the
    * reuse path in [[cache]] returns the live entry on a name hit, a
    * name that failed to distinguish two definitions would silently
    * serve one definition's data to the other's consumers. The
    * sanitized key is embedded verbatim alongside a 32-bit hash of
    * the raw key, so two distinct keys collide only if they sanitize
    * identically (differ only in non-alphanumerics) AND hash-collide
    * — against the pre-r15 bare 32-bit hash, where any 1-in-2³²
    * cross-key collision sufficed. Callers with parameterized builds
    * must fold every parameter into `dir` (the `dir|param` key
    * convention) or guard the memo on served defaults (the
    * adcShortlist rule).
    */
  def viewName(prefix: String, dir: String): String = {
    val sanitized = dir.replaceAll("[^A-Za-z0-9]+", "_")
    prefix + "_" + sanitized + "_" + java.lang.Long.toHexString(
      org.apache.spark.unsafe.types.UTF8String.fromString(dir).hashCode().toLong & 0xffffffffL
    )
  }
}
