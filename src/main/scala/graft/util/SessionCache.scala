package graft.util

import java.lang.ref.SoftReference

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization that cannot pin a [[SparkSession]].
  *
  * A plain object-level map keyed by session holds the session (and
  * every logical plan cached under it) for the JVM lifetime — a leak
  * for any long-lived multi-session library use. This cache breaks
  * both strong paths:
  *
  *  - sessions are WEAK KEYS (`java.util.WeakHashMap`): a closed /
  *    dropped session's entries vanish with the session;
  *  - values are SOFT REFERENCES: cached DataFrames strongly
  *    reference their session, so a strong value would re-pin the
  *    weak key through the value chain (the classic WeakHashMap
  *    value→key trap). Soft (not weak) because a weak value dies at
  *    every minor GC — measured: the streaming gate bundle re-ran
  *    once per gate query instead of once per session. A soft value
  *    survives routine GC and is cleared only under memory pressure,
  *    so the worst case is a memory-bounded cache, never an OOM and
  *    never a JVM-lifetime pin.
  *
  * Memoization is still best-effort: an eviction costs a recompute,
  * never correctness (use sites cache cheap-to-rebuild artifacts — a
  * parquet file listing, a collected gate result).
  */
final class SessionCache[K, V <: AnyRef] {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, TrieMap[K, SoftReference[V]]]()

  private def scope(session: SparkSession): TrieMap[K, SoftReference[V]] =
    bySession.synchronized {
      bySession.computeIfAbsent(session, _ => TrieMap.empty)
    }

  def get(session: SparkSession, key: K): Option[V] =
    scope(session).get(key).flatMap(r => Option(r.get))

  def put(session: SparkSession, key: K, value: V): Unit =
    scope(session).update(key, new SoftReference(value))

  def getOrElseUpdate(session: SparkSession, key: K)(build: => V): V =
    get(session, key).getOrElse {
      val v = build
      put(session, key, v)
      v
    }

  /** Drop everything (benchmark hygiene between timed runs). */
  def invalidate(): Unit = invalidate(_ => ())

  /** Drop everything, running `onDrop` on each still-live value first
    * — the hook for values that hold external resources (e.g. a
    * localCheckpointed DataFrame's storage blocks, which would
    * otherwise linger until nondeterministic GC + ContextCleaner).
    */
  def invalidate(onDrop: V => Unit): Unit = bySession.synchronized {
    bySession.values.forEach { scoped =>
      scoped.values.foreach(r => Option(r.get).foreach(onDrop))
    }
    bySession.clear()
  }
}
