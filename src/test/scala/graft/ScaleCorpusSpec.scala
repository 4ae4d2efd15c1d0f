package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleCorpus

/** Pins the scale-rehearsal generator's distribution contracts — the
  * properties that make a fitted scaling exponent transferable to
  * the driver corpus: same categorical values (gates filter on
  * literals), same duplicate rates (the dedup families' workload),
  * same geometry (unit embeddings, monotone event time), and
  * determinism independent of partitioning (splittable-hash RNG).
  */
class ScaleCorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("documents: categorical values, source mapping, dup rates match the driver corpus") {
    val docs = ScaleCorpus.documents(spark, 5000).cache()
    try {
      val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
      assert(langs == Set("en", "zh", "es", "fr", "de"))
      // source = src(doc_id % 20) — the driver corpus's exact mapping
      assert(docs.filter(col("source") =!= concat(lit("src"),
        pmod(col("doc_id"), lit(20)).cast("int"))).count() == 0)
      // ~5% of docs carry the rare `dup` token (driver: 250/5000)
      val dupDocs = docs.filter(col("text").contains("dup")).count()
      assert(dupDocs > 150 && dupDocs < 400, s"dup-token docs: $dupDocs")
      // ~0.16% exact duplicates (driver: 8/5000)
      val exactDups = docs.count() - docs.select("text").distinct().count()
      assert(exactDups >= 2 && exactDups <= 30, s"exact dups: $exactDups")
      // n_chars is the text length (gates derive stats from it)
      assert(docs.filter(col("n_chars") =!= length(col("text"))).count() == 0)
    } finally docs.unpersist()
  }

  test("events: monotone ts in event_id, fixed 30-day span, exponential value") {
    val ev = ScaleCorpus.events(spark, 10000, 150).cache()
    try {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("event_id")
      val nonMonotone = ev
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev") > col("ts")).count()
      assert(nonMonotone == 0)
      val Seq(lo, hi) = ev.agg(min("ts"), max("ts")).collect()
        .head.toSeq.map(_.asInstanceOf[java.sql.Timestamp].getTime)
      assert(lo >= 1704067200000L && hi < 1704067200000L + 30L * 86400000)
      val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
      assert(types == Set("view", "click", "purchase", "signup", "error"))
      // exponential(mean 50): median ≈ 50·ln2 ≈ 34.7 (driver: 34.8)
      val med = ev.stat.approxQuantile("value", Array(0.5), 0.01).head
      assert(med > 30 && med < 40, s"value median: $med")
    } finally ev.unpersist()
  }

  test("embeddings: 64-dim unit vectors, weak label tilt") {
    val emb = ScaleCorpus.embeddings(spark, 1000).cache()
    try {
      val badNorm = emb.filter(abs(
        aggregate(col("embedding"), lit(0.0d), (a, x) => a + x * x) - 1.0d) > 1e-3).count()
      assert(badNorm == 0)
      assert(emb.filter(size(col("embedding")) =!= 64).count() == 0)
      assert(emb.select("label").distinct().count() == 10)
    } finally emb.unpersist()
  }

  test("generation is deterministic and independent of partitioning") {
    val a = ScaleCorpus.documents(spark, 500)
    val b = ScaleCorpus.documents(spark, 500).repartition(7)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("vocab-scaled documents: token space is exactly the requested vocab, default unchanged") {
    // vocabSize > 30 swaps in synthetic tokens (w0..w{V-1}) so the
    // shingle space grows with the corpus — the unsaturated regime
    // of BENCH_SCALING.md's vocab rehearsal. Contract: the token
    // universe is exactly {w0..w{V-1}} ∪ {"dup"}, and the default
    // (vocabSize = 30) stays bit-identical to the driver-fidelity
    // corpus the other contracts pin.
    val scaled = ScaleCorpus.documents(spark, 2000, vocabSize = 65)
    val toks = scaled.select(explode(split(col("text"), " ")).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(toks.contains("dup"))
    val nonDup = toks - "dup"
    assert(nonDup.forall(t => t.matches("w\\d+") && t.drop(1).toInt < 65), s"alien tokens: ${nonDup.filterNot(_.matches("w\\d+"))}")
    assert(nonDup.size > 55, s"vocab underused: ${nonDup.size}")  // 2000 docs × ~40 tokens: all 65 should appear
    val default = ScaleCorpus.documents(spark, 500)
    val explicit = ScaleCorpus.documents(spark, 500, vocabSize = 30)
    assert(default.exceptAll(explicit).count() == 0 && explicit.exceptAll(default).count() == 0)
  }

  test("lineitem: 1-7 lines per order, contract-compatible schema") {
    val li = ScaleCorpus.lineitem(spark, 1000, 2000, 100)
    val perOrder = li.groupBy("l_orderkey").count()
    val Seq(lo, hi) = perOrder.agg(min("count"), max("count")).collect().head.toSeq
      .map(_.asInstanceOf[Long])
    assert(lo >= 1 && hi <= 7)
    val contracted = graft.sources.Tables.applyContracts(li, "lineitem")
    assert(contracted.schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
  }
}
