package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format coverage: the engine's operators are format-agnostic
  * — the same query over parquet, JSON, and CSV copies of a table
  * produces identical results (schemas declared on read for the
  * text formats, as any production ingest would).
  */
class FormatsSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("compaction rewrites a many-small-files table into size-targeted files, content-identical") {
    import java.nio.file.Files
    val fragmented = Files.createTempDirectory("graft-frag").toString
    val compacted = Files.createTempDirectory("graft-comp").toString
    // simulate micro-batch accretion: 40 tiny files
    val src = graft.sources.Tables(spark, sf, "orders")
    src.repartition(40).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles.count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 40)

    val rows = src.count()
    val out = graft.sources.Maintenance.compact(spark, fragmented, compacted, targetRowsPerFile = rows / 3)
    val n = parquetFiles(compacted)
    assert(n >= 3 && n <= 5, s"expected ~4 size-targeted files, got $n")
    // content survives byte-for-byte (same rows, any order)
    assert(out.count() == rows)
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // generation 1: (doc_id, text) — generation 2 adds a lang column
    Seq((1L, "old row")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "new row", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "text"))
    val byId = merged.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("lang"))).toMap
    // old-generation rows surface the evolved column as null
    assert(byId(1L).isEmpty && byId(2L).contains("en"))
  }

  test("same aggregation over parquet, json, and csv copies agrees") {
    val orders = Tables(spark, sf, "orders")
    val dir = Files.createTempDirectory("graft-fmt").toString
    orders.write.mode("overwrite").json(s"$dir/json")
    orders.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")

    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(14,2)")).as("s"))

    val viaParquet = aggOf(orders)
    val viaJson = aggOf(spark.read.schema(orders.schema).json(s"$dir/json"))
    val viaCsv = aggOf(
      spark.read.schema(orders.schema).option("header", "true").csv(s"$dir/csv"))
    assert(viaJson.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaJson).isEmpty)
    assert(viaCsv.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaCsv).isEmpty)
  }

  test("events.ts canonicalizer reads nanos-long, NTZ-micros, and LTZ-micros encodings identically") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // the corpus has shipped with different at-rest ts encodings
    // across rounds (round 6 lost 16 gates to a nanos→NTZ switch);
    // pin that all three known encodings of the SAME instants
    // canonicalize to the same TimestampType values on BOTH the batch
    // and the streaming read path
    val base = Tables(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .limit(500)
      .cache()
    val dirNanos = Files.createTempDirectory("graft-ts-nanos").toString
    val dirNtz = Files.createTempDirectory("graft-ts-ntz").toString
    val dirLtz = Files.createTempDirectory("graft-ts-ltz").toString
    // TIMESTAMP(NANOS) surfaces as a raw nanos long under nanosAsLong;
    // a written LongType column exercises the identical dispatch arm
    base.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.parquet(s"$dirNanos/events.parquet")
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$dirNtz/events.parquet")
    base.write.parquet(s"$dirLtz/events.parquet")

    def batchFingerprint(dir: String): Seq[(Long, Long)] = {
      val df = Tables(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"batch read of $dir must canonicalize ts to TimestampType")
      df.select(col("event_id"), expr("unix_micros(ts)"))
        .orderBy("event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSeq
    }
    val viaNanos = batchFingerprint(dirNanos)
    val viaNtz = batchFingerprint(dirNtz)
    val viaLtz = batchFingerprint(dirLtz)
    assert(viaNanos.nonEmpty)
    assert(viaNanos == viaNtz, "nanos-long vs NTZ-micros reads disagree")
    assert(viaNtz == viaLtz, "NTZ-micros vs LTZ-micros reads disagree")

    // streaming path: same canonical type for every encoding (the
    // round-6 silent 1000x compression was exactly this path assuming
    // LongType over a micros corpus)
    for (d <- Seq(dirNanos, dirNtz, dirLtz)) {
      val st = graft.streaming.StreamingQueries.eventsStream(spark, d)
      assert(st.isStreaming)
      assert(st.schema("ts").dataType == TimestampType,
        s"streaming read of $d must canonicalize ts to TimestampType")
    }
  }

  test("TPC-H date columns canonicalize to NTZ from nanos-long, LTZ, DATE, and NTZ encodings") {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    // the round-6 lesson generalized: the corpus regeneration may
    // re-encode o_orderdate/l_shipdate just as it re-encoded
    // events.ts. Pin that every plausible at-rest encoding of the
    // SAME dates reads back to the contract type (TIMESTAMP_NTZ — the
    // type all committed TPC-H predicates and oracle rows were built
    // against) with identical values on the batch path.
    val base = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderdate")
      .limit(500)
      .cache()
    val encodings: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      // raw nanos long (TIMESTAMP(NANOS) surfaces this way under nanosAsLong)
      "nanos" -> base.withColumn(
        "o_orderdate", expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000")),
      "ltz" -> base.withColumn("o_orderdate", col("o_orderdate").cast(TimestampType)),
      "date" -> base.withColumn("o_orderdate", col("o_orderdate").cast(DateType)),
      "ntz" -> base,
    )
    val prints = encodings.map { case (label, df) =>
      val dir = Files.createTempDirectory(s"graft-date-$label").toString
      df.write.parquet(s"$dir/orders.parquet")
      val back = Tables(spark, dir, "orders")
      assert(back.schema("o_orderdate").dataType == TimestampNTZType,
        s"$label encoding must canonicalize o_orderdate to TIMESTAMP_NTZ")
      val got = back
        .select(col("o_orderkey"),
          expr("CAST(o_orderdate AS STRING)").as("d"))
        .orderBy("o_orderkey")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .toSeq
      label -> got
    }
    val ref = prints.head._2
    assert(ref.nonEmpty)
    for ((label, got) <- prints.tail)
      assert(got == ref, s"$label encoding disagrees with ${prints.head._1}")
  }

  test("embeddings canonicalize to array<float> from a list<double> re-encoding, values identical") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    // the typed cosine/minhash expressions require array<float>
    // exactly; pin that a corpus regeneration shipping the SAME f32
    // values as list<double> reads back bit-identically instead of
    // failing type-check across the similarity gate family
    val base = Tables(spark, sf, "embeddings").limit(100).cache()
    val dir = Files.createTempDirectory("graft-emb-f64").toString
    base.withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .write.parquet(s"$dir/embeddings.parquet")
    val back = Tables(spark, dir, "embeddings")
    assert(back.schema("embedding").dataType == ArrayType(FloatType),
      "double re-encoding must canonicalize back to array<float>")
    def fp(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Float])] =
      df.select(col("vec_id"), col("embedding")).orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    assert(fp(back) == fp(base), "f64 round-trip must be bit-identical to the f32 source")

    // streaming path: the scored stream must declare the at-rest type
    // (footer probe) and still hand the cosine expression array<float>
    val st = graft.streaming.StreamingQueries.similarityScoredStream(spark, dir)
    assert(st.isStreaming)
    assert(st.schema("cos").dataType.typeName == "double",
      "typed cosine must type-check over the double-encoded corpus stream")
  }
}
