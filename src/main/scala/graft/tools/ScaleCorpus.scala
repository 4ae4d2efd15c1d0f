package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}

import graft.GraftSession

/** Distributed synthetic-corpus generator for scale rehearsals.
  *
  * Reproduces the driver corpus's distributions (TESTDATA.md tables;
  * dimensions measured off sf0.001/0.01/0.1: linear events/users/
  * TPC-H rows, fixed 30-day event span, 20 sources, 5 langs,
  * 64-dim unit embeddings with a weak 10-label tilt, vocab-30 text
  * with a ~5% `dup`-token rate and ~0.16% exact-duplicate docs) at
  * ANY scale factor, so per-query scaling exponents can be measured
  * beyond the largest driver-shipped corpus (sf0.1).
  *
  * Everything is derived from `xxhash64(id, salt)` column
  * expressions over `spark.range(n)` — no UDFs, no driver-side data,
  * no RNG state: the generator is itself a codegen'd distributed
  * job (at 100 TB a fixture factory that funnels through the driver
  * would be the first bottleneck of the rehearsal), and every cell
  * is a pure function of (table, id), independent of partitioning.
  */
object ScaleCorpus {

  /** Uniform [0,1) from a salted hash of `id` — the splittable-RNG
    * idiom: stable under repartitioning, unlike `rand()` whose
    * stream is per-partition.
    */
  private def u(salt: Int): Column = uc(col("id"), salt)

  private def uc(c: Column, salt: Int): Column =
    pmod(xxhash64(c, lit(salt)), lit(1000000000L)).cast(DoubleType) / lit(1e9)

  /** Standard normal via Box–Muller over two salted uniforms. */
  private def gauss(c: Column, salt: Int): Column = {
    val u1 = greatest(uc(c, salt), lit(1e-12))
    val u2 = uc(c, salt + 7919)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  private def pick(choices: Seq[String], salt: Int): Column =
    element_at(
      array(choices.map(lit): _*),
      (pmod(xxhash64(col("id"), lit(salt)), lit(choices.size.toLong)) + 1).cast(IntegerType))

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map(i => (i, s"NATION_$i", i % 5)).toDF("n_nationkey", "n_name", "n_regionkey")
  }

  def customer(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .select(
        col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        pmod(xxhash64(col("id"), lit(11)), lit(25L)).cast(IntegerType).as("c_nationkey"),
        round(lit(-1000.0) + u(12) * 11000.0, 2).as("c_acctbal"),
        pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"), 13)
          .as("c_mktsegment"))

  def supplier(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .select(
        col("id").as("s_suppkey"),
        format_string("Supplier#%09d", col("id")).as("s_name"),
        pmod(xxhash64(col("id"), lit(21)), lit(25L)).cast(IntegerType).as("s_nationkey"),
        round(lit(-1000.0) + u(22) * 11000.0, 2).as("s_acctbal"))

  def part(spark: SparkSession, n: Long): DataFrame = {
    val adjs = Seq("large", "hot", "blue", "old", "cold", "small", "red", "dark")
    val nouns = Seq("ring", "bolt", "plate", "screw", "wheel", "pipe", "cap", "rod")
    spark.range(n)
      .select(
        col("id").as("p_partkey"),
        concat_ws(" ", pick(adjs, 31), pick(nouns, 32)).as("p_name"),
        concat(lit("Brand#"), (pmod(xxhash64(col("id"), lit(33)), lit(25L)) + 1).cast(IntegerType))
          .as("p_brand"),
        pick(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"), 34).as("p_type"),
        (pmod(xxhash64(col("id"), lit(35)), lit(50L)) + 1).cast(IntegerType).as("p_size"),
        round(lit(900.0) + pmod(col("id"), lit(1000L)).cast(DoubleType) / 10.0, 2)
          .as("p_retailprice"))

  }

  /** Order dates span 1995-01-01..2001-08-01 (2404 days), as NTZ
    * midnights — the contract type `Tables.applyContracts` pins.
    */
  def orders(spark: SparkSession, n: Long, custN: Long): DataFrame =
    spark.range(n)
      .select(
        col("id").as("o_orderkey"),
        floor(u(41) * custN.toDouble).cast(LongType).as("o_custkey"),
        pick(Seq("O", "P", "F"), 42).as("o_orderstatus"),
        round(lit(1000.0) + u(43) * 499000.0, 2).as("o_totalprice"),
        to_timestamp_ntz(
          date_add(lit(java.sql.Date.valueOf("1995-01-01")),
            floor(u(44) * 2404).cast(IntegerType))).as("o_orderdate"),
        pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 45)
          .as("o_orderpriority"))

  /** 1–7 lines per order (avg 4, matching the measured 4.075) via a
    * generate/explode over the order ids — stays fully distributed;
    * per-line attributes hash on (orderkey, linenumber).
    */
  def lineitem(spark: SparkSession, orderN: Long, partN: Long, suppN: Long): DataFrame = {
    val nLines = (pmod(xxhash64(col("id"), lit(51)), lit(7L)) + 1).cast(IntegerType)
    val base = spark.range(orderN)
      .select(col("id"), explode(sequence(lit(1), nLines)).as("l_linenumber"))
    def lu(salt: Int): Column =
      pmod(xxhash64(col("id"), col("l_linenumber"), lit(salt)), lit(1000000000L))
        .cast(DoubleType) / lit(1e9)
    val qty = (floor(lu(52) * 50.0) + 1.0)
    base.select(
      col("id").as("l_orderkey"),
      floor(lu(53) * partN.toDouble).cast(LongType).as("l_partkey"),
      floor(lu(54) * suppN.toDouble).cast(LongType).as("l_suppkey"),
      col("l_linenumber"),
      qty.as("l_quantity"),
      round(qty * (lu(55) * 4150.0), 2).as("l_extendedprice"),
      round(lu(56) * 0.1, 2).as("l_discount"),
      round(lu(57) * 0.08, 2).as("l_tax"),
      element_at(array(lit("N"), lit("A"), lit("R")),
        (pmod(xxhash64(col("id"), col("l_linenumber"), lit(58)), lit(3L)) + 1)
          .cast(IntegerType)).as("l_returnflag"),
      element_at(array(lit("O"), lit("F")),
        (pmod(xxhash64(col("id"), col("l_linenumber"), lit(59)), lit(2L)) + 1)
          .cast(IntegerType)).as("l_linestatus"),
      to_timestamp_ntz(date_add(
        lit(java.sql.Date.valueOf("1995-01-02")),
        (floor(lu(60) * 2404.0) + floor(lu(61) * 95.0)).cast(IntegerType))).as("l_shipdate"))
  }

  /** Events: fixed 30-day span regardless of sf (measured: every
    * driver sf spans 2024-01), `ts` monotone in `event_id` (each id
    * owns a span/n slot with sub-slot jitter — uniform marginal,
    * sorted like the driver corpus), uniform users, exponential
    * value (mean 50: measured median 34.8 ≈ 50·ln 2).
    */
  def events(spark: SparkSession, n: Long, users: Long): DataFrame = {
    val startMicros = 1704067200000000L // 2024-01-01T00:00:00Z
    val spanMicros = 30L * 24 * 3600 * 1000000
    spark.range(n)
      .select(
        col("id").as("event_id"),
        timestamp_micros(
          (lit(startMicros) +
            ((col("id").cast(DoubleType) + u(71)) * lit(spanMicros.toDouble / n))
              .cast(LongType))).as("ts"),
        floor(u(72) * users.toDouble).cast(LongType).as("user_id"),
        pick(Seq("view", "click", "purchase", "signup", "error"), 73).as("event_type"),
        round(lit(-50.0) * log(greatest(lit(1.0) - u(74), lit(1e-12))), 2).as("value"),
        concat(lit("{\"k\": "),
          pmod(xxhash64(col("id"), lit(75)), lit(100L)).cast(IntegerType), lit("}"))
          .as("props"))
  }

  /** Documents: 10–100 words uniform off the 30-word vocab, 40% en /
    * 15% each other lang, `source = src(doc_id % 20)`, ~5% of docs
    * carry one rare `dup` token, ~0.16% are EXACT duplicates of the
    * previous doc (the measured 8-in-5000 rate) — realized by
    * deriving all content hashes from a `content_id` that points at
    * `doc_id - 1` for the duplicate docs.
    */
  def documents(
      spark: SparkSession,
      n: Long,
      vocabSize: Long = 30,
      nearDupRate: Double = 0.0,
  ): DataFrame = {
    val vocab = Seq(
      "spark", "window", "merge", "table", "column", "vector", "stream", "value", "data",
      "small", "join", "filter", "big", "group", "hash", "customer", "sort", "order",
      "slow", "line", "part", "fast", "the", "row", "agg", "key", "query", "a", "scan",
      "batch")
    val vocabArr = array(vocab.map(lit): _*)
    // base token of content stream `c` at position j (1-based)
    def tokenAt(c: Column, j: Column): Column = {
      val widx = pmod(xxhash64(c, lit(85), j), lit(vocabSize))
      // default vocab-30 keeps driver-corpus fidelity
      // (ScaleCorpusSpec contracts); a larger vocab swaps in
      // synthetic tokens so the shingle SPACE grows with the
      // corpus — the realistic-web regime where the ngram inverted
      // index never saturates its df cutoff
      if (vocabSize == 30L) element_at(vocabArr, (widx + 1).cast(IntegerType))
      else concat(lit("w"), widx)
    }
    def kOf(c: Column): Column = (pmod(xxhash64(c, lit(82)), lit(91L)) + 10).cast(IntegerType)
    val isExactDup = pmod(xxhash64(col("id"), lit(81)), lit(625L)) === 0 && col("id") > 0
    // opt-in mid-jaccard near-dup family (nearDupRate > 0): the doc
    // copies the first `cut` tokens of doc_id-1's base stream and
    // fills the rest with its own — prefix fraction f uniform in
    // [0.45, 0.98) realizes word-3-shingle jaccard ≈ f/(2−f) spread
    // over ~[0.3, 0.95], the decile range the banding S-curve audit
    // (dedup_minhash_recall) needs populated. rate 0 (default) is
    // bit-identical to the driver-fidelity corpus: the flag folds to
    // literal false.
    val isNearDup =
      if (nearDupRate == 0.0) lit(false)
      else uc(col("id"), 87) < nearDupRate && col("id") > 0 && !isExactDup
    val cid = when(isExactDup, col("id") - 1).otherwise(col("id"))
    val k = when(isNearDup, kOf(col("id") - 1)).otherwise(kOf(cid))
    val hasDupTok = pmod(xxhash64(cid, lit(83)), lit(20L)) === 0 && !isNearDup
    val dupPos = (pmod(xxhash64(cid, lit(84)), k.cast(LongType)) + 1).cast(IntegerType)
    val cut = when(isNearDup,
      floor((lit(0.45) + uc(col("id"), 88) * 0.53) * k).cast(IntegerType))
      .otherwise(lit(0))
    val contentId = cid.as("content_id")
    spark.range(n)
      .select(col("id"), contentId, k.as("k"), hasDupTok.as("has_dup"), dupPos.as("dup_pos"),
        isNearDup.as("is_near"), cut.as("cut"))
      .select(
        col("id").as("doc_id"),
        array_join(
          transform(sequence(lit(1), col("k")), j =>
            when(col("is_near") && j <= col("cut"), tokenAt(col("id") - 1, j))
              .when(col("is_near"), tokenAt(xxhash64(col("id"), lit(89)), j))
              .when(col("has_dup") && j === col("dup_pos"), lit("dup"))
              .otherwise(tokenAt(col("content_id"), j))),
          " ").as("text"),
        when(uc(col("content_id"), 86) < 0.4, "en")
          .when(uc(col("content_id"), 86) < 0.55, "zh")
          .when(uc(col("content_id"), 86) < 0.7, "es")
          .when(uc(col("content_id"), 86) < 0.85, "fr")
          .otherwise("de").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20L)).cast(IntegerType)).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  /** Embeddings: 64-dim unit vectors = normalized (iid N(0,1) +
    * 0.07·label-center tilt) — reproduces the measured geometry (avg
    * cosine-to-centroid ≈ 0.07, centroid pair cosine ≈ 0, component
    * std = 1/√64).
    */
  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val label = pmod(xxhash64(col("id"), lit(91)), lit(10L)).cast(IntegerType)
    val raw = transform(sequence(lit(0), lit(63)), j =>
      gauss(xxhash64(col("id"), j), 92) + lit(0.07) * gauss(xxhash64(col("label"), j), 93))
    spark.range(n)
      .select(col("id").as("vec_id"), label.as("label"))
      .withColumn("id", col("vec_id"))
      .withColumn("raw", raw)
      .withColumn("norm",
        sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
      .select(
        col("vec_id"),
        transform(col("raw"), x => (x / col("norm")).cast(FloatType)).as("embedding"),
        col("label"))
  }

  /** Row counts at scale factor 1 (10× the driver's sf0.1 corpus). */
  private def rows(base: Long, sf: Double): Long = math.max(1L, math.round(base * sf))

  def writeAll(
      spark: SparkSession,
      sf: Double,
      out: String,
      vocabSize: Long = 30,
      nearDupRate: Double = 0.0,
  ): Unit = {
    val custN = rows(150000, sf)
    val suppN = rows(10000, sf)
    val partN = rows(200000, sf)
    val orderN = custN * 10
    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> region(spark),
      "nation" -> nation(spark),
      "customer" -> customer(spark, custN),
      "supplier" -> supplier(spark, suppN),
      "part" -> part(spark, partN),
      "orders" -> orders(spark, orderN, custN),
      "lineitem" -> lineitem(spark, orderN, partN, suppN),
      "events" -> events(spark, rows(1000000, sf), rows(15000, sf)),
      "documents" -> documents(spark, rows(50000, sf), vocabSize, nearDupRate),
      "embeddings" -> embeddings(spark, rows(20000, sf)),
    )
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalecorpus] wrote $name")
    }
  }

  /** Usage: ScaleCorpus <sf> <outDir> */
  def main(args: Array[String]): Unit = {
    val sf = args(0).toDouble
    val out = args(1)
    // optional 3rd arg: vocabulary size (default 30 = driver-corpus
    // fidelity; scale it with sf to rehearse the unsaturated-shingle
    // regime of a real web corpus)
    val vocabSize = if (args.length > 2) args(2).toLong else 30L
    // optional 4th arg: mid-jaccard near-dup rate (default 0 =
    // driver-corpus fidelity; >0 populates every jaccard decile for
    // the banding S-curve audit)
    val nearDupRate = if (args.length > 3) args(3).toDouble else 0.0
    val spark = GraftSession.getOrCreate()
    writeAll(spark, sf, out, vocabSize, nearDupRate)
    spark.stop()
  }
}
