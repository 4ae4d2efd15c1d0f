package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** Pins the k-anonymity contract: the census flag is consistent with
  * its own counts, and generalization PARTITIONS the event log —
  * every row lands in exactly one released (or suppressed) class,
  * released classes all meet k, and suppression is the only way out.
  */
class PrivacySpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("census: meets_k flag matches its own n_users on every class") {
    val bad = Privacy
      .kAnonymityCensus(spark, sf)
      .filter(
        (col("meets_k") === 1 && col("n_users") < Privacy.K) ||
          (col("meets_k") === 0 && col("n_users") >= Privacy.K))
      .count()
    assert(bad == 0)
  }

  test("generalization partitions the corpus and releases only k-anonymous classes") {
    val out = Privacy.kAnonymityGeneralize(spark, sf)
    val total = graft.sources.Tables(spark, sf, "events").count()
    val sums = out
      .groupBy("level")
      .agg(sum("n_rows").as("rows"), count(lit(1)).as("classes"))
      .collect()
      .map(r => r.getAs[String]("level") -> (r.getAs[Long]("rows"), r.getAs[Long]("classes")))
      .toMap
    // exactly-one-class-per-event: the three levels' row counts sum
    // to the corpus (no event dropped, none double-released)
    assert(sums.values.map(_._1).sum == total, sums.toString)
    // at sf0.001 all three outcomes are exercised (868 hour cells all
    // fail; 97 of 150 day classes pass; 53 suppress — measured)
    assert(Set("day", "suppressed").subsetOf(sums.keySet), sums.toString)
    // released classes meet k; suppressed ones don't
    assert(
      out.filter(col("level") =!= "suppressed" && col("n_users") < Privacy.K).count() == 0)
    assert(
      out.filter(col("level") === "suppressed" && col("n_users") >= Privacy.K).count() == 0)
  }

  test("l-diversity: flag matches counts and n_sensitive never exceeds n_rows") {
    val census = Privacy.lDiversityCensus(spark, sf)
    assert(
      census
        .filter(
          (col("meets_l") === 1 && col("n_sensitive") < Privacy.L) ||
            (col("meets_l") === 0 && col("n_sensitive") >= Privacy.L) ||
            col("n_sensitive") > col("n_rows"))
        .count() == 0)
    // same QI classes as the k census (the two audits line up row-for-row)
    assert(census.count() == Privacy.kAnonymityCensus(spark, sf).count())
  }

  test("t-closeness matches an independent in-memory EMD recompute") {
    // both sides key on the Spark-FORMATTED bucket string: parsing it
    // back with Timestamp.valueOf would re-interpret it in the JVM
    // default timezone, not the UTC session timezone that rendered it
    val rows = graft.sources.Tables(spark, sf, "events")
      .selectExpr(
        "event_type",
        "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS bucket",
        "CAST(get_json_object(props, '$.k') AS INT) AS sens")
      .collect()
      // sens is nullable (unparseable payloads): keep None distinct
      // from 0 so the recompute mirrors the operator's rule — null
      // rows count toward n_c and N but never enter the L1 terms
      .map(r =>
        (r.getAs[String](0), r.getAs[String](1),
          if (r.isNullAt(2)) None else Some(r.getInt(2))))
    val n = BigInt(rows.length)
    val nNull = BigInt(rows.count(_._3.isEmpty))
    val marg = rows.collect { case (_, _, Some(s)) => s }
      .groupBy(identity).view.mapValues(v => BigInt(v.length)).toMap
    val expected = rows.groupBy(r => (r._1, r._2)).collect {
      case (k, v) if v.exists(_._3.isDefined) =>
        val nc = BigInt(v.length)
        val cls = v.collect { case (_, _, Some(s)) => s }
          .groupBy(identity).view.mapValues(g => BigInt(g.length)).toMap
        // L1 over the full non-null domain (absent values contribute
        // cnt_s * nc) plus the corpus-wide null mass, which the
        // engine's (N - sum_present)·n_c absent term folds in — an
        // unparseable payload is maximally divergent by definition
        val l1 = marg.map { case (s, cs) => (cls.getOrElse(s, BigInt(0)) * n - cs * nc).abs }.sum +
          nNull * nc
        k -> (BigInt(1000000) * l1 / (BigInt(2) * nc * n)).toLong
    }
    val got = Privacy.tClosenessCensus(spark, sf).collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[String]("bucket")) -> r.getAs[Long]("t_dist")
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, d) => assert(got(k) == d, s"class $k") }
  }

  test("hour-passing cells keep full resolution (never coarsened)") {
    val census = Privacy.kAnonymityCensus(spark, sf).filter(col("meets_k") === 1)
    val released = Privacy.kAnonymityGeneralize(spark, sf).filter(col("level") === "hour")
    assert(census.count() == released.count())
  }
}
