package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pii, TextAnalysis}

/** Pins the PII scrub tier: the detector/redactor on hand-built
  * strings (independent of the injector), and the
  * injection-vs-detection agreement invariants on the corpus —
  * the same independent-paths discipline as MultimodalSpec.
  */
class PiiSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("detector and redactor on hand-built strings (no injector involved)") {
    import spark.implicits._
    val rows = Seq(
      // text, emails, phones, ips, redacted
      ("plain words only", 0, 0, 0, "plain words only"),
      ("mail u7@ex2.com end", 1, 0, 0, "mail <EMAIL> end"),
      ("two a1@b.com and c2@d.net", 2, 0, 0, "two <EMAIL> and <EMAIL>"),
      ("call +1-555-123-4567 now", 0, 1, 0, "call <PHONE> now"),
      ("from 10.0.12.255 in", 0, 0, 1, "from <IP> in"),
      // all three kinds in one doc; order of replacement must not
      // cannibalize later matches
      ("x u0@ex0.com +1-100-200-3000 10.1.2.3", 1, 1, 1, "x <EMAIL> <PHONE> <IP>"),
      // decoys that must NOT match: bare @, dotless host, short
      // phone, non-10. address
      ("a@ b.com +1-12-34-567 192.168.0.1", 0, 0, 0, "a@ b.com +1-12-34-567 192.168.0.1"),
    )
    val df = rows.toDF("t", "e", "p", "i", "r")
    val got = df
      .select(
        col("e"), col("p"), col("i"), col("r"),
        Pii.countMatches(col("t"), Pii.emailPat).as("ge"),
        Pii.countMatches(col("t"), Pii.phonePat).as("gp"),
        Pii.countMatches(col("t"), Pii.ipPat).as("gi"),
        Pii.redacted(col("t")).as("gr"),
      )
      .collect()
    for (row <- got) {
      assert(row.getAs[Long]("ge") == row.getAs[Int]("e").toLong, row.toString)
      assert(row.getAs[Long]("gp") == row.getAs[Int]("p").toLong, row.toString)
      assert(row.getAs[Long]("gi") == row.getAs[Int]("i").toLong, row.toString)
      assert(row.getAs[String]("gr") == row.getAs[String]("r"), row.toString)
    }
  }

  test("corpus invariants: injection moduli agree with detection counts") {
    val rows = Pii.piiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val (ne, np, ni) =
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"), r.getAs[Long]("n_ips"))
      val expEmails = (if (id % 3 == 0) 1 else 0) + (if (id % 9 == 0) 1 else 0)
      assert(ne == expEmails, s"doc $id emails: $ne != $expEmails")
      assert(np == (if (id % 4 == 0) 1 else 0), s"doc $id phones: $np")
      assert(ni == (if (id % 5 == 0) 1 else 0), s"doc $id ips: $ni")
      // every replacement is strictly shorter than its match (tags
      // are 4-7 chars; the shortest email is 8), so redaction can
      // only shrink, and shrinks iff something matched
      if (ne + np + ni > 0) assert(r.getAs[Long]("len_red") < r.getAs[Long]("len_in"))
      else assert(r.getAs[Long]("len_red") == r.getAs[Long]("len_in"))
    }
  }

  test("streaming ingest-time scrub lands the batch scrub record exactly") {
    val streamed = graft.streaming.StreamingQueries.piiRedactViaSink(spark, sf)
    val batch = graft.operators.Pii.piiRedact(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("blocklist totals match an independent token-explode recompute") {
    val got = TextAnalysis
      .blocklistFilter(spark, sf)
      .agg(sum("n_bad"), sum("n_bad_distinct"), sum(expr("1 - keep_doc")))
      .collect()(0)
    val exp = graft.sources
      .Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(TextAnalysis.blocklist.map(lit(_)): _*))
      .count()
    assert(got.getLong(0) == exp)
    // the only corpus term on the list is "dup", so every hit doc
    // contributes exactly 1 distinct bad term and loses its keep flag
    val gotDocs = TextAnalysis
      .blocklistFilter(spark, sf)
      .filter(col("n_bad") > 0)
      .count()
    assert(got.getLong(1) == gotDocs)
    assert(got.getLong(2) == gotDocs)
  }
}
