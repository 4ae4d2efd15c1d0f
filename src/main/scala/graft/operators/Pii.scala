package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** PII detection and redaction — the scrubbing pass every curation
  * pipeline runs before training (emails, phone numbers, IP
  * addresses; the C4/CCNet/Dolma-style regex tier, not NER).
  *
  * The synthetic corpus is a lowercase 31-word vocabulary with no
  * natural PII, so the gates follow the multimodal pattern
  * (Multimodal.scala): SYNTHESIS and DETECTION are independent code
  * paths — a deterministic injector appends PII derived from doc_id
  * arithmetic, the detector is a plain regex pass that knows nothing
  * about the injector, and the oracle recomputes BOTH analytically.
  * A wrong regex, a wrong replacement order, or a wrong match count
  * fails the hash gate; the injector cannot leak into the detector
  * because the oracle derives the expected matches from the same
  * arithmetic, not from the engine's output.
  *
  * Scale shape: everything here is MAP-ONLY over the documents scan —
  * injection, extraction, and redaction are per-row string
  * expressions inside whole-stage codegen with no shuffle at all;
  * the stats gate adds one 3-key aggregation (map-side combine to
  * |pii_type| rows). This is the shape a 100-TB scrub pass needs:
  * embarrassingly parallel, no exchange, output written straight
  * back to the distributed store.
  */
object Pii {

  /** Regex tier. Kept to character classes + bounded repetition so
    * Java regex (Spark) and RE2 (DuckDB) agree exactly — no
    * lookaround, no backreferences, no greedy ambiguity across the
    * class boundaries (longest-match on disjoint classes is
    * identical in both engines).
    */
  val emailPat = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val phonePat = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val ipPat = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** The injection arithmetic, as a dialect-shared SQL fragment
    * (`%`, `||`, `CASE`, `CAST AS STRING` mean the same thing in
    * Spark SQL and DuckDB; integer division is avoided on purpose —
    * `div` vs `//` would fork the dialects). doc_id % 3 docs gain an
    * email, % 9 a second one, % 4 a phone, % 5 an IP — overlapping
    * moduli so some docs carry several PII kinds and counts > 1
    * exercise the multi-match path.
    */
  val injectSql: String =
    "text" +
      " || CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS STRING)" +
      " || '@ex' || CAST(doc_id % 7 AS STRING) || '.com' ELSE '' END" +
      " || CASE WHEN doc_id % 9 = 0 THEN ' cc b' || CAST(doc_id % 100 AS STRING)" +
      " || '@mail.net' ELSE '' END" +
      " || CASE WHEN doc_id % 4 = 0 THEN ' call +1-' || CAST(100 + doc_id % 900 AS STRING)" +
      " || '-' || CAST(100 + (doc_id * 3) % 900 AS STRING)" +
      " || '-' || CAST(1000 + doc_id % 9000 AS STRING) ELSE '' END" +
      " || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS STRING)" +
      " || '.' || CAST((doc_id * 7) % 256 AS STRING)" +
      " || '.' || CAST(1 + doc_id % 254 AS STRING) ELSE '' END"

  /** documents with the deterministic synthetic PII appended. */
  def injectedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), expr(injectSql).as("text"))

  private[graft] def countMatches(text: Column, pat: String): Column =
    size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")

  /** Redaction: email → phone → IP, each replaced by a typed tag.
    * Order is part of the contract (and is safe here: the three
    * classes are disjoint — emails are the only pattern with `@`,
    * phones the only one with `+1-`, IPs require dotted digits the
    * other two replacements never introduce).
    */
  private[graft] def redacted(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPat, "<EMAIL>"),
        phonePat,
        "<PHONE>"),
      ipPat,
      "<IP>")

  /** Per-doc scrub record: match counts per PII type, the redacted
    * text's length and md5 (pinning the replacement byte-for-byte
    * without shipping the text), and the char delta. Map-only.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    scrubRecord(injectedDocs(spark, dir))

  /** The scrub record over ANY frame carrying (doc_id, text) — the
    * SINGLE definition of the per-row scrub expressions, shared by
    * the batch gate and the streaming ingest-time twin
    * (StreamingQueries.piiRedactStream) so the two paths cannot
    * drift. Pure per-row expressions: applies unchanged to a
    * streaming frame (stateless — no watermark, no state store).
    */
  def scrubRecord(in: DataFrame): DataFrame =
    in
      .select(
        col("doc_id"),
        graft.functions.Let.bindArray(col("text")) { t =>
          graft.functions.Let.bindArray(redacted(t)) { r =>
            struct(
              countMatches(t, emailPat).as("n_emails"),
              countMatches(t, phonePat).as("n_phones"),
              countMatches(t, ipPat).as("n_ips"),
              length(t).cast("long").as("len_in"),
              length(r).cast("long").as("len_red"),
              md5(r).as("red_md5"),
            )
          }
        }.as("s"),
      )
      .select(col("doc_id"), col("s.*"))

  /** Corpus PII census: per type, total matches and affected docs —
    * the number a curation team reads before deciding the scrub is
    * load-bearing. One 3-key aggregation over the map-only counts.
    */
  def piiStats(spark: SparkSession, dir: String): DataFrame =
    piiRedact(spark, dir)
      .select(
        explode(
          map(
            lit("email"), col("n_emails"),
            lit("phone"), col("n_phones"),
            lit("ip"), col("n_ips"),
          )).as(Seq("pii_type", "cnt")))
      .groupBy("pii_type")
      .agg(
        sum(col("cnt")).as("n_matches"),
        sum((col("cnt") > 0).cast("long")).as("n_docs"),
      )
}
