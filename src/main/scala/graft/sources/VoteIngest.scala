package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Models

/** Ingest: raw event bytes → typed vote-event rows.
  *
  * Mirrors the spine of the reference's streaming job
  * (spark-streaming.py:56-70): CAST(value AS STRING) → from_json →
  * flatten — but with the corrected single-source-of-truth schema
  * (graft.schema.VoteEvent) and optional corrupt-record capture that
  * the reference lacks.
  *
  * Source-abstracted by design: the production source is Kafka
  * (`spark.readStream.format("kafka")...option("subscribe", topic)`),
  * but this offline environment has no Kafka connector jar, so tests
  * and benches feed the identical parse pipeline from MemoryStream,
  * file sources, or batch DataFrames. The parse stage never knows
  * which source produced the `value` column — swap is a config
  * string, never a code-path difference (SURVEY §7.5).
  */
object VoteIngest {

  /** Parse a DataFrame (batch or streaming) holding a string/binary
    * `value` column of JSON vote-topic records into flattened typed
    * columns. Permissive: missing fields → null, malformed JSON rows
    * surface in `_corrupt_record` instead of being silently dropped.
    */
  def parse(raw: DataFrame, keepCorrupt: Boolean = false): DataFrame = {
    val opts =
      if (keepCorrupt) Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
      else Map("mode" -> "PERMISSIVE")
    val schema =
      if (keepCorrupt)
        Models.voteEventSchema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
      else Models.voteEventSchema
    raw
      .select(col("value").cast("string").as("value"))
      .select(from_json(col("value"), schema, opts).as("data"))
      .select("data.*")
  }

  /** Streaming source for the vote topic.
    *
    * format = "kafka": production path — subscribe from earliest, as
    * the reference does (spark-streaming.py:56-61).
    * format = "parquet"/"json": file-based streaming used offline.
    * The returned frame always exposes the raw `value` column; feed
    * it to [[parse]].
    */
  def readStream(
      spark: SparkSession,
      format: String,
      pathOrTopic: String,
      options: Map[String, String] = Map.empty,
  ): DataFrame = format match {
    case "kafka" =>
      spark.readStream
        .format("kafka")
        .option("subscribe", pathOrTopic)
        .option("startingOffsets", "earliest")
        .options(options)
        .load()
    case fileFormat =>
      import org.apache.spark.sql.types.{StringType, StructType}
      spark.readStream
        .format(fileFormat)
        .schema(new StructType().add("value", StringType))
        .options(options)
        .load(pathOrTopic)
  }
}
