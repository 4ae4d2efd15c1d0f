package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * BinaryType columns with typed metadata, processed by per-partition
  * batch operators (the Scala analogue of mapInPandas: one iterator
  * of rows per partition, amortized decoder setup per partition, no
  * driver involvement).
  *
  * The actual codec step is STUBBED (this container has no
  * image/audio libraries): [[DecodeStub.decode]] derives
  * deterministic fake features from the bytes. Everything around the
  * stub — binary schema, partitioning, batch iteration, feature
  * schema — is real and tested, so swapping in a real decoder is a
  * one-function change.
  */
object Multimodal {

  /** A media payload row: opaque bytes + typed metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  /** Features a decoder would produce (dimensions, frame count…). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      magic: String,
      width: Int,
      height: Int,
      n_frames: Int,
  )

  object DecodeStub {
    /** STUB decoder: a real implementation would parse the codec
      * headers / decode frames here (e.g. via javax.imageio or ffmpeg
      * bindings). This deterministic fake derives pseudo-metadata
      * from the payload so the pipeline shape is fully exercised.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.content.length.toLong
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = n,
        magic = r.content.take(4).map("%02x".format(_)).mkString,
        width = (n % 640).toInt,
        height = ((n / 7) % 480).toInt,
        n_frames = (n % 24).toInt + 1,
      )
    }
  }

  /** Wrap the documents table as a media table: the text payload
    * plays an opaque binary blob (UTF-8 bytes), typed by a fake
    * media_type derived from the doc id.
    */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
      )
      .as[MediaRecord]
  }

  /** Per-partition batch decode: the decoder is instantiated once per
    * partition (amortized setup — exactly the mapInPandas batching
    * contract), rows stream through it without materializing the
    * partition.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would go here (open codec once)
      it.map(DecodeStub.decode)
    }
  }

  /** Frame sampling: explode each media payload into one row per
    * (stub-decoded) frame — the generator/explode shape of
    * per-frame feature extraction. Frame count is the deterministic
    * fake from the decode stub, so the expansion is oracle-checkable;
    * a real decoder swaps the count source only.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val nBytes = octet_length(col("text")).cast("long")
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        explode(sequence(lit(0L), nBytes % 24)).as("frame_idx"),
      )
  }

  /** Oracle-checkable twin of the decode pipeline: the same feature
    * derivation expressed as column expressions (bytes length, md5
    * prefix magic, modular pseudo-dimensions), verifiable in DuckDB.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val nBytes = octet_length(col("text")).cast("long")
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("media_type"),
        nBytes.as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("content_magic"),
        (nBytes % 640).cast("int").as("width"),
        expr("CAST((octet_length(text) div 7) % 480 AS INT)").as("height"),
        ((nBytes % 24) + 1).cast("int").as("n_frames"),
      )
  }
}
