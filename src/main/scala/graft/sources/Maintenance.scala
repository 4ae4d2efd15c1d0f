package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance operations a 100 TB corpus needs continuously.
  *
  * Streaming ingestion (and any per-partition writer) accretes small
  * files; unmanaged, a year of micro-batches turns every scan into a
  * listing+open storm and every task into a sub-split. Compaction
  * rewrites a directory into size-targeted files — the Spark-native
  * form of what table formats call OPTIMIZE/rewrite_data_files.
  */
object Maintenance {

  /** Rewrite `inDir`'s parquet into `outDir` with ~`targetRowsPerFile`
    * rows per output file.
    *
    * Two knobs, both required:
    *  - `repartition(n)` bounds the file COUNT from above (one writer
    *    task per partition — without it a 10k-partition input yields
    *    10k outputs no matter the size target);
    *  - `maxRecordsPerFile` bounds file SIZE from below the other
    *    direction (a skewed partition splits into multiple files
    *    rather than one giant one).
    *
    * Row-count based rather than byte-based because row width is
    * stable within a table; a byte target divides through the same
    * way. Returns the compacted relation.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetRowsPerFile: Long,
  ): DataFrame = {
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(nFiles)
      .write
      .option("maxRecordsPerFile", targetRowsPerFile)
      .mode("overwrite")
      .parquet(outDir)
    spark.read.parquet(outDir)
  }
}
