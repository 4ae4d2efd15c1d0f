package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("sequence packing partitions each source into contiguous windows covering every doc") {
    val ctx = 256
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = Packing.packSequences(spark, sf, ctx).collect()

    // conservation: every doc lands in exactly one window, so window
    // doc counts sum to the corpus size and token counts to the total
    val nDocs = docs.count()
    assert(packed.map(_.getLong(2)).sum == nDocs)

    val bySource = packed.groupBy(_.getString(0))
    import org.apache.spark.sql.functions._
    val totalTokens = docs
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .head.getLong(0)
    assert(packed.map(_.getLong(3)).sum == totalTokens)

    bySource.foreach { case (src, wins) =>
      val ids = wins.map(_.getLong(1)).sorted
      assert(ids.head == 0L, s"$src: first window is seq 0")
      // windows are contiguous: a doc can start in window k+1 only
      // after earlier docs filled window k (offsets are a running sum)
      assert(
        ids.zip(ids.tail).forall { case (a, b) => b == a + 1 },
        s"$src: window ids not contiguous: ${ids.mkString(",")}",
      )
      // tight offset invariant: if window sid+1 exists, its first doc
      // starts at offset >= (sid+1)*ctx, and that offset IS the
      // cumulative token count through window sid
      val cum = wins.sortBy(_.getLong(1)).map(_.getLong(3)).scanLeft(0L)(_ + _).drop(1)
      ids.init.zip(cum.init).foreach { case (sid, c) =>
        assert(c >= (sid + 1) * ctx, s"$src window $sid under-filled: cum=$c")
      }
    }
  }
}
