package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SimHash64Expr, VectorFunctions}
import graft.operators.IvfIndex
import graft.sources.Tables

class IvfIndexSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("centroids have the embedding dimension and one row per cell") {
    val emb = Tables(spark, sf, "embeddings")
    val cents = IvfIndex.centroids(emb)
    val nCells = emb.select("label").distinct().count()
    assert(cents.count() == nCells)
    assert(cents.select(size(col("centroid"))).distinct().head.getInt(0) == 64)
  }

  test("one k-means step never decreases mean cosine to the assigned centroid") {
    val emb = Tables(spark, sf, "embeddings")
    val cents = IvfIndex.centroids(emb)
    // similarity of each vector to its ORIGINAL cell's centroid
    val orig = emb
      .join(cents, emb("label") === cents("cell"))
      .select(VectorFunctions.cosine(col("embedding"), col("centroid")).as("sim"))
      .agg(avg("sim")).head.getDouble(0)
    // similarity after nearest-centroid reassignment
    val reassigned = IvfIndex.assign(emb, cents)
      .agg(avg("sim")).head.getDouble(0)
    assert(reassigned >= orig - 1e-12, s"reassignment decreased similarity: $reassigned < $orig")
  }

  test("gated integer assignments equal the rank-window assign view") {
    val emb = Tables(spark, sf, "embeddings")
    val viaWindow = IvfIndex
      .assign(emb, IvfIndex.centroids(emb))
      .select(col("vec_id"), col("assigned_cell"))
    val viaAgg = IvfIndex.assignments(spark, sf)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "max_by argmax disagrees with the window argmax")
  }

  test("iterated Lloyd rounds monotonically improve mean assigned similarity") {
    val emb = Tables(spark, sf, "embeddings")
    // mean cosine of each vector to its assigned centroid, per round
    def quality(assign: org.apache.spark.sql.DataFrame): Double = {
      val withCell = emb.join(assign, "vec_id")
      val cents = IvfIndex.centroids(
        withCell.select(col("vec_id"), col("embedding"), col("assigned_cell").as("label"))
      )
      withCell
        .join(cents, col("assigned_cell") === col("cell"))
        .select(VectorFunctions.cosine(col("embedding"), col("centroid")).as("sim"))
        .agg(avg("sim")).head.getDouble(0)
    }
    val q1 = quality(IvfIndex.kmeansIterated(spark, sf, iters = 1))
    val q3 = quality(IvfIndex.kmeansIterated(spark, sf, iters = 3))
    assert(q3 >= q1 - 1e-9, s"more Lloyd rounds degraded the quantizer: $q3 < $q1")
  }

  test("IVF gates share one memoized round-1 artifact per (session, dir)") {
    IvfIndex.invalidate()
    val a = IvfIndex.round1Assignment(spark, sf)
    val b = IvfIndex.round1Assignment(spark, sf)
    assert(a eq b, "second IVF-gate call must reuse the memoized round-1 frame")
    IvfIndex.invalidate()
  }

  test("invalidate unpersists the round-1 blocks by artifact name, not value liveness") {
    import org.apache.spark.storage.StorageLevel
    IvfIndex.invalidate()
    val persisted = IvfIndex.round1Assignment(spark, sf)
    persisted.count() // materialize the storage blocks
    assert(persisted.storageLevel != StorageLevel.NONE, "artifact should be persisted")
    // key-based cleanup drops the named catalog artifact — the path
    // that still works when the soft value reference was GC-cleared
    // before invalidation (closures in the plan defeat
    // rebuild-and-match unpersist, so the NAME is the handle)
    IvfIndex.invalidate()
    assert(
      persisted.storageLevel == StorageLevel.NONE,
      "invalidate() left the round-1 storage blocks registered",
    )
  }

  test("label-noise audit: majority is the exact cell plurality, suspects are the disagreers") {
    val rows = graft.operators.Similarity.labelNoiseAudit(spark, sf).collect()
      .map(r =>
        (r.getAs[Long]("vec_id"), r.getAs[Int]("assigned_cell"),
          r.getAs[Int]("label"), r.getAs[Int]("majority_label"), r.getAs[Int]("is_suspect")))
    assert(rows.length == Tables(spark, sf, "embeddings").count())
    // independent in-memory plurality per cell: max count, ties to smallest label
    val expectedMajority = rows.groupBy(_._2).view.mapValues { members =>
      members.groupBy(_._3).view.mapValues(_.length).toSeq.maxBy { case (l, n) => (n, -l) }._1
    }.toMap
    rows.foreach { case (id, cell, label, majority, suspect) =>
      assert(majority == expectedMajority(cell), s"vec $id cell $cell")
      assert(suspect == (if (label != majority) 1 else 0))
    }
    // the cells stay anchored to their seed labels on this corpus
    assert(rows.map(r => (r._2, r._4)).distinct.forall { case (c, m) => c == m })
  }

  test("contrastive mining: kinds follow labels, blocking follows cells, ranks follow cosine") {
    val asg = IvfIndex.assignments(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labels = Tables(spark, sf, "embeddings").select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = graft.operators.Similarity.mineContrastive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, kind, rank, n) =>
      assert(a != n, "anchor mined itself")
      assert(asg(a) == asg(n), s"pair ($a,$n) crossed the cell block")
      assert(rank >= 1 && rank <= 3)
      val same = labels(a) == labels(n)
      assert(if (kind == "pos") same else !same, s"kind mislabeled for ($a,$n)")
    }
    // per (anchor, kind) the ranks are a prefix 1..m with no gaps
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, g) =>
      assert(g.map(_._3).sorted.sameElements(1L to g.length.toLong), s"rank gap at $k")
    }
  }

  test("mining prefix staircase: exact below 5120 vectors, one plane per doubling, capped at 8") {
    import graft.operators.Similarity.miningPrefixPlanes
    // every driver-test corpus sits in the exact (p = 0) regime, so
    // the oracle gates check the EXACT within-cell miner
    assert(miningPrefixPlanes(200L) == 0 && miningPrefixPlanes(5000L) == 0)
    assert(miningPrefixPlanes(5120L) == 1)
    assert(miningPrefixPlanes(20000L) == 2) // sf1e
    assert(miningPrefixPlanes(80000L) == 4) // sf4e
    assert(miningPrefixPlanes(200000L) == 6) // sf10e
    assert(miningPrefixPlanes(10000000L) == 8, "cap")
    // block size stays ~bounded: n / (cells · 2^p) ≤ 2·2560 everywhere
    for (n <- Seq(5119L, 5120L, 40960L, 655360L, 5000000L)) {
      val p = miningPrefixPlanes(n)
      if (p < 8) assert(n.toDouble / (10 << p) <= 512 + 512, s"block too big at n=$n")
    }
  }

  test("scaled mining runs the approximate p >= 1 regime and its invariants hold") {
    import graft.operators.Similarity
    val n = Tables(spark, sf, "embeddings").count()
    val r = (Similarity.MiningBlockThreshold + n - 1) / n
    // the gate's whole point: the expanded corpus sits PAST the first
    // staircase threshold, so the SRP prefix is live (p >= 1), while
    // the plain gate's corpus sits below it (p = 0)
    assert(Similarity.miningPrefixPlanes(n) == 0, "fixture must be in the exact regime")
    assert(Similarity.miningPrefixPlanes(n * r) >= 1, "scaled corpus must be approximate")
    val asg = IvfIndex.assignments(spark, sf).collect()
      .map(row => row.getLong(0) -> row.getInt(1)).toMap
    val rows = Similarity.mineContrastiveScaled(spark, sf).collect()
      .map(row => (row.getLong(0), row.getString(1), row.getLong(2), row.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, kind, rank, nb) =>
      assert(a != nb, "anchor mined itself")
      // replicas inherit their original's cell: the block key's cell
      // half must agree (original id = replica id / r)
      assert(asg(a / r) == asg(nb / r), s"pair ($a,$nb) crossed the cell block")
      assert(rank >= 1 && rank <= 3)
      assert(kind == "pos" || kind == "neg")
    }
    // kinds follow the ROTATED labels (label' = (label + rep) mod 10)
    val labels = Tables(spark, sf, "embeddings").select(col("vec_id"), col("label"))
      .collect().map(row => row.getLong(0) -> row.getInt(1)).toMap
    rows.foreach { case (a, kind, _, nb) =>
      val same = (labels(a / r) + a % r) % 10 == (labels(nb / r) + nb % r) % 10
      assert(if (kind == "pos") same else !same, s"kind mislabeled for ($a,$nb)")
    }
    // the SRP prefix demonstrably gates the blocking: every mined
    // pair collides on the p sign bits, and at least one cell is
    // genuinely SPLIT by them (so p >= 1 changed the candidate sets
    // relative to the exact cell-only miner)
    val p = Similarity.miningPrefixPlanes(n * r)
    val bk = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), graft.functions.VectorFunctions.lshBucket(col("embedding"), p).as("bk"))
      .collect().map(row => row.getLong(0) -> row.getInt(1)).toMap
    rows.foreach { case (a, _, _, nb) =>
      assert(bk(a / r) == bk(nb / r), s"pair ($a,$nb) crossed the SRP bucket")
    }
    val splitCells = bk.keys.groupBy(asg).values.count(_.map(bk).toSet.size > 1)
    assert(splitCells >= 1, "the SRP plane must split at least one cell's candidates")
  }

  test("simhash64: identical texts collide, different texts differ") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different set of words entirely here"),
    ).toDF("id", "text").select(col("id"), SimHash64Expr(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }
}
