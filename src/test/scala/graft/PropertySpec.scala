package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VotingOps
import graft.sources.VoteIngest
import graft.streaming.VotePipeline

/** Property-based invariants (SURVEY §5.4): hold for ARBITRARY event
  * sets, orderings, duplications, and micro-batch splits — not just
  * the fixtures. ScalaCheck generators drive deterministic samples
  * (seeded, so failures reproduce).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def voteJson(voter: Int, cand: Int, t: Int): String = {
    val mm = (t / 60) % 60
    val ss = t % 60
    f"""{"voter_id":"v$voter","candidate_id":"c$cand","candidate_name":"C$cand","party_affiliation":"P${cand % 2}","photo_url":"u$cand","address":{"street":"s","city":"c","state":"S${voter % 3}","country":"x","postcode":"p"},"voting_time":"2024-10-24 12:$mm%02d:$ss%02d","vote":1}"""
  }

  private val eventsGen: Gen[List[(Int, Int, Int)]] =
    Gen.nonEmptyListOf(for {
      voter <- Gen.choose(0, 20)
      cand <- Gen.choose(0, 3)
      t <- Gen.choose(0, 3000)
    } yield (voter, cand, t))

  private def samples(n: Int): Seq[List[(Int, Int, Int)]] =
    (1 to n).map(i => eventsGen.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  test("sum of per-candidate totals equals total vote count, any event set") {
    import spark.implicits._
    samples(5).foreach { evs =>
      val df = VoteIngest.parse(evs.map { case (v, c, t) => voteJson(v, c, t) }.toDF("value"))
      val total = VotingOps.votesPerCandidate(df).agg(sum("total_votes")).head.getLong(0)
      assert(total == evs.length.toLong, s"lost votes: $total != ${evs.length}")
    }
  }

  test("dedup is idempotent and keeps exactly one row per voter") {
    import spark.implicits._
    samples(5).foreach { evs =>
      val df = VoteIngest.parse(evs.map { case (v, c, t) => voteJson(v, c, t) }.toDF("value"))
      val order = Seq(col("voting_time"), col("candidate_id"))
      val once = VotingOps.dedupFirstPerKey(df, Seq("voter_id"), order)
      val twice = VotingOps.dedupFirstPerKey(once, Seq("voter_id"), order)
      assert(once.count() == evs.map(_._1).distinct.size.toLong)
      assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
    }
  }

  test("streaming changelog latest-per-key equals batch recompute under arbitrary batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    samples(3).zipWithIndex.foreach { case (evs, i) =>
      val nSplits = (i % 3) + 1
      val jsons = evs.map { case (v, c, t) => voteJson(v, c, t) }
      val stream = MemoryStream[String]
      val name = "prop_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val (q, cap) = VotePipeline.startCaptureQuery(
        VotingOps.votesPerCandidate(VoteIngest.parse(stream.toDF().select($"value"))),
        name,
      )
      jsons.grouped(math.max(1, jsons.size / nSplits)).foreach { batch =>
        stream.addData(batch)
        q.processAllAvailable()
      }
      q.stop()
      val streamed = cap
        .latest(spark, Seq("candidate_id"))
        .select("candidate_id", "total_votes")
      val batch = VotingOps
        .votesPerCandidate(VoteIngest.parse(jsons.toDF("value")))
        .select("candidate_id", "total_votes")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    }
  }

  test("native shingle expressions match composed forms on arbitrary texts") {
    import spark.implicits._
    // texts with runs of spaces, empty tokens, repeats, and
    // non-ASCII codepoints — the edge cases of split/substr semantics
    val tokenGen = Gen.oneOf("a", "bb", "ccc", "", "déjà", "日本", "x y")
    val textGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    val texts = (1 to 60)
      .map(i => textGen.pureApply(Gen.Parameters.default.withSize(12), Seed(1000L + i)))
      .toDF("text")
    Seq(2, 3).foreach { k =>
      val badW = texts
        .select(
          graft.operators.Dedup.shingles(col("text"), k).as("n"),
          graft.operators.Dedup.shinglesComposed(col("text"), k).as("c"),
        )
        .filter(col("n") =!= col("c"))
        .count()
      assert(badW == 0, s"word shingles k=$k diverge on generated texts")
    }
    Seq(3, 5).foreach { k =>
      val badC = texts
        .select(
          graft.operators.Dedup.charShingles(col("text"), k).as("n"),
          graft.operators.Dedup.charShinglesComposed(col("text"), k).as("c"),
        )
        .filter(col("n") =!= col("c"))
        .count()
      assert(badC == 0, s"char shingles k=$k diverge on generated texts")
    }
  }

  test("segment rows losslessly partition arbitrary texts (reassembly, widths, offsets)") {
    import spark.implicits._
    // the boilerplate-scrub kernel must reassemble to the ORIGINAL
    // text for every input (including runs of spaces → empty tokens,
    // non-ASCII, and texts shorter than one segment), with seg_pos
    // the exact token offset and n_tok summing to the token count
    val tokenGen = Gen.oneOf("a", "bb", "ccc", "", "déjà", "zz")
    val textGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    val texts = (1 to 60)
      .map(i => (i.toLong, textGen.pureApply(Gen.Parameters.default.withSize(12), Seed(2000L + i))))
      .toDF("doc_id", "text")
    Seq(3, 8).foreach { width =>
      val segs = graft.operators.Dedup.segmentRows(texts, width).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val byDoc = segs.groupBy(_._1)
      texts.collect().foreach { row =>
        val (id, text) = (row.getLong(0), row.getString(1))
        val toks = text.split(" ", -1)
        val mine = byDoc.getOrElse(id, Array.empty).sortBy(_._2)
        assert(mine.map(_._4).mkString(" ") == text, s"doc $id w=$width reassembly")
        assert(mine.map(_._3).sum == toks.length.toLong, s"doc $id w=$width token sum")
        assert(mine.map(_._2).toSeq == mine.indices.map(_ * width.toLong), s"doc $id offsets")
        assert(mine.forall(_._3 <= width) && mine.dropRight(1).forall(_._3 == width))
      }
    }
  }
}
