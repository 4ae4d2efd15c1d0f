package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.generator.VoteGenerator
import graft.operators.VotingOps
import graft.sources.VoteIngest

/** End-to-end rebuild of the reference's full three-stage pipeline:
  * seed → vote → analyze, all set-oriented and deterministic.
  */
class VoteGeneratorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("full pipeline: 1000 seeded voters -> votes -> topic -> parse -> aggregates") {
    val voters = VoteGenerator.voters(spark, 1000)
    assert(voters.count() == 1000)
    assert(voters.select("voter_id").distinct().count() == 1000)

    val votes = VoteGenerator.votes(spark, voters)
    assert(votes.count() == 1000, "every voter votes exactly once")

    // the heterogeneous topic: registrations + enriched votes
    val topic = VoteGenerator.toTopicRecords(voters)
      .unionByName(VoteGenerator.toTopicRecords(votes))
    val parsed = VoteIngest.parse(topic)

    val perCandidate = VotingOps.votesPerCandidate(parsed).collect()
    val real = perCandidate.filter(_.getAs[String]("candidate_id") != null)
    assert(real.map(_.getAs[Long]("total_votes")).sum == 1000L)
    assert(real.length == 3, "all three candidates received votes")
    // registration-only rows form the null-candidate group with null sum
    val nullGroup = perCandidate.find(_.getAs[String]("candidate_id") == null).get
    assert(nullGroup.isNullAt(nullGroup.fieldIndex("total_votes")))

    val turnout = VotingOps.turnoutByLocation(parsed)
    // reference semantics: registrations AND votes both count
    assert(turnout.agg(sum("count")).head.getLong(0) == 2000L)
  }

  test("generation is deterministic across invocations") {
    val a = VoteGenerator.votes(spark, VoteGenerator.voters(spark, 200))
    val b = VoteGenerator.votes(spark, VoteGenerator.voters(spark, 200))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("candidate pick distribution is roughly uniform") {
    val votes = VoteGenerator.votes(spark, VoteGenerator.voters(spark, 1000))
    val counts = votes.groupBy("candidate_id").count().collect().map(_.getLong(1))
    assert(counts.length == 3)
    assert(counts.forall(c => c > 250 && c < 420), s"skewed pick: ${counts.mkString(",")}")
  }
}
