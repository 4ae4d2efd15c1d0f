package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Models

/** ReferenceParity mode: parsing with the reference's verbatim buggy
  * schema must reproduce its exact behaviors (SURVEY §1.3) — null
  * zip, dropped country/postcode/email, aggregations still correct
  * because they never touch the broken fields.
  */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  val voteJson: String =
    """{"voter_id":"v1","candidate_id":"c1","candidate_name":"Alice",
      |"party_affiliation":"P1","photo_url":"u","voting_time":"2024-10-24 12:00:00",
      |"address":{"street":"1 Main","city":"Town","state":"Ohio","country":"US","postcode":"12345"},
      |"email":"v@x.y","registration_number":"r1","vote":1}""".stripMargin.replace("\n", "")

  test("parity schema reproduces the reference's field-loss behavior") {
    import spark.implicits._
    val parsed = Seq(voteJson).toDF("value")
      .select(from_json($"value", Models.referenceParityVoteSchema).as("data"))
    // zip declared but never produced -> null; state still round-trips
    val row = parsed.select("data.address.zip", "data.address.state").head
    assert(row.isNullAt(0))
    assert(row.getString(1) == "Ohio")
    // registration_number/email are silently dropped by the schema
    val fields = Models.referenceParityVoteSchema.fieldNames.toSet
    assert(!fields.contains("email") && !fields.contains("registration_number"))
    // the duplicate voter_id is tolerated by from_json...
    assert(Models.referenceParityVoteSchema.fieldNames.count(_ == "voter_id") == 2)
  }

  test("parity aggregations still work because they avoid the broken fields") {
    import spark.implicits._
    val parsed = Seq(voteJson).toDF("value")
      .select(from_json($"value", Models.referenceParityVoteSchema).as("data"))
    // the reference's votes-per-candidate group keys + sum(vote)
    val agg = parsed
      .groupBy("data.candidate_id", "data.candidate_name", "data.party_affiliation", "data.photo_url")
      .agg(sum("data.vote").as("total_votes"))
      .head
    assert(agg.getAs[Long]("total_votes") == 1L)
    // turnout by state over the parity schema's address
    val turnout = parsed.groupBy("data.address.state").count().head
    assert(turnout.getString(0) == "Ohio" && turnout.getLong(1) == 1L)
  }
}
