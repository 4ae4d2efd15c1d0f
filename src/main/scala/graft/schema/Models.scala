package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Single source of truth for the voting-domain entity shapes.
  *
  * The reference declares three *disagreeing* schemas (Postgres DDL at
  * reference main.py:20-68, the JSON wire shape at main.py:97-116, and
  * the Spark StructType at spark-streaming.py:28-53 — which duplicates
  * `voter_id`, declares `address.zip` that producers never send, and
  * drops `registration_number`/`email`). Here each entity is one Scala
  * case class; the StructType is derived from its Encoder, so there is
  * exactly one schema per entity and it matches what producers emit.
  */
final case class Address(
    street: String,
    city: String,
    state: String,
    country: String,
    postcode: String,
)

/** Voter registration record (reference main.py:97-116). */
final case class Voter(
    voter_id: String,
    voter_name: String,
    date_of_birth: String,
    gender: String,
    nationality: String,
    registration_number: String,
    address: Address,
    email: String,
    phone_number: String,
    picture: String,
    registered_age: Integer,
)

/** Candidate dimension row (reference main.py:21-32, 78-85). */
final case class Candidate(
    candidate_id: String,
    candidate_name: String,
    party_affiliation: String,
    biography: String,
    campaign_platform: String,
    photo_url: String,
)

/** Enriched vote event: voter fields ∪ candidate fields ∪
  * {voting_time, vote} (right-biased dict merge at reference
  * voting.py:88-91). The same shape, with candidate/vote fields null,
  * also models a bare registration record — `voters_topic` multiplexes
  * both kinds (reference main.py:195-200 vs voting.py:109-115).
  */
final case class VoteEvent(
    voter_id: String,
    voter_name: String,
    date_of_birth: String,
    gender: String,
    nationality: String,
    registration_number: String,
    address: Address,
    email: String,
    phone_number: String,
    picture: String,
    registered_age: Integer,
    candidate_id: String,
    candidate_name: String,
    party_affiliation: String,
    biography: String,
    campaign_platform: String,
    photo_url: String,
    voting_time: Timestamp,
    vote: Integer,
)

/** Changelog row of the votes-per-candidate aggregate
  * (reference spark-streaming.py:75-76).
  */
final case class CandidateTotals(
    candidate_id: String,
    candidate_name: String,
    party_affiliation: String,
    photo_url: String,
    total_votes: Long,
)

/** Changelog row of the turnout-by-state aggregate (reference
  * spark-streaming.py:78-79; the output column really is `count` —
  * the reference's .alias names the DataFrame, not the column).
  */
final case class StateTurnout(state: String, count: Long)

object Models {
  /** Wire schema for everything on the vote topic: one permissive
    * StructType covering registrations and enriched votes.
    */
  val voteEventSchema: StructType = Encoders.product[VoteEvent].schema
  val voterSchema: StructType = Encoders.product[Voter].schema
  val candidateSchema: StructType = Encoders.product[Candidate].schema

  /** ReferenceParity mode: the verbatim schema the reference's Spark
    * job declares (spark-streaming.py:28-53), including its bugs —
    * `voter_id` declared twice (:29 and :48), `address.zip` that
    * producers never send (:45 vs main.py:109-110, so it's always
    * null and country/postcode are dropped), and no
    * registration_number/email (silently dropped by from_json).
    * Kept for parity tests (SURVEY §1.3, §7.5): runs of this mode
    * reproduce the reference's output shapes exactly; the corrected
    * [[voteEventSchema]] is the engine's default.
    */
  val referenceParityVoteSchema: StructType = {
    import org.apache.spark.sql.types._
    new StructType()
      .add("voter_id", StringType)
      .add("candidate_id", StringType)
      .add("voting_time", TimestampType)
      .add("voter_name", StringType)
      .add("party_affiliation", StringType)
      .add("biography", StringType)
      .add("campaign_platform", StringType)
      .add("photo_url", StringType)
      .add("candidate_name", StringType)
      .add("date_of_birth", StringType)
      .add("gender", StringType)
      .add("nationality", StringType)
      .add(
        "address",
        new StructType()
          .add("street", StringType)
          .add("city", StringType)
          .add("state", StringType)
          .add("zip", StringType),
      )
      .add("voter_id", StringType) // the reference's duplicate field, kept verbatim
      .add("phone_number", StringType)
      .add("picture", StringType)
      .add("registered_age", IntegerType)
      .add("vote", IntegerType)
  }
}
