package graft.generator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-oriented rebuild of the reference's seeder and voter-simulator
  * stages (main.py:143-215, voting.py:29-135).
  *
  * The reference seeds 1000 voters one HTTP round-trip at a time and
  * simulates votes one Kafka poll + one Postgres INSERT at a time
  * (≤ 2 votes/s, BASELINE.md). Here both stages are single
  * DataFrame programs: `spark.range(n)` drives deterministic
  * column-expression synthesis (seeded via md5 — no RNG state, so
  * any executor re-computes identical rows), and the random candidate
  * pick (voting.py:86) becomes a hash-bucket assignment + broadcast
  * dimension join. Throughput is bounded by cluster width, not
  * round-trips.
  */
object VoteGenerator {

  private val parties = Seq("Management Party", "Savior Party", "Tech Republic Party")
  private val states = Seq("Illinois", "Ohio", "Texas", "Nevada", "Oregon", "Maine")
  private val firstNames = Seq("Alex", "Sam", "Jordan", "Casey", "Riley", "Quinn", "Avery", "Morgan")
  private val lastNames = Seq("Smith", "Jones", "Garcia", "Chen", "Okafor", "Patel", "Kim", "Lopez")

  private def pick(options: Seq[String], h: org.apache.spark.sql.Column) =
    element_at(array(options.map(lit): _*), pmod(h, lit(options.size)).cast("int") + 1)

  /** Stable per-row hash stream: md5(seed|i|field) as a positive int. */
  private def h(seed: Long, i: org.apache.spark.sql.Column, field: String) =
    pmod(conv(substring(md5(concat_ws("|", lit(seed), i, lit(field))), 1, 7), 16, 10).cast("long"), lit(Int.MaxValue))

  /** 3 candidates, parties assigned round-robin (main.py:78-85). */
  def candidates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(3).select(
      concat(lit("cand-"), col("id")).as("candidate_id"),
      concat_ws(" ", pick(firstNames, h(7L, col("id"), "fn")), pick(lastNames, h(7L, col("id"), "ln")))
        .as("candidate_name"),
      element_at(array(parties.map(lit): _*), (col("id") % 3).cast("int") + 1).as("party_affiliation"),
      lit("A brief biography of the candidate").as("biography"),
      lit("Key campaign promises and platform").as("campaign_platform"),
      concat(lit("https://photo.example/"), col("id")).as("photo_url"),
    )
  }

  /** n voter-registration rows with the corrected nested address
    * shape (FIXTURES.md A1).
    */
  def voters(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n).select(
      concat(lit("voter-"), md5(concat_ws("|", lit(seed), col("id")))).as("voter_id"),
      concat_ws(" ", pick(firstNames, h(seed, col("id"), "fn")), pick(lastNames, h(seed, col("id"), "ln")))
        .as("voter_name"),
      date_format(
        date_add(lit("1950-01-01").cast("date"), pmod(h(seed, col("id"), "dob"), lit(18000)).cast("int")),
        "yyyy-MM-dd",
      ).as("date_of_birth"),
      pick(Seq("female", "male"), h(seed, col("id"), "g")).as("gender"),
      lit("US").as("nationality"),
      concat(lit("reg-"), col("id")).as("registration_number"),
      struct(
        concat(pmod(h(seed, col("id"), "st"), lit(9999)), lit(" Main Street")).as("street"),
        lit("Springfield").as("city"),
        pick(states, h(seed, col("id"), "state")).as("state"),
        lit("United States").as("country"),
        lpad(pmod(h(seed, col("id"), "zip"), lit(99999)).cast("string"), 5, "0").as("postcode"),
      ).as("address"),
      concat(lit("voter"), col("id"), lit("@example.test")).as("email"),
      concat(lit("(555)-"), lpad(pmod(h(seed, col("id"), "ph"), lit(9999)).cast("string"), 4, "0"))
        .as("phone_number"),
      concat(lit("https://pic.example/"), col("id")).as("picture"),
      (pmod(h(seed, col("id"), "age"), lit(70)) + 18).cast("int").as("registered_age"),
    )

  /** The voting stage (voting.py:86-91) as a set operation: each
    * voter hash-picks a candidate, then a broadcast equi-join merges
    * the candidate columns; voting_time advances one second per voter
    * from the seeded base (voting.py:89's utcnow at 1 s granularity).
    */
  def votes(spark: SparkSession, votersDf: DataFrame, seed: Long = 21L): DataFrame = {
    val cands = candidates(spark)
    val withPick = votersDf
      .withColumn("__row", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("voter_id")))
      .withColumn(
        "candidate_id",
        concat(lit("cand-"), pmod(conv(substring(md5(concat_ws("|", lit(seed), col("voter_id"))), 1, 7), 16, 10).cast("long"), lit(3))),
      )
    withPick
      .join(broadcast(cands), Seq("candidate_id"))
      .withColumn(
        "voting_time",
        date_format(
          timestamp_seconds(lit(1729771200L) + col("__row")),
          "yyyy-MM-dd HH:mm:ss",
        ).cast("timestamp"),
      )
      .withColumn("vote", lit(1))
      .drop("__row")
  }

  /** Kafka-topic shape: key = voter_id, value = JSON of the full
    * record (main.py:195-200 / voting.py:109-115). Feed `value` to
    * VoteIngest.parse — or `df.write.format("kafka")` in production.
    */
  def toTopicRecords(df: DataFrame): DataFrame =
    df.select(col("voter_id").as("key"), to_json(struct(col("*"))).as("value"))
}
