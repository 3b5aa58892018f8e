package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.ProfileJob

class ProfileJobSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("incremental cycles rebuild only changed users and upsert") {
    val dir = Files.createTempDirectory("graft-pj").toFile.getAbsolutePath
    val job = new ProfileJob(s"$dir/wh", s"$dir/cp/checkpoint")
    def ev(uid: String, t: String, traits: String = null) =
      (uid, "a" + uid, "identify", "identify", ts(t), null: String, traits)
    val batch1 = Seq(
      ev("u1", "2024-01-01 10:00:00", """{"email":"u1@x.com"}"""),
      ev("u2", "2024-01-02 10:00:00", """{"email":"u2@x.com"}""")
    ).toDF("user_id", "anonymous_id", "type", "event", "timestamp",
      "properties", "traits")
    assert(job.runCycle(batch1, ts("2024-01-03 00:00:00")) == 2)
    assert(job.readProfiles(spark).count() == 2)

    // cycle 2: only u2 has new events; u1's profile must stay intact,
    // u2's must be rebuilt over its FULL history (2 events)
    val batch2 = batch1.unionByName(Seq(
      ev("u2", "2024-01-05 10:00:00", """{"email":"u2-new@x.com"}""")
    ).toDF("user_id", "anonymous_id", "type", "event", "timestamp",
      "properties", "traits"))
    assert(job.runCycle(batch2, ts("2024-01-06 00:00:00")) == 1)
    val profiles = job.readProfiles(spark)
    assert(profiles.count() == 2)
    val u2 = profiles.filter(col("user_id") === "u2").collect().head
    assert(u2.getAs[String]("email") == "u2-new@x.com")
    assert(u2.getAs[Long]("n_events") == 2)
    val u1 = profiles.filter(col("user_id") === "u1").collect().head
    assert(u1.getAs[String]("email") == "u1@x.com")

    // cycle 3: nothing changed -> no-op
    assert(job.runCycle(batch2, ts("2024-01-07 00:00:00")) == 0)
  }
}
