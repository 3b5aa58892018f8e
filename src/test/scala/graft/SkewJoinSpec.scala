package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Both skew remedies must be row-identical to the plain inner join,
  * including under extreme skew (90% of rows on one key), duplicate
  * right-side keys (fan-out), and keys missing from either side. */
class SkewJoinSpec extends GraftSpec {
  import spark.implicits._

  // 90 rows on key 1, one row each on 2..11, plus key 99 absent on the
  // right; right has a duplicate entry for key 2 (fan-out) and a key 50
  // absent on the left.
  private lazy val left = spark.range(90).select(lit(1L).as("k"),
      concat(lit("v"), col("id")).as("lv"))
    .unionByName((2L to 11L).toDF("k").withColumn("lv", lit("tail")))
    .unionByName(Seq((99L, "noright")).toDF("k", "lv"))
  private lazy val right = Seq(
      (1L, "hot"), (2L, "a"), (2L, "b"), (3L, "c"), (50L, "noleft"))
    .toDF("k", "rv")
    .unionByName((4L to 11L).toDF("k").withColumn("rv", lit("r")))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
    df.select("k", "lv", "rv").as[(Long, String, String)]
      .collect().toSeq.sorted

  private lazy val plain = canon(left.join(right, Seq("k")))

  test("saltedJoin == plain join under 90%-one-key skew and fan-out") {
    assert(plain.size == 101) // 90 hot + 2 fan-out on k=2 + 1 + 8 tail
    assert(canon(SkewJoin.saltedJoin(left, right, Seq("k"),
      saltFactor = 8)) == plain)
    // saltFactor 1 degenerates to the plain join
    assert(canon(SkewJoin.saltedJoin(left, right, Seq("k"),
      saltFactor = 1)) == plain)
  }

  test("saltedJoin shuffles on (key, salt) when broadcast is off") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SkewJoin.saltedJoin(left, right, Seq("k"), saltFactor = 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join, got:\n$plan")
      assert(plan.contains("_salt"), "join keys must include the salt")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("hotColdJoin == plain join; hot set actually catches the hot key") {
    assert(canon(SkewJoin.hotColdJoin(left, right, "k",
      hotKeyFraction = 0.5)) == plain)
    // fraction so small every key is "hot" — still identical
    assert(canon(SkewJoin.hotColdJoin(left, right, "k",
      hotKeyFraction = 1.0)) == plain)
  }
}
