package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** Bloom semi-join pruning: result-identical to a plain semi join,
  * with the probe sitting map-side before the exchange. */
class BloomPruneSpec extends GraftSpec {
  import spark.implicits._

  test("semiJoin equals the plain left_semi result, dups preserved") {
    val big = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (9L, "e"))
      .toDF("k", "v")
    val small = Seq(1L, 3L, 100L).toDF("sk")
    val got = BloomPrune.semiJoin(big, "k", small, "sk",
        expectedItems = 100L, numBits = 4096L)
      .as[(Long, String)].collect().toSet
    val exact = big.join(small.withColumnRenamed("sk", "k"),
        Seq("k"), "left_semi")
      .as[(Long, String)].collect().toSet
    assert(got == exact)
    assert(got == Set((1L, "a"), (1L, "b"), (3L, "d")))
  }

  test("null small-side keys are ignored; empty small side keeps nothing") {
    val big = Seq(1L, 2L).toDF("k")
    val small = Seq[Option[Long]](Some(2L), None).toDF("sk")
    assert(BloomPrune.semiJoin(big, "k", small, "sk", 10L, 1024L)
      .as[Long].collect().toSeq == Seq(2L))
    // fully-empty small side: the aggregate yields a null bloom, the
    // probe evaluates null -> filter drops everything, result empty
    val empty = Seq.empty[Long].toDF("sk")
    assert(BloomPrune.semiJoin(big, "k", empty, "sk", 10L, 1024L)
      .count() == 0L)
  }

  test("probe is a map-side might_contain below the exchange") {
    val big = spark.range(1000).toDF("k")
    val small = Seq(5L, 7L).toDF("sk")
    // force a shuffle join so map-side placement is observable (with
    // broadcast the big side never shuffles at all — also correct)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = BloomPrune.semiJoin(big, "k", small, "sk", 10L, 4096L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"))
      // tree printout lists parents first: the probe filter must be
      // NESTED UNDER the big side's exchange (printed after it), i.e.
      // rows are dropped before they are shuffled
      assert(plan.indexOf("might_contain") > plan.indexOf("Exchange"),
        "probe should sit below the exchange (map-side pruning)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
