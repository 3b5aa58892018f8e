package graft

import org.apache.spark.sql.functions._

import graft.operators.Frequency

class FrequencySpec extends GraftSpec {
  import spark.implicits._

  test("streaming MG candidates track the hot item across micro-batches, bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val out = Frequency.streamingHeavyHitterCandidates(
      in.toDF().withColumnRenamed("value", "item"), "item",
      k = 4, buckets = 8)
    val q = out.writeStream.format("memory").queryName("mg_cand")
      .outputMode("update").start()
    try {
      // batch 1: hot 60x among 40 distinct tail items
      in.addData(Seq.fill(60)("hot") ++ (0 until 40).map(i => s"t$i"): _*)
      StreamTest.processAllBounded(q)
      val b1 = spark.table("mg_cand")
        .groupBy("item").agg(max("min_count").as("mc"))
        .as[(String, Long)].collect().toMap
      assert(b1.contains("hot"), s"hot missing from $b1")
      // batch 2: hot again — state carries over, count grows
      in.addData(Seq.fill(50)("hot") ++ (0 until 40).map(i => s"u$i"): _*)
      StreamTest.processAllBounded(q)
      val b2 = spark.table("mg_cand")
        .groupBy("item").agg(max("min_count").as("mc"), max("max_count").as("xc"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // MG lower bound <= true count <= upper bound; hot's true = 110
      assert(b2("hot")._1 <= 110L && b2("hot")._2 >= 110L)
      assert(b2("hot")._1 > 50L, s"hot lower bound too weak: ${b2("hot")}")
      // bounded state: every trigger emits <= k rows per bucket
      val lastBatch = spark.table("mg_cand")
      assert(lastBatch.count() <= 2L * 4 * 8, "emission exceeds k*buckets per trigger")
    } finally q.stop()
  }

  /** Skewed stream: "hot" 2400x, "warm" 500x, 100 tail items 71x each —
    * 10000 rows total. */
  private lazy val skewed = {
    val rows = Seq.fill(2400)("hot") ++ Seq.fill(500)("warm") ++
      (0 until 100).flatMap(i => Seq.fill(71)(s"tail$i"))
    rows.zipWithIndex.map { case (item, i) => (i.toLong, item) }
      .toDF("row_id", "item")
  }

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int): Set[(String, Long)] = {
    val n = df.filter(col("item").isNotNull).count()
    df.filter(col("item").isNotNull)
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= n)
      .as[(String, Long)].collect().toSet
  }

  test("exact vs naive groupBy across k, scattered layout") {
    val df = skewed.repartition(7)
    for (k <- Seq(3, 10, 50, 200)) {
      val got = Frequency.heavyHitters(df, "item", k)
        .as[(String, Long)].collect().toSet
      assert(got == naive(df, k), s"mismatch at k=$k")
    }
  }

  test("adversarial layout: hot keys packed into one partition") {
    // range-partition by row_id so "hot" occupies the first partitions
    // entirely — the layout where per-partition summaries are most
    // lopsided; the pigeonhole superset argument must still hold
    val packed = skewed.repartitionByRange(8, col("row_id"))
    for (k <- Seq(4, 20, 141)) { // 141: threshold 70.9 — every tail item
      val got = Frequency.heavyHitters(packed, "item", k)
        .as[(String, Long)].collect().toSet
      assert(got == naive(packed, k), s"mismatch at k=$k")
    }
  }

  test("k=2 returns only an absolute-majority item") {
    val minority = skewed // hot is 24% — no majority
    assert(Frequency.heavyHitters(minority, "item", 2).count() == 0)
    val majority = (Seq.fill(60)("m") ++ Seq.fill(40)("x"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("row_id", "item")
    assert(Frequency.heavyHitters(majority, "item", 2)
      .as[(String, Long)].collect().toSeq == Seq(("m", 60L)))
  }

  test("nulls are excluded from items and from the total") {
    val withNulls = (Seq.fill(6)(Some("a")) ++ Seq.fill(6)(Option.empty[String]))
      .zipWithIndex.map { case (s, i) => (i.toLong, s.orNull) }
      .toDF("row_id", "item")
    // 6 non-null rows; "a" has all of them -> heavy at k=1
    assert(Frequency.heavyHitters(withNulls, "item", 1)
      .as[(String, Long)].collect().toSeq == Seq(("a", 6L)))
  }

  test("non-string key column is cast, output matches its string form") {
    val nums = (Seq.fill(9)(7L) ++ Seq(1L, 2L, 3L))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("row_id", "item")
    val got = Frequency.heavyHitters(nums, "item", 2)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("7", 9L)))
  }

  // ---- count-min sketch ----

  private def cmsData(rows: Seq[String]) =
    rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("row_id", "item")

  test("cms: estimate is never below the true count, and exact on a collision-free toy set") {
    val df = cmsData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
    val sk = Frequency.cmsSketch(df, "item", depth = 4, width = 512)
    val est = Frequency.cmsEstimate(sk, df, "item", depth = 4, width = 512)
      .as[(String, Long)].collect().toMap
    // 3 items into 512 buckets x 4 rows: some row is collision-free
    // with near-certainty, so the min IS the true count
    assert(est == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("cms: est >= true for every item under forced collisions (width 2)") {
    val rows = (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
    val df = cmsData(rows)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Frequency.cmsEstimate(
        Frequency.cmsSketch(df, "item", depth = 3, width = 2),
        df, "item", depth = 3, width = 2)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"$k: est ${est(k)} < true $t") }
    // every sketch row sums to N — no occurrence lost or double-counted
    val rowSums = Frequency.cmsSketch(df, "item", depth = 3, width = 2)
      .groupBy(col("r")).agg(sum(col("cnt")).as("s"))
      .as[(Int, Long)].collect().toMap
    assert(rowSums == Map(0 -> rows.size.toLong, 1 -> rows.size.toLong,
      2 -> rows.size.toLong))
  }

  test("cms: sketches of disjoint shards merge by (r,c) sum to the whole-corpus sketch") {
    val a = cmsData(Seq.fill(4)("x") ++ Seq.fill(2)("y"))
    val b = cmsData(Seq.fill(3)("y") ++ Seq("z"))
    val whole = cmsData(Seq.fill(4)("x") ++ Seq.fill(5)("y") ++ Seq("z"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Int, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val merged = toMap(Frequency.cmsMerge(
      Frequency.cmsSketch(a, "item"), Frequency.cmsSketch(b, "item")))
    assert(merged == toMap(Frequency.cmsSketch(whole, "item")))
  }

  test("kmv: exact below k, estimate envelope above, shard-merge = whole") {
    import org.apache.spark.sql.functions._
    val k = 32
    def sketchOf(items: Seq[Long]): Seq[Long] = {
      val df = items.map(i => ("g", i)).toDF("g", "item")
      Frequency.kmvSketches(df, "g", "item", k)
        .select(col("sketch")).as[Seq[Long]].collect().head
    }
    // below k: the sketch IS the hashed set, estimate exact
    val small = sketchOf((1L to 10L))
    assert(small.size == 10 && small == small.sorted)
    val smallEst = spark.range(1).select(
      Frequency.kmvDistinctEstimate(
        typedLit(small), k)).as[Double].collect().head
    assert(smallEst == 10.0)
    // above k: sketch capped at k, estimate within a loose envelope
    val big = sketchOf((1L to 5000L))
    assert(big.size == k)
    val bigEst = spark.range(1).select(
      Frequency.kmvDistinctEstimate(
        typedLit(big), k)).as[Double].collect().head
    assert(bigEst > 2500 && bigEst < 10000, s"estimate $bigEst")
    // shard sketches union-merge to the whole-data sketch
    val sa = sketchOf((1L to 2500L))
    val sb = sketchOf((2001L to 5000L))
    val merged = spark.range(1).select(
      Frequency.kmvUnion(typedLit(sa), typedLit(sb), k))
      .as[Seq[Long]].collect().head
    assert(merged == big)
    // self-intersection estimates the full set
    val selfInt = spark.range(1).select(
      Frequency.kmvIntersectEstimate(typedLit(big), typedLit(big), k))
      .as[Double].collect().head
    assert(math.abs(selfInt - bigEst) < bigEst * 0.1)
  }
}
