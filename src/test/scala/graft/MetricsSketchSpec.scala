package graft

import org.apache.spark.sql.functions._

import graft.operators.MetricsAgg
import graft.sources.DriverEventsAdapter

class MetricsSketchSpec extends GraftSpec {

  test("mergeable HLL sketches: hour-grain states merge to day-grain counts") {
    val events = DriverEventsAdapter.load(spark, sf)
      .withColumn("workspace_id", col("write_key"))
    // state: hour-grain sketch table (what a micro-batch appends)
    val preAgg = MetricsAgg.activeEventsSketch(events)
    assert(preAgg.schema("uniq_sketch").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // merge: day-grain estimates from stored sketches
    val merged = MetricsAgg.mergeActiveEvents(preAgg)
      .withColumnRenamed("active_events", "est")
    val exact = MetricsAgg.activeEventsExact(events)
      .withColumnRenamed("count", "exact")
    val joined = merged.join(exact, Seq("workspace_id", "period")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Long]("est").toDouble
      val ex = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - ex) / ex < 0.05,
        s"sketch estimate $est too far from exact $ex")
    }
    // splitting the stream and merging the halves' sketches must equal
    // sketching the whole (mergeability = uniqState/uniqMerge contract)
    val h1 = MetricsAgg.activeEventsSketch(events.filter(col("event_id") % 2 === 0))
    val h2 = MetricsAgg.activeEventsSketch(events.filter(col("event_id") % 2 === 1))
    val mergedHalves = MetricsAgg.mergeActiveEvents(h1.unionByName(h2))
    val whole = MetricsAgg.mergeActiveEvents(preAgg)
    val cmp = mergedHalves.withColumnRenamed("active_events", "halves")
      .join(whole, Seq("workspace_id", "period")).collect()
    cmp.foreach { r =>
      assert(r.getAs[Long]("halves") == r.getAs[Long]("active_events"))
    }
  }
}
