package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency analysis over unbounded key domains.
  *
  * [[heavyHitters]] finds every item with count >= n/k EXACTLY in two
  * passes (Misra–Gries '82 candidates + exact verify) — the shape that
  * survives 100 TB: the full `groupBy(item)` alternative shuffles every
  * distinct key; this shuffles only candidate rows.
  *
  *  - Pass 1: per-partition Misra–Gries with k counters (mapPartitions —
  *    genuinely imperative per-partition state). Pigeonhole: an item with
  *    global count >= n/k has local count >= n_p/k > n_p/(k+1) in at
  *    least one partition, and MG with k counters retains every item
  *    with local count > n_p/(k+1) — so the union of partition summaries
  *    is a guaranteed SUPERSET of the true heavy hitters, at most
  *    k * numPartitions candidate rows (driver never sees them).
  *  - Pass 2: semi-join the input to the (small, broadcastable)
  *    candidate set, exact groupBy count, filter `cnt * k >= n`. The
  *    total row count rides along as a 1-row cross join (parquet
  *    count(*) is metadata-only — no third data scan).
  *
  * False positives are impossible (pass 2 is exact); false negatives are
  * impossible (superset property). FrequencySpec stress-tests adversarial
  * partition layouts against the naive groupBy.
  */
object Frequency {

  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    import items.sparkSession.implicits._
    val candidates = items.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // decrement-all step: k+1 distinct items each give one up
            val dead = counters.iterator
              .collect { case (key, 1L) => key }.toList
            counters.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
    val total = items.agg(count(lit(1)).as("n_total"))
    items.join(candidates.hint("broadcast"), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(total)
      .filter(col("cnt") * k >= col("n_total"))
      .select(col("item"), col("cnt"))
  }

  /** Streaming state for one Misra–Gries bucket: the live counters plus
    * the total decrement applied so far (the MG error bound — true count
    * of any tracked item is within [counter, counter + decremented]). */
  case class MGState(counters: Map[String, Long], decremented: Long)

  /** STREAMING pass 1 of [[heavyHitters]]: per-trigger heavy-hitter
    * CANDIDATES over an unbounded stream — the live "what's hot right
    * now" feed (frequency caps during ingest, hot-key alarms) where the
    * batch operator's exact second pass would mean re-scanning history.
    *
    * Items hash into `buckets` key-groups; each group keeps ONE
    * Misra–Gries summary with k counters in `GroupState` (RocksDB-ready:
    * state per bucket is ≤ k entries — bounded regardless of stream
    * cardinality or lifetime, the property that makes this safe to run
    * forever). All occurrences of an item land in the same bucket, so
    * the per-bucket superset guarantee IS the global one: any item with
    * total count ≥ bucketRows/(k+1) is still tracked. Emitted
    * `min_count` is the MG lower bound; `max_count` adds the bucket's
    * cumulative decrement (upper bound). Exactness, when needed, is the
    * batch verify pass over the landed table — same split as the batch
    * operator, with pass 1 continuous instead of per-job. */
  def streamingHeavyHitterCandidates(df: DataFrame, itemCol: String,
                                     k: Int, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(k >= 1 && buckets >= 1, "k and buckets must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[String]
      .groupByKey(s => math.floorMod(s.hashCode, buckets))
      .flatMapGroupsWithState[MGState, (String, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val prev = state.getOption.getOrElse(MGState(Map.empty, 0L))
          val counters =
            scala.collection.mutable.HashMap[String, Long](prev.counters.toSeq: _*)
          var dec = prev.decremented
          rows.foreach { x =>
            counters.get(x) match {
              case Some(c) => counters.update(x, c + 1)
              case None if counters.size < k => counters.update(x, 1L)
              case None =>
                dec += 1
                val dead = counters.iterator
                  .collect { case (key, 1L) => key }.toList
                counters.mapValuesInPlace((_, c) => c - 1)
                dead.foreach(counters.remove)
            }
          }
          state.update(MGState(counters.toMap, dec))
          counters.iterator.map { case (i, c) => (i, c, c + dec) }
      }
      .toDF("item", "min_count", "max_count")
  }
}
