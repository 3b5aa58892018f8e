package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Count-min sketch (Cormode–Muthukrishnan '05) as a depth × width
    * counter TABLE `(r, c, cnt)` — the mergeable frequency sketch
    * complementing [[heavyHitters]]' exact two-pass: sketches from
    * disjoint corpus shards (or stream windows) merge by summing on
    * (r, c), and a point estimate never needs the raw data again.
    * Buckets derive from md5 (the same engine-replayable rule as
    * [[Sampling]]'s buckets, NOT a JVM-private hash), so the sketch and
    * every estimate are deterministic and exactly reproducible by any
    * engine — the gate can be hash-exact instead of a bound check.
    * Classic one-sided error: est >= true always (CmsSpec), and
    * overestimates exceed 2N/width with probability < 2^-depth.
    * At 100 TB: one map-side-combinable explode-aggregate over the
    * corpus; the sketch itself is <= depth*width rows regardless of
    * input size. */
  def cmsBucket(item: Column, r: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", item, lit(r.toString))), 1, 8),
      16, 10).cast("long"), lit(width.toLong)).cast("int")

  def cmsSketch(df: DataFrame, itemCol: String, depth: Int = 4,
                width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(posexplode(array((0 until depth).map(r =>
        cmsBucket(col("item"), r, width)): _*)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "c")
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with identical (depth, width): (r, c)-wise
    * sum. This IS the maintenance step — a stored sketch plus each
    * micro-batch's sketch, or per-shard sketches at reduce time; no
    * raw data is revisited. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for every distinct item in `items`:
    * min over the item's depth counters (absent bucket = 0). The sketch
    * side broadcasts (<= depth*width rows by construction). */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame =
    items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).distinct()
      .select(col("item"), posexplode(array((0 until depth).map(r =>
        cmsBucket(col("item"), r, width)): _*)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "c")
      .join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** KMV ("k minimum values") / theta sketches with SET OPERATIONS —
    * the mergeable-sketch family member HLL cannot replace: HLL unions,
    * but only KMV/theta supports INTERSECTION estimates (audience
    * overlap across segments at sketch cost; DataSketches' theta
    * family, Beyer 2007 for the KMV estimator). The sketch of a set is
    * its k smallest distinct 48-bit md5 hash values; union = k smallest
    * of the concatenation; |A∩B| ≈ ρ·2⁴⁸/θ*, where θ* is the smaller
    * sketch threshold and ρ counts shared hash values below it.
    *
    * Scale shape: one (key, hash) distinct shuffle, then `row_number
    * <= k` — which compiles to `WindowGroupLimit`, so every partition
    * forwards at most k rows per key map-side (the distributed min-k;
    * never a per-key `collect_set` of the full domain). Sketches are
    * k longs per key; every estimate is integer arithmetic + one
    * division, so sketch AND estimates replay engine-exactly (the
    * cms/md5 precedent — gates can hash-match, not just bound error).
    */
  def kmvSketches(df: DataFrame, keyCol: String, itemCol: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col(itemCol).cast("string")), 1, 12),
      16, 10).cast("long")
    val uniq = df.select(col(keyCol).as("key"), h.as("h"))
      .filter(col("h").isNotNull).distinct()
    val w = Window.partitionBy(col("key")).orderBy(col("h"))
    uniq.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(col("key"))
      .agg(sort_array(collect_list(col("h"))).as("sketch"))
  }

  private val HashSpace = 281474976710656.0 // 2^48

  /** Sketch threshold θ: one past the kth value when the sketch is
    * full, else the whole hash space (the set was seen exactly). */
  def kmvTheta(sketch: Column, k: Int): Column =
    when(size(sketch) < k, lit(HashSpace.toLong))
      .otherwise(element_at(sketch, k) + 1L)

  /** Distinct-count estimate: exact when the sketch is not full. */
  def kmvDistinctEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(round(lit((k - 1) * HashSpace) /
        element_at(sketch, k), 2))

  /** Intersection estimate of two sketches: ρ·2⁴⁸/θ*. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val thetaStar = least(kmvTheta(a, k), kmvTheta(b, k))
    val rho = size(array_intersect(
      filter(a, _ < thetaStar), filter(b, _ < thetaStar)))
    round(rho * lit(HashSpace) / thetaStar, 2)
  }

  /** Union sketch: k smallest of the merged value sets (associative +
    * commutative — shard/window sketches merge freely). */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)
}
