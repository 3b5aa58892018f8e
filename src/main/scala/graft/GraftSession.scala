package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the graft engine.
  *
  * All entry points (Verify, Bench, tests) build sessions through here so
  * the scale-sensitive knobs stay in one place:
  *   - `shuffle.partitions` sized to the local core count (not 200); on a
  *     real cluster this is overridden by AQE coalescing anyway.
  *   - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
  *     which is what makes the same plans survive a 100x scale-up.
  *   - UTC session time zone for oracle (DuckDB) parity.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // native expressions on the SQL surface (simhash64, minhash_sig,
      // word_shingles, cosine_sim, dot_product)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Join-strategy knobs (guide §3.1/§9), adopted by the r17
      // evaluation (OPTIMIZATION_r17.md "preferSortMergeJoin
      // evaluation"): let the planner pick shuffled-hash join where its
      // size conditions hold — the sort in SMJ is pure overhead when
      // the per-partition build side fits in memory — and let AQE
      // rewrite SMJ→SHJ at runtime when every post-shuffle partition is
      // under 64 MB (bounded build-side memory; AQE skew-split applies
      // to SHJ too, so a skewed partition still splits rather than
      // OOMs). Env-overridable for A/B measurement.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("GRAFT_SHJ_THRESHOLD", "67108864"))
      .config("spark.sql.session.timeZone", "UTC")
      // UR trait merge concatenates own+identified key maps; later (identified)
      // keys must win, as in lodash merge
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // driver testdata writes TIMESTAMP(NANOS) parquet, which Spark 4 only
      // reads as LongType behind this flag; EventSchema.readEvents converts
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
