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
