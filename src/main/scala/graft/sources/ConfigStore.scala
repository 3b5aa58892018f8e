package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S4: the live config/connections catalog with a refresh loop.
  *
  * The reference keeps an in-memory entity store per config type and
  * re-fetches it on a short cadence with If-Modified-Since semantics
  * (`libs/core-functions/src/lib/entity-store.ts:32-128`), so a console
  * edit reroutes events within seconds without restarting rotor. The
  * Spark-shaped equivalent: connection configs live in a small JSON
  * directory; the DRIVER checks the directory's modification state
  * before each micro-batch (the If-Modified-Since analogue — a cheap
  * local stat, no Spark job) and re-reads + re-broadcasts the dim only
  * when it actually changed. Joins against [[connections]] stay
  * broadcast joins: the dim is connections-sized (thousands of rows),
  * never event-sized.
  *
  * Scale note: at 1000 executors the refresh is still one driver-side
  * stat per batch; a changed config costs one small re-read and a new
  * broadcast (tens of KB), exactly like the reference shipping a fresh
  * config snapshot to its workers.
  */
class ConfigStore(spark: SparkSession, dir: String) {

  /** connection_id -> destination routing config. `table_name` null =
    * keep the layout's routing; `enabled` false = drop the events. */
  val schema: StructType = StructType(Seq(
    StructField("connection_id", StringType, nullable = false),
    StructField("table_name", StringType),
    StructField("enabled", BooleanType)))

  // (max mtime, file count, total size) — catches edits, adds, deletes
  private def fingerprint(): (Long, Int, Long) = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".json"))
    (files.map(_.lastModified()).maxOption.getOrElse(0L), files.length,
      files.map(_.length()).sum)
  }

  @volatile private var loaded: (DataFrame, (Long, Int, Long)) = null
  @volatile private var lastStatus: String = "initializing"

  /** Refresh health, the reference entity-store contract
    * (`inmem-store.test.ts`): "initializing" before the first
    * successful load, "ok" while fresh, "outdated" when the latest
    * refresh FAILED and the store is serving the previous snapshot. */
  def status: String = lastStatus

  /** The actual directory read — overridable for failure-injection in
    * tests. */
  protected def readDir(fp: (Long, Int, Long)): DataFrame = {
    import org.apache.spark.sql.functions._
    if (fp._2 == 0) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      // read EXACTLY the files the fingerprint tracks — a stray
      // non-.json file must neither be ingested nor invisible-until-
      // an-unrelated-edit
      .option("pathGlobFilter", "*.json")
      .json(dir)
      // one row per connection_id (the reference entity store keys
      // by id): duplicate definitions resolve to the greatest
      // (table_name, enabled) tuple — deterministic regardless of
      // file enumeration order — instead of fanning out the reroute
      // join and double-writing events
      .groupBy(col("connection_id"))
      .agg(max(struct(col("table_name"), col("enabled"))).as("_c"))
      .select(col("connection_id"), col("_c.table_name").as("table_name"),
        col("_c.enabled").as("enabled"))
      .localCheckpoint(true) // materialize: later batches must not re-list
  }

  /** The current connections dim; re-reads the directory only when its
    * fingerprint changed since the last call. Call once per micro-batch
    * (EventPipeline does) — the common case is one `stat` and no job.
    *
    * A FAILED re-read serves the previous snapshot and flips [[status]]
    * to "outdated" (the reference's bad-loader contract) — the old
    * frame is only unpersisted AFTER the replacement materialized, so a
    * mid-refresh crash can never leave the pipeline with a dropped
    * broadcast. A first-load failure has nothing stale to serve and
    * rethrows. */
  def connections(): DataFrame = synchronized {
    val fp = fingerprint()
    if (loaded == null || loaded._2 != fp) {
      try {
        val df = readDir(fp) // localCheckpoint(true): failures surface HERE
        if (loaded != null) loaded._1.unpersist(false)
        loaded = (df, fp)
        lastStatus = "ok"
      } catch {
        case scala.util.control.NonFatal(e) =>
          if (loaded == null) throw e
          lastStatus = "outdated"
      }
    }
    loaded._1
  }
}
