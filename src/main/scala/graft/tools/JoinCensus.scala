package graft.tools

/** One-line join-strategy census per declared query: counts of
  * SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin / Exchange in
  * the INITIAL physical plan (pre-AQE). Used by the r17
  * preferSortMergeJoin evaluation to find which gates' static plans
  * flip under `GRAFT_PREFER_SMJ` / `GRAFT_SHJ_THRESHOLD` (GraftSession
  * env knobs) — run twice, diff the output.
  *
  * `GRAFT_CENSUS_DIR` = testdata dir (default sf0.001);
  * `GRAFT_CENSUS_ONLY` = optional comma-separated subset.
  * Output: `name smj=N shj=N bhj=N bnl=N exch=N` (or `name FAILED ...`).
  *
  * NOTE: building a DataFrame executes any eager work in the query's
  * constructor (sink writes, iterative loops), so the census runs at
  * the smallest SF; plan SHAPE is SF-independent except where size
  * estimates flip a strategy, which is exactly what the sf-specific
  * runs afterwards are for.
  */
object JoinCensus {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("GRAFT_CENSUS_DIR", "/root/testdata/sf0.001")
    val only = sys.env.get("GRAFT_CENSUS_ONLY").map(_.split(',').toSet)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        val line = try {
          spark.catalog.clearCache()
          val p = fn(spark, dir).queryExecution.executedPlan.toString()
          def c(pat: String) = pat.r.findAllIn(p).length
          s"$name smj=${c("SortMergeJoin")} shj=${c("ShuffledHashJoin")} " +
            s"bhj=${c("BroadcastHashJoin")} bnl=${c("BroadcastNestedLoopJoin")} " +
            s"exch=${c("Exchange")}"
        } catch { case e: Throwable =>
          s"$name FAILED ${e.getClass.getSimpleName}"
        }
        println(s"CENSUS $line")
      }
    graft.operators.Dedup.releaseCaches()
    spark.stop()
  }
}
