package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-power probe for the slowest declared gates (the r16 verdict's
  * "Next round" item 5): at sf0.1 no gate scales past 1.75× on a 4×
  * core ratio because the per-gate session/planning floor dominates —
  * so local bench deltas are weak evidence for 100 TB claims. This
  * tool synthesizes a ~K× input (default 10×: K copies of each table
  * with key columns offset into disjoint ranges — K disconnected
  * copies of the graph, K× the corpus/vector set) in a temp dir laid
  * out like an sf directory, then times the UNMODIFIED declared gate
  * functions against it with the noop sink (guide §1.4), so the
  * compute-dominated regime is actually measurable.
  *
  * Run once with SPARK_GRAFT_CPUS=32 and once with 8 on a quiet window
  * and compare: gates whose 8→32 ratio approaches 4 parallelize when
  * compute dominates; gates stuck near 1 are solver/driver-bound at
  * any scale.
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default sf0.1), SPARK_GRAFT_CPUS,
  * GRAFT_SCALE_COPIES (default 10), GRAFT_SCALE_GATES (comma list,
  * default the top non-streaming gates), GRAFT_SCALE_OUT (json path).
  *
  * Exclusions, documented: s2_corpus_ingest / k12b_cdc_stream are
  * micro-batch gates whose scale story is ThroughputBench's events/sec
  * (already in every bench artifact); emb_margin_mining_redundant is
  * the all-pairs ORACLE degenerate — quadratic by contract, so a 10×
  * input means 100× work by design; its scale path (cells/ivf) is
  * probed instead. Timing INCLUDES any eager work in a gate's
  * constructor (iterative loops), exactly like the bench.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("GRAFT_SCALE_COPIES", "10").toInt
    val gates = sys.env.getOrElse("GRAFT_SCALE_GATES",
      "g1_pagerank,g7_bfs_distances,g9_ppr,g10_hits,g15_wpagerank," +
        "g4_als_recs,td_word2vec,emb_margin_mining_cells," +
        "emb_margin_mining_ivf").split(',').toSeq
    val out = sys.env.getOrElse("GRAFT_SCALE_OUT",
      s"SCALE10X_c$cpus.json")
    val spark = graft.GraftSession.builder(
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- stage the K× tables (outside every timed region) ----
    val staged = java.nio.file.Files
      .createTempDirectory("graft-scalebench").toString
    val off = 1000000000L
    def enlarge(table: String, keyCols: Seq[String]): Unit = {
      val src = spark.read.parquet(s"$sfDir/$table.parquet")
      val big = (0 until copies).map { i =>
        keyCols.foldLeft(src)((d, k) =>
          d.withColumn(k, col(k) + lit(i * off)))
      }.reduce(_ unionByName _)
      big.write.mode("overwrite").parquet(s"$staged/$table.parquet")
    }
    enlarge("orders", Seq("o_orderkey", "o_custkey"))
    enlarge("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    enlarge("documents", Seq("doc_id"))
    enlarge("embeddings", Seq("vec_id"))
    println(s"# staged ${copies}x tables under $staged")

    // same fixed CPU-bound calibration probe as Bench, for the artifact
    def calibrate(): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 150000000L, 1L, 32)
        .selectExpr("CAST(xxhash64(id) AS DOUBLE) AS h")
        .agg(Map("h" -> "sum")).head
      (System.nanoTime() - t0) / 1e9
    }.min
    val calib = calibrate()

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val results = gates.flatMap { name =>
      graft.SparkEntry.queries.get(name).map { fn =>
        spark.sparkContext.setJobDescription(s"scalebench:$name")
        val best = (1 to reps).map { r =>
          spark.catalog.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          try fn(spark, staged).write.format("noop")
            .mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"# $name FAILED $e") }
          val t = (System.nanoTime() - t0) / 1e9
          System.err.println(f"# $name rep$r $t%.2f")
          t
        }.min
        name -> best
      }
    }
    spark.sparkContext.setJobDescription(null)
    def r2(v: Double) = math.rint(v * 100) / 100
    val json = results.map { case (n, t) => s"""\"$n\":${r2(t)}""" }
      .mkString("{", ",", "}")
    val line = s"""{"copies":$copies,"cpus":$cpus,""" +
      s""""calib_sec":${r2(calib)},"reps":$reps,""" +
      s""""timed_action":"noop","gates":$json,"src":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    graft.operators.Dedup.releaseCaches()
    spark.stop()
  }
}
