package graft.tools

/** Dev probe: run the s1 streaming pipeline once and dump per-batch
  * durationMs breakdowns (addBatch/getBatch/walCommit/stateStore...)
  * from the streaming progress events. */
object S1Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val in = graft.QueriesSystem.stageStreamingInput(spark, sfDir)
    val wh = java.nio.file.Files.createTempDirectory("s1p-wh").toFile.getAbsolutePath
    val cp = java.nio.file.Files.createTempDirectory("s1p-cp").toFile.getAbsolutePath
    val t0 = System.nanoTime()
    val q = graft.streaming.EventPipeline.start(spark, in, wh, cp)
    try q.awaitTermination() finally {
      q.recentProgress.foreach { p =>
        println(f"#### batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
        p.stateOperators.foreach(so =>
          println(s"####   state: commitMs=${so.commitTimeMs} " +
            s"rows=${so.numRowsTotal} memory=${so.memoryUsedBytes}"))
      }
      q.stop()
    }
    println(f"#### total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
