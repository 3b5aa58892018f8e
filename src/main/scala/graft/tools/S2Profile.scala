package graft.tools

import org.apache.spark.sql.functions._
import graft._

/** Timing breakdown for s2_corpus_ingest: streaming run vs the same
  * three batches pushed through CorpusIngest.processBatch directly —
  * separates micro-batch engine overhead from the dedup work. */
object S2Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val in = QueriesSystem.stageCorpusBatches(spark, dir)
    // warmup (JIT + parquet)
    spark.read.parquet(s"$dir/documents.parquet").count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    timed("streaming total") {
      val idx = tmp("s2p-idx"); val out = tmp("s2p-out"); val cp = tmp("s2p-cp")
      val q = streaming.CorpusIngest.start(spark, in, idx, out, cp,
        shufflePartitions = 8)
      try q.awaitTermination() finally q.stop()
    }

    timed("batch-mode total") {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "8")
      val idx = tmp("s2p2-idx"); val out = tmp("s2p2-out")
      val schema = streaming.CorpusIngest.DocSchema
      new java.io.File(in).listFiles().sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) =>
          timed(s"  batch ${f.getName}") {
            val batch = s2.read.schema(schema).json(f.toString)
            streaming.CorpusIngest.processBatch(batch, idx, out,
              n = 3, threshold = 0.5, numHashes = 128, rowsPerBand = 2,
              batchId = i.toLong)
          }
        }
    }
    spark.stop()
  }
}
