package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.operators._

/** Exact recall totals for the approximate ANN variants at each SF —
  * used to pick the property-gate thresholds. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("id") < 10).select(col("id").as("qid"), col("vec"))
      val exactTop = Similarity.bruteForceTopK(q, e, k = 10)
        .select(col("qid"), col("id"))
      def stats(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val perQid = q.select(col("qid")).distinct()
          .join(df.select(col("qid"), col("id"))
              .join(exactTop, Seq("qid", "id"))
              .groupBy("qid").agg(count(lit(1)).as("h")),
            Seq("qid"), "left")
          .select(coalesce(col("h"), lit(0L)).as("h"))
        val r = perQid.agg(sum("h"), min("h")).collect()(0)
        println(s"$sf $name total_hits=${r.getLong(0)} min_per_qid=${r.getLong(1)}")
      }
      stats("ivf", Similarity.ivfTopK(q, e, k = 10, nlist = 16, nprobe = 4))
      stats("lsh", Similarity.lshTopK(q, e, dim = 64, k = 10))
      val pq = Quantization.trainPq(e, dim = 64)
      stats("pq", Quantization.pqTopK(q, e, pq, k = 10))
      stats("ivfpq", Quantization.ivfPqTopK(q, e, pq, k = 10))
    }
    spark.stop()
  }
}
