package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- (if (sys.env.contains("GRAFT_AUDIT")) sys.env("GRAFT_AUDIT").split(",").toSeq else Seq("mv_rewrite", "a22_quota", "dq_bucket_diff", "a23_theta_overlap", "td_retrieval_eval"))) {
      println(s"===== $q =====")
      try SparkEntry.queries(q)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"failed: $e") }
    }
    spark.stop()
  }
}
