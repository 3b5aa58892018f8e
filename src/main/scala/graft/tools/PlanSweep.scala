package graft.tools
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString()
        val cart = p.contains("CartesianProduct")
        val bnl = p.contains("BroadcastNestedLoopJoin")
        val udf = p.contains("ScalaUDF")
        if (cart || bnl || udf)
          println(s"SWEEP $name cartesian=$cart bnl=$bnl udf=$udf")
      } catch { case e: Throwable => println(s"SWEEP $name ERROR ${e.getMessage.take(80)}") }
    }
    println("SWEEP done")
    spark.stop()
  }
}
