package graft.tools

// Scratch plan auditor: prints formatted physical plans for selected
// SparkEntry queries. Run: sbt "runMain graft.tools.PlanAudit q1_agg ..."
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val s = graft.GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("k3_amplitude", "j1b_identity_merge", "k3_posthog")
    names.foreach { n =>
      println(s"##### $n")
      graft.SparkEntry.queries(n)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
