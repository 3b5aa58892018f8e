package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Quantifies the IVF candidate pruning behind
  * [[graft.operators.Similarity.marginMiningIvf]]: for each nprobe,
  * the candidate-pair count relative to all-pairs, and the recall of
  * the pruned mining against the brute result (matched (x, best-y)
  * pairs preserved). Re-runnable; numbers recorded in SCALE.md.
  * Args: [sfDir] [nlist].
  */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlist = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val xs = e.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("xid"), col("embedding").as("vec"))
    val ys = e.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("yid"), col("embedding").as("vec"))
    val nx = xs.count(); val ny = ys.count()
    val allPairs = nx * ny
    val brute = Similarity.marginMining(xs, ys, k = 4, minMargin = 1.02)
      .select("xid", "yid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val cents = Similarity.trainCentroids(
      ys.select(col("yid").as("id"), col("vec")), nlist)
    val celled = ys.withColumn("cell", Similarity.cellOf(col("vec"), cents))
    println(s"# xs=$nx ys=$ny allPairs=$allPairs nlist=$nlist " +
      s"bruteMatches=${brute.size}")
    println("# redundancy nprobe candidates frac matchedPairs recallVsBrute")
    Seq(1, 2).foreach { red =>
      val stored =
        if (red <= 1) celled
        else ys.withColumn("cell", explode(
          Similarity.probeCells(col("vec"), cents, red)))
      Seq(1, 2, 4, nlist).distinct.foreach { np =>
        val cand = stored.join(
          xs.select(col("xid"), explode(
            Similarity.probeCells(col("vec"), cents, np)).as("cell")),
          "cell").select("xid", "yid").distinct().count()
        val mined = Similarity.marginMiningIvf(xs, ys, k = 4,
          minMargin = 1.02, nlist = nlist, nprobe = np, redundancy = red)
          .select("xid", "yid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val hit = mined.intersect(brute).size
        println(f"$red%11d $np%6d $cand%10d ${cand.toDouble / allPairs}%5.3f " +
          f"${mined.size}%12d ${hit.toDouble / brute.size}%7.3f")
      }
    }
    spark.stop()
  }
}
