package graft.tools
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object W2vProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val np = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val k = pmod(col("doc_id"), lit(8))
    val pair = concat(lit(" qqa"), k, lit(" qqb"), k)
    val spiked = d.select(col("doc_id"), concat(col("text"), pair, pair).as("text"))
    val toks = spiked.select(col("doc_id"), TextFunctions.words(col("text")).as("toks"))
    (1 to reps).foreach { r =>
      val model = graft.operators.TextEmbeddings.trainWord2Vec(toks, "toks", numPartitions = np)
      val vecs = graft.operators.TextEmbeddings.vectors(model)
        .filter(col("word").startsWith("qqa") || col("word").startsWith("qqb"))
      val a = vecs.filter(col("word").startsWith("qqa"))
        .select(substring(col("word"), 4, 2).cast("int").as("ka"), col("vector").as("va"))
      val b = vecs.filter(col("word").startsWith("qqb"))
        .select(substring(col("word"), 4, 2).cast("int").as("kb"), col("vector").as("vb"))
      val cos = graft.functions.expressions.VectorKernels.cosine_sim(
        col("va").cast("array<float>"), col("vb").cast("array<float>"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ka")).orderBy(col("c").desc, col("kb"))
      val best = a.crossJoin(b).select(col("ka"), col("kb"), cos.as("c"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val nCorrect = best.filter(col("ka") === col("kb")).count()
      println(s"W2VPROBE rep=$r np=$np correct=$nCorrect/8")
    }
    spark.stop()
  }
}
