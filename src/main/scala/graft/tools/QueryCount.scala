package graft.tools

/** Prints the query/oracle registry sizes and the estimated bench JSON
  * line length — used to keep Bench's stdout line inside the driver's
  * 2000-char tail capture. */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"NQUERIES=${q.size} NORACLES=${o.size}")
    println("NOORACLE=" + (q.keySet -- o.keySet).toSeq.sorted.mkString(","))
    println("JSONLEN2DP=" +
      (q.keys.toSeq.sorted.map(n => "\"" + n + "\":12.34")
        .mkString(",").length + 90))
    println("NAMES=" + q.keys.toSeq.sorted.mkString(" "))
  }
}
