package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the bounded-collect driver guards (the r15 verdict's
  * ask): build a ~10× corpus from the provided sf parquet (10 copies of
  * `documents` with remapped doc ids — the only testdata-derived scale
  * path available offline) and prove, at that scale, that
  *
  *   1. `Dedup.connectedComponents`' `driverMaxPairs` guard TRIPS
  *      naturally (10 identical copies of every doc make the LSH pair
  *      list ~45× the doc count) and the distributed min-label
  *      propagation fallback returns EXACTLY the same components as the
  *      driver union-find forced over the same pair list;
  *   2. `Tokenizer.trainBpe`'s `driverMaxWords` guard trips when forced
  *      under the 10× histogram and the distributed merge loop is
  *      bit-identical to the driver loop at this scale;
  *   3. `Sampling.unimaxAllocation`'s `maxDomains` guard REJECTS a
  *      per-row key loudly (no silent truncation) and passes on a
  *      domain-shaped input;
  *   4. `Stats.kaplanMeier`'s `maxTimes` stays far above the
  *      calendar-bounded distinct-lifetime count at 10×.
  *
  * Prints one JSON line per check; exits non-zero if any check fails.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.ScaleProbe". */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = false
    def report(name: String, ok: Boolean, detail: String): Unit = {
      if (!ok) failed = true
      println(s"""{"check":"$name","ok":$ok,"detail":"$detail"}""")
    }

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val nDocs = docs0.count()
    // 10 copies, ids remapped into disjoint ranges
    val copies = 10
    val big = (0 until copies).map { i =>
      docs0.select((col("doc_id") + lit(i.toLong * 100000000L))
        .as("doc_id"), col("text"))
    }.reduce(_ unionByName _).persist()
    val nBig = big.count()
    report("corpus_10x", nBig == copies * nDocs,
      s"docs=$nDocs big=$nBig")

    // --- 1. connectedComponents: guard trips naturally; paths agree --
    // the sf0.1 corpus is 5k docs, so 10 copies yield ~250k LSH pairs
    // (pair mass grows with copies², each copy-group contributing
    // C(c,2) identical-doc pairs) — 25 copies push past the 1M default
    // guard, proving the cutover fires UNFORCED at a plausible sf1.0+
    // shape, with the driver union-find forced over the SAME pair list
    // as the exactness reference
    locally {
      val ccCopies = 25
      val ccBig = (0 until ccCopies).map { i =>
        docs0.select((col("doc_id") + lit(i.toLong * 100000000L))
          .as("doc_id"), col("text"))
      }.reduce(_ unionByName _)
      val pairs = graft.operators.Dedup.minhashLshPairs(
        ccBig, "doc_id", "text", n = 3, threshold = 0.5,
        numHashes = 128, rowsPerBand = 2).persist()
      val nPairs = pairs.count()
      val guardTrips = nPairs > 1000000L
      val dist = graft.operators.Dedup.connectedComponents(pairs)
        .persist()
      val nDist = dist.count()
      val drv = graft.operators.Dedup.connectedComponents(
        pairs, driverMaxPairs = (nPairs + 1).toInt).persist()
      val diff = dist.unionByName(drv).groupBy(col("id"), col("component"))
        .agg(count(lit(1)).as("n")).filter(col("n") =!= 2).count()
      report("cc_driver_guard",
        guardTrips && diff == 0L && nDist > 0L,
        s"copies=$ccCopies pairs=$nPairs guard_trips=$guardTrips " +
          s"components_rows=$nDist mismatches=$diff")
      pairs.unpersist(); dist.unpersist(); drv.unpersist()
    }

    // --- 2. trainBpe: forced trip; distributed == driver at 10x ------
    locally {
      val hist = graft.operators.Tokenizer.wordHistogram(big, "text")
      val nWords = hist.count()
      val merges = 12
      val local = graft.operators.Tokenizer.trainBpe(
        big, "text", merges, driverMaxWords = (nWords + 1).toInt)
      val distd = graft.operators.Tokenizer.trainBpe(
        big, "text", merges, driverMaxWords = 1)
      report("bpe_driver_guard", local == distd,
        s"vocab=$nWords merges_local=${local.size} " +
          s"merges_dist=${distd.size} identical=${local == distd}")
    }

    // --- 3. unimax maxDomains: loud reject on per-row keys -----------
    locally {
      val perRow = big.select(col("doc_id").cast("string").as("domain"),
        length(col("text")).cast("long").as("avail"))
      val rejected =
        try {
          graft.operators.Sampling.unimaxAllocation(
            perRow, "domain", "avail", budgetTokens = 1000000L,
            maxEpochsMilli = 1000L, maxDomains = 1000).count()
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("domains") }
      val domains = big
        .groupBy(pmod(col("doc_id"), lit(32)).cast("string").as("domain"))
        .agg(sum(length(col("text"))).cast("long").as("avail"))
      val ok = graft.operators.Sampling.unimaxAllocation(
        domains, "domain", "avail", budgetTokens = 1000000L,
        maxEpochsMilli = 1000L).count()
      report("unimax_domain_guard", rejected && ok == 32L,
        s"per_row_rejected=$rejected domain_rows=$ok")
    }

    // --- 4. kaplanMeier maxTimes: calendar-bounded at 10x ------------
    locally {
      val events = spark.read.parquet(s"$sfDir/events.parquet")
      val big10 = (0 until copies).map { i =>
        events.select(concat(col("user_id"), lit(s"_c$i"))
          .as("id"), col("ts"))
      }.reduce(_ unionByName _)
      val km = graft.operators.Stats.kaplanMeier(
        big10, "id", "ts", censorDays = 14)
      val rows = km.count()
      report("km_times_guard", rows > 0 && rows <= 100000,
        s"distinct_lifetimes=$rows guard=100000")
    }

    big.unpersist()
    spark.stop()
    if (failed) sys.exit(1)
  }
}
