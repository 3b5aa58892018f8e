package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines (beyond the reference, SURVEY training-data extensions).
  *
  * A corpus mix ("90% of source A, 25% of source B…") must be
  * reproducible across runs, partitionings and engines — `df.sample`'s
  * RNG is none of those. Sampling here keys on a per-row md5-derived
  * bucket in [0, 10000): a pure column function of the row id, so the
  * same row is kept or dropped everywhere, the plan is one narrow
  * codegen'd filter pushed at the scan, and a DuckDB oracle can replay
  * the exact decision. Rates are basis points (int) to keep the
  * comparison FP-free.
  */
object Sampling {

  // deferred cache release (same pattern as Dedup.lastSimhashCache):
  // the frame returned by dsirWeights is lazy and still reads the
  // persisted bigram stream, so the cache can only be dropped on the
  // NEXT call — bounding a repeated caller to one live cache. (The
  // DSIR frames are DETERMINISTIC — dropping one merely recomputes —
  // unlike the range-layout frames below, which use localCheckpoint.)
  private var lastDsirCache: Option[DataFrame] = None
  private var lastDsirRawCache: Option[DataFrame] = None

  /** Pin a range-partitioned frame's layout: RangePartitioner SAMPLES
    * its boundaries per execution, so two executions of the same plan
    * can place a boundary row in different partitions — and every
    * two-phase prefix-sum operator here collects per-partition totals
    * and joins them back, so the output pass MUST see the exact layout
    * the totals were collected from. An eager localCheckpoint
    * materializes the frame once and TRUNCATES lineage, making a
    * recompute under a fresh sampled layout impossible (a persist-based
    * pin silently recomputes if blocks are evicted or unpersisted —
    * the old single-slot cache made sequential-call ordering
    * load-bearing and was a silent-wrong-ranks hazard for any caller
    * holding two lazy result frames; round-12 ADVICE). Blocks live at
    * MEMORY_AND_DISK and are released when the frame is GC'd. The
    * availability trade is documented Spark: on executor loss the job
    * FAILS instead of silently recomputing — the correct failure mode
    * for a layout-dependent rank. */
  private def pinLayout(df: DataFrame): DataFrame = {
    // test introspection only: checkpointing truncates lineage, so the
    // range exchange the scale story depends on is invisible in the
    // returned frame's plan — PlanShapeSpec audits the plan that was
    // actually materialized through this stash (no correctness bearing)
    lastPinnedPlan = df.queryExecution.executedPlan.toString()
    df.localCheckpoint(true)
  }

  /** The physical plan most recently materialized by [[pinLayout]];
    * see the note there. */
  @volatile private[graft] var lastPinnedPlan: String = ""

  /** Stable per-row bucket in [0, 10000): first 8 hex chars of
    * md5(id-as-string), mod 10⁴. */
  def bucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
      % 10000).cast("int")

  /** Keep ~`rateBp`/10000 of rows, deterministically by id. */
  def sampleBp(df: DataFrame, idCol: String, rateBp: Int): DataFrame =
    df.filter(bucket(col(idCol)) < rateBp)

  /** Stratified mix: per-stratum keep rates (basis points), unknown
    * strata at `defaultRateBp`. One filter, no shuffle; the strata stay
    * unbiased within themselves because the bucket keys on id, not on
    * the stratum. */
  def stratifiedMix(df: DataFrame, idCol: String, strataCol: String,
                    ratesBp: Map[String, Int],
                    defaultRateBp: Int = 0): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultRateBp)) {
      case (acc, (stratum, bp)) =>
        when(col(strataCol) === stratum, lit(bp)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }

  /** Temperature-scaled source mixing (the multilingual/multi-source
    * sampling rule: mix shares ∝ n_s^T, T in (0, 1] — T=1 keeps the
    * corpus proportions, T→0 approaches uniform across sources).
    * Keep-rate per source is r_s ∝ n_s^(T-1), normalized so the
    * SMALLEST source keeps `maxRateBp` (downsample-only — the standard
    * regime; upsampling is epoch repetition, not a filter). Feed the
    * result to [[stratifiedMix]]. One tiny aggregation (a row per
    * source) reaches the driver; corpus rows are never shuffled. */
  def temperatureRates(df: DataFrame, strataCol: String,
                       temperature: Double,
                       maxRateBp: Int = 10000): Map[String, Int] = {
    require(temperature > 0 && temperature <= 1, "temperature in (0,1]")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) Map.empty
    else {
      val minN = counts.values.min.toDouble
      counts.map { case (s, n) =>
        val rate = math.pow(n / minN, temperature - 1) // <= 1
        s -> math.max(1, math.round(rate * maxRateBp).toInt)
      }
    }
  }

  /** Per-key cap (crawl-style domain caps, per-user caps): keep at most
    * `maxPerKey` rows per key, chosen by the deterministic seeded
    * shuffle order ([[shuffleKey]]) so the survivors are an unbiased,
    * reproducible sample — NOT the first rows by storage order. The
    * `row_number <= N` filter compiles to Spark's `WindowGroupLimit`,
    * which keeps only N rows per key on the MAP side before the
    * shuffle — a hot key ships N rows, not its full mass. */
  def perKeyCap(df: DataFrame, keyCol: String, idCol: String,
                maxPerKey: Int, seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerKey > 0, "maxPerKey must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(shuffleKey(col(idCol), seed), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerKey).drop("_rk")
  }

  /** Upsampling by epoch repetition — the other half of temperature
    * mixing (downsampling is a filter, [[stratifiedMix]]; a source whose
    * target share EXCEEDS its natural share repeats). Each row emits
    * `floor(w)` copies plus one more for the fractional part, decided by
    * the same deterministic md5 bucket as the filters — so an epoch
    * weight of 2.3 repeats every row twice and 30% of rows (by id hash)
    * a third time, and the realized mix is exact in expectation and
    * reproducible run-to-run. Copies carry `epoch` (0-based) so a
    * downstream shuffle ([[deterministicShuffle]] keyed on (id, epoch))
    * spreads repeats across the corpus instead of adjacent rows.
    *
    * Scale shape: one `explode(sequence(...))` projection — no shuffle,
    * no driver data; the output is `~w×` the input and every copy is
    * derived, not stored. Weights in [1, 100] (an epoch weight above a
    * few is already a curation smell). */
  def epochRepeat(df: DataFrame, idCol: String, strataCol: String,
                  weights: Map[String, Double],
                  defaultWeight: Double = 1.0): DataFrame = {
    require((defaultWeight +: weights.values.toSeq)
      .forall(w => w >= 1.0 && w <= 100.0), "weights in [1, 100]")
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (stratum, wt)) =>
        when(col(strataCol) === stratum, lit(wt)).otherwise(acc)
    }
    val base = floor(w).cast("int")
    val fracBp = ((w - floor(w)) * 10000).cast("int")
    val extra = (bucket(col(idCol)) < fracBp).cast("int")
    df.withColumn("epoch",
      explode(sequence(lit(0), base + extra - 1)))
  }

  /** Seeded per-row shuffle key: md5 of `"<seed>:<id>"` — a pure column
    * function, so the induced order is identical across runs, engines
    * and partitionings (unlike `orderBy(rand())`). */
  def shuffleKey(id: Column, seed: String): Column =
    md5(concat(lit(seed + ":"), id.cast("string")))

  /** Deterministic global shuffle + sharding — the "shuffle the corpus
    * before training" step, reproducible from (seed, id) alone. Each row
    * gets a shard in [0, numShards) and a dense position within its
    * shard; readers stream shard files in position order and observe the
    * same pseudo-random order every epoch/run.
    *
    * Physically this is ONE hash shuffle on `shard` plus a per-shard
    * sort — at scale, `repartition(numShards, shard)` +
    * `sortWithinPartitions(key)` writes the shards directly and the
    * window below degenerates to a streaming row_number with no extra
    * exchange. Size `numShards` to the target file count (corpus bytes /
    * desired shard bytes), not to the CPU count. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
                           numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, "numShards must be positive")
    val key = shuffleKey(col(idCol), seed)
    val shard = (conv(substring(key, 1, 8), 16, 10).cast("long")
      % numShards).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_key"), col(idCol))
    df.withColumn("_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_key")
  }

  /** Sequence packing — the training-prep step that concatenates the
    * tokenized corpus in a fixed deterministic order (`idCol` ascending)
    * and splits it into training sequences of `seqLen` tokens. Emits per
    * doc its global token offset and the first/last sequence it lands
    * in (a doc crossing a boundary spans several sequences — the
    * GPT-style concat-and-split regime).
    *
    * The global running sum is a distributed two-phase prefix sum, NOT
    * a single-partition window: range-repartition on id (order-
    * preserving splits), per-partition window cumsum (parallel —
    * partitionBy the physical partition id), plus per-partition totals
    * cumulated driver-side (one row per partition) and joined back as a
    * broadcast offset. At 100 TB the only data-sized costs are the
    * range shuffle and one narrow window pass; the driver sees
    * #partitions rows. */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, "seqLen must be positive")
    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = docs
      .select(col(idCol).as("id"), col(tokensCol).cast("long").as("n_tokens"))
      .repartitionByRange(n, col("id"))
      .withColumn("_part", spark_partition_id())
    // MUST pin: the totals collect and the output pass both consume
    // this frame under ONE sampled range layout (caught by the sf0.1
    // gate; invisible at sf0.01 where the sample is exhaustive) — see
    // [[pinLayout]]. The checkpoint is 4 longs/row.
    val w = Window.partitionBy(col("_part")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = pinLayout(
      ranged.withColumn("_cum_in_part", sum(col("n_tokens")).over(w)))
    // one row per partition reaches the driver; offsets are exact longs
    val totals = local.groupBy(col("_part"))
      .agg(max(col("_cum_in_part")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (p, t)) =>
      (p, acc + t)
    }.init.map { case (_, off) => off }
    val offsetByPart = totals.map(_._1).zip(offsets).toMap
    val offCol = offsetByPart.foldLeft(lit(0L)) { case (acc, (p, off)) =>
      when(col("_part") === p, lit(off)).otherwise(acc)
    }
    local
      .withColumn("cum_before", col("_cum_in_part") - col("n_tokens") + offCol)
      // integral DIV, not `/` (which widens to double and loses exactness
      // on corpus-scale token offsets)
      .withColumn("seq_first", expr(s"cum_before div $seqLen"))
      .withColumn("seq_last",
        expr(s"(cum_before + greatest(n_tokens, 1L) - 1) div $seqLen"))
      .select(col("id"), col("n_tokens"), col("cum_before"),
        col("seq_first"), col("seq_last"))
  }

  /** Segment-boundary table over [[packSequences]]' output — what a
    * block-diagonal attention mask consumes: packed training sequences
    * concatenate unrelated documents, so the trainer needs, per
    * document, WHERE inside its first sequence the document begins and
    * (token-)ends, and whether it continues into the next sequence.
    * One row per packed document: (id, seq_id = the sequence the doc
    * STARTS in, start_off / end_off = token offsets within that
    * sequence, end clamped to the sequence length, continues = spans
    * past it). Grouping by seq_id yields each sequence's boundary
    * list; offset 0 absent means the sequence opens mid-document.
    *
    * Scale shape: a pure projection over the packed frame — offsets
    * are arithmetic on cum_before, so no exchange is added to
    * packSequences' single range pass. */
  def packBoundaries(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    packed.select(
      col("id"),
      col("seq_first").as("seq_id"),
      (col("cum_before") - col("seq_first") * seqLen).as("start_off"),
      least(lit(seqLen.toLong),
        col("cum_before") - col("seq_first") * seqLen + col("n_tokens"))
        .as("end_off"),
      (col("seq_last") > col("seq_first")).as("continues"))
  }

  /** Packing-efficiency audit over [[packSequences]]' output — the
    * one-row report a training-prep run checks before committing a
    * packed dataset: sequence count, token utilization (the GPT-style
    * concat-and-split regime wastes only the final sequence's tail, so
    * utilization should sit near 10000 bp), how many documents were
    * split across a sequence boundary, and the total number of
    * boundary crossings (each crossing is a document fragment whose
    * attention the trainer must mask or accept). All exact integer
    * arithmetic — the audit replays engine-for-engine.
    *
    * Scale shape: one partial-aggregating scan of the packed frame to
    * a single row; no shuffle beyond the final 1-row combine. */
  def packingStats(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    packed.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
        coalesce(sum(when(col("seq_last") > col("seq_first"), 1L)
          .otherwise(0L)), lit(0L)).as("docs_split"),
        coalesce(sum(col("seq_last") - col("seq_first")), lit(0L))
          .as("boundary_crossings"),
        max(col("seq_last")).as("_max_last"))
      // n_seqs from the packed frame's ACTUAL indices (max seq_last
      // + 1), not ceil(total_tokens/seqLen): packSequences places a
      // zero-token doc via greatest(n_tokens, 1), so one landing
      // exactly on a seqLen boundary occupies a sequence the ceil form
      // doesn't count — the report must agree with the frame it audits
      .withColumn("n_seqs", coalesce(col("_max_last") + 1L, lit(0L)))
      .withColumn("utilization_bp",
        expr(s"total_tokens * 10000L div greatest(n_seqs * ${seqLen}L, 1L)"))
      .select(col("n_docs"), col("total_tokens"), col("n_seqs"),
        col("utilization_bp"), col("docs_split"),
        col("boundary_crossings"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023), the linearized
    * multiplicative-weights form: domains whose mean loss EXCEEDS the
    * corpus mean are upweighted — the next mixture round feeds the
    * hardest domains more. The full algorithm interleaves proxy-model
    * training with exponentiated-gradient updates; this operator is the
    * data-side step given any per-doc loss proxy (`lossCol`, an
    * integer in caller-chosen fixed-point units — perplexity micros,
    * mean-word-length micros, a reward-model score):
    *
    *  1. per-domain mean loss `m_d = floor(Σloss / n)` and the global
    *     mean `B` (floor) — exact integer division;
    *  2. clipped excess `e_d = max(m_d − B, 0)`, normalized to basis
    *     points of the worst domain's excess;
    *  3. `iters` multiplicative-weight rounds from the uniform start
    *     `w0 = 10000/D`: `w ← w·(10000 + η·e_bp/10⁴)`, renormalized
    *     by `floor(w·10⁴/Σw)` — the first-order Taylor form of the
    *     exponentiated-gradient step, chosen over `exp()` so every
    *     round is INTEGER arithmetic and replays engine-exact.
    *
    * Output: one row per domain with (n_docs, mean_loss, excess_bp,
    * w0..w{iters}) — the mixture table the next sampling round feeds
    * to [[stratifiedMix]] as per-domain rates.
    *
    * Scale shape: the corpus pays ONE partial-aggregating scan to D
    * rows (D = #domains, dozens in the DoReMi setting); every window
    * after that runs on the D-row frame, so the deliberate
    * whole-frame window is bytes, not data. Overflow-safe by
    * construction: weights stay ≤ 10⁴, multipliers ≤ 2·10⁴, so the
    * largest intermediate is ≤ 1.2·10¹² — far inside long range. */
  def domainReweight(df: DataFrame, domainCol: String, lossCol: String,
                     iters: Int = 3, etaBp: Int = 2000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1 && iters <= 8, "iters must be in [1, 8]")
    require(etaBp >= 0 && etaBp <= 10000, "etaBp must be in [0, 10000]")
    val all = Window.partitionBy()
    val base = df
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(lossCol).cast("long")).as("_sum_loss"))
      .withColumn("mean_loss", expr("_sum_loss div n_docs"))
      .withColumn("_gsum", sum(col("_sum_loss")).over(all))
      .withColumn("_gn", sum(col("n_docs")).over(all))
      .withColumn("_gmean", expr("_gsum div _gn"))
      .withColumn("excess",
        greatest(col("mean_loss") - col("_gmean"), lit(0L)))
      .withColumn("_maxe", max(col("excess")).over(all))
      .withColumn("excess_bp", when(col("_maxe") > 0,
        expr("excess * 10000L div _maxe")).otherwise(lit(0L)))
      .withColumn("_ndom", count(lit(1)).over(all))
      .withColumn("w0", expr("10000L div _ndom"))
    val iterated = (1 to iters).foldLeft(base) { case (acc, t) =>
      val raw = s"_raw$t"
      acc
        .withColumn(raw,
          expr(s"w${t - 1} * (10000L + ${etaBp}L * excess_bp div 10000L)"))
        // greatest(Σ,1): unreachable today (multipliers ≥ 10⁴, w0 ≥ 1
        // for D ≤ 10⁴) but the renorm must never be a div-by-zero away
        // from a pathological D. Integer `div`, never `/` — the renorm
        // must floor exactly like the oracle's `//`.
        .withColumn(s"_rsum$t", greatest(sum(col(raw)).over(all), lit(1L)))
        .withColumn(s"w$t", expr(s"$raw * 10000L div _rsum$t"))
    }
    iterated.select(
      col("domain") +: col("n_docs") +: col("mean_loss") +:
        col("excess_bp") +: (0 to iters).map(t => col(s"w$t")): _*)
  }

  /** Curriculum ordering — emit the easy-to-hard training order a
    * curriculum-learning run reads: documents are ranked globally by
    * (`scoreCol` asc, id asc), the rank is cut into `stages` equal
    * slices (stage s covers ranks with `(rank-1)*stages div total = s`
    * — floor-split, replayable in SQL without NTILE's remainder
    * convention), and WITHIN each stage the order is the seeded
    * [[shuffleKey]] shuffle, sharded like [[deterministicShuffle]] so
    * no window ever partitions on the (few, huge) stages themselves.
    * Readers consume stages in order, shards within a stage in any
    * interleave, positions within a shard in order.
    *
    * The global rank is the shared two-phase pass ([[stratumRank]]
    * with one constant stratum) — never a single-partition global
    * window; its layout is checkpoint-pinned, so the returned frame is
    * safe to hold lazily across further Sampling calls. */
  def curriculumOrder(docs: DataFrame, idCol: String, scoreCol: String,
                      stages: Int, seed: String = "curriculum",
                      numShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages > 0, "stages must be positive")
    require(numShards > 0, "numShards must be positive")
    val key = shuffleKey(col("id"), seed)
    val shard = (conv(substring(key, 1, 8), 16, 10).cast("long")
      % numShards).cast("int")
    val wPos = Window.partitionBy(col("stage"), col("shard"))
      .orderBy(col("_key"), col("id"))
    // global rank = the shared per-stratum rank with ONE constant
    // stratum (a leading constant range key changes nothing)
    stratumRank(docs, idCol, scoreCol, lit(""))
      .withColumn("stage",
        expr(s"(rank - 1L) * ${stages}L div greatest(_total, 1L)")
          .cast("int"))
      .withColumn("_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(wPos).cast("long"))
      .select(col("id").as(idCol), col("score"), col("stage"),
        col("shard"), col("pos"))
  }

  /** Token-budget sampling — "take this many TOKENS from each source",
    * the primitive behind assembling a fixed-size training mix ("100 B
    * tokens of web, 20 B of code"). Greedy fill in the deterministic
    * [[shuffleKey]] order: a doc is kept iff the tokens of the docs
    * BEFORE it (same stratum, key order) have not yet filled the
    * stratum's budget — so each budget overshoots by at most one doc and
    * the selection is reproducible from (seed, id) alone.
    *
    * The within-stratum running sum is the [[packSequences]] two-phase
    * prefix sum with the stratum prepended to the range key:
    * range-repartition on (stratum, key) keeps each stratum's rows in
    * key order across partitions, the per-partition window cumsum runs
    * partitionBy (physical partition, stratum) — parallel, never one
    * reducer per stratum (strata are sources: few and huge, exactly the
    * shape a stratum-keyed global window would hot-key) — and the
    * driver folds #partitions × #strata totals rows into per-
    * (partition, stratum) offsets joined back as a broadcast. */
  def tokenBudget(docs: DataFrame, idCol: String, tokensCol: String,
                  stratumCol: String, budgets: Map[String, Long],
                  seed: String = "tb",
                  defaultBudget: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = docs
      .select(col(idCol).as("id"), col(stratumCol).as("stratum"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("_key", shuffleKey(col("id"), seed))
      .repartitionByRange(n, col("stratum"), col("_key"), col("id"))
      .withColumn("_part", spark_partition_id())
    val w = Window.partitionBy(col("_part"), col("stratum"))
      .orderBy(col("_key"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pin for the same reason as packSequences: the totals collect and
    // the output pass must see ONE sampled range layout ([[pinLayout]])
    val local = pinLayout(
      ranged.withColumn("_cum", sum(col("n_tokens")).over(w)))
    val totals = local.groupBy(col("_part"), col("stratum"))
      .agg(max(col("_cum")).as("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (st, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1)
        .zip(sorted.scanLeft(0L)((acc, r) => acc + r._3).init)
        .map { case (p, off) => (p, st, off) }
    }
    val offDf = offsets.toDF("_part", "stratum", "_off")
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (st, b)) => when(col("stratum") === st, lit(b)).otherwise(acc)
    }
    local.join(broadcast(offDf), Seq("_part", "stratum"))
      .withColumn("cum_before", col("_cum") - col("n_tokens") + col("_off"))
      .filter(col("cum_before") < budgetCol)
      .select(col("id"), col("stratum"), col("n_tokens"), col("cum_before"))
  }


  /** Per-stratum rank bucketing — the CCNet head/middle/tail partition:
    * within each stratum (language, source), rank rows by score and cut
    * the rank into `buckets` equal slices (bucket 0 = lowest scores; for
    * CCNet feed perplexity, so 0 = head). The floor-split
    * `(rank-1)*buckets div total` replays in SQL without NTILE's
    * remainder convention, same rule as [[curriculumOrder]].
    *
    * The per-stratum global rank must never become one reducer per
    * stratum (strata are languages: few and huge) — it is the shared
    * [[stratumRank]] two-phase pass; the emitted `stratum` column is
    * the key's string form (any input type works, NULL strata rank as
    * their own group). */
  def stratifiedRankBuckets(df: DataFrame, idCol: String, scoreCol: String,
                            stratumCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    stratumRank(df, idCol, scoreCol, col(stratumCol))
      .withColumn("bucket",
        // same greatest() guard as curriculumOrder: _total >= 1 for
        // every emitted row today, but the two floor-splits must not
        // drift apart on a div-by-zero hazard
        expr(s"(rank - 1L) * ${buckets}L div greatest(_total, 1L)")
          .cast("int"))
      .select(col("id").as(idCol), col("stratum"), col("score"),
        col("rank"), col("bucket"))
  }

  /** Epoch schedule — the step that turns [[domainReweight]]'s mixture
    * table into something a sampler can execute: given per-domain
    * weights (bp) and the tokens AVAILABLE per domain, allocate the
    * epoch's token budget and derive, per domain, either a downsample
    * rate (`rate_bp`, for [[stratifiedMix]]) or an upsample repeat
    * factor in milli-epochs (`repeat_milli`, for [[epochRepeat]]) —
    * whichever side of its availability the allocation lands on. All
    * integer arithmetic, engine-exact.
    *
    * Scale shape: a projection over the joined D-row weights/avail
    * frames — corpus-sized work happened upstream (the weight fit and
    * the token count); this is the bytes-sized plan step.
    *
    * Domain-set mismatches are LOUD, not silent: the join is full
    * outer, so a domain present in only one input survives as a row
    * with `matched = false` and null schedule columns (its share of
    * tokensPerEpoch is visibly unallocated) instead of vanishing — the
    * same missing-key-must-be-loud stance as [[Dedup.splitAudit]]. */
  def epochSchedule(weights: DataFrame, avail: DataFrame,
                    domainCol: String, weightCol: String,
                    availCol: String, tokensPerEpoch: Long): DataFrame = {
    require(tokensPerEpoch > 0, "tokensPerEpoch must be positive")
    weights.select(col(domainCol).as("domain"),
        col(weightCol).cast("long").as("w_bp"))
      .join(avail.select(col(domainCol).as("domain"),
        col(availCol).cast("long").as("avail_tokens")),
        Seq("domain"), "full_outer")
      .withColumn("matched",
        col("w_bp").isNotNull && col("avail_tokens").isNotNull)
      // every schedule column is null-guarded on `matched`: Spark's
      // least/greatest SKIP nulls, so an unguarded least(null, 10000)
      // would fabricate a rate for a domain with no weight fit
      .withColumn("alloc_tokens",
        when(col("matched"), expr(s"${tokensPerEpoch}L * w_bp div 10000L")))
      .withColumn("rate_bp",
        when(col("matched"), least(
          expr("alloc_tokens * 10000L div greatest(avail_tokens, 1L)"),
          lit(10000L))))
      .withColumn("repeat_milli",
        when(col("matched"), greatest(
          expr("alloc_tokens * 1000L div greatest(avail_tokens, 1L)"),
          lit(1000L))))
      .select(col("domain"), col("w_bp"), col("avail_tokens"),
        col("alloc_tokens"), col("rate_bp"), col("repeat_milli"),
        when(col("matched"),
          col("alloc_tokens") > col("avail_tokens")).as("upsampled"),
        col("matched"))
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute an epoch's token budget across domains
    * so every domain receives an EQUAL share except where its epoch
    * cap (available tokens × maxEpochs) binds — low-resource languages
    * are never oversampled past the cap, and the budget a capped
    * domain can't absorb redistributes to the rest. The greedy form is
    * exact and order-canonical: visit domains in ascending cap order
    * (domain name as tiebreak); each takes
    * `min(cap, remaining div domainsLeft)` — all integer division, so
    * a DuckDB WITH RECURSIVE replays the recursion bit-for-bit.
    *
    * Complements [[domainReweight]]/[[epochSchedule]]: DoReMi fits
    * weights from losses; UniMax needs only availability and a fairness
    * policy.
    *
    * Scale shape: corpus-sized work happened upstream (the per-domain
    * availability counts); this collects the D-row availability table
    * (D = number of domains/languages — dozens, `maxDomains`-bounded
    * BEFORE the collect, the [[EvalMetrics.bradleyTerry]] precedent)
    * and runs the D-step greedy on the driver. Output per domain:
    * availability, the cap, the allocation, milli-epochs of its corpus
    * consumed, and whether the cap bound. */
  def unimaxAllocation(avail: DataFrame, domainCol: String,
                       availCol: String, budgetTokens: Long,
                       maxEpochsMilli: Long,
                       maxDomains: Int = 100000): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochsMilli > 0, "maxEpochsMilli must be positive")
    val spark = avail.sparkSession
    import spark.implicits._
    val rows = avail.select(col(domainCol).cast("string").as("d"),
        col(availCol).cast("long").as("a"))
      .limit(maxDomains + 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(rows.length <= maxDomains,
      s"more than $maxDomains domains — domains must be languages/" +
        "sources, not a per-row key")
    val ordered = rows
      .map { case (d, a) => (d, a, a * maxEpochsMilli / 1000L) }
      .sortBy { case (d, _, cap) => (cap, d) }
    var remaining = budgetTokens
    var leftCount = ordered.length
    val out = ordered.map { case (d, a, cap) =>
      val share = remaining / leftCount
      val alloc = math.min(cap, share)
      remaining -= alloc
      leftCount -= 1
      (d, a, cap, alloc,
        if (a > 0) alloc * 1000L / a else 0L,
        cap <= share)
    }
    out.toSeq.toDF("domain", "avail_tokens", "cap_tokens",
      "alloc_tokens", "epochs_milli", "cap_bound")
  }

  /** Quality-vs-quantity attrition curve — what a threshold sweep reads
    * before cutting a corpus: for each candidate threshold, how many
    * documents and tokens survive `score >= t`, and the surviving token
    * share in bp. ONE corpus scan: every threshold is a conditional
    * pair inside a single aggregation (never |T| passes, never an
    * explode of the corpus), then the 1-row aggregate unpivots to one
    * row per threshold. */
  def thresholdCurve(docs: DataFrame, scoreCol: String, tokensCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val aggs =
      coalesce(sum(col(tokensCol).cast("long")), lit(0L)).as("_tot") +:
        thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
          coalesce(sum(when(col(scoreCol) >= t, 1L).otherwise(0L)), lit(0L))
            .as(s"_n$i"),
          coalesce(sum(when(col(scoreCol) >= t,
            col(tokensCol).cast("long")).otherwise(0L)), lit(0L))
            .as(s"_t$i"))
        }
    val stacked = thresholds.indices
      .map(i => s"${thresholds(i)}L, _n$i, _t$i").mkString(", ")
    docs.agg(aggs.head, aggs.tail: _*)
      .select(col("_tot"), expr(
        s"stack(${thresholds.size}, $stacked) AS (threshold, n_kept, tokens_kept)"))
      .select(col("threshold"), col("n_kept"), col("tokens_kept"),
        expr("tokens_kept * 10000L div greatest(_tot, 1L)")
          .as("token_share_bp"))
  }

  /** EXACT per-stratum quantiles without a global sort — the
    * distribution report a curation run reads (sequence-length P50/P90/
    * P99 per language before picking a packing seqLen, score quantiles
    * before cutting thresholds). `approx_percentile` trades exactness
    * for one pass; this keeps exactness by the nearest-rank rule over
    * the shared two-phase range pass: value at rank
    * `(n−1)·q div 10⁴ + 1` per stratum (ties in value are harmless —
    * any holder of the target rank carries the right value).
    *
    * Output: one row per (stratum, q_bp): the value, its rank, and the
    * stratum size. Scale shape: the [[stratumRank]] range shuffle +
    * narrow window; the target-rank filter keeps ≤ |quantiles| rows
    * per stratum BEFORE the explode, so the fan-out never touches the
    * corpus-sized frame. */
  def exactQuantiles(df: DataFrame, idCol: String, valueCol: String,
                     stratumCol: String,
                     quantilesBp: Seq[Int] = Seq(5000, 9000, 9900))
      : DataFrame = {
    require(quantilesBp.nonEmpty &&
      quantilesBp.forall(q => q >= 0 && q <= 10000),
      "quantilesBp must be non-empty, each in [0, 10000]")
    val targets = quantilesBp.map(q =>
      expr(s"(_total - 1L) * ${q}L div 10000L + 1L"))
    stratumRank(df, idCol, valueCol, col(stratumCol))
      // narrow prune first: only rows HOLDING some target rank survive
      // into the |quantiles|-way explode
      .filter(targets.map(col("rank") === _).reduce(_ || _))
      .withColumn("q_bp", explode(array(quantilesBp.map(lit): _*)))
      .filter(col("rank") === expr("(_total - 1L) * q_bp div 10000L + 1L"))
      .select(col("stratum"), col("q_bp"), col("score").as("value"),
        col("rank"), col("_total").as("n"))
  }

  /** The shared two-phase per-stratum rank behind [[curriculumOrder]]
    * and [[stratifiedRankBuckets]]: range-repartition on
    * (stratum, score, id), per-(physical partition, stratum)
    * `row_number`, and #partitions × #strata count rows folded
    * driver-side into per-(partition, stratum) offsets plus
    * per-stratum totals, joined back as broadcasts. Returns
    * (id, stratum, score, rank, _total).
    *
    * The stratum is keyed as its STRING form (any column type works);
    * NULL strata rank as their own group — like SQL's PARTITION BY —
    * via an explicit (key, isnull) join pair, because a using-column
    * equi-join would silently drop null-stratum rows.
    *
    * The ranged frame is layout-pinned via [[pinLayout]] (the counts
    * collect and the output pass must see ONE sampled range layout);
    * returned frames are safe to hold lazily across further calls and
    * across threads — there is no cross-call cache state. */
  private[operators] def stratumRank(df: DataFrame, idCol: String, scoreCol: String,
                          stratum: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .select(col(idCol).as("id"), stratum.cast("string").as("stratum"),
        col(scoreCol).as("score"))
      .withColumn("_skey", coalesce(col("stratum"), lit("")))
      .withColumn("_snull", col("stratum").isNull)
      .repartitionByRange(n, col("_skey"), col("_snull"), col("score"),
        col("id"))
      .withColumn("_part", spark_partition_id())
    val w = Window.partitionBy(col("_part"), col("_skey"), col("_snull"))
      .orderBy(col("score"), col("id"))
    val local = pinLayout(
      ranged.withColumn("_rk", row_number().over(w).cast("long")))
    val counts = local.groupBy(col("_part"), col("_skey"), col("_snull"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), (r.getString(1), r.getBoolean(2)),
        r.getLong(3)))
    val offsets = counts.groupBy(_._2).toSeq.flatMap { case (st, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1)
        .zip(sorted.scanLeft(0L)((acc, r) => acc + r._3).init)
        .map { case (p, off) => (p, st._1, st._2, off) }
    }
    val totals = counts.groupBy(_._2).toSeq
      .map { case (st, rows) => (st._1, st._2, rows.map(_._3).sum) }
    val offDf = offsets.toDF("_part", "_skey", "_snull", "_off")
    val totDf = totals.toDF("_skey", "_snull", "_total")
    local.join(broadcast(offDf), Seq("_part", "_skey", "_snull"))
      .join(broadcast(totDf), Seq("_skey", "_snull"))
      .withColumn("rank", col("_rk") + col("_off"))
      .select(col("id"), col("stratum"), col("score"), col("rank"),
        col("_total"))
  }

  /** Length-bucketed batch assembly — the padding-aware batching step of
    * a training / batch-inference pipeline: each doc lands in the
    * SMALLEST length bucket whose cap covers it (docs over the largest
    * cap are dropped; truncate-vs-reject is an upstream choice), and a
    * batch holds a FIXED doc count per bucket — floor(batchTokens/cap),
    * since every doc pads to the cap — so the token budget per batch
    * holds by construction and per-doc padding waste is cap − tokens.
    * Batch membership is the seeded deterministic shuffle order, so the
    * assignment replays exactly in SQL. The within-bucket global rank
    * is the same two-phase prefix pass as `tokenBudget`, partitioned by
    * (physical partition, bucket) — buckets are few and huge, exactly
    * the shape a bucket-keyed global window would hot-key.
    * Output: (id, bucket_cap, batch_id, n_tokens, padded_tokens). */
  def lengthBucketBatches(docs: DataFrame, idCol: String, tokensCol: String,
                          edges: Seq[Int], batchTokens: Int,
                          seed: String = "lb"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(edges.nonEmpty && batchTokens > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    // smallest covering cap: fold DESCENDING so the smallest check ends
    // up outermost
    val capCol = edges.sorted.reverse
      .foldLeft(lit(null).cast("int")) { (acc, e) =>
        when(col("n_tokens") <= e, lit(e)).otherwise(acc)
      }
    val ranged = docs
      .select(col(idCol).as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("bucket_cap", capCol)
      .filter(col("bucket_cap").isNotNull)
      .withColumn("_key", shuffleKey(col("id"), seed))
      .repartitionByRange(n, col("bucket_cap"), col("_key"), col("id"))
      .withColumn("_part", spark_partition_id())
    val w = Window.partitionBy(col("_part"), col("bucket_cap"))
      .orderBy(col("_key"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pin: the totals collect and the output pass must see ONE sampled
    // range layout ([[pinLayout]])
    val local = pinLayout(ranged.withColumn("_cnt", count(lit(1)).over(w)))
    val totals = local.groupBy(col("_part"), col("bucket_cap"))
      .agg(max(col("_cnt")).as("t"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (cap, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1)
        .zip(sorted.scanLeft(0L)((acc, r) => acc + r._3).init)
        .map { case (p, off) => (p, cap, off) }
    }
    val offDf = offsets.toDF("_part", "bucket_cap", "_off")
    local.join(broadcast(offDf), Seq("_part", "bucket_cap"))
      .withColumn("_rank0", col("_cnt") - 1 + col("_off"))
      .withColumn("batch_id", expr(
        s"_rank0 div greatest(1, $batchTokens div bucket_cap)"))
      .select(col("id"), col("bucket_cap"), col("batch_id"),
        col("n_tokens"),
        (col("bucket_cap") - col("n_tokens")).as("padded_tokens"))
  }

  /** Token-balanced output sharding — the write-side step a webdataset/
    * TFRecord-style export needs: assign every document to one of
    * `numShards` shards so per-shard TOKEN mass is near-equal (greedy
    * bin packing is sequential and engine-hostile; the deterministic
    * snake over the token-descending rank gets within one max-document
    * of the LPT bound and replays exactly). Docs rank by
    * (n_tokens desc, id asc) via the shared two-phase range pass — no
    * global window, no single reducer — and rank r lands in shard
    *
    *   pos = r mod 2S;  shard = pos        (pos < S)
    *                          = 2S − 1 − pos (otherwise)
    *
    * so consecutive heavy documents spread across shards in
    * alternating direction (the boustrophedon that keeps the first
    * shard from hoarding every heavyweight). Output: one row per doc
    * (id, n_tokens, rank, shard). */
  def shardBalance(docs: DataFrame, idCol: String, tokensCol: String,
                   numShards: Int): DataFrame = {
    require(numShards >= 1, "numShards must be positive")
    val prep = docs.select(col(idCol).as("_id"),
      (-col(tokensCol).cast("long")).as("_neg"))
    val s2 = numShards * 2L
    stratumRank(prep, "_id", "_neg", lit("all"))
      .withColumn("_pos", pmod(col("rank") - 1L, lit(s2)))
      .select(col("id"), (-col("score")).as("n_tokens"),
        col("rank"),
        when(col("_pos") < numShards, col("_pos"))
          .otherwise(lit(s2 - 1L) - col("_pos")).cast("int").as("shard"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely its n-gram profile is under a
    * TARGET corpus' bigram distribution than under the raw corpus' own —
    *
    *   w(d) = mean over bigrams b of [ ln P_tgt(b) - ln P_raw(b) ],
    *   P(b) = (c(b) + alpha) / (n + alpha * V)
    *
    * with V the distinct-bigram count over raw ∪ target (one smoothing
    * universe, so target-OOV bigrams fall to the alpha floor rather than
    * vanishing). High-w docs are "target-like"; resampling keeps the top
    * mass ([[sampleBp]] on a weight-ordered rank, or a plain threshold).
    *
    * Scale shape, same rules as the perplexity scorer: every shuffle key
    * is xxhash64 of the bigram (8 bytes; the paper's hashed-ngram
    * buckets, taken to a 64-bit bucket space — the oracle keys literal
    * strings and would expose a collision), the exploded raw stream is
    * cached once and reused for counting and scoring, and the count
    * tables join by key — at 100 TB the target histogram (bounded: the
    * target is a curated sample by definition) broadcasts. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, alpha: Double = 0.1): DataFrame =
    dsirWeightsFull(raw, target, idCol, textCol, alpha)
      .withColumn("log_importance", round(col("log_importance"), 4))

  /** [[dsirWeights]] without the 4-decimal display rounding — full
    * double precision, for tolerance-based comparison/diagnostics. */
  def dsirWeightsFull(raw: DataFrame, target: DataFrame, idCol: String,
                      textCol: String, alpha: Double = 0.1): DataFrame = {
    def explodedBigrams(df: DataFrame, keep: Seq[(String, String)]): DataFrame = {
      val w = graft.functions.TextFunctions.words(col(textCol))
      val bi = when(size(w) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(arrays_zip(
          slice(w, lit(1), size(w) - 1).as("w1"),
          slice(w, lit(2), size(w) - 1).as("w2"))
          .cast("array<struct<w1:string,w2:string>>"))
      df.select(keep.map { case (src, as) => col(src).as(as) } :+
          explode(bi).as("b"): _*)
        .select(keep.map { case (_, as) => col(as) } :+
          xxhash64(col("b.w1"), col("b.w2")).as("bh"): _*)
    }
    val rawBi = explodedBigrams(raw, Seq(idCol -> "id")).persist()
    // one vocab-sized count table instead of two: full-outer join of the
    // raw and target histograms, materialized once — (V, n_raw_total,
    // n_tgt_total) then fall out of a SINGLE driver action over it (the
    // three separate count()/distinct().count() jobs each re-walked a
    // corpus-sized frame), and the scoring pass joins the corpus stream
    // ONCE instead of once per histogram
    val counts = rawBi.groupBy(col("bh")).agg(count(lit(1)).as("n_raw"))
      .join(explodedBigrams(target, Nil)
          .groupBy(col("bh")).agg(count(lit(1)).as("n_tgt")),
        Seq("bh"), "full_outer")
      .persist()
    Sampling.synchronized {
      lastDsirCache.foreach(_.unpersist(false))
      lastDsirCache = Some(counts)
      lastDsirRawCache.foreach(_.unpersist(false))
      lastDsirRawCache = Some(rawBi)
    }
    // coalesce the sums: an empty corpus yields null sums, not 0
    val g = counts.agg(count(lit(1)),
      coalesce(sum(col("n_raw")), lit(0L)),
      coalesce(sum(col("n_tgt")), lit(0L))).head
    val vocab = g.getLong(0)
    val nRaw = g.getLong(1)
    val nTgt = g.getLong(2)
    val logTgt = log((coalesce(col("n_tgt"), lit(0L)) + lit(alpha)) /
      lit(nTgt + alpha * vocab))
    val logRaw = log((col("n_raw") + lit(alpha)) /
      lit(nRaw + alpha * vocab))
    rawBi
      // inner join: every raw bigram has a histogram row (n_raw >= 1);
      // target-only rows drop out here exactly as before
      .join(counts, Seq("bh"))
      .select(col("id"), (logTgt - logRaw).as("lw"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("lw")).as("log_importance"))
  }

  /** DSIR importance RESAMPLING — the selection step after
    * [[dsirWeights]] (Xie 2023 §2.3 samples WITHOUT replacement from
    * the softmax of the log ratios; the Gumbel-top-k trick makes that
    * a single deterministic ranking pass): per doc,
    *
    *   score = w + g,   g = -ln(-ln(u)),
    *   u = (md5_48bit("<seed>:<id>") + 0.5) / 2^48
    *
    * and the kept set is the top `n` scores. The noise is a pure column
    * function of (seed, id) — same replayable-determinism contract as
    * every sampler here (no Spark RNG: stable under retries/splits, and
    * an external engine can re-derive the exact sample).
    *
    * Scale shape: `orderBy(desc).limit(n)` compiles to
    * TakeOrderedAndProject — each partition ships only its local top-n,
    * no global sort, no full shuffle; the result is n rows on one
    * reducer by construction. */
  def importanceResample(weights: DataFrame, idCol: String, wCol: String,
                         n: Int, seed: Long = 0L): DataFrame = {
    val u = (conv(substring(md5(concat(lit(s"$seed:"),
        col(idCol).cast("string"))), 1, 12), 16, 10).cast("double") +
      lit(0.5)) / lit(281474976710656.0) // 16^12 = 2^48
    weights
      .withColumn("_gumbel", -log(-log(u)))
      .withColumn("_score", col(wCol) + col("_gumbel"))
      .orderBy(col("_score").desc, col(idCol))
      .limit(n)
      .drop("_gumbel", "_score")
  }

  /** Dedup-AWARE soft sampling — the alternative to hard near-dup
    * removal (the D4 / SemDeDup-follow-up recipe): every document stays
    * eligible, but a doc in a near-dup cluster of m members carries
    * weight 1/m (log-weight −ln m), so each CLUSTER contributes ~one
    * expected pick and over-copied content stops dominating the sample
    * without being censored outright. Selection is the same
    * Gumbel-top-n deterministic ranking as [[importanceResample]]
    * (md5-derived noise — retry-stable, exactly replayable in SQL).
    *
    * `pairs` is a near-dup pair list (id_a, id_b) from any dedup
    * detector; docs absent from it are singletons (weight 1). Returns
    * the n kept rows as (idCol, cluster, cluster_size).
    *
    * Scale shape: components ride the duplicates-only pair frame
    * (orders of magnitude under corpus size); the corpus pays one
    * keys-sized left join and a TakeOrderedAndProject (per-partition
    * local top-n, no global sort). */
  def clusterWeightedSample(docs: DataFrame, pairs: DataFrame,
                            idCol: String, n: Int,
                            seed: Long = 0L): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    val sized = comps.groupBy(col("component"))
      .agg(count(lit(1)).as("_m"))
    val weighted = docs.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .join(sized, Seq("component"), "left")
      .withColumn("cluster_size", coalesce(col("_m"), lit(1L)))
      .withColumn("_logw", -log(col("cluster_size").cast("double")))
    importanceResample(weighted, idCol, "_logw", n, seed)
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster"),
        col("cluster_size"))
  }

  /** Neyman-optimal sample allocation across strata (Neyman 1934) —
    * the survey-sampling rule a stratified eval/annotation budget
    * should follow: allocate proportional to n_h·sigma_h, so variable
    * strata get more of the budget than uniform ones. All integer:
    * per-stratum population variance via the sums-of-products
    * identity (decimals inside), sigma = floor(sqrt) (exact while the
    * radicand < 2^52), weights w_h = n_h·sigma_h, floor shares of the
    * budget, and the remainder distributed by largest fractional
    * remainder (stratum-ascending tiebreak) — every step replayable.
    * A zero-weight stratum (constant metric) gets only remainder
    * seats. When ALL weights are zero the allocation is NULL — the
    * caller asked to optimize on a signal that does not vary.
    * Output per stratum: (stratum, n, sigma, weight, alloc).
    *
    * Scale shape: ONE hash aggregation to stratum cardinality; the
    * remainder rank is a window over the stratum-bounded frame. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
                       valueCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val agg = df.select(col(stratumCol).cast("string").as("stratum"),
        col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("_sx"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("_sq"))
      .withColumn("_var", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * _sq " +
          "- CAST(_sx AS DECIMAL(38,0)) * _sx) " +
          "div (CAST(n AS DECIMAL(38,0)) * n) AS LONG)"))
      .withColumn("sigma", floor(sqrt(col("_var"))).cast("long"))
      .withColumn("weight", col("n") * col("sigma"))
      .withColumn("_tw", expr("sum(weight) over ()"))
    val shared = agg
      .withColumn("_floor", expr(
        s"CASE WHEN _tw > 0 THEN ${budget}L * weight div _tw END"))
      .withColumn("_remnum", expr(
        s"CASE WHEN _tw > 0 THEN ${budget}L * weight % _tw END"))
      .withColumn("_left", expr(
        s"CASE WHEN _tw > 0 THEN ${budget}L - sum(_floor) over () END"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("_remnum").desc, col("stratum"))).cast("long"))
    shared.select(col("stratum"), col("n"), col("sigma"), col("weight"),
      expr("CASE WHEN _tw > 0 THEN _floor + " +
        "(CASE WHEN _rk <= _left THEN 1L ELSE 0L END) END").as("alloc"))
  }
}
