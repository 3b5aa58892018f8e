package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Self-supervised training-objective construction over a text corpus:
  * fill-in-the-middle (FIM) reordering and masked-language-model (MLM)
  * token masking. Both are the record-level transforms a pretraining
  * pipeline applies AFTER curation (dedup/filter/sample) and BEFORE
  * tokenization — they must be deterministic (reproducible runs,
  * replayable sample audits) and embarrassingly parallel (a narrow map
  * over the corpus, no shuffle).
  *
  * Determinism: every random decision (document selection, cut points,
  * per-token mask draws) derives from md5 of (seed, id[, position]) —
  * the same convention as [[Sampling.bucket]] — so another engine
  * replays the transform bit-for-bit and a re-run of the pipeline
  * produces byte-identical training data.
  *
  * Scale shape: both operators are pure projections (codegen'd string /
  * array HOFs, zero exchanges, zero UDFs). At 100 TB they pipeline into
  * whatever scan feeds them; the only cost is CPU inside whole-stage
  * codegen.
  */
object SpanTasks {

  /** First 8 md5 hex chars of `s` as a long in [0, 2^32). */
  private def h32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** FIM (fill-in-the-middle) transform — Bavarian et al. 2022: pick a
    * deterministic fraction (`rateBp`/10000) of documents; for each,
    * draw two cut points and reorder the three pieces so the model
    * learns to infill. `spm = false` emits PSM
    * (`<fim_prefix>P<fim_suffix>S<fim_middle>M`), `spm = true` emits
    * SPM (`<fim_suffix>S<fim_prefix>P<fim_middle>M`). Unselected
    * documents pass through unchanged (`fim = false`, cuts null).
    *
    * Cut points: lo/hi = min/max of two independent draws in
    * [0, len] — the paper's "split uniformly into three spans",
    * char-level. Empty spans are legal (a cut at 0 or len), matching
    * the reference implementation's behavior.
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   rateBp: Int = 5000, seed: String = "fim",
                   spm: Boolean = false): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, "rateBp in [0, 10000]")
    val id = col(idCol).cast("string")
    val n = length(col(textCol))
    val sel = (h32(concat(id, lit(s"-$seed"))) % 10000) < rateBp
    val a = h32(concat(id, lit(s"-$seed-a"))) % (n + 1).cast("long")
    val b = h32(concat(id, lit(s"-$seed-b"))) % (n + 1).cast("long")
    val lo = least(a, b).cast("int")
    val hi = greatest(a, b).cast("int")
    val prefix = col(textCol).substr(lit(1), lo)
    val middle = col(textCol).substr(lo + 1, hi - lo)
    val suffix = col(textCol).substr(hi + 1, n - hi)
    val rendered =
      if (spm)
        concat(lit("<fim_suffix>"), suffix, lit("<fim_prefix>"), prefix,
          lit("<fim_middle>"), middle)
      else
        concat(lit("<fim_prefix>"), prefix, lit("<fim_suffix>"), suffix,
          lit("<fim_middle>"), middle)
    docs.select(
      col(idCol),
      sel.as("fim"),
      when(sel, lo).as("cut_lo"),
      when(sel, hi).as("cut_hi"),
      when(sel, rendered).otherwise(col(textCol)).as("text_out"))
  }

  /** MLM (BERT-style) token masking: each whitespace token is replaced
    * by `[MASK]` when its per-(doc, position) md5 bucket clears
    * `rateBp`/10000. Emits the masked text, the mask count, and the
    * reconstruction targets (`pos:token`, position 0-based, joined by
    * `' | '`) — the label side of the denoising objective.
    *
    * Token positions key the draw (not token content), so repeated
    * words mask independently and the mask pattern is stable under
    * corpus-wide text dedup. One `transform` + `filter` HOF pair over
    * the split array — codegen'd, no explode, no shuffle.
    */
  def mlmMask(docs: DataFrame, idCol: String, textCol: String,
              rateBp: Int = 1500, seed: String = "mlm"): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, "rateBp in [0, 10000]")
    val id = col(idCol).cast("string")
    val toks = split(col(textCol), " ")
    def drawn(i: Column): Column =
      (h32(concat(id, lit(s":$seed:"), i.cast("string"))) % 10000) < rateBp
    val masked = transform(toks, (tok, i) =>
      when(drawn(i), lit("[MASK]")).otherwise(tok))
    val targets = filter(
      transform(toks, (tok, i) =>
        when(drawn(i), concat(i.cast("string"), lit(":"), tok))),
      x => x.isNotNull)
    docs.select(
      col(idCol),
      array_join(masked, " ").as("masked_text"),
      size(targets).as("n_masked"),
      array_join(targets, " | ").as("targets"))
  }

  /** T5-style span corruption (Raffel et al. 2020) — the third
    * pretraining objective next to [[fimTransform]] and [[mlmMask]]:
    * contiguous token SPANS are replaced by numbered sentinel tokens
    * in the input, and the target is the sentinel-prefixed
    * concatenation of the removed spans. Span boundaries here are
    * BLOCK-ALIGNED (`spanLen` tokens per block, each block corrupted
    * independently with probability `rateBp`/10000 from an md5 draw) —
    * a documented simplification of the paper's Poisson span lengths
    * that keeps every decision a pure function of (id, block), so
    * another engine replays the corruption bit-for-bit and re-runs are
    * byte-identical. Sentinels number left-to-right (`<extra_id_0>`,
    * `<extra_id_1>`, ...) exactly as T5 expects.
    *
    * Emits (id, n_tokens, n_spans, input_text, target_text); empty
    * documents pass through as empty strings. Pure projection over
    * array HOFs — zero exchanges, rides the scan. */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  rateBp: Int = 1500, spanLen: Int = 3,
                  seed: String = "sc"): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, "rateBp in [0, 10000]")
    require(spanLen > 0, "spanLen must be positive")
    val id = col(idCol).cast("string")
    val toks = graft.functions.TextFunctions.words(col(textCol))
    val n = size(toks).cast("long")
    val nblocks = (n + (spanLen - 1)).divide(lit(spanLen)).cast("long")
    def drawn(k: Column): Column =
      (h32(concat(id, lit(s":$seed:"), k.cast("string"))) % 10000) < rateBp
    // sequence(0, -1) would generate a DESCENDING range on an empty
    // doc — build [0, max(nblocks-1, 0)] and filter to real blocks
    val blocks = filter(
      sequence(lit(0L), greatest(nblocks - 1, lit(0L))),
      k => k * spanLen < n)
    val corr = filter(blocks, k => drawn(k))
    // sentinel number = how many corrupted blocks precede this one —
    // an order-stable index with no positional lookup needed
    def sentinel(k: Column): Column = concat(lit("<extra_id_"),
      size(filter(corr, j => j < k)).cast("string"), lit(">"))
    def blockToks(k: Column): Column =
      slice(toks, (k * spanLen + 1).cast("int"), lit(spanLen))
    val input = array_join(flatten(transform(blocks, k =>
      when(array_contains(corr, k), array(sentinel(k)))
        .otherwise(blockToks(k)))), " ")
    val target = array_join(flatten(transform(corr, k =>
      concat(array(sentinel(k)), blockToks(k)))), " ")
    docs.select(
      col(idCol),
      n.as("n_tokens"),
      size(corr).as("n_spans"),
      input.as("input_text"),
      target.as("target_text"))
  }

  /** Needle-in-a-haystack insertion — long-context eval-data
    * construction (Kamradt's NIAH protocol, generalized): plant a
    * templated needle sentence at a CONTROLLED depth of each document's
    * word stream, and emit where it went plus the fingerprint of the
    * rewritten document, so the eval harness knows both the expected
    * answer and the retrieval depth it is probing. `depthBp` is the
    * insertion depth in basis points of the word count (0 = front,
    * 10000 = end) and `needle` the planted sentence — both Columns, so
    * a caller sweeps depths/needles per document deterministically.
    *
    * Emits (id, n_words, depth_bp, insert_pos, needle, new_md5) — the
    * rewritten text itself is fingerprinted, not carried, keeping the
    * audit row bounded; regenerating the text is the same one-line
    * splice. Word positions are exact integer floor arithmetic
    * (`n * depthBp div 10000`), so the placement replays engine-exact.
    *
    * Scale shape: a pure projection (split / slice / concat inside
    * codegen'd HOFs), zero exchanges — pipelines into the scan like
    * [[fimTransform]] / [[mlmMask]]. */
  def needleInsert(docs: DataFrame, idCol: String, textCol: String,
                   needle: Column, depthBp: Column): DataFrame = {
    val ws = graft.functions.TextFunctions.words(col(textCol))
    val n = size(ws).cast("long")
    val posI = expr("n_words * depth_bp div 10000").cast("int")
    docs
      .withColumn("n_words", n)
      .withColumn("depth_bp", depthBp.cast("long"))
      .withColumn("needle", needle)
      .withColumn("insert_pos", posI)
      .withColumn("new_md5", md5(array_join(
        concat(
          slice(ws, lit(1), col("insert_pos")),
          array(col("needle")),
          slice(ws, col("insert_pos") + 1,
            greatest(size(ws) - col("insert_pos"), lit(0)))),
        " ")))
      .select(col(idCol), col("n_words"), col("depth_bp"),
        col("insert_pos").cast("long").as("insert_pos"),
        col("needle"), col("new_md5"))
  }
}
