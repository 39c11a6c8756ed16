package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a web-scale training-data pipeline runs before
  * (or alongside) dedup: PII detection/redaction, repetition ("Gopher rule")
  * metrics, and deterministic hash-stratified sampling.
  *
  * All three are pure per-row Column programs — narrow, shuffle-free,
  * pushdown-friendly, partition-count-agnostic — which is exactly the shape
  * that survives a 100 TB corpus: the scan IS the operator, so throughput is
  * bounded by parquet read bandwidth, not by any exchange. Each has a true
  * DuckDB oracle in SparkEntry (the repetition oracle is an INDEPENDENT
  * unnest+GROUP BY implementation, not a transcription of the sorted-run
  * fold used here).
  *
  * Reference anchor: the reference validates extracted amounts and redacts
  * nothing — PII handling, repetition gates and sampling are the
  * training-data-pipeline extensions mandated by the build brief (the
  * MassiveText/Gopher repetition rules and CCNet-style hash sharding are the
  * public designs these re-express on Spark).
  */
object Curation {

  // ---------------------------------------------------------------- PII ----

  /** Patterns deliberately restricted to the RE2 ∩ java.util.regex common
    * subset (no lookaround, no backrefs) so the DuckDB oracle replays them
    * verbatim. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  /** Card CANDIDATE: a bare digit run of plausible PAN length. Leftmost
    * greedy in both engines; a 20+-digit run yields a 19-digit match plus
    * the remainder — a documented, cross-engine-identical semantics. */
  val digitRunRe = "[0-9]{13,19}"

  /** Luhn checksum validity of a digit string (the public mod-10 card
    * check): from the RIGHT, double every second digit, subtract 9 when the
    * doubled value exceeds 9, sum, valid iff ≡ 0 (mod 10). Pure expression
    * over the char array — no UDF. */
  def luhnValid(digits: Column): Column = {
    val chars = split(reverse(digits), "")
    val contrib = zip_with(chars, sequence(lit(1), size(chars)), (c, i) => {
      val d = ascii(c) - 48
      val dd = d * 2
      when(i % 2 === 0, dd - when(dd > 9, 9).otherwise(0)).otherwise(d)
    })
    length(digits) > 0 && aggregate(contrib, lit(0), _ + _) % 10 === 0
  }

  /** Count of Luhn-VALID card-length digit runs (candidates that fail the
    * checksum are phone-number fragments, ids, timestamps — not PANs). */
  def cardCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(digitRunRe), lit(0)), luhnValid(_)))

  /** Redact in a fixed order: emails, then dashed phones, then ALL
    * card-length digit runs (conservative redaction: an invalid checksum is
    * not proof a 16-digit run is safe to keep — standard DLP practice;
    * `cardCount` carries the checksum-verified signal separately). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      digitRunRe, "[NUM]")

  /** Per-document PII profile + redacted text. One narrow projection. */
  def piiScan(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(
      id.as("id"),
      size(regexp_extract_all(text, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(text, lit(phoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(text, lit(digitRunRe), lit(0))).as("n_digit_runs"),
      cardCount(text).as("n_cards"),
      redact(text).as("redacted"))

  // --------------------------------------------------------- repetition ----

  private def words(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  private def grams(w: Column, n: Int): Column =
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))

  /** Count of the most frequent element of `arr`, as a single fold over the
    * SORTED array (longest equal run) — O(n log n) per row, zero shuffles;
    * the declarative explode+groupBy alternative shuffles every n-gram of
    * the corpus. 0 for an empty array. */
  def topCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  private def dupFrac(arr: Column): Column =
    when(size(arr) === 0, 0.0).otherwise(
      round(lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr).cast("double"), 4))

  private def topFrac(arr: Column): Column =
    when(size(arr) === 0, 0.0).otherwise(
      round(topCount(arr).cast("double") / size(arr).cast("double"), 4))

  /** Gopher/MassiveText-style repetition metrics per document, word-level
    * (the fixture corpus has no line structure): duplicate-word fraction,
    * most-frequent-bigram fraction, duplicate-trigram fraction, and the
    * composite `repetitive` gate (public Gopher thresholds: top-2-gram
    * > 0.18 ∨ dup-3-gram... adjusted to occurrence fractions; the exact
    * constants are this engine's contract, pinned by the oracle). */
  def repetitionMetrics(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = words(text)
    df.select(id.as("id"), w.as("w"))
      .select(
        col("id"),
        size(col("w")).as("n_words"),
        dupFrac(col("w")).as("dup_word_frac"),
        topFrac(grams(col("w"), 2)).as("top_bigram_frac"),
        dupFrac(grams(col("w"), 3)).as("dup_trigram_frac"))
      .withColumn("repetitive",
        (col("top_bigram_frac") > 0.18 || col("dup_trigram_frac") > 0.30).cast("int"))
  }

  // ----------------------------------------------------------- sampling ----

  /** Deterministic per-stratum hash sampling (the CCNet/C4 idiom): keep a
    * row iff `fingerprint(salt || id) mod 100` falls below its stratum's
    * percentage. Shuffle-free, seed-free, reproducible across runs, cluster
    * sizes and partition layouts (the rolling fingerprint is a pure function
    * of the id — q28's oracle-proven fold), and restartable: re-running
    * selects the SAME sample, which is what makes downstream incremental
    * pipelines idempotent. `rates` maps stratum → percent kept [0,100];
    * absent strata fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Int], defaultRate: Int, salt: String = "s:"): DataFrame = {
    val bucket = pmod(TextOps.fingerprint(concat(lit(salt), id.cast("string"))), lit(100L))
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((k, r), acc) =>
      when(stratum === k, r).otherwise(acc)
    }
    df.withColumn("bucket", bucket)
      .where(col("bucket") < rate)
  }

  // ------------------------------------------------------------ packing ----

  /** Concat-and-chunk sequence packing — the GPT-style training-data layout:
    * documents are concatenated in id order and split at `budget`-token
    * boundaries, so a document may straddle a boundary (it is assigned to
    * the sequence where it STARTS). Emits per document:
    * `start_off` (global token offset of the doc's first token),
    * `seq_id` (training sequence the doc starts in), `seq_off` (offset
    * within that sequence) and `n_seqs` (sequences the doc spans; 0 for an
    * empty doc). The output is a pure function of the (id → tokens) mapping
    * and the budget — independent of partition layout, bucket count and
    * cluster size — which is what makes re-sharding a checkpointed packing
    * run reproducible.
    *
    * The global prefix sum is the textbook distributed scan, kept inside
    * ONE declarative query so both passes share the same range exchange:
    * (1) range-partition the slim (id, tokens) projection on id with an
    * EXPLICIT bucket count (explicit numPartitions ⇒ AQE never re-coalesces
    * it, so `spark_partition_id()` is consistent across the plan's two
    * consumers of the exchange); (2) within-bucket running sum via a
    * window; (3) per-bucket totals — one row per bucket — cumulated by a
    * single-partition window over only `numBuckets` rows (bounded by the
    * bucket count, NOT the corpus; the one deliberate serial step every
    * scan algorithm has) and broadcast-joined back. Never a corpus-scale
    * single-partition window, never a driver collect. */
  def packSequences(df: DataFrame, id: Column, tokens: Column, budget: Long,
      numBuckets: Int = 0): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val nb = if (numBuckets > 0) numBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val base = df.select(id.as("id"), tokens.cast("long").as("n_tokens"))
    val parts = base.repartitionByRange(nb, col("id"))
      .withColumn("pid", spark_partition_id())
    val wIn = Window.partitionBy("pid").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = parts.withColumn("run_end", sum("n_tokens").over(wIn))
    // one row per range bucket; the unpartitioned window below runs on
    // `nb` rows total — bounded serial work, same class as a driver fold
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy("pid").agg(sum("n_tokens").as("ptotal"))
      .withColumn("poff", coalesce(sum("ptotal").over(wOff), lit(0L)))
      .select("pid", "poff")
    // floor(long / long) routes through double: exact while offsets stay
    // below 2^53 tokens (~9 petatokens — ×300 headroom over a 100 TB corpus)
    val b = lit(budget)
    within.join(broadcast(offsets), "pid")
      .withColumn("start_off", col("poff") + col("run_end") - col("n_tokens"))
      .withColumn("seq_id", floor(col("start_off") / b))
      .withColumn("seq_off", col("start_off") % b)
      .withColumn("n_seqs",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor((col("start_off") + col("n_tokens") - 1) / b) - col("seq_id") + 1))
      .select("id", "n_tokens", "start_off", "seq_id", "seq_off", "n_seqs")
  }

  /** Corpus-level packing scorecard from `packSequences` output: sequence
    * count, fill ratio (tokens ÷ capacity of the sequences used) and how
    * many documents straddle a boundary. One narrow aggregate. */
  def packingStats(packed: DataFrame, budget: Long): DataFrame =
    packed.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum("n_tokens"), lit(0L)).as("total_tokens"),
        coalesce(sum(when(col("n_seqs") > 1, 1L).otherwise(0L)), lit(0L)).as("n_straddling"))
      .withColumn("n_sequences",
        when(col("total_tokens") === 0, lit(0L))
          .otherwise(floor((col("total_tokens") - 1) / budget) + 1))
      .withColumn("fill_ratio",
        when(col("n_sequences") === 0, lit(0.0))
          .otherwise(round(col("total_tokens") / (col("n_sequences") * budget.toDouble), 4)))
      .select("n_docs", "total_tokens", "n_sequences", "fill_ratio", "n_straddling")
}
