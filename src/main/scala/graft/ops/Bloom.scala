package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter (Bloom, CACM 1970) over the engine's portable hash family —
  * the constant-space membership gate for the 10^12-row anti-join: "is this
  * doc id / entity key / n-gram POSSIBLY in the contaminated set?" A
  * definite NO skips the expensive join path entirely; MAYBEs (a tunable
  * few %) fall through to the exact check. Unlike Spark's built-in
  * `bloom_filter_agg`, the registers here are a pure function of the value
  * set over the SAME portable scrambled hash the KMV/HLL/CMS sketches use
  * (TextOps.fingerprint + MINSTD rounds, re-mixed per probe row with the
  * CountMin multiplier family) — deterministic across runs, partition
  * layouts, and ENGINES, which is what makes a cross-engine oracle and a
  * persisted, version-stable filter file possible.
  *
  * Two register forms, same bits:
  *  - `bits`: the set of DISTINCT set-bit positions (one int per bit) —
  *    the relational form the oracle replays and `probe` semi-joins;
  *  - `packed`: positions packed 64-per-row into longs via bit_or — the
  *    form you'd broadcast or persist (m/64 rows ≈ 2 KB for m = 2^17);
  *    `unpack` inverts it exactly (PackedRoundTrip law in the spec).
  *
  * Scale shape: build = one projection + k-way explode + distinct (one
  * shuffle, output ≤ m rows regardless of input size); probe = k-way
  * explode + ONE broadcast-friendly semi-join against the bit table + a
  * per-key ALL aggregate. False-positive rate ≈ (1 − e^{−kn/m})^k; no
  * false negatives — the law the spec pins. */
object Bloom {

  /** CountMin's multiplier family re-used as the k probe rows. */
  private val RowMix = Seq((16807L, 11L), (48271L, 101L), (69621L, 1009L),
    (40692L, 10007L))
  val M = 2147483647L

  private def positions(value: Column, k: Int, mBits: Int): Column = {
    val hv = Sketch.kmvHash(value.cast("string"))
    array(RowMix.take(k).map { case (a, c) =>
      pmod(pmod(hv * a + c, lit(M)), lit(mBits.toLong)).cast("int")
    }: _*)
  }

  /** Distinct set-bit positions for the value set: (bit). k ≤ 4 probe
    * rows (the portable family), m = mBits filter width. */
  def bits(df: DataFrame, valueCol: String, k: Int = 4,
      mBits: Int = 1 << 14): DataFrame = {
    require(k >= 1 && k <= RowMix.size, s"bloom: k 1..${RowMix.size}")
    require(mBits >= 64, "bloom: mBits >= 64")
    df.where(col(valueCol).isNotNull)
      .select(explode(positions(col(valueCol), k, mBits)).as("bit"))
      .distinct()
  }

  /** Probe each key: (key…, maybe_present) — true iff ALL k bits are set.
    * No false negatives; false positives at the designed rate. */
  def probe(bitsDf: DataFrame, probes: DataFrame, valueCol: String,
      k: Int = 4, mBits: Int = 1 << 14): DataFrame = {
    val keyed = probes.where(col(valueCol).isNotNull)
      .select(col(valueCol).as("key"))
      .distinct()
      .select(col("key"), posexplode(positions(col("key"), k, mBits))
        .as(Seq("i", "bit")))
    keyed
      .join(bitsDf.select(col("bit"), lit(true).as("hit")), Seq("bit"), "left")
      .groupBy("key")
      .agg((count(when(col("hit"), 1)) === k).as("maybe_present"))
  }

  /** Pack the bit table into m/64 longs: (word_idx, word). */
  def packed(bitsDf: DataFrame): DataFrame =
    bitsDf
      .groupBy(call_function("div", col("bit").cast("long"), lit(64L))
        .as("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("bit").cast("long"), lit(64L)).cast("int"))).as("word"))

  /** Exact inverse of `packed`: back to (bit) rows. */
  def unpack(packedDf: DataFrame): DataFrame =
    packedDf
      .select(col("word_idx"), explode(sequence(lit(0), lit(63))).as("i"))
      .where(call_function("shiftright", col("word"), col("i"))
        .bitwiseAND(lit(1L)) === 1L)
      .select((col("word_idx") * 64L + col("i")).cast("int").as("bit"))
}
