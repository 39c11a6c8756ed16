package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar,
  * IEEE/ACM ToN 1998: key → argmax over shards of hash(key‖shard). The
  * assignment every incremental pipeline wants for "which worker/store
  * owns this entity": when a shard joins or leaves, ONLY the keys whose
  * argmax involves that shard move (minimal disruption — 1/n of keys in
  * expectation), where a mod-N hash reshuffles nearly everything.
  *
  * Determinism: the weight is [[Sketch.kmvHash]] — the portable rolling
  * fingerprint of shard‖'|'‖key pushed through the two MINSTD LCG
  * scramble rounds (the q98-proven cross-engine construction). The
  * scramble is LOAD-BEARING here, not cosmetic: the raw fingerprint is
  * affine in the key (w_s = A_s·31^len + C_key mod M), so between two
  * shards the argmax flips only at ring-wrap boundaries — measured, a
  * 4-shard assignment gave every key to one or two shards. Each LCG round
  * multiplies the boundary count by its multiplier (48271·69621 ≈ 3.4·10⁹
  * slices), which is what makes the weights behave independently per
  * (shard, key). Ties break by shard id inside the same max-struct — a
  * total order; ownership is a pure function of (key, shard set),
  * replayable term-for-term in any engine.
  *
  * Shape: the shard list is a per-row array literal (shards are 10²–10⁴
  * while keys are 10¹²) — one narrow Project, array_max over
  * (weight, shard) structs, ZERO shuffles. */
object Shard {

  /** Adds an `owner` column: the rendezvous-chosen shard for `keyCol`
    * among `shards` (must be non-empty, distinct). */
  def assign(df: DataFrame, keyCol: String, shards: Seq[String],
      ownerCol: String = "owner"): DataFrame = {
    require(shards.nonEmpty, "assign: shards must be non-empty")
    require(shards.distinct.size == shards.size, "assign: shards must be distinct")
    val weighted: Seq[Column] = shards.map { sh =>
      struct(
        Sketch.kmvHash(concat(lit(sh + "|"), col(keyCol).cast("string"))).as("w"),
        lit(sh).as("s"))
    }
    df.withColumn(ownerCol, array_max(array(weighted: _*)).getField("s"))
  }
}
