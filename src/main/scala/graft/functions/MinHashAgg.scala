package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** Typed `Aggregator` computing a GROUP-level MinHash signature from token
  * arrays — the §2.10 UDAF surface ("typed Aggregator registered via
  * udaf()"): sig[i] = min over all tokens of all group members of
  * hash(token, seed=i).
  *
  * Group-level signatures enable CLUSTER dedup (compare whole duplicate
  * groups instead of members) — the natural second pass after pair-level
  * near-dup mining. Merge is an element-wise min, so the aggregate is
  * fully decomposable (map-side partial aggregation applies).
  *
  * Hashing is MurmurHash3 seeded by signature index (self-contained; NOT
  * interchangeable with the xxhash64 signatures of Dedup.minhashSignature).
  */
class MinHashAgg(numHashes: Int) extends Aggregator[Seq[String], Array[Long], Array[Long]] {

  private def hash(token: String, seed: Int): Long =
    (MurmurHash3.stringHash(token, seed).toLong << 32) |
      (MurmurHash3.stringHash(token, seed * 31 + 7).toLong & 0xffffffffL)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], tokens: Seq[String]): Array[Long] = {
    if (tokens != null) {
      var i = 0
      while (i < numHashes) {
        tokens.foreach { t => val h = hash(t, i); if (h < buf(i)) buf(i) = h }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.javaSerialization
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Column form for DataFrame use: `df.groupBy(...).agg(MinHashAgg.of(16)(col))`. */
  def of(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinHashAgg(numHashes))
}
