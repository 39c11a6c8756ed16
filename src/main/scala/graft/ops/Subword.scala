package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (the SentencePiece/Kudo 2018 family —
  * the OTHER major subword algorithm next to merge-based BPE, q48/q130):
  * pick the segmentation of a word that minimizes the total piece cost
  * (= −log p, scaled to INTEGERS so the dynamic program is exact and the
  * oracle can replay it hash-identically). Token budgeting and vocabulary
  * design for training pipelines need both families.
  *
  * Vocabulary ships as a committed resource (`/graft/subword_vocab.txt`,
  * one "piece cost" per line, integer costs); any single character is
  * always representable at `CharCost`, so segmentation is total.
  *
  * Contract (mirrored by the independent sequential replay in
  * tools.GenFixtures that produces q142's committed oracle): Viterbi DP
  * dp[i] = min_j dp[j] + cost(w[j..i)); ties break to the SMALLEST j
  * (longest piece) at every position, applied backward from the end during
  * reconstruction. Pure per-row compute — a narrow mapPartitions pass with
  * one Segmenter per task, zero shuffles (the classic "broadcast the
  * model, stream the corpus" shape; at 100 TB the vocab is a few MB riding
  * the closure and every core segments independently). */
object Subword {

  val CharCost = 100L

  def loadVocab(in: java.io.InputStream): Map[String, Long] =
    scala.util.Using.resource(scala.io.Source.fromInputStream(in, "UTF-8")) {
      _.getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          val i = line.lastIndexOf(' ')
          require(i > 0, s"bad vocab line: '$line'")
          (line.substring(0, i), line.substring(i + 1).toLong)
        }.toMap
    }

  lazy val defaultVocab: Map[String, Long] = loadVocab(
    Option(getClass.getResourceAsStream("/graft/subword_vocab.txt"))
      .getOrElse(throw new IllegalStateException(
        "missing resource /graft/subword_vocab.txt")))

  /** Serializable per-task segmenter. */
  final class Segmenter(vocab: Map[String, Long]) extends Serializable {
    private val maxLen = (vocab.keys.map(_.length) ++ Seq(1)).max

    private def pieceCost(s: String): Long =
      vocab.getOrElse(s, if (s.length == 1) CharCost else Long.MaxValue / 4)

    /** (pieces, total cost) — Viterbi with smallest-j tie-break. */
    def segment(word: String): (Vector[String], Long) = {
      val n = word.length
      if (n == 0) return (Vector.empty, 0L)
      val dp = new Array[Long](n + 1)
      java.util.Arrays.fill(dp, Long.MaxValue / 2)
      dp(0) = 0L
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          val c = pieceCost(word.substring(j, i))
          if (c < Long.MaxValue / 4 && dp(j) + c < dp(i)) dp(i) = dp(j) + c
          j += 1
        }
        i += 1
      }
      // backward reconstruction, smallest-j (longest piece) on ties
      val rev = scala.collection.mutable.ArrayBuffer.empty[String]
      var end = n
      while (end > 0) {
        var j = math.max(0, end - maxLen)
        var chosen = -1
        while (chosen < 0 && j < end) {
          val c = pieceCost(word.substring(j, end))
          if (c < Long.MaxValue / 4 && dp(j) + c == dp(end)) chosen = j
          else j += 1
        }
        require(chosen >= 0, s"viterbi reconstruction broke at $end in '$word'")
        rev += word.substring(chosen, end)
        end = chosen
      }
      (rev.reverseIterator.toVector, dp(n))
    }
  }

  /** One row per input row: (id passthrough, pieces '|'-joined, n_pieces,
    * cost_fp). Null/empty words segment to 0 pieces at cost 0. */
  def segmentTokens(df: DataFrame, tokenCol: String = "token",
      vocab: Map[String, Long] = defaultVocab): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    val seg = new Segmenter(vocab)
    val in = df.select(col(tokenCol).cast("string").as("token"))
    val outSchema = StructType(Seq(
      StructField("token", StringType, nullable = true),
      StructField("pieces", StringType, nullable = false),
      StructField("n_pieces", IntegerType, nullable = false),
      StructField("cost_fp", LongType, nullable = false)))
    in.mapPartitions(_.map { r =>
      val w = if (r.isNullAt(0)) "" else r.getString(0)
      val (p, c) = seg.segment(w)
      Row(r.get(0), p.mkString("|"), p.length, c)
    })(Encoders.row(outSchema))
  }
}
