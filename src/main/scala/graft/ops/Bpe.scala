package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocab-driven byte-pair-encoding token counting — the real thing the
  * regex-only `TextOps.tokenCountBpe` approximates (r3 verdict "Next" #8):
  * token budgeting for training-data curation needs counts from an actual
  * merge table, not a pre-tokenizer upper bound.
  *
  * The merge table ships as a committed resource
  * (`/graft/bpe_merges.txt`, one "left right" pair per line, rank = line
  * number) trained by `tools.TrainBpe` on the driver `documents` corpus
  * with the standard BPE training loop (count adjacent symbol pairs over
  * the word-frequency table, merge the most frequent, repeat). Pre-token
  * classes match `TextOps.tokenCountBpe` (letter runs / single digits /
  * single marks); merges apply WITHIN letter runs only, the GPT-2-style
  * shape.
  *
  * Encoding applies the classic greedy rule — repeatedly merge the
  * LOWEST-RANK adjacent pair present — which is provably equivalent to
  * replaying the merge list in training order (a merge's output symbol can
  * only appear in later-ranked pairs); the committed q48 oracle is computed
  * by that second, sequential-replay implementation (tools.GenFixtures), so
  * the two forms check each other end to end.
  */
object Bpe {

  /** Same token classes as TextOps.tokenCountBpe: letter runs, single
    * digits, single non-alphanumeric marks. */
  val PreTokenRegex: scala.util.matching.Regex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r

  def loadMerges(in: java.io.InputStream): Vector[(String, String)] =
    scala.util.Using.resource(scala.io.Source.fromInputStream(in, "UTF-8")) {
      _.getLines().map(_.trim).filter(_.nonEmpty).map { line =>
        val i = line.indexOf(' ')
        require(i > 0 && i < line.length - 1, s"bad merge line: '$line'")
        (line.substring(0, i), line.substring(i + 1))
      }.toVector
    }

  /** The committed merge table (loaded once per JVM). */
  lazy val defaultMerges: Vector[(String, String)] = loadMerges(
    Option(getClass.getResourceAsStream("/graft/bpe_merges.txt"))
      .getOrElse(throw new IllegalStateException(
        "missing resource /graft/bpe_merges.txt — run tools.TrainBpe")))

  /** Greedy BPE encoder over a fixed merge table. Serializable so one
    * instance rides the task closure; the rank map is built once. */
  final class Tokenizer(val merges: Seq[(String, String)]) extends Serializable {
    private val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Symbol sequence of one letter-run word after all applicable merges
      * (iterative lowest-rank-first; ties cannot occur — ranks are unique). */
    def encodeWord(word: String): Vector[String] = {
      var syms: Vector[String] = word.map(_.toString).toVector
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) { // all occurrences, left-to-right
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          if (syms.length < 2) done = true
        }
      }
      syms
    }

    /** Token count of a text: BPE symbols per letter run + 1 per single
      * digit / mark pre-token. */
    def countTokens(text: String): Int = {
      var n = 0
      PreTokenRegex.findAllIn(text).foreach { t =>
        n += (if (t.length > 1 || Character.isLetter(t.charAt(0))) encodeWord(t).length else 1)
      }
      n
    }

    /** The token SEQUENCE (not just its length) — the artifact sequence
      * packing / decontamination / model input prep actually consume.
      * countTokens(text) == encodeTokens(text).length by construction
      * (both walk the same pre-tokens through the same merge loop). */
    def encodeTokens(text: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      PreTokenRegex.findAllIn(text).foreach { t =>
        if (t.length > 1 || Character.isLetter(t.charAt(0))) out ++= encodeWord(t)
        else out += t
      }
      out.result()
    }
  }

  /** (id, n_tokens_bpe) over a corpus — a mapPartitions pass (the merge
    * loop is a JIT hot path; one Tokenizer per task closure), narrow and
    * shuffle-free like the rest of TextOps. The id column passes through
    * with its ORIGINAL type (string ids like "inv-000042" included — a
    * long cast would silently null them). */
  def tokenCounts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      merges: Seq[(String, String)] = defaultMerges): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val tok = new Tokenizer(merges)
    val in = df.select(col(idCol), col(textCol).cast("string"))
    val outSchema = StructType(Seq(
      in.schema.head.copy(name = idCol),
      StructField("n_tokens_bpe", IntegerType, nullable = false)))
    in.mapPartitions(_.map { r =>
      val t = if (r.isNullAt(1)) "" else r.getString(1)
      Row(r.get(0), tok.countTokens(t))
    })(Encoders.row(outSchema))
  }

  /** Full tokenization: one row per (id, pos, token) in document order —
    * the model-input artifact (tokenCounts is its length projection).
    * Same narrow mapPartitions shape; the explode happens in-task, so a
    * document's tokens never leave their partition. Empty/null texts emit
    * no rows. */
  def encode(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      merges: Seq[(String, String)] = defaultMerges): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val tok = new Tokenizer(merges)
    val in = df.select(col(idCol), col(textCol).cast("string"))
    val outSchema = StructType(Seq(
      in.schema.head.copy(name = idCol),
      StructField("pos", IntegerType, nullable = false),
      StructField("token", StringType, nullable = false)))
    in.mapPartitions(_.flatMap { r =>
      val t = if (r.isNullAt(1)) "" else r.getString(1)
      tok.encodeTokens(t).iterator.zipWithIndex.map { case (s, i) =>
        Row(r.get(0), i, s)
      }
    })(Encoders.row(outSchema))
  }
}
