package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

/** Deterministic web-text-shaped corpus for exercising the curation ops at
  * scale: (doc_id, text) with PLANTED duplicates — pure function of
  * (seed, idx), distributed generation like InvoiceCorpus.
  *
  * Duplicate structure (controls ground truth for dedup recall checks):
  *  - idx % 40 == 1 → EXACT duplicate of idx-1
  *  - idx % 40 == 2 → NEAR duplicate of idx-2 (≈5% of words mutated)
  *  - otherwise     → fresh text of 60–180 words from a 4k-word vocabulary
  */
object TextCorpus {

  private val vocab: Vector[String] = {
    val rng = new Random(1234L)
    val syll = Vector("ka", "to", "mi", "ra", "su", "ne", "lo", "ba", "chi", "de",
      "fu", "gi", "ho", "ju", "kle", "mor", "nu", "pra", "qui", "sto")
    Vector.tabulate(4000) { i =>
      val n = 2 + rng.nextInt(3)
      (0 until n).map(_ => syll(rng.nextInt(syll.size))).mkString + (if (i % 7 == 0) i.toString.take(2) else "")
    }
  }

  private def freshText(rng: Random): String = {
    val n = 60 + rng.nextInt(121)
    val sb = new java.lang.StringBuilder(n * 7)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(rng.nextInt(vocab.size)))
      i += 1
    }
    sb.toString
  }

  private def mutate(text: String, rng: Random): String = {
    val words = text.split(' ')
    val out = words.map { w =>
      if (rng.nextDouble() < 0.05) vocab(rng.nextInt(vocab.size)) else w
    }
    out.mkString(" ")
  }

  /** Pure per-doc text (duplicates reference earlier indices
    * deterministically). */
  def textOf(idx: Long, seed: Long): String = {
    val base = idx - (idx % 40 match { case 1 => 1L; case 2 => 2L; case _ => 0L })
    val rng = new Random(seed * 7000003L + base * 104729L)
    val fresh = freshText(rng)
    idx % 40 match {
      case 1 => fresh // exact copy of base's text
      case 2 => mutate(fresh, new Random(seed * 11000003L + idx)) // near dup
      case _ => fresh
    }
  }

  def docs(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p)
      .map(i => (i, textOf(i, seed)))
      .toDF("doc_id", "text")
  }
}
