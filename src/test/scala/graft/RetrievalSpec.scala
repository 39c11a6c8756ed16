package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def run(df: org.apache.spark.sql.DataFrame, terms: Seq[String],
      k: Int = 10): Array[(Long, Long, Double, Int)] =
    Retrieval.bm25TopK(df, "doc_id", "text", terms, topK = k)
      .select(col("id"), col("n_terms"), col("score"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)

  /** Driver-side BM25 replay — the independent sequential definition. */
  private def naive(rows: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10): Seq[(Long, Long, Double, Int)] = {
    val toks = rows.map { case (id, t) =>
      (id, Option(t).getOrElse("").trim.split("\\s+").filter(_.nonEmpty).toSeq)
    }
    val n = rows.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    val df = terms.map(t => (t, toks.count(_._2.contains(t)).toDouble)).toMap
    val scored = toks.flatMap { case (id, tk) =>
      val matched = terms.filter(tk.contains)
      if (matched.isEmpty) None
      else {
        val dl = tk.size.toDouble
        val s = matched.map { t =>
          val tf = tk.count(_ == t).toDouble
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }.sum
        Some((id, matched.size.toLong,
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, m, s), i) => (id, m, s, i + 1) }
  }

  test("hand corpus: rarer term outranks common term, tf and dl matter") {
    val rows = Seq[(Long, String)](
      (1L, "spark join join join"),      // high tf on 'join'
      (2L, "spark shuffle"),             // rare term 'shuffle'
      (3L, "spark spark spark spark spark spark spark spark"), // long, common
      (4L, "filter scan"))               // no match
    val out = run(corpus(rows: _*), Seq("join", "shuffle"))
    val exp = naive(rows, Seq("join", "shuffle"))
    assert(out.toSeq == exp)
    // doc 4 absent; shuffle (df=1) outscores join (df=1, but tf-saturated)
    assert(!out.exists(_._1 == 4L) && out.nonEmpty)
  }

  test("matches the driver replay on a pseudo-random corpus at two (k1,b)") {
    val vocab = Vector("spark", "join", "window", "scan", "agg", "table",
      "row", "value", "fast", "slow")
    val rows = (0L until 60L).map { i =>
      (i, (0 until (5 + (i % 11)).toInt)
        .map(j => vocab(((i * 7 + j * 13) % vocab.size).toInt)).mkString(" "))
    }
    val terms = Seq("spark", "window", "slow")
    assert(run(corpus(rows: _*), terms, k = 15).toSeq ==
      naive(rows, terms, k = 15))
    val custom = Retrieval.bm25TopK(corpus(rows: _*), "doc_id", "text",
      terms, k1 = 0.9, b = 0.4, topK = 15)
      .select(col("id"), col("n_terms"), col("score"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(custom.toSeq == naive(rows, terms, k1 = 0.9, b = 0.4, k = 15))
  }

  test("ranking is total: rounded-score ties break by id ascending") {
    val rows = Seq[(Long, String)]((7L, "spark x"), (3L, "spark x"), (5L, "spark x"))
    val out = run(corpus(rows: _*), Seq("spark"))
    assert(out.map(_._1).toSeq == Seq(3L, 5L, 7L))
    assert(out.map(_._4).toSeq == Seq(1, 2, 3))
  }

  test("null/empty text is safe and counts toward N and avgdl") {
    val rows = Seq((1L, "spark join"), (2L, null.asInstanceOf[String]), (3L, ""))
    val out = run(corpus(rows: _*), Seq("spark"))
    assert(out.map(_._1).toSeq == Seq(1L))
    // N=3 (not 1): idf must see the empty docs
    val expIdf = math.log(1.0 + (3.0 - 1 + 0.5) / (1 + 0.5))
    val dl = 2.0; val avgdl = 2.0 / 3.0
    val expScore = expIdf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert(math.abs(out.head._3 -
      BigDecimal(expScore).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("topK truncates after the total order; guards reject bad args") {
    val rows = (0L until 20L).map(i => (i, "spark"))
    assert(run(corpus(rows: _*), Seq("spark"), k = 5).map(_._1).toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus(rows: _*), "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus(rows: _*), "doc_id", "text", Seq("a", "a"))
    }
  }

  test("layout invariance: partitioning never changes scores or ranks") {
    val rows = (0L until 40L).map { i =>
      (i, Seq.fill((i % 7 + 1).toInt)(if (i % 3 == 0) "spark" else "join")
        .mkString(" "))
    }
    val base = run(corpus(rows: _*), Seq("spark", "join"), k = 12).toSeq
    val re = Retrieval.bm25TopK(corpus(rows: _*).repartition(13),
      "doc_id", "text", Seq("spark", "join"), topK = 12)
      .select(col("id"), col("n_terms"), col("score"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(re.toSeq == base)
  }

  // ---- ranked-retrieval evaluation (MAP/MRR/P@k/R@k, exact ppm) ---------

  private def evalR(rows: Seq[(String, Int, Boolean)], k: Int = 5) =
    Retrieval.evalRanking(rows.toDF("q", "r", "rel").repartition(3),
        col("q"), col("r"), col("rel"), k)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6, t._7))).toMap

  test("eval: hand-computed AP/MRR on the textbook example") {
    // hits at ranks 1, 3, 5 of 6; R=3: AP = (1/1 + 2/3 + 3/5)/3 = 34/45
    val rows = Seq(("q1", 1, true), ("q1", 2, false), ("q1", 3, true),
      ("q1", 4, false), ("q1", 5, true), ("q1", 6, false))
    val got = evalR(rows)
    val ap = BigInt(1000000) * 34 / 45
    // all three hits (ranks 1,3,5) fall inside k=5: P@5 = 3/5, R@5 = 3/3
    assert(got("q1") === ((6L, 3L, Some(1000000L), Some(ap.toLong),
      Some(600000L), Some(1000000L))))
  }

  test("eval: MRR floor, late first hit, zero-relevant nulls") {
    val rows = Seq(("a", 1, false), ("a", 2, false), ("a", 3, true),
      ("b", 1, false), ("b", 2, false))
    val got = evalR(rows)
    assert(got("a") === ((3L, 1L, Some(333333L), Some(333333L), Some(200000L),
      Some(1000000L))))
    assert(got("b") === ((2L, 0L, None, None, None, None)))
  }

  test("eval: BigInt-rational parity on random rankings") {
    val rnd = new scala.util.Random(47)
    val rows = for {
      q <- (0 until 12).map(i => s"q$i")
      n = 3 + rnd.nextInt(10)
      r <- 1 to n
    } yield (q, r, rnd.nextBoolean())
    val got = evalR(rows, k = 4)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      val hits = sorted.filter(_._3).map(_._2)
      if (hits.isEmpty)
        assert(got(q) === ((sorted.length.toLong, 0L, None, None, None, None)))
      else {
        val r = hits.length
        val apFrac = hits.zipWithIndex
          .map { case (rk, i) => (BigInt(i + 1), BigInt(rk)) }
          .reduce((a, b) => (a._1 * b._2 + b._1 * a._2, a._2 * b._2))
        val ap = BigInt(1000000) * apFrac._1 / (apFrac._2 * r)
        val mrr = BigInt(1000000) / hits.head
        val hk = hits.count(_ <= 4).toLong
        assert(got(q) === ((sorted.length.toLong, r.toLong,
          Some(mrr.toLong), Some(ap.toLong), Some(1000000L * hk / 4),
          Some(1000000L * hk / r))), s"query $q")
      }
    }
  }

  test("eval: duplicate ranks rejected loudly") {
    intercept[org.apache.spark.SparkException] {
      evalR(Seq(("d", 1, true), ("d", 1, false)))
    }
  }

  test("eval: 0-based and negative ranks rejected loudly") {
    // r4 ADVICE regression: rank 0 used to throw BigInt div-by-zero in
    // MRR; negative ranks silently produced negative ppm metrics.
    intercept[org.apache.spark.SparkException] {
      evalR(Seq(("d", 0, true), ("d", 1, false)))
    }
    intercept[org.apache.spark.SparkException] {
      evalR(Seq(("d", -3, false), ("d", 2, true)))
    }
  }
}
