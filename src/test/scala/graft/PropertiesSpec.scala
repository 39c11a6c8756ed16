package graft

import graft.canon.ConnectedComponents
import graft.fixtures.InvoiceCorpus
import graft.tag.Taggers
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property gates (SURVEY.md §5.2 item 4), fixed-seed generators
  * for reproducibility. */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // -- CC correctness on random graphs, vs an in-test union-find oracle ----

  private def oracleComponents(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def randomEdges(n: Int, nodes: Int, seed: Long): Seq[(String, String)] = {
    val g = Gen.listOfN(n, for {
      a <- Gen.choose(0, nodes - 1); b <- Gen.choose(0, nodes - 1)
    } yield (f"n$a%04d", f"n$b%04d"))
    sample(g, seed).filter(e => e._1 != e._2)
  }

  test("property: CC (driver path) matches union-find oracle on random graphs") {
    Seq(11L, 23L, 37L).foreach { seed =>
      val edges = randomEdges(300, 120, seed)
      val got = ConnectedComponents.run(edges.toDF("src", "dst"))
        .as[(String, String)].collect().toMap
      assert(got == oracleComponents(edges), s"seed=$seed")
    }
  }

  test("property: CC (distributed large-star/small-star) matches oracle on a 5k-edge graph") {
    val edges = randomEdges(5000, 800, 101L)
    val got = ConnectedComponents.run(edges.toDF("src", "dst"), smallThreshold = -1L)
      .as[(String, String)].collect().toMap
    assert(got == oracleComponents(edges))
  }

  // -- tagger totality: every input lands in exactly one known class -------

  test("property: tagger totality over arbitrary unicode strings") {
    val classes = Set("header", "amount", "date", "email", "phone", "address", "number", "text")
    val unicodeish = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('€', 'é', '中', '/', '-', '.', '@', ' ', '+')))
      .map(_.mkString)
    val texts = sample(Gen.listOfN(300, Gen.oneOf(
      Gen.asciiPrintableStr, unicodeish, Gen.numStr)), 5L)
    val out = texts.toDF("text")
      .select(Taggers.classifyTextType(col("text"))).as[String].collect()
    assert(out.forall(classes.contains), out.filterNot(classes.contains).take(3).toSeq)
    texts.foreach(t => assert(classes.contains(graft.run.FastExtract.classifyTextType(t))))
  }

  // -- money rendering/normalization roundtrip ------------------------------

  test("property: normalizeAmount(frMoney(cents)) == dotMoney(cents)") {
    val cents = sample(Gen.listOfN(200, Gen.choose(0L, 99999999L)), 9L)
    val out = cents.map(InvoiceCorpus.frMoney).toDF("s")
      .select(Taggers.normalizeAmount(col("s")).cast("string")).as[String].collect()
    cents.zip(out).foreach { case (c, parsed) =>
      assert(parsed == InvoiceCorpus.dotMoney(c), s"cents=$c")
    }
  }

  // -- corpus determinism: same (seed, idx) → identical docs anywhere -------

  test("property: banded tolerance join == naive O(n²) scan on random amounts (incl. ±0.01 boundaries)") {
    // CrossValidate replaces the theta join |a−b|<0.01 with ±1 probes on
    // floor(v·100) decimal keys; this must equal the reference's full scan
    // for ANY inputs, especially values straddling the key boundary
    val rng = new scala.util.Random(13)
    val amounts = Seq.tabulate(120) { i =>
      val base = BigDecimal(rng.nextInt(10000)) / 100
      (i.toLong % 10, base + BigDecimal(rng.nextInt(3) - 1) / 1000) // ±0.001 jitter → x.xx9 / x.xx0 / x.xx1
    }
    val texts = Seq.tabulate(150) { i =>
      val v = BigDecimal(rng.nextInt(10000)) / 100 + BigDecimal(rng.nextInt(3) - 1) / 1000
      (i.toLong % 10, s"montant $v DH")
    }
    val vlm = amounts.toDF("doc_id", "amount").withColumn("confidence", lit(0.5))
    val ocr = texts.toDF("doc_id", "text")
    val got = graft.link.CrossValidate.validateAmounts(vlm, ocr)
      .select($"doc_id", $"amount".cast("string"), $"validated_by_ocr")
      .as[(Long, String, Boolean)].collect()
      .map { case (d, a, v) => (d, BigDecimal(a), v) }.toSet
    // naive reference scan: any number in any same-doc text within 0.01
    val numRe = "\\d+\\.?\\d*".r
    val byDoc = texts.groupBy(_._1).view.mapValues(_.flatMap(t =>
      numRe.findAllIn(t._2.replace(',', '.')).map(BigDecimal(_)))).toMap
    val expected = amounts.map { case (d, a) =>
      (d, a, byDoc.getOrElse(d, Nil).exists(n => (n - a).abs < BigDecimal("0.01")))
    }.toSet
    assert(got == expected,
      s"gotOnly=${got -- expected} expectedOnly=${expected -- got}")
  }

  test("property: corpus is partition-layout independent") {
    val a = InvoiceCorpus.docs(spark, 60, partitions = 1).collect().sortBy(_.doc_id)
    val b = InvoiceCorpus.docs(spark, 60, partitions = 7).collect().sortBy(_.doc_id)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, x.doc_id) }
  }
}
