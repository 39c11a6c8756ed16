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

  test("property: corpus is partition-layout independent") {
    val a = InvoiceCorpus.docs(spark, 60, partitions = 1).collect().sortBy(_.doc_id)
    val b = InvoiceCorpus.docs(spark, 60, partitions = 7).collect().sortBy(_.doc_id)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, x.doc_id) }
  }
}
