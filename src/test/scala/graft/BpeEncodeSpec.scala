package graft

import graft.ops.Bpe

class BpeEncodeSpec extends SparkSuite {
  import spark.implicits._

  private val merges = Seq("a b" -> 0).map(_ => ("a", "b")) ++
    Seq(("ab", "c"), ("d", "e"))

  test("encode emits the token sequence whose length tokenCounts reports") {
    val docs = Seq(("d1", "abc de abc"), ("d2", "xyz"), ("d3", ""),
      ("d4", null.asInstanceOf[String])).toDF("doc_id", "text")
    val tokens = Bpe.encode(docs, merges = merges)
      .as[(String, Int, String)].collect().groupBy(_._1)
    // 'abc' -> ab+c -> abc (rank 1 after rank 0); 'de' -> de
    assert(tokens("d1").sortBy(_._2).map(_._3).toSeq ==
      Seq("abc", "de", "abc"))
    assert(tokens("d2").sortBy(_._2).map(_._3).toSeq ==
      Seq("x", "y", "z"))
    assert(!tokens.contains("d3") && !tokens.contains("d4"))
    val counts = Bpe.tokenCounts(docs, merges = merges)
      .as[(String, Int)].collect().toMap
    tokens.foreach { case (id, ts) => assert(counts(id) == ts.length) }
    assert(counts("d3") == 0)
  }

  test("positions are dense document order; digits/marks stay single tokens") {
    val out = Bpe.encode(Seq(("x", "ab1!ab")).toDF("doc_id", "text"),
        merges = merges)
      .as[(String, Int, String)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == (0 until out.length))
    assert(out.map(_._3).toSeq == Seq("ab", "1", "!", "ab"))
  }

  test("committed-vocab encode: greedy == the q48-proven count, corpus-wide") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nByDoc = Bpe.encode(docs).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val counts = Bpe.tokenCounts(docs)
      .as[(Long, Int)].collect().toMap
    counts.foreach { case (id, n) =>
      assert(nByDoc.getOrElse(id, 0L) == n.toLong, s"doc $id")
    }
  }
}
