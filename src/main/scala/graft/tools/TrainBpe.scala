package graft.tools

/** One-off trainer for the committed BPE merge table
  * (`src/main/resources/graft/bpe_merges.txt`): the standard BPE training
  * loop — build a word-frequency table over the letter-run pre-tokens of
  * the driver `documents` corpus (sf0.01), then repeatedly count adjacent
  * symbol pairs (frequency-weighted) and merge the most frequent, ties
  * broken by lexicographic pair order for full determinism.
  *
  * Run: sbt "runMain graft.tools.TrainBpe [nMerges]"   (default 160 — the
  * size of the COMMITTED table; regenerating with a different count would
  * invalidate the committed q48 oracle fixture)
  */
object TrainBpe {

  def train(wordFreq: Map[String, Long], nMerges: Int): Vector[(String, String)] = {
    // stable iteration order → deterministic ties
    var words: Array[(Array[String], Long)] = wordFreq.toArray.sortBy(_._1)
      .map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (pair, _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
                out += pair._1 + pair._2; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, f)
          }
        }
        step += 1
      }
    }
    merges.result()
  }

  def main(args: Array[String]): Unit = {
    val nMerges = if (args.nonEmpty) args(0).toInt else 160
    val spark = graft.run.Sessions.local(4, 8, "train-bpe")
    import spark.implicits._
    val texts = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").as[String].collect()
    spark.stop()
    // enrich with the invoice-corpus span vocabulary (vendor names, French
    // invoice terms) so the table covers the KG fixture corpus too — the
    // synthetic documents table alone has ~31 distinct words and saturates
    // after ~90 merges
    val invoiceTexts = (0L until 500L).flatMap { i =>
      graft.fixtures.InvoiceCorpus.spansOf(graft.fixtures.InvoiceCorpus.record(i)).map(_.text)
    }
    val wf = scala.collection.mutable.HashMap.empty[String, Long]
    (texts ++ invoiceTexts).foreach(t =>
      graft.ops.Bpe.PreTokenRegex.findAllIn(t).foreach { w =>
        if (Character.isLetter(w.charAt(0))) wf(w) = wf.getOrElse(w, 0L) + 1L
      })
    val merges = train(wf.toMap, nMerges)
    val out = java.nio.file.Paths.get("src/main/resources/graft/bpe_merges.txt")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out,
      merges.map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n"))
    println(s"[train-bpe] wrote ${merges.size} merges from ${wf.size} distinct words to $out")
  }
}
