package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extra measurement harness for the r6 optimization round (guide §1.4):
  * isolates sub-steps of the heavy declared queries with the noop sink so
  * the computation is timed, not the sink, and labels every job. NOT part
  * of the driver contract — graft.Bench is the frozen harness; numbers
  * from here are cited in OPTIMIZATION_r06.md only.
  *
  * Usage: runMain graft.BenchExtra <step> [step ...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32). */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[benchextra] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache(); System.gc()
    }
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    def coDirected = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    def coHalf = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()

    args.foreach {
      case "co_edges_directed" => t("co_edges_directed")(coDirected)
      case "co_edges_half" => t("co_edges_half")(coHalf)
      case "kcore_full" => t("kcore_full")(graft.graph.KCore.coreness(coHalf))
      case "kcore_ce4" =>
        t("kcore_ce4")(graft.graph.KCore.coreness(coHalf, checkEvery = 4))
      case "pagerank_full" =>
        t("pagerank_full")(graft.graph.PageRank.run(coDirected, iters = 5))
      case "triangles_full" => t("triangles_full")(graft.graph.Triangles.perNode(coHalf))
      case "setsim_stage" =>
        // re-create jaccardJoin's stages piecewise (t=0.9, documents)
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"),
            array_distinct(split(trim(col("text")), "\\s+")).as("toks"))
        val base = docs
          .select(col("doc_id").cast("string").as("id"), col("toks"))
          .where(col("id").isNotNull && size(col("toks")) > 0)
        val toksE = base.select(col("id"), explode(col("toks")).as("tok"))
        val freq = toksE.groupBy("tok").agg(count(lit(1)).as("df"))
        t("setsim_freq")(freq)
        val prefixes = toksE.join(freq, Seq("tok"))
          .groupBy("id")
          .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("sorted"))
          .withColumn("sz", size(col("sorted")))
          .withColumn("plen",
            col("sz") - ceil(lit(0.9) * col("sz") - lit(1e-9)).cast("int") + 1)
          .select(col("id"), col("sz"),
            explode(expr("slice(sorted, 1, plen)")).as("p"))
          .select(col("id"), col("sz"), xxhash64(col("p.tok")).as("h"))
        t("setsim_prefixes")(prefixes)
        val hashed = prefixes
        val cand = hashed.select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
          .join(hashed.select(col("h"), col("id").as("id_b"), col("sz").as("sz_b")),
            Seq("h"))
          .where(col("id_a") < col("id_b") &&
            least(col("sz_a"), col("sz_b")) >=
              ceil(lit(0.9) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9)))
          .select("id_a", "id_b").distinct()
        t("setsim_cand")(cand)
        t("setsim_verify") {
          cand
            .join(broadcast(base.select(col("id").as("id_a"), col("toks").as("__ta"))), Seq("id_a"))
            .join(broadcast(base.select(col("id").as("id_b"), col("toks").as("__tb"))), Seq("id_b"))
            .withColumn("__i", size(array_intersect(col("__ta"), col("__tb"))))
            .withColumn("__j", col("__i").cast("double") /
              (size(col("__ta")) + size(col("__tb")) - col("__i")))
            .where(col("__j") >= 0.9)
        }
      case "setsim_diag" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("string").as("id"),
            array_distinct(split(trim(col("text")), "\\s+")).as("toks"))
          .where(size(col("toks")) > 0)
        val toksE = docs.select(col("id"), explode(col("toks")).as("tok"))
        println("[diag] toks rows = " + toksE.count())
        val freq = toksE.groupBy("tok").agg(count(lit(1)).as("df"))
        println("[diag] vocab = " + freq.count())
        val vocab = freq.withColumn("tid", monotonically_increasing_id())
        val rec = toksE.join(broadcast(vocab), Seq("tok"))
          .groupBy("id")
          .agg(array_sort(collect_list(struct(col("df"), col("tok"), col("tid")))).as("sorted"))
          .select(col("id"), size(col("sorted")).as("sz"),
            expr("transform(sorted, s -> s.tid)").as("tids")).localCheckpoint()
        println("[diag] records = " + rec.count())
        val hashed = rec.withColumn("plen",
            col("sz") - ceil(lit(0.9) * col("sz") - lit(1e-9)).cast("int") + 1)
          .select(col("id"), col("sz"), explode(expr("slice(tids, 1, plen)")).as("h"))
          .localCheckpoint()
        println("[diag] prefix rows = " + hashed.count())
        val sizes = hashed.groupBy("h").count().localCheckpoint()
        println("[diag] buckets = " + sizes.count() + " max bucket = " +
          sizes.agg(max("count")).head().getLong(0))
        val kept = hashed
        val t0 = System.nanoTime()
        val raw = kept.select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
          .join(kept.select(col("h"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
          .where(col("id_a") < col("id_b") &&
            least(col("sz_a"), col("sz_b")) >=
              ceil(lit(0.9) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9)))
          .select("id_a", "id_b")
        println("[diag] raw cand rows = " + raw.count() +
          f" (${(System.nanoTime()-t0)/1e9}%.2f s)")
        val t1 = System.nanoTime()
        println("[diag] distinct cand = " + raw.distinct().count() +
          f" (${(System.nanoTime()-t1)/1e9}%.2f s)")
        val t2 = System.nanoTime()
        println("[diag] repart distinct cand = " +
          raw.repartition(col("id_a"), col("id_b")).distinct().count() +
          f" (${(System.nanoTime()-t2)/1e9}%.2f s)")
      case "itemsets_stages" =>
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
          col("l_orderkey").as("bk"),
          concat(lit("p"), (col("l_partkey") % 37).cast("string")).as("it"))
        val b = li.where(col("bk").isNotNull && col("it").isNotNull)
          .groupBy("bk").agg(collect_set("it").as("__its")).localCheckpoint()
        t("it_baskets")(b)
        val f1 = b.select(explode(col("__its")).as("it"))
          .groupBy("it").count().where(col("count") >= 30).localCheckpoint()
        t("it_f1")(f1)
        val fArr = f1.agg(sort_array(collect_list("it")).as("__fs"))
        val kb = b.crossJoin(broadcast(fArr))
          .select(col("bk"), array_sort(array_intersect(col("__its"), col("__fs"))).as("fa"))
          .where(size(col("fa")) > 0).localCheckpoint()
        t("it_project")(kb)
        val pairs = kb.select(col("bk"), explode(expr(
          """flatten(transform(fa, (x, i) ->
            |  transform(slice(fa, i + 2, size(fa)),
            |    y -> struct(x as ia, y as ib))))""".stripMargin)).as("p"))
          .select(col("bk"), col("p.ia").as("ia"), col("p.ib").as("ib"))
        t("it_f2")(pairs.groupBy("ia", "ib").count().where(col("count") >= 30))
        val f2 = pairs.groupBy("ia", "ib").count().where(col("count") >= 30).localCheckpoint()
        val bp = pairs.join(broadcast(f2.select("ia", "ib")), Seq("ia", "ib"), "left_semi")
        t("it_bp")(bp)
        val t3 = bp.join(broadcast(kb), Seq("bk"))
          .select(col("bk"), col("ia"), col("ib"),
            explode(expr("filter(fa, z -> z > ib)")).as("ic"))
          .join(broadcast(f2.select(col("ia").as("ib"), col("ib").as("ic"))),
            Seq("ib", "ic"), "left_semi")
          .join(broadcast(f2.select(col("ia"), col("ib").as("ic"))),
            Seq("ia", "ic"), "left_semi")
        t("it_t3")(t3.groupBy("ia", "ib", "ic").count().where(col("count") >= 30))
      case "co_edges_explain" =>
        val df = coHalf
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      case "co_edges_grouped" =>
        // pair expansion from per-order part arrays (no self-join)
        val g = li.groupBy("l_orderkey")
          .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
          .select(posexplode(col("ps")).as(Seq("i", "src")), col("ps"))
          .select(col("src"), explode(expr("slice(ps, i + 2, size(ps))")).as("dst"))
          .where(col("src") < col("dst"))
          .distinct()
        t("co_edges_grouped")(g)
        t("co_edges_grouped2")(g)
      case "containment_stages" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val sh0 = docs.select(col("doc_id").as("id"),
          explode(graft.ops.Dedup.wordShingles(col("text"), 5)).as("shingle"))
          .where(col("shingle").isNotNull)
        t("cont_shingles")(sh0)
        val sh = sh0.localCheckpoint()
        t("cont_vocab")(sh.groupBy("shingle").agg(count(lit(1)).as("df")))
        val vocab = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .withColumn("tid", monotonically_increasing_id()).localCheckpoint()
        val shT = sh.join(broadcast(vocab), Seq("shingle"))
          .select(col("id"), col("tid"), col("df")).localCheckpoint()
        t("cont_rec")(shT.groupBy("id").agg(collect_list("tid").as("tids"),
          count(lit(1)).as("sz")))
        val rec = shT.groupBy("id").agg(collect_list("tid").as("tids"),
          count(lit(1)).as("sz")).localCheckpoint()
        val kept = shT.where(col("df") <= 50).select("id", "tid")
        t("cont_cand")(kept.as("a").join(kept.as("b"),
            col("a.tid") === col("b.tid") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct())
        val cand = kept.as("a").join(kept.as("b"),
            col("a.tid") === col("b.tid") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
          .localCheckpoint()
        t("cont_verify")(cand
          .join(broadcast(rec.select(col("id").as("id_a"), col("tids").as("__ta"), col("sz").as("sz_a"))), "id_a")
          .join(broadcast(rec.select(col("id").as("id_b"), col("tids").as("__tb"), col("sz").as("sz_b"))), "id_b")
          .withColumn("common", size(array_intersect(col("__ta"), col("__tb"))).cast("long")))
      case "shingle_micro" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        t("read_only")(docs.select(col("doc_id"), col("text")))
        t("split_only")(docs.select(col("doc_id"),
          split(trim(col("text")), "\\s+").as("w")))
        val words = split(trim(col("text")), "\\s+")
        t("transform_join")(docs.select(col("doc_id"),
          transform(sequence(lit(0), greatest(size(words) - 5, lit(0))),
            i => when(size(words) >= 5,
              array_join(slice(words, i + lit(1), lit(5)), " "))).as("g")))
        t("shingles_col")(docs.select(col("doc_id"),
          graft.ops.Dedup.wordShingles(col("text"), 5).as("g")))
        t("shingles_explode")(docs.select(col("doc_id"),
          explode(graft.ops.Dedup.wordShingles(col("text"), 5)).as("g")))
        t("shingles_explode2")(docs.select(col("doc_id"),
          explode(graft.ops.Dedup.wordShingles(col("text"), 5)).as("g")))
      case "shingle_bound" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val words = split(trim(col("text")), "\\s+")
        t("bound_col")(docs.select(col("doc_id"), words.as("__w"))
          .select(col("doc_id"),
            transform(sequence(lit(0), greatest(size(col("__w")) - 5, lit(0))),
              i => when(size(col("__w")) >= 5,
                array_join(slice(col("__w"), i + lit(1), lit(5)), " "))).as("g")))
        t("bound_lambda")(docs.select(col("doc_id"),
          flatten(transform(array(words), ws =>
            transform(sequence(lit(0), greatest(size(ws) - 5, lit(0))),
              i => when(size(ws) >= 5,
                array_join(slice(ws, i + lit(1), lit(5)), " "))))).as("g")))
        t("bound_lambda2")(docs.select(col("doc_id"),
          flatten(transform(array(words), ws =>
            transform(sequence(lit(0), greatest(size(ws) - 5, lit(0))),
              i => when(size(ws) >= 5,
                array_join(slice(ws, i + lit(1), lit(5)), " "))))).as("g")))
      case "containment_full" =>
        t("containment_full")(graft.ops.Dedup.containmentPairs(
          spark.read.parquet(s"$sfDir/documents.parquet"), k = 5,
          thresholdPpm = 500000L, maxDf = 50))
      case "winnow_tokens" =>
        t("winnow_tokens") {
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
        }
      case "winnow_grams_nohash" =>
        t("winnow_grams_nohash") {
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          val toks = split(trim(coalesce(col("text"), lit(""))), "\\s+")
          docs.select(col("doc_id"),
            posexplode(transform(sequence(lit(1), greatest(size(toks) - 4, lit(0))),
              i => array_join(slice(toks, i, lit(5)), " "))).as(Seq("p", "g")))
        }
      case "winnow_grams_hashed" =>
        t("winnow_grams_hashed") {
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          val toks = split(trim(coalesce(col("text"), lit(""))), "\\s+")
          docs.select(col("doc_id"),
            posexplode(transform(sequence(lit(1), greatest(size(toks) - 4, lit(0))),
              i => array_join(slice(toks, i, lit(5)), " "))).as(Seq("p", "g")))
            .select(col("doc_id"), col("p"), graft.ops.TextOps.fingerprint(col("g")).as("h"))
        }
      case "winnow_full" =>
        t("winnow_full")(graft.ops.Winnow.fingerprints(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", k = 5, w = 4))
      case other => System.err.println(s"[benchextra] unknown step: $other")
    }
    spark.stop()
  }
}
