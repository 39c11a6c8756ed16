package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Personalized PageRank (Page et al. 1999 §6; Jeh & Widom 2003) — global
  * PageRank (q56) ranks the whole graph; PPR ranks it FROM a seed set,
  * which is the KG-relevance question ("which entities matter to THIS
  * customer/document/query?") behind recommendation, related-entity
  * panels, and local community detection (Andersen–Chung–Lang sweep cuts
  * read PPR vectors).
  *
  * EXACT INTEGER fixed point (the q116/q144 discipline — ppb mass,
  * truncating `div`, bit-stable at any layout, replayable by the DuckDB
  * oracle as unrolled rounds):
  *   r_0(v)     = 10^9 div |S|               for v ∈ S, else 0
  *   r_{t+1}(v) = αpart(v) + Σ_{u→v} ((r_t(u) · (10−A) div 10) div out(u))
  *   αpart(v)   = ((10^9 · A div 10) div |S|) for v ∈ S, else 0
  * with α = A/10 (A an integer digit — α is exact, not a float). Mass at
  * dangling nodes truncates away (the standard simplification; counters
  * stay exact). Truncation loses < out(u) ppb per node per round — at ppb
  * scale the ranking is unaffected.
  *
  * Scale shape per round: edges ⋈ ranks (src-keyed equi join, out-degree
  * pre-joined once) → dst-keyed long-SUM → union the seed restart mass —
  * one keyed exchange per round, the PageRank floor; seeds are a
  * broadcast-scale table. */
object Ppr {

  val Mass = 1000000000L // ppb

  /** edges: (src, dst) directed; seeds: (id). alphaTenths = A where
    * α = A/10. Returns (id, ppr_fp) for nodes with positive mass after
    * `rounds` iterations. */
  def personalized(edges: DataFrame, seeds: DataFrame, rounds: Int,
      alphaTenths: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds 1..20, got $rounds")
    require(alphaTenths >= 1 && alphaTenths <= 9,
      s"alphaTenths 1..9, got $alphaTenths")
    val idiv = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("div", a, b)
    val e = edges.select(col("src"), col("dst"))
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out"))
    val sd = seeds.select(col("id")).distinct()
    val nSeeds = sd.agg(count(lit(1)).as("ns"))
    // seed mass tables are 1-row-count × seed-scale: fold |S| in by
    // crossJoin (broadcast), keeping the whole chain lazy/driver-free
    val r0 = sd.crossJoin(broadcast(nSeeds))
      .select(col("id"), idiv(lit(Mass), col("ns")).as("r"))
    val restart = sd.crossJoin(broadcast(nSeeds))
      .select(col("id"),
        idiv(idiv(lit(Mass) * alphaTenths, lit(10L)), col("ns")).as("r"))
    var rank = r0
    (1 to rounds).foreach { _ =>
      val push = rank.join(e, rank("id") === e("src"))
        .join(outDeg, Seq("src")) // vertex-scale: co-keyed join, never broadcast
        .select(col("dst").as("id"),
          idiv(idiv(col("r") * (10 - alphaTenths), lit(10L)), col("out"))
            .as("r"))
        .groupBy("id").agg(sum("r").as("r"))
      rank = push.unionByName(restart)
        .groupBy("id").agg(sum("r").as("r"))
    }
    rank.where(col("r") > 0).select(col("id"), col("r").as("ppr_fp"))
  }
}
