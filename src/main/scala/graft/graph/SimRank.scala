package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimRank (Jeh & Widom, KDD 2002) — "two objects are similar if they are
  * referenced by similar objects." The structural-similarity score the KG
  * uses where string similarity has nothing to say: two vendor entities
  * that share no token but are cited by the same documents, two documents
  * linked by the same entities. Complements J6's lexical entity pairing
  * with a purely topological signal.
  *
  * EXACT INTEGER fixed point in ppm (the q116/q144/q152 discipline —
  * truncating `div`, bit-stable at any partition layout, replayable by the
  * oracle as unrolled rounds):
  *   s_0(a,a)     = 10^6;  s_0(a,b) = 0  for a ≠ b
  *   s_{r+1}(a,b) = (cNum · Σ_{i∈I(a), j∈I(b)} s_r(i,j))
  *                    div (cDen · |I(a)| · |I(b)|)        for a ≠ b
  * with decay C = cNum/cDen (default 4/5 = 0.8 — an exact rational, not a
  * float). Pairs where either side has no in-neighbors stay 0, the paper's
  * convention. Truncation loses < 1 ppm per pair per round.
  *
  * Scale shape per round: the nonzero pair table joins the edge list TWICE
  * (x-keyed then y-keyed equi joins — the G×G product graph walk), one
  * (a,b)-keyed SUM, one broadcast-scale in-degree join. The pair state is
  * the quadratic object of SimRank — at corpus scale you run this on a
  * BOUNDED subgraph (an entity neighborhood, a candidate block from J6's
  * LSH — exactly how the literature deploys it); the operator itself never
  * collects, so the bound is the caller's choice of edge subset. The
  * decay-C geometric tail means `rounds` = 3–5 captures the ranking. */
object SimRank {

  val Ppm = 1000000L

  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** edges: directed (src, dst) = "src references dst"; I(v) = {u : u→v}.
    * Returns (a, b, s_ppm) with a < b and s_ppm > 0 after `rounds`
    * iterations (the diagonal is identically 10^6 and omitted). */
  def similarity(edges: DataFrame, rounds: Int,
      cNum: Int = 4, cDen: Int = 5): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"simrank: rounds 1..8, got $rounds")
    require(cNum >= 1 && cDen > cNum,
      s"simrank: need 0 < cNum/cDen < 1, got $cNum/$cDen")
    val e = graft.Materialize(edges
      .select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val indeg = e.groupBy(col("dst").as("v")).agg(count(lit(1)).as("ind"))
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val diag = nodes.select(col("v").as("x"), col("v").as("y"),
      lit(Ppm).as("s"))
    var state = diag
    (1 to rounds).foreach { _ =>
      val num = state
        .join(e.select(col("src").as("x"), col("dst").as("a")), Seq("x"))
        .join(e.select(col("src").as("y"), col("dst").as("b")), Seq("y"))
        .groupBy("a", "b").agg(sum("s").as("num"))
      val offDiag = num.where(col("a") =!= col("b"))
        .join(indeg.select(col("v").as("a"), col("ind").as("ia")), Seq("a"))
        .join(indeg.select(col("v").as("b"), col("ind").as("ib")), Seq("b"))
        .select(col("a").as("x"), col("b").as("y"),
          idiv(lit(cNum.toLong) * col("num"),
            lit(cDen.toLong) * col("ia") * col("ib")).as("s"))
        .where(col("s") > 0)
      // Materialize: keeps the per-round plan flat (the state feeds two
      // join branches of the NEXT round through self-aliasing)
      state = graft.Materialize(offDiag.unionByName(diag))
    }
    state.where(col("x") < col("y"))
      .select(col("x").as("a"), col("y").as("b"), col("s").as("s_ppm"))
  }
}
