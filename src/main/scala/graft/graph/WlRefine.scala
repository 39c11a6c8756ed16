package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weisfeiler–Lehman color refinement (1-WL; Weisfeiler & Leman 1968) —
  * the structural-role fingerprint under graph-isomorphism tests and WL
  * graph kernels (Shervashidze 2011), and a cheap "same role in the KG?"
  * blocking key: two nodes can only be structurally equivalent if their
  * WL colors agree after r rounds.
  *
  * Classic WL hashes the (own color, SORTED multiset of neighbor colors)
  * pair; distributing a sorted-multiset hash would force a per-node
  * collect. Instead the multiset is fingerprinted COMMUTATIVELY —
  *   color'(v) = (mixA(color(v)) · 31 + Σ_{u∈N(v)} mixB(color(u))) mod P —
  * a sum of keyed per-neighbor hashes, which is multiset-faithful up to
  * collisions, order-free (so a plain groupBy-SUM computes it), and, being
  * pure modular-integer arithmetic (P = 1048573 < 2^20, products < 2^40,
  * neighbor sums < degree·P), replayable hash-exact by the DuckDB oracle
  * as r unrolled join+GROUP BY rounds. Initial color = degree mod P.
  *
  * Scale shape per round: one groupBy-SUM over the edge list joined to the
  * current coloring — identical cost to one PageRank iteration; r is tiny
  * (3 distinguishes almost everything 1-WL can). */
object WlRefine {

  val P = 1048573L
  private val A1 = 741103L; private val C1 = 12345L
  private val A2 = 886151L; private val C2 = 54321L

  private def mixA(c: org.apache.spark.sql.Column) = (c * A1 + C1) % P
  private def mixB(c: org.apache.spark.sql.Column) = (c * A2 + C2) % P

  /** edges: (src, dst), treated as UNDIRECTED (symmetrized, multi-edges
    * kept — they are real multiset multiplicity). Returns
    * (id, degree, wl_label) after `rounds` refinements. */
  def refine(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds 1..8, got $rounds")
    val sym = edges.select(col("src").as("v"), col("dst").as("u"))
      .unionByName(edges.select(col("dst").as("v"), col("src").as("u")))
    var lab = sym.groupBy("v").agg(count(lit(1)).as("deg"))
      .select(col("v"), col("deg"), (col("deg") % P).as("l"))
    (0 until rounds).foreach { _ =>
      val nbr = sym.join(lab.select(col("v").as("u"), col("l")), Seq("u"))
        .groupBy("v").agg(sum(mixB(col("l"))).as("nb"))
      lab = lab.join(nbr, Seq("v"))
        .select(col("v"), col("deg"),
          ((mixA(col("l")) * 31 + col("nb")) % P).as("l"))
    }
    lab.select(col("v").as("id"), col("deg").as("degree"),
      col("l").as("wl_label"))
  }

  /** WL quotient graph (graph summarization): collapse nodes into their
    * round-r WL color classes and count the DIRECTED edges between classes
    * — the role-level summary of a KG (how many child→parent links flow
    * from "leaf-shaped" nodes into "hub-shaped" nodes, etc.). Two label
    * joins + one class-keyed aggregate on top of `refine`; the summary is
    * color-class-scale, tiny next to the edge list. */
  def quotient(edges: DataFrame, rounds: Int): DataFrame = {
    val lab = refine(edges, rounds).select(col("id"), col("wl_label"))
    edges.select(col("src"), col("dst"))
      .join(lab.select(col("id").as("src"), col("wl_label").as("c_src")),
        Seq("src"))
      .join(lab.select(col("id").as("dst"), col("wl_label").as("c_dst")),
        Seq("dst"))
      .groupBy("c_src", "c_dst").agg(count(lit(1)).as("n_edges"))
  }
}
