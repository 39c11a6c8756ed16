package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed greedy vertex coloring — Jones–Plassmann (SIAM J. Sci.
  * Comput. 1993), the parallelization of sequential greedy coloring by
  * random priorities. The KG build uses a proper coloring as a CONFLICT
  * SCHEDULE: color classes are independent sets, so same-color entity
  * merges / store updates can run in one parallel wave without touching a
  * shared neighbor (the write-side complement of q156's maximal matching).
  *
  * Rule per round: an uncolored node v is colored when it beats every
  * uncolored neighbor on (priority, id) — priority = the portable
  * scrambled hash (`Sketch.kmvHash`), id the total-order tiebreak — and
  * takes the SMALLEST color unused by its already-colored neighbors (mex).
  * Key structural fact (and what the oracle checks): a lower-priority
  * neighbor can never be colored while v waits, so v's colored neighbors
  * at assignment time are EXACTLY its higher-(priority, id) neighbors —
  * the parallel rounds compute precisely the sequential greedy coloring in
  * decreasing (priority, id) order. Deterministic in the data, independent
  * of partitioning, rounds = O(log n / log log n) w.h.p.
  *
  * Scale shape per round: one node-keyed join of the uncolored frontier
  * against the adjacency list (winners), one join against the colored set
  * (neighbor colors) + a per-node sorted-mex aggregate, two anti joins to
  * shrink the frontier. Everything is keyed by node id; no collects. The
  * mex aggregate buffers one node's neighbor COLORS (≤ its degree, and
  * colors ≤ Δ+1) — bounded by the hub degree, the usual cap-or-spill
  * consideration. */
object Coloring {

  /** edges: any orientation; isolated nodes (absent from edges) are the
    * caller's to color 0. Returns (id, color, round) — color ∈ [0, Δ+1),
    * round = the wave the node was colored in (1-based). */
  def jonesPlassmann(edges: DataFrame, maxRounds: Int = 200): DataFrame = {
    require(maxRounds >= 1, s"coloring: maxRounds >= 1, got $maxRounds")
    val sc = col("src").cast("string")
    val dc = col("dst").cast("string")
    val und = edges
      .select(least(sc, dc).as("a"), greatest(sc, dc).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val adj = graft.Materialize(
      und.select(col("a").as("id"), col("b").as("nb"))
        .union(und.select(col("b").as("id"), col("a").as("nb"))))
    val prio = (c: Column) => graft.ops.Sketch.kmvHash(c)
    var un = graft.Materialize(
      adj.select(col("id")).distinct()
        .select(col("id"), prio(col("id")).as("p")))
    val session = un.sparkSession
    import session.implicits._
    // r6 size gate: the parallel waves compute EXACTLY the sequential
    // greedy coloring in decreasing (priority, id) order (the class
    // docstring's structural fact — priorities come from the SAME
    // kmvHash column, collected, not recomputed), and the wave number
    // is itself sequential: round(v) = 1 + max(round(u)) over v's
    // higher-(p, id) neighbors. So at gate-small sizes run that exact
    // recurrence on the driver — one collect + one linear pass instead
    // of O(waves) rounds of 3 joins + 2 checkpoints + a count each
    // (gate-forced parity asserted in ColoringSpec; beyond the gate the
    // wave loop below is unchanged).
    val localMaxE = session.conf
      .get("spark.graft.coloring.localMaxEdges", "8000000").toLong
    if (adj.count() <= localMaxE)
      return jonesPlassmannLocal(adj, un)
    var colored = Seq.empty[(String, Int, Int)].toDF("id", "color", "round")
    var round = 0
    var remaining = un.count()
    val nTotal = remaining
    while (remaining > 0) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"coloring: $remaining node(s) uncolored after $maxRounds rounds")
      // r6: the uncolored state (`remaining` rows, counted by the loop)
      // and the colored table (nTotal − remaining rows) are node-scale
      // with known counts — gate-hint them into the edge-scale joins
      // (guide §3.1); beyond the gate the SMJ rounds are unchanged.
      def hUn(df: DataFrame) = graft.Hints.bcastIf(df, remaining)
      def hCol(df: DataFrame) = graft.Hints.bcastIf(df, nTotal - remaining)
      // winners: uncolored nodes with no uncolored neighbor above them in
      // (priority, id) order — anti join against the losing evidence
      val frontier = adj.join(hUn(un), Seq("id")) // (id, nb, p): uncolored only
      val blocked = frontier
        .join(hUn(un.select(col("id").as("nb"), col("p").as("nbp"))), Seq("nb"))
        .where(col("nbp") > col("p") ||
          (col("nbp") === col("p") && col("nb") > col("id")))
        .select(col("id")).distinct()
      val winners = un.join(hUn(blocked), Seq("id"), "left_anti")
      // mex over already-colored neighbors' colors (sorted-prefix fold).
      // Every un-node id came from adj and never leaves it, so the old
      // `winners LEFT JOIN adj` always matched — written inner with the
      // winners side gate-hinted, the adjacency table is not shuffled.
      val nbColors = adj.join(hUn(winners), Seq("id"))
        .join(hCol(colored.select(col("id").as("nb"), col("color").as("nbc"))),
          Seq("nb"), "left")
        .groupBy("id")
        .agg(sort_array(array_distinct(collect_list("nbc"))).as("cs"))
        .select(col("id"),
          aggregate(col("cs"), lit(0),
            (acc, c) => when(c === acc, acc + 1).otherwise(acc)).as("color"),
          lit(round).as("round"))
      colored = graft.Materialize(colored.unionByName(nbColors))
      un = graft.Materialize(un.join(hUn(nbColors), Seq("id"), "left_anti"))
      remaining = un.count()
      // join above needs `un` for blocking only; `blocked` is derived from
      // the PREVIOUS un, so the shrink is consistent within the round
    }
    colored
  }

  /** Driver-local exact replay of the Jones–Plassmann result: sequential
    * greedy in decreasing (priority, id) order, wave(v) = 1 + max wave of
    * v's higher-(p, id) neighbors (0-max → wave 1), color(v) = mex over
    * those same neighbors' colors. Identical output to the wave loop —
    * the equivalence the class docstring proves and the committed
    * sequential-greedy oracle fixture already checks. */
  private def jonesPlassmannLocal(adj: DataFrame, un: DataFrame): DataFrame = {
    val spark = un.sparkSession
    import spark.implicits._
    val prios = un.as[(String, Long)].collect()
    val order = prios.sortBy { case (id, p) => (-p, id) }(
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
    // decreasing (p, id): -p ascending, id DESCENDING on ties
    val edgesArr = adj.as[(String, String)].collect()
    val nbrs = new java.util.HashMap[String, java.util.ArrayList[String]]()
    edgesArr.foreach { case (id, nb) =>
      nbrs.computeIfAbsent(id, _ => new java.util.ArrayList[String]()).add(nb)
    }
    val color = new java.util.HashMap[String, Int]()
    val wave = new java.util.HashMap[String, Int]()
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int, Int)](order.length)
    order.foreach { case (id, _) =>
      var maxWave = 0
      val used = new java.util.HashSet[Integer]()
      val ns = nbrs.get(id)
      if (ns != null) {
        val it = ns.iterator()
        while (it.hasNext) {
          val u = it.next()
          val cu = color.get(u)
          if (color.containsKey(u)) { // already colored ⇔ higher (p, id)
            used.add(cu)
            val wu = wave.get(u)
            if (wu > maxWave) maxWave = wu
          }
        }
      }
      var c = 0
      while (used.contains(c)) c += 1
      color.put(id, c)
      wave.put(id, maxWave + 1)
      out += ((id, c, maxWave + 1))
    }
    out.toSeq.toDF("id", "color", "round")
  }
}
