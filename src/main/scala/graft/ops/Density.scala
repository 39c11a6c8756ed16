package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-based density clustering — the cell-histogram core of GriDBSCAN /
  * cell-based DBSCAN (Ester et al. 1996 by way of the grid variants): snap
  * points to an eps-grid, keep cells with ≥ minPts points ("dense"), and
  * union Chebyshev-adjacent dense cells into clusters. The embedding-space
  * deployment: topic blobs / template families in a 2-D projection of the
  * doc embedding table, found WITHOUT any pairwise distance join.
  *
  * Why this shape at 10^12 rows: true DBSCAN needs an eps-neighborhood
  * join (quadratic without an index); the grid pass is ONE cell-keyed
  * aggregation — the heavy table is touched once, everything after runs at
  * CELL scale (≤ points/minPts cells, usually millions of times smaller).
  * The cell graph (≤ 8 neighbors each) goes through the same hybrid
  * ConnectedComponents the entity canonicalizer uses (driver union-find
  * below threshold, large-star/small-star above).
  *
  * Determinism: cell = floor(x/eps) on IEEE doubles — both engines cast
  * float→double and divide by the same literal, so the snap is bit-stable
  * cross-engine (the oracle replays it); cluster id = the component's
  * minimal cell key string (CC's convention). */
object Density {

  private def cellKey(cx: Column, cy: Column): Column =
    concat(cx.cast("string"), lit("|"), cy.cast("string"))

  /** Per-cluster summary over dense cells: (cluster, n_cells, n_points),
    * cluster = min cell key of the connected dense-cell group. Points in
    * sparse cells are noise and appear in no cluster. */
  def gridClusters(df: DataFrame, xCol: String, yCol: String,
      eps: Double, minPts: Long): DataFrame = {
    require(eps > 0, s"density: eps > 0, got $eps")
    require(minPts >= 1, s"density: minPts >= 1, got $minPts")
    val cells = graft.Materialize(df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(floor(col(xCol).cast("double") / eps).as("cx"),
        floor(col(yCol).cast("double") / eps).as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("n_points"))
      .where(col("n_points") >= minPts))
    // 3×3 stencil: each dense cell proposes edges to its Chebyshev
    // neighborhood; the join keeps proposals that land on dense cells.
    // Self-offset keeps singleton dense cells as their own component.
    val offsets = Seq(-1, 0, 1).flatMap(dx => Seq(-1, 0, 1).map(dy => (dx, dy)))
    val stencil = cells.select(col("cx"), col("cy"),
        explode(array(offsets.map { case (dx, dy) =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)).as("o"))
      .select(col("cx"), col("cy"),
        (col("cx") + col("o.dx")).as("tx"), (col("cy") + col("o.dy")).as("ty"))
    val edges = stencil
      .join(cells.select(col("cx").as("tx"), col("cy").as("ty")),
        Seq("tx", "ty"), "left_semi")
      .select(cellKey(col("cx"), col("cy")).as("src"),
        cellKey(col("tx"), col("ty")).as("dst"))
    val comp = graft.canon.ConnectedComponents.run(edges)
    cells
      .select(cellKey(col("cx"), col("cy")).as("id"), col("n_points"))
      .join(comp, Seq("id"), "left")
      .select(coalesce(col("component"), col("id")).as("cluster"),
        col("n_points"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_cells"), sum("n_points").as("n_points"))
  }
}
