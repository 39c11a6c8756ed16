package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hinting for operator-internal joins.
  *
  * Materialize (localCheckpoint) replaces an intermediate's logical plan
  * with a LogicalRDD whose size statistics are no longer the small
  * aggregate the operator knows it produced — so the planner never
  * auto-broadcasts a node-scale state table into an edge-scale join, and
  * every round of an iterative operator pays a full shuffle + sort of the
  * edge table (observed: SortMergeJoin Inner per round in the PageRank /
  * k-core / LPA loops). The operators, however, KNOW the state row count
  * (they count it to drive the loop), so they can make the guide's §3.1
  * "explicit hint when you know a side is small" decision exactly.
  *
  * `bcastIf(df, rows)` applies the broadcast hint iff `rows` is at or
  * below `spark.graft.broadcast.maxRows` (default 2,000,000 — node-state
  * rows here are 8–32 bytes, so the built relation stays well under the
  * "few hundred MB is fine" band and far from the 8 GB / 512M-row hard
  * cap). The gate is SCALE-ADAPTIVE, not bench-tuned: at 10^9+-node
  * production scale the count exceeds the gate and the operator keeps its
  * shuffle-join round unchanged; set the conf to 0 to force that path.
  * A broadcast hint never changes join RESULTS, only the strategy. */
object Hints {
  val MaxRowsKey = "spark.graft.broadcast.maxRows"

  def maxRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(MaxRowsKey, "2000000").toLong

  /** Broadcast-hint `ds` when the caller-known `rows` count is within the
    * configured gate; identity otherwise. */
  def bcastIf[T](ds: Dataset[T], rows: Long): Dataset[T] =
    if (rows >= 0 && rows <= maxRows(ds.sparkSession)) broadcast(ds) else ds
}
