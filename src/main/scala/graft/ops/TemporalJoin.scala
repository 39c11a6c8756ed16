package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and interval (range) joins — the two join shapes a temporal KG /
  * invoice pipeline needs that Spark has no native operator for: "which
  * exchange rate / tax rule / customer tier was IN FORCE when this invoice
  * was issued" (as-of), and "which promo window / amount band does this
  * event fall inside" (point-in-interval). Both are expressed so the plan
  * never degenerates into the O(|L|·|R|) theta join Catalyst would pick
  * for a raw inequality condition.
  *
  * === asofJoin ===
  *
  * For every left row, the single right row with the same key and the
  * LARGEST right timestamp ≤ the left timestamp (ties at equal timestamps
  * match — DuckDB/pandas `ASOF JOIN` semantics; kdb's aj). Implemented as
  * the sorted MERGE, not a join: union the two sides tagged, window by key
  * ordered by (ts, side) with rights sorting before lefts at equal ts, and
  * carry the last non-null right payload forward (`last(_, ignoreNulls)`
  * over an unbounded-preceding running frame — Spark evaluates that frame
  * incrementally, one pass per partition). Cost: ONE shuffle of L ∪ R on
  * the key, then a per-key sort — exactly the sort-merge-join floor, zero
  * row expansion. The window state is a single carried struct regardless
  * of how many right rows precede a left row.
  *
  * Skew note: a mega-key's rows land in one window partition (order-
  * dependent carry-forward cannot salt); WindowExec spills its buffered
  * partition to disk, so a hot key degrades to sequential I/O, not OOM.
  * If the right side is a small dimension (rate tables are), prefer
  * broadcasting it into `intervalJoin` form instead (validity intervals).
  *
  * === intervalJoin ===
  *
  * All (left, right) pairs where a left POINT falls in a right interval
  * [lo, hi). Right intervals may overlap (a point can match many) and the
  * pairing is exact. Implemented by BUCKETIZING: pick a width `w`, explode
  * each interval to the integer buckets it covers (`sequence(floor(lo/w),
  * floor(hi/w))`), equi-join on the point's bucket, then apply the exact
  * residual predicate. Each matching pair is produced exactly once (the
  * point's bucket is unique, and an interval lists each covered bucket
  * once), so no dedup pass. Cost: an equi join whose build side carries
  * ⌈len/w⌉+1 rows per interval — choose `w` near the median interval
  * length so the blow-up is ~2× and the join stays hash/broadcast-able;
  * a raw `l.p >= r.lo && l.p < r.hi` condition would be a
  * BroadcastNestedLoopJoin scanning every interval for every point.
  */
object TemporalJoin {

  import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

  /** Numeric view of a temporal-or-numeric column for bucketing/tolerance
    * arithmetic: timestamps become epoch seconds (double, sub-second kept).
    * TIMESTAMP_NTZ has no direct double cast; routing it through
    * TIMESTAMP_LTZ applies the session timezone — a fixed offset that
    * cancels out because BOTH sides of a comparison go through the same
    * conversion (and sessions pin UTC anyway: run/Sessions). */
  private def asNum(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType | DateType => c.cast(TimestampType).cast("double")
    case _ => c.cast("double")
  }

  /** Left as-of join. Every left row is kept; matched right payload
    * columns are null when no right row with `rTs <= lTs` exists for the
    * key (tolerance: a match older than `tolerance` is also nulled).
    *
    * Output = all left columns + `rightCols` (right payload, renamed as
    * given) + `asofTsCol` (the matched right timestamp, null on no match).
    *
    * Right rows must be unique per (key, ts) — enforce upstream (e.g.
    * max-aggregate concurrent updates); with duplicates the carried winner
    * would depend on partition order, breaking the determinism contract.
    *
    * @param leftTs / rightTs timestamp columns, any orderable type; they
    *        are compared after cast to long via unix timestamp for
    *        timestamps, or used raw for numerics (caller aligns types).
    * @param tolerance max allowed (leftTs - rightTs) in the timestamp's
    *        own unit AFTER cast to double; None = unbounded lookback.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      asofTsCol: String = "asof_ts",
      tolerance: Option[Double] = None): DataFrame = {
    require(key.nonEmpty, "asofJoin: at least one key column")
    require(rightPayload.nonEmpty, "asofJoin: right payload columns required")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains(asofTsCol),
      s"asofJoin: left already has a '$asofTsCol' column")
    val collide = rightPayload.toSet.intersect(leftCols.toSet)
    require(collide.isEmpty,
      s"asofJoin: right payload collides with left columns: ${collide.mkString(",")}")
    require(!rightPayload.contains(asofTsCol),
      s"asofJoin: right payload contains the output column '$asofTsCol'")
    require(!rightPayload.contains(rightTs),
      s"asofJoin: '$rightTs' is emitted as '$asofTsCol' — do not repeat it in the payload")

    // NULL semantics = the DuckDB/kdb ASOF contract the q83 oracle pins:
    // null timestamps and null keys never MATCH. Right rows with a null
    // ts/key drop here (a null __ts would sort NULLS FIRST and be carried
    // as a sticky bogus match); left rows with a null ts/key bypass the
    // merge entirely and come back below with null match columns (left
    // join keeps every left row).
    def nonNull(ts: String): Column =
      key.map(col(_).isNotNull).reduce(_ && _) && col(ts).isNotNull
    val rightOk = right.where(nonNull(rightTs))
    val leftOk = left.where(nonNull(leftTs))
    val leftBad = left.where(!nonNull(leftTs))

    // one struct carries ts + payload so a single last() tracks the match
    val rStruct = struct((col(rightTs) +: rightPayload.map(col)): _*)
    val l = leftOk.select(
      (key.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(
          right.select(rStruct).schema.head.dataType).as("__r")): _*)
    val r = rightOk.select(
      (key.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(
          left.select(struct(leftCols.map(col): _*)).schema.head.dataType)
          .as("__l") :+ rStruct.as("__r")): _*)

    // rights sort before lefts at equal ts => ties match (ASOF >= rule)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val tsType = left.schema(leftTs).dataType
    val inTol = tolerance match {
      case Some(t) => col("__m").isNotNull &&
        (asNum(col("__ts"), tsType) -
          asNum(col("__m").getField(rightTs),
            right.schema(rightTs).dataType)) <= t
      case None => col("__m").isNotNull
    }
    val matched = when(inTol, col("__m"))
    val merged = carried.select(
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        (matched.getField(rightTs).as(asofTsCol) +:
          rightPayload.map(c => matched.getField(c).as(c))): _*)
    // left rows with null ts/key re-enter unmatched (left-join contract)
    val nullMatch = lit(null).cast(
      right.select(rStruct).schema.head.dataType)
    merged.unionByName(leftBad.select(
      leftCols.map(col) ++
        (nullMatch.getField(rightTs).as(asofTsCol) +:
          rightPayload.map(c => nullMatch.getField(c).as(c))): _*))
  }

  /** Coalesce overlapping-or-touching [lo, hi) intervals per key into
    * maximal disjoint intervals — the temporal-validity normalizer (a
    * fact's validity periods unioned across sources; a user's error-state
    * uptime; sensor on-windows) run before any duration sum, which would
    * otherwise double-count overlaps.
    *
    * One pass: per-key window ordered by (lo, hi), a running max of the
    * preceding hi marks where a new chain starts (lo > maxSoFar), the
    * running count of starts is the chain id, one (key, chain) aggregate
    * emits (lo = min lo, hi = max hi). Degenerate (lo >= hi), null-interval
    * and null-KEY rows drop (unrelated null keys must not merge into one
    * bogus group — the asofJoin null fence). ONE exchange total: the
    * window's key shuffle, which the (key, chain) aggregate reuses (its
    * required distribution is satisfied by hash(key)) — the sort-merge
    * floor for an order-dependent merge. Skew: a mega-key buffers in
    * WindowExec, which spills; running frames evaluate incrementally.
    *
    * Output: (key..., lo, hi, n_merged) — n_merged counts the source
    * intervals folded into each maximal interval. Touching intervals
    * ([1,3) + [3,5)) MERGE (their union is one contiguous period;
    * half-open semantics make 3 covered exactly once).
    */
  def mergeIntervals(df: DataFrame, key: Seq[String],
      lo: String, hi: String): DataFrame = {
    require(key.nonEmpty, "mergeIntervals: at least one key column")
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(lo).asc, col(hi).asc)
    val prevMax = max(col(hi)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val chained = df
      .where(key.map(col(_).isNotNull).reduce(_ && _) &&
        col(lo).isNotNull && col(hi).isNotNull && col(lo) < col(hi))
      .withColumn("__new", when(prevMax.isNull || col(lo) > prevMax, 1)
        .otherwise(0))
      .withColumn("__chain", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    chained.groupBy((key.map(col) :+ col("__chain")): _*)
      .agg(min(col(lo)).as(lo), max(col(hi)).as(hi),
        count(lit(1)).as("n_merged"))
      .drop("__chain")
  }

  /** Inner point-in-interval join: left rows paired with every right
    * interval [lo, hi) containing `point`. Output = left columns +
    * `rightCols` from the interval side. `width` is the bucket size in the
    * point column's own numeric unit (cast to double internally).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      point: String, lo: String, hi: String,
      rightCols: Seq[String], width: Double): DataFrame = {
    require(width > 0, "intervalJoin: width must be > 0")
    require(rightCols.nonEmpty, "intervalJoin: right output columns required")
    val overlap = rightCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin: right columns collide with left: ${overlap.mkString(",")}")
    val bucket = (c: Column, dt: DataType) =>
      floor(asNum(c, dt) / width).cast("long")
    val loType = right.schema(lo).dataType
    val r = right
      .where(col(lo).isNotNull && col(hi).isNotNull && col(lo) < col(hi))
      .select((col(lo).as("__lo") +: col(hi).as("__hi") +:
        rightCols.map(col)): _*)
      // [lo, hi) half-open: hi on a bucket boundary contributes no rows to
      // its own bucket beyond what the residual filter discards anyway
      .withColumn("__b", explode(sequence(bucket(col("__lo"), loType),
        bucket(col("__hi"), right.schema(hi).dataType))))
    left
      .where(col(point).isNotNull)
      .withColumn("__b", bucket(col(point), left.schema(point).dataType))
      .join(r, Seq("__b"))
      .where(col(point) >= col("__lo") && col(point) < col("__hi"))
      .drop("__b", "__lo", "__hi")
  }
}
