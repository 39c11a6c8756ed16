package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ENUMERATION primitives — contiguous global row numbers and
  * exclusive prefix sums in a total key order, without ever moving the
  * data through one partition (the trap in `Window.orderBy(...)` with no
  * partition key, which Spark executes as a single-task sort).
  *
  * Shape (the classic two-pass scan): range-partition by the key, compute
  * each partition's local aggregate, collect ONE ROW PER PARTITION to the
  * driver (bounded by the partition count, never by the data), turn those
  * into per-partition starting offsets, and broadcast them back beside a
  * per-partition local scan. Used by `SuffixArray` for the per-round
  * dense re-rank (the distributed zipWithIndex) and for global character
  * offsets of a concatenated corpus.
  *
  * Keys must be DISTINCT per row: with duplicate keys the range
  * partitioner may split a tie group across partitions and the local scan
  * would order the tie arbitrarily. Callers rank distinct combinations
  * and join back (which also makes the result a DENSE rank). */
object Enumerate {

  /** Exclusive prefix sum of `value` in ascending `key` order:
    * returns the input columns plus `out` = sum of `value` over all rows
    * with a strictly smaller key. Keys must be globally distinct. */
  def prefixSums(df: DataFrame, key: Column, value: Column,
      out: String = "prefix_sum", numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyed = df.withColumn("__k", key).withColumn("__v",
      value.cast("long"))
    val ranged = graft.Materialize(
      keyed.repartitionByRange(parts, col("__k"))
        .withColumn("__pid", spark_partition_id()), eager = false)
    // pass 1: one row per partition (driver state = partition count)
    val totals = ranged.groupBy("__pid")
      .agg(sum("__v").as("__tot")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L) {
      case (acc, p) => acc + totals.getOrElse(p, 0L)
    }
    val offDf = broadcast(spark.createDataFrame(
      (0 until parts).map(p => (p, offsets(p)))).toDF("__pid", "__off"))
    // pass 2: local scan inside each range partition + broadcast offset
    val local = sum(col("__v")).over(
      Window.partitionBy(col("__pid")).orderBy(col("__k"))
        .rowsBetween(Window.unboundedPreceding, -1))
    ranged.join(offDf, Seq("__pid"))
      .withColumn(out, coalesce(local, lit(0L)) + col("__off"))
      .drop("__pid", "__k", "__v", "__off")
  }

  /** Contiguous 0-based global row number in ascending `key` order — the
    * distributed zipWithIndex. Keys must be globally distinct (rank
    * distinct combinations, then join back: that is a dense rank). */
  def rowNumber(df: DataFrame, key: Column, out: String = "row_num",
      numParts: Int = 0): DataFrame =
    prefixSums(df, key, lit(1L), out, numParts)
}
