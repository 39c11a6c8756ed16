package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survivorship ("golden record"): merge each duplicate group — the
  * output of entity resolution (CC over match edges, dedup groups) —
  * into ONE canonical record by majority vote per field: the most
  * frequent non-null value wins, ties break to the LARGEST value
  * (string order), so the result is a pure function of the group's
  * value multiset — layout/cluster-independent, hash-oracle-able.
  * This is the MDM step between "these records are the same entity"
  * and "this is the entity's row" (the reference keeps whichever
  * record extraction saw last; a vote is the scalable, order-free
  * form of the same intent).
  *
  * Shape: melt the requested fields to (group, field, value) — k narrow
  * projections of the same scan, no row explosion beyond ×k — then ONE
  * (group, field, value) count aggregate, a bounded argmax window on
  * (count desc, value desc), and an EntityTable-style conditional-agg
  * pivot back to one row per group. The count aggregate, the window,
  * and the pivot all hash-cluster by group (the window adds field to
  * the partition key — still group-clustered), so data shuffles once
  * for the votes and once for the final group fold. Values vote as
  * STRINGS (one melt schema for mixed field types — this is a
  * canonicalization report; keep typed columns by joining the winner
  * back if needed). `n_members` counts the group's source rows.
  */
object Survivorship {

  def goldenRecord(df: DataFrame, groupCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord: fields must be non-empty")
    require(fields.distinct == fields, "goldenRecord: fields must be distinct")
    val melted = fields.map { f =>
      df.select(col(groupCol).as("__g"), lit(f).as("__f"),
        col(f).cast("string").as("__v"))
    }.reduce(_ unionAll _).where(col("__g").isNotNull && col("__v").isNotNull)

    val votes = melted.groupBy("__g", "__f", "__v").agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy("__g", "__f")
      .orderBy(col("__n").desc, col("__v").desc)
    val winners = votes.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)

    val pivots = fields.map(f =>
      max(when(col("__f") === f, col("__v"))).as(f))
    val members = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g")).agg(count(lit(1)).as("n_members"))

    winners.groupBy("__g").agg(pivots.head, pivots.tail: _*)
      .join(members, Seq("__g"))
      .withColumnRenamed("__g", groupCol)
  }
}
