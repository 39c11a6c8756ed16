package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-preserving string codec for integral ids — the shared fix for
  * every operator that labels groups by the LEXICOGRAPHIC min/max of a
  * string id (the CC/SCC label machinery): plain zero-padding inverts
  * order within NEGATIVES ('-…1' < '-…2' but -1 > -2), and ids routinely
  * come from xxhash64, which is negative half the time.
  *
  * Encoding: negatives map to "0" ++ pad19(v − Long.MinValue) (a value in
  * [0, 2⁶³), in numeric order) and non-negatives to "1" ++ pad19(v) — all
  * negatives sort before all non-negatives and within each half string
  * order IS numeric order, so lexicographic min/max == numeric min/max
  * everywhere, Long.MinValue included. Both directions are pure codegen
  * Column expressions. */
object Ids {

  def encodeOrdered(c: Column): Column = {
    val l = c.cast("long")
    when(l < 0, concat(lit("0"), format_string("%019d", l - lit(Long.MinValue))))
      .otherwise(concat(lit("1"), format_string("%019d", l)))
  }

  def decodeOrdered(c: Column): Column =
    when(substring(c, 1, 1) === "0",
      substring(c, 2, 19).cast("long") + lit(Long.MinValue))
      .otherwise(substring(c, 2, 19).cast("long"))

  /** True iff every named column is an integral type. */
  def integral(df: org.apache.spark.sql.DataFrame, cols: String*): Boolean =
    cols.forall(c => df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
}
