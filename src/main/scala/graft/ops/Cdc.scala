package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a (key, ts, op ∈ {I, U, D}, payload)
  * change feed onto a base snapshot and emit the resulting state — the
  * batch form of maintaining a mirrored dimension (vendor master,
  * gazetteer, registry) that the KG joins against, without replaying
  * history row by row.
  *
  * Semantics: per key, the LATEST change wins — ordered by (ts desc,
  * op asc, payload desc) so a same-instant I/U/D conflict resolves
  * deterministically (D ranks first at equal ts: a delete-and-reinsert
  * at the same instant deletes — the rule is pinned rather than left to
  * layout). Base
  * rows participate as ts = -∞ upserts, so a key never touched by the
  * feed survives unchanged. Keys whose final op is D disappear.
  *
  * Scale: ONE exchange — the union shuffles once on hash(key) for the
  * argmax window (bounded frame, rank-1 cut); no join of base × feed,
  * no per-key iteration. The feed's history depth per key only deepens
  * the per-key sort run (spills). Null keys/ts drop; null ops are
  * invalid and fail loudly (a silent default would corrupt the mirror).
  */
object Cdc {

  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      tsCol: String, opCol: String, payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.applyChanges: keyCols must be non-empty")
    require(payloadCols.nonEmpty, "Cdc.applyChanges: payloadCols must be non-empty")
    val k = keyCols.map(col)
    val p = payloadCols.map(col)

    val feed = changes
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(k ++ Seq(col(tsCol).cast("double").as("__ts"),
        upper(col(opCol)).as("__op")) ++ p: _*)
    val baseRows = base
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(k ++ Seq(lit(Double.NegativeInfinity).as("__ts"),
        lit("I").as("__op")) ++ p: _*)

    val all = baseRows.unionAll(feed)
      .withColumn("__op", when(col("__op").isin("I", "U", "D"), col("__op"))
        .otherwise(raise_error(concat(lit("Cdc.applyChanges: invalid op "),
          coalesce(col("__op"), lit("NULL"))))))

    val w = Window.partitionBy(k: _*)
      .orderBy(col("__ts").desc, col("__op").asc,
        struct(p: _*).desc_nulls_last)
    all.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1 && col("__op") =!= "D")
      .select(k ++ p: _*)
  }

  /** The inverse of [[applyChanges]]: diff two snapshots of a keyed
    * table and emit the change feed that turns `oldDf` into `newDf` —
    * what an incremental pipeline ships downstream instead of the full
    * mirror (net-change computation; the Delta/Hudi "merge source"
    * shape). Per key: only-in-new → I, only-in-old → D, in both with a
    * different payload → U; identical rows emit NOTHING (the whole
    * point — the feed is change-scale, not table-scale). D rows carry
    * null payload (the payload no longer exists).
    *
    * One full-outer join on hash(key) is the only exchange; payload
    * equality is a single null-safe struct compare (inner nulls compare
    * as values, so a null→value transition is a U, not a drop). Caller
    * contract (same as applyChanges): one row per key per snapshot;
    * null keys drop. Round-trip law (spec-asserted):
    * `applyChanges(old, diff(old, new)) == new`. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.diff: keyCols must be non-empty")
    require(payloadCols.nonEmpty, "Cdc.diff: payloadCols must be non-empty")
    def side(df: DataFrame, tag: String) = df
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(struct(keyCols.map(col): _*).as(s"__k$tag"),
        struct(payloadCols.map(col): _*).as(s"__p$tag"))
    val joined = side(oldDf, "o")
      .join(side(newDf, "n"), col("__ko") === col("__kn"), "full_outer")
    val op = when(col("__ko").isNull, "I")
      .when(col("__kn").isNull, "D")
      .when(!(col("__po") <=> col("__pn")), "U")
    val key = coalesce(col("__kn"), col("__ko"))
    joined.withColumn("op", op).where(col("op").isNotNull)
      .select(keyCols.map(c => key.getField(c).as(c)) ++
        Seq(col("op")) ++
        payloadCols.map(c => col("__pn").getField(c).as(c)): _*)
  }
}
