package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Surface-form dictionary (alias table): per canonical entity, the
  * top-k observed surface forms with counts and frequency share — the
  * KG-construction artifact entity linking reads at lookup time
  * ("ACME S.A.R.L" / "acme sarl" / "ACME" → vendor:123) and the
  * complement of [[Survivorship]] (which keeps ONE value; the alias
  * table keeps the ranked distribution so the linker can match ANY
  * known form and weight by evidence).
  *
  * Shape: one (entity, form) count aggregate (the only row-scale
  * exchange, map-side combined), then a per-entity sum + rank window
  * riding one entity-keyed exchange at alias scale. Rank is
  * deterministic: count desc, form asc (a pure function of the mention
  * multiset — layout/cluster-independent). share = n / total over ALL
  * the entity's mentions (not just the kept k, so a truncated tail
  * still shows in the shares summing < 1). Null entities/forms drop.
  *
  * Output: (entity, form, n, share@6dp, rank), rank 1..k per entity.
  */
object AliasTable {

  def build(mentions: DataFrame, entityCol: String, formCol: String,
      k: Int = 10): DataFrame = {
    require(k > 0, "AliasTable.build: k must be > 0")
    val counts = mentions
      .where(col(entityCol).isNotNull && col(formCol).isNotNull)
      .groupBy(col(entityCol).as("entity"), col(formCol).as("form"))
      .agg(count(lit(1)).as("n"))
    val wSum = org.apache.spark.sql.expressions.Window.partitionBy("entity")
    val wRank = org.apache.spark.sql.expressions.Window.partitionBy("entity")
      .orderBy(col("n").desc, col("form").asc)
    counts
      .withColumn("__tot", sum(col("n")).over(wSum))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select(col("entity"), col("form"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("share"),
        col("rank").cast("long").as("rank"))
  }
}
