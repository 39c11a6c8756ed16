package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chance-corrected categorical agreement — Cohen's κ (Cohen 1960), the
  * number every labeling effort reports before its ground truth is
  * trusted: raw percent agreement flatters skewed label sets (two
  * annotators who both say "text" 90% of the time agree 82% by luck);
  * κ subtracts the chance floor. In this engine it grades the
  * language-ID predictor against the corpus's labeled `lang` (q161) and
  * generalizes to any (label_a, label_b) pair — double annotation,
  * model-vs-gold, extractor-vs-extractor.
  *
  * EXACT arithmetic until one final division (the q150 discipline):
  * from the confusion counts n_ij,
  *   κ = (n·Σn_ii − Σ_i r_i·c_i) / (n² − Σ_i r_i·c_i)
  * — numerator and denominator are exact longs (marginal products),
  * the quotient is the ONLY float op, replayed literally by the oracle.
  *
  * Scale: one (a,b)-keyed count aggregate (map-side combined; cells ≤
  * label-alphabet², not row-scale) + cell-scale marginal joins. */
object Agreement {

  /** rows with either label null are excluded (an unlabeled item can't
    * witness agreement or disagreement). Output one row:
    * (n, n_agree, chance_num, kappa) with chance_num = Σ r_i·c_i. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("nij"))
    val rows = cells.groupBy("a").agg(sum("nij").as("ri"))
    val cols = cells.groupBy("b").agg(sum("nij").as("ci"))
    val chance = rows.join(cols, rows("a") === cols("b"))
      .agg(coalesce(sum(col("ri") * col("ci")), lit(0L)).as("chance_num"))
    cells.agg(sum("nij").as("n"),
        sum(when(col("a") === col("b"), col("nij")).otherwise(0L))
          .as("n_agree"))
      .crossJoin(broadcast(chance))
      .select(col("n"), col("n_agree"), col("chance_num"),
        // pe = 1 (all mass in one marginal cell) makes κ 0/0 — undefined,
        // reported as null rather than a fabricated 1.0
        when(col("n") * col("n") - col("chance_num") =!= 0,
          round((col("n") * col("n_agree") - col("chance_num"))
              .cast("double") /
            (col("n") * col("n") - col("chance_num")).cast("double"), 6))
          .as("kappa"))
  }
}
