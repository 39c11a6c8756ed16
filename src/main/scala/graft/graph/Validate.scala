package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SHACL-style shape validation over a triple graph — the data-quality
  * gate a KG construction pipeline runs before publishing a snapshot:
  * per-predicate cardinality (minCount/maxCount over each focus subject),
  * object-value patterns (datatype/format checks), and object-class
  * membership (the SHACL `sh:class` / RDFS range check — no dangling
  * references). Violations come back as a flat table the pipeline can
  * gate on, count into the run report, or route to quarantine.
  *
  * Scale shape: ONE subject-keyed aggregation covers every cardinality
  * shape (triples filtered to the shaped predicates, groupBy (subj, pred),
  * count) — not one job per shape; the expected (focus × shapes) grid is a
  * broadcast-sized cross join (shapes are a handful of rows) left-joined
  * to the observed counts on (subj, pred). Pattern checks are a narrow
  * filter on the same pre-filtered scan. Class-membership checks are one
  * anti join per classed predicate against the member table — entity-scale
  * inputs, never doc-scale. Nothing collects to the driver.
  */
object Validate {

  /** One shape = constraints for one predicate.
    * @param objPattern anchored regex the object must match (every
    *   occurrence is checked; violations report the offending object)
    * @param objIn member table for the object class (single column
    *   `member`); objects absent from it are `dangling_object` violations */
  final case class Shape(
      pred: String,
      minCount: Int = 0,
      maxCount: Int = Int.MaxValue,
      objPattern: Option[String] = None,
      objIn: Option[DataFrame] = None)

  /** Validate `triples` (subj, pred, obj) for every subject of `focus`
    * (single column `subj` — the shape's target class) against `shapes`.
    * Returns (subj, pred, code, detail): code ∈ {min_count, max_count,
    * pattern, dangling_object}; detail = the observed count (cardinality
    * codes) or the offending object value. */
  def validate(focus: DataFrame, triples: DataFrame, shapes: Seq[Shape]): DataFrame = {
    require(shapes.nonEmpty, "validate: at least one shape")
    require(shapes.map(_.pred).distinct.length == shapes.length,
      "validate: one shape per predicate")
    val spark = triples.sparkSession
    import spark.implicits._

    val shaped = triples.where(col("pred").isin(shapes.map(_.pred): _*))
    val counts = shaped.groupBy("subj", "pred").agg(count(lit(1)).as("n"))
    val grid = focus.select(col("subj").cast("string").as("subj"))
      .crossJoin(broadcast(
        shapes.map(sh => (sh.pred, sh.minCount.toLong, sh.maxCount.toLong))
          .toDF("pred", "min_c", "max_c")))
    val observed = grid.join(counts, Seq("subj", "pred"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val cardinality = observed
      .where(col("n") < col("min_c") || col("n") > col("max_c"))
      .select(col("subj"), col("pred"),
        when(col("n") < col("min_c"), lit("min_count")).otherwise(lit("max_count")).as("code"),
        col("n").cast("string").as("detail"))

    val pattern = shapes.collect { case sh if sh.objPattern.isDefined =>
      shaped.where(col("pred") === sh.pred && !col("obj").rlike(sh.objPattern.get))
        .select(col("subj"), col("pred"), lit("pattern").as("code"), col("obj").as("detail"))
    }
    val dangling = shapes.collect { case sh if sh.objIn.isDefined =>
      shaped.where(col("pred") === sh.pred)
        .join(sh.objIn.get.select(col("member").as("obj")), Seq("obj"), "left_anti")
        .select(col("subj"), col("pred"), lit("dangling_object").as("code"),
          col("obj").as("detail"))
    }
    (Seq(cardinality) ++ pattern ++ dangling).reduce(_.unionByName(_))
  }
}
