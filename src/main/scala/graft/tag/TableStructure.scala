package graft.tag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational (window-based) forms of the reference's ordered-geometry
  * operators — the scalable shapes of SURVEY.md §2.5 for span tables that
  * are too wide for per-row array HOFs:
  *
  *  - W1 reading order: row_number over (y_center, x_center)
  *  - W2 row grouping (row_tolerance 15, geometry_utils.py:260-319):
  *    lag/cumsum sessionization over y
  *  - W3 column layout (threshold 100, min 3/column,
  *    geometry_utils.py:207-257): same pattern over x
  *  - F12 region envelope (ocr_integration.py:169-183): min/max per group
  *
  * All need ONE shuffle (partitionBy doc_id); the greedy anchored grouping
  * of the reference is reproduced exactly when adjacent rows are separated
  * by more than the tolerance — true of printed tables by construction.
  *
  * Input: a flat span table with (doc_id, offset, xc, yc) columns.
  */
object TableStructure {

  private def byDoc = Window.partitionBy("doc_id")

  /** W1 — reading order ordinal (0-based), deterministic tie-break by
    * offset (SURVEY.md §7.4 risk 4). */
  def withReadingOrder(spans: DataFrame): DataFrame =
    spans.withColumn("reading_order",
      row_number().over(byDoc.orderBy(col("yc").asc, col("xc").asc, col("offset").asc)) - 1)

  /** W2 — table-row ids via y sessionization. */
  def withRowIds(spans: DataFrame, rowTolerance: Double = 15.0): DataFrame = {
    val w = byDoc.orderBy(col("yc").asc, col("xc").asc, col("offset").asc)
    spans
      .withColumn("prev_yc", lag("yc", 1).over(w))
      .withColumn("new_row",
        when(col("prev_yc").isNull || col("yc") - col("prev_yc") > rowTolerance, 1).otherwise(0))
      .withColumn("row_id", sum("new_row").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("prev_yc", "new_row")
  }

  /** W3 — column ids via x sessionization (column_threshold 100). */
  def withColumnIds(spans: DataFrame, colThreshold: Double = 100.0): DataFrame = {
    val w = byDoc.orderBy(col("xc").asc, col("yc").asc, col("offset").asc)
    spans
      .withColumn("prev_xc", lag("xc", 1).over(w))
      .withColumn("new_col",
        when(col("prev_xc").isNull || col("xc") - col("prev_xc") > colThreshold, 1).otherwise(0))
      .withColumn("col_id", sum("new_col").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("prev_xc", "new_col")
  }

  /** Table summary per doc: rows, max columns per row, regularity flag
    * (geometry_utils.py detect_table_structure output shape). */
  def tableSummary(spans: DataFrame, rowTolerance: Double = 15.0): DataFrame =
    withRowIds(spans, rowTolerance)
      .groupBy("doc_id", "row_id").agg(count(lit(1)).as("cells"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_rows"),
        max("cells").as("n_cols"),
        (countDistinct("cells") === 1).as("is_regular"))

  /** W3 column-layout summary with the reference's membership rules
    * (geometry_utils.py:207-257 `detect_column_layout`): x-sessionized
    * columns (consecutive-gap threshold — same recurrence as
    * withColumnIds), then columns with fewer than `minPerColumn` elements
    * are DROPPED, except the FINAL short column, which merges into the
    * last kept column (reference quirks reproduced: fewer than
    * `minPerColumn` elements in total → one catch-all column; ALL columns
    * short → zero columns, because the merge target list is empty).
    * Returns (doc_id, n_columns). */
  def columnLayout(spans: DataFrame, colThreshold: Double = 100.0,
      minPerColumn: Int = 3): DataFrame = {
    val sizes = withColumnIds(spans, colThreshold)
      .groupBy("doc_id", "col_id").agg(count(lit(1)).as("n"))
    sizes.groupBy("doc_id")
      .agg(
        sum("n").as("total"),
        sum(when(col("n") >= minPerColumn, 1).otherwise(0)).as("kept"))
      .select(col("doc_id"),
        when(col("total") < minPerColumn, lit(1)) // early return: all in one column
          .otherwise(col("kept")) // final short col merges (count unchanged); all-short → 0
          .cast("int").as("n_columns"))
  }

  /** REFERENCE-EXACT greedy table-structure detection
    * (geometry_utils.py:260-319 `detect_table_structure`): rows are built by
    * popping the first remaining element and absorbing every later element
    * whose y-center is within `rowTolerance` OF THE SEED (not of the row's
    * running span — the quirk that splits interleaved rows differently from
    * the sessionization form above; TableStructureSpec pins one case).
    * cols = max row length; is_regular = every row has the first row's
    * length. One narrow mapPartitions per doc — the in-row greedy is
    * O(spans²) on tens of spans. */
  def detectStructureGreedy(docs: org.apache.spark.sql.Dataset[graft.model.OcrDoc],
      rowTolerance: Double = 15.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { d =>
      val ys = d.spans.sortBy(_.offset).map(s => s.bbox.y + s.bbox.h / 2.0).toArray
      val assigned = Array.fill(ys.length)(false)
      val rowLens = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < ys.length) {
        if (!assigned(i)) {
          assigned(i) = true
          var len = 1
          var j = i + 1
          while (j < ys.length) {
            if (!assigned(j) && math.abs(ys(j) - ys(i)) <= rowTolerance) {
              assigned(j) = true; len += 1
            }
            j += 1
          }
          rowLens += len
        }
        i += 1
      }
      val nRows = rowLens.length
      val nCols = if (rowLens.isEmpty) 0 else rowLens.max
      val isRegular = rowLens.isEmpty || rowLens.forall(_ == rowLens.head)
      (d.doc_id, nRows, nCols, isRegular)
    }).toDF("doc_id", "n_rows", "n_cols", "is_regular")
  }

  /** F12 — envelope bbox per group of rects (min/max aggregation). */
  def envelope(spans: DataFrame, groupCols: Seq[String],
      x: Column, y: Column, x2: Column, y2: Column): DataFrame =
    spans.groupBy(groupCols.map(col): _*)
      .agg(min(x).as("min_x"), min(y).as("min_y"),
        max(x2).as("max_x"), max(y2).as("max_y"))
}
