package graft

import graft.fixtures.InvoiceCorpus
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.run.{Extract, Pipeline}
import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), with DuckDB-runnable oracle SQL wherever the operator is
  * deterministically SQL-expressible. Hash/LSH-based operators (minhash,
  * simhash, hyperplane LSH, full KG pipeline) have no oracle entry → driver
  * records the weaker rows-only check; their correctness is gated by
  * ScalaTest suites instead.
  *
  * Column-name discipline: every aggregate/computed column is aliased to the
  * SAME name in the Spark code and the SQL (the driver sorts columns by name
  * before hashing). Doubles are never SUMmed directly — money/measures are
  * cast to DECIMAL first (exact, order-independent) and the result cast back
  * to DOUBLE, so Spark's and DuckDB's different accumulation orders cannot
  * produce last-ulp hash mismatches.
  */
object SparkEntry {

  /** Flagship: KG triples from a small fixture corpus (driver smoke-checks
    * rows > 0 on sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    Extract.triples(InvoiceCorpus.docs(spark, 30).toDF())

  // ======================================================================
  // queries
  // ======================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.entry.Pack1.queries ++ graft.entry.Pack2.queries ++ graft.entry.Pack3.queries ++ graft.entry.Pack4.queries ++ graft.entry.Pack5.queries

  def oracleSql: Map[String, String] =
    graft.entry.Pack1.oracleSql ++ graft.entry.Pack2.oracleSql ++ graft.entry.Pack3.oracleSql ++ graft.entry.Pack4.oracleSql ++ graft.entry.Pack5.oracleSql
}
