package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 made Column a ColumnNode wrapper and hid the Expression
  * constructors behind `org.apache.spark.sql.classic.ExpressionUtils`
  * (private[sql]). Libraries that ship native Catalyst expressions need
  * exactly these two conversions to expose a Column API that works on ANY
  * SparkSession — without forcing users to install SparkSessionExtensions
  * or to look functions up by registered name (`call_function` fails with
  * UNRESOLVED_ROUTINE on vanilla sessions). Living in the
  * `org.apache.spark.sql` namespace is the established pattern for this
  * (same technique as frameless / deequ); the surface is intentionally
  * these two methods only.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into the `private[sql]` session-cloning surface: a DataFrame
  * rebased onto an isolated CLONE of its session (same SparkContext and
  * shared state, a COPY of all SQL confs / UDFs / temp views). Needed by
  * operators that must flip a session conf read at streaming-query start
  * (`Streams.neardupStream` disables the stateful-operator correctness
  * check its chained flatMapGroupsWithState stages cannot satisfy
  * statically) WITHOUT mutating the caller's session for every unrelated
  * query started afterwards. */
object SessionBridge {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** (cloned session, df rebound onto it). Conf changes on the clone are
    * invisible to the original session. */
  def onClonedSession(df: DataFrame): (SparkSession, DataFrame) = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val clone = classic.cloneSession()
    (clone, org.apache.spark.sql.classic.Dataset.ofRows(clone, df.queryExecution.logical))
  }
}
