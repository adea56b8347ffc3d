package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (columnNodeSupport). Extensions that define native Catalyst
  * expressions need exactly this bridge, so expose it from inside the
  * sql package namespace — the standard pattern for Spark extension
  * libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully CONVERT a Column's node tree to a resolved-able Catalyst
    * expression. `expression` merely wraps the node (fine inside a
    * DataFrame, where analysis converts it later); an expression
    * returned from a FunctionRegistry builder is never node-converted,
    * so wrapper nodes would reach codegen as Unevaluable. Needed to
    * register Column-combinator functions for SQL. */
  def convert(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Release the cached blocks behind a `localCheckpoint()`ed Dataset.
    * `Dataset.unpersist` only reaches CacheManager entries, not the
    * RDD cache a local checkpoint lives in; iterative algorithms that
    * checkpoint each round's frontier need this to drop superseded
    * frontiers instead of pinning every round's blocks until GC.
    * No-op on anything that is not a checkpoint result. The data is
    * gone after this — only call once nothing references the Dataset. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
