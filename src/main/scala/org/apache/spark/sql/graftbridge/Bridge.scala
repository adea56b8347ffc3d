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

  /** `might_contain(bloom_filter_agg(keys.keyCol), value)` — the
    * runtime-filter building blocks Spark keeps internal (its
    * InjectRuntimeFilter rule plants them only under join-specific
    * heuristics), exposed as an explicit Column for semi-join pruning
    * at operator level. The Bloom filter is built DISTRIBUTED by a
    * `BloomFilterAggregate` over `keys` and shipped into the outer
    * query as a scalar subquery — exactly the mechanism
    * InjectRuntimeFilter uses — so the exact key set is never
    * collected; only the fixed-size filter (`numBits`/8 bytes,
    * independent of |keys|) crosses the driver. False positives at
    * the configured rate, false negatives never: the result is a
    * guaranteed superset of `value IN (keys)`, so an exact equi-join
    * on the survivors reproduces the exact semi-join while the filter
    * prunes map-side, BEFORE any exchange. */
  def bloomMightContain(keys: org.apache.spark.sql.DataFrame, keyCol: String,
                        estItems: Long, numBits: Long, value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = column(new BloomFilterAggregate(expression(keys.col(keyCol)),
      Literal(estItems), Literal(numBits)).toAggregateExpression())
    val one = keys.groupBy().agg(agg.as("__bloom"))
    column(BloomFilterMightContain(ScalarSubquery(one.queryExecution.analyzed),
      expression(value)))
  }

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
