package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries cover the reference's operator inventory (SURVEY.md §2,
  * CoreQueries) and the LLM-training-data operators (LlmQueries); each
  * has DuckDB oracle SQL over the same parquet tables. Column names are
  * aliased identically on both sides; float aggregates go through exact
  * decimal casts so hashes match (see CoreQueries scaladoc). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. W1 — dedup keep-latest-per-key over events
    * (user_transformer.py:236-320). */
  def entry(spark: SparkSession): DataFrame =
    queries("w1_dedup_keep_latest")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    (_root_.graft.queries.CoreQueries.queries ++
      _root_.graft.queries.LlmQueries.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  val oracleSql: Map[String, String] =
    (_root_.graft.queries.CoreQueries.oracle ++
      _root_.graft.queries.LlmQueries.oracle).toMap
}
