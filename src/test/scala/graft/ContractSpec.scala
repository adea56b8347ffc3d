package graft

/** Guards the driver contract: every query has oracle SQL under the
  * same key (the driver's compare joins on name), and the flagship
  * entry returns rows on the smoke scale factor. */
class ContractSpec extends SparkSpec {

  // Queries with no SQL-expressible oracle (the driver records a
  // weaker rows-only check for these). Keep this list SHORT and
  // justified: currently only the HLL-sketch profile, whose estimate
  // DuckDB cannot replay (different HLL implementation). The query
  // projects ONLY (source, est_distinct) — its exact columns are
  // hash-checked separately as llm_sketch_counts, so nothing
  // oracle-checkable hides behind the rows-only row — and the
  // estimate's mergeability contract is proven in OrderStatsSpec.
  private val rowsOnlyQueries = Set("llm_sketch_profile")

  test("queries and oracleSql keys align") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.queries.keySet -- rowsOnlyQueries == SparkEntry.oracleSql.keySet,
      s"mismatch: ${(SparkEntry.queries.keySet -- rowsOnlyQueries).diff(SparkEntry.oracleSql.keySet)} / " +
        s"${SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)}")
  }

  test("entry (flagship W1) returns rows on sf0.001") {
    assert(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "smoke data missing — environment issue, not a code issue")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL strings are single statements") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.trim.endsWith(";"), s"$k ends with a semicolon")
      // quoted ';' literals are fine; a semicolon outside quotes is not
      val noStrings = sql.replaceAll("'(?:[^']|'')*'", "''")
      assert(!noStrings.contains(";"), s"$k contains a statement separator")
      assert(sql.trim.toUpperCase.startsWith("SELECT") || sql.trim.toUpperCase.startsWith("WITH"), k)
    }
  }
}
