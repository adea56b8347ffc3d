package graft

/** Guards the driver contract: every query has oracle SQL under the
  * same key (the driver's compare joins on name), and the flagship
  * entry returns rows on the smoke scale factor. */
class ContractSpec extends SparkSpec {

  // EVERY query has a value oracle: since the r14 engine-native HLL
  // replaced the Datasketches estimate behind llm_sketch_profile (the
  // historical lone rows-only row), the suite is 100% hash-checkable
  // and this alignment is exact — no exemption list.
  test("queries and oracleSql keys align") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"mismatch: ${SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)} / " +
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
