package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** Table-driven cases lifted from the reference's literal semantics
  * (SURVEY.md §5.2.2): null-token set, FR status variants, the 1e10
  * s/ms boundary, comma-split edges, quote escaping. */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  private def cleanOf(s: String): String =
    spark.createDataset(Seq(Option(s))).toDF("s")
      .select(Exprs.cleanString(col("s")).as("v")).collect()(0).getAs[String]("v")

  test("F7 cleanString: null tokens, case-insensitive, after trim") {
    assert(cleanOf("  hello ") == "hello")
    for (tok <- Seq("nan", "NaN", "NULL", "null", "none", "None", "", "  ", "NaT", "nat"))
      assert(cleanOf(tok) == null, s"token '$tok' must clean to null")
    assert(cleanOf("nanx") == "nanx") // only exact tokens
    assert(cleanOf(null) == null)
  }

  test("F7 cleanString is idempotent") {
    for (s <- Seq("  a ", "nan", "ok", "", "None"))
      assert(cleanOf(if (cleanOf(s) == null) null else cleanOf(s)) == cleanOf(s))
  }

  test("F6 normalizeStatus: 9-entry map incl. French variants, default ACTIVE") {
    val cases = Seq(
      "active" -> "ACTIVE", "ACTIF" -> "ACTIVE", " enabled " -> "ACTIVE",
      "inactive" -> "INACTIVE", "Inactif" -> "INACTIVE", "DISABLED" -> "INACTIVE",
      "banned" -> "BANNED", "banni" -> "BANNED", "Blocked" -> "BANNED",
      "garbage" -> "ACTIVE", null.asInstanceOf[String] -> "ACTIVE")
    for ((in, want) <- cases) {
      val got = spark.createDataset(Seq(Option(in))).toDF("s")
        .select(Exprs.normalizeStatus(col("s")).as("v")).collect()(0).getAs[String]("v")
      assert(got == want, s"normalizeStatus($in)")
    }
  }

  test("F3 parseFlexibleTimestamp: 5 layouts + epoch s/ms heuristic") {
    def parse(s: String): Timestamp =
      spark.createDataset(Seq(Option(s))).toDF("s")
        .select(Exprs.parseFlexibleTimestamp(col("s")).as("v"))
        .collect()(0).getAs[Timestamp]("v")
    assert(parse("2022-07-01 10:40:00") == Timestamp.valueOf("2022-07-01 10:40:00"))
    assert(parse("2022-07-01T10:40:00") == Timestamp.valueOf("2022-07-01 10:40:00"))
    assert(parse("2022-07-01T10:40:00.123456") == Timestamp.valueOf("2022-07-01 10:40:00.123456"))
    assert(parse("2022-07-01T10:40:00Z") == Timestamp.valueOf("2022-07-01 10:40:00"))
    assert(parse("2022-07-01") == Timestamp.valueOf("2022-07-01 00:00:00"))
    // epoch seconds (1656672000 = 2022-07-01T10:40:00Z)
    assert(parse("1656672000") == Timestamp.valueOf("2022-07-01 10:40:00"))
    // > 1e10 => milliseconds (user_transformer.py:141-144)
    assert(parse("1656672000123") == Timestamp.valueOf("2022-07-01 10:40:00.123"))
    // boundary: exactly 1e10 stays seconds (strictly greater switches)
    assert(parse("10000000000") == Timestamp.valueOf("2286-11-20 17:46:40"))
    // non-positive epoch => null (user_transformer.py:145-146)
    assert(parse("0") == null)
    assert(parse("-5") == null)
    // Firebase Timestamp object shape (user_transformer.py:130-135):
    // seconds always, no ms heuristic, nanos ignored
    assert(parse("""{"seconds": 1656672000, "nanoseconds": 250}""") ==
      Timestamp.valueOf("2022-07-01 10:40:00"))
    assert(parse("""{"seconds": 1656672000}""") == Timestamp.valueOf("2022-07-01 10:40:00"))
    // malformed seconds payload => null, not an error
    assert(parse("""{"seconds": "soon"}""") == null)
    assert(parse("""{"nanoseconds": 5}""") == null)
    // null tokens and garbage => null
    assert(parse("nan") == null)
    assert(parse("not a date") == null)
  }

  test("F5 parseInterests: comma-split, trim, drop empties, empty=>null") {
    def parse(s: String): List[String] = {
      val v = spark.createDataset(Seq(Option(s))).toDF("s")
        .select(Exprs.parseInterests(col("s")).as("v")).collect()(0)
      if (v.isNullAt(0)) null else v.getSeq[String](0).toList
    }
    assert(parse("music, sports") == List("music", "sports"))
    assert(parse("a, ,b,,") == List("a", "b"))
    assert(parse("solo") == List("solo"))
    assert(parse(",, ,") == null) // all empties => null, never []
    assert(parse("") == null)
    assert(parse("nan") == null)
    assert(parse(null) == null)
  }

  test("F2 cleanArray: drop nulls, empty => null") {
    val df = spark.sql("SELECT array('a', NULL, 'b') AS full, array(CAST(NULL AS STRING)) AS allnull")
    val r = df.select(
      Exprs.cleanArray(col("full")).as("f"),
      Exprs.cleanArray(col("allnull")).as("n")).collect()(0)
    assert(r.getSeq[String](0).toList == List("a", "b"))
    assert(r.isNullAt(1))
  }

  test("F1 firstNonNull: empty and all-null arrays yield null, never throw (ANSI)") {
    val df = spark.sql(
      "SELECT array('x', NULL) AS some, array(CAST(NULL AS STRING)) AS allnull, " +
        "CAST(array() AS ARRAY<STRING>) AS empty")
    val r = df.select(
      Exprs.firstNonNull(col("some")).as("s"),
      Exprs.firstNonNull(col("allnull")).as("n"),
      Exprs.firstNonNull(col("empty")).as("e")).collect()(0)
    assert(r.getString(0) == "x" && r.isNullAt(1) && r.isNullAt(2))
  }

  test("F9 pgArrayLiteral: quoting, escaping, empty => null") {
    val r = spark.sql("SELECT array('ab', 'o''brien') AS a, array(CAST(NULL AS STRING)) AS e")
      .select(Exprs.pgArrayLiteral(col("a")).as("lit"),
        Exprs.pgArrayLiteral(filter(col("e"), x => x.isNotNull)).as("empty")).collect()(0)
    assert(r.getAs[String]("lit") == "{'ab','o''brien'}")
    assert(r.getAs[String]("empty") == null)
  }

  test("F10/F11/P7/P9/F15 small combinators") {
    assert(one[Boolean](Exprs.cleanBool(lit(null))) == false)
    assert(one[Boolean](Exprs.cleanBool(lit("true"))) == true)
    assert(one[String](Exprs.withDefault(lit(null).cast("string"), lit("CREDENTIALS"))) == "CREDENTIALS")
    assert(one[String](Exprs.placeholderEmail(lit(null).cast("string"), lit("google.com"), lit("u1")))
      == "google_user_u1@placeholder.com")
    assert(one[String](Exprs.placeholderEmail(lit("a@b.c"), lit("google.com"), lit("u1"))) == "a@b.c")
    assert(one[String](Exprs.maskEmail(lit("alice@example.com"))) == "ali***")
    assert(one[Double](Exprs.percent(lit(1L), lit(4L))) == 25.0)
    assert(one[Double](Exprs.percent(lit(1L), lit(0L))) == 0.0)
  }

  test("F12 uuid20 shape; deterministic surrogate is stable") {
    val u = one[String](Exprs.uuid20)
    assert(u.length == 20)
    assert(one[String](Exprs.deterministicKey20(lit("k1")))
      == one[String](Exprs.deterministicKey20(lit("k1"))))
    assert(one[String](Exprs.deterministicKey20(lit("k1"))).length == 20)
  }

  test("F14 isoFormat") {
    assert(one[String](Exprs.isoFormat(lit("2024-01-02 03:04:05").cast("timestamp")))
      == "2024-01-02T03:04:05")
  }
}
