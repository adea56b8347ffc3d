package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (single JVM across the test run;
  * never stopped so suites can share it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sqlDf(rows: Seq[String], schema: String): org.apache.spark.sql.DataFrame = {
    val values = rows.mkString(", ")
    spark.sql(s"SELECT * FROM VALUES $values AS t($schema)")
  }
}
