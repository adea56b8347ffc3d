package graft

import org.apache.spark.sql.types._
import graft.io.Tables

/** Environment-drift tripwire (VERDICT r10 §Next-round #2).
  *
  * Round 10 lost 31 oracle rows to a silent image change: Spark 4.1.2
  * started reading `events.parquet`'s TIMESTAMP(NANOS) as
  * TIMESTAMP_NTZ and ignoring `spark.sql.legacy.parquet.nanosAsLong`,
  * so `Tables.read("events")`'s long-arithmetic conversion failed
  * analysis — and nothing in the repo asserted the post-read schemas
  * the whole query suite assumes. This spec turns the next such drift
  * into ONE named test failure instead of 31 silent red driver rows:
  * every harness table must load, have rows, and surface the dtypes
  * downstream operators depend on.
  */
class HarnessSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  test("every harness table loads with rows via Tables.read") {
    assume(ready, "smoke data missing — environment issue")
    Tables.all.foreach { name =>
      val df = Tables.read(spark, sfDir, name)
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("events.ts surfaces as TimestampType after Tables.read — at every SF present") {
    assume(ready, "smoke data missing — environment issue")
    // schema-only check at every scale factor the driver uses (drift
    // could regenerate one SF and not another); execution + epoch
    // sanity at the smoke SF only (cheap)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")
         if new java.io.File(s"/root/testdata/$sf").isDirectory) {
      val df = Tables.read(spark, s"/root/testdata/$sf", "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$sf events.ts read as ${df.schema("ts").dataType}; the reader must " +
          "normalize whatever this Spark surfaces for TIMESTAMP(NANOS)")
    }
    // The conversion must also survive analysis + execution, and land
    // in the epoch range the fixtures were generated in (not a ns/us
    // mixup, which would put dates ~50,000 years out).
    val yr = Tables.read(spark, sfDir, "events")
      .selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts years ${yr.mkString("-")} outside sane range — unit mixup?")
  }

  test("key columns keep the dtypes the operator suite assumes") {
    assume(ready, "smoke data missing — environment issue")
    def dtype(table: String, colName: String): DataType =
      Tables.read(spark, sfDir, table).schema(colName).dataType
    def dateLike(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    assert(dtype("lineitem", "l_quantity").isInstanceOf[NumericType])
    assert(dateLike(dtype("lineitem", "l_shipdate")),
      s"l_shipdate read as ${dtype("lineitem", "l_shipdate")}")
    assert(dateLike(dtype("orders", "o_orderdate")),
      s"o_orderdate read as ${dtype("orders", "o_orderdate")}")
    assert(Seq(classOf[StringType], classOf[LongType], classOf[IntegerType])
      .exists(_.isInstance(dtype("events", "user_id"))))
    assert(dtype("documents", "text").isInstanceOf[StringType])
    assert(dtype("embeddings", "embedding") == ArrayType(FloatType, containsNull = true) ||
      dtype("embeddings", "embedding") == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding read as ${dtype("embeddings", "embedding")}")
  }
}
