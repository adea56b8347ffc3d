package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the harness parquet tables (TESTDATA.md) plus the
  * reference-shaped sources/sinks (SURVEY.md §2.1/§2.2).
  *
  * `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet
  * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as
  * long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  * microseconds with integer division — identical to DuckDB's ns→us
  * truncation, so oracle comparisons agree. Plain `/ 1000` would go
  * through double division and lose precision at 2^53 ≪ 1.7e18 ns.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.parquet carries TIMESTAMP(NANOS), which Spark refuses
      // without this legacy conf. There is no per-scan toggle, and the
      // conf is consulted again at execution time, so it CANNOT be
      // restored after the (lazy) read — it stays set for the session.
      // Documented side effect: later TIMESTAMP(NANOS) parquet reads in
      // the same session also surface as LongType.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case other =>
      spark.read.parquet(s"$dir/$other.parquet")
  }

  /** S1 — RTDB-snapshot loader. The reference reads the whole `/Users`
    * JSON tree (`firebase_service.py:121-122`), a single object keyed by
    * uid. We read the file as one text blob, parse the top level as a
    * map, explode it (the reference's child iteration), promote the map
    * key to `id`/`uid` (P1) and skip non-object children (P4 —
    * `firebase_service.py:174-178`). Child objects stay as raw JSON
    * strings so heterogeneous schemas survive; field access is by
    * `get_json_object` downstream. */
  def readRtdbSnapshot(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(path)
    raw
      .select(explode(from_json(col("value"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))).as(Seq("key", "json")))
      // P4: non-dict children parse to non-object strings; keep objects only.
      .filter(col("json").startsWith("{"))
      // P1: key promotion.
      .withColumn("id", col("key"))
      .withColumn("uid", col("key"))
      .drop("key")
  }

  /** K1 — JSON export (firebase_service.py:311-349). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K2 — CSV export, header on, UTF-8 (user_transformer.py:479-489). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** K3 — batch append sink. The reference inserts row-by-row, one
    * transaction each (postgres_loader.py:293-326); the Spark-native
    * equivalent is a partitioned batch append with JDBC batching. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties, batchSize: Int = 10000): Unit =
    Jdbc.append(df, url, table, props, batchSize)

  /** S9 — JDBC full-table scan (sql_extraction.py:38-82). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties): DataFrame =
    Jdbc.readTable(spark, url, table, props)

  /** Partitioned parquet layout — the 100 TB data-lake sink: one
    * directory per partition value (e.g. event date), so downstream
    * scans prune at the file-listing level before any I/O. Callers pick
    * low-cardinality, filter-aligned columns (date, region, lang). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table sink — co-locates rows by join key so repeated
    * joins/aggregations on that key skip the exchange entirely
    * (plan-asserted in BucketingSpec). Buckets require a table catalog
    * entry, hence saveAsTable. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, n: Int): Unit =
    df.write.mode("overwrite").bucketBy(n, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Sort-clustered parquet sink — the compaction shape for a 100 TB
    * table: range-repartition on the cluster key then sort within
    * files, so every file (and every row group inside it) covers a
    * DISJOINT key range and parquet footers carry tight min/max.
    * Selective scans then skip whole files/row groups instead of
    * reading and filtering — the one-dimensional form of Z-order
    * clustering. `maxRecordsPerFile` bounds file size for compaction
    * (0 = one file per range partition). */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  files: Int, maxRecordsPerFile: Long = 0L): Unit =
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** S12 — schema introspection (sql_extraction.py:107-135). */
  def tableInfo(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
}
