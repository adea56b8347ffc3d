package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.model.User
import graft.ops.Ops

/** End-to-end pipeline test mirroring main.py's order (SURVEY.md §3.1)
  * on an RTDB-shaped JSON snapshot (FIXTURES.md §1). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot =
    """{
      |  "Uid001AbcDefGhi": {"email": "alice@example.com", "emailVerified": true,
      |    "name": "Alice", "city": "Paris", "birthDate": "1990-05-01",
      |    "createdAt": 1656672000, "updatedAt": 1656672000123, "status": "actif",
      |    "interests": "music, sports", "profilePic": "https://x/a.png"},
      |  "Uid002XyzJklMno": {"displayName": "Bob", "photoURL": "https://x/b.png",
      |    "created_at": "2023-01-15T10:30:00Z", "last_connexion": "nan",
      |    "interests": "reading, hiking", "status": "BLOCKED", "email": "bob@x.com"},
      |  "Uid004Dup": {"email": "alice@example.com", "createdAt": "2021-01-01",
      |    "name": "Old Alice", "status": "banni"},
      |  "Uid003Broken": "not-a-dict"
      |}""".stripMargin

  test("S1 snapshot read -> P1/P4 -> transform -> W1 dedup -> validate") {
    val dir = new java.io.File(graft.util.Scratch.dir("rtdb"))
    val f = new java.io.File(dir, "users.json")
    Files.writeString(f.toPath, snapshot)

    // S1: whole-tree read, explode, key promotion, non-dict skip (P4)
    val raw = Tables.readRtdbSnapshot(spark, f.getAbsolutePath)
    assert(raw.count() == 3, "non-dict child must be skipped")
    assert(raw.columns.contains("id") && raw.columns.contains("uid"))

    // Field extraction from heterogeneous children
    val fields = raw.select(col("id"), col("uid"),
      get_json_object(col("json"), "$.email").as("email"),
      get_json_object(col("json"), "$.emailVerified").as("emailVerified"),
      get_json_object(col("json"), "$.name").as("name"),
      get_json_object(col("json"), "$.displayName").as("displayName"),
      get_json_object(col("json"), "$.city").as("city"),
      get_json_object(col("json"), "$.birthDate").as("birthDate"),
      get_json_object(col("json"), "$.createdAt").as("createdAt"),
      get_json_object(col("json"), "$.created_at").as("created_at"),
      get_json_object(col("json"), "$.updatedAt").as("updatedAt"),
      get_json_object(col("json"), "$.status").as("status"),
      get_json_object(col("json"), "$.interests").as("interests"),
      get_json_object(col("json"), "$.photoURL").as("photoURL"),
      get_json_object(col("json"), "$.profilePic").as("profilePic"),
      get_json_object(col("json"), "$.last_connexion").as("last_connexion"))

    val out = User.transform(fields, now = lit("2025-01-01 00:00:00").cast("timestamp"))
    val rows = out.collect().map(r => r.getAs[String]("id") -> r).toMap

    // W1: duplicate email alice -> keep Uid001 (createdAt 2022 > 2021)
    assert(rows.keySet == Set("Uid001AbcDefGhi", "Uid002XyzJklMno"))

    val alice = rows("Uid001AbcDefGhi")
    assert(alice.getAs[String]("status") == "ACTIVE")                  // F6 'actif'
    assert(alice.getSeq[String](alice.fieldIndex("interests")).toList
      == List("music", "sports"))                                      // F5
    assert(alice.getAs[java.sql.Timestamp]("createdAt") ==
      java.sql.Timestamp.valueOf("2022-07-01 10:40:00"))               // F3 epoch s
    assert(alice.getAs[java.sql.Timestamp]("updatedAt") ==
      java.sql.Timestamp.valueOf("2022-07-01 10:40:00.123"))           // F3 epoch ms
    assert(alice.getAs[java.sql.Timestamp]("birthdate") ==
      java.sql.Timestamp.valueOf("1990-05-01 00:00:00"))               // F3 date-only

    val bob = rows("Uid002XyzJklMno")
    assert(bob.getAs[String]("name") == "Bob")                         // P6 displayName
    assert(bob.getAs[String]("photo") == "https://x/b.png")            // P6 photoURL
    assert(bob.getAs[String]("status") == "BANNED")                    // F6 BLOCKED
    assert(bob.getAs[java.sql.Timestamp]("lastConnexion") == null)     // F7 'nan'
    assert(bob.getAs[java.sql.Timestamp]("createdAt") ==
      java.sql.Timestamp.valueOf("2023-01-15 10:30:00"))               // F3 ISO-Z

    // §2.8 validation: all surviving rows pass the typed checks
    val (valid, invalid) = Ops.validateSplit(User.checks)(out)
    assert(valid.count() == 2 && invalid.count() == 0)

    // K2 CSV round trip (sink smoke)
    val outDir = new java.io.File(dir, "csv").getAbsolutePath
    Tables.writeCsv(valid.select(col("id"), col("email"), col("status")), outDir)
    assert(spark.read.option("header", "true").csv(outDir).count() == 2)
  }

  test("null-email rows: reference default drops, error-channel mode routes") {
    val raw = Seq(
      ("U1", "a@x.com", "2022-01-01"), ("U2", null, "2022-01-02"),
      ("U3", null, "2022-01-03"), ("U4", "a@x.com", "2022-01-04"))
      .toDF("id", "email", "createdAt")
    // provider=CREDENTIALS and uid=null -> no placeholder email synthesized

    // Default matches the reference: dropna(subset=['email']) before
    // dedup (user_transformer.py:249) — null-email rows silently gone.
    val ref = User.transform(raw, now = lit("2025-01-01 00:00:00").cast("timestamp"))
    assert(ref.count() == 1, "dedup a@x.com to 1 row; null-email rows dropped")

    // Opt-in divergence: keep them for the typed error channel.
    val out = User.transform(raw, now = lit("2025-01-01 00:00:00").cast("timestamp"),
      keepInvalidEmails = true)
    assert(out.count() == 3, "dedup a@x.com to 1 row; both null-email rows kept")
    val (valid, invalid) = Ops.validateSplit(User.checks)(out)
    assert(valid.count() == 1)
    assert(invalid.count() == 2)
    assert(invalid.select("errors").as[Seq[String]].collect()
      .forall(_.contains("missing_email")))
  }

  test("streaming: watermarked tumbling-window counts (A4 analog)") {
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Event]
    stream.addData(Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "click", 1.0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 10:04:00"), 2L, "click", 2.0),
      Streams.Event(3L, java.sql.Timestamp.valueOf("2024-01-01 10:11:00"), 1L, "view", 3.0)))
    val q = Streams.windowedTypeCounts(stream.toDS().toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("wincounts").outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("wincounts")
      .selectExpr("window.start", "event_type", "cnt").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(rows == Map(
      ("2024-01-01 10:00:00.0", "click") -> 2L,
      ("2024-01-01 10:10:00.0", "view") -> 1L))
  }

  test("K1 JSON export round trip") {
    val dir = graft.util.Scratch.dir("k1") + "/out"
    import spark.implicits._
    graft.io.Tables.writeJson(Seq(("a", 1), ("b", 2)).toDF("k", "v"), dir)
    assert(spark.read.json(dir).count() == 2)
  }

  test("ORC sink round trip with predicate pushdown") {
    // the columnar alternative a warehouse-side consumer may require:
    // same DataFrame surface, same pushdown contract as parquet
    val dir = graft.util.Scratch.dir("korc") + "/out"
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"n$i", i % 7)).toDF("id", "name", "m")
    df.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === 100)
    val filtered = back.filter(col("m") === 3)
    assert(filtered.count() === 14)
    // the filter must reach the ORC scan as a pushed predicate
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(m,3)"),
      s"expected ORC predicate pushdown:\n$plan")
  }

  test("streaming: session_window sessionization with watermark") {
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Event]
    stream.addData(Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "view", 1.0),
      Streams.Event(3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "click", 1.0)))
    // session_window aggregations stream in Append (finalized-only) or
    // Complete mode; Update is rejected by the planner.
    Streams.runToMemory(Streams.sessionCounts(stream.toDS().toDF(), "30 minutes"),
      "sessions", org.apache.spark.sql.streaming.OutputMode.Complete())
    val got = spark.table("sessions")
      .groupBy("user_id", "session_start").agg(max("n_events").as("n"), max("session_end").as("e"))
      .collect().map(r => (r.getTimestamp(1).toString, r.getTimestamp(3).toString) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0") -> 2L,  // end = last event + gap
      ("2024-01-01 12:00:00.0", "2024-01-01 12:30:00.0") -> 1L))
  }

  test("streaming: dropDuplicatesWithinWatermark dedups by content key") {
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Event]
    stream.addData(Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 2.0),
      Streams.Event(3L, java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), 2L, "click", 3.0)))
    Streams.runToMemory(
      Streams.dedupStream(stream.toDS().toDF(), Seq("user_id", "event_type")),
      "deduped", org.apache.spark.sql.streaming.OutputMode.Append())
    assert(spark.table("deduped").select("event_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("streaming: stream-stream attribution join within the time window") {
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Event]
    val purchases = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Event]
    clicks.addData(Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "click", 0)))
    purchases.addData(Seq(
      Streams.Event(10L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 1L, "purchase", 0),
      Streams.Event(11L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "purchase", 0),
      Streams.Event(12L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "purchase", 0)))
    Streams.runToMemory(
      Streams.attributionJoin(clicks.toDS().toDF(), purchases.toDS().toDF()),
      "attributed", org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("attributed")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    // only the 10:30 purchase has a click within the preceding hour
    assert(got == Set((10L, 1L)))
  }

  test("streaming: latest-per-key matches batch W1 on the same data") {
    import graft.streaming.Streams
    val events = Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "click", 2.0),
      Streams.Event(3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "view", 3.0))
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Event]
    stream.addData(events)
    val q = Streams.latestPerKey(spark, stream.toDS())
      .writeStream.format("memory").queryName("latest").outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("latest").groupBy("user_id", "event_type")
      .agg(max("event_id").as("event_id"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 3L))
  }

  test("partitioned parquet sink prunes partitions at the file level") {
    import graft.io.Tables
    val dir = graft.util.Scratch.dir("partw") + "/out"
    val df = Seq((1L, "click", 1.0), (2L, "view", 2.0), (3L, "click", 3.0))
      .toDF("event_id", "event_type", "value")
    Tables.writePartitioned(df, dir, Seq("event_type"))
    assert(new java.io.File(dir, "event_type=click").isDirectory)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    assert(q.count() == 2)
    val scanned = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanned.contains("PartitionFilters"), "filter must reach partition pruning")
  }

  test("streaming: stream-static broadcast enrichment (J1 streaming twin)") {
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Event]
    stream.addData(Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 3L, "click", 2.0)))
    Streams.runToMemory(
      stream.toDS().toDF().join(broadcast(dim), Seq("user_id"), "left_outer")
        .select("event_id", "tier"),
      "enriched", org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("gold"), 2L -> None)) // left-outer null-fill as in batch J1
  }

  test("fileAudit: per-dir rows/files/ranges; range layout disjoint, mod layout overlaps") {
    val docs = (0L until 100L).toDF("id")
    // range-bucketed layout: key ranges per dir are DISJOINT
    val rangeDir = graft.util.Scratch.dir("audit_range")
    Tables.writePartitioned(
      docs.withColumn("b", (col("id") / 25).cast("long")).repartition(col("b")),
      rangeDir, Seq("b"))
    val r = Tables.fileAudit(spark, rangeDir, "id")
      .orderBy("part_dir")
      .select("part_dir", "n_rows", "n_files", "min_key", "max_key")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.length === 4 && r.forall(x => x._2 === 25L && x._3 === 1L))
    assert(r.map(x => (x._4, x._5)).sortBy(_._1) ===
      Array((0L, 24L), (25L, 49L), (50L, 74L), (75L, 99L)),
      "range layout: every dir covers a disjoint key range")
    // mod-sharded layout: every dir spans nearly the whole key domain
    val modDir = graft.util.Scratch.dir("audit_mod")
    Tables.writePartitioned(
      docs.withColumn("b", pmod(col("id"), lit(4))).repartition(col("b")),
      modDir, Seq("b"))
    val m = Tables.fileAudit(spark, modDir, "id")
      .select("min_key", "max_key").as[(Long, Long)].collect()
    assert(m.forall { case (lo, hi) => hi - lo >= 90L },
      "mod layout: ranges overlap — the audit makes the broken clustering visible")
  }
}
