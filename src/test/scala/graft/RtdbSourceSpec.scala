package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class RtdbSourceSpec extends SparkSpec {

  private lazy val path: String = {
    val dir = new java.io.File(graft.util.Scratch.dir("rtdbsrc"))
    val f = new java.io.File(dir, "export.json")
    val users = (1 to 20).map(i => f""""Uid$i%03d": {"email": "u$i@x.com", "n": $i}""")
    Files.writeString(f.toPath, users.mkString("{", ",", """, "Broken": "not-a-dict"}"""))
    f.getAbsolutePath
  }
  // note: keys Uid001..Uid020 via %03d formatting inside the interpolator
  private lazy val df = spark.read.format("graft.sources.RtdbSnapshotSource")
    .option("path", path).option("numPartitions", "4").load()

  test("S1 scale path: key-sharded partitions, P1 key promotion, P4 non-dict skip") {
    assert(df.count() == 20)                       // Broken skipped
    assert(df.rdd.getNumPartitions == 4)           // key ranges
    assert(df.select("id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet.size == 20)
    val one = df.filter(col("id") === "Uid005").collect()
    assert(one.length == 1)
    assert(one(0).getAs[String]("json").contains("u5@x.com"))
  }

  test("short name: spark.read.format(\"graft-rtdb\") resolves via DataSourceRegister") {
    val viaShort = spark.read.format("graft-rtdb")
      .option("path", path).option("numPartitions", "2").load()
    assert(viaShort.count() == 20)
    assert(viaShort.schema == graft.sources.RtdbSnapshotSource.schema)
  }

  test("S2 point lookup prunes partitions via pushed key-range filter") {
    val q = df.filter(col("id") === "Uid007")
    val parts = q.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions
    assert(parts.length == 1, s"expected 1 pruned partition, got ${parts.length}")
    assert(q.count() == 1)
  }

  test("range scan: startAt/endAt semantics") {
    val r = df.filter(col("id") >= "Uid010" && col("id") < "Uid015")
    assert(r.count() == 5)
  }

  test("limit pushdown caps each range reader (partial pushdown)") {
    assert(df.limit(3).count() == 3) // end-to-end result unchanged
    // drive the source directly: with a pushed limit, each range reader
    // stops after `limit` rows instead of scanning its whole key range
    import graft.sources._
    val b = new RtdbScanBuilder(path, 4)
    assert(b.pushLimit(3) && b.isPartiallyPushed)
    val parts = b.build().toBatch.planInputPartitions()
    val counts = parts.map { p =>
      val r = RtdbReaderFactory.createReader(p)
      var n = 0; while (r.next()) n += 1; n
    }
    assert(counts.forall(_ <= 3), s"reader ignored the cap: ${counts.toSeq}")
    assert(counts.sum >= 3, "must still produce enough rows for the global limit")
  }

  test("supplementary-plane keys: pushdown matches Spark's UTF8String order") {
    // UTF-16 String order puts the emoji's surrogates (0xD83D..) BELOW
    // U+FFFD; Spark's UTF8String (code-point) order puts it ABOVE. A
    // planner/reader comparing in UTF-16 silently drops the emoji row
    // from this range — the same bug class fixed in DatastoreKeys.
    val emoji = new String(Character.toChars(0x1F600))
    val dir = new java.io.File(graft.util.Scratch.dir("rtdbsupp"))
    val f = new java.io.File(dir, "export.json")
    Files.writeString(f.toPath,
      s"""{"$emoji": {"n": 1}, "�": {"n": 2}, "zz": {"n": 3}}""")
    val sdf = spark.read.format("graft.sources.RtdbSnapshotSource")
      .option("path", f.getAbsolutePath).option("numPartitions", "2").load()
    val got = sdf.filter(col("id") >= "�").select("id").collect()
      .map(_.getString(0)).toSet
    assert(got == Set("�", emoji), s"code-point range must keep the emoji key: $got")
    assert(sdf.count() == 3)
  }

  test("streaming: key-cursor micro-batches tail new children exactly once") {
    val dir = new java.io.File(graft.util.Scratch.dir("rtdbstream"))
    val f = new java.io.File(dir, "export.json")
    def write(n: Int): Unit = Files.writeString(f.toPath,
      (1 to n).map(i => f""""-N$i%03d": {"n": $i}""").mkString("{", ",", "}"))
    write(5)
    val sdf = spark.readStream.format("graft.sources.RtdbSnapshotSource")
      .option("path", f.getAbsolutePath).option("numPartitions", "2").load()
    val q = sdf.writeStream.format("memory").queryName("rtdb_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rtdb_tail").count() == 5)
      write(9) // push-ID-style append: new keys sort after the cursor
      q.processAllAvailable()
      val ids = spark.table("rtdb_tail").select("id").collect().map(_.getString(0))
      assert(ids.length == 9, s"expected 9 rows once each, got ${ids.length}")
      assert(ids.distinct.length == 9, "a key was emitted twice across batches")
      // a third trigger with nothing new emits nothing
      q.processAllAvailable()
      assert(spark.table("rtdb_tail").count() == 9)
      // deletions must not regress the cursor: shrink the tree, trigger,
      // then restore it — the re-inserted old keys must NOT re-emit
      write(5)
      q.processAllAvailable()
      write(9)
      q.processAllAvailable()
      assert(spark.table("rtdb_tail").count() == 9,
        "cursor regressed after deletion; old keys re-emitted")
    } finally q.stop()
  }

  test("streaming: checkpoint restart resumes the cursor, no re-emission") {
    val dir = new java.io.File(graft.util.Scratch.dir("rtdbrestart"))
    val f = new java.io.File(dir, "export.json")
    val ckpt = graft.util.Scratch.dir("rtdbckpt")
    val out = graft.util.Scratch.dir("rtdbout")
    def write(n: Int): Unit = Files.writeString(f.toPath,
      (1 to n).map(i => f""""-N$i%03d": {"n": $i}""").mkString("{", ",", "}"))
    def start() = spark.readStream.format("graft.sources.RtdbSnapshotSource")
      .option("path", f.getAbsolutePath).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    write(4)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 4)
    // a NEW stream instance (fresh high-water mark) over a SHRUNKEN
    // tree: recovery must seed the cursor from the checkpoint, so
    // nothing re-emits now or after the deleted keys reappear
    write(2)
    val q2 = start()
    try {
      q2.processAllAvailable()
      write(6)
      q2.processAllAvailable()
      val ids = spark.read.parquet(out).select("id").collect().map(_.getString(0))
      assert(ids.length == 6 && ids.distinct.length == 6,
        s"restart re-emitted keys: ${ids.sorted.toSeq}")
    } finally q2.stop()
  }

  test("streaming: offset survives JSON round trip including odd keys") {
    import graft.sources._
    val s = new RtdbMicroBatchStream("/nonexistent", 2, None, None, 1000)
    for (k <- Seq(None, Some("plain"), Some("quote\"key"), Some("uniéὠ0"))) {
      val off = s.KeyOffset(k)
      assert(s.deserializeOffset(off.json()) == off)
    }
  }

  test("JSONL staging: one streaming pass, splittable shards, identical frame") {
    import graft.sources.RtdbJsonl
    val out = graft.util.Scratch.dir("rtdbjsonl")
    val n = RtdbJsonl.stage(path, out, shards = 3)
    assert(n == 20) // Broken is non-object: P4 applied at stage time
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".jsonl")) == 3)
    val staged = RtdbJsonl.read(spark, out)
    assert(staged.columns.toSeq == df.columns.toSeq)
    // single parse per line: one JsonToStructs, never a per-field
    // GetJsonObject re-tokenization (3x parse CPU on a corpus re-read)
    val plan = staged.queryExecution.optimizedPlan.toString
    assert("from_json".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("get_json_object"), plan)
    val direct = df.select("id", "json").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val viaJsonl = staged.select("id", "json").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaJsonl == direct)
  }

  test("JSONL staging: keys needing JSON escaping survive the round trip") {
    import graft.sources.RtdbJsonl
    val dir = new java.io.File(graft.util.Scratch.dir("rtdbesc"))
    val f = new java.io.File(dir, "export.json")
    Files.writeString(f.toPath,
      """{"quote\"key": {"n": 1}, "back\\slash": {"n": 2}, "tab\tkey": {"n": 3}}""")
    val out = graft.util.Scratch.dir("rtdbescout")
    assert(RtdbJsonl.stage(f.getAbsolutePath, out, shards = 1) == 3)
    val ids = RtdbJsonl.read(spark, out).select("id").collect().map(_.getString(0)).toSet
    assert(ids == Set("quote\"key", "back\\slash", "tab\tkey"))
  }

  test("pushed filters intersect: conflicting EqualTos return zero rows") {
    // id and uid are the same key; equality on two different values is
    // unsatisfiable. The pushdown must intersect ranges, not overwrite.
    assert(df.filter(col("id") === "Uid007" && col("uid") === "Uid010").count() == 0)
    assert(df.filter(col("id") === "Uid007" && col("uid") === "Uid007").count() == 1)
  }

  test("offline plan is index-backed: disjoint key-sorted slices, seek-based reads") {
    import graft.sources._
    val parts = new RtdbScanBuilder(path, 4).build().toBatch.planInputPartitions()
    val slices = parts.map(_.asInstanceOf[RtdbIndexedPartition].entries)
    assert(slices.length == 4)
    // slices tile the key space: disjoint, together covering all 20 keys
    // (Broken is a non-object value — P4 drops it at PLANNING time)
    val keys = slices.flatMap(_.map(_._1))
    assert(keys.length == 20 && keys.toSet.size == 20 && !keys.contains("Broken"))
    assert(keys.sameElements(keys.sorted)) // ASCII keys: UTF-16 == code-point order
    // each reader seeks to its own subtrees and reproduces exact values
    val got = slices.flatMap { s =>
      val r = new RtdbSnapshotSource.IndexedRangeReader(path, s)
      try r.iterator.toArray finally r.close()
    }.toMap
    assert(got("Uid005").contains("u5@x.com") && got("Uid020").contains("u20@x.com"))
  }

  test("point lookup plans a single one-entry partition (entry-exact pruning)") {
    import graft.sources._
    val b = new RtdbScanBuilder(path, 4)
    b.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("id", "Uid007")))
    val parts = b.build().toBatch.planInputPartitions()
    assert(parts.length == 1)
    assert(parts(0).asInstanceOf[RtdbIndexedPartition].entries.map(_._1) == Seq("Uid007"))
  }

  test("pushed filters intersect: EqualTo does not widen a tighter bound") {
    // GTE Uid010 && == Uid003 -> empty (the EqualTo must not reset the low bound)
    assert(df.filter(col("id") >= "Uid010" && col("id") === "Uid003").count() == 0)
    // GTE Uid003 && == Uid010 -> exactly the one row
    assert(df.filter(col("id") >= "Uid003" && col("id") === "Uid010").count() == 1)
  }
}
