package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the zero-shuffle join path for
  * repeated big-big joins at scale (e.g. users ⋈ auth on uid when both
  * tables are bucketed by the key). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange") {
    val warehouse = graft.util.Scratch.dir("wh")
    spark.sql("DROP TABLE IF EXISTS bkt_users")
    spark.sql("DROP TABLE IF EXISTS bkt_auth")

    val users = (1 to 200).map(i => (i.toLong, s"user$i")).toDF("uid", "name")
    val auth = (1 to 200).map(i => (i.toLong, i % 2 == 0)).toDF("uid", "verified")
    users.write.bucketBy(8, "uid").sortBy("uid").format("parquet").saveAsTable("bkt_users")
    auth.write.bucketBy(8, "uid").sortBy("uid").format("parquet").saveAsTable("bkt_auth")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("bkt_users").join(spark.table("bkt_auth"), "uid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n${plan.take(800)}")
      assert(joined.count() == 200)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_users")
      spark.sql("DROP TABLE IF EXISTS bkt_auth")
    }
  }

  test("writeSorted: files cover disjoint key ranges (footer-skippable layout)") {
    val dir = graft.util.Scratch.dir("sorted") + "/t"
    val df = (1L to 10000L).map(i => (i * 2654435761L % 100000L, s"v$i"))
      .toDF("k", "v")
    graft.io.Tables.writeSorted(df, dir, Seq("k"), files = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 8)
    // per-file key ranges must be pairwise disjoint — the property that
    // lets parquet footer min/max skip whole files on selective scans
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"file ranges overlap: hi=$hi lo=$lo")
    }
    // nothing lost in the rewrite
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("writeShuffledShards: shard files are the seeded permutation, disjoint per file") {
    val dir = graft.util.Scratch.dir("shards") + "/t"
    val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    graft.llm.Order.writeShuffledShards(docs, "doc_id", seed = "s10",
      shards = 4, path = dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.nonEmpty && files.length <= 4)
    // per-file (shard, pos) ranges pairwise disjoint, in file-name order
    // — a trainer streaming files in order reads the exact permutation
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(struct(col("shard"), col("pos"))),
          max(struct(col("shard"), col("pos")))).collect()(0)
      (r.getStruct(0), r.getStruct(1))
    }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi.getLong(0) < lo.getLong(0) ||
          (hi.getLong(0) == lo.getLong(0) && hi.getLong(1) < lo.getLong(1)),
          s"file ranges overlap or files out of order: $hi vs $lo")
      case _ => ()
    }
    // the files together hold every doc exactly once, keys intact
    val back = spark.read.parquet(dir)
    assert(back.count() == 500 && back.select("doc_id").distinct().count() == 500)
    // and the read-back global order equals the operator's declared order
    val expect = graft.llm.Order.globalShuffle(docs, "doc_id", "s10", 4)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val got = back.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(got == expect)
  }

  test("readShardsFrom: resume cursor yields the exact permutation suffix, predicate pushed") {
    val dir = graft.util.Scratch.dir("rshards") + "/t"
    val docs = (1L to 400L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    graft.llm.Order.writeShuffledShards(docs, "doc_id", seed = "r10",
      shards = 4, path = dir)
    val full = spark.read.parquet(dir).orderBy("shard", "pos")
      .select("doc_id").as[Long].collect().toSeq
    // cursor in the middle of the global order
    val cut = spark.read.parquet(dir).orderBy("shard", "pos")
      .select("shard", "pos").as[(Long, Long)].collect()(199)
    val resumed = graft.llm.Order.readShardsFrom(spark, dir, cut._1, cut._2)
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(resumed == full.drop(200),
      "resume must read exactly the rows after the cursor, in order")
    // the cursor predicate reaches the parquet scan, so footer min/max
    // skips fully-consumed row groups at 100 TB
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = graft.llm.Order.readShardsFrom(spark, dir, cut._1, cut._2)
      .queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("shard") && pushed.contains("pos") && pushed.contains("Or"),
      s"cursor predicate must push to parquet: $pushed")
  }

  test("writeCurriculumShards: emission order is curriculum order, disjoint per file") {
    val dir = graft.util.Scratch.dir("cshards") + "/t"
    val docs = (1L to 300L).map(i =>
      (i, (1 to (i % 7).toInt + 1).map(j => s"w${(i + j) % 11} w${i % 5}").mkString(" ")))
      .toDF("doc_id", "text")
    graft.llm.Order.writeCurriculumShards(docs, "doc_id", "text", dir,
      files = 3, width = 1000L, seed = "c10")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.nonEmpty && files.length <= 3)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(struct(col("ckey"), col("skey"))),
          max(struct(col("ckey"), col("skey")))).collect()(0)
      (r.getStruct(0), r.getStruct(1))
    }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi.getLong(0) < lo.getLong(0) ||
          (hi.getLong(0) == lo.getLong(0) && hi.getLong(1) < lo.getLong(1)),
          s"file ranges overlap or files out of order: $hi vs $lo")
      case _ => ()
    }
    val back = spark.read.parquet(dir)
    assert(back.count() == 300)
    // read-back order == curriculumOrder's declared order (bucket DESC
    // NULLS LAST, then skey, id), via the ascending emission key
    val expect = graft.llm.Order.curriculumOrder(docs, "doc_id", "text",
        width = 1000L, seed = "c10")
      .orderBy(col("bucket_lo").desc_nulls_last, col("skey"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    val got = back.orderBy(col("ckey"), col("skey"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(got == expect)
  }
}
