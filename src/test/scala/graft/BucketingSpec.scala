package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the zero-shuffle join path for
  * repeated big-big joins at scale (e.g. users ⋈ auth on uid when both
  * tables are bucketed by the key). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh").toString
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
    val dir = java.nio.file.Files.createTempDirectory("sorted").toString + "/t"
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
}
