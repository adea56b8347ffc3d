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
}
