package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness: runMain graft.BenchOne <query> [sfDir] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[benchone] run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    if (sys.env.contains("EXPLAIN")) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
