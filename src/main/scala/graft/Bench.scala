package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT/codegen spin-up plus table file-index priming,
    // so the first measured query isn't charged for JVM cold start (a
    // long-lived cluster's steady state).
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    graft.io.Tables.all.foreach { t =>
      try graft.io.Tables.read(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // Optional args = query-name filter for local iteration; the
    // driver passes none and gets the full set.
    val wanted = SparkEntry.queries.filter { case (n, _) =>
      args.isEmpty || args.contains(n) }
    // Three full sweeps over the query set, min per query. Sweep 1
    // absorbs each plan's codegen compilation; the min measures steady
    // state. Sweeping round-robin (rather than per-query back-to-back
    // repeats) decorrelates multi-second hypervisor/GC noise bursts
    // from any single query — a burst lands on different queries each
    // sweep and the per-query min keeps the clean pass.
    val results = collection.mutable.LinkedHashMap[String, Double]()
    val failed = collection.mutable.LinkedHashSet[String]()
    for (_ <- 1 to 3; (name, fn) <- wanted) {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name; false
      }
      val t = (System.nanoTime() - t0) / 1e9
      if (ok && t < results.getOrElse(name, Double.MaxValue)) results(name) = t
    }
    // a failing query must not report its time-to-exception as a result
    failed.foreach { n => if (!results.contains(n)) results(n) = -1.0 }
    def js(x: String): String = "\"" + x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // ms precision: full Double renderings ballooned the line past the
    // driver's output-tail capture window, so BENCH_r6/r7 recorded
    // "parsed": null — keep the ONE json line comfortably short
    def ms(v: Double): String =
      if (v < 0) "-1" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // keys sorted so round-over-round bench_local.json diffs are
    // stable under query re-registration order
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => js(k) + ":" + ms(v) }
      .mkString("{", ",", "}")
    // -1 failure sentinels are reported per-query but excluded from the
    // total so a failing query can't understate the wall-time sum. A
    // query only counts as failed if NO sweep succeeded — a transient
    // single-sweep failure still yields a valid min that IS in the
    // total, so it must not also read as a failure.
    val hardFailed = failed.count(n => results.get(n).forall(_ < 0))
    val total = results.values.filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","failed":$hardFailed,"queries":$qs,"sf":${js(sfDir)}}"""
    println(line)
    // Compact trailer AFTER the JSON: the driver's output-tail window
    // truncates the FRONT of the long one-line JSON (every BENCH_rN
    // since r6 recorded "parsed": null), so the total also rides a
    // short fixed-shape line the tail always captures.
    println(s"BENCH_TOTAL sec=${ms(total)} n=${results.size} failed=$hardFailed sf=$sfDir")
    // Truncation-proof PARSEABLE trailer: the driver's tail capture
    // cuts the FRONT of the long per-query JSON line, so every
    // BENCH_rN since r6 parsed to null. This line carries the same
    // shape (metric/value/queries/sf) but totals-only, short enough
    // that the tail window always holds it whole; per-query numbers
    // live in the committed bench_local.json and the long line.
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","failed":$hardFailed,"n":${results.size},"queries":{"_total":${ms(total)}},"sf":${js(sfDir)}}""")
    // Machine-readable artifact alongside the stdout line: the driver's
    // output-tail capture truncates long runs (BENCH_r11 recorded
    // "parsed": null), so round-over-round drift comparison reads this
    // file instead. Written to the working directory (the repo root
    // when launched via sbt) — FULL runs only: a subset invocation
    // (args given) must never clobber the committed full-suite anchor
    // with a 2-query file (it did once; the drift comparison lost its
    // baseline to the session log).
    if (args.isEmpty) {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_local.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write bench_local.json: ${e.getMessage}") }
    }
    spark.stop()
  }
}
