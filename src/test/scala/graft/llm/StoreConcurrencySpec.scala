package graft.llm

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** The r15 single-writer enforcement: swap-published stores
  * (HLL registers, IVF/PQ centroids) now run every read-merge-publish
  * window under [[graft.io.Tables.withStoreLock]], stamp `_GEN-<n>`
  * generation markers, and CAS on publish. These specs drive the
  * exact races the r14 verdict called out: two racing appends, two
  * racing bootstraps, and a lock-bypassing stale publish. */
class StoreConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def docsA = Seq(("s0", "alpha beta gamma delta"),
    ("s1", "one two three four five")).toDF("source", "text")
  private def docsB = Seq(("s0", "epsilon zeta eta theta"),
    ("s1", "six seven eight nine ten")).toDF("source", "text")

  /** Run the two thunks concurrently (latch-aligned start), rethrowing
    * the first failure. */
  private def race(a: => Unit, b: => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def task(body: => Unit) = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try body catch { case t: Throwable => errs.add(t) }
      }
    })
    val (fa, fb) = (task(a), task(b))
    start.countDown()
    fa.get(120, TimeUnit.SECONDS); fb.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    if (!errs.isEmpty) throw errs.peek()
  }

  private def regsSorted(path: String) =
    CorpusStats.readHllProfile(spark, path)
      .orderBy("source", "idx").collect().toSeq

  test("two racing appendToHllProfile calls serialize to the serial-order state") {
    val path = Files.createTempDirectory("hll_race_").toString + "/p"
    CorpusStats.persistHllProfile(
      Seq(("s0", "base corpus text here")).toDF("source", "text"),
      "source", "text", path)
    race(
      CorpusStats.appendToHllProfile(docsA, "source", "text", path),
      CorpusStats.appendToHllProfile(docsB, "source", "text", path))
    // register max is a commutative monoid: EVERY serial order equals
    // the from-scratch build over the union — so "state equal to some
    // serial order" is checkable exactly
    val scratch = Files.createTempDirectory("hll_scratch_").toString + "/p"
    CorpusStats.persistHllProfile(
      Seq(("s0", "base corpus text here")).toDF("source", "text")
        .unionByName(docsA).unionByName(docsB), "source", "text", scratch)
    assert(regsSorted(path) === regsSorted(scratch),
      "a racing append dropped the other's contribution (lost update)")
    // both publishes landed: base=1, +2 appends
    assert(Tables.storeGeneration(spark, s"$path/registers") === 3L)
  }

  test("two racing upsertHllProfile bootstraps on an EMPTY store lose no registers") {
    val path = Files.createTempDirectory("hll_boot_").toString + "/p"
    race(
      CorpusStats.upsertHllProfile(docsA, "source", "text", path),
      CorpusStats.upsertHllProfile(docsB, "source", "text", path))
    val scratch = Files.createTempDirectory("hll_boot_scratch_").toString + "/p"
    CorpusStats.persistHllProfile(docsA.unionByName(docsB),
      "source", "text", scratch)
    assert(regsSorted(path) === regsSorted(scratch),
      "the bootstrap race's loser overwrote the winner's first batch")
  }

  test("a lock-bypassing stale publish fails the generation CAS loudly") {
    val path = Files.createTempDirectory("hll_cas_").toString + "/p"
    CorpusStats.persistHllProfile(docsA, "source", "text", path)
    val dest = s"$path/registers"
    val staleGen = Tables.storeGeneration(spark, dest)
    val staleMerge = spark.read.parquet(dest).localCheckpoint(true)
    // a legitimate writer advances the store...
    CorpusStats.appendToHllProfile(docsB, "source", "text", path)
    // ...so the stale merge's publish must raise, not silently win
    val e = intercept[java.io.IOException] {
      Tables.swapInParquet(spark, staleMerge, dest, staleGen)
    }
    assert(e.getMessage.contains("generation"))
    // and the store still holds the legitimate writer's state
    val scratch = Files.createTempDirectory("hll_cas_scratch_").toString + "/p"
    CorpusStats.persistHllProfile(docsA.unionByName(docsB),
      "source", "text", scratch)
    assert(regsSorted(dest.stripSuffix("/registers")) === regsSorted(scratch))
  }

  test("withStoreLock: an orphan lock fails loudly with the recovery hint") {
    val dest = Files.createTempDirectory("lock_orphan_").toString + "/store"
    val lock = new org.apache.hadoop.fs.Path(s"${dest}__lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.createNewFile(lock)
    val e = intercept[java.io.IOException] {
      Tables.withStoreLock(spark, dest, retries = 2, waitMs = 10L) { fail("body must not run") }
    }
    assert(e.getMessage.contains("delete the lock file"))
    fs.delete(lock, false)
    // after recovery the lock acquires and the body runs exactly once
    var ran = 0
    Tables.withStoreLock(spark, dest, retries = 2, waitMs = 10L) { ran += 1 }
    assert(ran === 1 && !fs.exists(lock), "lock must release on exit")
  }

  test("racing IVF centroid appends serialize; merged sums equal a from-scratch build") {
    def vecs(ids: Seq[Long]) = ids.map { i =>
      (i, Array.tabulate(4)(d => (i * 4 + d).toDouble / 10.0), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val path = Files.createTempDirectory("ivf_race_").toString + "/idx"
    Similarity.persistIvfIndex(vecs(0L to 3L), "vec_id", "embedding",
      "label", path)
    race(
      Similarity.appendToIvfIndex(vecs(4L to 7L), "vec_id", "embedding",
        "label", path),
      Similarity.appendToIvfIndex(vecs(8L to 11L), "vec_id", "embedding",
        "label", path))
    val scratch = Files.createTempDirectory("ivf_race_scratch_").toString + "/idx"
    Similarity.persistIvfIndex(vecs(0L to 11L), "vec_id", "embedding",
      "label", scratch)
    val got = spark.read.parquet(s"$path/centroids")
      .orderBy("label", "pos").collect().toSeq
    val want = spark.read.parquet(s"$scratch/centroids")
      .orderBy("label", "pos").collect().toSeq
    assert(got === want, "a racing centroid merge dropped the other's sums")
  }

  test("racing IVF-SQ8 appends serialize; centroids and codes equal a from-scratch build") {
    def vecs(ids: Seq[Long]) = ids.map { i =>
      (i, Array.tabulate(4)(d => (i * 4 + d).toDouble / 10.0), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val path = Files.createTempDirectory("ivfsq8_race_").toString + "/idx"
    // grid trains on the full population so every append is in-range
    // and append == rebuild holds across the race
    Similarity.persistIvfSq8Index(vecs(0L to 3L), "vec_id", "embedding",
      "label", path, train = Some(vecs(0L to 11L)))
    race(
      Similarity.appendToIvfSq8Index(vecs(4L to 7L), "vec_id", "embedding",
        path, dim = 4, labelCol = Some("label")),
      Similarity.appendToIvfSq8Index(vecs(8L to 11L), "vec_id", "embedding",
        path, dim = 4, labelCol = Some("label")))
    val scratch = Files.createTempDirectory("ivfsq8_race_scratch_").toString + "/idx"
    Similarity.persistIvfSq8Index(vecs(0L to 11L), "vec_id", "embedding",
      "label", scratch)
    val (centG, quantG, codesG) = Similarity.readIvfSq8Index(spark, path)
    val (centW, quantW, codesW) = Similarity.readIvfSq8Index(spark, scratch)
    assert(quantG == quantW)
    assert(centG.orderBy("label", "pos").collect().toSeq ===
      centW.orderBy("label", "pos").collect().toSeq,
      "a racing centroid merge dropped the other's sums")
    assert(codesG.orderBy("cid").collect().toSeq ===
      codesW.orderBy("cid").collect().toSeq,
      "racing code appends lost or duplicated a batch")
  }

  test("appendToPqIndex: a wrong-but-divisible m fails against the stored codes") {
    def vecs(ids: Seq[Long]) = ids.map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 64.0 + d)), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val path = Files.createTempDirectory("pq_m_").toString + "/idx"
    Similarity.persistPqIndex(vecs(0L to 7L), "vec_id", "embedding",
      "label", path, m = 4, dim = 64)
    // m=2 divides dim=64 and the codebook length check (dim) passes —
    // only the stored-codes length check can catch it (ADVICE r14)
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToPqIndex(vecs(8L to 9L), "vec_id", "embedding",
        path, m = 2, dim = 64)
    }
    assert(e.getMessage.contains("m=2") &&
      e.getMessage.contains("stored code"))
  }
}
