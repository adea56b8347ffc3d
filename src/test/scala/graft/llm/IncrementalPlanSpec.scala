package graft.llm

import org.apache.spark.sql.functions._

/** The band-bucketed index contract of [[Dedup.incrementalNearDupPairs]],
  * end to end: with the corpus index stored via
  * `Tables.writeBucketed(_, t, "band", n)`, incremental candidate
  * generation must never shuffle raw index rows — the per-band count
  * aggregate and the pair join both reuse the scan's bucketed
  * partitioning. This is the plan that makes daily incremental dedup
  * viable at 100 TB: the corpus pays neither signature CPU (bandIndex
  * is precomputed) nor an exchange (bucketing pre-paid it once, at
  * write time). */
class IncrementalPlanSpec extends graft.SparkSpec {
  import spark.implicits._

  test("band-bucketed index: candidate generation never shuffles raw index rows") {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = (1L to 40L).map(i => (i, base.replace("word60", s"tail${i % 4}")))
      .toDF("doc_id", "text")
    val isNew = col("doc_id") > 32
    val corpus = docs.filter(!isNew)
    val batch = docs.filter(isNew)
    spark.sql("DROP TABLE IF EXISTS band_idx")
    graft.io.Tables.writeBucketed(
      Dedup.bandIndex(corpus, "doc_id", "text"), "band_idx", "band", 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // deterministic plan tree
      // correctness of the whole operator over the bucketed table first
      val inc = Dedup.incrementalNearDupPairs(
        batch, corpus, spark.table("band_idx"), "doc_id", "text", threshold = 0.5)
      val full = Dedup.minHashLshPairs(docs, "doc_id", "text", threshold = 0.5)
        .filter(col("a") > 32 || col("b") > 32)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(inc.select("a", "b").as[(Long, Long)].collect().toSet == full)
      // plan: rebuild the candidate stage with checkpoint cuts disabled
      // so the index lineage is inspectable in ONE plan tree
      val newSig = Dedup.signatures(batch, "doc_id", "text", 3)
      val newIds = newSig.select(col("doc_id").as("__nid"))
      val idx = spark.table("band_idx")
        .join(broadcast(newIds), col("doc_id") === col("__nid"), "left_anti")
      val cand = Dedup.incrementalCandidates(
        idx, Dedup.bandsOf(newSig, "doc_id"), "doc_id", 1000, identity)
      val plan = cand.queryExecution.executedPlan
      assert(plan.exists { case f: FileSourceScanExec => f.bucketedScan; case _ => false },
        s"index must be read as a bucketed scan:\n${plan.toString.take(1200)}")
      // no ShuffleExchange may carry RAW index rows: a path from an
      // exchange down to the bucketed scan that crosses no aggregate
      // and no co-partitioned join means the index itself was shuffled
      // — the exact cost bucketing exists to remove. Broadcast joins
      // are transparent (their streamed side passes index rows through).
      def bucketedScanBelow(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => f.bucketedScan
        case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => false
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => false
        case _ => p.children.exists(bucketedScanBelow)
      }
      val offenders = plan.collect {
        case e: ShuffleExchangeExec if bucketedScanBelow(e.child) => e
      }
      assert(offenders.isEmpty,
        s"raw index rows crossed an exchange:\n${offenders.map(_.toString.take(600)).mkString}\n" +
          s"full plan:\n${plan.toString.take(3000)}")
      // the per-band count aggregate sits directly on the bucketed scan
      // (its child subtree reaches the scan crossing no other reducer)
      val idxAggs = plan.collect {
        case a: HashAggregateExec if a.children.exists(bucketedScanBelow) => a
      }
      assert(idxAggs.nonEmpty, "expected a per-band count aggregate over the index")
      // the uncut plan yields a candidate superset of the verified pairs
      assert(full.subsetOf(cand.select("a", "b").as[(Long, Long)].collect().toSet))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS band_idx")
    }
  }
}
