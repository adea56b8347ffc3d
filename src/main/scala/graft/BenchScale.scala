package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-curve harness for the five heaviest operator families
  * (PLANS.md evidence): times each at a given SF dir so two runs
  * (sf0.1 vs a 10× fixture) yield the observed scaling exponent.
  *
  * Knobs that are FUNCTIONS OF CORPUS SIZE by their operators' own
  * contracts scale with the input — exactly as a deployment would set
  * them — instead of freezing sf0.1 values that the contracts reject
  * or degrade at 10×:
  *  - heavy hitters: the support threshold is a fraction of N in any
  *    real deployment (an absolute count of 6 is a different, stricter
  *    question at 10× the corpus and would violate the Misra-Gries
  *    completeness guard at fixed capacity); threshold scales with
  *    docs/5000, capacity stays 65536 — the bounded-memory promise.
  *  - SemDeDup: nlist must grow with the corpus to hold the expected
  *    cell size constant (the operator's own 100 TB note; SemDeDup
  *    runs ~100k cells at web scale): nlist = 4 × (vectors/2000).
  * Everything else (IVFPQ serve, multi-signal dedup, source overlap)
  * runs the exact registered query at both scales.
  *
  * Usage: runMain graft.BenchScale <sfDir> [family...]
  * (no family args = all five; naming families runs just those —
  * the sf10 rows only extend the two steepest curves). */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = io.Tables.read(spark, sfDir, "documents")
    val embs = io.Tables.read(spark, sfDir, "embeddings")
    val nDocs = docs.count()
    val nVecs = embs.count()
    def time(name: String)(f: => Long): Unit =
      if (only.isEmpty || only.contains(name))
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val n = f
          println(f"[benchscale] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n ndocs=$nDocs nvecs=$nVecs")
        }
    time("ivfpq_serve") {
      SparkEntry.queries("llm_ann_ivfpq")(spark, sfDir).count()
    }
    time("ivfpq_grid") {
      SparkEntry.queries("llm_ann_ivfpq_grid")(spark, sfDir).count()
    }
    time("multisignal_dedup") {
      SparkEntry.queries("llm_dedup_multisignal")(spark, sfDir).count()
    }
    time("semdedup") {
      val nlist = math.max(4L, 4L * nVecs / 2000L).toInt
      graft.llm.Similarity.semanticDedup(embs, "vec_id", "embedding",
        threshold = 0.3, nlist = nlist, iters = 2, maxCluster = 4096).count()
    }
    time("heavy_hitters") {
      val threshold = 6L * math.max(1L, nDocs / 5000L)
      graft.llm.CorpusStats.heavyHitters(docs, "doc_id", "text",
        n = 3, threshold = threshold, capacity = 65536).count()
    }
    time("source_overlap") {
      SparkEntry.queries("llm_source_overlap")(spark, sfDir).count()
    }
    // r16 families: the kNN graph is the quadratic-risk one (within-
    // cell pairing — nlist scales with the corpus to hold cell size
    // constant, the operator's own contract); the quantile sketch
    // should be near-flat past the scan (registers are bounded); SQ8
    // build+serve should be linear (map-side encode, 3-query serve).
    time("knn_graph") {
      val nlist = math.max(4L, 4L * nVecs / 2000L).toInt
      graft.llm.Similarity.knnGraph(embs, "vec_id", "embedding", k = 3,
        nlist = nlist, iters = 2, maxCluster = 4096).count()
    }
    // r17: the multi-probe graph — candidate pairs grow ≤ nprobe² per
    // vector with cell size held constant (nlist scales as above), so
    // the curve should track knn_graph's with a constant-factor
    // offset, NOT a steeper exponent; and the HTML extractor — a pure
    // map-side regex projection that must stay exponent ~1.
    time("knn_graph_probe2") {
      val nlist = math.max(4L, 4L * nVecs / 2000L).toInt
      graft.llm.Similarity.knnGraph(embs, "vec_id", "embedding", k = 3,
        nlist = nlist, iters = 2, maxCluster = 4096, nprobe = 2).count()
    }
    // r17: exact repeated-span detection — a corpus-TOKEN-scale window
    // explode + one hash agg on the md5 key + semi-join; should be
    // linear-ish in the token stream (the inverted-index shape)
    time("repeated_spans") {
      SparkEntry.queries("llm_repeated_spans")(spark, sfDir).count()
    }
    time("html_extract") {
      // count() would PRUNE the extracted column (and with it the whole
      // regex chain) out of the plan — aggregate over it instead so the
      // timing covers the actual extraction work
      SparkEntry.queries("llm_html_extract")(spark, sfDir)
        .agg(sum(length(col("extracted")))).head().getLong(0)
    }
    time("qsketch") {
      graft.llm.CorpusStats.logHistQuantileProfile(docs, "source",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")),
        Seq(500, 900, 990)).count()
    }
    time("sq8_serve") {
      SparkEntry.queries("llm_ann_sq8")(spark, sfDir).count()
    }
    // r18: the graph-store SMALL-DELTA append — the number that
    // matters at 100 TB (the registered lifecycle appends half the
    // corpus, which by design approximates a rebuild). Build the
    // store on all-but-64 vectors ONCE, then time appending the
    // 64-vector delta: cost should track the delta's blast radius
    // (touched cells × cell size), i.e. stay near-FLAT across sf,
    // while the full build's cost grows with the corpus.
    time("unigram_encode") {
      SparkEntry.queries("llm_unigram_encode")(spark, sfDir).count()
    }
    // r19: the Gopher repetition gate MATERIALIZED (count() would
    // eliminate the metric left-joins — aggregate over a metric
    // column instead, the html_extract precedent) — should be
    // linear-ish in the token stream with the dup-n blast-radius
    // prefilter bounding the deep windows to repetitive docs; and the
    // reference-trained backoff scorer — one corpus fold over
    // broadcast gram tables, should be near-flat past the scan.
    time("gopher_gate") {
      SparkEntry.queries("llm_gopher_repetition")(spark, sfDir)
        .agg(sum(coalesce(col("dup5_char_pm"), lit(0L))) +
          sum(coalesce(col("top2_char_pm"), lit(0L))) +
          sum(coalesce(col("dup_line_pm"), lit(0L))))
        .head().getLong(0)
    }
    time("backoff_score") {
      SparkEntry.queries("llm_backoff_lm_score")(spark, sfDir)
        .agg(sum(col("nll_micro"))).head().getLong(0)
    }
    // r22: the full quality funnel — the registered query verbatim
    // (repetition battery + heuristic gates + LM-bucket survivor
    // accounting). Its work runs at construction (the stage counts are
    // eager aggregates inside the query body), so constructing the
    // frame IS the cost; the n_out sum just closes the 4-row result.
    // Should track the token stream like gopher_gate with a constant
    // offset for the backoff train/score half.
    time("quality_funnel") {
      SparkEntry.queries("llm_quality_funnel")(spark, sfDir)
        .agg(sum(col("n_out"))).head().getLong(0)
    }
    time("knn_store_delta_append") {
      val nlist = math.max(4L, 4L * nVecs / 2000L).toInt
      val path = graft.util.Scratch.dir("bs_knn_store") + "/g"
      val cut = nVecs - 64L
      graft.llm.Similarity.persistKnnGraphStore(
        embs.filter(col("vec_id") < cut), "vec_id", "embedding", path,
        k = 3, nlist = nlist, iters = 2, maxCluster = 4096, nprobe = 2,
        train = Some(embs))
      val t0 = System.nanoTime()
      graft.llm.Similarity.appendToKnnGraphStore(
        embs.filter(col("vec_id") >= cut), "vec_id", "embedding", path,
        batchTag = Some("bs-delta"))
      println(f"[benchscale] knn_store_delta_append APPEND-ONLY ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.read.parquet(s"$path/edges").count()
    }
    spark.stop()
  }
}
