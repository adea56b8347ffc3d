package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Corpus-level diagnostics a curation run reports before and after
  * each filter stage: heavy-hitter n-grams (the boilerplate you are
  * about to dedup away) and the document-length profile (the skew a
  * packing stage must absorb). Both are single-aggregation plans with
  * map-side partial aggregation — at 100 TB the shuffle carries one
  * row per distinct key, not per document. */
object CorpusStats {

  /** Top-k most frequent word n-grams with occurrence and distinct-doc
    * counts. Deterministic total order (occurrences desc, docs desc,
    * ngram asc) so the cut at k is stable. The final top-k is a
    * TakeOrderedAndProject over the aggregated (distinct-ngram-sized)
    * stream — never a global sort of the corpus.
    *
    * Two-stage aggregation instead of `count + countDistinct` in one
    * agg: the combined form makes Catalyst Expand-duplicate the entire
    * exploded n-gram stream (one copy per aggregate) before the first
    * partial — 2x the hash-agg input at the widest point of the plan.
    * Aggregating (ngram, doc) first collapses within-doc repeats
    * map-side, then the ngram rollup is a plain sum/count over the
    * distinct-pair stream. Measured 6.1 s -> sub-second at sf0.1. */
  def topNgrams(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, s"need n>=1, k>=1; got n=$n k=$k")
    // materialize the word array first — inline shingles(words(text))
    // re-runs the regex split per interpreted-lambda element access
    docs.select(col(idCol), Text.words(col(textCol)).as("w"))
      .select(col(idCol), explode(Text.shingles(col("w"), n)).as("ngram"))
      .groupBy(col("ngram"), col(idCol)).agg(count(lit(1)).as("c"))
      .groupBy("ngram").agg(
        sum(col("c")).as("occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("occurrences").desc, col("n_docs").desc, col("ngram"))
      .limit(k)
  }

  /** Per-document top-k TF-IDF terms — the classic document-keyword
    * extractor. tf and df are exact integer counts; idf = ln(N/df)
    * quantized to micro-nats (floor — the NgramLm.lp_micro discipline:
    * the libm caveat touches |vocab| values, the ranking score
    * tf·idf_micro is then EXACT integer arithmetic, so ties and order
    * replay identically in any engine). Empty tokens (split of an
    * empty text) are dropped. Plan: one explode + two hash aggs, a
    * vocab-sized join back, and a per-doc top-k window that compiles
    * to a map-side WindowGroupLimit. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val tf = docs.select(col(idCol), Text.words(col(textCol)).as("__w"))
      .select(col(idCol), explode(col("__w")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val n = docs.agg(count(lit(1)).as("__N"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score_micro", col("tf") *
        floor(log(col("__N").cast(DoubleType) / col("__df").cast(DoubleType)) *
          lit(1000000.0)).cast(LongType))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("score_micro"))
  }

  /** Corpus collocations by pointwise mutual information: bigrams
    * whose parts co-occur far above chance — phrase mining /
    * tokenizer-merge candidates. pmi = ln(p(xy) / (p(x)p(y))) over
    * exact unigram/bigram counts, evaluated as one FIXED-order double
    * sequence and quantized to micro-nats; `minCount` drops the
    * unstable low-frequency tail BEFORE the join (the standard
    * practice, and it bounds the joined set). N_bigrams is the
    * pre-filter total, so probabilities stay honest. Two explodes +
    * two hash aggs + a vocab-sized join; top-k via
    * TakeOrderedAndProject. */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Int = 5, k: Int = 20): DataFrame = {
    require(minCount >= 1 && k >= 1, s"minCount, k >= 1: $minCount, $k")
    val toks = docs.select(Text.words(col(textCol)).as("__w"))
    val uni = toks.select(explode(col("__w")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("__c1"))
    val bi = toks.select(explode(Text.shingles(col("__w"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
    val totals = uni.agg(sum(col("__c1")).as("__NU"))
      .crossJoin(bi.agg(sum(col("n_pair")).as("__NB")))
    val d = (c: Column) => c.cast(DoubleType)
    val scored = bi.filter(col("n_pair") >= minCount)
      .withColumn("__x", split(col("bigram"), " ").getItem(0))
      .withColumn("__y", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("tok").as("__x"), col("__c1").as("__cx")), "__x")
      .join(uni.select(col("tok").as("__y"), col("__c1").as("__cy")), "__y")
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro",
        floor(log(d(col("n_pair")) * d(col("__NU")) * d(col("__NU")) /
          (d(col("__NB")) * d(col("__cx")) * d(col("__cy")))) *
          lit(1000000.0)).cast(LongType))
    scored.select(col("bigram"), col("n_pair"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram"))
      .limit(k)
  }

  /** Token-distribution drift between two corpus snapshots — the
    * dataset-drift monitor a continuously-crawled training corpus
    * needs: the top-k tokens by their (add-one-smoothed) KL(base‖cur)
    * contribution. The per-token contribution is
    * (c_base+1) · ln(p/q-ratio) with the log-ratio quantized to
    * micro-nats, so every contribution is an EXACT integer — a plain
    * KL sum of doubles would be partition-order-dependent; here the
    * weighted integer sum (and therefore the ranking) replays
    * identically in any engine, and KL itself is the consumer-side
    * division of that sum by (N_base + |V|). Smoothing over the UNION
    * vocabulary keeps every log finite. Two explodes + two hash aggs
    * + one vocab-sized full join; totals ride one broadcast row. */
  def tokenDistributionDrift(base: DataFrame, cur: DataFrame,
                             textCol: String, k: Int = 15): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    def counts(df: DataFrame, as: String) =
      df.select(explode(Text.words(col(textCol))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as(as))
    val joined = counts(base, "__cb")
      .join(counts(cur, "__cc"), Seq("token"), "full")
      .select(col("token"),
        coalesce(col("__cb"), lit(0L)).as("c_base"),
        coalesce(col("__cc"), lit(0L)).as("c_cur"))
    val tot = joined.agg(sum(col("c_base")).as("__NB"),
      sum(col("c_cur")).as("__NC"), count(lit(1)).as("__V"))
    val d = (c: Column) => c.cast(DoubleType)
    joined.crossJoin(broadcast(tot))
      .withColumn("contrib_micro", (col("c_base") + 1) *
        floor(log(d(col("c_base") + 1) * d(col("__NC") + col("__V")) /
          (d(col("c_cur") + 1) * d(col("__NB") + col("__V")))) *
          lit(1000000.0)).cast(LongType))
      .select(col("token"), col("c_base"), col("c_cur"), col("contrib_micro"))
      .orderBy(col("contrib_micro").desc, col("token"))
      .limit(k)
  }

  /** Exact WEIGHTED per-mille boundaries — [[exactPmBoundaries]] with
    * a weight column (token-weighted length quantiles: "half the
    * TOKENS live in documents shorter than X", which is what a
    * packing or budget decision actually needs — the unweighted
    * median over-represents short documents). Same driver-walk
    * contract: per-value weight sums (bounded by the value domain),
    * boundary(q) = smallest v with cumWeight(v) >= ceil(q/1000·W).
    * Returns one (q_pm, boundary) row per requested quantile. */
  def weightedQuantiles(docs: DataFrame, valueCol: String,
                        weightCol: String,
                        quantilesPm: Seq[Int] = Seq(250, 500, 750)): DataFrame = {
    require(quantilesPm.nonEmpty && quantilesPm.forall(q => q > 0 && q < 1000),
      s"quantiles are per-mille in (0, 1000): $quantilesPm")
    val spark = docs.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast(LongType)
    val counts = docs.select(v.as("__v"), col(weightCol).cast(LongType).as("__w"))
      .groupBy("__v").agg(sum(col("__w")).as("__c"))
      .collect().map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"weighted quantiles: NULL $valueCol/$weightCol")
        require(math.abs(r.getLong(0)) < (1L << 53),
          s"weighted quantiles: |$valueCol| must be < 2^53")
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    require(counts.nonEmpty, "weighted quantiles: empty input")
    val w = counts.map(_._2).sum
    val cum = counts.scanLeft(0L)(_ + _._2).tail
    quantilesPm.sorted.map { q =>
      val target = (q.toLong * w + 999L) / 1000L
      val i = cum.indexWhere(_ >= target)
      (q.toLong, counts(if (i < 0) counts.length - 1 else i)._1)
    }.toDF("q_pm", "boundary")
  }

  /** Document-length histogram over a precomputed length column:
    * buckets of `width` chars, with per-bucket doc count and char
    * mass. Bucket arithmetic is pure integer (n - n % width) — exact
    * at any magnitude, no double rounding. */
  def lengthHistogram(docs: DataFrame, lenCol: String,
                      width: Long = 200L): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val len = col(lenCol).cast(LongType)
    docs.select((len - pmod(len, lit(width))).as("bucket_lo"), len.as("n"))
      .groupBy("bucket_lo").agg(
        count(lit(1)).as("n_docs"), sum(col("n")).as("sum_chars"),
        min(col("n")).as("min_chars"), max(col("n")).as("max_chars"))
      .orderBy(col("bucket_lo"))
  }

  /** EXACT quantile histogram with no global sort: per-value counts
    * (one linear aggregation, collect bounded by the value domain —
    * the same bounded-collect contract as selectByTokenBudget; callers
    * use integer-ish columns like lengths or scores), a driver walk of
    * the cumulative counts to the exact per-mille boundaries
    * (boundary q = smallest v with cum(v) >= ceil(q/1000 * N) — the
    * classic discrete quantile, pure integer arithmetic), then one
    * codegen'd binary-search pass bucketing every row against the
    * literal boundaries (SearchSortedDouble). Compare approxQuantile:
    * this is exact and oracle-replayable; the approx path exists for
    * unbounded domains (ZOrder.writeZOrderedByRank).
    *
    * Output: (bucket, n_docs, min_v, max_v), bucket = #boundaries < v
    * in [0, |quantiles|] — the boundary VALUE belongs to the lower
    * bucket (values <= the p-quantile are the p-fraction), realized
    * exactly for the integer domain by searching against boundary+0.5.
    * Duplicate boundaries (a heavy value spanning quantiles) are
    * deduped, so buckets can be fewer than requested — exactly as many
    * as the distribution distinguishes. */
  def exactQuantileHistogram(docs: DataFrame, valueCol: String,
                             quantilesPm: Seq[Int] = Seq(250, 500, 750)): DataFrame = {
    val v = col(valueCol).cast(LongType)
    val bounds = exactPmBoundaries(docs, valueCol, quantilesPm)
      .distinct.map(_.toDouble + 0.5)
    val cell =
      if (bounds.isEmpty) lit(0L)
      else graft.expr.kernels.NativeFns.searchSorted(v, bounds)
    docs.select(v.as("__v"), cell.as("bucket"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))
      .orderBy(col("bucket"))
  }

  /** Exact per-mille boundary values for an integer column: the
    * counts-collect + cumulative walk shared by the histogram and
    * [[winsorize]]. boundary(q) = smallest v with cum(v) >= ceil(q/1000
    * * N) — the classic discrete quantile, pure integer arithmetic.
    * Returned in quantile order, duplicates NOT removed (callers
    * decide). Empty input → empty.
    *
    * Value-domain contract: |v| must stay below 2^53. Downstream
    * bucketing searches DOUBLE literals at boundary+0.5, and above
    * 2^53 a Long is no longer exactly representable (the +0.5 is
    * absorbed), so distinct values would silently collapse — this
    * refuses instead of degrading the "exact" promise. */
  private[llm] def exactPmBoundaries(docs: DataFrame, valueCol: String,
                                     quantilesPm: Seq[Int]): Seq[Long] = {
    require(quantilesPm.nonEmpty && quantilesPm.forall(q => q > 0 && q < 1000),
      s"quantiles are per-mille in (0, 1000): $quantilesPm")
    val v = col(valueCol).cast(LongType)
    val counts = docs.select(v.as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__c"))
      .collect().map { r =>
        require(!r.isNullAt(0), s"exact quantiles: NULL $valueCol")
        require(math.abs(r.getLong(0)) < (1L << 53),
          s"exact quantiles: |$valueCol| must be < 2^53 for exact double " +
            s"boundary bucketing, got ${r.getLong(0)}")
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    if (counts.isEmpty) return Seq.empty
    val n = counts.map(_._2).sum
    val cum = counts.scanLeft(0L)(_ + _._2).tail
    quantilesPm.sorted.map { q =>
      val target = (q.toLong * n + 999L) / 1000L
      val i = cum.indexWhere(_ >= target)
      counts(if (i < 0) counts.length - 1 else i)._1
    }
  }

  /** Winsorization at exact quantiles: clip an integer column to its
    * [loPm, hiPm] per-mille boundary VALUES — the standard outlier
    * treatment before scoring/mixing (a 10M-char document otherwise
    * dominates any length-weighted decision). Boundaries come from the
    * same exact driver walk as the histogram (no global sort); the
    * clip itself is a codegen'd least/greatest — map-side, no
    * exchange. Adds `<valueCol>_w` alongside the original. */
  def winsorize(docs: DataFrame, valueCol: String,
                loPm: Int = 10, hiPm: Int = 990): DataFrame = {
    require(loPm < hiPm, s"need loPm < hiPm, got $loPm >= $hiPm")
    val bs = exactPmBoundaries(docs, valueCol, Seq(loPm, hiPm))
    val v = col(valueCol).cast(LongType)
    val clipped =
      if (bs.isEmpty) v
      else least(greatest(v, lit(bs.head)), lit(bs.last))
    docs.withColumn(s"${valueCol}_w", clipped)
  }

  /** Per-source distinct-n-gram profile via Datasketches HLL: exact
    * occurrence counts plus a mergeable sketch of the distinct n-gram
    * set, with its rounded estimate. At 100 TB the sketch IS the
    * point: countDistinct per source needs a second shuffle of every
    * n-gram occurrence, while the sketch rides the same single
    * aggregation as the counts (fixed <= 2^lgK registers per source),
    * and yesterday's sketches union with today's without rescanning —
    * HLL register-max is order- and partitioning-independent.
    *
    * The estimate is deliberately NOT oracle-checked value-for-value
    * (DuckDB's approx_distinct is a different HLL); the spec instead
    * proves the mergeability contract: union-of-per-source ==
    * whole-corpus sketch, and exact agreement with countDistinct in
    * the sparse regime.
    */
  def sourceNgramSketch(docs: DataFrame, sourceCol: String, idCol: String,
                        textCol: String, n: Int = 2,
                        lgK: Int = 12): DataFrame = {
    require(n >= 1 && lgK >= 4 && lgK <= 21, s"need n>=1, 4<=lgK<=21; got n=$n lgK=$lgK")
    docs.select(col(sourceCol), col(idCol), Text.words(col(textCol)).as("w"))
      .select(col(sourceCol), col(idCol),
        explode(Text.shingles(col("w"), n)).as("ngram"))
      .groupBy(col(sourceCol)).agg(
        count(lit(1)).as("occurrences"),
        hll_sketch_agg(col("ngram"), lit(lgK)).as("ngram_sketch"))
      .select(col(sourceCol), col("occurrences"),
        hll_sketch_estimate(col("ngram_sketch")).as("est_distinct"),
        col("ngram_sketch"))
  }

  /** Merge per-source sketch rows to one corpus-level row — the
    * incremental-profile step: no re-scan of any document. */
  def unionNgramSketch(sketches: DataFrame,
                       sketchCol: String = "ngram_sketch"): DataFrame =
    sketches.agg(
      sum(col("occurrences")).as("occurrences"),
      hll_union_agg(col(sketchCol)).as("ngram_sketch"))
      .select(col("occurrences"),
        hll_sketch_estimate(col("ngram_sketch")).as("est_distinct"),
        col("ngram_sketch"))

  // ---- Engine-native HLL (md5 convention — oracle-replayable) ----
  //
  // HyperLogLog (Flajolet, Fuchs, Gandouet & Meunier, AofA 2007 —
  // public method) with every bit derived from the suite's md5 hash
  // convention, so registers, the raw estimate and the small-range
  // linear-counting correction all replay EXACTLY in DuckDB SQL —
  // unlike the Datasketches twin [[sourceNgramSketch]], whose
  // serialized sketch only the JVM can read (it was the suite's one
  // rows-only query). Geometry: the 60-bit md5 hash splits into
  // p = 12 low index bits (m = 4096 registers) and a B = 48-bit rank
  // window; rank = B + 1 - bitlength(window) in 1..49, computed in
  // both engines as `49 - length(ltrim(bin(h div m), '0'))` (an
  // all-zero window ltrims to '' = length 0 = rank 49 — no special
  // case). Register max is order- and partitioning-independent, and
  // shard register frames merge by cell-wise max (monoid), the same
  // incremental-profile contract as the Datasketches path.

  /** Registers per source: 2^p index bits, 48-bit rank window.
    * ONE corpus-scale aggregation; the shuffle carries at most
    * m = 4096 register rows per source, never the n-grams.
    *
    * Each register row carries its GEOMETRY as a constant `ng` column
    * (the n-gram order it was built with): registers built with a
    * different order are indistinguishable from data alone, and
    * merging them would silently estimate the union of two different
    * item universes — the same disease the CMS sentinel closes. The
    * column shape makes the guard FREE: it rides the row, inside the
    * same HashAggregate — no sentinel rows, no second scan branch, no
    * union (the r14 sentinel-row emission cost ~0.4 s of fixed AQE
    * stage orchestration per query; a cells-derived branch was 2×).
    * `ng` is part of the merge's GROUP KEY, so a same-order merge is
    * a no-op on it while a mixed-order merge leaves the same idx
    * under TWO `ng` values — which [[hllEstimate]] detects in its own
    * aggregation (min != max) and raises on, and
    * [[appendToHllProfile]] refuses against the store outright. */
  def hllNgramRegisters(docs: DataFrame, sourceCol: String,
                        textCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    docs.select(col(sourceCol), Text.words(col(textCol)).as("w"))
      .select(col(sourceCol), explode(Text.shingles(col("w"), n)).as("ngram"))
      .withColumn("__h", conv(substring(md5(col("ngram")), 1, 15), 16, 10)
        .cast(LongType))
      .groupBy(col(sourceCol),
        pmod(col("__h"), lit(HllM.toLong)).as("idx"))
      .agg(max(lit(HllRmax) -
        length(ltrim(bin(expr(s"__h div $HllM")), "0"))).cast(LongType).as("r"))
      .select(col(sourceCol), col("idx"), col("r"), lit(n.toLong).as("ng"))
  }

  /** Cell-wise-max shard merge: union register frames, then this —
    * merge == full-build registers, bit-for-bit (spec'd). The
    * geometry column is part of the group key: a same-order merge
    * folds it away, a mixed-order merge keeps both rows as evidence
    * for [[hllEstimate]]'s guard. */
  def hllMergeRegisters(regs: DataFrame, sourceCol: String = "source"): DataFrame =
    regs.groupBy(col(sourceCol), col("idx"), col("ng"))
      .agg(max(col("r")).as("r"))
      .select(col(sourceCol), col("idx"), col("r"), col("ng"))

  /** The HLL estimate from a register frame, in exact micro-units:
    * raw E = alpha_m * m² / Σ 2^-M[j] is computed as ONE exact
    * integer floor-division — numerator = alpha_micro·m²·2^49 as a
    * DECIMAL(38,0) literal, denominator S = Σ 2^(49-r) over present
    * registers + (m - nreg)·2^49 (a sum of exact longs; the
    * floor-division is spelled (C - C % S) / S because Spark's
    * decimal division rounds at scale 6 while DuckDB's `//`
    * truncates — on the pre-floored numerator both are exact).
    * When E <= 2.5m and empty registers remain, the standard
    * small-range correction applies: linear counting
    * floor(m · ln(m / V) · 1e6), the suite's micro-nat convention
    * (same double expression shape in both engines). The BIGINT
    * transport bounds est at ~9.2e12 distinct — far above any
    * per-source cardinality this sketch is pointed at. */
  def hllEstimate(regs: DataFrame, sourceCol: String = "source"): DataFrame =
    regs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("nreg"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRmax - r)")).as("__sp"),
        // geometry guard rides the SAME aggregation (no extra pass,
        // no extra branch): every register row carries its n-gram
        // order in `ng`, so min != max is exactly a mixed-order
        // merge. min/max (NOT collect_set — an object aggregate
        // would knock the whole estimate out of whole-stage codegen)
        // keep it a plain HashAggregate.
        min(col("ng")).as("__gmin"), max(col("ng")).as("__gmax"))
      .withColumn("__s", col("__sp") +
        (lit(HllM.toLong) - col("nreg")) * lit(HllTwoRmax))
      .withColumn("__raw", expr(
        s"CAST((CAST('$HllNumerator' AS DECIMAL(38,0)) - " +
          s"CAST('$HllNumerator' AS DECIMAL(38,0)) % __s) / __s AS BIGINT)"))
      .withColumn("__est",
        when(col("nreg") < HllM.toLong && col("__raw") <= HllLinearCutMicro,
          floor(lit(HllM.toDouble) *
            log(lit(HllM.toDouble) / (lit(HllM.toLong) - col("nreg"))) *
            lit(1000000.0)).cast(LongType))
          .otherwise(col("__raw")))
      .select(col(sourceCol), col("nreg"),
        when(col("__gmin") === col("__gmax"), col("__est"))
          .otherwise(raise_error(format_string(
            "hllEstimate: inconsistent register geometry for source %s " +
              "(n-gram orders %s..%s) — frames built with different " +
              "n-gram orders were merged, or the frame was not produced " +
              "by hllNgramRegisters", col(sourceCol).cast("string"),
            col("__gmin").cast("string"), col("__gmax").cast("string"))).cast(LongType))
          .as("est_distinct_micro"))

  /** Per-source distinct-n-gram HLL profile — registers + estimate in
    * one call; the native, hash-checkable face of
    * [[sourceNgramSketch]]. */
  def sourceNgramHll(docs: DataFrame, sourceCol: String, textCol: String,
                     n: Int = 2): DataFrame =
    hllEstimate(hllNgramRegisters(docs, sourceCol, textCol, n), sourceCol)

  /** Persist a native-HLL register profile — the incremental sketch
    * STORE: the whole point of the register representation is that
    * tomorrow's crawl updates the profile without rescanning anything
    * ingested before. Unlike the IVF/PQ appends (big code files land
    * as new files, only tiny centroid sums merge), the HLL store is
    * ENTIRELY tiny — ≤ m × |sources| register rows — so each batch
    * merge rewrites it cell-wise-max and publishes crash-consistently
    * ([[graft.io.Tables.swapInParquet]]: old generation or loud
    * missing-table, never a silent torn merge). Register max is
    * idempotent, so re-running a batch after a crash is safe (the
    * same registers max to the same values — appends here need no
    * commit log). Store-after-append EQUALS build-from-scratch
    * bit-for-bit; `llm_hll_incremental` shares the full-build oracle. */
  def persistHllProfile(docs: DataFrame, sourceCol: String, textCol: String,
                        path: String, n: Int = 2): Unit =
    graft.io.Tables.withStoreLock(docs.sparkSession, s"$path/registers") {
      persistHllUnlocked(docs, sourceCol, textCol, path, n)
    }

  /** The bootstrap write, publish-side: through
    * [[graft.io.Tables.swapInParquet]] (write to a `__next` sibling,
    * rename into place) so even the FIRST generation is atomic — a
    * crash mid-bootstrap leaves no torn registers dir for a restart's
    * append to merge against (the pre-r15 plain overwrite did). */
  private def persistHllUnlocked(docs: DataFrame, sourceCol: String,
                                 textCol: String, path: String, n: Int): Unit =
    graft.io.Tables.swapInParquet(docs.sparkSession,
      hllNgramRegisters(docs, sourceCol, textCol, n), s"$path/registers")

  /** Merge a new batch's registers into a persisted profile —
    * cell-wise max, atomically published; the base corpus is never
    * rescanned. The STORE's geometry column (`ng`) is validated
    * against this call's `n` BEFORE anything merges (the store is a
    * tiny materialized table — the check reads register rows, never
    * the corpus): appending a different n-gram order would silently
    * turn the profile into a mixed-universe estimate. The batch side
    * is consistent by construction (built here with the same `n`). */
  def appendToHllProfile(docs: DataFrame, sourceCol: String, textCol: String,
                         path: String, n: Int = 2): Unit =
    graft.io.Tables.withStoreLock(docs.sparkSession, s"$path/registers") {
      appendToHllUnlocked(docs, sourceCol, textCol, path, n)
    }

  /** The read-merge-publish window, run under the store lock. The
    * generation captured at read is passed to the publish as a CAS
    * (defense-in-depth behind the lock: a writer that bypasses the
    * lock fails loudly rather than silently dropping this merge). */
  private def appendToHllUnlocked(docs: DataFrame, sourceCol: String,
                                  textCol: String, path: String, n: Int): Unit = {
    val spark = docs.sparkSession
    val gen = graft.io.Tables.storeGeneration(spark, s"$path/registers")
    val store = spark.read.parquet(s"$path/registers")
    val orders = store.select(col("ng")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    require(orders == Seq(n.toLong),
      s"appendToHllProfile: store at $path was built with n-gram " +
        s"order(s) ${orders.mkString(", ")} but this append builds n=$n " +
        "registers — pass the n the profile was built with")
    val merged = hllMergeRegisters(
      store.unionByName(hllNgramRegisters(docs, sourceCol, textCol, n)),
      sourceCol)
    graft.io.Tables.swapInParquet(spark, merged, s"$path/registers", gen)
  }

  /** Create-or-merge in ONE locked decision — the streaming-sink entry
    * point ([[graft.streaming.Streams.hllProfileStream]]): the
    * exists-check and the chosen write run under the same store lock,
    * so two streams bootstrapping the same empty path serialize — the
    * loser of the bootstrap race sees the winner's store and MERGES
    * into it instead of overwriting it (the pre-r15 unlocked
    * exists-then-persist lost the first batch's registers). */
  def upsertHllProfile(docs: DataFrame, sourceCol: String, textCol: String,
                       path: String, n: Int = 2): Unit =
    graft.io.Tables.withStoreLock(docs.sparkSession, s"$path/registers") {
      val regs = new org.apache.hadoop.fs.Path(s"$path/registers")
      val fs = regs.getFileSystem(
        docs.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(regs)) appendToHllUnlocked(docs, sourceCol, textCol, path, n)
      else persistHllUnlocked(docs, sourceCol, textCol, path, n)
    }

  /** Reload a persisted register profile. */
  def readHllProfile(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.parquet(s"$path/registers")

  /** Native-HLL geometry: p = 12 index bits. */
  val HllM = 4096
  private val HllRmax = 49 // (60 - p) + 1; rank of an all-zero window
  private val HllTwoRmax = 562949953421312L // 2^49
  /** alpha_micro·m²·2^49 with alpha_micro = round(1e6·0.7213/(1 + 1.079/m))
    * = 721110 — the raw-estimate numerator as one exact integer. */
  private val HllNumerator = "6810691388924259720096645120"
  private val HllLinearCutMicro = 10240000000L // 2.5·m·1e6

  // -------------------------------------------------------------------
  // Log-linear quantile sketch — the distribution member of the sketch
  // trio (HLL = distinct, CMS = frequency, this = quantiles). The
  // bucket scheme is the HDR-histogram / DDSketch family (Tene's
  // HdrHistogram; Masson et al., VLDB 2019) in PURE INTEGER form: a
  // value's octave (bit length) picks the coarse bucket and its top
  // `subBits` mantissa bits the linear sub-bucket, so every bucket
  // spans a relative width of 2^-subBits and a quantile estimate
  // carries a guaranteed [est_lo, est_hi] enclosure. Counts are exact
  // longs; the register frame is bounded by 64·2^subBits rows per
  // group at ANY corpus size, merges are cell-wise SUM (a monoid —
  // shard-built registers fold to the full build bit-for-bit), and
  // every arithmetic step (bin-length, shifts, floor-division) is
  // exact integer in both Spark and DuckDB, so estimates replay
  // hash-identically. Unlike HLL's register MAX, count SUM is NOT
  // idempotent — the persisted store therefore publishes each batch's
  // applied-marker inside the same atomic rename as the merged data
  // ([[graft.io.Tables.swapInParquet]] `markers`), making appends
  // exactly-once with no separate commit log.
  // -------------------------------------------------------------------

  /** Register (bucket-count) frame of the log-linear quantile sketch
    * over a non-negative integer measure: one row per (group, bucket)
    * with its exact count. Values shift by +1 so 0 is representable
    * (bucket math needs v >= 1); estimates shift back. For the shifted
    * value w with octave e = bitlen(w)-1: buckets below the linear
    * floor (e <= subBits) hold ONE value each (small values are
    * EXACT); above it, bucket = e·2^s + (top s+1 mantissa bits - 2^s),
    * relative width 2^-s. NULL measures carry no observation.
    *
    * The sub-bit geometry rides every row as the `sb` column — part of
    * each downstream GROUP KEY, so merging frames built with different
    * geometry (whose bucket ids are incomparable) is detected by
    * [[logHistQuantiles]]'s free min/max guard rather than silently
    * mis-ranking, the same disease-and-cure as the HLL `ng` column.
    * ONE corpus-scale aggregation; the shuffle carries register rows
    * (<= 64·2^s per group), never documents. */
  def logHistRegisters(df: DataFrame, groupCol: String, value: Column,
                       subBits: Int = 5): DataFrame =
    logHistRegistersWeighted(df, groupCol, value, lit(1L), subBits)

  /** Weighted registers: each observation contributes `weight` to its
    * bucket instead of 1 — the sketch twin of the exact
    * weighted-quantile path (e.g. doc-length quantiles weighted by
    * token count: "the median byte sees documents of length X"). The
    * sum monoid, the store markers, and the rank walk are unchanged —
    * `n` becomes total weight and ranks walk weight mass. Weights
    * must be non-negative (fail-loud, the value-domain guard's twin);
    * NULL weights carry no observation, matching NULL values. */
  def logHistRegistersWeighted(df: DataFrame, groupCol: String,
                               value: Column, weight: Column,
                               subBits: Int = 5): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")
    val s = subBits
    df.select(col(groupCol), value.cast(LongType).as("__v"),
        weight.cast(LongType).as("__wt"))
      .filter(col("__v").isNotNull && col("__wt").isNotNull)
      .select(col(groupCol),
        when(col("__v") < 0L,
          raise_error(format_string(
            "logHistRegisters: negative value %s — the sketch domain " +
              "is v >= 0", col("__v").cast("string"))).cast(LongType))
          .otherwise(col("__v") + 1L).as("__w"),
        when(col("__wt") < 0L,
          raise_error(format_string(
            "logHistRegisters: negative weight %s — weights must be " +
              ">= 0", col("__wt").cast("string"))).cast(LongType))
          .otherwise(col("__wt")).as("__wt"))
      .withColumn("__e", (length(bin(col("__w"))) - 1).cast(LongType))
      .withColumn("bucket",
        col("__e") * lit(1L << s) +
          expr(s"shiftright(__w, CAST(greatest(__e - $s, 0L) AS INT))") -
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(least(__e, $s) AS INT))"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(sum(col("__wt")).as("cnt"))
      .filter(col("cnt") > 0L)
      .select(col(groupCol), col("bucket"), col("cnt"), lit(s.toLong).as("sb"))
  }

  /** Cell-wise-sum shard merge: union register frames, then this —
    * merge == full-build registers bit-for-bit (the sum monoid; same
    * contract shape as [[hllMergeRegisters]]). Geometry stays in the
    * group key: a same-geometry merge folds `sb` away, a mixed merge
    * keeps both rows as evidence for the quantile guard. */
  def logHistMerge(regs: DataFrame, groupCol: String = "source"): DataFrame =
    regs.groupBy(col(groupCol), col("bucket"), col("sb"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col(groupCol), col("bucket"), col("cnt"), col("sb"))

  /** Quantile estimates from a register frame: for each per-mille
    * target q the bucket containing rank ceil(n·q/1000) (clamped to
    * >= 1), reported as the exact value enclosure [est_lo, est_hi] —
    * the true order statistic provably lies inside (bucket counts are
    * exact; only within-bucket position is unknown), so the enclosure
    * width IS the error bound: 0 for small values, relative 2^-sb
    * above the linear floor. The rank walk is a cumulative-sum window
    * over register rows (bounded by geometry, never corpus-sized);
    * totals/guards ride a second window over the SAME partition key —
    * one exchange. Mixed-geometry frames raise (min(sb) != max(sb)
    * — bucket ids from different geometries are incomparable). */
  def logHistQuantiles(regs: DataFrame, qMille: Seq[Int],
                       groupCol: String = "source"): DataFrame = {
    require(qMille.nonEmpty && qMille.forall(q => q >= 1 && q <= 1000),
      s"quantile targets must be per-mille in [1, 1000], got $qMille")
    val byGroup = Window.partitionBy(col(groupCol))
    // sb in the walk order: after the fold below, (bucket, sb) is
    // unique per group, so the default RANGE frame never sees peer
    // rows — every rank picks exactly one row even on a MIXED-geometry
    // frame, which then reaches the raise guard instead of silently
    // dropping its picks.
    val walk = byGroup.orderBy(col("bucket"), col("sb"))
    // Fold duplicate (group, bucket, sb) cells FIRST: a register union
    // not passed through logHistMerge would otherwise carry tied rows,
    // and the default RANGE frame of orderBy(bucket) gives tied rows
    // one shared cumulative value — the pick filter below could then
    // be unsatisfiable for some ranks, silently DROPPING quantile rows
    // instead of raising. The fold is a no-op on merged frames (the
    // common path: one row per cell) and makes raw unions correct; its
    // hash exchange on the group key is exactly the window's required
    // partitioning, so AQE/EnsureRequirements add no extra shuffle.
    regs.groupBy(col(groupCol), col("bucket"), col("sb"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("__cum", sum(col("cnt")).over(walk))
      .withColumn("__n", sum(col("cnt")).over(byGroup))
      .withColumn("__gmin", min(col("sb")).over(byGroup))
      .withColumn("__gmax", max(col("sb")).over(byGroup))
      .select(col(groupCol), col("bucket"), col("cnt"), col("sb"),
        col("__cum"), col("__n"), col("__gmin"), col("__gmax"),
        explode(array(qMille.map(q => lit(q.toLong)): _*)).as("q_mille"))
      .withColumn("__rank",
        greatest(lit(1L), expr("(__n * q_mille + 999L) div 1000L")))
      .filter(col("__cum") >= col("__rank") &&
        col("__cum") - col("cnt") < col("__rank"))
      .withColumn("__e",
        expr("bucket div shiftleft(CAST(1 AS BIGINT), CAST(sb AS INT))"))
      .withColumn("__sub",
        expr("bucket % shiftleft(CAST(1 AS BIGINT), CAST(sb AS INT))"))
      .withColumn("__lo", expr(
        "shiftleft(shiftleft(CAST(1 AS BIGINT), CAST(least(__e, sb) AS INT))" +
          " + __sub, CAST(greatest(__e - sb, 0L) AS INT))"))
      .withColumn("__width", expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(greatest(__e - sb, 0L) AS INT))"))
      .select(col(groupCol), col("q_mille"), col("__n").as("n"),
        when(col("__gmin") === col("__gmax"), col("__lo") - 1L)
          .otherwise(raise_error(format_string(
            "logHistQuantiles: inconsistent register geometry for " +
              "group %s (sub-bits %s..%s) — frames built with different " +
              "subBits were merged; rebuild with one geometry",
            col(groupCol).cast("string"), col("__gmin").cast("string"),
            col("__gmax").cast("string"))).cast(LongType)).as("est_lo"),
        (col("__lo") + col("__width") - 2L).as("est_hi"))
  }

  /** Per-group quantile profile in one call — registers + estimates;
    * the quantile face of [[sourceNgramHll]]. */
  def logHistQuantileProfile(df: DataFrame, groupCol: String, value: Column,
                             qMille: Seq[Int], subBits: Int = 5): DataFrame =
    logHistQuantiles(logHistRegisters(df, groupCol, value, subBits),
      qMille, groupCol)

  /** Persist a quantile-sketch register store — like the HLL profile
    * an ENTIRELY tiny store (<= 64·2^sb rows per group), rewritten
    * cell-wise and published crash-consistently each merge. `batchTag`
    * names the ingested batch; its applied-ledger line publishes
    * inside the SAME atomic rename as the data, so a re-run of the
    * same tag short-circuits in [[appendToLogHist]] instead of
    * double-counting (count SUM, unlike register max, is not
    * replay-idempotent). The ledger is ONE small file holding the most
    * recent [[graft.io.Tables.MaxAppliedLedger]] tags (an indefinitely
    * running maintenance stream would otherwise accumulate one marker
    * FILE per micro-batch forever — O(n) creates per publish, O(n²)
    * cumulative); pre-ledger marker files are folded in on the first
    * new-style publish. */
  def persistLogHist(df: DataFrame, groupCol: String, value: Column,
                     path: String, subBits: Int = 5,
                     batchTag: Option[String] = None): Unit =
    graft.io.Tables.withStoreLock(df.sparkSession, s"$path/registers") {
      persistLogHistUnlocked(df, groupCol, value, path, subBits, batchTag)
    }

  private def persistLogHistUnlocked(df: DataFrame, groupCol: String,
                                     value: Column, path: String,
                                     subBits: Int,
                                     batchTag: Option[String]): Unit =
    graft.io.Tables.swapInParquet(df.sparkSession,
      logHistRegisters(df, groupCol, value, subBits), s"$path/registers",
      ledger = batchTag.map(graft.io.Tables.appliedLedgerLine).toSeq)

  /** Merge a new batch's registers into a persisted store — cell-wise
    * sum, atomically published under the store lock with a read-time
    * generation CAS; the base corpus is never rescanned. The store's
    * geometry (`sb`) is validated against this call's `subBits` before
    * anything merges, and a `batchTag` already marked applied makes
    * the whole call a no-op — the exactly-once contract for at-least-
    * once callers (streaming replays, crash-retry loops). */
  def appendToLogHist(df: DataFrame, groupCol: String, value: Column,
                      path: String, subBits: Int = 5,
                      batchTag: Option[String] = None): Unit =
    graft.io.Tables.withStoreLock(df.sparkSession, s"$path/registers") {
      appendToLogHistUnlocked(df, groupCol, value, path, subBits, batchTag)
    }

  private def appendToLogHistUnlocked(df: DataFrame, groupCol: String,
                                      value: Column, path: String,
                                      subBits: Int,
                                      batchTag: Option[String]): Unit = {
    val spark = df.sparkSession
    val store = s"$path/registers"
    val applied = graft.io.Tables.storeAppliedLedger(spark, store)
    val tagLine = batchTag.map(graft.io.Tables.appliedLedgerLine)
    if (tagLine.exists(applied.contains)) return // replayed batch: no-op
    graft.io.Tables.warnIfLedgerWrapped(spark, store, tagLine)
    val gen = graft.io.Tables.storeGeneration(spark, store)
    val base = spark.read.parquet(store)
    val geoms = base.select(col("sb")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    require(geoms == Seq(subBits.toLong),
      s"appendToLogHist: store at $path was built with subBits " +
        s"${geoms.mkString(", ")} but this append builds subBits=$subBits " +
        "registers — pass the geometry the store was built with")
    val merged = logHistMerge(
      base.unionByName(logHistRegisters(df, groupCol, value, subBits)),
      groupCol)
    graft.io.Tables.swapInParquet(spark, merged, store, gen,
      ledger = applied ++ tagLine)
  }

  /** Create-or-merge in ONE locked decision — the streaming-sink entry
    * point ([[graft.streaming.Streams.logHistStream]]); the same
    * bootstrap-race contract as [[upsertHllProfile]], plus the
    * applied-marker check so a replayed FIRST batch is also a no-op
    * (the marker published with the bootstrap generation). */
  def upsertLogHist(df: DataFrame, groupCol: String, value: Column,
                    path: String, subBits: Int = 5,
                    batchTag: Option[String] = None): Unit =
    graft.io.Tables.withStoreLock(df.sparkSession, s"$path/registers") {
      val regs = new org.apache.hadoop.fs.Path(s"$path/registers")
      val fs = regs.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(regs))
        appendToLogHistUnlocked(df, groupCol, value, path, subBits, batchTag)
      else persistLogHistUnlocked(df, groupCol, value, path, subBits, batchTag)
    }

  /** Reload a persisted quantile-sketch register store. */
  def readLogHist(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame =
    spark.read.parquet(s"$path/registers")

  /** Duplicate-cluster size histogram over a components frame
    * (node, label): how many clusters of each size the dedup pass
    * found — the diagnostic that says whether duplication is a few
    * giant boilerplate clusters (cap-sensitive) or a long tail of
    * pairs. Two hash aggs over CLUSTERED docs only (≪ corpus). */
  def clusterSizeHistogram(components: DataFrame): DataFrame =
    components.groupBy(col("label")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("sz"))

  /** Pairwise EXACT shingle-Jaccard between sources — "which feeds
    * overlap, and how much" (mirror-site detection, double-ingestion
    * audit, mixture-weight sanity). Universe = each source's DISTINCT
    * word-n-gram hash set; output one row per source pair with any
    * overlap: (src_a, src_b, n_a, n_b, n_common, jaccard), jaccard
    * derived from exact integer set sizes in one IEEE division.
    *
    * Scale: the corpus collapses to distinct (source, h) rows first
    * (one exchange, map-side distinct). The h-self-join then meets
    * ≤ |sources| rows per shingle hash, so pairs per h are bounded by
    * sources², NOT corpus size — and `maxSources` drops
    * stop-shingles present in more sources than that (they carry no
    * discrimination, only join fan-out; dropped from sizes AND
    * intersections, so the Jaccard universe stays consistent — the
    * same guard/consistency contract as the LSH bucket caps). The cap
    * window's hash exchange on h is exactly the self-join's required
    * partitioning (ReuseExchange). */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String,
                    n: Int = 3, maxSources: Int = 64): DataFrame = {
    require(maxSources >= 2, s"maxSources must be >= 2, got $maxSources")
    val sh = docs
      .select(col(sourceCol).as("src"), Text.words(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("src"), explode(array_distinct(
        transform(Text.shingles(col("w"), n), s => Text.md5Hash(s)))).as("h"))
      .distinct()
    // LAZY pin: the windowed frame feeds the per-source sizes AND both
    // sides of the intersection self-join — without it the corpus
    // shingle explode + distinct + document-frequency window executes
    // once per branch (two Scan+Generate chains in the executed plan;
    // ReuseExchange only dedupes the identical self-join sides)
    val windowed = sh
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .localCheckpoint(false)
    // sizes keep source-private shingles (true Jaccard denominators);
    // the join side additionally drops them — a singleton h can never
    // intersect, so pruning it changes nothing but the join volume
    val sizes = windowed.filter(col("__df") <= maxSources)
      .groupBy(col("src")).agg(count(lit(1)).as("nsh"))
    val joinable = windowed.filter(col("__df").between(2, maxSources))
      .drop("__df")
    val inter = joinable.as("x").join(joinable.as("y"),
        col("x.h") === col("y.h") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("src_a"), col("y.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("src").as("src_a"), col("nsh").as("n_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("nsh").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_common")).cast(DoubleType)).as("jaccard"))
  }

  /** Mergeable per-shard statistics — the incremental-maintenance
    * pattern for corpus accounting at 100 TB: each ingestion batch (or
    * each storage shard) computes ONE tiny partial row per
    * (group, shard), and [[mergeStats]] folds ANY union of partial
    * rows — yesterday's persisted parts plus today's delta — into
    * exactly the numbers a full-corpus rescan would produce. Every
    * field is an exact MONOID value (count, Long sum, min, max,
    * DECIMAL(38,0) sum of squares — never a float, never a mean), so
    * merge order, shard layout, and re-merging merged rows cannot
    * change a single bit. Derived moments (mean, variance) come out of
    * the merged row, not the corpus. */
  def partialStats(docs: DataFrame, groupCol: String, valueCol: String,
                   shard: Column): DataFrame = {
    val v = col(valueCol).cast(LongType)
    val d = col(valueCol).cast(DecimalType(18, 0))
    docs.groupBy(col(groupCol), shard.as("shard"))
      .agg(count(lit(1)).as("n"), sum(v).as("sum_v"),
        min(v).as("min_v"), max(v).as("max_v"),
        sum(d * d).cast(DecimalType(38, 0)).as("sumsq"))
  }

  /** Fold partial-stat rows (any subset union) to per-group totals —
    * identical to a direct full pass ([[partialStats]] contract).
    * `mean_micro` is exact integer micro-units: (Σv·1e6) div n — the
    * product is computed in DECIMAL(38,0), not Long: at the module's
    * stated 100 TB scale Σv can pass ~9.2e12 (total corpus chars),
    * where a Long `sum_v * 1000000` silently wraps under non-ANSI
    * arithmetic. The decimal product is exact to 38 digits and the
    * integral divide lands back in Long range whenever the MEAN itself
    * is representable in micro-units (mean < 9.2e12). */
  def mergeStats(parts: DataFrame, groupCol: String): DataFrame =
    parts.groupBy(col(groupCol))
      .agg(sum(col("n")).cast(LongType).as("n"),
        sum(col("sum_v")).cast(LongType).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"),
        sum(col("sumsq")).cast(DecimalType(38, 0)).as("sumsq"))
      .withColumn("mean_micro",
        expr("(CAST(sum_v AS DECIMAL(38,0)) * 1000000) div n"))

  /** Per-group robust outlier report: median / MAD (median absolute
    * deviation) over an integer column, with the classic
    * |v − median| > k·MAD flag — the outlier rule that, unlike
    * mean/stddev, a handful of extreme documents cannot drag (robust
    * statistics are the standard length/score gate in corpus QA).
    *
    * All arithmetic is EXACT integer: medians are carried doubled
    * (`med2` = lower + upper middle order statistic, so even-sized
    * groups never average into a fraction) and the deviation median
    * quadrupled (`mad4` = med2 of `|2v − med2|`); the flag compares
    * `2·|2v − med2| > k·mad4`, an integer inequality equivalent to the
    * textbook rule. No floats anywhere, so the report is partition-
    * and engine-independent.
    *
    * Shape: ONE hash exchange on the group key serves everything —
    * both order-statistic ranks are windows over the same partitioning
    * (the second orderBy re-sorts in place, no new exchange), the
    * unbounded-frame `max(when(rn = lo ...))` picks the middle values
    * without any self-join, and the final per-group rollup aggregates
    * the already-partitioned stream. Group count never bounds memory —
    * nothing is collected. */
  def robustOutliers(docs: DataFrame, groupCol: String, valueCol: String,
                     idCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val reserved = Seq("__v", "__rn", "__n", "__lo", "__hi", "__med2",
      "__dev2", "__rn2", "__mad4")
    require(!docs.columns.exists(reserved.contains),
      s"robustOutliers reserves ${reserved.mkString(", ")}")
    val g = col(groupCol)
    val part = Window.partitionBy(g)
    val all = part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byV = part.orderBy(col("__v"), col(idCol))
    val d1 = docs
      .select(g, col(idCol), col(valueCol).cast(LongType).as("__v"))
      .withColumn("__rn", row_number().over(byV).cast(LongType))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__lo", expr("(__n + 1) div 2"))
      .withColumn("__hi", expr("__n div 2 + 1"))
      .withColumn("__med2",
        max(when(col("__rn") === col("__lo"), col("__v"))).over(all) +
          max(when(col("__rn") === col("__hi"), col("__v"))).over(all))
    val byDev = part.orderBy(col("__dev2"), col(idCol))
    val d2 = d1
      .withColumn("__dev2", abs(col("__v") * 2 - col("__med2")))
      .withColumn("__rn2", row_number().over(byDev).cast(LongType))
      .withColumn("__mad4",
        max(when(col("__rn2") === col("__lo"), col("__dev2"))).over(all) +
          max(when(col("__rn2") === col("__hi"), col("__dev2"))).over(all))
    d2.groupBy(g)
      .agg(max(col("__n")).as("n"),
        max(col("__med2")).as("med2"),
        max(col("__mad4")).as("mad4"),
        sum(when(col("__dev2") * 2 > lit(k.toLong) * col("__mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** EXACT corpus heavy hitters — every word n-gram with global
    * occurrence count >= `threshold` — at BOUNDED executor memory via
    * Misra-Gries candidate generation + exact verification (the
    * standard two-pass distributed heavy-hitter recipe; Misra & Gries
    * 1982, "Finding repeated elements" — public method).
    *
    * Why not a plain groupBy? It IS exact and map-side-combined, but
    * its partial hash table grows with the distinct n-grams of each
    * input partition — at 100 TB the n-gram domain is effectively
    * unbounded (trillions of distinct shingles), so the partials spill
    * and the exchange carries one row per distinct key anyway. Here:
    *
    *   pass 1  per-partition Misra-Gries with `capacity` counters —
    *           O(capacity) memory regardless of the domain; survivors
    *           + the partition's n-gram total are the ONLY rows that
    *           leave the executor (<= capacity+1 per partition);
    *   guard   an item with global count f survives in some partition
    *           whenever f > N/(capacity+1) (per-partition undercount
    *           <= n_p/(capacity+1), summed <= N/(capacity+1) < f). The
    *           driver checks threshold > N/(capacity+1) with the EXACT
    *           N from the sentinel rows and refuses to return a
    *           possibly-incomplete answer — size capacity at
    *           N/threshold when scaling up;
    *   pass 2  exact recount of candidates only: a broadcast semi-join
    *           (candidates <= capacity x partitions) prunes the stream
    *           BEFORE the hash agg, so pass 2's tables are bounded by
    *           the candidate set, not the domain.
    *
    * Output rows therefore equal the plain `GROUP BY ... HAVING
    * count >= threshold` exactly — the oracle replays that SQL. The
    * (ngram, doc) pre-aggregation mirrors [[topNgrams]]'s two-stage
    * shape (no Expand duplication of the exploded stream). */
  def heavyHitters(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Long = 6,
                   capacity: Int = 65536): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    def stream = docs
      .select(col(idCol).as("__doc"), Text.words(col(textCol)).as("w"))
      .select(col("__doc"), explode(Text.shingles(col("w"), n)).as("ngram"))
    val summaries = stream.select(col("ngram")).as[String]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
        var np = 0L
        while (it.hasNext) {
          val t = it.next(); np += 1
          val c = counts.get(t)
          if (c != null) counts.put(t, c + 1L)
          else if (counts.size < capacity) counts.put(t, 1L)
          else {
            // decrement-all: amortized O(1) (every decrement cancels
            // one earlier increment), so the pass stays linear
            val itr = counts.entrySet().iterator()
            while (itr.hasNext) {
              val e = itr.next()
              if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        val survivors = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        survivors.sizeHint(counts.size + 1)
        survivors += ((null, np)) // sentinel: this partition's total
        val keys = counts.keySet().iterator()
        while (keys.hasNext) survivors += ((keys.next(), 0L))
        survivors.iterator
      }.toDF("ngram", "__np")
      // one materialization read twice (exact-N guard + candidates);
      // <= (capacity+1) x partitions rows by construction
      .localCheckpoint()
    val total = summaries.filter(col("ngram").isNull)
      .agg(coalesce(sum(col("__np")), lit(0L))).head().getLong(0)
    require(threshold.toDouble * (capacity.toDouble + 1.0) > total.toDouble,
      s"heavyHitters completeness guard: threshold=$threshold <= " +
        s"N/(capacity+1) = $total/${capacity + 1} — candidates may be " +
        "incomplete; raise capacity to at least N/threshold")
    val cands = summaries.filter(col("ngram").isNotNull)
      .select(col("ngram")).distinct()
    stream
      .join(broadcast(cands), Seq("ngram"), "left_semi")
      .groupBy(col("ngram"), col("__doc")).agg(count(lit(1)).as("__c"))
      .groupBy(col("ngram"))
      .agg(sum(col("__c")).cast(LongType).as("occurrences"),
        count(lit(1)).as("n_docs"))
      .filter(col("occurrences") >= threshold)
  }

  /** Per-dimension statistics of a quantized embedding store — the
    * embedding-store QA report (dead dimensions, per-batch scale
    * drift, variance collapse after a model update): for each
    * position, exact n / sum / sumsq (DECIMAL(38,0)) / min / max.
    * ONE explode (×dim) into ONE map-side-combined hash agg; the
    * shuffle carries dim cells, never the vectors. Every field is a
    * monoid, so shard frames merge cell-wise (the [[partialStats]]
    * discipline) for incremental maintenance. */
  def embedDimStats(df: DataFrame, embCol: String): DataFrame = {
    val v = col("v")
    val d = v.cast(DecimalType(18, 0))
    df.select(posexplode(Similarity.quantize(col(embCol))).as(Seq("pos", "v")))
      .groupBy(col("pos").cast(LongType).as("pos"))
      .agg(count(lit(1)).as("n"), sum(v).cast(LongType).as("sum_v"),
        sum(d * d).cast(DecimalType(38, 0)).as("sumsq"),
        min(v).as("min_v"), max(v).as("max_v"))
  }

  /** Deterministic count-min sketch over corpus tokens (Cormode &
    * Muthukrishnan 2005, "An improved data stream summary: the
    * count-min sketch" — public method): `depth` salted hash rows ×
    * `width` buckets of exact Long cell counts. Build is the tokenize
    * explode into ONE map-side-combined hash agg; the sketch is
    * depth×width cells — CONSTANT size at any corpus scale, and
    * shard sketches merge by cell-wise sum (monoid; spec'd
    * merge == full). Point estimates ([[cmsEstimate]]) overestimate
    * true counts by at most εN w.h.p. — the bounded-memory frequency
    * primitive when even Misra-Gries' candidate set is too much state
    * (e.g. per-shard sketches unioned over months of crawls). Hashes
    * are the md5 convention, so estimates replay exactly in the
    * oracle.
    *
    * The sketch SELF-DESCRIBES its geometry: one sentinel row
    * `(row = depth, bucket = width, n = 0)` rides with the cells
    * (cell rows live in [0, depth) × [0, width), so the sentinel is
    * unambiguous). It is monoid-preserving — the cell-wise-sum shard
    * merge folds matching sentinels back to one row, while merging
    * sketches of DIFFERENT geometry leaves two sentinels behind — and
    * lets [[cmsEstimate]] fail loudly on a probe-geometry mismatch
    * instead of hashing probes into unrelated buckets and silently
    * voiding the est >= exact guarantee. */
  def countMinSketch(docs: DataFrame, textCol: String, depth: Int = 4,
                     width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1 and width >= 2, got $depth x $width")
    val cells = docs.select(explode(Text.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .select(posexplode(array((0 until depth).map(r =>
        pmod(Text.md5Hash(concat(lit(s"cms:$r:"), col("w"))),
          lit(width.toLong))): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row").cast(LongType).as("row"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    cells.unionByName(docs.sparkSession.range(1).select(
      lit(depth.toLong).as("row"), lit(width.toLong).as("bucket"),
      lit(0L).as("n")))
  }

  /** md5Hash's exact driver-side twin (15 hex chars = 60 bits, fits
    * Long; mod the shared prime). */
  private def md5Mod(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % Text.HashP
  }

  /** CMS point estimates for a fixed term list: probe each term's
    * depth cells (buckets computed driver-side with the identical
    * hash), min over rows; an absent cell reads 0. The probe frame is
    * |terms|×depth rows — the sketch answers without touching the
    * corpus. Probe terms are LOWERCASED first to match the build's
    * [[Text.words]] tokenization — an unnormalized probe would hash
    * to an unrelated cell and read an arbitrary count, silently
    * voiding the est ≥ exact guarantee. The output echoes the terms
    * as given.
    *
    * The probe (depth, width) is VALIDATED against the sketch's
    * sentinel geometry row (see [[countMinSketch]]): a mismatched
    * width would hash probes to unrelated buckets and return
    * arbitrary counts with nothing downstream erring — so a wrong
    * geometry (including a union of differently-shaped shard
    * sketches, which leaves two sentinels) raises at evaluation.
    * The guard costs ONE PLAN, not two: the probes FULL-OUTER join
    * the sketch (unmatched probes read 0 as before; unmatched cells —
    * including the sentinel — survive as the null-term group), ONE
    * hash aggregation computes the per-term minimum alongside the
    * per-group geometry partials (sentinel count, the sentinel's
    * row/bucket packed into one long, true-cell row/bucket maxima),
    * and a window over the aggregated frame (≤ |terms|+1 rows — a
    * global window is only an anti-pattern at data scale) folds the
    * partials to the global verdict. The corpus-scale build lineage
    * is evaluated exactly once — r14's cross-joined guard branch
    * re-evaluated it per estimate (~1.3 s residual on
    * llm_cms_estimate), an eager driver collect was 6.8× (it
    * serialized multi-sketch arms), and a lazy localCheckpoint pin
    * measured 1.6× WORSE than the branch (the RDD boundary defeats
    * AQE and whole-stage fusion) — the single-aggregation shape is
    * the one that is actually free. */
  def cmsEstimate(cms: DataFrame, terms: Seq[String], depth: Int = 4,
                  width: Int = 64): DataFrame = {
    val spark = cms.sparkSession
    import spark.implicits._
    val probes = terms.distinct.flatMap(t => (0 until depth).map(r =>
      (t, r.toLong,
        md5Mod(s"cms:$r:${t.toLowerCase}") % width))).toDF("term", "row", "bucket")
    // sentinel coordinates packed into one long (row, bucket < 2^31)
    // so the geometry partials stay primitive min/max — the whole
    // estimate remains a plain codegen HashAggregate + tiny Window
    val pack = col("row") * lit(4294967296L) + col("bucket")
    val expect = lit(depth.toLong * 4294967296L + width.toLong)
    val g = probes.join(cms, Seq("row", "bucket"), "full_outer")
      .groupBy(col("term"))
      .agg(min(coalesce(col("n"), lit(0L))).as("__est"),
        count(when(col("n") === 0L, lit(1))).as("__cs"),
        min(when(col("n") === 0L, pack)).as("__smin"),
        max(when(col("n") === 0L, pack)).as("__smax"),
        max(when(col("n") > 0L, col("row"))).as("__mr"),
        max(when(col("n") > 0L, col("bucket"))).as("__mb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // the window folds BEFORE the null-term group is filtered away —
    // the sentinel's evidence lives in that group (Catalyst cannot
    // push a non-partition-key filter below a Window, and the
    // withColumn ordering makes the intent explicit)
    val folded = g
      .withColumn("__tsent", sum(col("__cs")).over(w))
      .withColumn("__gsmin", min(col("__smin")).over(w))
      .withColumn("__gsmax", max(col("__smax")).over(w))
      .withColumn("__gmr", max(col("__mr")).over(w))
      .withColumn("__gmb", max(col("__mb")).over(w))
      .filter(col("term").isNotNull)
    val ok = col("__tsent") === 1L &&
      col("__gsmin") === expect && col("__gsmax") === expect &&
      coalesce(col("__gmr") < depth.toLong, lit(true)) &&
      coalesce(col("__gmb") < width.toLong, lit(true))
    folded.select(col("term"),
      when(ok, col("__est")).otherwise(raise_error(format_string(
        s"cmsEstimate: probe geometry ${depth}x$width does not match " +
          "the sketch (%s sentinel rows, geometry %s..%s) — pass the " +
          "depth/width the sketch was built with, and never merge " +
          "sketches of different geometry",
        col("__tsent").cast("string"),
        (col("__gsmin") / lit(4294967296L)).cast("long").cast("string"),
        (col("__gsmax") % lit(4294967296L)).cast("string"))).cast("long"))
        .as("est"))
  }
}
