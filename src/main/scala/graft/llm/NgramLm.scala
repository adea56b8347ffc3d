package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count-based n-gram language-model scoring — the CCNet-style quality
  * gate: score each document by how surprising its bigrams are under a
  * bigram LM trained on the corpus itself (add-one smoothing). Junk
  * (lorem spam, mojibake, keyword stuffing) scores far from the bulk
  * of the corpus; hapax-heavy docs are novel or noisy.
  *
  * All outputs are exact integers: counts, hapax counts, and the
  * log-probability in MICRO-NATS (`floor(1e6 * ln p)` per bigram,
  * summed as longs) — order-independent under any partitioning, so a
  * given engine always reproduces itself exactly, and a plain double
  * sum's merge-order dependence never appears. One residual
  * cross-engine caveat, unlike this repo's md5/integer-only scores:
  * `ln` comes from the platform's libm (Java Math.log vs DuckDB's C
  * libm), which are both <=1-ulp but not correctly rounded — a ratio
  * whose `ln(p)*1e6` lands within ~1 ulp of an integer could floor
  * differently across engines. The oracle gate exercises every
  * (c_bg, c_w1, V) triple in the fixtures at both SFs; no divergence
  * observed, but the risk is inherent to any transcendental in an
  * exact-compare contract. GUARDED in-repo, not just recorded:
  * OrderStatsSpec ("lp_micro floor boundaries") recomputes every
  * fixture triple at sf0.001 AND sf0.01 and asserts `ln(p)*1e6` sits
  * >2e-8 (≫2 ulp) from the nearest integer, so a platform libm change
  * cannot silently flip a floor and masquerade as a regression — it
  * would first have to fail that named spec.
  *
  * Scale: the full exploded bigram stream crosses exactly ONE
  * stream-wide hash operation — the (doc, bigram, multiplicity)
  * aggregation — and is tokenized exactly once (the two consumers of
  * that aggregate share its exchange, which Catalyst de-duplicates via
  * ReuseExchange; plan-asserted in NgramLmSpec). Everything after is
  * DISTINCT-PAIR-sized: the model derives from the pair frame (C(bg)
  * sums the multiplicities; the prefix count C(w1) is the sum of
  * C(bg) over bigrams starting with w1, so nothing ever needs a
  * second pass over the stream), the model joins back onto the pair
  * frame, and the per-doc sums weight by the multiplicity. No driver
  * collect, no broadcast of the model (a 100 TB corpus has billions
  * of distinct bigrams; the model JOINS, it does not ship — the one
  * broadcast is the single-row vocabulary count).
  */
object NgramLm {

  /** Exploded (id, bigram) stream; docs with <2 words contribute
    * nothing (explode of an empty shingle array). The word array is
    * materialized as a column BEFORE shingling: interpreted HOF
    * lambdas get no common-subexpression elimination, so an inline
    * `shingles(words(text))` would re-run the regex split per element
    * access — O(words^2) splits per document. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Text.words(col(textCol)).as("w"))
      .select(col(idCol), explode(Text.shingles(col("w"), 2)).as("bg"))

  /** Per-document LM score under the corpus's own bigram model.
    *
    * Output (one row per input doc, including <2-word docs at 0):
    *  - n_bigrams: bigram tokens in the doc
    *  - n_hapax: doc bigrams occurring exactly once in the corpus
    *  - sum_bg_count: sum of corpus frequencies of the doc's bigrams
    *  - lp_micro: add-one-smoothed log-prob in micro-nats,
    *    sum over bigrams of floor(1e6 * ln((C(bg)+1)/(C(w1)+V)))
    *    where C(w1) counts w1 as a bigram prefix and V = |prefixes|.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // collapse the exploded stream to distinct (doc, bigram) pairs with
    // a multiplicity FIRST — the partial aggregation absorbs repeats
    // map-side, and every later operation (model build, model join,
    // per-doc sums) runs at distinct-pair scale instead of token scale
    // the explicit filter is a no-op (concat_ws never yields null) but
    // makes the two consumers' inferred null filters IDENTICAL below
    // the aggregation, so their exchanges canonicalize equal and
    // ReuseExchange plans one explode instead of one per consumer
    val pairs = docBigrams(docs, idCol, textCol)
      .filter(col("bg").isNotNull && split(col("bg"), " ").getItem(0).isNotNull)
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
    val bgCounts = pairs.groupBy("bg").agg(sum(col("c")).as("c_bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    // prefix counts and vocabulary derive from the MODEL table:
    // C(w1) = sum of C(bg) over bigrams with prefix w1
    val w1Counts = bgCounts.groupBy("w1").agg(sum(col("c_bg")).as("c_w1"))
    // count(c_w1), not count(1): referencing the aggregated column
    // keeps RemoveRedundantAggregates from collapsing this branch into
    // a distinct-w1 scan of the RAW stream, which would re-explode the
    // corpus instead of reusing the shared pair/bigram exchanges
    // (c_w1 is never null, so the two counts are identical)
    val vocab = w1Counts.agg(count(col("c_w1")).as("v"))
    val model = bgCounts
      .join(w1Counts, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("bg"), col("c_bg"),
        floor(log((col("c_bg") + lit(1L)).cast("double") /
          (col("c_w1") + col("v")).cast("double")) * lit(1000000.0)).as("lp_micro"))
    val scored = pairs
      .join(model, "bg")
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("n_bigrams"),
        sum(when(col("c_bg") === 1, col("c")).otherwise(lit(0L))).as("n_hapax"),
        sum(col("c_bg") * col("c")).as("sum_bg_count"),
        sum(col("lp_micro") * col("c")).as("lp_micro"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).cast(LongType).as("n_bigrams"),
        coalesce(col("n_hapax"), lit(0L)).cast(LongType).as("n_hapax"),
        coalesce(col("sum_bg_count"), lit(0L)).cast(LongType).as("sum_bg_count"),
        coalesce(col("lp_micro"), lit(0L)).cast(LongType).as("lp_micro"))
  }
}
