package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-curation operators a training-data pipeline runs between
  * cleaning and tokenization: sequence packing, importance-weighted
  * sampling, sliding-window chunking. All decisions are pure functions
  * of the row (md5-derived hashes, literal constants), so reruns,
  * retries and incremental loads agree — and a DuckDB oracle can
  * replay every computation exactly.
  *
  * Scale notes (100 TB):
  *  - packSequences windows PARTITION BY shard — parallelism scales
  *    with the shard count (at scale the shard key is the output
  *    file/shard id), never a single global sort.
  *  - importanceSample and chunkSliding are pure map-side expressions
  *    (filter / explode) — no exchange at all.
  */
object Curate {

  /** Sequence packing — GPT-style concat-and-chunk. Documents are laid
    * end to end in a deterministic hash-shuffled order within each
    * shard (plus one separator token per document, so empty documents
    * still occupy a slot), and the token stream is cut into
    * fixed-`budget` context windows. Emits, per document, the range of
    * packs it lands in: `pack_first`/`pack_last` differ when a document
    * straddles a window boundary. Window is PARTITION BY shard: packing
    * parallelism scales with the shard count, and each shard is an
    * independently reproducible training shard. */
  def packSequences(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", budget: Int = 512,
                    shards: Int = 8): DataFrame = {
    val id = col(idCol)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__ord"), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(
        id,
        pmod(id, lit(shards.toLong)).as("shard"),
        // null text still occupies its separator slot (1 token), so a
        // null-heavy corpus can't poison the cumulative sums with nulls
        (coalesce(Text.wsTokenCount(col(textCol)), lit(0L)) + lit(1L)).as("tokens"),
        Text.md5Hash(concat(lit("pack:"), id.cast("string"))).as("__ord"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .select(id, col("shard"), col("tokens"),
        floor((col("cum") - col("tokens")) / lit(budget.toDouble)).cast(LongType)
          .as("pack_first"),
        floor((col("cum") - lit(1L)) / lit(budget.toDouble)).cast(LongType)
          .as("pack_last"))
  }

  /** Importance-weighted Bernoulli sampling: row `r` survives with
    * probability `weight(r)` (clamped to [0, 1] at `scale` resolution),
    * decided by a pure hash of its key — deterministic, exchange-free,
    * and unbiased when downstream sums multiply by the returned
    * `weight` column (Horvitz–Thompson: 1/p for kept rows). The weight
    * expression must be integer-valued per mille (e.g.
    * `least(lit(1000), col("n_chars"))` for length-proportional
    * sampling) so the acceptance test is an EXACT integer compare that
    * any engine replays bit-identically. */
  def importanceSample(df: DataFrame, keyCol: String, weightPerMille: Column,
                       salt: String = "imp:", scale: Int = 1000): DataFrame = {
    val h = Text.md5Hash(concat(lit(salt), col(keyCol).cast("string"))) % scale
    df.filter(h < weightPerMille)
      .withColumn("weight", lit(scale.toDouble) / weightPerMille.cast("double"))
  }

  /** Token-budget corpus selection — keep documents in quality order
    * until a token budget is exhausted (the "best N tokens" curation
    * step), EXACTLY: a document is kept iff its running token total in
    * (score desc, hash, id) order fits the budget; the hash gives a
    * fair deterministic tie-break inside a score band.
    *
    * The naive plan is a GLOBAL ordered cumsum — a single-reducer
    * window, dead at 100 TB. This is instead a hierarchical prefix
    * refinement, all exact:
    *   L1: per-score token totals (≤ |score domain| rows) → prefix sums
    *       on the driver-size frame → scores that fit wholly are kept
    *       by a broadcast semi-join, NO per-doc window.
    *   L2: the ONE boundary score band is re-split by a monotone
    *       coarsening of the tie-break hash (`buckets` ranges of h);
    *       prefix sums over ≤`buckets` rows decide buckets that fit
    *       wholly.
    *   L3: only the ONE boundary bucket — ≤ band/buckets of the band —
    *       pays a per-doc ordered window.
    * Every window frame is either ≤`buckets` rows or one bucket's
    * docs; the corpus itself is touched by broadcast joins and
    * map-side filters only. */
  def selectByTokenBudget(docs0: DataFrame, idCol: String, scoreCol: String,
                          tokensCol: String, budget: Long,
                          salt: String = "sel:", buckets: Int = 1024): DataFrame = {
    val outCols = docs0.columns.map(col).toSeq
    val bucketWidth = (Text.HashP + buckets - 1) / buckets
    val docs = docs0
      .withColumn("__h", Text.md5Hash(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("__b", (col("__h") / bucketWidth).cast(LongType))
    val cumFrame = Window.unboundedPreceding
    // L1 — per-score totals; the unpartitioned window runs on a frame
    // of at most |score domain| rows, never the corpus
    val l1 = docs.groupBy(col(scoreCol)).agg(sum(col(tokensCol)).as("__gt"))
      .withColumn("__cum", sum(col("__gt")).over(
        Window.orderBy(col(scoreCol).desc).rowsBetween(cumFrame, Window.currentRow)))
      .select(col(scoreCol).as("__s"), (col("__cum") - col("__gt")).as("__before"),
        col("__cum"))
    val j1 = docs.join(broadcast(l1), col(scoreCol) === col("__s"))
    val keptWholeScores = j1.filter(col("__cum") <= budget)
    val boundaryBand = j1.filter(col("__before") < budget && col("__cum") > budget)
    // L2 — inside the single boundary band, by hash-range bucket
    // (bucket id is monotone in h, so bucket order refines (h, id) order)
    val l2 = boundaryBand.groupBy(col("__b"), col("__before"))
      .agg(sum(col(tokensCol)).as("__gt2"))
      .withColumn("__cum2", col("__before") + sum(col("__gt2")).over(
        Window.orderBy(col("__b")).rowsBetween(cumFrame, Window.currentRow)))
      .select(col("__b").as("__b2"), (col("__cum2") - col("__gt2")).as("__before2"),
        col("__cum2"))
    val j2 = boundaryBand.drop("__before", "__cum", "__s")
      .join(broadcast(l2), col("__b") === col("__b2"))
    val keptWholeBuckets = j2.filter(col("__cum2") <= budget)
    // L3 — the one boundary bucket pays the only per-doc window, over
    // at most 1/buckets of the boundary band
    val w3 = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
      .rowsBetween(cumFrame, Window.currentRow)
    val partialBucket = j2.filter(col("__before2") < budget && col("__cum2") > budget)
      .withColumn("__cum3", col("__before2") + sum(col(tokensCol)).over(w3))
      .filter(col("__cum3") <= budget)
    keptWholeScores.select(outCols: _*)
      .unionByName(keptWholeBuckets.select(outCols: _*))
      .unionByName(partialBucket.select(outCols: _*))
  }

  /** Sliding-window chunking: each document becomes ceil-many chunks of
    * `chunkWords` words advancing by `strideWords` (trailing context
    * overlap = chunkWords - strideWords), the standard long-document
    * treatment for embedding models and for context-window-bounded
    * training. Pure explode — map-side, no exchange; chunk count is
    * data-proportional, so the explode cannot amplify skew beyond the
    * document's own length. NULL text yields no chunks (explode of a
    * null sequence) — there is nothing to chunk; empty text yields one
    * empty chunk, mirroring the whitespace-token semantics. */
  def chunkSliding(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", chunkWords: Int = 200,
                   strideWords: Int = 150): DataFrame = {
    require(strideWords >= 1 && chunkWords >= strideWords,
      s"need 1 <= stride <= chunk, got stride=$strideWords chunk=$chunkWords")
    val n = size(col("__w")).cast(LongType)
    // one chunk always exists (split("") yields [""]); beyond the first,
    // one per full stride before the last window
    val nChunks = when(n <= chunkWords, lit(1L))
      .otherwise(lit(1L) + ceil((n - lit(chunkWords.toLong)) / lit(strideWords.toDouble))
        .cast(LongType))
    docs.select(col(idCol), Text.words(col(textCol)).as("__w"))
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0L), nChunks - lit(1L))).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        (col("chunk_idx") * strideWords).as("start_word"),
        least(lit(chunkWords.toLong), size(col("__w")) - col("chunk_idx") * strideWords)
          .cast(LongType).as("chunk_len"),
        Text.md5Hash(array_join(
          slice(col("__w"), (col("chunk_idx") * strideWords + lit(1L)).cast("int"),
            lit(chunkWords)), " ")).as("chunk_hash"))
  }
}
