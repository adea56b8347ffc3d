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
        (Text.wsTokenCount(col(textCol)) + lit(1L)).as("tokens"),
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

  /** Sliding-window chunking: each document becomes ceil-many chunks of
    * `chunkWords` words advancing by `strideWords` (trailing context
    * overlap = chunkWords - strideWords), the standard long-document
    * treatment for embedding models and for context-window-bounded
    * training. Pure explode — map-side, no exchange; chunk count is
    * data-proportional, so the explode cannot amplify skew beyond the
    * document's own length. */
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
