package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training primitives (Sennrich, Haddow
  * & Birch, ACL 2016 — public method): the corpus-statistics half of
  * training a subword tokenizer, distributed.
  *
  * The scale insight BPE training depends on: after ONE corpus-scale
  * aggregation (the word-frequency table), every training step runs at
  * VOCAB scale — pair counting explodes DISTINCT words weighted by
  * their frequency, never the token stream. A 100 TB corpus with a
  * ~10M-word vocabulary trains its merges over 10M rows per round.
  *
  * Determinism: pair counts are exact Long sums; each round's winning
  * merge breaks ties on (count desc, pair asc); merge application is
  * the standard greedy leftmost-first single pass, expressed as an
  * `aggregate` fold over the symbol array (vocab-scale rows only, so
  * the interpreted HOF is off the corpus hot path). Words carry the
  * classic `</w>` end-of-word marker so a word-final pair can never
  * merge with the next word's first symbol.
  */
object Bpe {

  /** End-of-word marker symbol (multi-char, can never equal a
    * single-character initial symbol). */
  val EndMark = "</w>"

  /** ONE corpus pass: the word-frequency table with each word's
    * initial symbol sequence (characters + [[EndMark]]). Everything
    * downstream is vocab-scale. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", concat(split(col("w"), ""), array(lit(EndMark))))

  /** Adjacent-pair counts over a (word, freq, syms) vocab — the BPE
    * training statistic. Symbols never contain whitespace (words are
    * whitespace-split), so the space-joined pair string is
    * unambiguous. Shape: one vocab-scale explode + one hash agg
    * (map-side combined; pair cardinality ≪ exploded size). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), explode(Text.shingles(col("syms"), 2)).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))

  /** Apply ONE merge (a, b) → "ab" to a symbol array: the standard
    * greedy leftmost-first pass, as a fold — append each symbol unless
    * the accumulator ends with `a` and the symbol is `b`, in which
    * case replace the tail with the merged symbol. A just-merged tail
    * equals "ab", not `a`, so overlapping occurrences ([a,a] in
    * [a,a,a] → [aa,a]) merge exactly like the reference algorithm.
    * try_element_at, not element_at: ANSI mode turns the empty-
    * accumulator probe on the first symbol into an error; the NULL it
    * returns instead falls through the `when` to the append branch. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(try_element_at(acc, lit(-1)), x))))
        .otherwise(concat(acc, array(x))))

  /** Train `nMerges` merges. Each round: ONE bounded driver action
    * (the argmax pair — a 1-row TakeOrdered collect, ties on pair
    * asc), then a vocab-scale rewrite, checkpointed so round k+1's
    * plan does not nest round k's (the kmeans/CC lineage discipline).
    * Stops early when no pair occurs twice (the vocabulary is fully
    * merged — continuing would memorize hapax words). Returns the
    * merge table in training order: (step, a, b, n). */
  def trainMerges(docs: DataFrame, textCol: String,
                  nMerges: Int): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var vocab = wordVocab(docs, textCol).localCheckpoint(false)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(1) < 2L) done = true
      else {
        val pair = top(0).getString(0); val n = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        out += ((step, a, b, n))
        val next = vocab.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(false)
        vocab.unpersist()
        vocab = next
        step += 1
      }
    }
    vocab.unpersist()
    out.result()
  }

  /** The vocab after applying a given merge list in order —
    * (word, freq, syms, n_syms). Merges fold into nested column
    * expressions (one `aggregate` per merge), so keep the list
    * bounded (hundreds, not tens of thousands; checkpoint between
    * batches if longer). */
  def vocabAfterMerges(docs: DataFrame, textCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val v0 = wordVocab(docs, textCol)
    val merged = merges.foldLeft(v0) { case (v, (a, b)) =>
      v.withColumn("syms", applyMerge(col("syms"), a, b))
    }
    merged.withColumn("n_syms", size(col("syms")).cast("long"))
  }

  /** Per-document BPE token counts under a trained merge list — the
    * budget statistic a tokenizer-aware pipeline needs. The merge
    * application runs once per DISTINCT word (vocab-scale); the
    * corpus-scale side is a (doc, word, multiplicity) aggregate joined
    * against that map — the word→length map shuffles by word alongside
    * it (both sides hash-partition on the join key; at petabyte scale
    * the vocabulary can have billions of words, so it joins rather
    * than broadcasts — the NgramLm model-join discipline). Docs with
    * no tokens surface with 0. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val wordLen = vocabAfterMerges(docs, textCol, merges)
      .select(col("w"), col("n_syms"))
    val dw = docs.select(col(idCol), explode(Text.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("__c"))
    val counted = dw.join(wordLen, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("__c") * col("n_syms")).as("n_bpe_tokens"))
    docs.select(col(idCol)).join(counted, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
