package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    * stream — never a global sort of the corpus. */
  def topNgrams(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, s"need n>=1, k>=1; got n=$n k=$k")
    docs.select(col(idCol),
        explode(Text.shingles(Text.words(col(textCol)), n)).as("ngram"))
      .groupBy("ngram").agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .orderBy(col("occurrences").desc, col("n_docs").desc, col("ngram"))
      .limit(k)
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
}
