package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus ordering for training-data emission: the deterministic global
  * shuffle and the weighted source interleave that decide WHERE each
  * document lands in the token stream a trainer reads.
  *
  * Both operators are seed-keyed md5 arithmetic (the same portable hash
  * family as [[Text.md5Hash]]), so a re-run — or an independent engine
  * replaying the same formula, which is exactly what the DuckDB oracle
  * does — reproduces the identical order. Neither ever computes a
  * global row_number: a single-reducer global window is the classic
  * 100 TB trap. Shuffle order is (shard, pos-within-shard) — one hash
  * exchange, per-shard sorts; interleave order is a sortable KEY the
  * writer range-partitions on (Spark's range partitioner samples
  * bounds, so the final sort is a terasort, not a single reducer).
  */
object Order {

  /** Deterministic corpus shuffle: assign every row a pseudo-random
    * but reproducible (shard, pos) — shard = seeded-hash mod
    * `shards`, pos = rank of the seeded hash within the shard.
    * Training-data writers emit shard files independently; global
    * read order (shard asc, pos asc) is a fixed permutation of the
    * corpus decided entirely by `seed`.
    *
    * Scale: one hash exchange on `shard` + a per-shard sort inside
    * the window — parallelism equals `shards`, so size it to the
    * cluster (thousands at 100 TB). No global ordering step exists
    * anywhere in the plan.
    */
  def globalShuffle(docs: DataFrame, idCol: String, seed: String,
                    shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val skey = Text.md5Hash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), col(idCol))
    docs.select(col(idCol), skey.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .drop("skey")
  }

  /** Per-shard integrity manifest: row count + an order-independent
    * content checksum (XOR of a salted md5-derived long over the named
    * columns) for each shard of an assigned frame. XOR is commutative,
    * associative and overflow-free, so the checksum is identical under
    * any partitioning and any engine — a trainer (or a resume) verifies
    * the shards it reads equal the shards the pipeline emitted without
    * re-sorting or re-shuffling anything. Including the position column
    * in `cols` also pins the permutation, not just the membership. */
  def shardChecksums(assigned: DataFrame, shardCol: String,
                     cols: Seq[String], salt: String = "ck:"): DataFrame = {
    require(cols.nonEmpty, "shardChecksums needs at least one content column")
    val h = Text.md5Hash(concat_ws("|", lit(salt) +: cols.map(c => col(c).cast("string")): _*))
    assigned.withColumn("__ck", h)
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(__ck)").as("checksum"))
  }

  /** Weighted source interleave: a global training order in which each
    * source appears in proportion to its weight. Classic fair-queueing
    * ("virtual finish time"): the r-th document of source s gets key
    * `r * scale DIV weight(s)` — a source with twice the weight
    * emits documents at twice the rate. Within a source, order is the
    * seeded shuffle hash, so the interleave is also a shuffle.
    *
    * Returns (source, id, r, okey); the corpus order is
    * (okey, source, id) — a SORT KEY, deliberately not a row_number:
    * sorting by key range-partitions at scale, a global row_number
    * cannot. Integer `DIV` keeps the key exact at any corpus size
    * (no double rounding at r ~ 1e11).
    *
    * Sources absent from `weights` are dropped (weight 0); weights
    * must be positive.
    *
    * Plan shape by weight count: at or below
    * [[Curate.LiteralPredicateMaxGroups]] entries the weight lookup is
    * an inlined when-chain (a pure projection — the best plan); beyond
    * that a when-chain per source overflows the Catalyst stack at
    * domain-granularity source counts, so the lookup switches to the
    * broadcast weight-table join of the DataFrame overload. Results
    * are identical on either path.
    */
  def interleaveBySource(docs: DataFrame, sourceCol: String, idCol: String,
                         weights: Map[String, Long], seed: String = "ilv",
                         scale: Long = 1000000L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be positive, got $weights")
    if (weights.size > Curate.LiteralPredicateMaxGroups) {
      val spark = docs.sparkSession
      import spark.implicits._
      interleaveBySource(docs, sourceCol, idCol,
        weights.toSeq.sortBy(_._1).toDF(sourceCol, "weight"), seed, scale)
    } else {
      val wcol = weights.foldLeft(lit(null).cast(LongType)) {
        case (acc, (s, wt)) => when(col(sourceCol) === s, lit(wt)).otherwise(acc)
      }
      val skey = Text.md5Hash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
      val w = Window.partitionBy(col(sourceCol)).orderBy(col("skey"), col(idCol))
      docs.select(col(sourceCol), col(idCol), skey.as("skey"))
        .withColumn("wt", wcol)
        .filter(col("wt").isNotNull)
        .withColumn("r", row_number().over(w).cast(LongType))
        .withColumn("okey", expr(s"(r * $scale) DIV wt"))
        .drop("skey", "wt")
    }
  }

  /** [[interleaveBySource]] with the weights as a (source, weight)
    * DataFrame — the form that scales past literal-predicate source
    * counts: the weight table BROADCASTS into an inner join (which
    * also implements the drop-unweighted rule), so the expression tree
    * stays O(1) at any source count. The table is a dimension by
    * contract (one row per source); it is collected once to validate
    * positivity and per-source uniqueness — the same driver-side
    * footprint the broadcast itself needs.
    */
  def interleaveBySource(docs: DataFrame, sourceCol: String, idCol: String,
                         weights: DataFrame, seed: String,
                         scale: Long): DataFrame = {
    val Array(wsCol, wtCol) = weights.columns
    val wrows = weights
      .select(col(wsCol).cast("string"), col(wtCol).cast(LongType)).collect()
    require(wrows.nonEmpty, "weights table is empty")
    wrows.find(r => r.isNullAt(0) || r.isNullAt(1) || r.getLong(1) <= 0).foreach { r =>
      throw new IllegalArgumentException(
        s"weights must be non-null and positive, got ($r)")
    }
    require(wrows.map(_.getString(0)).distinct.length == wrows.length,
      "weights table has duplicate sources")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = wrows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("__wsrc", "wt")
    val skey = Text.md5Hash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("skey"), col(idCol))
    docs.select(col(sourceCol), col(idCol), skey.as("skey"))
      .join(broadcast(wdf), col(sourceCol) === col("__wsrc"))
      .withColumn("r", row_number().over(w).cast(LongType))
      .withColumn("okey", expr(s"(r * $scale) DIV wt"))
      .drop("skey", "wt", "__wsrc")
  }

  /** Emit the corpus as training shard FILES in the deterministic
    * [[globalShuffle]] order — the composition the ordering operators
    * exist for: (shard, pos) keys flow into
    * [[graft.io.Tables.writeSorted]], whose range partitioner samples
    * key bounds (a terasort, never a single reducer), so every shard
    * file covers a DISJOINT slice of the global order and a trainer
    * streams files in name order to read the exact seeded permutation.
    * Parquet footers carry tight (shard, pos) min/max for resume-from-
    * position scans. */
  def writeShuffledShards(docs: DataFrame, idCol: String, seed: String,
                          shards: Int, path: String): Unit = {
    val ord = globalShuffle(docs, idCol, seed, shards)
    graft.io.Tables.writeSorted(docs.join(ord, Seq(idCol)), path,
      Seq("shard", "pos"), files = shards)
  }

  /** Resume a training read of [[writeShuffledShards]] output from a
    * position cursor: rows strictly after (shard, pos) in the global
    * order, in one predicate the scan can push down. Because every
    * file — and every parquet row group inside it — covers a disjoint
    * (shard, pos) range with tight footer min/max, the pushed
    * `shard > s OR (shard = s AND pos > p)` skips all fully-consumed
    * row groups at the reader, so resuming at 99% of a 100 TB run
    * reads ~1% of the bytes. The caller sorts by (shard, pos) when
    * order matters; the rows come back file-disjoint either way. */
  def readShardsFrom(spark: org.apache.spark.sql.SparkSession, path: String,
                     shard: Long, pos: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("shard") > shard ||
        (col("shard") === shard && col("pos") > pos))

  /** Emit training shard files in [[curriculumOrder]]'s reading order
    * (best-quality buckets first, seeded shuffle inside each bucket,
    * bigram-less docs last). The DESC-NULLS-LAST bucket order becomes
    * one ascending emission key — negated bucket, empties at
    * Long.MaxValue (bucket_lo is micro-nat-bounded, so negation cannot
    * overflow) — because a range partitioner wants a single sort
    * direction. Same disjoint-files contract as
    * [[writeShuffledShards]]. */
  def writeCurriculumShards(docs: DataFrame, idCol: String, textCol: String,
                            path: String, files: Int,
                            width: Long = 250000L, seed: String = "cur"): Unit = {
    val ord = curriculumOrder(docs, idCol, textCol, width, seed)
      .withColumn("ckey", when(col("bucket_lo").isNull, lit(Long.MaxValue))
        .otherwise(-col("bucket_lo")))
      .select(col(idCol), col("ckey"), col("skey"))
    graft.io.Tables.writeSorted(docs.join(ord, Seq(idCol)), path,
      Seq("ckey", "skey", idCol), files)
  }

  /** Curriculum ordering: quality-bucketed corpus order with a seeded
    * shuffle inside each bucket. Quality is the per-bigram mean
    * log-probability under the corpus's own bigram LM
    * ([[NgramLm.score]], micro-nats), floored to buckets of `width`;
    * the training order is (bucket_lo DESC — most-typical text first —
    * then skey, id). Docs with no bigrams get a NULL bucket and sort
    * last on both engines (explicit NULLS LAST).
    *
    * Exactness: the mean is one IEEE double divide + floor (bit-equal
    * on any engine); bucketing is the same integer `q - pmod(q, width)`
    * identity as [[CorpusStats.lengthHistogram]], exact for negative
    * q where a truncating integer division would round the wrong way.
    *
    * Scale: inherits NgramLm's linear passes; the ordering itself adds
    * only a projection — the output is a SORT KEY for the writer's
    * range partitioner, never a global row_number.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
                      width: Long = 250000L, seed: String = "cur"): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val q = floor(col("lp_micro").cast("double") / col("n_bigrams").cast("double"))
      .cast(LongType)
    val skey = Text.md5Hash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    NgramLm.score(docs, idCol, textCol)
      .withColumn("q_micro", when(col("n_bigrams") > 0, q))
      .select(col(idCol), col("n_bigrams"), col("q_micro"),
        (col("q_micro") - pmod(col("q_micro"), lit(width))).as("bucket_lo"),
        skey.as("skey"))
  }
}
