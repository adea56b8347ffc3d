package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, per the scale brief:
  *  - brute-force top-k: exact, linear scan — the baseline and the
  *    within-bucket kernel;
  *  - LSH (random hyperplane) bucketing: candidate generation is a
  *    groupBy on the bucket signature, so the shuffle stays linear in
  *    data and the quadratic part is confined to buckets.
  *
  * Dot products fold sequentially over the array (functions.aggregate),
  * so results are bit-deterministic regardless of partitioning. The
  * quantized variants (`*Q`) work on round(x*1000) longs — exact integer
  * arithmetic, reproducible in any engine, used by the oracle-checked
  * queries; the double variants serve ranking in production. */
object Similarity {

  /** Default degenerate-bucket cap for the LSH self-joins; mirrored into
    * the DuckDB oracle SQL so code and oracle can't drift. Far above any
    * bucket at harness scale (max observed 28 at sf0.1), but the guard a
    * 100 TB corpus needs: millions of near-identical/zero vectors on one
    * signature would otherwise make the self-join O(bucket²). */
  val DefaultMaxBucket = 1000

  def toDouble(e: Column): Column = transform(e, x => x.cast("double"))

  /** Quantize to thousandths as longs — exact, portable arithmetic.
    * Native kernel (codegen'd loop): the `transform` formulation is a
    * higher-order function, which Spark executes as CodegenFallback —
    * an interpreted lambda per element on the most ubiquitous
    * expression in the ANN paths. [[quantizeHof]] keeps the
    * declarative form as the bit-equality anchor. */
  def quantize(e: Column, scale: Int = 1000): Column =
    graft.expr.kernels.NativeFns.quantizeArr(e, scale)

  /** The HOF quantize the native kernel replaced — differential
    * anchor (NativeExprSpec), the dotQHof pattern. */
  private[graft] def quantizeHof(e: Column, scale: Int = 1000): Column =
    transform(e, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot — native Catalyst expression (codegen'd single
    * loop; see graft.expr.kernels). */
  def dotQ(a: Column, b: Column): Column = graft.expr.kernels.NativeFns.longDot(a, b)

  /** Largest |element| of a float embedding, in exact double arithmetic
    * (float→double is exact; abs/max are rounding-free), so both
    * engines derive bit-identical per-vector scales. */
  def absMax(e: Column): Column =
    graft.expr.kernels.NativeFns.absMaxArr(e)

  /** The HOF absMax the native kernel replaced — differential anchor. */
  private[graft] def absMaxHof(e: Column): Column =
    array_max(transform(e, x => abs(x.cast("double"))))

  /** Per-vector symmetric int8 quantization — the storage/serving
    * format of a 100 TB embedding store: 4× smaller than float32,
    * integer-SIMD dot products, dequant is `q * amax / 127`.
    * q_i = floor(v_i * (127/amax) + 0.5), clamped by construction to
    * [-127, 127]; an all-zero vector quantizes to zeros. Rounding is
    * spelled floor(x + 0.5) — NEVER round(): round-half-even vs
    * half-away ties would silently diverge between engines, floor of
    * the same double is identical everywhere. `amaxCol` is the
    * precomputed [[absMax]] (passed in so the plan evaluates it once,
    * not once per element). */
  def quantizeInt8(e: Column, amaxCol: Column): Column =
    graft.expr.kernels.NativeFns.int8Quantize(e, amaxCol)

  /** The HOF int8 quantize the native kernel replaced — anchor. */
  private[graft] def quantizeInt8Hof(e: Column, amaxCol: Column): Column =
    when(amaxCol === 0.0, transform(e, _ => lit(0).cast("tinyint")))
      .otherwise(transform(e, x =>
        floor(x.cast("double") * (lit(127.0) / amaxCol) + lit(0.5)).cast("tinyint")))

  /** (id, q8, amax) quantization frame — amax materialized as a column
    * first so the per-element lambda references an attribute, not a
    * re-evaluated aggregate (the interpreted-HOF CSE trap, PLANS.md
    * round-9 lesson). */
  def quantizeInt8Frame(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol), col(embCol), absMax(col(embCol)).as("amax"))
      .select(col(idCol), quantizeInt8(col(embCol), col("amax")).as("q8"),
        col("amax"))

  /** Brute-force top-k over int8-quantized vectors. Ranking rescales
    * each integer dot by the CANDIDATE's amax (the query's amax is a
    * positive constant within its rank group, so it cannot reorder and
    * is dropped) — without the rescale, candidates quantized with
    * different scales are not comparable. At cluster scale the
    * candidate side streams 8-bit arrays instead of 32-bit floats:
    * same plan shape as [[bruteForceTopKQ]] (map-side broadcast probe,
    * one per-query top-k window), quarter the bytes. */
  def int8TopK(queries: DataFrame, candidates: DataFrame, qId: String,
               cId: String, embCol: String, k: Int): DataFrame = {
    // codes stay tinyint end to end — the native TinyDot scores the
    // 1-byte arrays directly (the HOF form widened both sides to long
    // with an interpreted transform per pair)
    val q = quantizeInt8Frame(queries, qId, embCol)
      .select(col(qId).as("qid"), col("q8").as("qe"))
    val c = quantizeInt8Frame(candidates, cId, embCol)
      .select(col(cId).as("cid"), col("q8").as("ce"),
        col("amax").as("c_amax"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("qdot", graft.expr.kernels.NativeFns.tinyDot(col("qe"), col("ce")))
    val w = Window.partitionBy(col("qid"))
      .orderBy((col("qdot").cast("double") * col("c_amax")).desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("qdot"))
  }

  /** Two-stage ANN serving: int8 COARSE candidate generation (top `m`
    * per query over the 4×-smaller quantized store) followed by an
    * EXACT re-rank of only those m candidates with the full-precision
    * milli-quantized dot — the production recall/cost dial (rerank
    * cost per query is m·dim regardless of corpus size; raise m to
    * buy back any recall the int8 coarse pass loses). Candidate join
    * and rescore both run at |queries|×m scale; the full-precision
    * store is touched only via the semi-join-shaped candidate
    * equi-join, never scanned per query. */
  def rerankTopK(queries: DataFrame, candidates: DataFrame, qId: String,
                 cId: String, embCol: String, k: Int, m: Int): DataFrame = {
    require(m >= k, s"coarse depth m=$m must be >= k=$k")
    val coarse = int8TopK(queries, candidates, qId, cId, embCol, k = m)
      .select(col("qid"), col("cid"))
    val qe = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val ce = candidates.select(col(cId).as("cid"), quantize(col(embCol)).as("ce"))
    val rescored = coarse.join(qe, "qid").join(ce, "cid")
      .withColumn("dot", dotQ(col("qe"), col("ce")))
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("cid"))
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("dot"))
  }

  /** HOF formulation kept for differential testing (NativeExprSpec). */
  private[graft] def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Product-quantization ANN serving (Jégou, Douze & Schmid, TPAMI
    * 2011, "Product quantization for nearest neighbor search" — public
    * method): the embedding dimension splits into `m` subspaces, each
    * with its own small codebook; a vector's PQ code is its m nearest
    * codeword ids — m SMALL INTS replacing dim floats (here 4 codes
    * for a 64-dim vector: 64× narrower than the milli-quantized store,
    * 16× narrower than int8). Serving is asymmetric-distance (ADC):
    * per query, one m×k lookup table of exact sub-dot-products; a
    * candidate's approximate score is m table lookups — no per-
    * candidate vector arithmetic at all. Top-`coarse` by ADC then
    * rescore EXACTLY, the [[rerankTopK]] recall/cost dial.
    *
    * Codebooks are one deterministic Lloyd half-step from the label
    * init (per-(subspace, label) floor-mean of candidate sub-vectors —
    * the same exact-integer training convention as the IVF coarse
    * quantizer), so training, codes, ADC and rescore all replay
    * bit-for-bit in the oracle. Argmin ties break on lowest label via
    * the (dist, label) struct-min, mirrored by the oracle's
    * `ORDER BY d, l` rank.
    *
    * Scale: training is one posexplode aggregation collecting
    * k×dim longs (tiny by contract). Encoding is map-side (m×k
    * integer sub-distances per vector; sub-slices materialize as
    * columns first — interpreted HOF lambdas get no CSE). The coarse
    * scan projects ONLY (cid, m codes) — at 100 TB the per-query scan
    * reads the m-byte code column, never the vectors — against
    * broadcast per-query LUTs; WindowGroupLimit partials cut each
    * partition to `coarse` rows before the exchange; the exact rescore
    * touches coarse×|queries| vectors only. */
  def pqTopK(queries: DataFrame, candidates: DataFrame, qId: String,
             cId: String, embCol: String, labelCol: String, k: Int,
             m: Int = 4, dim: Int = 64, coarse: Int = 20): DataFrame = {
    val byLabel = pqCodebooks(candidates, embCol, labelCol)
    val codes = pqEncodeFrame(candidates, cId, embCol, byLabel, m, dim)
    val store = candidates.select(col(cId).as("cid"), quantize(col(embCol)).as("ce"))
    pqServe(byLabel, codes, store, queries, qId, embCol, k, m, dim, coarse)
  }

  /** PQ codebook training: per (label, pos) floor-mean of the
    * candidate corpus — one deterministic Lloyd half-step from the
    * label init, exact integer arithmetic. Collects k×dim longs (tiny
    * by contract). */
  def pqCodebooks(candidates: DataFrame, embCol: String,
                  labelCol: String): Map[Long, IndexedSeq[Long]] =
    pqCodebooksQ(candidates, quantize(col(embCol)), col(labelCol))

  /** The trainer over a PRE-QUANTIZED long-array column and an
    * arbitrary group init — shared by [[pqCodebooks]] (label init over
    * raw quantized vectors) and the residual codebooks of
    * [[persistIvfPqResidualIndex]] (cid-modulo init over residual
    * arrays: the label init degenerates there, since per-label
    * residual means are ~zero by construction). */
  private def pqCodebooksQ(df: DataFrame, qCol: Column,
                           groupCol: Column): Map[Long, IndexedSeq[Long]] =
    df.select(groupCol.cast("long").as("lbl"),
        posexplode(qCol).as(Seq("pos", "v")))
      .groupBy(col("lbl"), col("pos"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("c"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toIndexedSeq).toMap

  /** Encode vectors to their m-code PQ representation: per-subspace
    * argmin over the codewords (exact integer distances; ties take the
    * lowest label via the (dist, label) struct-min). Returns
    * (cid, codes: array<long> of length m) — the m-small-int column a
    * 100 TB store persists instead of the vectors. Sub-slices
    * materialize as columns first (interpreted HOF lambdas get no
    * CSE). */
  def pqEncodeFrame(df: DataFrame, idCol: String, embCol: String,
                    byLabel: Map[Long, IndexedSeq[Long]], m: Int,
                    dim: Int): DataFrame =
    pqEncodeFrameQ(df.select(col(idCol).as("cid"),
      quantize(col(embCol)).as("ce")), byLabel, m, dim)

  /** The encoder over a pre-quantized (cid, ce) frame — shared with
    * the residual path, where `ce` carries residual arrays. */
  private def pqEncodeFrameQ(dfQ: DataFrame,
                             byLabel: Map[Long, IndexedSeq[Long]], m: Int,
                             dim: Int): DataFrame =
    pqEncodeKeepCe(dfQ, byLabel, m, dim).select(col("cid"), col("codes"))

  /** [[pqEncodeFrameQ]] keeping the quantized vector column — the
    * refinement loop reads (ce, codes) together without a self-join. */
  private def pqEncodeKeepCe(dfQ: DataFrame,
                             byLabel: Map[Long, IndexedSeq[Long]], m: Int,
                             dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val labels = byLabel.keys.toSeq.sorted
    val withSubs = (0 until m).foldLeft(dfQ.select(col("cid"), col("ce"))) {
      (d, s) => d.withColumn(s"__sub$s", slice(col("ce"), s * sub + 1, sub))
    }
    // argmin by the expanded identity: Σ(x−c)² = Σx² − 2Σxc + Σc², and
    // Σx² is constant per (row, subspace), so ranking by
    // (Σc² − 2·dot(x, c)) is EXACTLY the squared-distance order (same
    // integers ± a per-row constant, ties identical). The native
    // ArgminCentroid kernel carries the sub-codebooks as reference
    // data — generated code stays fixed-size at the standard k=256
    // (the literal struct-min chain emitted O(k·dim) literals and
    // stops compiling near 400 entries; see kmeansClusters).
    val coded = (0 until m).foldLeft(withSubs) { (d, s) =>
      d.withColumn(s"__code$s", graft.expr.kernels.NativeFns.argminCentroid(
        col(s"__sub$s"),
        labels.map(l => l -> byLabel(l).slice(s * sub, (s + 1) * sub))))
    }
    coded.select(col("cid"), col("ce"),
      array((0 until m).map(s => col(s"__code$s")): _*).as("codes"))
  }

  /** Lloyd-REFINED PQ codebooks — the FAISS training practice (~25
    * refinement iterations per subspace) where [[pqCodebooks]] alone
    * is the label init plus a single half-step: each round re-assigns
    * every sub-vector to its nearest codeword (the [[pqEncodeFrameQ]]
    * argmin — exact integer distances, ties on lowest codeword) and
    * recomputes each codeword as the floor-mean of its assigned
    * sub-vectors, keeping a codeword UNCHANGED when no vector picks
    * it (the deterministic empty-cell rule; in SQL a LEFT JOIN +
    * coalesce, so the whole training replays in the oracle like
    * [[kmeansClusters]]' unrolled rounds). Per round: ONE map-side
    * encode + ONE k×dim-bounded collect (the k-means contract) —
    * assignments never leave the cluster. The recall win is measured
    * in-engine by the `pq_it2` / `ivfpq_probe2_it2` ledger rows at
    * IDENTICAL serving cost (same m, coarse, scanned-code volume —
    * refinement only moves codeword positions). */
  def pqCodebooksRefined(candidates: DataFrame, idCol: String, embCol: String,
                         labelCol: String, m: Int = 4, dim: Int = 64,
                         rounds: Int = 2,
                         init: Option[Map[Long, IndexedSeq[Long]]] = None): Map[Long, IndexedSeq[Long]] = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val dfQ = candidates.select(col(idCol).as("cid"),
      quantize(col(embCol)).as("ce"))
    // `init` lets a caller that already trained the label-init books
    // (both recall ledgers serve the init and the refined variant)
    // skip retraining them — one corpus aggregation saved
    refineBooksQ(dfQ,
      init.getOrElse(pqCodebooks(candidates, embCol, labelCol)), m, dim, rounds)
  }

  /** The Lloyd-refinement loop over a pre-quantized (cid, ce) frame —
    * shared by [[pqCodebooksRefined]] (raw vectors, label init) and
    * the residual build (`refineRounds` on [[buildIvfPqResidual]]:
    * residual arrays, cid-modulo init). */
  private def refineBooksQ(dfQ: DataFrame, init: Map[Long, IndexedSeq[Long]],
                           m: Int, dim: Int,
                           rounds: Int): Map[Long, IndexedSeq[Long]] = {
    val sub = dim / m
    var books = init
    for (_ <- 0 until rounds) {
      val upd = pqEncodeKeepCe(dfQ, books, m, dim)
        .select(col("codes"), posexplode(col("ce")).as(Seq("pos", "v")))
        .select(element_at(col("codes"),
            (expr(s"pos div $sub") + 1).cast("int")).as("l"),
          col("pos"), col("v"))
        .groupBy(col("l"), col("pos"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("c"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      books = books.map { case (l, vec) =>
        l -> vec.indices.map(p => upd.getOrElse((l, p), vec(p))).toIndexedSeq
      }
    }
    books
  }

  /** ADC serving over a code store: per-query exact-integer lookup
    * tables (m×k sub-dots, broadcast), coarse top-`coarse` by m table
    * lookups against the (cid, codes) column only, exact rescore of
    * the coarse set from the full store. Trains nothing — the serving
    * path of [[persistPqIndex]]. */
  def pqServe(byLabel: Map[Long, IndexedSeq[Long]], codes: DataFrame,
              store: DataFrame, queries: DataFrame, qId: String,
              embCol: String, k: Int, m: Int, dim: Int,
              coarse: Int): DataFrame = {
    require(coarse >= k, s"coarse depth $coarse must be >= k=$k")
    val (qLut, adc) = pqLutAndAdc(byLabel, queries, qId, embCol, m, dim)
    val scored = codes.crossJoin(broadcast(qLut)).withColumn("adc", adc)
    pqCoarseRescore(scored, queries, qId, embCol, store, k, coarse)
  }

  /** The per-query ADC machinery shared by [[pqServe]] and
    * [[ivfPqTopK]]: a (qid, __lut0..__lut{m-1}) frame (tiny — one row
    * per query, each lut an array of k exact-integer sub-dots) and the
    * ADC expression over a joined `codes` column.
    *
    * O(1) ADC per (row, subspace): each subspace's per-query lookup
    * table materializes as ONE array column on the (tiny, broadcast)
    * query side, and a candidate's ADC is m positional element_at
    * lookups on its codes — not a when-chain evaluating k comparisons
    * per subspace per row (O(m·k) work AND O(m·k) generated code,
    * unsustainable at the standard k=256). Positional indexing needs
    * the codeword ids dense 0..k-1 (true for the trained codebooks
    * here and in any production build); a sparse id space falls back
    * to the comparison chain. For codes encoded against the SAME
    * codebooks — the index invariant — the two forms are
    * bit-identical (exact integers, identical sum order); a
    * foreign/corrupt code would read NULL under indexing vs 0 under
    * the chain, both of which sink it in the ranking. */
  private def pqLutAndAdc(byLabel: Map[Long, IndexedSeq[Long]],
                          queries: DataFrame, qId: String, embCol: String,
                          m: Int, dim: Int): (DataFrame, Column) = {
    val sub = dim / m
    val labels = byLabel.keys.toSeq.sorted
    val dense = labels == (0L until labels.size.toLong)
    val q0 = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val qLut =
      if (dense) {
        // native kernel: ONE codegen'd double loop per (query,
        // subspace) with the codebooks as a reference object — the
        // aggregate×zip_with form ran an interpreted lambda per
        // element per (query, label, subspace) on every serve AND
        // inlined O(k·dim) literals into the plan (the Janino-ceiling
        // disease ArgminCentroid closed for the assign path).
        // [[pqSubLutHof]] keeps the HOF form as the bit-equality
        // anchor (NativeExprSpec differential, both eval paths).
        val books = labels.map(byLabel)
        (0 until m).foldLeft(q0) { (d, s) =>
          d.withColumn(s"__lut$s",
            graft.expr.kernels.NativeFns.pqSubLut(col("qe"), books, s, sub))
        }.drop("qe")
      } else {
        // sparse-label fallback (never produced by the trainers here):
        // per-label scalar luts via the HOF form
        val qSubs = (0 until m).foldLeft(q0) { (d, s) =>
          d.withColumn(s"__qsub$s", slice(col("qe"), s * sub + 1, sub))
        }
        def lutFor(s: Int, l: Long): Column =
          aggregate(zip_with(col(s"__qsub$s"),
            array(byLabel(l).slice(s * sub, (s + 1) * sub).map(lit): _*),
            (x, y) => x * y), lit(0L), (a, v) => a + v)
        val dropCols = "qe" +: (0 until m).map(s => s"__qsub$s")
        labels.foldLeft(qSubs) { (d, l) =>
          (0 until m).foldLeft(d) { (d2, s) =>
            d2.withColumn(s"__lut_${s}_$l", lutFor(s, l))
          }
        }.drop(dropCols: _*)
      }
    val adc =
      if (dense)
        (0 until m).map { s =>
          element_at(col(s"__lut$s"),
            (element_at(col("codes"), s + 1) + lit(1L)).cast("int"))
        }.reduce(_ + _)
      else
        (0 until m).map { s =>
          labels.map(l => when(element_at(col("codes"), s + 1) === l,
            col(s"__lut_${s}_$l")).otherwise(0L)).reduce(_ + _)
        }.reduce(_ + _)
    (qLut, adc)
  }

  /** The aggregate×zip_with LUT build the [[graft.expr.kernels.PqSubLut]]
    * kernel replaced — kept as the bit-equality differential anchor
    * (NativeExprSpec), the dotQHof convention. `books` must be
    * label-ordered (dense 0..k-1). */
  private[graft] def pqSubLutHof(qe: Column, books: Seq[IndexedSeq[Long]],
                                 s: Int, sub: Int): Column =
    array(books.map { cw =>
      aggregate(zip_with(slice(qe, s * sub + 1, sub),
        array(cw.slice(s * sub, (s + 1) * sub).map(lit): _*),
        (x, y) => x * y), lit(0L), (a, v) => a + v)
    }: _*)

  /** Coarse top-`coarse` by ADC then exact rescore to top-`k` — the
    * tail shared by [[pqServe]] and [[ivfPqTopK]]. `scored` must carry
    * (qid, cid, adc). */
  private def pqCoarseRescore(scored: DataFrame, queries: DataFrame,
                              qId: String, embCol: String, store: DataFrame,
                              k: Int, coarse: Int): DataFrame = {
    val wCoarse = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid"))
    val coarseSet = scored.withColumn("__rn", row_number().over(wCoarse))
      .filter(col("__rn") <= coarse)
      .select(col("qid"), col("cid"), col("adc"))
    val qe = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val rescored = coarseSet.join(qe, "qid").join(store, "cid")
      .withColumn("dot", dotQ(col("qe"), col("ce")))
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("cid"))
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("dot"), col("adc"))
  }

  /** Persist a PQ index: `path/codebooks` (lbl, pos, c) and
    * `path/codes` (cid, codes array<long>) — the write-once artifact;
    * serving reloads both and touches the original store only for the
    * final rescore. `train` optionally supplies the codebook-training
    * frame (the production shape: codebooks train ONCE on a
    * representative sample, codes are written for the current corpus
    * and later batches [[appendToPqIndex]] against the frozen books);
    * it defaults to `df` itself. */
  def persistPqIndex(df: DataFrame, idCol: String, embCol: String,
                     labelCol: String, path: String, m: Int = 4,
                     dim: Int = 64, train: Option[DataFrame] = None): Unit = {
    val byLabel = pqCodebooks(train.getOrElse(df), embCol, labelCol)
    writePqCodebooks(df.sparkSession, byLabel, path)
    pqEncodeFrame(df, idCol, embCol, byLabel, m, dim)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  private def writePqCodebooks(spark: org.apache.spark.sql.SparkSession,
                               byLabel: Map[Long, IndexedSeq[Long]],
                               path: String): Unit = {
    import spark.implicits._
    byLabel.toSeq.sortBy(_._1)
      .flatMap { case (l, cw) => cw.zipWithIndex.map { case (c, p) => (l, p, c) } }
      .toDF("lbl", "pos", "c")
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Append a new batch to a persisted PQ index WITHOUT retraining —
    * the daily-embedding-delta path, mirroring [[appendToIvfIndex]]:
    * codebooks are FROZEN after training (retraining is a deliberate
    * offline rebuild, the standard PQ practice), so the batch encodes
    * map-side against the reloaded books and its codes append as new
    * files; the base code store is never rewritten or rescanned.
    * Encoding is a pure per-row function of the frozen codebooks, so
    * index-after-append EQUALS index-rebuilt-from-scratch bit-for-bit
    * — and so does every serving answer (LlmSpec differential; the
    * llm_ann_pq_append oracle row shares the full-build oracle). */
  def appendToPqIndex(df: DataFrame, idCol: String, embCol: String,
                      path: String, m: Int = 4, dim: Int = 64): Unit =
    // under the CODES lock so appends serialize with compactFlatCodes
    // (which renames the codes dir aside mid-publish); plain file
    // appends otherwise — no replay protection, the pre-existing
    // contract for the flat family
    graft.io.Tables.withStoreLock(df.sparkSession, s"$path/codes") {
      val (byLabel, _) = readPqIndex(df.sparkSession, path)
      validateCodebooks(df.sparkSession, byLabel, m, dim, path)
      pqEncodeFrame(df, idCol, embCol, byLabel, m, dim)
        .write.mode("append").parquet(s"$path/codes")
    }

  /** Fail-loud layout check for append-against-frozen-codebooks: the
    * caller's (m, dim) must match the persisted index, or the reloaded
    * codeword arrays would slice wrong and the batch would encode (and
    * then SERVE) garbage codes silently — mis-sliced sub-vectors still
    * argmin to *some* codeword, so nothing downstream errors. `dim`
    * is checked against the codebook vector lengths; `m` is checked
    * against ONE stored code row's array length (codebooks alone
    * cannot catch a wrong-but-divisible m, e.g. m=2 against an m=4
    * index at the same dim — the appended codes arrays would be the
    * wrong length and serving would element_at past their end,
    * silently nulling ADC for appended vectors). */
  private def validateCodebooks(spark: org.apache.spark.sql.SparkSession,
                                byLabel: Map[Long, IndexedSeq[Long]],
                                m: Int, dim: Int, path: String): Unit = {
    require(byLabel.nonEmpty, s"append: no codebooks found under $path")
    require(m >= 1 && dim % m == 0,
      s"append: dim=$dim must divide into m=$m subspaces")
    val badLen = byLabel.collect { case (l, cw) if cw.length != dim => l -> cw.length }
    require(badLen.isEmpty,
      s"append: dim=$dim does not match the index at $path — codebook " +
        s"vectors have length ${badLen.head._2} (label ${badLen.head._1}); " +
        "pass the (m, dim) the index was built with")
    val storedM = spark.read.parquet(s"$path/codes")
      .select(size(col("codes"))).head(1)
    storedM.foreach(r => require(r.getInt(0) == m,
      s"append: m=$m does not match the index at $path — stored code " +
        s"arrays have length ${r.getInt(0)}; pass the (m, dim) the index " +
        "was built with"))
  }

  /** Reload a persisted PQ index → (codebooks map, codes frame). */
  def readPqIndex(spark: org.apache.spark.sql.SparkSession,
                  path: String): (Map[Long, IndexedSeq[Long]], DataFrame) = {
    val byLabel = spark.read.parquet(s"$path/codebooks").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toIndexedSeq).toMap
    (byLabel, spark.read.parquet(s"$path/codes"))
  }

  /** Trained per-dimension scalar quantizer (the FAISS ScalarQuantizer
    * QT_8bit family — public method): per-dim [vmin, vmax] learned
    * over the milli-quantized training corpus; a vector stores one
    * byte per dimension, c_i = clamp(floor((v_i - vmin_i)·255 /
    * vdiff_i), 0, 255). Unlike the per-vector [[quantizeInt8]] path
    * the scale is a TRAINED INDEX ARTIFACT — frozen after training,
    * shared by every stored vector, so serving needs no per-row scale
    * column and appended batches encode against the same grid (the
    * deployed-quantizer convention; out-of-range values clamp, as in
    * FAISS). All arithmetic is exact integer / exactly-replayable
    * floor-division, so training, codes, decode and serving replay
    * bit-for-bit in the DuckDB oracle.
    *
    * Returns (vmin, vdiff) per position, pos-ordered. Training is ONE
    * posexplode aggregation to `dim` rows (collected by contract —
    * the quantizer IS dim pairs of longs). */
  def sq8Train(train: DataFrame, embCol: String): IndexedSeq[(Long, Long)] =
    train.select(posexplode(quantize(col(embCol))).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getLong(1), r.getLong(2) - r.getLong(1)))
      .toIndexedSeq

  private def sq8VminArr(quant: IndexedSeq[(Long, Long)]): Column =
    array(quant.map(q => lit(q._1)): _*)
  private def sq8VdiffArr(quant: IndexedSeq[(Long, Long)]): Column =
    array(quant.map(q => lit(q._2)): _*)

  /** Encode milli-quantized vectors against a frozen quantizer —
    * map-side, zero shuffles: two zip_withs against the literal
    * (vmin, vdiff) arrays. Degenerate dims (vdiff = 0) encode as 0;
    * values outside the trained range clamp to [0, 255] (only
    * reachable from [[appendToSq8Index]] batches — training rows are
    * in-range by construction). floor of an exactly-rounded double
    * quotient is exact at these magnitudes (|numerator| < 2^40,
    * integer distance >= 1/vdiff >> the 2^-53 rounding error). */
  def sq8EncodeFrame(df: DataFrame, idCol: String, embCol: String,
                     quant: IndexedSeq[(Long, Long)]): DataFrame =
    df.select(col(idCol).as("cid"),
      graft.expr.kernels.NativeFns.sq8Encode(quantize(col(embCol)), quant)
        .as("codes"))

  /** The zip_with encode the native kernel replaced — differential
    * anchor (NativeExprSpec). */
  private[graft] def sq8EncodeHof(q: Column,
                                  quant: IndexedSeq[(Long, Long)]): Column = {
    val diff = zip_with(q, sq8VminArr(quant), (v, mn) => v - mn)
    zip_with(diff, sq8VdiffArr(quant), (d, vd) =>
      when(vd === 0L, lit(0L)).otherwise(
        greatest(lit(0L), least(lit(255L),
          floor(d.cast("double") * 255.0 / vd.cast("double")).cast("long")))))
  }

  /** Reconstruct the milli-scale approximation from SQ8 codes:
    * v̂_i = vmin_i + floor(c_i·vdiff_i / 255) — the serving-side
    * decode (per-candidate, query-independent, so it evaluates once
    * per stored row, not once per (query, row) pair). */
  def sq8Decode(codesCol: Column, quant: IndexedSeq[(Long, Long)]): Column =
    graft.expr.kernels.NativeFns.sq8Decode(codesCol, quant)

  /** The zip_with decode the native kernel replaced — differential
    * anchor (NativeExprSpec). */
  private[graft] def sq8DecodeHof(codesCol: Column,
                                  quant: IndexedSeq[(Long, Long)]): Column = {
    val scaled = zip_with(codesCol, sq8VdiffArr(quant), (c, vd) =>
      floor(c.cast("double") * vd.cast("double") / 255.0).cast("long"))
    zip_with(scaled, sq8VminArr(quant), (x, mn) => x + mn)
  }

  /** SQ8 ANN serving: decode each stored code ONCE to its milli-scale
    * reconstruction, score every (query, candidate) with the exact
    * integer dot against the full-precision query (asymmetric
    * distance — the query never quantizes), take the top-`coarse` per
    * query, then rescore those EXACTLY — the [[rerankTopK]] /
    * [[pqServe]] recall-cost dial with a dim-byte code instead of
    * dim floats (8× narrower than the milli store) or m bytes (PQ).
    * The coarse scan streams (cid, dim-byte codes) against broadcast
    * queries; vectors are touched only in the bounded rescore. */
  def sq8Serve(quant: IndexedSeq[(Long, Long)], codes: DataFrame,
               store: DataFrame, queries: DataFrame, qId: String,
               embCol: String, k: Int, coarse: Int): DataFrame = {
    require(coarse >= k, s"coarse depth $coarse must be >= k=$k")
    val dec = codes.withColumn("__dec", sq8Decode(col("codes"), quant))
    val q = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val scored = dec.crossJoin(broadcast(q))
      .withColumn("adc", dotQ(col("qe"), col("__dec")))
    pqCoarseRescore(scored, queries, qId, embCol, store, k, coarse)
  }

  /** Persist an SQ8 index: `path/quantizer` (pos, vmin, vdiff) and
    * `path/codes` (cid, codes) — [[persistPqIndex]]'s artifact shape
    * for the scalar family. `train` optionally supplies the quantizer-
    * training frame (the production shape: the grid trains once on a
    * representative sample; later batches append against it). */
  def persistSq8Index(df: DataFrame, idCol: String, embCol: String,
                      path: String, train: Option[DataFrame] = None): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val quant = sq8Train(train.getOrElse(df), embCol)
    quant.zipWithIndex.map { case ((mn, vd), p) => (p, mn, vd) }
      .toDF("pos", "vmin", "vdiff")
      .write.mode("overwrite").parquet(s"$path/quantizer")
    sq8EncodeFrame(df, idCol, embCol, quant)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Append a batch against the FROZEN quantizer — new code files
    * only, the base store is never rewritten ([[appendToPqIndex]]'s
    * contract). Encoding is a pure per-row function of the quantizer,
    * so append == full rebuild bit-for-bit whenever the batch lies in
    * the trained range (out-of-range values clamp — the documented
    * FAISS-style degradation, priced by the recall ledger, never an
    * error). Fails loudly if `dim` does not match the persisted
    * quantizer or the stored code arrays (the [[validateCodebooks]]
    * guard for the scalar family). */
  def appendToSq8Index(df: DataFrame, idCol: String, embCol: String,
                       path: String, dim: Int = 64): Unit =
    // codes lock: serializes with compactFlatCodes (see appendToPqIndex)
    graft.io.Tables.withStoreLock(df.sparkSession, s"$path/codes") {
      val (quant, _) = readSq8Index(df.sparkSession, path)
      require(quant.nonEmpty, s"append: no quantizer found under $path")
      require(quant.length == dim,
        s"append: dim=$dim does not match the index at $path — the stored " +
          s"quantizer has ${quant.length} positions; pass the dim the index " +
          "was built with")
      val storedDim = df.sparkSession.read.parquet(s"$path/codes")
        .select(size(col("codes"))).head(1)
      storedDim.foreach(r => require(r.getInt(0) == dim,
        s"append: dim=$dim does not match the index at $path — stored code " +
          s"arrays have length ${r.getInt(0)}"))
      sq8EncodeFrame(df, idCol, embCol, quant)
        .write.mode("append").parquet(s"$path/codes")
    }

  /** Reload a persisted SQ8 index → (quantizer, codes frame). */
  def readSq8Index(spark: org.apache.spark.sql.SparkSession,
                   path: String): (IndexedSeq[(Long, Long)], DataFrame) = {
    val quant = spark.read.parquet(s"$path/quantizer").collect()
      .sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(2)))
      .toIndexedSeq
    (quant, spark.read.parquet(s"$path/codes"))
  }

  /** IVF-SQ8 — the FAISS `IndexIVFScalarQuantizer` composition: the
    * coarse IVF quantizer partitions the corpus into cells, each
    * vector stores as its dim-byte SQ8 code PARTITIONED BY CLUSTER
    * (one directory per label, the partition-pruning unit), and the
    * per-dim grid is the one trained artifact besides the centroid
    * sum table. Completes the persisted index family: IVF (raw
    * milli vectors), PQ (m-byte codes, no cells), IVFPQ (cells +
    * m-byte codes), IVF-SQ8 (cells + dim-byte codes) — the middle
    * point a deployment picks when PQ's recall at m bytes is too low
    * but raw vectors are 8× too much I/O. */
  def persistIvfSq8Index(df: DataFrame, idCol: String, embCol: String,
                         labelCol: String, path: String,
                         train: Option[DataFrame] = None): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (cent, _) = buildIvfIndex(df, idCol, embCol, labelCol)
    cent.write.mode("overwrite").parquet(s"$path/centroids")
    val quant = sq8Train(train.getOrElse(df), embCol)
    quant.zipWithIndex.map { case ((mn, vd), p) => (p, mn, vd) }
      .toDF("pos", "vmin", "vdiff")
      .write.mode("overwrite").parquet(s"$path/quantizer")
    sq8EncodeFrame(df, idCol, embCol, quant)
      .join(df.select(col(idCol).as("cid"), col(labelCol).as("label")), "cid")
      .write.mode("overwrite").partitionBy("label").parquet(s"$path/codes")
  }

  /** Append a batch to a persisted IVF-SQ8 index — frozen grid +
    * frozen-centroid labeling + additive centroid merge, composing
    * the [[appendToSq8Index]] and [[appendToIvfIndex]] contracts:
    * the batch labels against the CURRENT centroid means
    * ([[assignClusters]]), encodes against the frozen per-dim grid
    * (clamp out of range), appends as new files under the touched
    * clusters' partition dirs, and the centroid sum table merges in
    * exact integers under the store lock. When the caller supplies
    * the same labels a full rebuild would (the harness shape: labels
    * carried on the data), append == rebuild bit-for-bit and the
    * serve answers are identical — the shared-oracle contract.
    *
    * `batchTag` makes the append EXACTLY-ONCE under crash-replay (the
    * at-least-once retry loops and streaming maintainers): a tag
    * already in the centroid store's applied ledger short-circuits the
    * WHOLE call (codes included), the tag publishes INSIDE the same
    * atomic rename as the merged centroids, and the codes land via
    * [[graft.io.Tables.stagedPartitionedAppend]] under deterministic
    * per-(tag, cluster) file names — so a crash in the window between
    * the code adds and the centroid swap (previously: retry
    * double-appends codes) now resumes by skipping the already-placed
    * code files and re-running only the centroid merge against the
    * unmoved base. Untagged calls keep plain file appends (no replay
    * protection — the pre-existing contract). */
  def appendToIvfSq8Index(df: DataFrame, idCol: String, embCol: String,
                          path: String, dim: Int = 64,
                          labelCol: Option[String] = None,
                          batchTag: Option[String] = None): Unit = {
    val spark = df.sparkSession
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      val applied = graft.io.Tables.storeAppliedLedger(spark, s"$path/centroids")
      val tagLine = batchTag.map(graft.io.Tables.appliedLedgerLine)
      if (tagLine.exists(applied.contains)) return // replayed batch: no-op
      graft.io.Tables.warnIfLedgerWrapped(spark, s"$path/centroids", tagLine)
      val gen = graft.io.Tables.storeGeneration(spark, s"$path/centroids")
      val (cent, quant, _) = readIvfSq8Index(spark, path)
      require(quant.length == dim,
        s"append: dim=$dim does not match the index at $path — the stored " +
          s"quantizer has ${quant.length} positions")
      val labeled = labelCol match {
        case Some(lc) => df.select(col(idCol).as("cid"), col(lc).as("label"))
        case None => assignClusters(df, idCol, embCol, cent)
          .select(col(idCol).as("cid"), col("label"))
      }
      val codes = sq8EncodeFrame(df, idCol, embCol, quant).join(labeled, "cid")
      tagLine match {
        case Some(t) => graft.io.Tables.stagedPartitionedAppend(spark, codes,
          s"$path/codes", "label", t.stripPrefix("_APPLIED-"))
        case None => codes.write.mode("append").partitionBy("label")
          .parquet(s"$path/codes")
      }
      val centNew = labelCol match {
        case Some(lc) => buildIvfIndex(df, idCol, embCol, lc)._1
        case None =>
          val withL = df.join(
            labeled.select(col("cid").as("__cid"), col("label").as("__albl")),
            col(idCol) === col("__cid")).drop("__cid")
          buildIvfIndex(withL, idCol, embCol, "__albl")._1
      }
      val merged = spark.read.parquet(s"$path/centroids")
        .unionByName(centNew)
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("s")).as("s"), sum(col("cnt")).as("cnt"))
      graft.io.Tables.swapInParquet(spark, merged, s"$path/centroids", gen,
        ledger = applied ++ tagLine)
    }
  }

  /** Compact a persisted cluster-partitioned code store (IVF-SQ8 or
    * IVFPQ) to one file per cluster — the small-files maintenance a
    * long-lived append-only serving index needs (each tagged append
    * adds one file per touched cluster; after thousands of deltas the
    * DPP-pruned scan pays per FILE, not per byte). Runs under the
    * index's own store lock so it serializes with appends; rows,
    * partition layout, pruning behavior and serving answers are
    * IDENTICAL before/after (spec'd + shared-oracle-checked).
    * Recovery-order contract: a crashed tagged append must be retried
    * BEFORE compacting — compaction absorbs its orphan code files and
    * renames them away, after which the retry would re-place them.
    *
    * READER caveat: the two-rename publish leaves the codes dir
    * ABSENT for the metadata-rename window — a concurrent serving
    * read (which takes no lock) can fail with missing-path even
    * during a healthy compaction. Serving paths must
    * tolerate-and-retry a transient missing codes dir; the failure is
    * loud and transient, never a torn read. */
  def compactIndexCodes(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit =
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      graft.io.Tables.compactPartitionedParquet(spark, s"$path/codes", "label")
    }

  /** Compact a FLAT (unpartitioned) code store — PQ and SQ8, the two
    * index families without cluster dirs — to a file-count budget
    * derived from the store's rows (`targetRowsPerFile`; codes are a
    * few to ~70 bytes/row, so the 8M default lands near the
    * conventional few-hundred-MB parquet file at dim=64). Runs under
    * the CODES store lock, which the flat appenders also take, so
    * compaction serializes with appends; rows and serving answers are
    * identical before/after (spec'd + shared-oracle-checked). Same
    * reader caveat as [[compactIndexCodes]]: the codes dir is absent
    * for the two-rename window — serving reads tolerate-and-retry. */
  def compactFlatCodes(spark: org.apache.spark.sql.SparkSession,
                       path: String,
                       targetRowsPerFile: Long = 8L * 1024 * 1024): Unit = {
    require(targetRowsPerFile >= 1, s"targetRowsPerFile must be >= 1")
    graft.io.Tables.withStoreLock(spark, s"$path/codes") {
      val n = spark.read.parquet(s"$path/codes").count()
      val files = math.max(1L,
        (n + targetRowsPerFile - 1) / targetRowsPerFile)
      graft.io.Tables.compactFlatParquet(spark, s"$path/codes",
        files.toInt)
    }
  }

  /** Sweep crash residue (`__next_*`/`__old_*`/`__stage_*`) from ALL
    * of a persisted index's stores — centroids, quantizer, codebooks,
    * and the graph store's vectors/edges/meta — under the CENTROIDS
    * lock, which every appender of THOSE stores holds while staging
    * (`codes__stage_*` for the IVF families and `vectors__stage_*`
    * for the graph store are created under the centroids lock, so a
    * bare [[graft.io.Tables.vacuumStore]] on them could race a live
    * append's stage; this wrapper cannot). The CODES store is swept
    * under the CODES lock taken INSIDE the centroids lock: the flat
    * PQ/SQ8 appenders and [[compactFlatCodes]] serialize on the codes
    * lock, not centroids, so sweeping codes under centroids alone
    * could delete a live flat compaction's in-flight `codes__next_*`
    * (worst interleaving: its failure-restore rename silently no-ops
    * and the codes store is lost). Lock order is always centroids →
    * codes, never the reverse, so the nesting cannot deadlock.
    *
    * EDGES residue is special: after a crash inside
    * [[graft.io.Tables.replacePartitions]]'s rename window an
    * `edges__old_*` partition dir may be the ONLY copy of a store
    * partition — sweeping it would destroy the recovery copy. The
    * sweep therefore runs [[graft.io.Tables.restoreOrphanedPartitions]]
    * on edges FIRST; what remains in `__old_*` is by construction a
    * stale aside of a completed swap, safe to delete. Returns the
    * deleted paths. */
  def vacuumIndexStores(spark: org.apache.spark.sql.SparkSession,
                        path: String): Seq[String] =
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      graft.io.Tables.restoreOrphanedPartitions(spark, s"$path/edges")
      val underCentroids =
        Seq("centroids", "quantizer", "codebooks", "vectors", "edges",
          "meta").flatMap { d =>
          graft.io.Tables.vacuumStoreUnlocked(spark, s"$path/$d")
        }
      val underCodes = graft.io.Tables.withStoreLock(spark, s"$path/codes") {
        graft.io.Tables.vacuumStoreUnlocked(spark, s"$path/codes")
      }
      underCentroids ++ underCodes
    }

  /** Reload → (centroid sum table, quantizer, cluster-partitioned
    * codes). */
  def readIvfSq8Index(spark: org.apache.spark.sql.SparkSession,
                      path: String): (DataFrame, IndexedSeq[(Long, Long)], DataFrame) = {
    val quant = spark.read.parquet(s"$path/quantizer").collect()
      .sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(2)))
      .toIndexedSeq
    (spark.read.parquet(s"$path/centroids"), quant,
      spark.read.parquet(s"$path/codes"))
  }

  /** IVF-SQ8 serving: probe each query's best `nprobe` cells
    * (broadcast centroid table), dynamic-partition-pruned scan of
    * ONLY those cells' code files, decode-once + integer-ADC against
    * the full-precision query, coarse cut, exact rescore — the
    * [[ivfPqTopK]] plan shape with the scalar codec. At 100 TB the
    * fine search reads ~nprobe/nlist of the dim-byte code column. */
  def ivfSq8TopK(cent: DataFrame, quant: IndexedSeq[(Long, Long)],
                 codes: DataFrame, store: DataFrame, queries: DataFrame,
                 qId: String, embCol: String, k: Int, coarse: Int = 20,
                 nprobe: Int = 1): DataFrame = {
    require(coarse >= k, s"coarse depth $coarse must be >= k=$k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val q = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val probed = ivfProbe(cent, q, nprobe).join(q, "qid")
    val dec = codes.withColumn("__dec", sq8Decode(col("codes"), quant))
    val scored = dec.join(broadcast(probed), "label")
      .withColumn("adc", dotQ(col("qe"), col("__dec")))
      .select(col("qid"), col("cid"), col("adc"))
    pqCoarseRescore(scored, queries, qId, embCol, store, k, coarse)
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k by quantized dot product: broadcast the
    * (small) query set against every candidate — the join is map-side,
    * the only shuffle is the per-query top-k window. At cluster scale
    * the window input is |queries|×|candidates| rows, which is why this
    * is the baseline/kernel, not the scale path. */
  def bruteForceTopKQ(queries: DataFrame, candidates: DataFrame, qId: String,
                      cId: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val c = candidates.select(col(cId).as("cid"), quantize(col(embCol)).as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("dot", dotQ(col("qe"), col("ce")))
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("dot"))
  }

  /** Deterministic random hyperplanes: direction i of plane j is ±1 by
    * the parity of md5("<salt>:j:i") — reproducible anywhere, no RNG
    * state. Materialized as literal arrays for both engines. The salt
    * keeps independent consumers (LSH bucketing vs the JL projection)
    * on independent sign matrices. */
  def planeDirs(nPlanes: Int, dim: Int, salt: String = "plane"): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until dim).map { i =>
        val h = md.digest(s"$salt:$j:$i".getBytes("UTF-8"))
        if ((h.last & 1) == 0) 1 else -1
      }
    }
  }

  /** Deterministic ±1 Johnson-Lindenstrauss sign projection
    * (Achlioptas 2003, "Database-friendly random projections" —
    * public method): project quantized dim-d embeddings to r dims,
    * y_j = Σ_i s_{j,i}·x_i with the sign matrix from md5 parity (the
    * [[planeDirs]] convention under its own salt) — a pure map-side
    * exact-integer projection, no RNG state, bit-replayable anywhere.
    * The 100 TB story: an r/d-sized vector store whose dot products
    * preserve the originals' ORDER well enough for coarse search and
    * clustering (JL distance preservation); `llm_jl_recall` prices
    * the distortion in-engine before anyone serves from the small
    * store. */
  def jlProject(df: DataFrame, idCol: String, embCol: String,
                r: Int = 16, dim: Int = 64): DataFrame = {
    val dirs = planeDirs(r, dim, salt = "jl")
    df.select(col(idCol), quantize(col(embCol)).as("__eq"))
      .select(col(idCol), array(dirs.map(d =>
        dotQ(col("__eq"), array(d.map(x => lit(x.toLong)): _*))): _*).as("proj"))
  }

  /** LSH bucket signature: one bit per hyperplane = sign of the
    * quantized projection. Equal signatures land in one bucket. */
  def lshBucket(embQ: Column, planes: Seq[Seq[Int]]): Column =
    concat(planes.map { dirs =>
      val lits = array(dirs.map(d => lit(d.toLong)): _*)
      when(dotQ(embQ, lits) > 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Multi-probe LSH: the query's own bucket plus every bucket at
    * Hamming distance 1 (flip each plane bit once). Probing 1+nPlanes
    * buckets instead of one recovers most of the recall that
    * single-probe loses to boundary effects, for (1+nPlanes)× the
    * candidate volume — still a bucket equi-join, never pairwise
    * (measured in llm_ann_recall: single- vs multi-probe on the same
    * split). */
  def probeBuckets(bucket: Column, nPlanes: Int): Column =
    array((bucket +: (0 until nPlanes).map { i =>
      val flip = when(substring(bucket, i + 1, 1) === "0", lit("1")).otherwise(lit("0"))
      concat(substring(bucket, 1, i), flip, substring(bucket, i + 2, nPlanes - i - 1))
    }): _*)

  /** Bucketed ANN: assign buckets, then exact top-k within each bucket.
    * The bucket column is also the pre-partitioning key for repeated
    * queries (write bucketed parquet → co-located joins, no shuffle). */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              nPlanes: Int = 8, dim: Int = 64, k: Int = 1,
              maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val planes = planeDirs(nPlanes, dim)
    // Count-window cap BEFORE the self-join (same guard as
    // Dedup.minHashLshPairs): a degenerate bucket past `maxBucket` is
    // dropped while still spillable in the window sort, never joined.
    // The window's hash exchange on `bucket` is exactly the join's
    // required partitioning and both self-join sides share it
    // (ReuseExchange), so the cap adds no extra shuffle. Singleton
    // buckets yield no pairs, so the >=2 bound is free pruning.
    val bucketed = df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq"))
      .withColumn("bucket", lshBucket(col("eq"), planes))
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("__bc").between(2, maxBucket))
      .drop("__bc")
    val pairs = bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vid") =!= col("y.vid"))
      .select(col("x.vid").as("vid"), col("x.bucket").as("bucket"),
        col("y.vid").as("nn"), dotQ(col("x.eq"), col("y.eq")).as("dot"))
    val w = Window.partitionBy(col("vid")).orderBy(col("dot").desc, col("nn"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive / retrieval training (the
    * DPR / SimCSE data-generation step — public method): for each
    * anchor vector, the top-k most similar vectors carrying a
    * DIFFERENT label. The LSH bucket restriction is the semantics,
    * not just the optimization — "hard" negatives are precisely the
    * same-bucket near-misses; vectors far enough to land in another
    * bucket are easy negatives a trainer can sample for free. Same
    * capped-bucket self-join machinery as [[lshTopK]] (one shared
    * exchange, degenerate buckets dropped not joined); the rank
    * window's exact-integer dot ordering ties on negative id. */
  def hardNegatives(df: DataFrame, idCol: String, embCol: String,
                    labelCol: String, k: Int, nPlanes: Int = 8,
                    dim: Int = 64,
                    maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val planes = planeDirs(nPlanes, dim)
    val bucketed = df.select(col(idCol).as("vid"), col(labelCol).as("lbl"),
        quantize(col(embCol)).as("eq"))
      .withColumn("bucket", lshBucket(col("eq"), planes))
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("__bc").between(2, maxBucket))
      .drop("__bc")
    val pairs = bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.lbl") =!= col("y.lbl"))
      .select(col("x.vid").as("vid"), col("x.lbl").as("label"),
        col("y.vid").as("neg"), col("y.lbl").as("neg_label"),
        dotQ(col("x.eq"), col("y.eq")).as("dot"))
    val w = Window.partitionBy(col("vid")).orderBy(col("dot").desc, col("neg"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Contrastive TRIPLET mining — the (anchor, positive, negative)
    * export a metric-learning trainer consumes: per anchor, the
    * hardest same-bucket positive (most-similar SAME label) and the
    * hardest same-bucket negative (most-similar DIFFERENT label),
    * with the exact-integer margin `pos_dot − neg_dot` (the quantity
    * triplet loss penalizes — anchors with small or negative margins
    * are the valuable training examples). Anchors lacking either a
    * positive or a negative in their bucket yield no triplet.
    *
    * ONE capped bucket self-join feeds both sides; the two rank
    * windows partition by anchor over the same pair stream (shared
    * exchange), and the final positive⋈negative join runs at
    * anchor-count scale. */
  def tripletMine(df: DataFrame, idCol: String, embCol: String,
                  labelCol: String, nPlanes: Int = 8, dim: Int = 64,
                  maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val planes = planeDirs(nPlanes, dim)
    val bucketed = df.select(col(idCol).as("vid"), col(labelCol).as("lbl"),
        quantize(col(embCol)).as("eq"))
      .withColumn("bucket", lshBucket(col("eq"), planes))
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("__bc").between(2, maxBucket))
      .drop("__bc")
    val pairs = bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vid") =!= col("y.vid"))
      .select(col("x.vid").as("vid"), col("x.lbl").as("label"),
        col("y.vid").as("nn"), col("y.lbl").as("nlbl"),
        dotQ(col("x.eq"), col("y.eq")).as("dot"))
      .localCheckpoint(false) // feeds both rank branches; see buildIvfIndex
    val w = Window.partitionBy(col("vid")).orderBy(col("dot").desc, col("nn"))
    def top1(side: DataFrame, as: String) = side
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("vid"), col("label"), col("nn").as(as),
        col("dot").as(s"${as}_dot"))
    val pos = top1(pairs.filter(col("label") === col("nlbl")), "pos")
    val neg = top1(pairs.filter(col("label") =!= col("nlbl")), "neg")
    pos.join(neg.drop("label"), Seq("vid"))
      .select(col("vid"), col("label"), col("pos"), col("neg"),
        col("pos_dot"), col("neg_dot"),
        (col("pos_dot") - col("neg_dot")).as("margin"))
  }

  /** Embedding-cosine near-dup: candidate pairs from LSH buckets,
    * kept when exact cosine (from exact integer dot/norms, so the
    * double math is bit-deterministic) clears the threshold. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                         threshold: Double, nPlanes: Int = 8,
                         dim: Int = 64,
                         maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val planes = planeDirs(nPlanes, dim)
    // Same degenerate-bucket guard as lshTopK — see the comment there.
    val bucketed = df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq"))
      .withColumn("bucket", lshBucket(col("eq"), planes))
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("__bc").between(2, maxBucket))
      .drop("__bc")
    bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("a"), col("y.vid").as("b"),
        dotQ(col("x.eq"), col("y.eq")).cast("double").as("__dot"),
        dotQ(col("x.eq"), col("x.eq")).cast("double").as("__na"),
        dotQ(col("y.eq"), col("y.eq")).cast("double").as("__nb"))
      // zero-norm guard: a zero-quantized embedding (failed/padded
      // vectors) gives 0/0 = NaN, and Spark orders NaN ABOVE every
      // number, so without this filter NaN >= threshold admits every
      // such pair as a "near-duplicate"
      .filter(col("__na") > 0 && col("__nb") > 0)
      .select(col("a"), col("b"),
        (col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb")))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Distributed Lloyd's k-means over quantized embeddings — the IVF
    * coarse-quantizer trainer. Deterministic end to end: seeds are the
    * k lowest-id vectors, distances are exact integer L2², centroid
    * updates are floor(sum/count) with IEEE double division (identical
    * in any engine), ties break on cluster id. Scale shape per
    * iteration = MLlib's: centroids broadcast as literals into a
    * codegen'd map-side argmin (no join), then ONE shuffle
    * (groupBy cluster,pos) for the sums; driver holds only k×dim longs.
    * Fixed `iters` keeps the computation replayable as unrolled SQL. */
  def kmeansClusters(df: DataFrame, idCol: String, embCol: String,
                     k: Int, iters: Int): DataFrame = {
    val eq = df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq"))
    val cents = kmeansTrain(eq, k, iters)
    // dot-identity argmin (the pqEncodeFrame convention): ranking by
    // Σc² − 2·dot(x, c) is exactly the squared-distance order (the Σx²
    // term is a per-row constant; ties to the lowest cid). Native
    // kernel — centroids are reference DATA, not code literals, so the
    // generated assign loop is fixed-size at ANY nlist (the literal
    // struct-min chain stopped compiling at ~400 centroids and fell
    // back to interpreted — sf10 BenchScale caught the super-linear
    // assign; [[assignDeclarative]] keeps the old form as the
    // bit-equality spec anchor)
    eq.withColumn("cluster",
        graft.expr.kernels.NativeFns.argminCentroid(col("eq"), cents))
      .select(col("vid"), col("cluster"))
  }

  /** Multi-probe cluster assignment: each vector joins its `nprobe`
    * NEAREST cells (same trained centroids, same distance order and
    * tie-break as [[kmeansClusters]] — nprobe = 1 is exactly that
    * assignment). Output (vid, cluster, probe) with probe = 1-based
    * nearness rank; ≤ nprobe rows per vector. This is the IVF nprobe
    * recall dial applied to the similarity-JOIN side: a vector near a
    * cell boundary is searched in its runner-up cells too. */
  def kmeansClustersProbe(df: DataFrame, idCol: String, embCol: String,
                          k: Int, iters: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val eq = df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq"))
    val cents = kmeansTrain(eq, k, iters)
    eq.select(col("vid"), posexplode(
        graft.expr.kernels.NativeFns.topNCentroids(col("eq"), cents, nprobe))
        .as(Seq("__p", "cluster")))
      .select(col("vid"), col("cluster"), (col("__p") + 1).as("probe"))
  }

  /** The struct-sort top-n assignment the native
    * [[graft.expr.kernels.TopNCentroids]] kernel replaced — the
    * bit-equality differential anchor (NativeExprSpec), the
    * [[assignDeclarative]] convention: sort (dist, cid) structs
    * ascending, take the first n cids. */
  private[graft] def topNDeclarative(eq: Column,
                                     cents: Seq[(Long, Seq[Long])],
                                     n: Int): Column =
    transform(slice(array_sort(array(cents.map { case (cid, c) =>
      val cNorm = c.map(x => x * x).sum
      struct((lit(cNorm) - lit(2L) *
        graft.expr.kernels.NativeFns.longDot(eq, array(c.map(lit): _*)))
        .as("dist"), lit(cid).as("cid"))
    }: _*)), 1, n), _.getField("cid"))

  /** The deterministic Lloyd trainer shared by [[kmeansClusters]] and
    * [[kmeansClustersProbe]]: seeds are the k lowest-id vectors,
    * distances exact integer L2², centroid updates floor(sum/count),
    * ties to the lower cluster id; fixed `iters` keeps the whole
    * computation replayable as unrolled SQL. Per iteration = MLlib's
    * shape: a codegen'd map-side argmin (no join) then ONE shuffle for
    * the sums; the driver holds only k×dim longs. `eq` is (vid, eq). */
  private[graft] def kmeansTrain(eq: DataFrame, k: Int,
                                 iters: Int): Seq[(Long, Seq[Long])] = {
    def assign(cents: Seq[(Long, Seq[Long])]): Column =
      graft.expr.kernels.NativeFns.argminCentroid(col("eq"), cents)
    // deterministic seeding: the k lowest-id vectors, cid by id order
    var cents: Seq[(Long, Seq[Long])] = eq.orderBy(col("vid")).limit(k)
      .select(col("eq")).collect().toSeq
      .map(_.getSeq[Long](0).toSeq).zipWithIndex.map { case (c, i) => (i.toLong, c) }
    for (_ <- 1 until iters) {
      val updated = eq.withColumn("cluster", assign(cents))
        .select(col("cluster"), posexplode(col("eq")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("c"))
        .collect()
      cents = updated.groupBy(_.getAs[Long]("cluster")).toSeq
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("c")).toSeq
        }.sortBy(_._1)
    }
    cents
  }

  /** The literal struct-array_min assignment formulation the native
    * [[graft.expr.kernels.ArgminCentroid]] kernel replaced — kept as
    * the bit-equality differential anchor (NativeExprSpec), same role
    * as [[dotQHof]] for the dot kernel. */
  private[graft] def assignDeclarative(eq: Column,
                                       cents: Seq[(Long, Seq[Long])]): Column =
    array_min(array(cents.map { case (cid, c) =>
      val cNorm = c.map(x => x * x).sum
      struct((lit(cNorm) - lit(2L) *
        graft.expr.kernels.NativeFns.longDot(eq, array(c.map(lit): _*)))
        .as("dist"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * arXiv:2303.09540 — public method): partition the embedding space
    * with the deterministic k-means coarse quantizer, then search for
    * near-duplicates ONLY within each cluster. Complements the LSH
    * path ([[cosineNearDupPairs]]): random hyperplanes bucket on
    * exact signature agreement and can split a tight semantic
    * neighborhood across buckets, while k-means cells follow the
    * data's own density. Same exact-integer dot/norm cosine and
    * zero-norm NaN guard as the LSH path.
    *
    * Scale: within-cluster pairing is O((N/nlist)² ) per cluster, so
    * `nlist` must grow with the corpus to hold the expected cell size
    * constant (SemDeDup itself runs ~100k clusters at web scale);
    * `maxCluster` is the degenerate-cell guard — a collapsed cell
    * (e.g. millions of zero vectors) is dropped rather than joined,
    * same contract as `DefaultMaxBucket` on the LSH side. The
    * self-join's hash exchange on `cluster` is shared with the cap
    * window (ReuseExchange), so the guard adds no extra shuffle. */
  def semanticNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                           threshold: Double, nlist: Int = 4, iters: Int = 2,
                           maxCluster: Int = 4096, nprobe: Int = 1): DataFrame =
    cellPairs(df, idCol, embCol, nlist, iters, maxCluster,
      nprobe, ordered = true)
      .filter(col("cosine") >= threshold)

  /** The ONE cell-bucketed self-join skeleton behind
    * [[semanticNearDupPairs]] and [[knnGraph]]: k-means cell
    * assignment (multi-probe when nprobe > 1 — see
    * [[kmeansClustersProbe]]), degenerate-cell cap, ONE checkpointed
    * materialization feeding both self-join sides, cell equi-join,
    * exact-integer cosine with the zero-norm guard. `ordered` picks
    * the pair shape: a < b undirected candidates (the dedup paths) vs
    * a ≠ b directed (the kNN-graph path, where each endpoint needs
    * its own neighbor list).
    *
    * nprobe = 1 returns (cluster, a, b, cosine) — bit-compatible with
    * the pre-refactor pair frames, no dedup pass in the plan. With
    * nprobe > 1 a pair meeting in several shared cells would
    * duplicate, so the output deduplicates to DISTINCT (a, b, cosine)
    * (cosine is a function of the pair — identical on every copy) and
    * drops the now-ambiguous cluster column. The candidate volume
    * grows ≤ nprobe² per pair in the worst case — [[knnGraph]]'s
    * recall ledger prices both sides of that dial. */
  private[graft] def cellPairs(df: DataFrame, idCol: String, embCol: String,
                               nlist: Int, iters: Int, maxCluster: Int,
                               nprobe: Int, ordered: Boolean): DataFrame = {
    val eq0 = df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq"))
    cellPairsTrained(df, idCol, embCol, kmeansTrain(eq0, nlist, iters),
      maxCluster, nprobe, ordered)
  }

  /** [[cellPairs]] against ALREADY-TRAINED centroids — callers probing
    * several nprobe widths over one corpus (the recall/volume ledger)
    * train ONCE and share `cents`, instead of re-running the Lloyd
    * collect loop per width. Assignment is a map-side kernel column ON
    * the quantized frame itself (argmin at nprobe = 1, explode(top-n)
    * above), so the (vid → cluster) → eq re-join the pre-r17 shape
    * paid — a corpus-scale shuffle join per build — is gone: the
    * capped frame materializes in one pass over the scan. */
  private[graft] def cellPairsTrained(df: DataFrame, idCol: String,
                                      embCol: String,
                                      cents: Seq[(Long, Seq[Long])],
                                      maxCluster: Int, nprobe: Int,
                                      ordered: Boolean): DataFrame =
    cellPairsTrainedEq(
      df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq")),
      cents, maxCluster, nprobe, ordered)

  /** The capped (multi-probe) cell-assignment frame the pair joins
    * build on, WITHOUT the pair join: (vid, eq, cluster, __nz) with
    * __nz = the zero-norm guard per endpoint — checkpointed once. A
    * recall/volume ledger uses this to count candidate pairs from
    * METADATA (cluster sizes / (vid, cluster) joins) and to score
    * cosines only for the eval slice it actually ranks, instead of
    * materializing every candidate pair with its dot product (guide
    * §2.3: decide with small rows; the cosine is payload). Same
    * assignment kernel, cap window and zero-norm contract as
    * [[cellPairsTrainedEq]]. */
  private[graft] def cappedCells(eq0: DataFrame,
                                 cents: Seq[(Long, Seq[Long])],
                                 maxCluster: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val eq =
      if (nprobe == 1) eq0.withColumn("cluster",
        graft.expr.kernels.NativeFns.argminCentroid(col("eq"), cents))
      else eq0.select(col("vid"), col("eq"), explode(
          graft.expr.kernels.NativeFns.topNCentroids(col("eq"), cents, nprobe))
        .as("cluster"))
    eq.withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .filter(col("__bc").between(2, maxCluster))
      .drop("__bc")
      .withColumn("__nz", dotQ(col("eq"), col("eq")) > 0)
      .localCheckpoint(false)
  }

  /** [[cellPairsTrained]] over an ALREADY-QUANTIZED (vid, eq) frame —
    * the rebuild path's face (the store's vectors carry eq, not the
    * raw float embedding; re-quantizing quantized longs would be
    * wrong). */
  private[graft] def cellPairsTrainedEq(eq0: DataFrame,
                                        cents: Seq[(Long, Seq[Long])],
                                        maxCluster: Int, nprobe: Int,
                                        ordered: Boolean): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val eq =
      if (nprobe == 1) eq0.withColumn("cluster",
        graft.expr.kernels.NativeFns.argminCentroid(col("eq"), cents))
      else eq0.select(col("vid"), col("eq"), explode(
          graft.expr.kernels.NativeFns.topNCentroids(col("eq"), cents, nprobe))
        .as("cluster"))
    val capped = eq
      .withColumn("__bc", count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .filter(col("__bc").between(2, maxCluster))
      .drop("__bc")
      // lazy barrier: one materialization feeds both self-join sides
      // (two full corpus passes otherwise)
      .localCheckpoint(false)
    val cond = col("x.cluster") === col("y.cluster") &&
      (if (ordered) col("x.vid") < col("y.vid") else col("x.vid") =!= col("y.vid"))
    val scored = capped.as("x").join(capped.as("y"), cond)
      .select(col("x.cluster").as("cluster"),
        col("x.vid").as("a"), col("y.vid").as("b"),
        dotQ(col("x.eq"), col("y.eq")).cast("double").as("__dot"),
        dotQ(col("x.eq"), col("x.eq")).cast("double").as("__na"),
        dotQ(col("y.eq"), col("y.eq")).cast("double").as("__nb"))
      // zero-norm guard — see cosineNearDupPairs
      .filter(col("__na") > 0 && col("__nb") > 0)
      .select(col("cluster"), col("a"), col("b"),
        (col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb")))).as("cosine"))
    if (nprobe == 1) scored
    else scored.select(col("a"), col("b"), col("cosine")).distinct()
  }

  /** End-to-end SemDeDup: semantic pairs → connected components →
    * keep the cluster-minimum id (the same representative rule as the
    * text-path `llm_dedup_keep_one`). Returns the surviving ids. */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    threshold: Double, nlist: Int = 4, iters: Int = 2,
                    maxCluster: Int = 4096, nprobe: Int = 1): DataFrame =
    semanticDedupPairsToKeep(df, idCol,
      semanticNearDupPairs(df, idCol, embCol, threshold, nlist,
        iters, maxCluster, nprobe))

  /** [[semanticDedup]] against ALREADY-TRAINED centroids — the
    * shared-geometry face ([[knnGraphTrained]]). */
  def semanticDedupTrained(df: DataFrame, idCol: String, embCol: String,
                           threshold: Double,
                           cents: Seq[(Long, Seq[Long])],
                           maxCluster: Int = 4096,
                           nprobe: Int = 1): DataFrame =
    semanticDedupPairsToKeep(df, idCol,
      semanticNearDupPairsTrained(df, idCol, embCol, threshold, cents,
        maxCluster, nprobe))

  private def semanticDedupPairsToKeep(df: DataFrame, idCol: String,
                                       pairFrame: DataFrame): DataFrame = {
    val pairs = pairFrame.select(col("a"), col("b"))
    // within-cell all-pairs graphs CHAIN (x~y~z via 0.3-cosine links
    // without x~z), so the component diameter is far above the LSH
    // quasi-clique case — 32 rounds, relying on connectedComponents'
    // exact-fixpoint early termination to stop as soon as converged
    val comp = graft.ops.Ops.connectedComponents(pairs, "a", "b", iters = 32)
    Dedup.keepOnePerCluster(df.select(col(idCol)), idCol, comp)
  }

  /** Bulk kNN-graph construction — the top-k cosine neighbor list for
    * EVERY corpus vector, searched within its k-means cell: the
    * SemDeDup bucketing applied to the similarity-JOIN problem rather
    * than per-query serving. The neighborhood graph is what
    * graph-based curation consumes (diversity sampling, cluster
    * balancing, graph dedup beyond pairwise thresholds); unlike
    * [[semanticNearDupPairs]] it keeps each vector's k best edges
    * regardless of any threshold, so sparse neighborhoods still get
    * neighbors. Edges are DIRECTED (a's list; b's list may differ).
    *
    * Scale: within-cell pairing is O((N/nlist)²) per cell — `nlist`
    * grows with the corpus to hold cell size constant, `maxCluster`
    * drops degenerate cells (same contract as the SemDeDup/LSH caps),
    * and the per-vector top-k compiles to a rank-filter window (map-
    * side WindowGroupLimit before the shuffle). A vector whose true
    * neighbor sits across a cell boundary misses it at nprobe = 1 —
    * the IVF trade; `nprobe` > 1 searches each vector's runner-up
    * cells too (the standard multi-probe recall dial —
    * [[kmeansClustersProbe]]), for ≤ nprobe² the candidate pairs;
    * `llm_knn_recall_probes` prices BOTH sides of that dial against
    * the exact graph on an eval subset. Zero-norm vectors have no
    * defined cosine and are excluded from both endpoints (the NaN
    * guard of the cosine paths). */
  def knnGraph(df: DataFrame, idCol: String, embCol: String, k: Int,
               nlist: Int = 4, iters: Int = 2,
               maxCluster: Int = 4096, nprobe: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    knnTopK(cellPairs(df, idCol, embCol, nlist, iters, maxCluster,
      nprobe, ordered = false), k)
  }

  /** [[knnGraph]] against ALREADY-TRAINED centroids — a family of
    * graph consumers over one corpus (graph, recall ledger, label
    * propagation) trains the shared Lloyd geometry ONCE and passes it
    * here, instead of each re-running the per-iteration collect loop
    * (identical output by construction: [[kmeansTrain]] is
    * deterministic in (input, nlist, iters)). */
  def knnGraphTrained(df: DataFrame, idCol: String, embCol: String, k: Int,
                      cents: Seq[(Long, Seq[Long])],
                      maxCluster: Int = 4096, nprobe: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    knnTopK(cellPairsTrained(df, idCol, embCol, cents, maxCluster,
      nprobe, ordered = false), k)
  }

  /** [[semanticNearDupPairs]] against ALREADY-TRAINED centroids —
    * same shared-geometry face as [[knnGraphTrained]]. */
  def semanticNearDupPairsTrained(df: DataFrame, idCol: String,
                                  embCol: String, threshold: Double,
                                  cents: Seq[(Long, Seq[Long])],
                                  maxCluster: Int = 4096,
                                  nprobe: Int = 1): DataFrame =
    cellPairsTrained(df, idCol, embCol, cents, maxCluster, nprobe,
      ordered = true)
      .filter(col("cosine") >= threshold)

  /** Corpus-scaled cell count for the cell-join family: nlist grows
    * with the corpus so the EXPECTED cell size stays ~`targetCell`
    * (n/nlist), which is what the O((N/nlist)²)-per-cell pairing cost
    * and the degenerate-cell cap both assume — a FIXED nlist at a
    * growing corpus eventually pushes every cell past `maxCluster`
    * and the cap (correctly) drops them all. One cheap `count()`
    * derives the knob, amortized against a corpus-scale clustering;
    * the 4-cell floor reproduces the small-fixture geometry exactly,
    * so small-sf results are bit-identical to a literal nlist=4.
    * Same scaling BenchScale's knn rows apply (4·n/2000 = n/500). */
  def autoNlist(df: DataFrame, targetCell: Long = 500L,
                minNlist: Int = 4): Int = {
    require(targetCell >= 1, s"targetCell must be >= 1, got $targetCell")
    require(minNlist >= 1, s"minNlist must be >= 1, got $minNlist")
    math.max(minNlist.toLong, df.count() / targetCell).toInt
  }

  // ------------------------------------------------------------------
  // Persisted kNN-graph store — the graph as a maintained artifact
  // ------------------------------------------------------------------

  /** Persist the kNN graph as a STORE with incremental appends — the
    * last similarity product that was still rebuilt per query; every
    * ANN index family already persists ([[persistIvfSq8Index]] is the
    * template, the applied-tag ledger the idempotence recipe).
    * Artifacts under `path/`:
    *  - `centroids` (cid, pos, c): the TRAINED coarse cells, frozen
    *    after build (the frozen-codebook convention — retraining is a
    *    deliberate offline rebuild). Swap-published: this store is the
    *    index's lock anchor, generation stamp and applied-tag ledger.
    *  - `meta` (k, nprobe, max_cluster): the build knobs, validated on
    *    append (a mismatched k would silently serve a differently-cut
    *    graph).
    *  - `vectors` partitionBy(cell): (cid, eq, probe, home) — each
    *    vector's quantized form under EVERY cell it probes, plus its
    *    probe-1 home. The append's candidate search reads ONLY the
    *    touched cells' partitions.
    *  - `edges` partitionBy(home): (a, b, rank, cosine) — the graph
    *    itself, each vector's list stored under its home cell so an
    *    append rewrites only the touched homes' partitions.
    *
    * `train` optionally supplies the quantizer-training frame (the
    * production shape: cells train once on a representative sample;
    * batches build and append against them). */
  def persistKnnGraphStore(df: DataFrame, idCol: String, embCol: String,
                           path: String, k: Int, nlist: Int = 4,
                           iters: Int = 2, maxCluster: Int = 4096,
                           nprobe: Int = 1,
                           train: Option[DataFrame] = None): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val trainEq = train.getOrElse(df)
      .select(col(idCol).as("vid"), quantize(col(embCol)).as("eq"))
    val cents = kmeansTrain(trainEq, nlist, iters)
    val asg = graphAssignments(df, idCol, embCol, cents, nprobe)
    asg.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    Seq((k.toLong, nprobe.toLong, maxCluster.toLong))
      .toDF("k", "nprobe", "max_cluster")
      .write.mode("overwrite").parquet(s"$path/meta")
    val graph = knnTopK(
      cellPairsTrained(df, idCol, embCol, cents, maxCluster, nprobe,
        ordered = false).select(col("a"), col("b"), col("cosine")), k)
    // home rides a join keyed like the rank window's exchange (a), so
    // it reuses that partitioning — no extra corpus-scale shuffle
    val homes = asg.filter(col("probe") === 1L)
      .select(col("cid").as("a"), col("home"))
    graph.join(homes, "a")
      .repartition(col("home"))
      .write.mode("overwrite").partitionBy("home").parquet(s"$path/edges")
    // the anchor publishes LAST: a store is live iff its centroids are
    graft.io.Tables.swapInParquet(spark, centsFrame(spark, cents),
      s"$path/centroids")
  }

  /** Map-side probe assignments: (cid, eq, probe 1-based, cell, home)
    * — one kernel call per row, the home (probe-1 cell) carried as a
    * COLUMN so no later step needs a corpus-scale re-join to find a
    * vector's edge partition. */
  private[llm] def graphAssignments(df: DataFrame, idCol: String, embCol: String,
                               cents: Seq[(Long, Seq[Long])],
                               nprobe: Int): DataFrame =
    graphAssignmentsEq(
      df.select(col(idCol).as("cid"), quantize(col(embCol)).as("eq")),
      cents, nprobe)

  /** [[graphAssignments]] over an already-quantized (cid, eq) frame —
    * shared with the geometry rebuild. */
  private[llm] def graphAssignmentsEq(eqDf: DataFrame,
                                      cents: Seq[(Long, Seq[Long])],
                                      nprobe: Int): DataFrame =
    eqDf
      .withColumn("__top",
        graft.expr.kernels.NativeFns.topNCentroids(col("eq"), cents, nprobe))
      .withColumn("home", element_at(col("__top"), 1))
      .select(col("cid"), col("eq"), col("home"),
        posexplode(col("__top")).as(Seq("__p", "cell")))
      .select(col("cid"), col("eq"), (col("__p") + 1).cast("long").as("probe"),
        col("home"), col("cell"))

  private def centsFrame(spark: org.apache.spark.sql.SparkSession,
                         cents: Seq[(Long, Seq[Long])]): DataFrame = {
    import spark.implicits._
    cents.flatMap { case (cid, c) =>
      c.zipWithIndex.map { case (v, p) => (cid, p, v) }
    }.toDF("cid", "pos", "c")
  }

  private def readCents(spark: org.apache.spark.sql.SparkSession,
                        path: String): Seq[(Long, Seq[Long])] =
    spark.read.parquet(s"$path/centroids").collect()
      .groupBy(_.getLong(0)).toSeq
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }.sortBy(_._1)

  /** Reload → (trained cells, edges frame, vectors frame). The edges
    * frame IS the product (a, b, rank, cosine [, home]). */
  def readKnnGraphStore(spark: org.apache.spark.sql.SparkSession,
                        path: String): (Seq[(Long, Seq[Long])], DataFrame, DataFrame) =
    (readCents(spark, path), spark.read.parquet(s"$path/edges"),
      spark.read.parquet(s"$path/vectors"))

  /** Append a batch to the persisted graph — pairing NEW vectors
    * against (new ∪ old) members of the cells the batch probes, never
    * old×old (those edges are already stored). Two products update:
    * the new vectors' lists (top-k over their candidates) and the
    * AFFECTED old vectors' lists (stored top-k merged with their
    * old→new candidates, re-ranked — exact, because a candidate
    * outside the stored top-k can never re-enter any top-k). With the
    * frozen cells this makes append == full rebuild bit-for-bit (the
    * shared-oracle contract), PROVIDED no touched cell crosses the
    * degenerate cap: the append FAILS LOUDLY if the batch would push
    * a cell past `maxCluster` (a full rebuild would silently drop the
    * whole cell — at that point the geometry is stale and the honest
    * move is a rebuild with a larger nlist, see [[autoNlist]]).
    *
    * Scale: reads ONLY the touched cells' vector partitions and the
    * affected homes' edge partitions (both partition-pruned);
    * candidate volume is O(|batch| · cellSize · nprobe²); nothing
    * corpus-scale shuffles. Exactly-once under crash-replay when
    * `batchTag` is given — the ivf-sq8 recipe: applied tag
    * short-circuits the call, vectors land via staged deterministic
    * files, the edge-partition rewrite is IDEMPOTENT (re-merging into
    * an already-merged list is a no-op, so a retry over a
    * half-published edge store converges to the same content), and
    * the tag publishes inside the centroid swap's atomic rename.
    *
    * `autoRebuild` turns the cap-overflow failure into the documented
    * recovery, inline: the geometry retrains on stored ∪ batch under
    * the SAME held lock (sized against the store's own maxCluster
    * with 2x headroom), and since the rebuild rewrites vectors and
    * edges wholesale from the quantized rows, the batch lands THROUGH
    * it — equivalent to a from-scratch build over everything at the
    * fresh geometry, which is exactly what the overflow's manual
    * remedy produces. The overflow check precedes every store
    * mutation, so the rebuild always starts from a consistent store;
    * the batch tag commits through the rebuild's centroid swap, so
    * replays still no-op. Cost is corpus-scale when it fires (a
    * rebuild IS corpus-scale) — the flag is for unattended ingest
    * where loud failure is worse than a rare retrain. */
  def appendToKnnGraphStore(df: DataFrame, idCol: String, embCol: String,
                            path: String,
                            batchTag: Option[String] = None,
                            autoRebuild: Boolean = false): Unit = {
    val spark = df.sparkSession
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      val overflowed = appendGraphLocked(df, idCol, embCol, path, batchTag,
        failOnOverflow = !autoRebuild)
      if (overflowed) {
        // auto mode: the overflow means the geometry is stale for
        // stored ∪ batch, so retraining on the STORE ALONE could
        // leave cells the batch still floods (a batch from a region
        // the store never saw). Instead, rebuild on stored ∪ batch
        // UNDER THE SAME HELD LOCK (the re-entrancy story — the
        // Locked bodies never re-acquire): the rebuild rewrites
        // vectors and edges from the quantized rows wholesale, so it
        // IS the append — the batch lands through it and the batch
        // tag commits through its centroid swap (replays keep
        // no-oping). Geometry sized against the store's own
        // maxCluster with 2x headroom.
        val batchEq = df.select(col(idCol).as("vid"),
          quantize(col(embCol)).as("eq"))
        val nStored = spark.read.parquet(s"$path/vectors")
          .filter(col("probe") === 1L).count()
        val nBatch = batchEq.count()
        val maxCluster = spark.read.parquet(s"$path/meta").head().getLong(2)
        val target = math.max(1L, maxCluster / 2L)
        val minNlist = math.max(4L, (nStored + nBatch + target - 1L) / target)
        rebuildGraphLocked(spark, path, targetCell = target,
          minNlist = minNlist.toInt, iters = 2, extraEq = Some(batchEq),
          addLedger = batchTag.map(graft.io.Tables.appliedLedgerLine).toSeq)
        // kmeans gives NO balance guarantee, so sizing nlist for a
        // target cell is a heuristic, not the invariant — re-verify
        // the cap the appender relies on against the PUBLISHED
        // geometry (total probed members per cell, the same count the
        // overflow check uses) and retrain at doubled nlist until it
        // holds. The batch already landed through the first rebuild
        // (and its tag committed), so retries are pure geometry
        // retrains from the store alone. Without this, a skewed
        // kmeans could publish a still-over-cap store and the NEXT
        // append would immediately re-trigger another corpus-scale
        // rebuild (or throw without autoRebuild).
        def maxCell(): Long = spark.read.parquet(s"$path/vectors")
          .groupBy(col("cell")).agg(count(lit(1)).as("__n"))
          .agg(max(col("__n"))).head().getLong(0)
        var nl = spark.read.parquet(s"$path/centroids")
          .select(col("cid")).distinct().count().toInt
        var attempts = 0
        while (maxCell() > maxCluster && attempts < 3) {
          nl = math.max(nl * 2, nl + 1); attempts += 1
          rebuildGraphLocked(spark, path, targetCell = target,
            minNlist = nl, iters = 2)
        }
        require(maxCell() <= maxCluster,
          s"appendToKnnGraphStore autoRebuild: the batch LANDED and its " +
            s"tag committed, but retraining up to nlist=$nl could not " +
            s"bring every cell under maxCluster=$maxCluster — the store " +
            s"at $path is PUBLISHED over-cap (a replay of this call " +
            "no-ops on the applied tag and will not shrink it); the data " +
            "is too concentrated for this cap: raise maxCluster or " +
            "rebuild manually with a larger nlist")
      }
    }
  }

  /** The append body, lock ALREADY HELD by the caller. Returns true
    * iff the batch would overflow a cell and `failOnOverflow` is
    * false (nothing written in that case — the cap check precedes
    * every store mutation). */
  private def appendGraphLocked(df: DataFrame, idCol: String, embCol: String,
                                path: String, batchTag: Option[String],
                                failOnOverflow: Boolean): Boolean = {
    val spark = df.sparkSession
    import spark.implicits._
    {
      val applied = graft.io.Tables.storeAppliedLedger(spark, s"$path/centroids")
      val tagLine = batchTag.map(graft.io.Tables.appliedLedgerLine)
      if (tagLine.exists(applied.contains)) return false // replayed batch: no-op
      graft.io.Tables.warnIfLedgerWrapped(spark, s"$path/centroids", tagLine)
      // heal a prior append that crashed inside replacePartitions'
      // rename window BEFORE deriving retry content — a home partition
      // whose only copy sits in edges__old_* would otherwise read as
      // zero rows below and the retry would publish wrong lists
      graft.io.Tables.restoreOrphanedPartitions(spark, s"$path/edges")
      val gen = graft.io.Tables.storeGeneration(spark, s"$path/centroids")
      val cents = readCents(spark, path)
      val metaRow = spark.read.parquet(s"$path/meta").head()
      val (k, nprobe, maxCluster) =
        (metaRow.getLong(0).toInt, metaRow.getLong(1).toInt, metaRow.getLong(2))
      // fail-loud dim guard (the validateCodebooks precedent): the
      // assignment kernel dots over min(dim, |centroid|), so a
      // wrong-dim batch would silently mis-assign instead of erroring
      val storeDim = cents.head._2.length
      df.select(size(col(embCol))).head(1).foreach(r =>
        require(r.getInt(0) == storeDim,
          s"appendToKnnGraphStore: batch embeddings have dim ${r.getInt(0)} " +
            s"but the store at $path was built at dim $storeDim — pass the " +
            "dim the store was built with"))
      val newAsg = graphAssignments(df, idCol, embCol, cents, nprobe)
        .localCheckpoint(false)
      val batchIds = newAsg.select(col("cid")).distinct()
      val touched = newAsg.select(col("cell")).distinct().as[Long].collect().toSeq
      // "old" excludes the batch's ids so a retry over already-placed
      // vector files derives the same candidate set
      val oldMembers = spark.read.parquet(s"$path/vectors")
        .filter(col("cell").isin(touched: _*))
        .join(broadcast(batchIds), Seq("cid"), "left_anti")
        .localCheckpoint(false)
      // post-append cap per touched cell: fail loudly on overflow,
      // pair only within cells that are valid AFTER the batch lands
      val cellCounts = oldMembers.groupBy(col("cell")).agg(count(lit(1)).as("o"))
        .join(newAsg.groupBy(col("cell")).agg(count(lit(1)).as("n")),
          Seq("cell"), "full_outer")
        .select(col("cell"),
          (coalesce(col("o"), lit(0L)) + coalesce(col("n"), lit(0L))).as("bc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val over = cellCounts.filter(_._2 > maxCluster)
      if (over.nonEmpty) {
        if (failOnOverflow) throw new IllegalArgumentException(
          s"appendToKnnGraphStore: batch pushes cell(s) ${over.map(_._1).mkString(", ")} " +
            s"past maxCluster=$maxCluster at $path — the cell geometry is stale; " +
            "rebuild the store with a larger nlist (autoNlist), or pass " +
            "autoRebuild = true")
        return true
      }
      val valid = cellCounts.filter(_._2 >= 2L).map(_._1)
      val mN = newAsg.filter(col("cell").isin(valid: _*))
        .select(col("cid").as("vid"), col("eq"), col("cell"))
      val mO = oldMembers.filter(col("cell").isin(valid: _*))
        .select(col("cid").as("vid"), col("eq"), col("cell"))
      val cNew = scoreCellPairs(mN, mO.unionByName(mN)).distinct()
        .localCheckpoint(false)
      // old→new candidates are the MIRROR of cNew's new→old subset
      // (cosine is symmetric, the zero-norm guard too) — derived, not
      // re-joined: this halves the append's pair-scoring work
      val cOld = cNew
        .join(broadcast(batchIds.withColumnRenamed("cid", "b")),
          Seq("b"), "left_anti")
        .select(col("b").as("a"), col("a").as("b"), col("cosine"))
        .localCheckpoint(false)
      val newLists = knnTopK(cNew, k)
      val affected = cOld.select(col("a")).distinct()
      val oldHome = oldMembers.select(col("cid").as("a"), col("home")).distinct()
      val affHomes = oldHome.join(affected, "a")
        .select(col("home")).distinct().as[Long].collect().toSeq
      val edgesStore = spark.read.parquet(s"$path/edges")
      val storedAff = edgesStore.filter(col("home").isin(affHomes: _*))
        .join(affected, Seq("a"))
        .select(col("a"), col("b"), col("cosine"))
      // distinct: a retry re-generates candidates a half-published
      // store already merged — identical (a, b, cosine) rows collapse
      val mergedOld = knnTopK(storedAff.unionByName(cOld).distinct(), k)
      val newHome = newAsg.select(col("cid").as("a"), col("home")).distinct()
      val updated = newLists.join(broadcast(newHome), "a")
        .unionByName(mergedOld.join(oldHome, "a"))
        .localCheckpoint(false)
      val homes = updated.select(col("home")).distinct().as[Long].collect().toSeq
      val keep = edgesStore.filter(col("home").isin(homes: _*))
        .join(updated.select(col("a")).distinct(), Seq("a"), "left_anti")
      val content = keep.select(col("a"), col("b"), col("rank"),
          col("cosine"), col("home"))
        .unionByName(updated.select(col("a"), col("b"), col("rank"),
          col("cosine"), col("home")))
      // publish order: vectors (staged, skip-placed) -> edges
      // (idempotent partition rewrite) -> centroids (tag commits)
      tagLine match {
        case Some(t) => graft.io.Tables.stagedPartitionedAppend(spark,
          newAsg, s"$path/vectors", "cell", t.stripPrefix("_APPLIED-"))
        case None => newAsg.repartition(col("cell")).write.mode("append")
          .partitionBy("cell").parquet(s"$path/vectors")
      }
      if (homes.nonEmpty)
        graft.io.Tables.replacePartitions(spark, content, s"$path/edges", "home")
      graft.io.Tables.swapInParquet(spark, centsFrame(spark, cents),
        s"$path/centroids", gen, ledger = applied ++ tagLine)
      false
    }
  }

  /** Compact the graph store's VECTORS side to one file per cell —
    * tagged appends add one staged file per (batch, cell) forever,
    * and the append path's touched-cell reads pay per FILE (the
    * small-files failure [[compactIndexCodes]] fixes for code
    * stores). The EDGES side never needs this: appends rewrite whole
    * home partitions ([[graft.io.Tables.replacePartitions]]
    * repartitions to one file per dir), so touched homes stay compact
    * by construction. Same lock (centroids — what appenders hold),
    * same recovery-order contract (retry crashed tagged appends
    * FIRST: compaction absorbs orphan staged files), same transient
    * missing-dir reader caveat. */
  def compactGraphVectors(spark: org.apache.spark.sql.SparkSession,
                          path: String): Unit =
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      graft.io.Tables.compactPartitionedParquet(spark, s"$path/vectors", "cell")
    }

  /** Retrain the graph store's CELL GEOMETRY from its own vectors —
    * the recovery for [[appendToKnnGraphStore]]'s cap-overflow
    * `require` (a store built at a small corpus eventually pushes
    * every cell past maxCluster as appends accumulate; until now the
    * fix was a manual persist-over). Re-derives nlist from the stored
    * corpus via the [[autoNlist]] rule, re-trains cells, and rewrites
    * vectors + edges from the stored probe-1 (cid, eq) rows — the
    * quantized form is the store's source of truth, so no raw
    * embeddings are needed. The applied-tag ledger and generation
    * carry forward through the centroid swap: a replayed old batch
    * still no-ops against the rebuilt store.
    *
    * Crash contract: the rebuild derives EVERYTHING from the probe-1
    * vector rows, which every partial state preserves (vectors are
    * rewritten from an eagerly-materialized snapshot), so re-running
    * a crashed rebuild converges; the store is inconsistent (new
    * vectors / old centroids) only inside the window, loudly —
    * appends mis-probing partition-pruned reads return the cap guard
    * or empty cells, never silently wrong lists, and the documented
    * recovery is "re-run the rebuild". Retry crashed tagged appends
    * BEFORE rebuilding (the compaction recovery-order contract): the
    * rebuild absorbs placed vector files, after which a retry would
    * re-place them. Deliberately corpus-scale — this is the offline
    * "retrain the quantizer" move every ANN family reserves. */
  def rebuildKnnGraphStore(spark: org.apache.spark.sql.SparkSession,
                           path: String, targetCell: Long = 500L,
                           minNlist: Int = 4, iters: Int = 2): Unit =
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      rebuildGraphLocked(spark, path, targetCell, minNlist, iters)
    }

  /** The rebuild body, lock ALREADY HELD by the caller — shared by
    * the public rebuild and [[appendToKnnGraphStore]]'s autoRebuild
    * overflow path (which must retrain without re-acquiring).
    * `extraEq` rows (vid, eq) join the stored rows for training AND
    * the vectors/edges rewrite (stored rows with the same vid are
    * superseded — replay safety for a batch a crashed attempt half
    * placed), and `addLedger` lines publish with the centroid swap —
    * together they make the rebuild double as an append. */
  private def rebuildGraphLocked(spark: org.apache.spark.sql.SparkSession,
                                 path: String, targetCell: Long,
                                 minNlist: Int, iters: Int,
                                 extraEq: Option[DataFrame] = None,
                                 addLedger: Seq[String] = Nil): Unit = {
      import spark.implicits._
      val applied = graft.io.Tables.storeAppliedLedger(spark, s"$path/centroids")
      val gen = graft.io.Tables.storeGeneration(spark, s"$path/centroids")
      graft.io.Tables.restoreOrphanedPartitions(spark, s"$path/edges")
      val metaRow = spark.read.parquet(s"$path/meta").head()
      val (k, nprobe, maxCluster) =
        (metaRow.getLong(0).toInt, metaRow.getLong(1).toInt,
          metaRow.getLong(2).toInt)
      // EAGER snapshot: the rewrite below overwrites the dir this
      // frame reads — a lazy checkpoint would race the truncation
      val stored = spark.read.parquet(s"$path/vectors")
        .filter(col("probe") === 1L)
        .select(col("cid").as("vid"), col("eq"))
      val eq0 = extraEq.fold(stored)(x =>
          stored.join(x.select(col("vid")), Seq("vid"), "left_anti")
            .unionByName(x))
        .localCheckpoint(true)
      val nlist = math.max(minNlist, (eq0.count() / targetCell).toInt)
      val cents = kmeansTrain(eq0, nlist, iters)
      val asg = graphAssignmentsEq(eq0.select(col("vid").as("cid"), col("eq")),
        cents, nprobe)
      asg.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
      val graph = knnTopK(
        cellPairsTrainedEq(eq0, cents, maxCluster, nprobe, ordered = false)
          .select(col("a"), col("b"), col("cosine")), k)
      val homes = asg.filter(col("probe") === 1L)
        .select(col("cid").as("a"), col("home"))
      graph.join(homes, "a")
        .repartition(col("home"))
        .write.mode("overwrite").partitionBy("home").parquet(s"$path/edges")
      graft.io.Tables.swapInParquet(spark, centsFrame(spark, cents),
        s"$path/centroids", gen, ledger = applied ++ addLedger)
    }

  /** Maintenance diagnostic for the graph store (the k11 file-audit
    * convention): per partitioned store, partition-dir / file / row
    * counts plus crash-residue dirs — compaction debt is visible as
    * n_files > n_parts on `vectors` (tagged appends add one staged
    * file per (batch, cell); [[compactGraphVectors]] folds them), and
    * nonzero n_residue says a vacuum is due. Edges stay one file per
    * home by construction (replacePartitions repartitions). */
  def knnGraphStoreAudit(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def residue(name: String): Long = {
      val parent = new org.apache.hadoop.fs.Path(path)
      if (!fs.exists(parent)) 0L
      else fs.listStatus(parent).count { st =>
        val n = st.getPath.getName
        n.startsWith(s"${name}__next_") || n.startsWith(s"${name}__old_") ||
          n.startsWith(s"${name}__stage_")
      }.toLong
    }
    def one(name: String): (String, Long, Long, Long, Long) = {
      val r = spark.read.parquet(s"$path/$name")
        .withColumn("__f", input_file_name())
        .withColumn("__p", regexp_extract(col("__f"), "([^/]+)/[^/]+$", 1))
        .agg(countDistinct(col("__p")), countDistinct(col("__f")),
          count(lit(1))).head()
      (name, r.getLong(0), r.getLong(1), r.getLong(2), residue(name))
    }
    Seq(one("edges"), one("vectors"))
      .toDF("store", "n_parts", "n_files", "n_rows", "n_residue")
  }

  /** Directed within-cell pair scoring shared by the store append —
    * the [[cellPairsTrained]] cosine (exact-integer dot, zero-norm
    * guard) over two member frames (vid, eq, cell). */
  private def scoreCellPairs(x: DataFrame, y: DataFrame): DataFrame =
    x.as("x").join(y.as("y"),
        col("x.cell") === col("y.cell") && col("x.vid") =!= col("y.vid"))
      .select(col("x.vid").as("a"), col("y.vid").as("b"),
        dotQ(col("x.eq"), col("y.eq")).cast("double").as("__dot"),
        dotQ(col("x.eq"), col("x.eq")).cast("double").as("__na"),
        dotQ(col("y.eq"), col("y.eq")).cast("double").as("__nb"))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .select(col("a"), col("b"),
        (col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb")))).as("cosine"))

  /** Per-vector top-k window over a directed candidate-pair frame —
    * [[knnGraph]]'s tail, shared with the recall/volume ledger so the
    * graph and the ledger rank identically. Compiles to a map-side
    * WindowGroupLimit partial before the single rank exchange. */
  private[graft] def knnTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("a")).orderBy(col("cosine").desc, col("b"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("rank"), col("cosine"))
  }

  /** Label propagation over a kNN graph (Zhu & Ghahramani 2002 —
    * public method): semi-supervised score spreading for curation —
    * a small SEEDED subset carries known quality scores and every
    * other vector iteratively takes the cosine-weighted mean of its
    * neighbors' scores; seeds stay CLAMPED. The production use:
    * bootstrap a corpus-wide quality signal from a few thousand
    * human-rated documents without training a model.
    *
    * Exact-integer contract: edge weights are floor(cosine·10^6)
    * (floor, not round — a representable-tie cosine would make the
    * two engines' round modes observable), scores are micro-units,
    * and each update is one floor-division of two integer sums — so
    * `iters` unrolled rounds replay bit-for-bit in the oracle (the
    * kmeans-CTE convention). A vector with no outgoing edges (cell
    * cap, zero norm, missing from the graph) keeps its current score.
    *
    * Scale: per round ONE equi-join of the edge list with the score
    * table (both shuffle on vid — k·N and N rows) + one groupBy; no
    * all-pairs anything; iters is a small constant. */
  def knnLabelPropagation(edges0: DataFrame, seeds: DataFrame,
                          idCol: String, scoreCol: String,
                          iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = edges0.select(col("a"), col("b"),
      floor(col("cosine") * 1e6).cast("long").as("w"))
      // one materialization: every round re-reads the edge list, and
      // without the cut each round would recompute the full upstream
      // graph build (cells, pairing, top-k) from scratch
      .localCheckpoint(false)
    val seedScores = seeds.select(col(idCol).as("vid"),
      col(scoreCol).cast("long").as("__seed"))
    val ids = edges.select(col("a").as("vid"))
      .unionByName(edges.select(col("b").as("vid")))
      .unionByName(seedScores.select(col("vid"))).distinct()
    var scores = ids.join(seedScores, Seq("vid"), "left_outer")
      .select(col("vid"), coalesce(col("__seed"), lit(0L)).as("score"),
        col("__seed").isNotNull.as("is_seed"), col("__seed"))
    for (_ <- 1 to iters) {
      val nbr = edges
        .join(scores.select(col("vid").as("b"), col("score").as("__bs")), "b")
        .groupBy(col("a"))
        .agg(sum(col("w") * col("__bs")).as("__num"), sum(col("w")).as("__den"))
        // floor of the correctly-rounded double quotient == integer
        // floor at these magnitudes (num <= k·10^12 << 2^53; quotient
        // distance from any integer >= 1/den >> the 2^-53 error)
        .select(col("a").as("vid"),
          when(col("__den") > 0, floor(col("__num").cast("double") /
            col("__den").cast("double")).cast("long")).as("__nbr"))
      scores = scores.join(nbr, Seq("vid"), "left_outer")
        .select(col("vid"),
          when(col("is_seed"), col("__seed"))
            .otherwise(coalesce(col("__nbr"), col("score"))).as("score"),
          col("is_seed"), col("__seed"))
    }
    scores.select(col("vid"), col("score").as("score_micro"), col("is_seed"))
  }

  /** The EXACT directed kNN graph for an eval subset of vectors —
    * every other corpus vector considered (linear in the corpus, the
    * eval side bounded): the ground truth [[knnGraph]]'s recall ledger
    * compares against. Same cosine, tie-break and zero-norm contract
    * as the cell-bucketed path so the only difference IS the cell
    * boundary. */
  def knnGraphExact(df: DataFrame, evalPred: Column, idCol: String,
                    embCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val all = df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq"))
    val ev = all.filter(evalPred)
      .select(col("vid").as("a"), col("eq").as("aeq"))
    val pairs = all.crossJoin(broadcast(ev))
      .filter(col("vid") =!= col("a"))
      .select(col("a"), col("vid").as("b"),
        dotQ(col("aeq"), col("eq")).cast("double").as("__dot"),
        dotQ(col("aeq"), col("aeq")).cast("double").as("__na"),
        dotQ(col("eq"), col("eq")).cast("double").as("__nb"))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .select(col("a"), col("b"),
        (col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb")))).as("cosine"))
    val w = Window.partitionBy(col("a")).orderBy(col("cosine").desc, col("b"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("rank"), col("cosine"))
  }

  /** Full IVF: train the coarse quantizer with k-means, then probe —
    * the composition a production index build runs. The learned
    * cluster id rides as a map-side kernel COLUMN on the store frame
    * (the cellPairs convention) — the (vid → cluster) re-join the
    * pre-r17 shape paid, a corpus-scale shuffle per build, is gone. */
  def ivfTopKAuto(df: DataFrame, queries: DataFrame, idCol: String, embCol: String,
                  k: Int, nlist: Int = 4, iters: Int = 2): DataFrame = {
    val cents = kmeansTrain(
      df.select(col(idCol).as("vid"), quantize(col(embCol)).as("eq")),
      nlist, iters)
    ivfTopK(df.withColumn("__cluster",
        graft.expr.kernels.NativeFns.argminCentroid(
          quantize(col(embCol)), cents)),
      queries, idCol, embCol, "__cluster", k)
  }

  /** IVF-style ANN with a provided coarse quantizer (here: the label
    * column as cluster id; production swaps in k-means assignments).
    * Centroids are exact integer sum-vectors per cluster (explode +
    * groupBy — map-side combined, linear shuffle); each query probes
    * its best cluster only, so the fine search scans |data|/nlist
    * candidates instead of everything — the IVF pruning structure. */
  def ivfTopK(df: DataFrame, queries: DataFrame, idCol: String, embCol: String,
              labelCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val (cent, eq) = buildIvfIndex(df, idCol, embCol, labelCol)
    ivfTopKIndexed(cent, eq, queries, idCol, embCol, k, nprobe)
  }

  /** Build the IVF index frames once: quantized assignments
    * `(cid, label, eq)` and centroid sum-vectors `(label, pos, s, cnt)`
    * — one row per (cluster, dimension), the cluster size riding along
    * in the same aggregation (it is the row count at any one
    * dimension), saving a separate groupBy + join. The assignments
    * frame is checkpointed because it feeds both the centroid build
    * and the fine search; persist it instead with [[persistIvfIndex]]
    * and the build cost disappears from the serving path entirely. */
  def buildIvfIndex(df: DataFrame, idCol: String, embCol: String,
                    labelCol: String): (DataFrame, DataFrame) = {
    val eq = df.select(col(idCol).as("cid"), col(labelCol).as("label"),
      quantize(col(embCol)).as("eq")).localCheckpoint(false)
    val expl = eq.select(col("label"), posexplode(col("eq")).as(Seq("pos", "v")))
    val cent = expl.groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
    (cent, eq)
  }

  /** Write the IVF index as the SERVING layout: assignments
    * partitioned BY CLUSTER — one directory per label, the partition-
    * pruning unit — plus the (tiny) centroid table. A query batch
    * against the persisted index then (a) trains nothing, (b) probes
    * clusters via the broadcast centroid table, and (c) reads ONLY the
    * probed clusters' files: the label equi-join against the pruned
    * query→cluster frame drives Spark's dynamic partition pruning, so
    * at 1000 executors the fine search touches ~|probed|/nlist of the
    * corpus bytes instead of scanning everything. */
  def persistIvfIndex(df: DataFrame, idCol: String, embCol: String,
                      labelCol: String, path: String): Unit = {
    val (cent, eq) = buildIvfIndex(df, idCol, embCol, labelCol)
    eq.write.mode("overwrite").partitionBy("label").parquet(s"$path/assignments")
    cent.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted index: (centroids, assignments). */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/assignments"))

  /** Assign vectors to their nearest cluster by exact integer L2²
    * against a FROZEN centroid table (mean vectors = floor(s/cnt),
    * the kmeansClusters update rule) — the production labeling step
    * for new batches against a trained coarse quantizer. Centroids
    * collect bounded (nlist × dim rows, the k-means contract) and
    * inline as literals into a codegen'd map-side argmin: no join, no
    * exchange, ties break on the lower label. Returns (idCol, label). */
  def assignClusters(df: DataFrame, idCol: String, embCol: String,
                     cent: DataFrame): DataFrame = {
    val rows = cent.select(col("label").cast("long"), col("pos").cast("int"),
        col("s").cast("long"), col("cnt").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getLong(3)))
    require(rows.nonEmpty, "assignClusters: empty centroid table")
    val cents = rows.groupBy(_._1).toSeq.map { case (label, ps) =>
      label -> ps.sortBy(_._2).map { case (_, _, s, cnt) =>
        math.floorDiv(s, math.max(cnt, 1L))
      }.toSeq
    }.sortBy(_._1)
    // materialize the quantized vector once, then the dot-identity
    // argmin as in kmeansClusters/pqEncodeFrame — same order, same
    // ties; the native kernel keeps the generated code fixed-size at
    // any nlist (labels ascend by construction of the sortBy)
    val best = graft.expr.kernels.NativeFns.argminCentroid(col("__eq"), cents)
    df.withColumn("__eq", quantize(col(embCol)))
      .select(col(idCol), best.as("label"))
  }

  /** Append a new batch to a persisted IVF index WITHOUT rebuilding —
    * the daily-embedding-delta path: quantized assignments append as
    * new files under their clusters' partition directories (the base
    * index is never rewritten or rescanned), and the (tiny) centroid
    * sum table merges additively — sums and counts are exact integers,
    * so index-after-append EQUALS index-rebuilt-from-scratch
    * bit-for-bit, and so does every serving answer (spec'd; the
    * llm_ann_ivf_append oracle row shares the full-build oracle).
    * `labelCol` carries the batch's cluster ids; for a learned
    * quantizer, label the batch first with [[assignClusters]] against
    * the frozen centroid table — the standard IVF practice (the coarse
    * quantizer does not drift with appends; retrain is a deliberate
    * offline rebuild). */
  def appendToIvfIndex(df: DataFrame, idCol: String, embCol: String,
                       labelCol: String, path: String): Unit = {
    val spark = df.sparkSession
    // whole append (file adds + centroid merge) under the store lock:
    // two racing appenders serialize, so neither merges a stale base
    // and the assignments/centroids pair can never tear (r15 —
    // single-writer contract enforced, not just documented)
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      val gen = graft.io.Tables.storeGeneration(spark, s"$path/centroids")
      val (centNew, eqNew) = buildIvfIndex(df, idCol, embCol, labelCol)
      eqNew.write.mode("append").partitionBy("label")
        .parquet(s"$path/assignments")
      val merged = spark.read.parquet(s"$path/centroids")
        .unionByName(centNew)
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("s")).as("s"), sum(col("cnt")).as("cnt"))
      graft.io.Tables.swapInParquet(spark, merged, s"$path/centroids", gen)
    }
  }

  /** ANN against a pre-built index — the serving path. Same math as
    * [[ivfTopK]] (differential-spec'd equal); the index frames come
    * from [[buildIvfIndex]] or [[readIvfIndex]].
    *
    * `nprobe` is the standard IVF recall knob: fine-search the union
    * of the query's best `nprobe` clusters instead of just the top one.
    * Single-probe IVF has a well-known recall cliff for queries near
    * cluster boundaries (their true neighbors sit in the runner-up
    * cluster); probing 2 clusters measurably recovers much of it
    * (llm_ann_ivf_recall: 0.30 vs 0.17 @3 on the harness split) for
    * nprobe× the fine-search candidates. The plan shape is unchanged —
    * the pruned frame simply carries nprobe labels per query, and the
    * label equi-join still drives dynamic partition pruning against a
    * cluster-partitioned index (the probed-file set just has nprobe
    * entries per query). Clusters are disjoint, so the union
    * introduces no duplicate candidates. */
  def ivfTopKIndexed(cent: DataFrame, eq: DataFrame, queries: DataFrame,
                     idCol: String, embCol: String, k: Int,
                     nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val q = queries.select(col(idCol).as("qid"), quantize(col(embCol)).as("qe"))
    val best = ivfProbe(cent, q, nprobe)
    // fine search within the probed clusters only
    val scored = q.join(best, "qid").join(eq, "label")
      .filter(col("cid") =!= col("qid"))
      .withColumn("dot", dotQ(col("qe"), col("eq")))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("cid"))
    scored.withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("label"), col("cid"), col("rank"), col("dot"))
  }

  /** Per-query best-`nprobe` coarse clusters by centroid mean-dot
    * against the broadcast centroid sum table — the IVF probe step,
    * shared by [[ivfTopKIndexed]] and [[ivfPqTopK]] (public so the
    * recall/scan ledgers can measure the probed fraction in-engine).
    * Input `q` is (qid, qe); centroids are nlist × dim rows, always
    * broadcastable. Ties break on the lower label. */
  def ivfProbe(cent: DataFrame, q: DataFrame,
               nprobe: Int): DataFrame = {
    val qexpl = q.select(col("qid"), posexplode(col("qe")).as(Seq("pos", "qv")))
    val assign = qexpl.join(broadcast(cent), "pos")
      .groupBy(col("qid"), col("label"))
      .agg(sum(col("qv") * col("s")).as("qdot"), max(col("cnt")).as("cnt"))
      .withColumn("score", col("qdot").cast("double") / col("cnt"))
    val wBest = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("label"))
    assign.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") <= nprobe).select(col("qid"), col("label"))
  }

  /** Persist an IVFPQ index — the FAISS IVFPQ composition (Jégou,
    * Douze & Schmid, TPAMI 2011 §V — public method; the non-residual
    * variant, FAISS `by_residual=false`, so every score stays
    * exact-integer and oracle-replayable). ONE on-disk artifact:
    *   - `centroids`: the coarse IVF sum table (tiny; broadcast at
    *     serve time),
    *   - `codebooks`: the PQ codebooks,
    *   - `codes`: the m-small-int PQ codes PARTITIONED BY COARSE
    *     CLUSTER — the serving layout; each cluster is a partition
    *     directory, the partition-pruning unit.
    * [[ivfPqTopK]] then probes each query's best `nprobe` clusters,
    * reads ONLY those clusters' code files (the label equi-join drives
    * dynamic partition pruning), ADC-ranks the codes, and exactly
    * rescores the coarse set from the full store. At 100 TB a query
    * batch touches ~nprobe/nlist of the CODE column bytes and never
    * the vectors — where plain [[pqServe]] ADC-scans EVERY code row
    * per batch and plain [[ivfTopKIndexed]] rescans raw vectors inside
    * the probed clusters. `labelCol` carries the coarse cluster ids
    * (label a new corpus with [[assignClusters]] against a trained
    * quantizer first); the PQ codebooks train on the same label init —
    * the deterministic replay convention of [[pqCodebooks]]. */
  def persistIvfPqIndex(df: DataFrame, idCol: String, embCol: String,
                        labelCol: String, path: String, m: Int = 4,
                        dim: Int = 64, train: Option[DataFrame] = None): Unit = {
    val (cent, eq) = buildIvfIndex(df, idCol, embCol, labelCol)
    cent.write.mode("overwrite").parquet(s"$path/centroids")
    val byLabel = train.map(pqCodebooks(_, embCol, labelCol))
      .getOrElse(pqCodebooks(df, embCol, labelCol))
    writePqCodebooks(df.sparkSession, byLabel, path)
    pqEncodeFrame(df, idCol, embCol, byLabel, m, dim)
      .join(eq.select(col("cid"), col("label")), "cid")
      .write.mode("overwrite").partitionBy("label").parquet(s"$path/codes")
  }

  /** Append a batch to a persisted (non-residual) IVFPQ index — the
    * daily-crawl serving-index delta, composing the two append paths
    * the engine already proves: codes encode against the FROZEN
    * codebooks and land as new files under their clusters' partition
    * dirs ([[appendToPqIndex]]'s contract), and the centroid sum
    * table merges additively in exact integers
    * ([[appendToIvfIndex]]'s contract) — so the appended index serves
    * IDENTICALLY to a full rebuild (llm_ann_ivfpq_append shares the
    * full-build oracle; LlmSpec differential).
    *
    * The RESIDUAL variant deliberately has NO append: residual codes
    * depend on the centroid means, which an append shifts — a
    * drifted-centroid append would silently decode old codes against
    * the wrong offsets. FAISS freezes its coarse quantizer for the
    * same reason; retrain-and-rebuild is the correct operation there. */
  def appendToIvfPqIndex(df: DataFrame, idCol: String, embCol: String,
                         labelCol: String, path: String, m: Int = 4,
                         dim: Int = 64, batchTag: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // same enforced single-writer window as appendToIvfIndex; same
    // applied-ledger + staged-codes exactly-once contract as
    // appendToIvfSq8Index when `batchTag` is given
    graft.io.Tables.withStoreLock(spark, s"$path/centroids") {
      val applied = graft.io.Tables.storeAppliedLedger(spark, s"$path/centroids")
      val tagLine = batchTag.map(graft.io.Tables.appliedLedgerLine)
      if (tagLine.exists(applied.contains)) return // replayed batch: no-op
      graft.io.Tables.warnIfLedgerWrapped(spark, s"$path/centroids", tagLine)
      val gen = graft.io.Tables.storeGeneration(spark, s"$path/centroids")
      val (byLabel, _) = readPqIndex(spark, path)
      validateCodebooks(spark, byLabel, m, dim, path)
      val (centNew, eqNew) = buildIvfIndex(df, idCol, embCol, labelCol)
      val codes = pqEncodeFrameQ(eqNew.select(col("cid"), col("eq").as("ce")),
          byLabel, m, dim)
        .join(eqNew.select(col("cid"), col("label")), "cid")
      tagLine match {
        case Some(t) => graft.io.Tables.stagedPartitionedAppend(spark, codes,
          s"$path/codes", "label", t.stripPrefix("_APPLIED-"))
        case None => codes.write.mode("append").partitionBy("label")
          .parquet(s"$path/codes")
      }
      val merged = spark.read.parquet(s"$path/centroids")
        .unionByName(centNew)
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("s")).as("s"), sum(col("cnt")).as("cnt"))
      graft.io.Tables.swapInParquet(spark, merged, s"$path/centroids", gen,
        ledger = applied ++ tagLine)
    }
  }

  /** Load a persisted IVFPQ index → (centroids, codebooks, codes). */
  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): (DataFrame, Map[Long, IndexedSeq[Long]], DataFrame) = {
    val (byLabel, codes) = readPqIndex(spark, path)
    (spark.read.parquet(s"$path/centroids"), byLabel, codes)
  }

  /** IVFPQ serving — the composition of the IVF probe and the PQ ADC
    * scan: probe each query's best `nprobe` coarse clusters
    * ([[ivfProbe]]), join the (query, probed cluster, lut-arrays)
    * frame — one row per (query, probe), always tiny — against the
    * cluster-partitioned code store on the PARTITION column, ADC-rank
    * only the probed clusters' codes, exact-rescore the coarse set.
    * The broadcast equi-join on `label` is what drives dynamic
    * partition pruning on the code store: the scan reads the probed
    * clusters' files only, and only the (cid, codes, label) columns
    * (plan-asserted in LlmSpec). Clusters are disjoint, so probes
    * introduce no duplicate candidates. Same output shape and exact
    * arithmetic as [[pqServe]] — on a probe set covering every
    * cluster the two are bit-identical. */
  def ivfPqTopK(cent: DataFrame, byLabel: Map[Long, IndexedSeq[Long]],
                codes: DataFrame, store: DataFrame, queries: DataFrame,
                qId: String, embCol: String, k: Int, m: Int = 4,
                dim: Int = 64, coarse: Int = 20, nprobe: Int = 1): DataFrame = {
    require(coarse >= k, s"coarse depth $coarse must be >= k=$k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    pqCoarseRescore(ivfPqScoredCandidates(cent, byLabel, codes, queries,
      qId, embCol, m, dim, nprobe), queries, qId, embCol, store, k, coarse)
  }

  /** The ADC-scored candidate frame (qid, cid, adc) of IVFPQ serving —
    * [[ivfPqTopK]] minus the coarse cut and rescore. Public so a
    * tuning sweep (the grid ledger) can score each nprobe ONCE and
    * apply several coarse widths to the same frame: the probe, DPP
    * scan and ADC are identical across coarse settings, only the
    * downstream top-`coarse` window changes. */
  def ivfPqScoredCandidates(cent: DataFrame, byLabel: Map[Long, IndexedSeq[Long]],
                            codes: DataFrame, queries: DataFrame, qId: String,
                            embCol: String, m: Int = 4, dim: Int = 64,
                            nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val q = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val best = ivfProbe(cent, q, nprobe)
    val (qLut, adc) = pqLutAndAdc(byLabel, queries, qId, embCol, m, dim)
    val probed = best.join(qLut, "qid")
    codes.join(broadcast(probed), "label")
      .withColumn("adc", adc)
      .select(col("qid"), col("cid"), col("adc"))
  }

  /** Coarse top-`coarse` by ADC + exact rescore over a scored
    * candidate frame — the public face of the serving tail, paired
    * with [[ivfPqScoredCandidates]]. */
  def coarseRescore(scored: DataFrame, queries: DataFrame, qId: String,
                    embCol: String, store: DataFrame, k: Int,
                    coarse: Int): DataFrame = {
    require(coarse >= k, s"coarse depth $coarse must be >= k=$k")
    pqCoarseRescore(scored, queries, qId, embCol, store, k, coarse)
  }

  /** Per-cluster exact-integer mean vectors from the centroid SUM
    * table: floor(s / cnt) computed driver-side with `math.floorDiv`
    * (floor, NOT truncation — embedding sums go negative, and the two
    * roundings differ there; the oracle replays it as
    * floor(CAST(s AS DOUBLE) / cnt), identical for |s| < 2^53).
    * nlist × dim longs — tiny by the k-means contract. */
  private def centroidMeans(cent: DataFrame): Map[Long, IndexedSeq[Long]] =
    cent.select(col("label").cast("long"), col("pos").cast("int"),
        col("s").cast("long"), col("cnt").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2)
        .map(t => math.floorDiv(t._3, math.max(t._4, 1L))).toIndexedSeq)
      .toMap

  /** Literal per-label centroid array column. Coarse labels are DENSE
    * 0..nlist-1 for every trained quantizer ([[kmeansClusters]] seeds
    * cluster ids 0..k-1; the fixture label column is 0-based), so the
    * fast path is ONE literal array-of-arrays indexed positionally by
    * `label` — O(1) per row, and the generated code does NOT grow with
    * nlist (the [[pqLutAndAdc]] fix pattern; the previous per-label
    * `when` chain re-grew linearly at a production nlist of
    * 4096–65536, the same disease the ADC chain had pre-r13). A
    * sparse label space falls back to [[centroidArrColChain]], kept as
    * the differential anchor: for labels present in `means` the two
    * forms select the SAME literal array (by position vs by equality),
    * so they are bit-identical (spec'd in LlmSpec). */
  private[llm] def centroidArrCol(means: Map[Long, IndexedSeq[Long]]): Column = {
    val labels = means.keys.toSeq.sorted
    if (labels == (0L until labels.size.toLong))
      // ONE array-of-arrays literal (typedLit), not nested CreateArray
      // nodes: CreateArray inlines O(nlist·dim) literals into generated
      // code and hits the same Janino ceiling ArgminCentroid closed —
      // a single Literal is a constant reference, zero code growth
      element_at(typedLit(labels.map(l => means(l).toSeq)),
        (col("label").cast("int") + lit(1)))
    else centroidArrColChain(means)
  }

  /** The when-chain form of [[centroidArrCol]] — the bit-equality
    * differential anchor (and the sparse-label fallback). */
  private[llm] def centroidArrColChain(means: Map[Long, IndexedSeq[Long]]): Column =
    coalesce(means.keys.toSeq.sorted.map { l =>
      when(col("label") === l, array(means(l).map(lit): _*))
    }: _*)

  /** Residual IVFPQ index — FAISS `by_residual=true`, the full IVFPQ
    * shape: PQ encodes each vector's RESIDUAL against its own coarse
    * centroid (exact integer mean), so the codebooks spend their bits
    * on within-cluster structure instead of re-describing the cluster
    * position the coarse quantizer already knows — the standard
    * recall win at equal code budget (measured in-engine by
    * `llm_ann_ivfpq_res_recall`). Codebook init is `cid % nCodewords`
    * over the residuals: the label init of the non-residual path
    * degenerates here (per-label residual means are ~zero by
    * construction), while the modulo init is deterministic, dense
    * (0..k-1 — the O(1) ADC path), and SQL-replayable. Serving adds
    * each probed cluster's exact dot(query, centroid) — one integer
    * per (query, probe) — to the residual ADC; the layout and DPP
    * pruning story are identical to [[persistIvfPqIndex]]. */
  def persistIvfPqResidualIndex(df: DataFrame, idCol: String, embCol: String,
                                labelCol: String, path: String, m: Int = 4,
                                dim: Int = 64, nCodewords: Int = 8): Unit = {
    val (cent, byCode, codes) =
      buildIvfPqResidual(df, idCol, embCol, labelCol, m, dim, nCodewords)
    cent.write.mode("overwrite").parquet(s"$path/centroids")
    writePqCodebooks(df.sparkSession, byCode, path)
    codes.write.mode("overwrite").partitionBy("label").parquet(s"$path/codes")
  }

  /** The in-memory residual-IVFPQ build — (centroid sums, residual
    * codebooks, labeled codes) — shared by [[persistIvfPqResidualIndex]]
    * and the inline ledger paths. `refineRounds` > 0 Lloyd-refines the
    * cid-modulo-init residual codebooks ([[refineBooksQ]] — the same
    * bounded-collect rounds and keep-when-empty rule as the raw path,
    * applied to the residual arrays; FAISS refines its residual
    * codebooks the same way), and the codes then encode against the
    * REFINED books. Priced in-engine by llm_ann_ivfpq_res_recall's
    * `ivfpq_res_probe2_it2` row at identical serving cost. */
  def buildIvfPqResidual(df: DataFrame, idCol: String, embCol: String,
                         labelCol: String, m: Int = 4, dim: Int = 64,
                         nCodewords: Int = 8,
                         refineRounds: Int = 0): (DataFrame, Map[Long, IndexedSeq[Long]], DataFrame) = {
    val (cent, eq) = buildIvfIndex(df, idCol, embCol, labelCol)
    buildIvfPqResidualFrom(cent, eq, m, dim, nCodewords, refineRounds)
  }

  /** The residual build over an ALREADY-BUILT coarse index
    * ([[buildIvfIndex]]'s (cent, eq)) — the multi-variant/ledger path:
    * one coarse build and one checkpointed assignment frame shared
    * across codebook variants (init vs refined) instead of rebuilding
    * per arm; `init` additionally reuses trained init books (the
    * [[pqCodebooksRefined]] convention). Returns the same `cent` for
    * triple-shape symmetry with [[buildIvfPqResidual]]. */
  def buildIvfPqResidualFrom(cent: DataFrame, eq: DataFrame, m: Int = 4,
                             dim: Int = 64, nCodewords: Int = 8,
                             refineRounds: Int = 0,
                             init: Option[Map[Long, IndexedSeq[Long]]] = None): (DataFrame, Map[Long, IndexedSeq[Long]], DataFrame) = {
    require(refineRounds >= 0, s"refineRounds must be >= 0, got $refineRounds")
    val means = centroidMeans(cent)
    val resid = eq.withColumn("__c", centroidArrCol(means))
      .select(col("cid"), col("label"),
        zip_with(col("eq"), col("__c"), (x, c) => x - c).as("ce"))
    val initBooks = init.getOrElse(
      pqCodebooksQ(resid, col("ce"), pmod(col("cid"), lit(nCodewords))))
    val byCode =
      if (refineRounds == 0) initBooks
      else refineBooksQ(resid.select(col("cid"), col("ce")), initBooks, m, dim,
        refineRounds)
    val codes = pqEncodeFrameQ(resid, byCode, m, dim)
      .join(eq.select(col("cid"), col("label")), "cid")
    (cent, byCode, codes)
  }

  /** Residual IVFPQ serving: probe → per-probe exact centroid dot →
    * DPP-pruned residual-ADC scan of the probed clusters' codes →
    * exact rescore. approx(q, x) = dot(q, c_label(x)) + Σ_s
    * LUT_s[code_s(x)] — the FAISS ADC decomposition, all exact
    * integers. */
  def ivfPqResidualTopK(cent: DataFrame, byCode: Map[Long, IndexedSeq[Long]],
                        codes: DataFrame, store: DataFrame, queries: DataFrame,
                        qId: String, embCol: String, k: Int, m: Int = 4,
                        dim: Int = 64, coarse: Int = 20,
                        nprobe: Int = 1): DataFrame = {
    require(coarse >= k, s"coarse depth $coarse must be >= k=$k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val q = queries.select(col(qId).as("qid"), quantize(col(embCol)).as("qe"))
    val best = ivfProbe(cent, q, nprobe)
    val means = centroidMeans(cent)
    val (qLut, adcR) = pqLutAndAdc(byCode, queries, qId, embCol, m, dim)
    // (qid, label, luts, __qc): one row per (query, probe) — tiny;
    // __qc is the exact centroid dot the residual ADC is offset by
    val probed = best.join(qLut, "qid").join(q, "qid")
      .withColumn("__carr", centroidArrCol(means))
      .withColumn("__qc",
        graft.expr.kernels.NativeFns.longDot(col("qe"), col("__carr")))
      .drop("qe", "__carr")
    val scored = codes.join(broadcast(probed), "label")
      .withColumn("adc", adcR + col("__qc"))
      .select(col("qid"), col("cid"), col("adc"))
    pqCoarseRescore(scored, queries, qId, embCol, store, k, coarse)
  }
}
