package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional
  * generalization of `Tables.writeSorted`. A 1-D sort layout gives
  * selective scans on the sort key tight parquet footer min/max, but
  * every OTHER column spans its full domain in every file. Interleaving
  * the bits of two or three key dimensions into one `zvalue` and
  * range-sorting on THAT bounds every participating dimension per file
  * (each file covers a compact hyper-rectangle-ish region of the key
  * space), so a 100 TB table filtered on `user` OR `time` OR both skips
  * most files from footers alone — the clustering layout Delta/Iceberg
  * expose as Z-ORDER, built here from Spark primitives: a codegen'd
  * bit-twiddle column, `repartitionByRange`, `sortWithinPartitions`.
  *
  * The interleave is the classic mask-spread ("Part1By1"/"Part1By2")
  * sequence — pure 64-bit integer arithmetic, identical in any engine
  * with two's-complement BIGINT ops, which is what makes `zvalue2`
  * oracle-checkable value-for-value in DuckDB (`k9_zorder_keys`).
  *
  * Domain contract: inputs must already be NON-NEGATIVE integer
  * "cells" — bucket indices, not raw values. `zvalue2` accepts up to
  * 31 bits per dimension (z < 2^62, sign bit untouched mid-compute);
  * `zvalue3` up to 21 bits per dimension (z < 2^63). Out-of-domain
  * inputs still produce a deterministic value but the curve-ordering
  * guarantee is void (a set sign bit would order negative-first);
  * `writeZOrdered` never produces them by construction.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` onto the even bit positions of a
    * 64-bit value (Morton "Part1By1"). Composed-Column form, kept for
    * differential testing against the native expression (the foldLeft
    * references its accumulator twice per step, so this TREE duplicates
    * ~2^5× — fine for a spec, bloated in a production plan). */
  private[graft] def spread1(x: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8  -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL,
      2  -> 0x3333333333333333L,
      1  -> 0x5555555555555555L)
    steps.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }
  }

  /** Spread the low 21 bits of `x` onto every third bit position
    * (Morton "Part1By2", for 3-D interleave). Composed form — see
    * [[spread1]]. */
  private[graft] def spread2(x: Column): Column = {
    val steps = Seq(
      32 -> 0x001F00000000FFFFL,
      16 -> 0x001F0000FF0000FFL,
      8  -> 0x100F00F00F00F00FL,
      4  -> 0x10C30C30C30C30C3L,
      2  -> 0x1249249249249249L)
    steps.foldLeft(x.cast("long").bitwiseAND(lit(0x1FFFFFL))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }
  }

  /** 2-D Morton code: bits of `a` on even positions, `b` on odd.
    * Monotone along the Z-curve for a, b in [0, 2^31). Native codegen'd
    * expression (graft_morton2 in SQL); [[spread1]]'s composed form is
    * the differential-test twin (ZOrderSpec asserts equality). */
  def zvalue2(a: Column, b: Column): Column =
    graft.expr.kernels.NativeFns.morton2(a, b)

  /** 3-D Morton code for a, b, c in [0, 2^21). */
  def zvalue3(a: Column, b: Column, c: Column): Column =
    graft.expr.kernels.NativeFns.morton3(a, b, c)

  /** Inverse interleave — recover both cell indices from a 2-D Morton
    * code (diagnostics: which region does this file's z-range cover?).
    * Reverse mask-compaction; composed Columns are fine here — decode
    * never sits in a hot path. */
  def zdecode2(z: Column): (Column, Column) = (compact1(z), compact1(shiftright(z, 1)))

  /** Inverse of [[zvalue3]]. */
  def zdecode3(z: Column): (Column, Column, Column) =
    (compact2(z), compact2(shiftright(z, 1)), compact2(shiftright(z, 2)))

  private def compact1(z: Column): Column = {
    val steps = Seq(
      1  -> 0x3333333333333333L,
      2  -> 0x0F0F0F0F0F0F0F0FL,
      4  -> 0x00FF00FF00FF00FFL,
      8  -> 0x0000FFFF0000FFFFL,
      16 -> 0x00000000FFFFFFFFL)
    steps.foldLeft(z.bitwiseAND(lit(0x5555555555555555L))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftright(acc, s)).bitwiseAND(lit(m))
    }
  }

  private def compact2(z: Column): Column = {
    val steps = Seq(
      2  -> 0x10C30C30C30C30C3L,
      4  -> 0x100F00F00F00F00FL,
      8  -> 0x001F0000FF0000FFL,
      16 -> 0x001F00000000FFFFL,
      32 -> 0x00000000001FFFFFL)
    steps.foldLeft(z.bitwiseAND(lit(0x1249249249249249L))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftright(acc, s)).bitwiseAND(lit(m))
    }
  }

  /** Composed-Column twins of the native z-values, spec-only. */
  private[graft] def zvalue2Composed(a: Column, b: Column): Column =
    spread1(a).bitwiseOR(shiftleft(spread1(b), 1))
  private[graft] def zvalue3Composed(a: Column, b: Column, c: Column): Column =
    spread2(a)
      .bitwiseOR(shiftleft(spread2(b), 1))
      .bitwiseOR(shiftleft(spread2(c), 2))

  /** Map a numeric column onto integer cells [0, buckets) by uniform
    * min/max scaling — the per-dimension normalization step before
    * interleaving. `lo`/`hi` are the dimension's global bounds
    * (computed once per write from a tiny agg; constant-folded into
    * the per-row expression). Degenerate dimension (lo == hi) → cell 0.
    *
    * Uniform cells keep the map stateless and codegen'd; a heavily
    * skewed dimension should be pre-transformed (log, rank) by the
    * caller — same caveat as uniform histograms. */
  def uniformCell(v: Column, lo: Double, hi: Double, buckets: Int): Column = {
    require(buckets > 0 && buckets <= (1 << 21), s"buckets must be in [1, 2^21]; got $buckets")
    if (hi <= lo) lit(0L)
    else least(
      greatest(
        floor((v.cast("double") - lit(lo)) / lit((hi - lo) / buckets)).cast("long"),
        lit(0L)),
      lit(buckets - 1L))
  }

  /** Z-ordered parquet sink: bucket each dimension uniformly between
    * its global min/max, interleave the cells (2 or 3 dims), then
    * range-partition + sort on the z-value so every file covers a
    * compact region of the multi-dimensional key space and parquet
    * footers carry tight min/max on EVERY dimension. One tiny
    * min/max agg (driver-side, 2×dims doubles) + one range exchange —
    * the same shuffle budget as `writeSorted`. Uniform cells assume
    * roughly uniform dimensions; for skewed keys use
    * [[writeZOrderedByRank]]. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    files: Int, buckets: Int = 1 << 12): Unit = {
    require(dims.size == 2 || dims.size == 3,
      s"z-order needs 2 or 3 dimensions; got ${dims.size} (1 -> writeSorted)")
    val bounds = df.select(
      dims.flatMap(d => Seq(min(col(d).cast("double")).as(s"lo_$d"),
        max(col(d).cast("double")).as(s"hi_$d"))): _*).head()
    val cells = dims.zipWithIndex.map { case (d, i) =>
      uniformCell(col(d), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1), buckets)
    }
    writeByZ(df, cells, path, files)
  }

  /** Skew-robust Z-order: per-dimension cells are QUANTILE ranks, not
    * uniform slices — a zipfian key (the 100 TB reality: hot users,
    * hot domains, bursty time) collapses uniform cells into one bucket
    * and degrades the curve to a 1-D sort on the other dims; rank
    * cells keep every cell near-equal mass regardless of the
    * distribution. Boundaries come from ONE approxQuantile pass
    * (driver-bounded: `buckets`-1 doubles per dim, Greenwald–Khanna),
    * and the per-row mapping is a codegen'd binary search over the
    * literal boundary array (SearchSortedDouble — O(log buckets),
    * never an interpreted HOF fold). Same single range exchange. */
  def writeZOrderedByRank(df: DataFrame, path: String, dims: Seq[String],
                          files: Int, buckets: Int = 1 << 12): Unit = {
    require(dims.size == 2 || dims.size == 3,
      s"z-order needs 2 or 3 dimensions; got ${dims.size} (1 -> writeSorted)")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cast = df.select(dims.map(d => col(d).cast("double").as(d)): _*)
    val cells = dims.map { d =>
      // dedupe to strictly increasing: a heavy value spanning many
      // quantiles yields repeated boundaries, which binarySearch
      // cannot accept (and which carry no extra information)
      val bs = cast.stat.approxQuantile(d, probs, 0.001)
        .toSeq.distinct.sorted
      if (bs.isEmpty) lit(0L)
      else graft.expr.kernels.NativeFns.searchSorted(col(d), bs)
    }
    writeByZ(df, cells, path, files)
  }

  private def writeByZ(df: DataFrame, cells: Seq[Column], path: String,
                       files: Int): Unit = {
    val z = if (cells.size == 2) zvalue2(cells(0), cells(1))
            else zvalue3(cells(0), cells(1), cells(2))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
