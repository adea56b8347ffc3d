package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Scale-safe split-point selection for DSv2 partition planning.
  *
  * The planner's job is to turn "all keys of the table" into at most
  * `numPartitions - 1` interior split bounds. Buffering every key on
  * the driver to pick N split points is O(|keys|) driver memory — a
  * scale killer when the key space is the 100-TB table itself. This is
  * a one-pass systematic (stride) sample instead: keep every
  * `stride`-th key; whenever the buffer overflows the cap, drop every
  * other retained key and double the stride. Memory is O(cap) =
  * O(numPartitions) regardless of key count, one pass, no second scan.
  *
  * Split bounds do NOT need to be exact quantiles for correctness —
  * the produced ranges [prev, next) tile the whole key space, so every
  * key lands in exactly one partition no matter how approximate the
  * sample is; sampling only affects balance. With ~`SamplesPerSplit`
  * retained keys per requested split (the same density the public
  * Datastore Beam connector uses for scatter-key splitting), skew
  * stays within a small constant factor of ideal.
  */
private[sources] object RangePlanner {

  /** Retained sample keys per requested partition (32 mirrors the
    * Datastore Beam connector's oversampling factor). */
  val SamplesPerSplit = 32

  /** String order by Unicode CODE POINT — identical to UTF-8 byte
    * order for valid strings, and therefore identical to how both the
    * backing services and Spark's own `UTF8String` compare keys. Java
    * `String.compareTo` (UTF-16 code units) disagrees above U+FFFF:
    * surrogate pairs (0xD800-0xDFFF) sort below U+E000..U+FFFF chars
    * while their UTF-8 encodings sort above — comparing with the wrong
    * order silently drops rows at range/partition boundaries.
    * Allocation-free, so safe in per-row reader filters too. */
  val utf8Order: Ordering[String] = new Ordering[String] {
    override def compare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return ca - cb
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      (a.length - i) - (b.length - j)
    }
  }

  /** Code-point valuation depth for [[probeBounds]]' bisection: keys
    * are compared through their first `ValuationDigits` code points.
    * Deep enough that real key families (20-char push IDs sharing a
    * ~6-char time prefix) still separate; keys identical through all
    * 12 code points collapse to one un-splittable interval — costing
    * balance, never rows. */
  private val ValuationDigits = 12

  /** Surrogate-free code-point alphabet: strings are base-`AlphabetN`
    * digit sequences under [[utf8Order]]. The surrogate gap
    * (0xD800-0xDFFF) is squeezed out so rendered midpoints are always
    * valid Java strings. */
  private val AlphabetN = 0x110000 - 0x800
  private def cpIndex(cp: Int): Int = if (cp < 0xD800) cp else cp - 0x800
  private def indexCp(i: Int): Int = if (i < 0xD800) i else i + 0x800

  /** BigInt valuation of a key's first [[ValuationDigits]] code points
    * (zero-padded) — monotone w.r.t. [[utf8Order]] up to that depth. */
  private[sources] def keyValue(s: String): BigInt = {
    val cps = s.codePoints().toArray
    (0 until ValuationDigits).foldLeft(BigInt(0)) { (acc, i) =>
      acc * AlphabetN + (if (i < cps.length) cpIndex(cps(i)) else 0)
    }
  }

  /** The [[ValuationDigits]]-code-point string at the valuation
    * midpoint of (lo, hi) — a synthetic probe CURSOR, not a key; the
    * keyset probe snaps it to the first real key at or after it. */
  private[sources] def keyMidpoint(lo: String, hi: String): String = {
    var v = (keyValue(lo) + keyValue(hi)) / 2
    val digits = new Array[Int](ValuationDigits)
    var i = ValuationDigits - 1
    while (i >= 0) { digits(i) = (v % AlphabetN).toInt; v /= AlphabetN; i -= 1 }
    val sb = new java.lang.StringBuilder(ValuationDigits + 4)
    digits.foreach(d => sb.appendCodePoint(indexCp(d)))
    sb.toString
  }

  /** Up to `parts - 1` interior split bounds for a live key range,
    * found by adaptive bisection of the code-point key space with
    * single-key keyset probes — `probe(c)` must return the first key at
    * or after cursor `c` (one `orderBy="$key"&startAt&limitToFirst=1`
    * request, payload = one child), or None past the end. NO key
    * enumeration anywhere: driver memory is O(parts), and at most
    * `budget` probes are issued. Each probe either yields a split key
    * (midpoint snapped to a real key inside the widest interval) or
    * halves that interval's valuation width (no key in its upper half),
    * so uniformly-spread key families — push IDs, hashed ids, the
    * RTDB-at-scale shape — split in O(parts) probes, while adversarial
    * clustering degrades toward the budget and costs balance only:
    * returned bounds always tile `[lo, hiExcl)` into valid ranges. */
  def probeBounds(lo: String, hiExcl: String, parts: Int,
                  probe: String => Option[String], budget: Int): Seq[String] = {
    val ord = utf8Order
    if (parts <= 1 || ord.gteq(lo, hiExcl)) return Nil
    case class Iv(from: String, to: String) {
      val width: BigInt = keyValue(to) - keyValue(from)
    }
    val pq = scala.collection.mutable.PriorityQueue.empty[Iv](Ordering.by(_.width))
    pq += Iv(lo, hiExcl)
    val bounds = scala.collection.mutable.TreeSet.empty[String](ord)
    var probes = 0
    while (bounds.size < parts - 1 && pq.nonEmpty && probes < budget) {
      val iv = pq.dequeue()
      if (iv.width > 0) {
        val m = keyMidpoint(iv.from, iv.to)
        // the valuation collapses keys identical through ValuationDigits
        // code points; a midpoint outside (from, to) means the interval
        // cannot be refined — drop it, losing balance only
        if (ord.gt(m, iv.from) && ord.lt(m, iv.to)) {
          probes += 1
          probe(m) match {
            case Some(k) if ord.lt(k, iv.to) =>
              // k >= m > from: a real key strictly inside the interval
              bounds += k
              pq += Iv(iv.from, k)
              pq += Iv(k, iv.to)
            case _ =>
              // no key in [m, to): every remaining key sits below m
              pq += Iv(iv.from, m)
          }
        }
      }
    }
    bounds.toSeq
  }

  /** At most `parts - 1` sorted, distinct interior split points drawn
    * evenly from an ordered sample — shared by the stride-sample and
    * scatter-sample planners so the tiling invariant (property-tested
    * via splitBounds) has one implementation. */
  def pickBounds(sorted: IndexedSeq[String], parts: Int): Seq[String] = {
    val n = math.min(parts, sorted.size + 1)
    (1 until n).map(i => sorted(i * sorted.size / n)).distinct
  }

  /** Consume `keys` (any order) and return `(count, bounds)` where
    * `bounds` are at most `numPartitions - 1` sorted, distinct interior
    * split points drawn from the keys. Partitions are then
    * `[low, b0), [b0, b1), …, [bLast, high)`. Empty input → (0, Nil).
    * Driver memory is O(numPartitions), independent of key count. */
  def splitBounds(keys: Iterator[String], numPartitions: Int,
                  ord: Ordering[String]): (Long, Seq[String]) = {
    val sampler = new StrideSampler(math.max(numPartitions * SamplesPerSplit, 64))
    keys.foreach(sampler.add)
    if (sampler.seen == 0L) return (0L, Nil)
    val sorted = sampler.sample(ord)
    val n = math.min(numPartitions.toLong, sampler.seen).toInt
    (sampler.seen, pickBounds(sorted, n))
  }
}

/** The one-pass bounded systematic sampler behind
  * [[RangePlanner.splitBounds]]. Invariant (asserted in
  * RangePlannerSpec): `retained <= cap` after every `add`, for any
  * stream length. */
private[sources] final class StrideSampler(val cap: Int) {
  private val buf = new ArrayBuffer[String](cap + 1)
  private var stride = 1L
  private var count = 0L

  def seen: Long = count
  def retained: Int = buf.size

  def add(k: String): Unit = {
    if (count % stride == 0) {
      buf += k
      if (buf.size > cap) {
        // halve the sample in place: keep positions 0, 2, 4, …
        var i = 0; var j = 0
        while (i < buf.size) { if ((i & 1) == 0) { buf(j) = buf(i); j += 1 }; i += 1 }
        buf.dropRightInPlace(buf.size - j)
        stride *= 2
      }
    }
    count += 1
  }

  def sample(ord: Ordering[String]): IndexedSeq[String] = buf.sorted(ord).toIndexedSeq
}
