package graft.sources

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThan}

/** Shared key-range pushdown used by the RTDB and Datastore DSv2
  * sources: intersect the supported string predicates on key columns
  * into one [low, highExcl) range for partition planning.
  *
  * The range algebra is parameterized on the SERVER's key order —
  * lexicographic for RTDB string keys (the default), true service
  * order for Datastore (ids numerically before names) — because "max
  * of lows / min of highs" and the EqualTo successor are only correct
  * in the order the server will evaluate the range in. */
private[sources] object KeyRangePush {

  /** Smallest string strictly greater than `v` lexicographically. */
  def lexSuccessor(v: String): String = v + Char.MinValue

  /** Returns (accepted, rest, low, highExcl). Each accepted filter
    * INTERSECTS the range: low = max of lows, high = min of highs
    * (under `ord`). An EqualTo is the degenerate range
    * [v, successor(v)); two conflicting EqualTos (id === 'a' &&
    * uid === 'b') intersect to an empty range — zero partitions, zero
    * rows. Inequality bounds rejected by `ineqBoundSound` are left in
    * `rest` (Spark evaluates them; the source scans unbounded on that
    * side) — needed when the server's order and Spark's lexicographic
    * string semantics disagree for some keys (Datastore numeric ids). */
  def intersect(filters: Array[Filter], keyCols: Set[String],
                successor: String => String = lexSuccessor,
                ord: Ordering[String] = RangePlanner.utf8Order,
                ineqBoundSound: String => Boolean = _ => true)
      : (Array[Filter], Array[Filter], Option[String], Option[String]) = {
    val (accepted, rest) = filters.partition {
      case EqualTo(c, _: String) => keyCols(c)
      case GreaterThanOrEqual(c, v: String) => keyCols(c) && ineqBoundSound(v)
      case LessThan(c, v: String) => keyCols(c) && ineqBoundSound(v)
      case _ => false
    }
    var low: Option[String] = None
    var high: Option[String] = None
    def tightenLow(v: String): Unit = low = Some(low.fold(v)(l => ord.max(v, l)))
    def tightenHigh(v: String): Unit = high = Some(high.fold(v)(h => ord.min(v, h)))
    accepted.foreach {
      case EqualTo(_, v: String) => tightenLow(v); tightenHigh(successor(v))
      case GreaterThanOrEqual(_, v: String) => tightenLow(v)
      case LessThan(_, v: String) => tightenHigh(v)
      case _ => ()
    }
    (accepted, rest, low, high)
  }
}
