package graft.sources

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThan}

/** Shared key-range pushdown used by the RTDB and Datastore DSv2
  * sources: intersect the supported string predicates on key columns
  * into one [low, highExcl) range for partition planning. */
private[sources] object KeyRangePush {

  /** Returns (accepted, rest, low, highExcl). Each accepted filter
    * INTERSECTS the range: low = max of lows, high = min of highs. An
    * EqualTo is the degenerate range [v, v+NUL); two conflicting
    * EqualTos (id === 'a' && uid === 'b') intersect to an empty range
    * — zero partitions, zero rows. */
  def intersect(filters: Array[Filter], keyCols: Set[String])
      : (Array[Filter], Array[Filter], Option[String], Option[String]) = {
    val (accepted, rest) = filters.partition {
      case EqualTo(c, _: String) => keyCols(c)
      case GreaterThanOrEqual(c, _: String) => keyCols(c)
      case LessThan(c, _: String) => keyCols(c)
      case _ => false
    }
    var low: Option[String] = None
    var high: Option[String] = None
    def tightenLow(v: String): Unit = low = Some(low.fold(v)(l => if (v > l) v else l))
    def tightenHigh(v: String): Unit = high = Some(high.fold(v)(h => if (v < h) v else h))
    accepted.foreach {
      case EqualTo(_, v: String) => tightenLow(v); tightenHigh(v + "\u0000")
      case GreaterThanOrEqual(_, v: String) => tightenLow(v)
      case LessThan(_, v: String) => tightenHigh(v)
      case _ => ()
    }
    (accepted, rest, low, high)
  }
}
