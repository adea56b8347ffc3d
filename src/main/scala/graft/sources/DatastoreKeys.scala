package graft.sources

/** Real Cloud Datastore key ordering over PROMOTED key strings.
  *
  * The source promotes an entity key to a string — `key.name`, else
  * stringified `key.id` (`datastore_service.py:140-147`) — but the
  * service itself orders `__key__` by the typed path element: all
  * numeric-id keys first, numerically, then all name keys, by UTF-8
  * byte order. Lexicographic comparison of the promoted strings is NOT
  * monotone in that order (id 9 sorts after id 12 lexicographically),
  * so every place that splits or bounds the key space must use this
  * ordering instead, and must encode each bound with the path-element
  * type the digit test implies (see `DatastoreRestClient.queryBody`).
  *
  * Residual ambiguity, inherent to string promotion: a NAME key that
  * happens to be all digits is indistinguishable from an id key here
  * and is treated as an id. Kinds that mix all-digit names with
  * numeric ids should read with `numPartitions = 1` and no key
  * pushdown (documented on the source).
  */
private[sources] object DatastoreKeys {

  /** A promoted key that is all ASCII digits came from a numeric-id
    * key. ASCII-only on purpose: `Char.isDigit` also accepts Unicode
    * digit blocks (e.g. Arabic-Indic), which BigInt would re-render as
    * ASCII — a name key of such digits must stay a name. Two digit
    * shapes can only be NAME keys and are folded into the name branch:
    * leading zeros ("007" — promotion renders ids without them) and
    * values outside int64 (ids are int64s; the service 400s an `id`
    * path element above Long.MaxValue). */
  def isId(k: String): Boolean =
    k.nonEmpty && k.forall(c => c >= '0' && c <= '9') &&
      (k.length == 1 || k.charAt(0) != '0') &&
      (k.length < 19 || (k.length == 19 && k <= "9223372036854775807"))

  /** Service order: (ids numerically) before (names by UTF-8 bytes —
    * `RangePlanner.utf8Order`, NOT Java's UTF-16 compareTo, which
    * disagrees above U+FFFF). Digit strings compare by length-then-lex
    * — equivalent to numeric compare without allocation (service ids
    * are int64s rendered without leading zeros). */
  val ordering: Ordering[String] = new Ordering[String] {
    override def compare(a: String, b: String): Int = (isId(a), isId(b)) match {
      case (true, true) =>
        if (a.length != b.length) a.length - b.length else a.compareTo(b)
      case (true, false) => -1
      case (false, true) => 1
      case (false, false) => RangePlanner.utf8Order.compare(a, b)
    }
  }

  /** Smallest key strictly greater than `k` in service order: id keys
    * step numerically (the next id), name keys append NUL. Makes
    * `EqualTo` an EXACT point range — `[id v, id v+1)` matches only
    * id v, never "every id ≥ v" (the bug a string successor with a
    * trailing NUL causes: it stops being all-digits, gets encoded as a
    * NAME bound, and all ids sort before all names). */
  def successor(k: String): String =
    if (!isId(k)) k + Char.MinValue.toString
    // id Long.MaxValue has no next id; its service-order successor is
    // the smallest possible NAME key (ids sort before all names). The
    // rendered "…808" would itself be classified a name and — names
    // comparing by bytes — over-match every name below "9".
    else if (k == "9223372036854775807") Char.MinValue.toString
    else (BigInt(k) + 1).toString

  /** Is an INEQUALITY bound sound to push down? The pushed range is
    * evaluated in service order but Spark's string predicate semantics
    * are lexicographic, so pushdown must not change which keys fall on
    * each side. For a name bound whose first char sorts above '9', the
    * two orders agree for every possible key: all-digit keys are below
    * the bound in both (digits < the bound's first char lexically; ids
    * before names in service order), and name keys compare lexically in
    * both. A digit bound (id 12 vs id 9: orders disagree) or a name
    * bound starting at or below '9' (name "0abc" vs id 999: orders
    * disagree) is rejected — Spark evaluates the filter instead. */
  def inequalityBoundSound(k: String): Boolean =
    !isId(k) && k.headOption.exists(_ > '9')
}
