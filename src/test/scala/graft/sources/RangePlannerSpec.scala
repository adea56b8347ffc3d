package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Planning must stay O(numPartitions) in driver memory no matter how
  * many keys the table has — the round-5/6 finding against the old
  * buffer-every-key planners. No SparkSession needed: the planner is a
  * pure stream algorithm. */
class RangePlannerSpec extends AnyFunSuite {

  private val lex: Ordering[String] = Ordering.String

  test("bounded retention: 1M keys, memory capped at numPartitions * 32") {
    val n = 8
    val sampler = new StrideSampler(n * RangePlanner.SamplesPerSplit)
    (0 until 1000000).foreach { i =>
      sampler.add(f"k$i%07d")
      assert(sampler.retained <= sampler.cap, s"buffer exceeded cap at $i")
    }
    assert(sampler.seen == 1000000L)
  }

  test("split bounds tile the key space: every key in exactly one range") {
    val keys = (0 until 100000).map(i => f"k$i%06d")
    val (count, bounds) = RangePlanner.splitBounds(keys.iterator, 8, lex)
    assert(count == keys.size.toLong)
    assert(bounds.size <= 7 && bounds == bounds.sorted && bounds.distinct == bounds)
    // simulate partition assignment [prev, next): exactly-once coverage
    val froms = None +: bounds.map(Option(_))
    val tos = bounds.map(Option(_)) :+ None
    val perPart = froms.zip(tos).map { case (f, t) =>
      keys.count(k => f.forall(k >= _) && t.forall(k < _))
    }
    assert(perPart.sum == keys.size, s"lost/duplicated keys: $perPart")
    // systematic sampling of a sorted stream keeps partitions balanced
    assert(perPart.max <= 3 * (keys.size / perPart.size), s"unbalanced: $perPart")
  }

  test("unsorted arrival still tiles exactly once") {
    val keys = scala.util.Random.shuffle((0 until 5000).map(i => f"k$i%05d").toVector)
    val (count, bounds) = RangePlanner.splitBounds(keys.iterator, 6, lex)
    assert(count == 5000L)
    val froms = None +: bounds.map(Option(_))
    val tos = bounds.map(Option(_)) :+ None
    val total = froms.zip(tos).map { case (f, t) =>
      keys.count(k => f.forall(k >= _) && t.forall(k < _))
    }.sum
    assert(total == 5000)
  }

  test("datastore key order: ASCII-digit ids; names by UTF-8 bytes") {
    assert(DatastoreKeys.isId("42") && !DatastoreKeys.isId("") && !DatastoreKeys.isId("4a"))
    // Unicode digits (e.g. Arabic-Indic) are NAME keys, not ids
    assert(!DatastoreKeys.isId("٤٢"))
    // digit shapes a promoted int64 id can never take are NAME keys:
    // leading zeros and values outside int64 (the service 400s such an
    // `id` path element; the all-digit-name caveat covers them instead)
    assert(!DatastoreKeys.isId("007") && DatastoreKeys.isId("0"))
    assert(DatastoreKeys.isId("9223372036854775807"), "Long.MaxValue is an id")
    assert(!DatastoreKeys.isId("9223372036854775808"), "MaxValue+1 is a name")
    assert(!DatastoreKeys.isId("99999999999999999999"), "20 digits is a name")
    assert(DatastoreKeys.ordering.lt("42", "9223372036854775808"),
      "over-int64 digit strings sort with names, after every id")
    // id MaxValue's successor is the first possible NAME key — the
    // rendered MaxValue+1 would be a name that over-matches names < "9"
    val succMax = DatastoreKeys.successor("9223372036854775807")
    assert(succMax == Char.MinValue.toString &&
      DatastoreKeys.ordering.lt("9223372036854775807", succMax) &&
      DatastoreKeys.ordering.lteq(succMax, "a"),
      "point range [MaxValue, succ) must cover no name key")
    assert(DatastoreKeys.successor("9") == "10", "id successor is numeric")
    assert(DatastoreKeys.ordering.lt("9", "0abc"), "ids before all names")
    assert(DatastoreKeys.ordering.lt("2", "12"), "ids numeric, not lexicographic")
    // supplementary char (UTF-8 F0..) sorts ABOVE U+FFFD (EF..);
    // UTF-16 code-unit compare would order them the other way around
    val emoji = new String(Character.toChars(0x1F600))
    assert(DatastoreKeys.ordering.lt("�", emoji),
      "names must compare by UTF-8 bytes, not UTF-16 code units")
  }

  test("property: tiling holds for random keys, sizes, and partition counts") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.frequency(
      2 -> Gen.choose(0L, 99999L).map(_.toString),          // id-like
      2 -> Gen.alphaNumStr.map(k => "n" + k.take(12)),      // name-like
      1 -> Gen.const(""))                                   // degenerate
    val caseGen = for {
      n <- Gen.choose(0, 2000)
      keys <- Gen.listOfN(n, keyGen)
      parts <- Gen.choose(1, 40)
    } yield (keys, parts)
    val cases = Gen.listOfN(60, caseGen).pureApply(Gen.Parameters.default, Seed(7L))
    for ((keys, parts) <- cases; ord <- Seq(lex, DatastoreKeys.ordering)) {
      val (count, bounds) = RangePlanner.splitBounds(keys.iterator, parts, ord)
      assert(count == keys.size.toLong)
      assert(bounds.size <= math.max(parts - 1, 0))
      assert(bounds == bounds.sorted(ord) && bounds.distinct == bounds)
      val froms = None +: bounds.map(Option(_))
      val tos = bounds.map(Option(_)) :+ None
      val covered = keys.map(k => froms.zip(tos).count { case (f, t) =>
        f.forall(b => ord.gteq(k, b)) && t.forall(b => ord.lt(k, b)) })
      assert(covered.forall(_ == 1),
        s"every key in exactly one range; violations=${covered.count(_ != 1)}")
    }
  }

  test("property: DatastoreKeys.ordering is a total order with exact successor") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.frequency(
      2 -> Gen.choose(0L, Long.MaxValue / 2).map(_.toString),
      2 -> Gen.alphaNumStr.map(_.take(16)),
      1 -> Gen.oneOf("0abc", "", "٤٢", "zz" + new String(Character.toChars(0x1F600))))
    val keys = Gen.listOfN(300, keyGen).pureApply(Gen.Parameters.default, Seed(11L))
    val ord = DatastoreKeys.ordering
    // antisymmetry + consistency with equality on a sorted sample
    val sorted = keys.sorted(ord)
    sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(ord.lteq(a, b))
        assert((ord.compare(a, b) == 0) == (a == b), s"'$a' vs '$b'")
      case _ => ()
    }
    // successor is strictly greater with nothing in between (among keys)
    keys.filter(_.nonEmpty).foreach { k =>
      val s = DatastoreKeys.successor(k)
      assert(ord.lt(k, s), s"successor('$k') not greater")
      assert(!keys.exists(o => ord.gt(o, k) && ord.lt(o, s) && o != k),
        s"key strictly between '$k' and its successor")
    }
  }

  test("probeBounds: clustered keys split within budget; bounds are real keys") {
    val ord = RangePlanner.utf8Order
    // tight cluster plus a far outlier — worst case for one-shot
    // interpolation, handled by adaptive bisection
    val keys = ((1 to 25).map(i => f"u$i%02d") :+ "zzz-scalar").sorted(ord)
    var probes = 0
    def probe(c: String): Option[String] = { probes += 1; keys.find(ord.gteq(_, c)) }
    val bounds = RangePlanner.probeBounds("u01", "zzz-scalar ", 4, probe, 128)
    assert(bounds.size == 3, s"want 3 bounds, got $bounds after $probes probes")
    assert(probes <= 128)
    assert(bounds == bounds.sorted(ord) && bounds.distinct == bounds)
    assert(bounds.forall(b => ord.gt(b, "u01") && keys.contains(b)))
  }

  test("probeBounds: uniform key space splits in few probes (the 100 TB shape)") {
    val ord = RangePlanner.utf8Order
    val uniform = (0 until 256).map(i => f"$i%03d-key").sorted(ord)
    var probes = 0
    def probe(c: String): Option[String] = { probes += 1; uniform.find(ord.gteq(_, c)) }
    val b = RangePlanner.probeBounds(uniform.head, uniform.last + " ", 8, probe, 256)
    assert(b.size == 7, s"got $b")
    // a handful of probes per split (each is one single-child request),
    // vs enumerating all 256 keys — the planning cost stays O(parts)
    assert(probes <= 64, s"uniform split took $probes probes")
  }

  test("probeBounds: budget exhaustion and degenerate ranges degrade, never fail") {
    val ord = RangePlanner.utf8Order
    val keys = (1 to 25).map(i => f"u$i%02d")
    var probes = 0
    def probe(c: String): Option[String] = { probes += 1; keys.find(ord.gteq(_, c)) }
    val b = RangePlanner.probeBounds("u01", "u25 ", 16, probe, 5)
    assert(probes <= 5 && b.size <= 15)
    // empty / inverted / single-part ranges produce no bounds, no probes
    probes = 0
    assert(RangePlanner.probeBounds("b", "a", 4, probe, 10).isEmpty)
    assert(RangePlanner.probeBounds("a", "z", 1, probe, 10).isEmpty)
    assert(probes == 0)
    // identical-prefix collapse: keys equal through the valuation depth
    // cannot be split — bounds may be empty, but nothing throws
    val deep = Seq("p" * 20 + "a", "p" * 20 + "b")
    def probeD(c: String): Option[String] = deep.find(ord.gteq(_, c))
    val bd = RangePlanner.probeBounds(deep.head, deep.last + " ", 4, probeD, 50)
    assert(bd.forall(k => deep.contains(k)))
  }

  test("property: probeBounds tiles random key sets for any parts/budget") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ord = RangePlanner.utf8Order
    val keyGen = Gen.frequency(
      3 -> Gen.alphaNumStr.map(k => "-N" + k.take(10)),       // push-ID-ish
      2 -> Gen.alphaNumStr.map(_.take(16)),
      1 -> Gen.const("zz" + new String(Character.toChars(0x1F600))))
    val caseGen = for {
      n <- Gen.choose(1, 300)
      keys <- Gen.listOfN(n, keyGen)
      parts <- Gen.choose(1, 12)
      budget <- Gen.choose(0, 200)
    } yield (keys.distinct.sorted(ord), parts, budget)
    val cases = Gen.listOfN(40, caseGen).pureApply(Gen.Parameters.default, Seed(13L))
    for ((keys, parts, budget) <- cases if keys.nonEmpty) {
      val lo = keys.head
      val hiExcl = keys.last + " "
      var probes = 0
      def probe(c: String): Option[String] = { probes += 1; keys.find(ord.gteq(_, c)) }
      val bounds = RangePlanner.probeBounds(lo, hiExcl, parts, probe, budget)
      assert(probes <= budget, s"budget exceeded: $probes > $budget")
      assert(bounds.size <= math.max(parts - 1, 0))
      assert(bounds == bounds.sorted(ord) && bounds.distinct == bounds)
      // every bound is a REAL key strictly inside (lo, hiExcl) — so the
      // ranges [lo,b0),[b0,b1),…,[bLast,hiExcl) tile the key set with
      // every partition non-empty
      assert(bounds.forall(b => keys.contains(b) && ord.gt(b, lo) && ord.lt(b, hiExcl)))
      val edges = (Seq(lo) ++ bounds) :+ hiExcl
      val perPart = edges.sliding(2).map { case Seq(f, t) =>
        keys.count(k => ord.gteq(k, f) && ord.lt(k, t)) }.toSeq
      assert(perPart.sum == keys.size, s"lost/duplicated keys: $perPart")
      assert(perPart.forall(_ >= 1), s"empty partition produced: $perPart")
    }
  }

  test("fewer keys than partitions, empty input, custom ordering") {
    assert(RangePlanner.splitBounds(Iterator.empty, 4, lex) == ((0L, Nil)))
    val (c1, b1) = RangePlanner.splitBounds(Iterator("b", "a"), 8, lex)
    assert(c1 == 2L && b1.size <= 1)
    // Datastore service order: ids numerically before names — bounds
    // must come back in SERVICE order, not lexicographic
    val (c2, b2) = RangePlanner.splitBounds(
      Iterator("9", "10", "11", "12"), 2, DatastoreKeys.ordering)
    assert(c2 == 4L && b2 == Seq("11"),
      s"median of ids 9..12 in numeric order is 11, got $b2")
  }
}
