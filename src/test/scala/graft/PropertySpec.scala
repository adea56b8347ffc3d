package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.expr.Exprs
import graft.ops.Ops

/** Property-style tests (SURVEY.md §5.2.3): ScalaCheck generators,
  * evaluated in one Spark pass per property (a collect per case would
  * be painfully slow). Fixed seed — failures are reproducible. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.pureApply(Gen.Parameters.default, Seed(42L))

  private val weird = Gen.oneOf("nan", "NULL", "", " ", "None", "nat", "NaT",
    "ok", " x ", "café", "a,b", "'quote'", "line1", "\ttab", "12.5", "-3")
  private val anyStr = Gen.frequency(
    3 -> weird,
    2 -> Gen.alphaNumStr.map(_.take(30)),
    1 -> Gen.listOfN(8, Gen.choose(' ', '~')).map(_.mkString))

  test("property: cleanString is idempotent and never widens") {
    val inputs = sample(Gen.listOfN(400, anyStr))
    val df = inputs.toDF("s")
      .select(col("s"), Exprs.cleanString(col("s")).as("c1"))
      .select(col("s"), col("c1"), Exprs.cleanString(col("c1")).as("c2"))
    val rows = df.collect()
    rows.foreach { r =>
      val (s, c1, c2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(c1 == c2, s"cleanString not idempotent on ${s.replace("\t", "\\t")}")
      // Spark's trim (like DuckDB's, unlike java.lang.String#trim) strips
      // only ASCII spaces — the oracle-consistent semantics.
      if (c1 != null) assert(c1.length <= s.length && c1 == c1.replaceAll("^ +| +$", ""))
    }
  }

  test("property: HtmlEntityKernel equals an independent regex-based decoder model") {
    // an INDEPENDENT model of the contract: every '&#' site either
    // decodes (1..7 digits of its base + ';', non-surrogate scalar in
    // 1..0x10FFFF) or re-emits itself; implemented here by splitting,
    // the opposite strategy to the kernel's single scan
    def model(s: String): String = {
      val num = "^([0-9]{1,7});".r
      val hex = "^[xX]([0-9A-Fa-f]{1,7});".r
      val parts = s.split("&#", -1)
      parts.head + parts.tail.map { p =>
        def emit(v: Long, m: scala.util.matching.Regex.Match): String =
          if (v >= 1L && v <= 0x10FFFFL && !(v >= 0xD800L && v <= 0xDFFFL))
            new String(Character.toChars(v.toInt)) + p.substring(m.end)
          else "&#" + p
        num.findFirstMatchIn(p).map(m => emit(m.group(1).toLong, m))
          .orElse(hex.findFirstMatchIn(p).map(m =>
            emit(java.lang.Long.parseLong(m.group(1), 16), m)))
          .getOrElse("&#" + p)
      }.mkString
    }
    val frag = Gen.oneOf("&#", "#", ";", "x", "X", "65", "1F600", "ZZ", "0",
      "55296", "1114111", "1114112", "99999999", "d7ff", "&", "a b", "é",
      "&#65;", "&#x27;", "&amp;", "")
    val gen = Gen.listOfN(6, frag).map(_.mkString)
    val inputs = sample(Gen.listOfN(500, gen)).distinct
    val out = inputs.toDF("s")
      .select(col("s"),
        graft.expr.kernels.NativeFns.htmlEntities(col("s")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    out.foreach { case (s, d) =>
      assert(d === model(s), s"kernel drifted from the model on '$s'")
    }
  }

  test("property: parseFlexibleTimestamp never throws; round-trips formatted output") {
    // arbitrary garbage must yield null or a timestamp, never an error
    val garbage = sample(Gen.listOfN(300, anyStr))
    garbage.toDF("s").select(Exprs.parseFlexibleTimestamp(col("s")).as("t")).collect()

    // round-trip: format a random timestamp five ways, parse it back
    val epochs = sample(Gen.listOfN(200, Gen.choose(1L, 4102444800L))) // 1970..2100
    val df = epochs.toDF("e").select(timestamp_seconds(col("e")).as("ts"))
    val fmts = Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    for (f <- fmts) {
      val bad = df.select(col("ts"),
        Exprs.parseFlexibleTimestamp(date_format(col("ts"), f)).as("back"))
        .filter(col("back") =!= col("ts") || col("back").isNull)
      assert(bad.count() == 0, s"round-trip failed for format $f")
    }
    // epoch string round-trip (seconds path)
    val badE = df.select(col("ts"),
      Exprs.parseFlexibleTimestamp(unix_timestamp(col("ts")).cast("string")).as("back"))
      .filter(col("back") =!= col("ts")).count()
    assert(badE == 0)
  }

  test("property: dedupKeepLatest output is a subset with distinct keys and partition-max ts") {
    val gen = for {
      n <- Gen.const(400)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0, 30)
        d <- Gen.choose(0, 10000)
      } yield (k, d))
    } yield rows
    val rows = sample(gen).zipWithIndex.map { case ((k, d), i) =>
      (i.toLong, s"k$k", new java.sql.Timestamp(1700000000000L + d * 60000L))
    }
    val df = rows.toDF("id", "k", "ts")
    val out = df.transform(Ops.dedupKeepLatest(Seq("k"), "ts", "id"))
    assert(out.count() == out.select("k").distinct().count())
    assert(out.join(df.groupBy("k").agg(max("ts").as("mx")), "k")
      .filter(col("ts") =!= col("mx")).count() == 0)
    assert(out.join(df, Seq("id"), "left_anti").count() == 0) // subset of input

    // skew-safe salted variant must return the identical row set
    val salted = df.transform(Ops.dedupKeepLatestSalted(Seq("k"), "ts", "id", salt = 8))
    assert(salted.select("id").as[Long].collect().toSet
      == out.select("id").as[Long].collect().toSet)
  }

  test("property: dsum equals exact BigDecimal sum for 2-decimal money, any partitioning") {
    val cents = sample(Gen.listOfN(500, Gen.choose(-10000000L, 99999999L)))
    val vals = cents.map(c => BigDecimal(c) / 100)
    val expected = (vals.sum).toDouble
    for (parts <- Seq(1, 3, 16)) {
      val got = vals.map(_.toDouble).toDF("x").repartition(parts)
        .agg(Exprs.dsum(col("x"), 2).as("s")).collect()(0).getDouble(0)
      // hi + lo/f is within 1 ulp of the correctly rounded exact sum,
      // and identical across partitionings (the property that matters)
      assert(math.abs(got - expected) <= math.ulp(expected), s"parts=$parts")
    }
    val p1 = vals.map(_.toDouble).toDF("x").repartition(1)
      .agg(Exprs.dsum(col("x"), 2)).collect()(0).getDouble(0)
    val p16 = vals.map(_.toDouble).toDF("x").repartition(16)
      .agg(Exprs.dsum(col("x"), 2)).collect()(0).getDouble(0)
    assert(p1 == p16, "dsum must be independent of partitioning")
  }

  test("property: connectedComponents equals union-find on random graphs") {
    val gen = Gen.listOfN(120, for {
      x <- Gen.choose(0L, 60L); y <- Gen.choose(0L, 60L) if x != y
    } yield (math.min(x, y), math.max(x, y)))
    val edges = sample(gen.map(List(_))).head.distinct
    // reference: plain union-find
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val want = parent.keys.map(n => n -> find(n)).toMap
    val got = Ops.connectedComponents(edges.toDF("a", "b"), iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("property: simHashPairs finds EVERY pair within Hamming 3 (pigeonhole recall)") {
    // random word-soup docs over a tiny vocabulary force near-identical
    // signatures often; brute-force Hamming over the same signatures is
    // the ground truth the banded bucketing must reproduce exactly
    // (uncapped — cap semantics are covered elsewhere)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val gen = Gen.listOfN(40, Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val texts = sample(gen.map(List(_))).head
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sigs = docs
      .withColumn("w", graft.llm.Text.words(col("text")))
      .select(col("doc_id"), graft.llm.Dedup.simHashPairSig(col("w")).as("sig"))
      .as[(Long, Long)].collect().toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = graft.llm.Dedup.simHashPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = 1000000)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("property: saltedJoin equals the plain join on skewed keys") {
    val gen = for {
      big <- Gen.listOfN(400, for { k <- Gen.frequency(8 -> Gen.const(0), 2 -> Gen.choose(1, 20)); v <- Gen.choose(0, 99) } yield (k, v))
      small <- Gen.listOfN(15, for { k <- Gen.choose(0, 20); w <- Gen.choose(0, 9) } yield (k, w))
    } yield (big, small)
    val (bigRows, smallRows) = sample(gen.map(List(_))).head
    val big = bigRows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k.toLong, v.toLong) }
      .toDF("id", "k", "v")
    val small = smallRows.distinct.zipWithIndex
      .map { case ((k, w), i) => (k.toLong, 100L + i) }.toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("id", "w")
      .as[(Long, Long)].collect().toSet
    val salted = Ops.saltedJoin(big, small, "k", shardBy = "id", salt = 8)
      .select("id", "w").as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("property: asofJoin equals the naive join-filter-window formulation") {
    val gen = for {
      l <- Gen.listOfN(250, for { k <- Gen.choose(0, 12); t <- Gen.choose(0, 3000) } yield (k, t))
      r <- Gen.listOfN(250, for { k <- Gen.choose(0, 12); t <- Gen.choose(0, 3000) } yield (k, t))
    } yield (l, r)
    val (lRows, rRows) = sample(gen.map(List(_))).head
    val left = lRows.zipWithIndex.map { case ((k, t), i) =>
      (i.toLong, k.toLong, new java.sql.Timestamp(1700000000000L + t * 1000L)) }
      .toDF("lid", "k", "ts")
    val right = rRows.zipWithIndex.map { case ((k, t), i) =>
      (10000L + i, k.toLong, new java.sql.Timestamp(1700000000000L + t * 1000L)) }
      .toDF("rid", "k", "ts")
    val fast = Ops.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("rid"),
      tieBreak = Some("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // naive: left-outer range join, keep the latest right (max ts, then
    // max rid among equal ts — matching the union ordering where later
    // right rows overwrite earlier at the same ts)
    val rBy = rRows.zipWithIndex.map { case ((k, t), i) => (k, t, 10000L + i) }
    val slow = lRows.zipWithIndex.map { case ((k, t), i) =>
      val cands = rBy.filter(r => r._1 == k && r._2 <= t)
      i.toLong -> (if (cands.isEmpty) None
                   else Some(cands.maxBy(c => (c._2, c._3))._3))
    }.toMap
    assert(fast == slow)
  }

  test("property: rangeJoinBinned equals the naive range-predicate join") {
    val gen = for {
      facts <- Gen.listOfN(300, Gen.choose(0.0, 500.0))
      ranges <- Gen.listOfN(25, for {
        lo <- Gen.choose(0.0, 480.0); len <- Gen.choose(0.1, 120.0)
      } yield (lo, lo + len))
    } yield (facts, ranges)
    val (facts, ranges) = sample(gen.map(List(_))).head
    val factDf = facts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val rangeDf = ranges.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("rid", "lo", "hi")
    for (width <- Seq(7.0, 50.0)) {
      val fast = Ops.rangeJoinBinned(factDf, rangeDf, "v", "lo", "hi", width)
        .select("id", "rid").as[(Long, Long)].collect().toSet
      val slow = (for {
        (v, i) <- facts.zipWithIndex
        ((lo, hi), j) <- ranges.zipWithIndex if v >= lo && v < hi
      } yield (i.toLong, j.toLong)).toSet
      assert(fast == slow, s"width=$width")
    }
  }

  test("property: LSH bucket-collect pair generation equals the self-join formulation") {
    // Random (id, band) rows with colliding bands; the map-side pair
    // expansion from collect_list must produce exactly the pairs the
    // band self-join would (the formulation it replaced for one fewer
    // shuffle) under the same bucket cap.
    val gen = Gen.listOfN(300, for {
      id <- Gen.choose(0L, 80L); band <- Gen.choose(0, 25)
    } yield (id, s"b$band"))
    val rows = sample(gen).distinct
    val bands = rows.toDF("id", "band")
    val cap = 15
    val viaCollect = bands.groupBy(col("band"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, cap))
      .select(explode(flatten(transform(col("ids"), x =>
        transform(filter(col("ids"), y => y > x),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b")).distinct()
      .as[(Long, Long)].collect().toSet
    val counts = bands.groupBy("band").count().filter(col("count") <= cap)
    val bounded = bands.join(counts.select("band"), "band")
    val viaJoin = bounded.as("x").join(bounded.as("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(viaCollect == viaJoin)
  }

  test("property: jaccard symmetric-bounded; minhash signature elements within ring") {
    val texts = sample(Gen.listOfN(60,
      Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f", "g")).map(_.mkString(" "))))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("w", graft.llm.Text.words(col("text")))
      .withColumn("sh", graft.llm.Text.shingles(col("w")))
      .withColumn("hs", array_distinct(transform(col("sh"), x => graft.llm.Text.md5Hash(x))))
      .filter(size(col("hs")) > 0)
      .withColumn("sig", graft.llm.Dedup.minHashSignature(col("hs")))
    val sigs = df.select("sig").collect().map(_.getSeq[Long](0))
    assert(sigs.forall(s => s.length == graft.llm.Dedup.Seeds.length &&
      s.forall(v => v >= 0 && v < graft.llm.Text.HashP)))
  }

  test("property: dropDuplicateSpans equals the brute-force span-removal model") {
    // tiny vocabulary + short windows force heavy window collisions,
    // within and across docs
    val k = 3
    val vocab = Seq("a", "b", "c")
    val docsGen = Gen.listOfN(40, Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    val texts = sample(docsGen).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // reference model on window CONTENT (md5 collisions are ~1e-7 and
    // would fail the test loudly if they ever mattered)
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val wins = for {
      (id, w) <- toks.toSeq; s <- 0 to w.size - k if w.size >= k
    } yield (w.slice(s, s + k).mkString(" "), id, s)
    val firstOcc = wins.groupBy(_._1).view.mapValues(_.map(o => (o._2, o._3)).min).toMap
    val expected = texts.map { case (id, _) =>
      val w = toks(id)
      val covered = (for {
        s <- 0 to w.size - k if w.size >= k
        if firstOcc(w.slice(s, s + k).mkString(" ")) != ((id, s))
        p <- s until s + k
      } yield p).toSet
      val kept = w.zipWithIndex.collect { case (t, p) if !covered(p) => t }
      id -> ((kept.mkString(" "), kept.size.toLong, (w.size - kept.size).toLong))
    }.toMap
    val got = graft.llm.Dedup.dropDuplicateSpans(
        texts.toDF("doc_id", "text"), "doc_id", "text", windowTokens = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      got.keySet.filter(id => got(id) != expected(id))
        .map(id => s"$id: got=${got(id)} want=${expected(id)} text='${texts(id.toInt)._2}'")
        .mkString("\n"))
  }

  test("property: selectByTokenBudget equals the naive global ordered cumsum") {
    import org.apache.spark.sql.expressions.Window
    // random scores (small domain → fat ties) and token sizes; budgets
    // drawn across the whole token range so the boundary lands in
    // different bands/buckets per case
    val rows = sample(Gen.listOfN(300, Gen.zip(Gen.choose(0L, 6L), Gen.choose(1L, 40L))))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
    val df = rows.toDF("doc_id", "score", "tokens")
    val total = rows.map(_._3).sum
    val budgets = sample(Gen.listOfN(6, Gen.choose(0L, total + 10)))
    for (budget <- budgets :+ 0L :+ total) {
      val naive = df
        .withColumn("__h", graft.llm.Text.md5Hash(concat(lit("sel:"), col("doc_id"))))
        .withColumn("cum", sum("tokens").over(
          Window.orderBy(col("score").desc, col("__h"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") <= budget).select("doc_id").as[Long].collect().toSet
      val got = graft.llm.Curate.selectByTokenBudget(
          df, "doc_id", "score", "tokens", budget, buckets = 5)
        .select("doc_id").as[Long].collect().toSet
      assert(got == naive, s"budget=$budget: got ${got.size}, want ${naive.size}")
    }
  }

  test("property: Morton z2/z3 round-trip — de-interleaving recovers both inputs") {
    def unspread1(z: Long): Long =
      (0 until 32).foldLeft(0L)((a, i) => a | (((z >> (2 * i)) & 1L) << i))
    def unspread2(z: Long): Long =
      (0 until 21).foldLeft(0L)((a, i) => a | (((z >> (3 * i)) & 1L) << i))
    val pairs = sample(Gen.listOfN(300,
      Gen.zip(Gen.choose(0L, (1L << 31) - 1), Gen.choose(0L, (1L << 31) - 1))))
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.io.ZOrder.zvalue2(col("a"), col("b")).as("z2"),
        graft.io.ZOrder.zvalue3(col("a") % (1L << 21), col("b") % (1L << 21),
          (col("a") + col("b")) % (1L << 21)).as("z3"))
      .collect()
    rows.foreach { r =>
      val (a, b, z2, z3) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(unspread1(z2) == a && unspread1(z2 >> 1) == b,
        s"z2 not bijective at ($a, $b)")
      assert(unspread2(z3) == a % (1L << 21) && unspread2(z3 >> 1) == b % (1L << 21)
        && unspread2(z3 >> 2) == (a + b) % (1L << 21), s"z3 not bijective at ($a, $b)")
    }
  }

  test("property: SearchSortedDouble == count(bounds <= v) for random bounds") {
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.choose(-1e6, 1e6)).map(_.distinct.sorted),
      Gen.listOfN(200, Gen.choose(-2e6, 2e6)))
    val (bounds, vs) = gen.pureApply(Gen.Parameters.default, Seed(7L))
    val rows = vs.toDF("v")
      .select(col("v"),
        graft.expr.kernels.NativeFns.searchSorted(col("v"), bounds).as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == bounds.count(_ <= r.getDouble(0)).toLong,
        s"searchSorted wrong at v=${r.getDouble(0)}")
    }
  }

  test("property: quantizeInt8 round-trip error <= half a quantization step") {
    val vecs = sample(Gen.listOfN(120,
      Gen.listOfN(12, Gen.choose(-1e4f, 1e4f)).map(_.toArray)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val rows = graft.llm.Similarity.quantizeInt8Frame(
        vecs.toDF("id", "v"), "id", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Byte](1), r.getDouble(2)))).toMap
    vecs.foreach { case (id, v) =>
      val (q8, amax) = rows(id)
      if (amax == 0.0) assert(q8.forall(_ == 0))
      else {
        val step = amax / 127.0
        v.zip(q8).foreach { case (x, b) =>
          assert(math.abs(x.toDouble - b * step) <= step / 2 + 1e-9,
            s"vec $id: $x -> $b at amax $amax")
        }
      }
    }
  }

  test("property: sq8 codes stay in [0,255], encode monotone per dim, in-range round-trip bounded") {
    import graft.llm.Similarity
    // train on the EVEN ids only so odd rows can fall outside the
    // trained range — the clamp path must hold for arbitrary floats
    val vecs = sample(Gen.listOfN(160,
      Gen.listOfN(6, Gen.choose(-50f, 50f)).map(_.toList)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val quant = Similarity.sq8Train(df.filter(col("id") % 2 === 0), "v")
    val codes = Similarity.sq8EncodeFrame(df, "id", "v", quant)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val milli = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000)) }.toMap
    // 1. every code of every row (trained or not) is a valid byte
    codes.values.foreach(cs => assert(cs.forall(c => c >= 0 && c <= 255)))
    // 2. per dim, encode is monotone in the milli value
    (0 until 6).foreach { d =>
      val byVal = vecs.map { case (id, _) => (milli(id)(d), codes(id)(d)) }
        .sortBy(_._1)
      byVal.sliding(2).foreach {
        case Seq((v1, c1), (v2, c2)) =>
          assert(c1 <= c2, s"dim $d: value $v1 -> code $c1 but $v2 -> $c2")
        case _ => ()
      }
    }
    // 3. in-range rows reconstruct within one bucket width
    val decoded = Similarity.sq8EncodeFrame(df, "id", "v", quant)
      .select(col("cid"), Similarity.sq8Decode(col("codes"), quant).as("dv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.filter(_._1 % 2 == 0).foreach { case (id, _) =>
      decoded(id).zip(milli(id)).zipWithIndex.foreach { case ((dv, v), d) =>
        val bound = quant(d)._2 / 255L + 1
        assert(math.abs(dv - v) <= bound,
          s"row $id dim $d: |$v - $dv| > $bound (vdiff ${quant(d)._2})")
      }
    }
  }

  test("property: triangleCounts equals naive sorted-triple enumeration on random graphs") {
    val gen = Gen.listOfN(200, for {
      x <- Gen.choose(0L, 25L); y <- Gen.choose(0L, 25L)
    } yield (x, y))
    val edges = sample(gen.map(List(_))).head
    val und = edges.collect { case (x, y) if x != y =>
      (math.min(x, y), math.max(x, y)) }.distinct
    // reference: enumerate sorted triples directly
    val set = und.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct
    val triCount = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, b) <- und; c <- nodes if c > b
      if set.contains((b, c)) && set.contains((a, c))
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val want = nodes.map(n => n -> triCount(n)).toMap
    val got = Ops.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("property: heavyHitters equals plain GROUP BY ... HAVING whenever the guard holds") {
    // skewed synthetic corpus: few hot tokens + alphanumeric tail
    val gen = Gen.listOfN(300, Gen.frequency(
      4 -> Gen.oneOf("hot hot spot", "warm spot here"),
      6 -> Gen.listOfN(3, Gen.alphaNumStr.map(s => if (s.isEmpty) "t" else s.take(5)))
        .map(_.mkString(" "))))
    val texts = sample(gen.map(List(_))).head.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val docs = texts.toDF("doc_id", "text")
    def exact(thr: Long) = docs
      .select(col("doc_id"),
        explode(graft.llm.Text.shingles(graft.llm.Text.words(col("text")), 2))
          .as("ngram"))
      .groupBy("ngram", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("ngram").agg(sum("c").as("occurrences"), count(lit(1)).as("n_docs"))
      .filter(col("occurrences") >= thr)
    // N = 600 bigrams; every combo satisfies thr > 600/(cap+1)
    for ((thr, cap) <- Seq((3L, 1000), (10L, 200), (12L, 50))) {
      val hh = graft.llm.CorpusStats.heavyHitters(docs, "doc_id", "text",
        n = 2, threshold = thr, capacity = cap)
      assert(hh.except(exact(thr)).count() === 0 &&
        exact(thr).except(hh).count() === 0,
        s"thr=$thr cap=$cap")
    }
  }

  test("property: native-HLL register merge is a monoid over arbitrary shard splits") {
    import graft.llm.CorpusStats
    // random corpora over a mid-size vocab; arbitrary 3-way shard
    // splits must merge (cell-wise max, in any grouping) to the full
    // build bit-for-bit — the incremental/streaming-profile contract
    val gen = Gen.listOfN(120, for {
      src <- Gen.oneOf("a", "b", "c")
      ws <- Gen.listOfN(12, Gen.choose(0, 99).map(i => s"t$i"))
      shard <- Gen.choose(0, 2)
    } yield (src, ws.mkString(" "), shard))
    val rows = sample(gen)
    val docs = rows.toDF("source", "text", "shard")
    val full = CorpusStats.hllNgramRegisters(docs, "source", "text")
    val merged = CorpusStats.hllMergeRegisters(
      (0 to 2).map(sh => CorpusStats.hllNgramRegisters(
        docs.filter(col("shard") === sh), "source", "text"))
        .reduce(_.unionByName(_)))
    assert(merged.except(full).count() === 0 &&
      full.except(merged).count() === 0,
      "3-way shard register merge must equal the full build")
    // merge is also associative across UNBALANCED groupings:
    // merge(merge(s0, s1), s2) == merge(s0, s1, s2)
    val nested = CorpusStats.hllMergeRegisters(
      CorpusStats.hllMergeRegisters(
        CorpusStats.hllNgramRegisters(docs.filter(col("shard") === 0),
            "source", "text")
          .unionByName(CorpusStats.hllNgramRegisters(
            docs.filter(col("shard") === 1), "source", "text")))
        .unionByName(CorpusStats.hllNgramRegisters(
          docs.filter(col("shard") === 2), "source", "text")))
    assert(nested.except(full).count() === 0 &&
      full.except(nested).count() === 0, "nested merges must agree")
    // and the estimate is shard-split-invariant by consequence
    val estFull = CorpusStats.hllEstimate(full)
      .as[(String, Long, Long)].collect().toSet
    val estMerged = CorpusStats.hllEstimate(merged)
      .as[(String, Long, Long)].collect().toSet
    assert(estFull === estMerged)
  }

  test("property: log-hist register merge is a sum monoid; enclosures contain the exact order statistic") {
    import graft.llm.CorpusStats
    // arbitrary values over 6 orders of magnitude, arbitrary 3-way
    // shard splits: registers must merge (cell-wise sum, any grouping)
    // to the full build bit-for-bit, and every quantile enclosure must
    // contain the true order statistic — the sketch's guarantee
    val gen = Gen.listOfN(180, for {
      src <- Gen.oneOf("a", "b")
      v <- Gen.frequency(3 -> Gen.choose(0L, 60L),
        3 -> Gen.choose(0L, 5000L), 2 -> Gen.choose(0L, 2000000L))
      shard <- Gen.choose(0, 2)
    } yield (src, v, shard))
    val rows = sample(gen)
    val docs = rows.toDF("source", "v", "shard")
    val full = CorpusStats.logHistRegisters(docs, "source", col("v"))
    val merged = CorpusStats.logHistMerge(
      (0 to 2).map(sh => CorpusStats.logHistRegisters(
        docs.filter(col("shard") === sh), "source", col("v")))
        .reduce(_.unionByName(_)))
    assert(merged.except(full).count() === 0 &&
      full.except(merged).count() === 0,
      "3-way shard register merge must equal the full build")
    val qs = Seq(1, 100, 250, 500, 750, 900, 999, 1000)
    val est = CorpusStats.logHistQuantiles(full, qs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(est.length === 2 * qs.length)
    val bySrc = rows.groupBy(_._1)
      .map { case (s, rs) => s -> rs.map(_._2).sorted.toIndexedSeq }
    est.foreach { case (s, q, n, lo, hi) =>
      val vals = bySrc(s)
      assert(n === vals.size.toLong)
      val exact = vals((math.max(1L, (n * q + 999L) / 1000L) - 1L).toInt)
      assert(lo <= exact && exact <= hi,
        s"$s q=$q: exact $exact outside enclosure [$lo, $hi]")
      // width respects the relative bound above the linear floor
      if (lo > 62L) assert(hi - lo <= math.max((lo + 1L) >> 5, 1L),
        s"$s q=$q: enclosure [$lo, $hi] wider than the 2^-5 bound")
      else assert(lo === hi, s"$s q=$q: small values must be exact")
    }
    // an UN-merged shard union (duplicate (group, bucket) rows — a
    // caller that skipped logHistMerge) must produce the SAME quantile
    // rows: the walk pre-folds cells, so tied register rows can no
    // longer share a cumulative value and silently drop picks
    val rawUnion = (0 to 2).map(sh => CorpusStats.logHistRegisters(
      docs.filter(col("shard") === sh), "source", col("v")))
      .reduce(_.unionByName(_))
    val estRaw = CorpusStats.logHistQuantiles(rawUnion, qs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(estRaw.sortBy(r => (r._1, r._2)).toSeq ===
      est.sortBy(r => (r._1, r._2)).toSeq,
      "un-merged register unions must quantile identically to merged")
  }

  test("property: unigram train/segment — lossless pieces, optimal scores, DP agreement") {
    import graft.llm.Unigram
    // random word soup incl. repeats (so multi-char pieces survive
    // minCount), unicode, and words past the 16-char chunk bound
    val word = Gen.frequency(
      5 -> Gen.oneOf("banana", "bandana", "ban", "anna", "cabana", "ab",
        "café", "naan", "a"),
      2 -> Gen.listOfN(6, Gen.oneOf('a', 'b', 'n', 'c')).map(_.mkString),
      1 -> Gen.oneOf("abababababababababab", "supercalifragilistic"))
    val docsL = sample(Gen.listOfN(80, Gen.listOfN(6, word).map(_.mkString(" "))))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val docs = docsL.toDF("doc_id", "text")
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val scores = pieces.map(p => p._1 -> p._3).toMap
    val enc = Unigram.encode(docs, "doc_id", "text", pieces)
    val ids = pieces.map(_._1).zipWithIndex
      .map { case (p, i) => (i + 1L) -> p }.toMap
    val byWord = enc.orderBy("doc_id", "word_pos", "sym_pos")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
    val expected = docsL.flatMap { case (d, t) =>
      t.split("\\s+").filter(_.nonEmpty).zipWithIndex
        .map { case (w, i) => (d, i.toLong) -> w.toLowerCase }
    }.toMap
    assert(byWord.keySet === expected.keySet)
    byWord.foreach { case (k, rows) =>
      val ps = rows.sortBy(_._3).map(r => ids(r._4)).toSeq
      // losslessness: pieces concatenate back to the word
      assert(ps.mkString === expected(k), s"$k lost content")
      // optimality: the emitted segmentation's total score equals the
      // driver viterbi's on every chunk (the distributed DP can pick
      // a different-but-equal-score path ONLY if the tie-break order
      // drifted — then the seg strings differ and this fails)
      val chunks = expected(k).grouped(Unigram.MaxWordLen).toSeq
      val want = chunks.flatMap(c => Unigram.viterbi(c, scores, 4))
      assert(ps === want, s"$k: DP disagreement")
    }
  }

  test("property: stupid-backoff scoring equals an independent in-memory reimplementation") {
    import graft.llm.NgramLm
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "zz")
    val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val refDocs = sample(Gen.listOfN(20, doc))
    val tgtDocs = sample(Gen.listOfN(60, doc))
    val model = NgramLm.trainBackoff(refDocs.map(Tuple1(_)).toDF("text"), "text")
    val got = NgramLm.scoreBackoff(
        tgtDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // independent reimplementation: plain Scala maps, the same
    // quantization formulas re-derived from raw counts
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val refToks = refDocs.map(toks)
    def counts[K](xs: Seq[K]): Map[K, Long] =
      xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val uni = counts(refToks.flatten)
    val bi = counts(refToks.flatMap(t => t.sliding(2).filter(_.size == 2).map(w => (w(0), w(1)))))
    val tri = counts(refToks.flatMap(t => t.sliding(3).filter(_.size == 3).map(w => (w(0), w(1), w(2)))))
    val total = uni.values.sum
    def q(n: Long, d: Long) = math.floor(1e6 * math.log(n.toDouble / d.toDouble)).toLong
    val p = NgramLm.BackoffPenaltyMicro
    val unk = math.floor(1e6 * math.log(1.0 / (total + 1).toDouble)).toLong
    tgtDocs.zipWithIndex.foreach { case (t, i) =>
      val ws = toks(t)
      val nll = -ws.zipWithIndex.map { case (w, j) =>
        def s1 = uni.get(w).map(c => q(c, total))
        def s2 = if (j >= 1) bi.get((ws(j - 1), w))
          .map(c => q(c, uni(ws(j - 1)))) else None
        def s3 = if (j >= 2) tri.get((ws(j - 2), ws(j - 1), w))
          .map(c => q(c, bi((ws(j - 2), ws(j - 1))))) else None
        if (j >= 2) s3.orElse(s2.map(_ + p)).orElse(s1.map(_ + 2 * p))
          .getOrElse(unk + 2 * p)
        else if (j == 1) s2.orElse(s1.map(_ + p)).getOrElse(unk + p)
        else s1.getOrElse(unk)
      }.sum
      val want = (ws.size.toLong, nll,
        if (ws.nonEmpty) Some(nll / ws.size) else None)
      assert(got(i.toLong) === want, s"doc $i '$t' diverged")
    }
  }
}
