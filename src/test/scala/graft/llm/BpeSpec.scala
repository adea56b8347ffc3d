package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordVocab + pairCounts: frequency-weighted adjacent pairs over chars + </w>") {
    val docs = Seq("low low", "low").toDF("text")
    val pairs = Bpe.pairCounts(Bpe.wordVocab(docs, "text"))
      .as[(String, Long)].collect().toMap
    // one distinct word "low" with freq 3 -> every pair weighted 3
    assert(pairs === Map("l o" -> 3L, "o w" -> 3L, s"w ${Bpe.EndMark}" -> 3L))
  }

  test("applyMerge: greedy leftmost-first, overlap-safe, merged tail never rematches") {
    val df = Seq(
      (1L, Seq("a", "a", "a")),
      (2L, Seq("a", "b", "a", "b")),
      (3L, Seq("b", "a", "b"))).toDF("id", "syms")
    val aa = df.filter(col("id") === 1L)
      .select(Bpe.applyMerge(col("syms"), "a", "a")).as[Seq[String]].head()
    assert(aa === Seq("aa", "a"), "leftmost-first on overlapping run")
    val ab = df.filter(col("id") === 2L)
      .select(Bpe.applyMerge(col("syms"), "a", "b")).as[Seq[String]].head()
    assert(ab === Seq("ab", "ab"))
    val bab = df.filter(col("id") === 3L)
      .select(Bpe.applyMerge(col("syms"), "a", "b")).as[Seq[String]].head()
    assert(bab === Seq("b", "ab"))
  }

  test("trainMerges: the classic low/lower sequence with deterministic tie-breaks") {
    val docs = Seq("low low low lower").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", nMerges = 3)
    // pairs "l o" and "o w" both count 4 -> pair-asc tie-break picks
    // "l o"; then "lo w" (4); then "low </w>" (3)
    assert(merges === Seq(
      (0, "l", "o", 4L), (1, "lo", "w", 4L), (2, "low", Bpe.EndMark, 3L)))
  }

  test("trainMerges stops when no pair repeats") {
    val docs = Seq("ab cd").toDF("text") // every word unique, all pairs freq 1
    assert(Bpe.trainMerges(docs, "text", nMerges = 10).isEmpty)
  }

  test("trainMergesLocal: identical merge list to the distributed rounds") {
    // a corpus with repeated stems, ties, overlap runs, and multibyte
    // symbols — every code path the distributed trainer exercises
    val docs = Seq("low low low lower lowest",
      "aaa aab abab", "日本 日本 日本語").toDF("text")
    for (n <- Seq(1, 3, 8, 20)) {
      val dist = Bpe.trainMerges(docs, "text", nMerges = n)
      val local = Bpe.trainMergesLocal(docs, "text", nMerges = n)
      assert(local === dist, s"nMerges=$n: local $local vs distributed $dist")
    }
    // the early-stop contract carries over
    assert(Bpe.trainMergesLocal(Seq("ab cd").toDF("text"), "text",
      nMerges = 10).isEmpty)
    // driver-local application matches the fold kernel
    assert(Bpe.applyMergeLocal(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    assert(Bpe.applyMergeLocal(Array("b", "a", "b"), "a", "b").toSeq ===
      Seq("b", "ab"))
  }

  test("trainDistributed (incremental pair maintenance) == trainMergesLocal across configs") {
    // three corpora x several depths: repeated stems with ties,
    // overlap runs (a==b merges whose rewrite changes its own pair
    // neighborhood), multibyte symbols, and a tie-heavy pseudo-random
    // stress that drives many words through repeated rewrites — the
    // delta-maintenance paths (touched-word detection, before/after
    // multiset fold, zero-count row drop) all exercised
    val corpora = Seq(
      Seq("low low low lower lowest", "aaa aab abab", "日本 日本 日本語"),
      Seq("aaaa aaaa aa", "baaab baaab"), // overlap-dominated
      (0 until 160).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"bpe-dist:$i".getBytes("UTF-8"))
        h.take(6).map(b => ('a' + ((b & 0xFF) % 4)).toChar).mkString
      }.grouped(8).map(_.mkString(" ")).toSeq)
    for ((c, ci) <- corpora.zipWithIndex; n <- Seq(1, 5, 12)) {
      val docs = c.map(Tuple1(_)).toDF("text")
      val dist = Bpe.trainDistributed(docs, "text", nMerges = n)
      val local = Bpe.trainMergesLocal(docs, "text", nMerges = n)
      assert(dist === local, s"corpus $ci nMerges=$n: dist $dist vs local $local")
    }
    // the early-stop contract carries over
    assert(Bpe.trainDistributed(Seq("ab cd").toDF("text"), "text",
      nMerges = 10).isEmpty)
  }

  test("trainMergesLocal raw-web guards: wordMinFreq floors BEFORE the collect; maxDistinctWords fails loudly") {
    val docs = Seq("low low low lower lowest",
      "banana banana band", "zyzzyva").toDF("text")
    val base = Bpe.trainMergesLocal(docs, "text", nMerges = 6)
    // the default floor (1) is a bit-for-bit no-op
    assert(base === Bpe.trainMergesLocal(docs, "text", nMerges = 6,
      wordMinFreq = 1L))
    // a real floor drops singleton words from the vocabulary: the
    // floored training equals training on the frequency-filtered
    // corpus directly ("lower", "lowest", "band", "zyzzyva" are
    // singletons and must not contribute pair counts)
    val floored = Bpe.trainMergesLocal(docs, "text", nMerges = 6,
      wordMinFreq = 2L)
    val expect = Bpe.trainMergesLocal(Seq("low low low",
      "banana banana").toDF("text"), "text", nMerges = 6)
    assert(floored === expect,
      "floored training must equal training on the floored corpus")
    // the capacity guard trips before the collect, loudly
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMergesLocal(docs, "text", nMerges = 2, maxDistinctWords = 3L)
    }
    assert(e.getMessage.contains("maxDistinctWords") &&
      e.getMessage.contains("wordMinFreq"))
  }

  test("trainMergesLocal: incremental counts survive a long tie-heavy run") {
    // stress for the r14 incremental pair-count maintenance (inverted
    // index + lazy max-heap): a deterministic pseudo-random corpus
    // over a tiny alphabet makes counts COLLIDE constantly (the stale-
    // heap-entry and count-returns-to-old-value paths), and 40 rounds
    // drive many words through repeated rewrites. The distributed
    // trainer (never rewritten) is the from-scratch ground truth.
    val words = (0 until 160).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bpe-stress:$i".getBytes("UTF-8"))
      h.take(6).map(b => ('a' + ((b & 0xFF) % 4)).toChar).mkString
    }
    val docs = words.grouped(8).map(_.mkString(" ")).toSeq
      .map(Tuple1(_)).toDF("text")
    val dist = Bpe.trainMerges(docs, "text", nMerges = 40)
    val local = Bpe.trainMergesLocal(docs, "text", nMerges = 40)
    assert(local === dist,
      s"divergence at ${local.zip(dist).indexWhere(p => p._1 != p._2)}: " +
        s"local=${local.take(5)} dist=${dist.take(5)}")
  }

  test("tokenCounts: vocab-scale merge application joined onto per-doc words") {
    val docs = Seq((1L, "low low"), (2L, "lower"), (3L, "")).toDF("doc_id", "text")
    val out = Bpe.tokenCounts(docs, "doc_id", "text",
        Seq(("l", "o"), ("lo", "w")))
      .as[(Long, Long)].collect().toMap
    // after (l,o)+(lo,w): low -> [low, </w>] = 2; lower -> [low,e,r,</w>] = 4
    assert(out === Map(1L -> 4L, 2L -> 4L, 3L -> 0L))
  }

  test("applyMerge is a no-op when the pair is absent; multibyte chars split whole") {
    val df = Seq(Tuple1(Seq("x", "y", "z"))).toDF("syms")
    assert(df.select(Bpe.applyMerge(col("syms"), "a", "b"))
      .as[Seq[String]].head() === Seq("x", "y", "z"))
    // zh fixture guard: split("") must yield whole BMP characters so
    // the oracle's per-character indexing sees the same symbols
    val zh = Seq(Tuple1("数据 引擎")).toDF("text")
    val syms = Bpe.wordVocab(zh, "text").orderBy("w")
      .select("syms").as[Seq[String]].collect()
    assert(syms.toSet === Set(Seq("数", "据", Bpe.EndMark),
      Seq("引", "擎", Bpe.EndMark)))
  }

  test("encode: ordered token-id stream matches hand-applied merges") {
    val docs = Seq((1L, "low lower"), (2L, "low"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    // merged vocab: low -> [low, </w>]; lower -> [low, e, r, </w>]
    // distinct syms UTF-8-sorted: </w>(1), e(2), low(3), r(4)
    assert(Bpe.symbolIds(docs, "text", merges) ===
      Seq((Bpe.EndMark, 1L), ("e", 2L), ("low", 3L), ("r", 4L)))
    val out = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id", "word_pos", "sym_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 0L, 3L), (1L, 0L, 1L, 1L),                   // low
      (1L, 1L, 0L, 3L), (1L, 1L, 1L, 2L), (1L, 1L, 2L, 4L),
      (1L, 1L, 3L, 1L),                                     // lower
      (2L, 0L, 0L, 3L), (2L, 0L, 1L, 1L)))                  // low
    // empty doc 3 emits no rows (tokenCounts reports it as 0)
    assert(!out.exists(_._1 == 3L))
  }

  test("encode: per-doc stream counts equal the tokenCounts ledger") {
    // differential on a messy corpus: ties, overlap runs, multibyte,
    // repeated words, an empty doc — trained merges, not hand-picked
    val docs = Seq((10L, "low low low lower lowest"),
      (11L, "aaa aab abab"), (12L, "日本 日本 日本語"), (13L, ""),
      (14L, "low aaa 日本")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesLocal(docs, "text", nMerges = 9)
      .map { case (_, a, b, _) => (a, b) }
    val fromStream = Bpe.encode(docs, "doc_id", "text", merges)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val ledger = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(ledger.filter(_._2 > 0L) === fromStream)
    assert(ledger(13L) === 0L)
    // the id table is dense 1..|syms| and the stream uses only it
    val ids = Bpe.symbolIds(docs, "text", merges)
    assert(ids.map(_._2) === (1L to ids.length.toLong))
    val used = Bpe.encode(docs, "doc_id", "text", merges)
      .select("token_id").distinct().as[Long].collect().toSet
    assert(used.subsetOf(ids.map(_._2).toSet))
  }

  test("persistTokenizer/readTokenizer/encodeWith: round-trip, UNK, frozen serving") {
    val train = Seq((1L, "low low lower low")).toDF("doc_id", "text")
    val path = graft.util.Scratch.dir("bpe_store")
    val merges = Bpe.persistTokenizer(train, "text", path, nMerges = 3)
    val (m2, ids) = Bpe.readTokenizer(spark, path)
    assert(m2 === merges, "merge list must round-trip in training order")
    assert(ids === Bpe.symbolIds(train, "text", merges),
      "id table must round-trip")
    // store round-trip encode == direct encode, bit-for-bit
    val direct = Bpe.encode(train, "doc_id", "text", merges)
      .orderBy("doc_id", "word_pos", "sym_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val viaStore = Bpe.encodeWith(train, "doc_id", "text", m2, ids)
      .orderBy("doc_id", "word_pos", "sym_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaStore === direct)
    // serving a DIFFERENT corpus: known words encode under the frozen
    // ids; a character the training corpus never saw is UNK 0, and
    // the stream keeps its position instead of dropping the row
    val serve = Seq((9L, "low zzz")).toDF("doc_id", "text")
    val out = Bpe.encodeWith(serve, "doc_id", "text", m2, ids)
      .orderBy("word_pos", "sym_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val known = ids.toMap
    assert(out.takeWhile(_._2 == 0L).map(_._4).forall(_ > 0L),
      "trained word must encode with known ids")
    val unkRows = out.filter(_._2 == 1L)
    assert(unkRows.nonEmpty && unkRows.exists(_._4 == 0L),
      s"unseen symbols must surface as UNK 0: $out")
    // 'z' never appeared in training; '</w>' did — the word 'zzz'
    // ends in the KNOWN end-mark after merge application
    assert(unkRows.last._4 === known(Bpe.EndMark))
  }

  test("decode: inverse of encode on a messy corpus; UNK surfaces as U+FFFD") {
    val docs = Seq((10L, "Low  LOW lower"), (11L, "aaa abab"),
      (12L, "日本 日本語"), (13L, "")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesLocal(docs, "text", nMerges = 6)
      .map { case (_, a, b, _) => (a, b) }
    val ids = Bpe.symbolIds(docs, "text", merges)
    val decoded = Bpe.decode(
        Bpe.encodeWith(docs, "doc_id", "text", merges, ids), "doc_id", ids)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // round-trip == whitespace-normalized lowercase; empty doc -> no row
    assert(decoded === Seq((10L, "low low lower"), (11L, "aaa abab"),
      (12L, "日本 日本語")))
    // a stream with an unknown id decodes that position as U+FFFD
    val unkStream = Seq((1L, 0L, 0L, ids.head._2), (1L, 0L, 1L, 0L))
      .toDF("doc_id", "word_pos", "sym_pos", "token_id")
    val unk = Bpe.decode(unkStream, "doc_id", ids)
      .as[(Long, String)].head()
    assert(unk._2.contains("�"), s"UNK must surface visibly: $unk")
  }

  test("byte fallback: OOV symbols expand to byte tokens, multibyte round-trips exactly") {
    import graft.llm.Bpe
    // train on an ASCII-only corpus...
    val train = Seq((1L, "low low lower lowest")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesLocal(train, "text", 6)
      .map { case (_, a, b, _) => (a, b) }
    val ids = Bpe.symbolIdsFallback(train, "text", merges)
    // layout: bytes at 1..256 (id = 1 + value), specials next, learned after
    assert(ids.take(256).zipWithIndex.forall { case ((s, i), v) =>
      s == Bpe.byteToken(v) && i == v + 1L })
    assert(ids.slice(256, 259).map(_._1) == Bpe.Specials)
    assert(ids.slice(256, 259).map(_._2) == Seq(257L, 258L, 259L))
    assert(ids.drop(259).forall(_._2 >= 260L))
    // ...then encode text with ASCII ('~') AND multibyte OOV: a 2-byte
    // char (é U+00E9), a 3-byte char (日), a 4-byte emoji (U+1F600)
    val serve = Seq((7L, "low ~ café 日 low😀 x"))
      .toDF("doc_id", "text")
    val stream = Bpe.encodeFallback(serve, "doc_id", "text", merges, ids)
    val byType = stream.select("token_id").as[Long].collect()
    assert(byType.forall(_ > 0L), "byte fallback leaves no UNK")
    assert(byType.exists(t => t >= 1L && t <= 256L), "OOV must use byte tokens")
    // '~' is 0x7E -> token 127
    assert(byType.contains(127L))
    // é encodes as its TWO UTF-8 bytes (0xC3 0xA9 -> 196, 170)
    assert(byType.contains(0xC3 + 1L) && byType.contains(0xA9 + 1L))
    // round-trip: decode == whitespace-normalized lowercase, with the
    // split multibyte characters re-fused exactly
    val back = Bpe.decodeFallback(stream, "doc_id", ids)
      .as[(Long, String)].head()
    assert(back === ((7L, "low ~ café 日 low😀 x")))
    // in-vocabulary text takes the vocabulary path (fb_pos 0, learned ids)
    val known = Bpe.encodeFallback(train, "doc_id", "text", merges, ids)
    assert(known.filter(col("fb_pos") =!= 0L).count() == 0)
    assert(known.filter(col("token_id") < 260L).count() == 0)
  }

  test("sourceOverlap: exact pairwise Jaccard, stop-shingle cap consistent") {
    val docs = Seq(
      ("A", "a b c d"), ("B", "a b c x"), ("C", "q r s t"),
      ("A", "z z z z z"), ("B", "z z z z z"), ("C", "z z z z z"))
      .toDF("source", "text")
    // 3-gram sets (before cap): A={abc,bcd,zzz}, B={abc,bcx,zzz}, C={qrs,rst,zzz}
    // maxSources=2 drops zzz (df=3) from joins AND sizes
    val out = CorpusStats.sourceOverlap(docs, "source", "text",
        n = 3, maxSources = 2)
      .select("src_a", "src_b", "n_a", "n_b", "n_common", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.length === 1, s"only A-B overlap expected: ${out.toSeq}")
    val (a, b, na, nb, nc, j) = out.head
    assert((a, b) === (("A", "B")))
    assert(na === 2L && nb === 2L && nc === 1L)
    assert(j === 1.0 / 3.0)
  }
}
