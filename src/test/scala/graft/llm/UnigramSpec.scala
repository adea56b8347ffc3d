package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: hard-EM training invariants, the
  * driver-DP == distributed-DP differential, multi-chunk words and
  * the lossless piece-concatenation property. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "banana bandana ban"),
    (2L, "banana banana cabana"),
    (3L, "an abandoned banana stand"),
    (4L, "supercalifragilisticexpialidocious ban")).toDF("doc_id", "text")

  test("trainLocal: chars never pruned, multis respect minCount, logp consistent with counts") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val byPiece = pieces.map(p => p._1 -> p).toMap
    // every character of the corpus survives training
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.replace(" ", "")).toSet
    chars.foreach { c =>
      assert(byPiece.contains(c.toString), s"char '$c' was pruned")
    }
    // multi-char pieces carry at least minCount support
    pieces.filter(_._1.length > 1).foreach { case (p, c, _) =>
      assert(c >= 2L, s"piece '$p' kept with count $c < minCount")
    }
    // logp_micro = floor(1e6 ln(cnt/total)) against the returned counts
    val total = pieces.map(_._2).sum
    pieces.foreach { case (p, c, lp) =>
      assert(lp === Unigram.microLn(c, total), s"piece '$p' score drifted")
    }
    // training is deterministic
    assert(pieces === Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000))
  }

  test("trainDistributed == trainLocal bit-for-bit (seed order, EM rounds, quantization)") {
    // the banana fixture exercises overlapping substring occurrences
    // ("ana" twice inside "banana"), seed ties, and chunking via the
    // 34-char word; a second fixture stresses tie-breaks between
    // equal-count multi pieces and EM-starved pieces
    val cfgs = Seq((2, 4, 2L, 1000), (1, 3, 2L, 5), (3, 4, 3L, 8))
    for ((rounds, mpl, mc, seed) <- cfgs) {
      val local = Unigram.trainLocal(docs, "text", rounds = rounds,
        maxPieceLen = mpl, minCount = mc, seedSize = seed)
      val dist = Unigram.trainDistributed(docs, "text", rounds = rounds,
        maxPieceLen = mpl, minCount = mc, seedSize = seed)
      assert(dist === local,
        s"distributed trainer drifted at rounds=$rounds mpl=$mpl mc=$mc seed=$seed")
    }
    val d2 = Seq(
      (1L, "aa ab aa ab ba"),
      (2L, "ab ba ba cc cc cc"),
      (3L, "xyzzy aa")).toDF("doc_id", "text")
    assert(Unigram.trainDistributed(d2, "text", rounds = 2, maxPieceLen = 2,
        minCount = 2L, seedSize = 4)
      === Unigram.trainLocal(d2, "text", rounds = 2, maxPieceLen = 2,
        minCount = 2L, seedSize = 4))
    // the frequency floor composes identically on both trainers
    assert(Unigram.trainDistributed(docs, "text", rounds = 2,
        maxPieceLen = 4, minCount = 2L, seedSize = 1000, wordMinFreq = 2L)
      === Unigram.trainLocal(docs, "text", rounds = 2, maxPieceLen = 4,
        minCount = 2L, seedSize = 1000, wordMinFreq = 2L))
  }

  test("trainLocal raw-web guards: wordMinFreq floors BEFORE the collect; maxDistinctWords fails loudly") {
    val base = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    // the default floor (1) is a bit-for-bit no-op
    assert(base === Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000, wordMinFreq = 1L))
    // a real floor drops singleton junk words from the seed AND the
    // EM weighting — "supercalifragilisticexpialidocious" appears
    // once, so its exclusive substrings must vanish from the vocab
    val floored = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000, wordMinFreq = 2L)
    val flooredSet = floored.map(_._1).toSet
    assert(!flooredSet.contains("supe") && !flooredSet.contains("fragi".take(4)),
      "singleton-word-only substrings must not survive the floor")
    // words above the floor still train: the banana-family pieces stay
    assert(flooredSet.contains("ban"), "frequent-word pieces must survive")
    // the capacity guard trips before the collect, loudly
    val e = intercept[IllegalArgumentException] {
      Unigram.trainLocal(docs, "text", rounds = 1, maxPieceLen = 4,
        minCount = 2L, seedSize = 1000, maxDistinctWords = 3L)
    }
    assert(e.getMessage.contains("maxDistinctWords") &&
      e.getMessage.contains("wordMinFreq"))
  }

  test("segmentWords (distributed DP) equals the driver-local viterbi on every distinct chunk") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val scores = pieces.map(p => p._1 -> p._3).toMap
    val chunksDf = Unigram.wordFreq(docs, "text").select(col("w")).distinct()
    val got = Unigram.segmentWords(chunksDf, pieces.map(p => (p._1, p._3)))
      .as[(String, Seq[String])].collect().toMap
    chunksDf.as[String].collect().foreach { w =>
      assert(got(w) === Unigram.viterbi(w, scores, 4),
        s"distributed and driver DP disagree on '$w'")
    }
  }

  test("encode: multi-chunk words segment in chunk order; pieces concatenate back to the word") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val ids = pieces.map(_._1).zipWithIndex.map { case (p, i) => (i + 1L, p) }.toMap
    val enc = Unigram.encode(docs, "doc_id", "text", pieces)
      .orderBy(col("doc_id"), col("word_pos"), col("sym_pos"))
      .as[(Long, Long, Long, Long)].collect()
    assert(enc.forall(_._4 > 0L), "all pieces trained from this corpus must have ids")
    // per (doc, word): sym_pos contiguous from 0 and pieces rebuild the word
    val words = docs.as[(Long, String)].collect().flatMap { case (d, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).zipWithIndex
        .map { case (w, i) => (d, i.toLong) -> w }
    }.toMap
    enc.groupBy(e => (e._1, e._2)).foreach { case ((d, wp), rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (0L until sorted.length).toSeq)
      val rebuilt = sorted.map(r => ids(r._4)).mkString
      assert(rebuilt === words((d, wp)),
        s"doc $d word $wp: '$rebuilt' != '${words((d, wp))}'")
    }
    // the 34-char word really exercised the multi-chunk path
    assert("supercalifragilisticexpialidocious".length > Unigram.MaxWordLen)
  }

  test("frozen tokenizer: unseen characters encode as UNK 0, words never dropped") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    assert(!pieces.exists(_._1.contains("z")), "fixture needs 'z' unseen")
    // 'z' never trained; the long word crosses a chunk boundary with
    // an unseen char in the SECOND chunk (the partial-drop case)
    val serving = Seq(
      (9L, "banana zaz ban"),
      (10L, ("a" * 20) + "z" + "ban")).toDF("doc_id", "text")
    val enc = Unigram.encode(serving, "doc_id", "text", pieces)
      .as[(Long, Long, Long, Long)].collect()
    val byWord = enc.groupBy(e => (e._1, e._2))
    assert(byWord.keySet === Set((9L, 0L), (9L, 1L), (9L, 2L), (10L, 0L)),
      "no word may be dropped for carrying an unseen char")
    val ids = pieces.map(_._1).zipWithIndex
      .map { case (p, i) => (i + 1L) -> p }.toMap
    // zaz: the two z's are UNK 0, the 'a' between them still resolves
    val zaz = byWord((9L, 1L)).sortBy(_._3).map(_._4).toSeq
    assert(zaz.count(_ == 0L) === 2 && zaz.exists(t => ids.get(t).contains("a")),
      s"zaz must carry two UNKs and a real 'a', got $zaz")
    // the multi-chunk word keeps BOTH chunks' content: total covered
    // chars = 24, exactly one UNK (the single 'z')
    val longW = byWord((10L, 0L)).sortBy(_._3).map(_._4).toSeq
    assert(longW.count(_ == 0L) === 1, s"one UNK expected, got $longW")
    val coveredKnown = longW.filter(_ != 0L).map(ids).mkString
    assert(coveredKnown === ("a" * 20) + "ban",
      "the known content around the unseen char must survive intact")
  }

  test("byte fallback: unseen chars expand to UTF-8 byte tokens; ids below the learned range are fixed") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val ids = Unigram.symbolIdsFallback(pieces)
    val idOf = ids.toMap
    // layout: <0xNN> at 1+NN, specials 257..259, learned from 260
    assert(idOf(Bpe.byteToken(0)) === 1L && idOf(Bpe.byteToken(255)) === 256L)
    assert(idOf("<|bos|>") === 257L && ids.filter(_._2 >= 260L)
      .map(_._1) === pieces.map(_._1))
    // 'é' is unseen (2 UTF-8 bytes) and 'z' is unseen (1 byte)
    val serving = Seq((9L, "ban zé")).toDF("doc_id", "text")
    val enc = Unigram.encodeFallback(serving, "doc_id", "text", pieces, ids)
      .orderBy("doc_id", "word_pos", "sym_pos", "fb_pos")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(enc.forall(_._5 > 0L), "byte fallback must never emit UNK 0")
    // the unseen word's tokens rebuild its exact UTF-8 bytes
    val ze = enc.filter(e => e._1 == 9L && e._2 == 1L).sortBy(e => (e._3, e._4))
    val names = ids.map(_.swap).toMap
    val rebuilt = ze.map(e => names(e._5)).flatMap { n =>
      if (n.startsWith("<0x")) Seq(Integer.parseInt(n.substring(3, 5), 16).toByte)
      else n.getBytes("UTF-8").toSeq
    }.toArray
    assert(new String(rebuilt, "UTF-8") === "zé",
      "byte tokens must rebuild the exact unseen content")
    // known pieces stay single rows at fb_pos 0
    assert(enc.filter(e => e._2 == 0L).forall(_._4 == 0L))
  }

  test("pruneToVocab: chars always survive, loss ranks the multis, logp re-quantized over kept counts") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val chars = pieces.filter(_._1.length == 1)
    val nMulti = pieces.size - chars.size
    assert(nMulti >= 3, "fixture must train multi-char pieces")
    // a target that drops all but the top multi piece
    val target = chars.size + 1
    val pruned = Unigram.pruneToVocab(pieces, target)
    assert(pruned.size === target)
    assert(pruned.filter(_._1.length == 1).map(_._1) === chars.map(_._1),
      "the required-character set must survive any target")
    // the kept multi is the argmax of the documented loss rule
    val scores = pieces.map(p => p._1 -> p._3).toMap
    val losses = pieces.filter(_._1.length > 1).map { case (p, c, s) =>
      (p, c, c * (s - Unigram.viterbiBestScore(p, scores, 4, excludeWhole = true)))
    }
    val want = losses.sortBy(l => (-l._3, -l._2, l._1)).head
    val keptMulti = pruned.filter(_._1.length > 1)
    assert(keptMulti.map(_._1) === Seq(want._1))
    assert(keptMulti.head._3 === Some(want._3), "loss column must carry the rule's value")
    assert(pruned.filter(_._1.length == 1).forall(_._3.isEmpty),
      "chars carry no loss — they are never candidates")
    // losses are the true removal cost: alt path never beats the piece itself
    losses.foreach { case (p, _, lo) =>
      assert(lo >= 0L, s"piece '$p' has negative removal loss $lo")
    }
    // logp re-quantized over the KEPT counts only
    val total = pruned.map(_._2).sum
    pruned.foreach { case (p, c, _, lp) =>
      assert(lp === Unigram.microLn(c, total), s"piece '$p' logp not re-quantized")
    }
    // a target >= |pieces| keeps everything (ordering aside, same set)
    assert(Unigram.pruneToVocab(pieces, pieces.size + 5).map(_._1)
      === pieces.map(_._1))
    // the excluded-whole DP really excludes: a piece whose only
    // segmentation WITH itself is itself scores strictly worse without
    val best = Unigram.viterbiBestScore(want._1, scores, 4)
    assert(best >= scores(want._1), "full-span candidate bounds the DP")
  }

  test("l-best EM: top-k DP extends viterbi, paths distinct and pinned-ordered, k=2 training shifts counts deterministically") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 1,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val scores = pieces.map(p => p._1 -> p._3).toMap
    val words = Unigram.wordFreq(docs, "text").as[(String, Long)]
      .collect().map(_._1)
    words.foreach { w =>
      val top = Unigram.viterbiTopK(w, scores, 4, kBest = 3)
      // path 1 is exactly the 1-best viterbi
      assert(top.head === Unigram.viterbi(w, scores, 4), s"'$w' head drifted")
      // all paths distinct, all rebuild the word, count bounded by k
      assert(top.size <= 3 && top.distinct.size === top.size)
      top.foreach(seg => assert(seg.mkString === w))
      // pinned order: scores non-increasing; ties by (np, seg)
      val keyed = top.map(seg =>
        (seg.map(scores).sum, seg.length, seg.mkString(" ")))
      assert(keyed === keyed.sortBy(k => (-k._1, k._2, k._3)),
        s"'$w' paths out of pinned order")
    }
    // kBest=2 training: deterministic, chars still never pruned, and
    // the E-step really shifts mass vs pure Viterbi
    val nbest = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000, kBest = 2)
    assert(nbest === Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000, kBest = 2))
    val vit = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    assert(nbest.map(p => p._1 -> p._2).toMap !=
      vit.map(p => p._1 -> p._2).toMap,
      "2-best E-step must move counts on this fixture")
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.replace(" ", "")).toSet
    val have = nbest.map(_._1).toSet
    chars.foreach(c => assert(have.contains(c.toString)))
  }

  test("prune -> encode: the pruned vocab still segments every word losslessly using only kept pieces") {
    val pieces = Unigram.trainLocal(docs, "text", rounds = 2,
      maxPieceLen = 4, minCount = 2L, seedSize = 1000)
    val chars = pieces.count(_._1.length == 1)
    val pruned = Unigram.pruneToVocab(pieces, chars + 1)
    val ids = pruned.map(_._1).zipWithIndex
      .map { case (p, i) => (i + 1L) -> p }.toMap
    val enc = Unigram.encode(docs, "doc_id", "text",
        pruned.map(p => (p._1, p._2, p._4)))
      .as[(Long, Long, Long, Long)].collect()
    assert(enc.forall(_._4 > 0L), "every piece must come from the pruned set")
    val words = docs.as[(Long, String)].collect().flatMap { case (d, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).zipWithIndex
        .map { case (w, i) => (d, i.toLong) -> w }
    }.toMap
    enc.groupBy(e => (e._1, e._2)).foreach { case ((d, wp), rows) =>
      val rebuilt = rows.sortBy(_._3).map(r => ids(r._4)).mkString
      assert(rebuilt === words((d, wp)), s"doc $d word $wp lost content")
    }
    // the tighter vocab must emit MORE tokens than the full one
    val full = Unigram.encode(docs, "doc_id", "text", pieces).count()
    assert(enc.length > full,
      s"pruning to ${pruned.size} pieces must raise fertility ($full -> ${enc.length})")
  }

  test("chunks: 16-char slices cover the word exactly") {
    val got = Seq(Tuple1("a" * 35)).toDF("w")
      .select(Unigram.chunks(col("w")).as("c")).as[Seq[String]].head()
    assert(got === Seq("a" * 16, "a" * 16, "aaa"))
  }
}
