package graft.sources

import java.util
import com.fasterxml.jackson.core.JsonToken
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for Firebase-RTDB-export snapshots — the scale
  * path for S1 (`firebase_service.py:110-218`). The reference reads the
  * whole `/Users` tree into driver memory; at 100 TB the tree must be
  * sharded. Live, the planner finds split bounds with single-key
  * KEYSET PROBES (`orderBy="$key"&startAt&limitToFirst=1` bisection —
  * RangePlanner.probeBounds), then plans one InputPartition per sorted
  * key range, each reader keyset-paging only its range; no key
  * enumeration ever happens, so trees whose key listing exceeds one
  * response (the unpaginated `shallow=true` ceiling) plan fine.
  * Offline, ONE driver-side tokenization builds a (key, byte-offset)
  * index and each reader seeks straight to its own subtrees — I/O
  * differs, the plan shape is the engine's.
  *
  * Key-range filter pushdown (S2 point lookups, `firebase_service.py:
  * 220-254`) prunes partitions whose range can't contain the key.
  *
  * Usage: spark.read.format("graft.sources.RtdbSnapshotSource")
  *   .option("path", ...).option("numPartitions", "8").load()
  * Live mode adds .option("url", ...) [+ authToken, pageSize]; for
  * trees whose shallow key listing is itself too large for one
  * response, .option("splitPoints", "f,m,s") shards without any key
  * enumeration (string-keyed paths only).
  */
class RtdbSnapshotSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {
  /** `spark.read.format("graft-rtdb")` — registered via
    * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister. */
  override def shortName(): String = "graft-rtdb"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RtdbSnapshotSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RtdbTable(properties.get("path"),
      Option(properties.get("numPartitions")).map(_.toInt).getOrElse(4),
      Option(properties.get("url")),
      Option(properties.get("authToken")),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(1000),
      Option(properties.get("splitPoints"))
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil))
}

object RtdbSnapshotSource {
  /** P1 key promotion is part of the source: id/uid from the map key. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("uid", StringType, nullable = false),
    StructField("json", StringType, nullable = true)))

  /** One-pass byte-offset index of the export: (top-level key, byte
    * offset of its value's first token), offset -1 for non-object
    * values (P4 drops them at read time). The planner pays this single
    * tokenization ONCE and hands each partition its own (key, offset)
    * slice, so N readers seek straight to their subtrees instead of
    * each re-tokenizing the whole file — per-task parse work scales
    * with the partition's bytes, not the export's. Same O(keys)
    * transient driver memory as plain enumeration. */
  def indexKeys(path: String): Seq[(String, Long)] = {
    val parser = new ObjectMapper().getFactory.createParser(new java.io.File(path))
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    try {
      if (parser.nextToken() == JsonToken.START_OBJECT) {
        while (parser.nextToken() == JsonToken.FIELD_NAME) {
          val key = parser.currentName()
          val isObj = parser.nextToken() == JsonToken.START_OBJECT
          // byte offset of the value's opening token (file parsers are
          // byte-based, so getByteOffset is exact, never -1)
          buf += key -> (if (isObj) parser.currentTokenLocation().getByteOffset else -1L)
          parser.skipChildren() // no-op on scalars; skips whole subtrees
        }
      }
    } finally parser.close()
    // file order, unsorted: consumers stride-sample + sort (splitBounds)
    // or range-partition with their own ordering — a driver-side sort
    // of every key here is O(n log n) for nothing
    buf.toSeq
  }

  /** Seek-based range read over an [[indexKeys]] slice: one shared
    * channel, one seek + one bounded parse per entry — the reader never
    * tokenizes bytes outside its own subtrees (a partition abandoned
    * early by limit pushdown never even seeks past its last taken row).
    * Entries are emitted in the order given (the planner passes them
    * key-sorted). Callers own close(). */
  final class IndexedRangeReader(path: String, entries: Seq[(String, Long)])
    extends AutoCloseable {
    private val mapper = new ObjectMapper()
    // parser.close() must not close the shared channel between entries
    mapper.getFactory.disable(
      com.fasterxml.jackson.core.JsonParser.Feature.AUTO_CLOSE_SOURCE)
    private var rafOpt: Option[java.io.RandomAccessFile] = None
    private def raf = rafOpt.getOrElse {
      val r = new java.io.RandomAccessFile(path, "r"); rafOpt = Some(r); r
    }
    val iterator: Iterator[(String, String)] = entries.iterator.map { case (key, offset) =>
      raf.seek(offset)
      val parser = mapper.getFactory.createParser(
        java.nio.channels.Channels.newInputStream(raf.getChannel))
      // readTree consumes exactly one value; trailing bytes the parser
      // buffered past the subtree are never tokenized
      try key -> mapper.readTree(parser).toString
      finally parser.close()
    }
    // a limit-abandoned reader that never consumed a row never opened the file
    override def close(): Unit = rafOpt.foreach(_.close())
  }

  /** RTDB orders integer-parseable child keys NUMERICALLY, before all
    * string keys, while this source's range paging and cursors are
    * lexicographic — a SUPERSET probe of RTDB's 32-bit-int rule (any
    * toInt-parseable key, plus any all-digit key however long), shared
    * by the batch planner's unpaged fallback and the streaming guard. */
  private[sources] def integerLike(k: String): Boolean =
    k.toIntOption.isDefined || (k.nonEmpty && k.forall(c => c >= '0' && c <= '9'))

  /** Key-sorted index entries striped into at most `parts` balanced
    * slices, one [[RtdbIndexedPartition]] each — shared by the batch
    * scan and the micro-batch stream so the clamp/stripe math cannot
    * drift between them. `parts <= 0` clamps to one partition, never a
    * silently-empty scan. */
  private[sources] def planIndexedPartitions(path: String, entries: Seq[(String, Long)],
                                             parts: Int, limit: Option[Int])
  : Array[InputPartition] = {
    if (entries.isEmpty) return Array.empty
    val n = math.max(1, math.min(parts, entries.size))
    (0 until n).map { i =>
      val slice = entries.slice(i * entries.size / n, (i + 1) * entries.size / n)
      RtdbIndexedPartition(path, slice, limit): InputPartition
    }.toArray
  }

  /** One range read (the `startAt/endAt` call): object children only
    * (P4 — firebase_service.py:174-178). Streaming parse: only subtrees
    * whose key falls in [from, toExclusive) are materialized; the rest
    * are token-skipped. Used ONLY by `splitPoints` partitions (the
    * zero-enumeration mode, where no index exists by construction); the
    * default offline plan hands each partition an [[indexKeys]] slice
    * and seeks ([[IndexedRangeReader]]), never re-tokenizing the file.
    * The live REST source replaces both with a server-side
    * startAt/endAt fetch (RtdbRestClient). */
  def readRange(path: String, from: Option[String], toExclusive: Option[String]): Iterator[(String, String)] = {
    val mapper = new ObjectMapper()
    val parser = mapper.getFactory.createParser(new java.io.File(path))
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    try {
      if (parser.nextToken() == JsonToken.START_OBJECT) {
        while (parser.nextToken() == JsonToken.FIELD_NAME) {
          val key = parser.currentName()
          parser.nextToken()
          val ord = RangePlanner.utf8Order
          val inRange = from.forall(ord.gteq(key, _)) && toExclusive.forall(ord.lt(key, _))
          if (inRange && parser.currentToken() == JsonToken.START_OBJECT) {
            val node: com.fasterxml.jackson.databind.JsonNode = mapper.readTree(parser)
            buf += key -> node.toString
          } else parser.skipChildren()
        }
      }
    } finally parser.close()
    // file order: scan output has no ordering contract, and a UTF-16
    // String sort here would be the exact inconsistency class r7 removed
    buf.iterator
  }
}

class RtdbTable(path: String, numPartitions: Int, url: Option[String] = None,
                authToken: Option[String] = None, pageSize: Int = 1000,
                splitPoints: Seq[String] = Nil)
  extends Table with SupportsRead {
  override def name(): String = s"rtdb_snapshot(${url.getOrElse(path)})"
  override def schema(): StructType = RtdbSnapshotSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RtdbScanBuilder(path, numPartitions, url, authToken, pageSize, splitPoints)
}

class RtdbScanBuilder(path: String, numPartitions: Int,
                      url: Option[String] = None,
                      authToken: Option[String] = None, pageSize: Int = 1000,
                      splitPoints: Seq[String] = Nil)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit {

  private var keyLow: Option[String] = None
  private var keyHighExcl: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  /** S3/S4 limit pushdown: each range reader stops after `limit` rows
    * (a per-partition cap is a superset of the global limit, so this is
    * partial pushdown -- Spark still applies the final global limit,
    * but the source stops fetching instead of scanning its whole
    * range). On the live REST source this becomes limitToFirst. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed: Boolean = true

  /** Push key-range predicates into partition planning; everything else
    * stays for Spark to evaluate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest, low, high) = KeyRangePush.intersect(filters, Set("id", "uid"))
    keyLow = low; keyHighExcl = high; pushed = accepted
    rest // Spark re-checks accepted ones too if we returned them; range is exact, so drop
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new RtdbScan(path, numPartitions, keyLow, keyHighExcl, limit, url, authToken,
      pageSize, splitPoints)
}

class RtdbScan(path: String, numPartitions: Int,
               keyLow: Option[String], keyHighExcl: Option[String],
               limit: Option[Int] = None, url: Option[String] = None,
               authToken: Option[String] = None, pageSize: Int = 1000,
               splitPoints: Seq[String] = Nil)
  extends Scan with Batch {
  override def readSchema(): StructType = RtdbSnapshotSource.schema
  override def toBatch: Batch = this

  /** Incremental key-cursor tailing (see [[RtdbMicroBatchStream]]). */
  override def toMicroBatchStream(checkpointLocation: String)
  : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RtdbMicroBatchStream(path, numPartitions, url, authToken, pageSize)

  /** Shard the (filtered) key space into contiguous ranges. Offline,
    * streamed field names give the key list in one tokenization (that
    * pass also builds the byte-offset index, so it is not extra work).
    * Live, NO enumeration happens at all: split bounds come from
    * bounded single-key keyset probes (RangePlanner.probeBounds) —
    * O(numPartitions) driver memory and a budgeted probe count, so
    * trees whose key listing exceeds one `shallow=true` response (the
    * service's listing is unpaginated) still auto-plan. The
    * `splitPoints` option (checked first) skips even the probes when
    * the caller knows the key space.
    *
    * GUARD (live transport only): RTDB orders integer-parseable child
    * keys NUMERICALLY, before all string keys, while range paging and
    * Spark's string predicates are lexicographic. On such a path the
    * keyset paging successor can skip keys ("9" + NUL is after "10"
    * server-side; "-13" + NUL is after every integer key), so the plan
    * falls back to ONE unpaged fetch with the pushed range re-applied
    * client-side in Spark's (lexicographic) semantics — complete and
    * correct, at the cost of parallel fetch. The probe is a SUPERSET of
    * RTDB's 32-bit-int rule (any `toInt`-parseable key, plus any
    * all-digit key however long) — over-triggering only costs
    * parallelism, never rows. The offline transport compares in
    * code-point order end to end (RangePlanner.utf8Order — Spark's
    * UTF8String semantics), so the guard does not apply.
    *
    * Memoized: Spark calls planInputPartitions once per planning pass
    * (typically twice per action); enumeration is paid once. */
  override def planInputPartitions(): Array[InputPartition] = computedPartitions
  private lazy val computedPartitions: Array[InputPartition] = computePartitions()
  private def computePartitions(): Array[InputPartition] = {
    // Explicit split points skip key enumeration entirely — the scale
    // lever for trees whose shallow key listing itself is too big for
    // one response (RTDB's shallow API is unpaginated). The caller
    // asserts string-keyed data by providing them; bounds intersect
    // with any pushed key range, and the partitions tile the whole
    // remaining key space, so an unbalanced choice costs balance only.
    val ord = RangePlanner.utf8Order // Spark's UTF8String semantics
    if (splitPoints.nonEmpty) {
      val inRange = splitPoints.map(_.trim).filter(_.nonEmpty).distinct.sorted(ord)
        .filter(p => keyLow.forall(ord.gt(p, _)) && keyHighExcl.forall(ord.lt(p, _)))
      val froms = keyLow +: inRange.map(Some(_))
      val tos = inRange.map(Some(_)) :+ keyHighExcl
      return froms.lazyZip(tos).map { case (from, to) =>
        RtdbRangePartition(path, from, to, limit, url, authToken, pageSize): InputPartition
      }.toArray
    }
    url match {
      case Some(u) =>
        // Live planning by single-key KEYSET PROBES — never the
        // unpaginated `shallow=true` listing, which cannot be issued at
        // all against a tree whose key list exceeds one response (the
        // exact tree that needs sharding most). Each probe is one
        // `orderBy="$key"&startAt&limitToFirst=1` request costing one
        // child payload; probe count is bounded by the planner budget.
        val client = new RtdbRestClient(u, authToken)
        // Numeric guard with ONE probe: RTDB serves integer-parseable
        // keys numerically FIRST, so the globally-first key is
        // integer-like iff any key on the path is.
        val firstAll = client.firstKeyAt(path) match {
          case None => return Array.empty
          case Some(k) => k
        }
        if (RtdbSnapshotSource.integerLike(firstAll))
          return Array(RtdbRangePartition(path, keyLow, keyHighExcl, limit, url,
            authToken, pageSize, unpaged = true))
        // snap the range low end to the first REAL key inside it
        val loK = (keyLow match {
          case Some(l) if ord.lt(firstAll, l) => client.firstKeyAt(path, Some(l))
          case _ => Some(firstAll)
        }) match {
          case Some(k) if keyHighExcl.forall(ord.lt(k, _)) => k
          case _ => return Array.empty // no key in the pushed range
        }
        // bisection upper cursor: the pushed bound if tighter, else the
        // successor of the last real key (one more probe)
        val lastSucc = client.lastKey(path).getOrElse(firstAll) + Char.MinValue
        val hiEx = keyHighExcl.filter(ord.lt(_, lastSucc)).getOrElse(lastSucc)
        val bounds = RangePlanner.probeBounds(loK, hiEx, numPartitions,
          c => client.firstKeyAt(path, Some(c)),
          budget = RangePlanner.SamplesPerSplit * numPartitions)
        val froms = keyLow +: bounds.map(Some(_))
        val tos = bounds.map(Some(_)) :+ keyHighExcl
        froms.lazyZip(tos).map { case (from, to) =>
          RtdbRangePartition(path, from, to, limit, url, authToken, pageSize): InputPartition
        }.toArray
      case None =>
        // Offline: ONE tokenization builds the (key, byte-offset) index;
        // each partition ships its own key-sorted slice and its reader
        // SEEKS to its subtrees, so per-task parse work scales with the
        // partition's bytes, not the export's. Pushed ranges and P4
        // non-object drops apply at planning — entry-exact pruning (a
        // point lookup plans one partition holding one entry). Task
        // descriptors carry O(keys/numPartitions) strings; for exports
        // whose key list is itself unshippable, `splitPoints` plans
        // with zero enumeration instead.
        val entries = RtdbSnapshotSource.indexKeys(path)
          .filter { case (k, off) => off >= 0 &&
            keyLow.forall(ord.gteq(k, _)) && keyHighExcl.forall(ord.lt(k, _)) }
          .sortBy(_._1)(ord)
        RtdbSnapshotSource.planIndexedPartitions(path, entries, numPartitions, limit)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = RtdbReaderFactory
}

case class RtdbRangePartition(path: String, from: Option[String], toExclusive: Option[String],
                              limit: Option[Int] = None, url: Option[String] = None,
                              authToken: Option[String] = None, pageSize: Int = 1000,
                              unpaged: Boolean = false)
  extends InputPartition

/** Offline default: a key-sorted slice of the export's byte-offset
  * index; the reader seeks straight to its own subtrees. */
case class RtdbIndexedPartition(path: String, entries: Seq[(String, Long)],
                                limit: Option[Int] = None)
  extends InputPartition

object RtdbReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: RtdbIndexedPartition =>
        val reader = new RtdbSnapshotSource.IndexedRangeReader(p.path, p.entries)
        rowReader(p.limit.fold(reader.iterator)(reader.iterator.take), reader.close _)
      case pp =>
        val p = pp.asInstanceOf[RtdbRangePartition]
        val it0 = p.url.fold(
          RtdbSnapshotSource.readRange(p.path, p.from, p.toExclusive)) { u =>
          val client = new RtdbRestClient(u, p.authToken)
          if (p.unpaged)
            // numeric-key fallback: one complete fetch, bounds re-applied
            // client-side in Spark's (code-point) string semantics
            client.fetchAll(p.path).filter { case (k, _) =>
              val ord = RangePlanner.utf8Order
              p.from.forall(ord.gteq(k, _)) && p.toExclusive.forall(ord.lt(k, _)) }
          else client.fetchRange(p.path, p.from, p.toExclusive, p.pageSize)
        }
        rowReader(p.limit.fold(it0)(it0.take), () => ())
    }

  private def rowReader(it: Iterator[(String, String)],
                        onClose: () => Unit): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var cur: (String, String) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(cur._1), UTF8String.fromString(cur._1),
        UTF8String.fromString(cur._2))
      override def close(): Unit = onClose()
    }
}
