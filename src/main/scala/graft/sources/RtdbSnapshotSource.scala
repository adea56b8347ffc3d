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
  * sharded. The live RTDB REST API supports exactly that via
  * `shallow=true` (list keys) + `orderBy="$key"&startAt/endAt` (range
  * reads), so the planner here is: enumerate keys cheaply, split into
  * N sorted key ranges, one InputPartition per range, each reader
  * fetching only its range. Offline, "fetch" parses the exported JSON
  * file and keeps keys in range — I/O differs, the plan shape is the
  * engine's.
  *
  * Key-range filter pushdown (S2 point lookups, `firebase_service.py:
  * 220-254`) prunes partitions whose range can't contain the key.
  *
  * Usage: spark.read.format("graft.sources.RtdbSnapshotSource")
  *   .option("path", ...).option("numPartitions", "8").load()
  */
class RtdbSnapshotSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RtdbSnapshotSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RtdbTable(properties.get("path"),
      Option(properties.get("numPartitions")).map(_.toInt).getOrElse(4),
      Option(properties.get("url")),
      Option(properties.get("authToken")),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(1000))
}

object RtdbSnapshotSource {
  /** P1 key promotion is part of the source: id/uid from the map key. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("uid", StringType, nullable = false),
    StructField("json", StringType, nullable = true)))

  /** Driver-side key enumeration (the `shallow=true` call). Streaming
    * token scan — child subtrees are skipped, never materialized, so
    * enumerating keys of an arbitrarily large export is O(keys) memory. */
  def listKeys(path: String): Seq[String] = {
    val parser = new ObjectMapper().getFactory.createParser(new java.io.File(path))
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    try {
      if (parser.nextToken() == JsonToken.START_OBJECT) {
        while (parser.nextToken() == JsonToken.FIELD_NAME) {
          buf += parser.currentName()
          parser.nextToken()
          parser.skipChildren() // no-op on scalars; skips whole subtrees
        }
      }
    } finally parser.close()
    buf.sorted.toSeq
  }

  /** One range read (the `startAt/endAt` call): object children only
    * (P4 — firebase_service.py:174-178). Streaming parse: only subtrees
    * whose key falls in [from, toExclusive) are materialized; the rest
    * are token-skipped. N partitions still each token-scan the file
    * (a monolithic JSON export has no index to seek by), but per-task
    * memory is O(range) not O(file) and the dominant cost — building
    * tree nodes and serializing them back — is paid exactly once per
    * row across the whole scan. The live REST source replaces this
    * with a server-side startAt/endAt fetch (RtdbRestClient). */
  def readRange(path: String, from: String, toExclusive: Option[String]): Iterator[(String, String)] = {
    val mapper = new ObjectMapper()
    val parser = mapper.getFactory.createParser(new java.io.File(path))
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    try {
      if (parser.nextToken() == JsonToken.START_OBJECT) {
        while (parser.nextToken() == JsonToken.FIELD_NAME) {
          val key = parser.currentName()
          parser.nextToken()
          val inRange = key >= from && toExclusive.forall(key < _)
          if (inRange && parser.currentToken() == JsonToken.START_OBJECT) {
            val node: com.fasterxml.jackson.databind.JsonNode = mapper.readTree(parser)
            buf += key -> node.toString
          } else parser.skipChildren()
        }
      }
    } finally parser.close()
    buf.sortInPlaceBy(_._1).iterator
  }
}

class RtdbTable(path: String, numPartitions: Int, url: Option[String] = None,
                authToken: Option[String] = None, pageSize: Int = 1000)
  extends Table with SupportsRead {
  override def name(): String = s"rtdb_snapshot(${url.getOrElse(path)})"
  override def schema(): StructType = RtdbSnapshotSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RtdbScanBuilder(path, numPartitions, url, authToken, pageSize)
}

class RtdbScanBuilder(path: String, numPartitions: Int,
                      url: Option[String] = None,
                      authToken: Option[String] = None, pageSize: Int = 1000)
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
    new RtdbScan(path, numPartitions, keyLow, keyHighExcl, limit, url, authToken, pageSize)
}

class RtdbScan(path: String, numPartitions: Int,
               keyLow: Option[String], keyHighExcl: Option[String],
               limit: Option[Int] = None, url: Option[String] = None,
               authToken: Option[String] = None, pageSize: Int = 1000)
  extends Scan with Batch {
  override def readSchema(): StructType = RtdbSnapshotSource.schema
  override def toBatch: Batch = this

  /** Shard the (filtered) sorted key space into contiguous ranges. Key
    * enumeration is the cheap call on either transport: streamed field
    * names offline, `shallow=true` against the live service. */
  override def planInputPartitions(): Array[InputPartition] = {
    val keys = url.fold(RtdbSnapshotSource.listKeys(path))(u =>
        new RtdbRestClient(u, authToken).shallowKeys(path))
      .filter(k => keyLow.forall(k >= _) && keyHighExcl.forall(k < _))
    if (keys.isEmpty) return Array.empty
    val n = math.min(numPartitions, keys.size)
    val bounds = (0 until n).map(i => keys(i * keys.size / n))
    bounds.zipWithIndex.map { case (from, i) =>
      val to = if (i + 1 < n) Some(bounds(i + 1)) else keyHighExcl
      RtdbRangePartition(path, from, to, limit, url, authToken, pageSize): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = RtdbReaderFactory
}

case class RtdbRangePartition(path: String, from: String, toExclusive: Option[String],
                              limit: Option[Int] = None, url: Option[String] = None,
                              authToken: Option[String] = None, pageSize: Int = 1000)
  extends InputPartition

object RtdbReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RtdbRangePartition]
    new PartitionReader[InternalRow] {
      private val it0 = p.url.fold(
        RtdbSnapshotSource.readRange(p.path, p.from, p.toExclusive))(u =>
        new RtdbRestClient(u, p.authToken).fetchRange(p.path, p.from, p.toExclusive, p.pageSize))
      private val it = p.limit.fold(it0)(it0.take)
      private var cur: (String, String) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(cur._1), UTF8String.fromString(cur._1),
        UTF8String.fromString(cur._2))
      override def close(): Unit = ()
    }
  }
}
