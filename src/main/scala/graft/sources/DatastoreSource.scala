package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source over the Datastore REST surface — the scale
  * path for S6 (`datastore_service.py:105-178`). The reference fetches
  * every entity of a kind through one cursor-paged loop on the driver;
  * here the planner splits the key space into N ranges (one bounded
  * `__scatter__` sample request — see `planInputPartitions`), one
  * InputPartition per range, and each reader runs its own bounded
  * cursor-paged `runQuery` — N concurrent range scans instead of one
  * serial loop, the same shape as the RTDB source. Key-range pushdown
  * (point lookups) prunes partitions exactly like RtdbSnapshotSource;
  * ranges are evaluated in TRUE service key order (numeric ids before
  * names — DatastoreKeys).
  *
  * CAVEAT (string key promotion): a NAME key that is all digits is
  * indistinguishable from a numeric-id key after promotion and is
  * treated as an id. Kinds that mix all-digit names with numeric ids
  * should read with `numPartitions = 1` and no key predicates.
  *
  * Usage: spark.read.format("graft.sources.DatastoreSource")
  *   .option("url", ...).option("projectId", ...).option("kind", "User")
  *   .option("numPartitions", "8").load()
  */
class DatastoreSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {
  /** `spark.read.format("graft-datastore")` — registered via
    * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister. */
  override def shortName(): String = "graft-datastore"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DatastoreSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DatastoreTable(
      properties.get("url"), properties.get("projectId"),
      Option(properties.get("kind")).getOrElse("User"),
      Option(properties.get("numPartitions")).map(_.toInt).getOrElse(4),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(1000),
      Option(properties.get("authToken")))
}

object DatastoreSource {
  /** Key promotion is part of the source: entity key name/id → id
    * (`datastore_service.py:140-147`). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("json", StringType, nullable = true)))
}

class DatastoreTable(url: String, projectId: String, kind: String,
                     numPartitions: Int, pageSize: Int, authToken: Option[String])
  extends Table with SupportsRead {
  override def name(): String = s"datastore($projectId/$kind)"
  override def schema(): StructType = DatastoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DatastoreScanBuilder(url, projectId, kind, numPartitions, pageSize, authToken)
}

class DatastoreScanBuilder(url: String, projectId: String, kind: String,
                           numPartitions: Int, pageSize: Int, authToken: Option[String])
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit
  with SupportsPushDownAggregates with SupportsPushDownRequiredColumns {

  private var keyLow: Option[String] = None
  private var keyHighExcl: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var countPushed = false
  private var required: StructType = DatastoreSource.schema

  /** Column pruning — the reference's own keys-only trick
    * (`datastore_service.py:30`) generalized: a scan that never reads
    * the `json` column (e.g. `select("id")`, or a filtered count where
    * only the key survives pruning) issues keys-only queries, so the
    * server ships key path elements instead of full entity payloads —
    * at 100 TB that's the difference between a metadata scan and
    * reading the corpus. */
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed: Boolean = true

  /** S8 at scale — COMPLETE COUNT(*) pushdown: `df.count()` compiles
    * to one server-side `runAggregationQuery` instead of scanning and
    * shipping every entity. Only the bare global count is eligible
    * (no grouping; and Spark itself only pushes aggregates when no
    * post-scan filters remain, which for this source means an
    * unfiltered scan since all filters are re-checked). */
  private def isBareCountStar(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]

  override def supportCompletePushDown(agg: Aggregation): Boolean = isBareCountStar(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    countPushed = isBareCountStar(agg)
    countPushed
  }

  /** Key-range pushdown in TRUE service order (DatastoreKeys): EqualTo
    * becomes the exact point range [v, successor(v)) — numeric for id
    * keys — and inequality bounds are only accepted where lexicographic
    * (Spark) and service order provably agree. ALL filters are returned
    * for Spark to re-evaluate: string promotion cannot distinguish an
    * id key from an all-digit NAME key, so the server range is treated
    * as advisory pruning, never as the final filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, _, low, high) = KeyRangePush.intersect(filters, Set("id"),
      DatastoreKeys.successor, DatastoreKeys.ordering, DatastoreKeys.inequalityBoundSound)
    keyLow = low; keyHighExcl = high; pushed = accepted
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (countPushed)
      new DatastoreCountScan(url, projectId, kind, authToken, keyLow, keyHighExcl)
    else
      new DatastoreScan(url, projectId, kind, numPartitions, pageSize, authToken,
        keyLow, keyHighExcl, limit, required)
}

/** The completely-pushed COUNT(*) scan: one partition, one aggregation
  * request, one row. */
class DatastoreCountScan(url: String, projectId: String, kind: String,
                         authToken: Option[String],
                         keyLow: Option[String], keyHighExcl: Option[String])
  extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("COUNT(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(DatastoreCountPartition(url, projectId, kind, keyLow, keyHighExcl, authToken))
  override def createReaderFactory(): PartitionReaderFactory = DatastoreCountReaderFactory
}

case class DatastoreCountPartition(url: String, projectId: String, kind: String,
                                   fromKey: Option[String], toKeyExcl: Option[String],
                                   authToken: Option[String]) extends InputPartition

object DatastoreCountReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DatastoreCountPartition]
    new PartitionReader[InternalRow] {
      private lazy val count: Long = {
        val client = new DatastoreRestClient(p.url, p.projectId, p.authToken)
        try client.countAggregate(p.kind, p.fromKey, p.toKeyExcl)
        catch {
          // Backend without :runAggregationQuery (400/404/501 only —
          // auth failures like 401/403 must FAIL, not silently degrade
          // into a slow scan): keep count() working via the keys-only
          // scan it used before. Degraded path: cursor-pages every key
          // of the kind through this one reader — O(|kind| / pageSize)
          // round trips — so it logs loudly.
          case e: HttpStatusException if e.code == 400 || e.code == 404 || e.code == 501 =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"runAggregationQuery unsupported (${e.code}); degrading count(${p.kind}) " +
                "to a single-reader keys-only scan", e)
            client.runQuery(p.kind, p.fromKey, p.toKeyExcl, keysOnly = true).size.toLong
        }
      }
      private var consumed = false
      override def next(): Boolean =
        if (consumed) false else { consumed = true; true }
      override def get(): InternalRow = InternalRow(count)
      override def close(): Unit = ()
    }
  }
}

class DatastoreScan(url: String, projectId: String, kind: String,
                    numPartitions: Int, pageSize: Int, authToken: Option[String],
                    keyLow: Option[String], keyHighExcl: Option[String],
                    limit: Option[Int],
                    required: StructType = DatastoreSource.schema)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Split the key space. Scale properties:
    *
    *  - Planning costs ONE bounded keys-only request ordered by the
    *    reserved `__scatter__` property (the public Beam-connector
    *    technique) — O(numPartitions) driver memory and round trips no
    *    matter how many keys the kind has. A pushed key range can't be
    *    combined with `__scatter__` order (Datastore requires the
    *    first sort property to match the inequality property), so the
    *    whole-kind sample is filtered to the range client-side.
    *    Because partitions TILE the remaining key space around the
    *    sampled bounds, a biased, partial, or empty-in-range sample
    *    only costs balance, never rows.
    *  - `numPartitions <= 1` (the documented setting for kinds mixing
    *    all-digit names with numeric ids) plans a single range
    *    partition with NO planning request at all.
    *  - Enumeration (lazy page stream into a one-pass stride sample)
    *    survives only as the fallback when the sample comes back empty
    *    — an empty kind (yields zero partitions) or a backend without
    *    `__scatter__` support.
    *  - Split points are sorted/encoded in TRUE service order
    *    (DatastoreKeys.ordering — ids numerically before names).
    *    Sorting promoted keys lexicographically here silently
    *    loses/duplicates rows on numeric-id kinds: with ids 9..12 and
    *    2 partitions, string bounds ("10", "12") put id 9 in no
    *    partition.
    *
    * Memoized: Spark calls planInputPartitions once per planning pass
    * (typically twice per action); the sample request is paid once. */
  override def planInputPartitions(): Array[InputPartition] = computedPartitions
  private lazy val computedPartitions: Array[InputPartition] = computePartitions()
  private def computePartitions(): Array[InputPartition] = {
    val ord = DatastoreKeys.ordering
    val fields = required.fieldNames.toSeq
    def partition(from: Option[String], to: Option[String]) =
      DatastoreRangePartition(url, projectId, kind, from, to, pageSize,
        authToken, limit, fields): InputPartition
    if (numPartitions <= 1) return Array(partition(keyLow, keyHighExcl))
    val client = new DatastoreRestClient(url, projectId, authToken)
    val sample =
      // no __scatter__ support only (400/404/501); auth failures
      // (401/403) must FAIL here, not silently degrade into the
      // full-enumeration fallback — same contract as the count path
      try client.scatterSample(kind, RangePlanner.SamplesPerSplit * numPartitions)
      catch {
        case e: HttpStatusException if e.code == 400 || e.code == 404 || e.code == 501 =>
          Seq.empty
      }
    val inRange = sample.filter(k =>
      keyLow.forall(ord.gt(k, _)) && keyHighExcl.forall(ord.lt(k, _)))
    val bounds: Seq[String] =
      if (inRange.nonEmpty) {
        RangePlanner.pickBounds(inRange.sorted(ord).toIndexedSeq, numPartitions)
      } else if (sample.nonEmpty) {
        Nil // range holds few keys: one partition, still zero extra requests
      } else {
        val keyIt = client.runQuery(kind, keyLow, keyHighExcl, pageSize, keysOnly = true)
          .map(_._1)
        val (count, bs) = RangePlanner.splitBounds(keyIt, numPartitions, ord)
        if (count == 0L) return Array.empty
        bs
      }
    val froms = keyLow +: bounds.map(Some(_))
    val tos = bounds.map(Some(_)) :+ keyHighExcl
    froms.lazyZip(tos).map { case (from, to) => partition(from, to) }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = DatastoreReaderFactory
}

case class DatastoreRangePartition(url: String, projectId: String, kind: String,
                                   fromKey: Option[String], toKeyExcl: Option[String],
                                   pageSize: Int, authToken: Option[String],
                                   limit: Option[Int],
                                   fields: Seq[String]) extends InputPartition

object DatastoreReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DatastoreRangePartition]
    new PartitionReader[InternalRow] {
      // json pruned away => keys-only query: the server ships key path
      // elements, never entity payloads
      private val keysOnly = !p.fields.contains("json")
      private val it0 = new DatastoreRestClient(p.url, p.projectId, p.authToken)
        .runQuery(p.kind, p.fromKey, p.toKeyExcl, p.pageSize, keysOnly)
      private val it = p.limit.fold(it0)(it0.take)
      private var cur: (String, String) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }
      override def get(): InternalRow = InternalRow(p.fields.map {
        case "id" => UTF8String.fromString(cur._1)
        case "json" => UTF8String.fromString(cur._2)
      }: _*)
      override def close(): Unit = ()
    }
  }
}
