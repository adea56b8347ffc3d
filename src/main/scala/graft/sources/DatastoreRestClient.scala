package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Minimal Cloud Datastore REST v1 client — the live-service half of
  * the S6/S7 scan path. The reference pages `query.fetch(limit=1000,
  * start_cursor=...)` through the SDK (`datastore_service.py:105-178`),
  * which fronts this public surface:
  *
  *   POST <base>/v1/projects/<project>:runQuery
  *     {"query": {"kind":[{"name":k}], "limit":n, "startCursor":c,
  *                "filter": {...on __key__...}}}
  *   →  {"batch": {"entityResults":[{"entity":{"key":...,"properties":...}}],
  *                 "endCursor":c', "moreResults":"NOT_FINISHED"|...}}
  *
  * Pagination is cursor-based (opaque `endCursor` resumes the scan;
  * the reference's 1000/page loop at `datastore_service.py:121-160`).
  * Pages are fetched lazily so DSv2 limit pushdown stops issuing
  * requests. Kind discovery (S7, `datastore_service.py:56-72`) queries
  * the `__kind__` pseudo-kind. Key promotion mirrors the reference:
  * `key.name`, else stringified `key.id` (`datastore_service.py:
  * 140-147`). POSTs here are read-only queries, so 5xx/transport
  * errors retry with backoff like the RTDB GETs; 4xx fails fast. */
class DatastoreRestClient(baseUrl: String, projectId: String,
                          authToken: Option[String] = None,
                          maxRetries: Int = 3, backoffMs: Long = 100) extends Serializable {

  @transient private lazy val mapper = new ObjectMapper()

  private[graft] def queryUrl: String =
    s"${baseUrl.stripSuffix("/")}/v1/projects/$projectId:runQuery"

  private[graft] def post(url: String, body: String): String =
    Http.request(url, "POST", Some(body),
      Seq("Content-Type" -> "application/json") ++
        authToken.map(t => "Authorization" -> s"Bearer $t"),
      maxRetries, backoffMs)

  /** Key promotion from an entity key's last path element: name, else
    * stringified numeric id (the reference's fallback chain). */
  private def keyOf(entity: JsonNode): Option[String] = {
    val path = entity.path("key").path("path")
    if (!path.isArray || path.size == 0) None
    else {
      val last = path.get(path.size - 1)
      if (last.hasNonNull("name")) Some(last.get("name").asText)
      else if (last.hasNonNull("id")) Some(last.get("id").asText)
      else None
    }
  }

  /** The shared query node: kind + typed `__key__` range filters —
    * reused by runQuery (with paging decoration) and as the
    * nestedQuery of aggregation requests. */
  private def queryNode(kind: String, fromKey: Option[String],
                        toKeyExcl: Option[String]): ObjectNode = {
    val q = mapper.createObjectNode()
    q.putArray("kind").addObject().put("name", kind)
    // A promoted key that is all digits came from a numeric-id key
    // (keyOf stringifies ids), so the bound must be encoded as an `id`
    // path element — a `name` key "12345" is a DIFFERENT key in
    // Datastore (all id keys sort before all name keys). The residual
    // ambiguity (a name key that happens to be all digits) is inherent
    // to string-promoted keys; kinds mixing numeric names with id keys
    // should read without pushdown.
    def keyFilter(op: String, v: String): ObjectNode = {
      val f = mapper.createObjectNode()
      val pf = f.putObject("propertyFilter")
      pf.putObject("property").put("name", "__key__")
      pf.put("op", op)
      val pathEl = pf.putObject("value").putObject("keyValue").putArray("path")
        .addObject().put("kind", kind)
      if (DatastoreKeys.isId(v)) pathEl.put("id", v)
      else pathEl.put("name", v)
      f
    }
    val filters = fromKey.map(keyFilter("GREATER_THAN_OR_EQUAL", _)).toSeq ++
      toKeyExcl.map(keyFilter("LESS_THAN", _))
    if (filters.size == 1) q.set[ObjectNode]("filter", filters.head)
    else if (filters.size > 1) {
      val cf = q.putObject("filter").putObject("compositeFilter")
      cf.put("op", "AND")
      val arr = cf.putArray("filters")
      filters.foreach(arr.add)
    }
    q
  }

  private def queryBody(kind: String, pageSize: Int, cursor: Option[String],
                        fromKey: Option[String], toKeyExcl: Option[String],
                        keysOnly: Boolean, orderBy: Option[String] = None): String = {
    val root = mapper.createObjectNode()
    val q = queryNode(kind, fromKey, toKeyExcl)
    root.set[ObjectNode]("query", q)
    q.put("limit", pageSize)
    cursor.foreach(q.put("startCursor", _))
    if (keysOnly) q.putArray("projection").addObject()
      .putObject("property").put("name", "__key__")
    orderBy.foreach(o => q.putArray("order").addObject()
      .putObject("property").put("name", o))
    mapper.writeValueAsString(root)
  }

  private[graft] def aggregationUrl: String =
    s"${baseUrl.stripSuffix("/")}/v1/projects/$projectId:runAggregationQuery"

  /** Server-side COUNT via the public aggregation surface
    * (`POST :runAggregationQuery`, `{"aggregationQuery": {"nestedQuery":
    * ..., "aggregations":[{"alias":"n","count":{}}]}}`) — the scale
    * path for S8: one request instead of keys-paging the whole kind.
    * The nested query carries the same typed key-range filters as a
    * scan, so pushed ranges count server-side too. */
  def countAggregate(kind: String, fromKey: Option[String] = None,
                     toKeyExcl: Option[String] = None): Long = {
    val root = mapper.createObjectNode()
    val aq = root.putObject("aggregationQuery")
    aq.set[ObjectNode]("nestedQuery", queryNode(kind, fromKey, toKeyExcl))
    val agg = aq.putArray("aggregations").addObject()
    agg.put("alias", "n")
    agg.putObject("count")
    val resp = mapper.readTree(post(aggregationUrl, mapper.writeValueAsString(root)))
    val v = resp.path("batch").path("aggregationResults").path(0)
      .path("aggregateProperties").path("n").path("integerValue")
    // a missing value must FAIL, not read as 0 — a silent zero count
    // tells downstream "nothing to process" about real data
    if (v.isMissingNode || v.isNull) throw new java.io.IOException(
      s"malformed runAggregationQuery response (no aggregate value): " +
        resp.toString.take(200))
    v.asText.toLong
  }

  /** Cursor-paged entity scan of `kind`, optionally bounded to the key
    * range [fromKey, toKeyExcl) — lazily fetched (key, properties-json)
    * rows; entities without a usable key are skipped. */
  def runQuery(kind: String, fromKey: Option[String] = None,
               toKeyExcl: Option[String] = None, pageSize: Int = 1000,
               keysOnly: Boolean = false): Iterator[(String, String)] =
    new Iterator[(String, String)] {
      private var buf: Iterator[(String, String)] = Iterator.empty
      private var cursor: Option[String] = None
      private var exhausted = false

      private def fetchPage(): Unit = {
        val resp = mapper.readTree(post(queryUrl,
          queryBody(kind, pageSize, cursor, fromKey, toKeyExcl, keysOnly)))
        val batch = resp.path("batch")
        val results = batch.path("entityResults")
        val rows =
          if (!results.isArray) Seq.empty
          else results.elements().asScala.toSeq.flatMap { er =>
            val entity = er.path("entity")
            keyOf(entity).map(_ -> entity.path("properties").toString)
          }
        buf = rows.iterator
        // Termination follows moreResults, NOT row count: a time-sliced
        // scan can legally return an empty batch with NOT_FINISHED, and
        // rows is additionally keyOf-filtered. A non-advancing cursor
        // (buggy/stub server) also terminates, so the loop can't spin.
        val more = batch.path("moreResults").asText("NO_MORE_RESULTS")
        val next = Option(batch.path("endCursor").asText(null)).filter(_.nonEmpty)
        exhausted = more == "NO_MORE_RESULTS" || next.isEmpty || next == cursor
        cursor = next
      }

      private def refill(): Unit = while (!buf.hasNext && !exhausted) fetchPage()
      override def hasNext: Boolean = { refill(); buf.hasNext }
      override def next(): (String, String) = { refill(); buf.next() }
    }

  /** Split-point sample via the reserved `__scatter__` property — the
    * public Datastore splitting technique (the Beam/Dataflow connector
    * does exactly this over the same v1 surface): one bounded keys-only
    * request ordered by `__scatter__` returns a uniform pseudo-random
    * key sample, so partition planning costs O(sampleSize) — one round
    * trip — instead of cursor-paging every key of a 100-TB kind through
    * the driver. Ordering by `__scatter__` cannot be combined with a
    * `__key__` inequality filter (Datastore requires the first sort
    * property to match the filtered property), so bounded scans filter
    * this whole-kind sample to their range client-side; enumeration
    * survives only as the empty-sample fallback
    * (DatastoreScan.computePartitions). */
  def scatterSample(kind: String, sampleSize: Int): Seq[String] = {
    val resp = mapper.readTree(post(queryUrl,
      queryBody(kind, sampleSize, None, None, None, keysOnly = true,
        orderBy = Some("__scatter__"))))
    val results = resp.path("batch").path("entityResults")
    if (!results.isArray) Seq.empty
    else results.elements().asScala.toSeq
      .flatMap(er => keyOf(er.path("entity")))
  }

  /** S7 kind discovery: the `__kind__` pseudo-kind names every kind;
    * system kinds (`__*__`) are filtered like the reference's listing. */
  def listKinds(): Seq[String] =
    runQuery("__kind__", keysOnly = true).map(_._1)
      .filterNot(_.startsWith("__")).toSeq.sorted

  /** S8 — count entities of a kind via a keys-only scan (the SDK
    * count path; keys-only batches avoid shipping payloads). */
  def countEntities(kind: String): Long =
    runQuery(kind, keysOnly = true).size.toLong
}
