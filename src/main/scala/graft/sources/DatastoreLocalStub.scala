package graft.sources

import java.net.InetSocketAddress
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Harness-local Datastore REST v1 server — the FILE TRANSPORT for
  * oracle-checking the S6 data path (`datastore_service.py:105-178`)
  * without a live service: the correctness harness loads a parquet
  * table into it, reads it back THROUGH `DatastoreSource` (partition
  * planning, key-range filters, cursor paging — the whole DSv2 path),
  * and compares against DuckDB on the same parquet.
  *
  * Implements the same contract the specs stub: cursor paging
  * (`startCursor`/`endCursor`/`moreResults`), typed `__key__` range
  * propertyFilters, and — critically — TRUE service key order: numeric
  * ids first, numerically, then names in byte order. Not a mock of the
  * library's own ordering: keys sort by their TYPED form (id vs name
  * path element), so a promotion-level ordering bug in the source
  * cannot cancel out here; it surfaces as lost/duplicated rows against
  * the DuckDB oracle.
  *
  * Not part of the production surface — only `graft.Verify`/`Bench`
  * harness queries construct one (and stop it before returning). */
object DatastoreLocalStub {

  private val mapper = new ObjectMapper()
  private val servers = scala.collection.mutable.Map[String, HttpServer]()

  /** Typed service sort key: ids (zero-padded int64, prefix "0") before
    * names (prefix "1"), so plain string compare is service order.
    * Uses the connector's own id test (ASCII digits only) so the stub
    * classifies promoted keys exactly like the code under test —
    * independence comes from the DuckDB oracle compare, not from a
    * second id heuristic that could silently diverge. */
  private def sortKey(promoted: String): String =
    if (DatastoreKeys.isId(promoted)) f"0${BigInt(promoted)}%019d"
    else "1" + promoted

  /** `__scatter__` emulation: deterministic pseudo-random order (the
    * real reserved property is a uniform hash of the key). */
  private def scatterKey(promoted: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(sortKey(promoted).getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Start a localhost server holding `rows` of `kind` as
    * (promoted key, properties-json) entities; returns the base URL for
    * `DatastoreSource`'s `url` option. Caller must [[stop]] it. */
  def serve(kind: String, rows: Seq[(String, String)]): String = synchronized {
    val ordered = rows.sortBy { case (k, _) => sortKey(k) }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val isAgg = ex.getRequestURI.getPath.endsWith(":runAggregationQuery")
      val q =
        if (isAgg) mapper.readTree(body).path("aggregationQuery").path("nestedQuery")
        else mapper.readTree(body).path("query")
      val qKind = q.path("kind").get(0).path("name").asText
      val limit = if (q.has("limit")) q.get("limit").asInt else Int.MaxValue
      val start = Option(q.path("startCursor").asText(null))
        .map(_.stripPrefix("c").toInt).getOrElse(0)
      // typed __key__ bounds (single filter or AND-composite)
      var lo: Option[String] = None
      var hi: Option[String] = None
      val f = q.path("filter")
      val raw = if (f.has("compositeFilter"))
        f.path("compositeFilter").path("filters").elements()
      else java.util.List.of(f).iterator()
      raw.forEachRemaining { fn =>
        val pf = fn.path("propertyFilter")
        if (pf.path("property").path("name").asText == "__key__") {
          val el = pf.path("value").path("keyValue").path("path").get(0)
          val v = if (el.hasNonNull("id")) f"0${el.get("id").asLong}%019d"
                  else "1" + el.path("name").asText
          pf.path("op").asText match {
            case "GREATER_THAN_OR_EQUAL" => lo = Some(v)
            case "LESS_THAN" => hi = Some(v)
            case _ => ()
          }
        }
      }
      val scatter = {
        val it = q.path("order").elements()
        var found = false
        it.forEachRemaining(o =>
          if (o.path("property").path("name").asText == "__scatter__") found = true)
        found
      }
      val inRange =
        if (qKind != kind) Seq.empty
        else ordered.filter { case (k, _) =>
          val sk = sortKey(k)
          lo.forall(sk >= _) && hi.forall(sk < _)
        }
      val matching =
        if (scatter) inRange.sortBy { case (k, _) => scatterKey(k) } else inRange
      val page = matching.slice(start, start + limit)
      val results = page.map { case (k, props) =>
        val keyPart =
          if (DatastoreKeys.isId(k)) s""""id":"$k""""
          else s""""name":${mapper.writeValueAsString(k)}"""
        s"""{"entity":{"key":{"path":[{"kind":"$kind",$keyPart}]},"properties":$props}}"""
      }.mkString("[", ",", "]")
      val more = if (start + page.size < matching.size) "NOT_FINISHED" else "NO_MORE_RESULTS"
      val resp =
        if (isAgg)
          s"""{"batch":{"aggregationResults":[{"aggregateProperties":{"n":{"integerValue":"${matching.size}"}}}]}}"""
        else
          s"""{"batch":{"entityResults":$results,"endCursor":"c${start + page.size}","moreResults":"$more"}}"""
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}"
    servers(url) = server
    url
  }

  def stop(url: String): Unit = synchronized {
    servers.remove(url).foreach(_.stop(0))
  }
}
