package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal Firebase RTDB REST client — the live-service half of the
  * S1/S2 scan path. The reference reads `/Users` through the Admin SDK
  * (`firebase_service.py:110-218`), which fronts exactly this public
  * REST surface:
  *
  *   GET <base>/<path>.json?shallow=true                    — key listing
  *   GET <base>/<path>.json?orderBy="$key"&startAt="a"&endAt="b"&limitToFirst=n
  *
  * `startAt`/`endAt` are inclusive and take JSON-encoded (quoted,
  * fully escaped) values; there is no server-side cursor, so
  * pagination is keyset: re-issue with `startAt` = successor of the
  * last key of the previous page (key + "\\u0000" — the smallest string
  * strictly greater, so no overlap row is ever fetched or dropped, and
  * pageSize = 1 still makes progress). Pages are fetched lazily, so a
  * downstream `take(limit)` (DSv2 limit pushdown) stops issuing
  * requests. Retry policy lives in [[Http]]. */
class RtdbRestClient(baseUrl: String, authToken: Option[String] = None,
                     maxRetries: Int = 3, backoffMs: Long = 100) extends Serializable {

  @transient private lazy val mapper = new ObjectMapper()

  /** `<base>/<path>.json?k=v&...` with URL-encoded params; the auth
    * token rides along as `auth=` like the SDK's. */
  private[graft] def buildUrl(path: String, params: Seq[(String, String)]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val qs = (params ++ authToken.map("auth" -> _))
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }
    s"${baseUrl.stripSuffix("/")}/${path.stripPrefix("/")}.json" +
      (if (qs.isEmpty) "" else qs.mkString("?", "&", ""))
  }

  private[sources] def get(url: String): String =
    Http.request(url, maxRetries = maxRetries, backoffMs = backoffMs)

  /** Key enumeration without payloads (`shallow=true` returns
    * `{key: true, ...}`) — UNPAGINATED by the service, so only sound
    * for trees whose key listing fits one response; the DSv2 planner
    * and the streaming cursor use single-key probes ([[firstKeyAt]] /
    * [[lastKey]]) instead. Sorted in code-point order, the one key
    * order this codebase uses (a UTF-16 `.sorted` disagrees above
    * U+FFFF). */
  def shallowKeys(path: String): Seq[String] = {
    val root = mapper.readTree(get(buildUrl(path, Seq("shallow" -> "true"))))
    if (root == null || !root.isObject) Seq.empty
    else root.fieldNames().asScala.toSeq.sorted(RangePlanner.utf8Order)
  }

  /** Single-key keyset probe: the first child key at or after `startAt`
    * (service key order), or the globally first key when absent. One
    * `orderBy="$key"&limitToFirst=1` request; payload cost = exactly
    * one child. The planner's bisection and the streaming guard are
    * built on this — unlike `shallow=true` it needs no full key
    * listing, so it works on trees of any size. */
  def firstKeyAt(path: String, startAt: Option[String] = None): Option[String] = {
    val params = Seq("orderBy" -> Http.jsonString("$key")) ++
      startAt.map(s => "startAt" -> Http.jsonString(s)) ++
      Seq("limitToFirst" -> "1")
    val root = mapper.readTree(get(buildUrl(path, params)))
    if (root == null || !root.isObject) None
    else root.fieldNames().asScala.minOption(RangePlanner.utf8Order)
  }

  /** Single-key probe for the LAST child key (`limitToLast=1`) — the
    * streaming high-water mark, without enumerating anything. */
  def lastKey(path: String): Option[String] = {
    val params = Seq("orderBy" -> Http.jsonString("$key"), "limitToLast" -> "1")
    val root = mapper.readTree(get(buildUrl(path, params)))
    if (root == null || !root.isObject) None
    else root.fieldNames().asScala.maxOption(RangePlanner.utf8Order)
  }

  /** Range read [from, toExclusive) as lazily-paged (key, json) rows —
    * object children only (P4). `endAt` is inclusive server-side, so
    * the strict upper bound is re-checked client-side. `from = None`
    * starts at the beginning of the path.
    *
    * ONLY SOUND FOR STRING-KEYED PATHS: the keyset successor assumes
    * the server pages keys lexicographically; RTDB orders
    * integer-parseable keys numerically first, so callers must route
    * numerically-keyed paths to [[fetchAll]] instead (the DSv2 planner
    * does — see RtdbScan.planInputPartitions). */
  def fetchRange(path: String, from: Option[String], toExclusive: Option[String],
                 pageSize: Int = 1000): Iterator[(String, String)] =
    new Iterator[(String, String)] {
      private var buf: Iterator[(String, String)] = Iterator.empty
      private var start = from
      private var exhausted = false

      private def fetchPage(): Unit = {
        val params = Seq("orderBy" -> Http.jsonString("$key")) ++
          start.map(s => "startAt" -> Http.jsonString(s)) ++
          Seq("limitToFirst" -> pageSize.toString) ++
          toExclusive.map(t => "endAt" -> Http.jsonString(t))
        val root = mapper.readTree(get(buildUrl(path, params)))
        // all key comparisons in CODE-POINT order (= the server's and
        // Spark's UTF8String order), never UTF-16 String order
        val ord = RangePlanner.utf8Order
        val fields: Seq[(String, JsonNode)] =
          if (root == null || !root.isObject) Seq.empty
          else root.properties().asScala.map(e => e.getKey -> e.getValue).toSeq
            .sortBy(_._1)(ord)
        // conformance guard: a nonconforming pager (emulator off-by-one
        // on the NUL-successor cursor) may re-serve keys before the
        // cursor; dropping them here keeps the stream duplicate-free
        // without trusting the server's startAt handling
        val atOrAfter = fields.filter { case (k, _) =>
          start.forall(s => ord.gteq(k, s)) }
        val kept = atOrAfter.filter { case (k, _) => toExclusive.forall(ord.lt(k, _)) }
        buf = kept.collect { case (k, v) if v.isObject => k -> v.toString }.iterator
        // done when the server ran dry or the strict bound was crossed
        // (fields, not atOrAfter: re-served keys consumed limit slots)
        if (fields.size < pageSize || kept.size < atOrAfter.size) exhausted = true
        else {
          val next = fields.last._1 + Char.MinValue
          // a full page that moves the cursor nowhere would loop
          // forever — fail loudly instead (server ignores startAt)
          if (start.exists(s => ord.gteq(s, next)))
            throw new IllegalStateException(
              s"keyset pager made no progress at startAt=$start on $path — " +
                "server is not honoring the cursor")
          start = Some(next)
        }
      }

      private def refill(): Unit = while (!buf.hasNext && !exhausted) fetchPage()
      override def hasNext: Boolean = { refill(); buf.hasNext }
      override def next(): (String, String) = { refill(); buf.next() }
    }

  /** Complete unpaged fetch of `path` — one GET of the whole subtree,
    * object children only (P4), sorted by code-point key order (the
    * one key order this codebase uses — RangePlanner.utf8Order; Java's
    * default UTF-16 sort disagrees above U+FFFF). Memory is O(subtree);
    * the planner uses it only where keyset paging is unsound
    * (integer-like child keys, whose server order is numeric). */
  def fetchAll(path: String): Iterator[(String, String)] = {
    val root = mapper.readTree(get(buildUrl(path, Nil)))
    if (root == null || !root.isObject) Iterator.empty
    else root.properties().asScala.map(e => e.getKey -> e.getValue).toSeq
      .sortBy(_._1)(RangePlanner.utf8Order)
      .collect { case (k, v) if v.isObject => k -> v.toString }.iterator
  }
}
