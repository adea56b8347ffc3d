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
  * `startAt`/`endAt` are inclusive and take JSON-encoded (quoted)
  * values; there is no server-side cursor, so pagination is keyset:
  * re-issue with `startAt` = last key of the previous page and drop the
  * overlapping first row. Pages are fetched lazily, so a downstream
  * `take(limit)` (DSv2 limit pushdown) stops issuing requests.
  *
  * GETs are idempotent, so 5xx and transport errors retry with
  * exponential backoff up to `maxRetries`; 4xx fails fast (a bad token
  * or path never heals by retrying).
  */
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

  /** JSON-encode a string for startAt/endAt/orderBy (the API rejects
    * unquoted values). */
  private def jstr(s: String): String = "\"" + s + "\""

  private[sources] def get(url: String): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRetries) {
      try {
        val conn = new java.net.URI(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try {
          conn.setConnectTimeout(10000)
          conn.setReadTimeout(60000)
          val code = conn.getResponseCode
          if (code == 200) {
            val in = conn.getInputStream
            try return new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
            finally in.close()
          } else if (code >= 500) throw new java.io.IOException(s"HTTP $code from $url")
          else throw new IllegalArgumentException(s"HTTP $code from $url (not retryable)")
        } finally conn.disconnect()
      } catch {
        case e: java.io.IOException =>
          last = e
          Thread.sleep(backoffMs << attempt)
          attempt += 1
      }
    }
    throw new java.io.IOException(s"GET failed after ${maxRetries + 1} attempts", last)
  }

  /** Key enumeration without payloads (`shallow=true` returns
    * `{key: true, ...}`). */
  def shallowKeys(path: String): Seq[String] = {
    val root = mapper.readTree(get(buildUrl(path, Seq("shallow" -> "true"))))
    if (root == null || !root.isObject) Seq.empty
    else root.fieldNames().asScala.toSeq.sorted
  }

  /** Range read [from, toExclusive) as lazily-paged (key, json) rows —
    * object children only (P4). `endAt` is inclusive server-side, so
    * the strict upper bound is re-checked client-side. */
  def fetchRange(path: String, from: String, toExclusive: Option[String],
                 pageSize: Int = 1000): Iterator[(String, String)] =
    new Iterator[(String, String)] {
      private var buf: Iterator[(String, String)] = Iterator.empty
      private var start = from
      private var dropFirst = false
      private var exhausted = false

      private def fetchPage(): Unit = {
        val params = Seq(
          "orderBy" -> jstr("$key"),
          "startAt" -> jstr(start),
          "limitToFirst" -> pageSize.toString) ++
          toExclusive.map("endAt" -> jstr(_))
        val root = mapper.readTree(get(buildUrl(path, params)))
        val fields: Seq[(String, JsonNode)] =
          if (root == null || !root.isObject) Seq.empty
          else root.fields().asScala.map(e => e.getKey -> e.getValue).toSeq.sortBy(_._1)
        val page = if (dropFirst) fields.filterNot(_._1 == start) else fields
        val kept = page.filter { case (k, _) => toExclusive.forall(k < _) }
        buf = kept.collect { case (k, v) if v.isObject => k -> v.toString }.iterator
        // done when the server ran dry, the strict bound was crossed, or
        // the page held only the overlap row (guards pageSize=1 loops)
        if (fields.size < pageSize || kept.size < page.size || page.isEmpty) exhausted = true
        else { start = fields.last._1; dropFirst = true }
      }

      private def refill(): Unit = while (!buf.hasNext && !exhausted) fetchPage()
      override def hasNext: Boolean = { refill(); buf.hasNext }
      override def next(): (String, String) = { refill(); buf.next() }
    }
}
