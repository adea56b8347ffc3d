package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.sources.RtdbRestClient

/** Live-transport plumbing for the S1/S2 scan path: a localhost stub
  * implements the public RTDB REST semantics (shallow, orderBy=$key,
  * startAt/endAt inclusive, limitToFirst) and the client is checked for
  * param construction, keyset paging, retry, and DSv2 integration. */
class RtdbRestSpec extends SparkSpec {

  // 25 users plus one scalar child (P4: non-dict rows are skipped)
  private val data: Seq[(String, String)] =
    (1 to 25).map(i => f"u$i%02d" -> f"""{"email":"u$i@x.com","n":$i}""") :+
      ("zzz-scalar" -> "\"not-a-dict\"")
  private val sorted = data.sortBy(_._1)

  // a numerically-keyed path — RTDB orders integer-parseable keys
  // numerically, FIRST, so lexicographic keyset paging is unsound here
  private val numericData: Seq[(String, String)] =
    Seq("-5", "9", "10", "11", "12").map(k => k -> s"""{"n":$k}""") :+
      ("x1" -> """{"n":99}""")
  private val numericSorted = numericData.sortBy { case (k, _) =>
    k.toIntOption.map(i => f"0$i%010d").getOrElse("1" + k) // service order
  }

  private val requests = mutable.ArrayBuffer[String]()
  private val failFirst = new AtomicInteger(0) // >0: fail next N requests with 500
  private val rateLimit = new AtomicInteger(0) // >0: 429 the next N requests
  // serve each range page's fields in REVERSED order — the service
  // makes no intra-response order promise the client may rely on
  private val scramblePages = new java.util.concurrent.atomic.AtomicBoolean(false)
  // emulator off-by-one: re-serve the key just below the NUL-successor
  // cursor at the head of every continuation page
  private val dupBoundary = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def param(q: String, k: String): Option[String] =
    Option(q).toSeq.flatMap(_.split("&")).collectFirst {
      case kv if kv.startsWith(k + "=") =>
        java.net.URLDecoder.decode(kv.drop(k.length + 1), "UTF-8")
    }
  // real Firebase JSON-decodes the param (so the \\u0000 escape becomes a NUL);
  // the stub must do the same or successor-key paging breaks
  private val pmapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def unquote(s: String): String = pmapper.readTree(s).asText

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getRawQuery
      requests.synchronized { requests += ex.getRequestURI.toString }
      if (failFirst.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else if (rateLimit.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(429, -1); ex.close()
      } else {
        // the /Numeric path serves the numerically-keyed dataset in
        // true service order; all other paths serve the string-keyed one
        val path = ex.getRequestURI.getPath
        val ds = if (path.startsWith("/Numeric")) numericSorted else sorted
        val body: String =
          if (path.startsWith("/Empty"))
            "null" // real RTDB: a path with no data serves literal null
          else if (path.startsWith("/Stuck"))
            // a broken pager that ignores startAt entirely
            """{"s01": {"n": 1}}"""
          else if (param(q, "shallow").contains("true"))
            ds.map { case (k, _) => s""""$k": true""" }.mkString("{", ",", "}")
          else {
            val from = param(q, "startAt").map(unquote)
            val to = param(q, "endAt").map(unquote)
            val limit = param(q, "limitToFirst").map(_.toInt).getOrElse(Int.MaxValue)
            val limitLast = param(q, "limitToLast").map(_.toInt)
            // NOTE: range comparison here stays in the dataset's serve
            // order; for /Numeric, paged range reads never happen (the
            // planner must fall back to one unpaged fetch)
            val inRange = ds.filter { case (k, _) =>
              from.forall(k >= _) && to.forall(k <= _) }
            val page0 = limitLast.fold(inRange.take(limit))(n => inRange.takeRight(n))
            val page =
              if (dupBoundary.get && from.exists(_.endsWith("" + Char.MinValue)))
                ds.filter(_._1 == from.get.dropRight(1)) ++ page0.take(limit - 1)
              else page0
            (if (scramblePages.get) page.reverse else page)
              .map { case (k, v) => s""""$k": $v""" }.mkString("{", ",", "}")
          }
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    s.start()
    s
  }
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  test("buildUrl quotes and URL-encodes range params, appends auth token") {
    val c = new RtdbRestClient("http://h/", authToken = Some("tok"))
    val url = c.buildUrl("/Users", Seq("orderBy" -> "\"$key\"", "startAt" -> "\"a b\""))
    assert(url == "http://h/Users.json?orderBy=%22%24key%22&startAt=%22a+b%22&auth=tok")
  }

  test("shallowKeys lists sorted keys and retries past a transient 500") {
    failFirst.set(1)
    val keys = new RtdbRestClient(base, backoffMs = 1).shallowKeys("Users")
    assert(keys == sorted.map(_._1))
  }

  test("fetchRange pages by successor keyset, honors strict bound, skips scalars") {
    requests.synchronized(requests.clear())
    val rows = new RtdbRestClient(base).fetchRange("Users", Some("u00"), Some("u20"), pageSize = 10).toSeq
    assert(rows.map(_._1) == (1 to 19).map(i => f"u$i%02d"))
    assert(rows.forall { case (k, v) => v.contains("\"email\"") })
    val paged = requests.synchronized(requests.toList)
    assert(paged.size >= 2, s"expected keyset paging, got $paged")
    // page 2 starts at the JSON-escaped NUL successor of the last key
    assert(paged.tail.exists(_.contains("startAt=%22u10%5Cu0000%22")),
      s"page 2 resumes past last key: $paged")
  }

  test("pageSize=1 still pages through the whole range") {
    val rows = new RtdbRestClient(base).fetchRange("Users", Some("u00"), Some("u04"), pageSize = 1).toSeq
    assert(rows.map(_._1) == Seq("u01", "u02", "u03"))
  }

  test("lazy paging: a small take() stops issuing page requests") {
    requests.synchronized(requests.clear())
    val first = new RtdbRestClient(base).fetchRange("Users", Some("u00"), None, pageSize = 5).take(3).toSeq
    assert(first.map(_._1) == Seq("u01", "u02", "u03"))
    assert(requests.synchronized(requests.size) == 1, "take(3) must fetch one page of 5")
  }

  test("cross-transport equivalence: file parse and REST fetch yield identical rows") {
    val dir = new java.io.File(graft.util.Scratch.dir("rtdbxt"))
    val f = new java.io.File(dir, "export.json")
    java.nio.file.Files.writeString(f.toPath,
      data.map { case (k, v) => s""""$k": $v""" }.mkString("{", ",", "}"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(2))).toSet
    val viaFile = spark.read.format("graft.sources.RtdbSnapshotSource")
      .option("path", f.getAbsolutePath).option("numPartitions", "3").load()
    val viaRest = spark.read.format("graft.sources.RtdbSnapshotSource")
      .option("path", "Users").option("url", base)
      .option("numPartitions", "3").option("pageSize", "6").load()
    assert(rows(viaFile) == rows(viaRest), "two transports, one result")
    assert(rows(viaFile).size == 25)
  }

  test("DSv2 url mode: probe-planned REST scan matches snapshot, never lists keys") {
    requests.synchronized(requests.clear())
    val df = spark.read.format("graft.sources.RtdbSnapshotSource")
      .option("path", "Users").option("url", base)
      .option("numPartitions", "4").option("pageSize", "7").load()
    assert(df.count() == 25) // scalar child skipped
    assert(df.rdd.getNumPartitions == 4,
      "keyset-probe bisection must find numPartitions-1 split bounds here")
    // the r7 scale gap, closed: planning works on trees whose key
    // listing exceeds one response, because it never requests one
    assert(!requests.synchronized(requests.toList).exists(_.contains("shallow")),
      "probe planning must never issue the unpaginated shallow listing")
    val one = df.filter(col("id") === "u07").collect()
    assert(one.length == 1 && one(0).getAs[String]("json").contains("u7@x.com"))
  }

  test("explicit splitPoints shard the scan without any key enumeration") {
    // the scale lever for trees whose unpaginated shallow listing is
    // itself too big: caller-provided bounds, zero enumeration calls
    requests.synchronized(requests.clear())
    val df = spark.read.format("graft.sources.RtdbSnapshotSource")
      .option("path", "Users").option("url", base)
      .option("numPartitions", "4").option("pageSize", "7")
      .option("splitPoints", "u08,u16").load()
    assert(df.count() == 25)
    assert(df.rdd.getNumPartitions == 3, "2 split points -> 3 range partitions")
    assert(!requests.synchronized(requests.toList).exists(_.contains("shallow")),
      "split points must skip the shallow key listing")
    // pushed key range intersects the provided bounds (point lookup
    // collapses to one partition)
    assert(df.filter(col("id") === "u07").count() == 1)
  }

  test("429 burst: client backs off through rate limiting and completes") {
    requests.synchronized(requests.clear())
    rateLimit.set(2)
    val rows = new RtdbRestClient(base, backoffMs = 1)
      .fetchRange("Users", None, None, pageSize = 50).toSeq
    assert(rows.size == 25, "the burst must not lose rows")
    assert(requests.synchronized(requests.size) == 3,
      s"2 rate-limited attempts + 1 success, got ${requests.synchronized(requests.size)}")
  }

  test("out-of-order page payloads: client re-sorts, keyset paging stays exact") {
    // JSON object field order is no contract — a page served in any
    // order must neither lose rows nor break the successor cursor
    scramblePages.set(true)
    try {
      val rows = new RtdbRestClient(base)
        .fetchRange("Users", Some("u00"), Some("u20"), pageSize = 7).toSeq
      assert(rows.map(_._1) == (1 to 19).map(i => f"u$i%02d"),
        "scrambled pages must still yield the exact sorted range")
    } finally scramblePages.set(false)
  }

  test("duplicate key across pages: boundary re-serves are dropped, no row lost") {
    // Datastore-parity conformance: a pager with an off-by-one cursor
    // (emulator treating the NUL successor as at-or-BEFORE) re-serves
    // the page-boundary key; the client must neither duplicate nor
    // lose rows, and still terminate
    dupBoundary.set(true)
    try {
      val rows = new RtdbRestClient(base)
        .fetchRange("Users", Some("u00"), Some("u20"), pageSize = 7).toSeq
      assert(rows.map(_._1) == (1 to 19).map(i => f"u$i%02d"),
        s"boundary re-serves must be invisible: ${rows.map(_._1)}")
    } finally dupBoundary.set(false)
  }

  test("empty path: RTDB's literal-null body yields an empty iterator in one request") {
    requests.synchronized(requests.clear())
    val rows = new RtdbRestClient(base).fetchRange("Empty", None, None, pageSize = 5).toSeq
    assert(rows.isEmpty)
    assert(requests.synchronized(requests.size) == 1,
      "an empty page must terminate paging immediately")
  }

  test("cursor-ignoring server: pager fails loudly instead of looping forever") {
    // pageSize=1 keeps every page 'full', so only the no-progress guard
    // stands between the client and an infinite request loop
    val it = new RtdbRestClient(base).fetchRange("Stuck", None, None, pageSize = 1)
    intercept[IllegalStateException] { it.toSeq }
  }

  test("numeric child keys: planner falls back to one complete unpaged fetch") {
    // RTDB serves integer-parseable keys in NUMERIC order, so the
    // lexicographic keyset successor would skip keys ("9"+NUL pages
    // past "10".."12"); the guard must return the complete row set
    requests.synchronized(requests.clear())
    val df = spark.read.format("graft.sources.RtdbSnapshotSource")
      .option("path", "Numeric").option("url", base)
      .option("numPartitions", "4").option("pageSize", "2").load()
    val ids = df.select("id").collect().map(_.getString(0)).toSeq
    // "-5" is integer-parseable (not all-digit) and MUST trigger the
    // guard too: RTDB's numeric rule covers negative keys
    assert(ids.toSet == Set("-5", "9", "10", "11", "12", "x1"), s"row loss: $ids")
    assert(ids.size == 6, s"duplication: $ids")
    assert(df.rdd.getNumPartitions == 1, "numeric keys must disable keyset-paged sharding")
    assert(!requests.synchronized(requests.toList).exists(_.contains("startAt")),
      "fallback must not issue lexicographic range reads")
    // pushed key range still correct — re-applied client-side in
    // Spark's lexicographic semantics
    assert(df.filter(col("id") === "10").count() == 1)
  }
}
