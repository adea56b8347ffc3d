package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.sources.DatastoreRestClient

/** S6/S7 live-transport plumbing: a localhost stub implements the
  * Datastore REST v1 runQuery contract (cursor paging, key-range
  * propertyFilters on __key__, keys-only projection, __kind__
  * pseudo-kind) and the client + DSv2 source are checked against it.
  *
  * The stub orders keys in REAL service order — numeric-id keys first,
  * numerically, then name keys lexicographically — and types each
  * incoming bound by its path element (`id` vs `name`). A stub that
  * sorted promoted strings lexicographically would mirror the exact
  * key-ordering bug the source must not have (ids 9..12 split at
  * string bounds "10"/"12" silently drops id 9). */
class DatastoreSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  // 30 named entities + numeric-id entities 9..12 and 12345 (key
  // promotion fallback + the ordering-sensitive cluster)
  private case class Ent(kind: String, name: Option[String], id: Option[Long], props: String)
  private val numericIds = Seq(9L, 10L, 11L, 12L, 12345L)
  private val ents: Seq[Ent] =
    (1 to 30).map(i => Ent("User", Some(f"e$i%02d"), None, f"""{"email":{"stringValue":"u$i@x.com"}}""")) ++
      numericIds.map(n => Ent("User", None, Some(n), f"""{"email":{"stringValue":"n$n@x.com"}}""")) ++
      numericIds.map(n => Ent("Num", None, Some(n), "{}")) :+
      Ent("Session", Some("s1"), None, "{}") :+
      Ent("__stat__", Some("total"), None, "{}")
  private val nUsers = 35

  // Service sort key: ids (numeric, first) then names (lexicographic).
  // Independent of the library's ordering on purpose — typed, not
  // promoted-string based, so it can't share a promotion-level bug.
  private def sk(id: Option[Long], name: Option[String]): String =
    id.map(i => f"0$i%019d").getOrElse("1" + name.get)
  private def entSk(e: Ent): String = sk(e.id, e.name)

  // __scatter__ emulation: a deterministic pseudo-random total order
  // (the real reserved property is a uniform hash of the key)
  private def scatterKey(e: Ent): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(entSk(e).getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private val bodies = mutable.ArrayBuffer[String]()
  private val failNext = new AtomicInteger(0)
  private val rateLimit = new AtomicInteger(0) // >0: 429 the next N requests
  // >0: serve ONE mid-stream empty page with NOT_FINISHED and an
  // advancing epoch cursor — the time-sliced-scan shape the real
  // service can produce; termination must follow moreResults, not
  // row count
  private val emptyPageOnce = new AtomicInteger(0)
  private val scramblePages = new java.util.concurrent.atomic.AtomicBoolean(false)

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      bodies.synchronized { bodies += body }
      if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else if (rateLimit.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(429, -1); ex.close()
      } else {
        val isAgg = ex.getRequestURI.getPath.endsWith(":runAggregationQuery")
        val q =
          if (isAgg) mapper.readTree(body).path("aggregationQuery").path("nestedQuery")
          else mapper.readTree(body).path("query")
        val kind = q.path("kind").get(0).path("name").asText
        val limit = if (q.has("limit")) q.get("limit").asInt else Int.MaxValue
        // cursors: "c<pos>" (normal) or "e<pos>" (the epoch cursor an
        // empty NOT_FINISHED page advanced to) — both resume at <pos>
        val start = Option(q.path("startCursor").asText(null))
          .map(_.stripPrefix("e").stripPrefix("c").toInt).getOrElse(0)
        // collect __key__ propertyFilters (single or AND-composite) as
        // TYPED bounds in service sort-key space
        val pfs = {
          val f = q.path("filter")
          val raw = if (f.has("compositeFilter"))
            f.path("compositeFilter").path("filters").elements()
          else java.util.List.of(f).iterator()
          var lo: Option[String] = None; var hi: Option[String] = None
          raw.forEachRemaining { fn =>
            val pf = fn.path("propertyFilter")
            if (pf.path("property").path("name").asText == "__key__") {
              val el = pf.path("value").path("keyValue").path("path").get(0)
              // bound type comes from the path element: id vs name
              val v = if (el.hasNonNull("id")) sk(Some(el.get("id").asText.toLong), None)
                      else sk(None, Some(el.path("name").asText))
              pf.path("op").asText match {
                case "GREATER_THAN_OR_EQUAL" => lo = Some(v)
                case "LESS_THAN" => hi = Some(v)
                case _ => ()
              }
            }
          }
          (lo, hi)
        }
        val scatter = {
          val it = q.path("order").elements()
          var found = false
          it.forEachRemaining(o =>
            if (o.path("property").path("name").asText == "__scatter__") found = true)
          found
        }
        val matching =
          (if (kind == "__kind__") ents.map(_.kind).distinct.sorted.map(k => Ent("__kind__", Some(k), None, "{}"))
           else ents.filter(_.kind == kind))
            .sortBy(e => if (scatter) scatterKey(e) else entSk(e))
            .filter(e => pfs._1.forall(entSk(e) >= _) && pfs._2.forall(entSk(e) < _))
        // keys-only projection: the real service omits properties
        val keysOnly = q.path("projection").elements().asScala
          .exists(_.path("property").path("name").asText == "__key__")
        val timeSliced = !isAgg && kind != "__kind__" && start > 0 &&
          emptyPageOnce.getAndUpdate(n => math.max(0, n - 1)) > 0
        val page =
          if (timeSliced) Seq.empty
          else {
            val p = matching.slice(start, start + limit)
            if (scramblePages.get) p.reverse else p
          }
        val results = page.map { e =>
          val keyPart = e.name.map(n => s""""name":"$n"""").getOrElse(s""""id":"${e.id.get}"""")
          val props = if (keysOnly) "" else s""","properties":${e.props}"""
          s"""{"entity":{"key":{"path":[{"kind":"${e.kind}",$keyPart}]}$props}}"""
        }.mkString("[", ",", "]")
        val more = if (start + page.size < matching.size) "NOT_FINISHED" else "NO_MORE_RESULTS"
        val cursor = if (timeSliced) s"e$start" else s"c${start + page.size}"
        val resp =
          if (isAgg)
            s"""{"batch":{"aggregationResults":[{"aggregateProperties":{"n":{"integerValue":"${matching.size}"}}}]}}"""
          else
            s"""{"batch":{"entityResults":$results,"endCursor":"$cursor","moreResults":"$more"}}"""
        val bytes = resp.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    s.start()
    s
  }
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"
  private def client = new DatastoreRestClient(base, "test-proj", backoffMs = 1)

  test("S6 cursor paging: full kind scan crosses pages, key promotion name/id") {
    bodies.synchronized(bodies.clear())
    val rows = client.runQuery("User", pageSize = 7).toSeq
    assert(rows.size == nUsers)
    assert(rows.map(_._1).contains("12345"), "numeric key id stringified")
    assert(rows.forall(_._2.contains("stringValue")))
    assert(bodies.synchronized(bodies.size) >= 5, "35 rows at 7/page needs 5 requests")
    assert(bodies.synchronized(bodies.toList).tail.forall(_.contains("startCursor")))
  }

  test("S6 key-range bound: [e05, e10) propagates as __key__ filters") {
    bodies.synchronized(bodies.clear())
    val rows = client.runQuery("User", Some("e05"), Some("e10")).toSeq
    assert(rows.map(_._1) == Seq("e05", "e06", "e07", "e08", "e09"))
    val b = bodies.synchronized(bodies.head)
    assert(b.contains("GREATER_THAN_OR_EQUAL") && b.contains("LESS_THAN") && b.contains("compositeFilter"))
  }

  test("S6 all-digit bound encodes as an id path element, not a name") {
    bodies.synchronized(bodies.clear())
    val rows = client.runQuery("User", Some("12345"), None).toSeq
    val b = bodies.synchronized(bodies.head)
    assert(b.contains("\"id\":\"12345\"") && !b.contains("\"name\":\"12345\""),
      s"numeric bound must use the id branch: $b")
    // ids sort before names in service order, so [id 12345, inf)
    // holds that one id plus every named entity
    assert(rows.map(_._1).toSet == (Set("12345") ++ (1 to 30).map(i => f"e$i%02d")))
  }

  test("S7 kind discovery filters system kinds; S8 count via keys-only") {
    assert(client.listKinds() == Seq("Num", "Session", "User"))
    assert(client.countEntities("User") == nUsers.toLong)
    failNext.set(1)
    assert(client.countEntities("Session") == 1L, "retries past a transient 500")
  }

  test("DSv2: sharded range scan matches, point lookup prunes to one partition") {
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "4").option("pageSize", "9").load()
    assert(df.count() == nUsers)
    assert(df.rdd.getNumPartitions == 4)
    val one = df.filter(col("id") === "e07").collect()
    assert(one.length == 1 && one(0).getAs[String]("json").contains("u7@x.com"))
    assert(df.filter(col("id") === "zzz").count() == 0, "empty range -> zero partitions")
  }

  test("429 burst: read-only POST retries with backoff then completes") {
    bodies.synchronized(bodies.clear())
    rateLimit.set(2)
    val rows = client.runQuery("User", pageSize = 50).toSeq
    assert(rows.size == nUsers, "the burst must not lose rows")
    assert(bodies.synchronized(bodies.size) == 3,
      s"2 rate-limited attempts + 1 success, got ${bodies.synchronized(bodies.size)}")
  }

  test("empty page mid-stream with NOT_FINISHED: scan continues, no loss, no dup") {
    // a time-sliced scan can legally return zero rows with an advanced
    // cursor; termination must follow moreResults, never row count
    bodies.synchronized(bodies.clear())
    emptyPageOnce.set(1)
    val rows = client.runQuery("User", pageSize = 10).toSeq
    assert(rows.size == nUsers && rows.map(_._1).distinct.size == nUsers)
    assert(bodies.synchronized(bodies.size) >= 5,
      "4 data pages + 1 empty epoch page at 10/page")
  }

  test("out-of-order page payloads: the row set is complete and exact") {
    scramblePages.set(true)
    try {
      val rows = client.runQuery("User", pageSize = 7).toSeq
      assert(rows.size == nUsers && rows.map(_._1).toSet.size == nUsers)
    } finally scramblePages.set(false)
  }

  test("short name: spark.read.format(\"graft-datastore\") resolves via DataSourceRegister") {
    val viaShort = spark.read.format("graft-datastore")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "2").load()
    assert(viaShort.count() == nUsers)
    assert(viaShort.schema == graft.sources.DatastoreSource.schema)
  }

  test("numeric ids: every row read exactly once with numPartitions > 1") {
    // the VERDICT counter-example: ids 9,10,11,12 under string-quantile
    // bounds ("10","12") put id 9 in no partition — service-order
    // bounds must read each id exactly once
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "Num")
      .option("numPartitions", "2").option("pageSize", "2").load()
    val ids = df.select("id").collect().map(_.getString(0)).toSeq
    assert(ids.size == numericIds.size, s"row loss/duplication: $ids")
    assert(ids.toSet == numericIds.map(_.toString).toSet)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("mixed kind: ids and names each read exactly once across partitions") {
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "3").option("pageSize", "5").load()
    val ids = df.select("id").collect().map(_.getString(0)).toSeq
    assert(ids.size == nUsers, s"expected $nUsers rows exactly once, got ${ids.size}")
    assert(ids.toSet.size == nUsers)
  }

  test("EqualTo on a numeric id returns exactly one row (no over-match)") {
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "4").option("pageSize", "9").load()
    // the old successor bug made [12345, "12345 ") span every id >= 12345
    val rows = df.filter(col("id") === "12345").collect()
    assert(rows.length == 1, s"expected exactly id 12345, got ${rows.map(_.getString(0)).toSeq}")
    assert(rows(0).getAs[String]("json").contains("n12345@x.com"))
    assert(df.filter(col("id") === "9").count() == 1, "single-digit id point lookup")
  }

  test("unbounded scan plans via ONE __scatter__ sample, not key enumeration") {
    bodies.synchronized(bodies.clear())
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "3").option("pageSize", "6").load()
    // collect (not count) so the ROW scan is what gets planned —
    // count() compiles to the pushed aggregation and plans no ranges;
    // full rows (not select("id")) so the data path is NOT keys-only
    // and a projection body can only mean driver-side key enumeration
    assert(df.collect().length == nUsers)
    val bs = bodies.synchronized(bodies.toList)
    // Spark may run planInputPartitions once per planning pass; each
    // pass must cost ONE bounded sample request, never a key scan
    val scatters = bs.count(_.contains("__scatter__"))
    assert(scatters >= 1 && scatters <= 2,
      s"one scatter sample per planning pass, got $scatters")
    assert(!bs.exists(b => b.contains("projection") && !b.contains("__scatter__")),
      "an unbounded scan must not cursor-page every key through the driver")
  }

  test("S8: bare count() pushes down to ONE server-side aggregation request") {
    bodies.synchronized(bodies.clear())
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "4").option("pageSize", "9").load()
    assert(df.count() == nUsers)
    val bs = bodies.synchronized(bodies.toList)
    assert(bs.size == 1 && bs.head.contains("aggregationQuery"),
      s"count(*) must be one runAggregationQuery, got ${bs.size} requests")
    // filtered counts keep the row-scan path (filters are re-checked
    // by Spark, so the aggregate is not eligible for complete pushdown)
    assert(df.filter(col("id") === "e07").count() == 1)
  }

  test("column pruning: json-pruned scans issue keys-only queries") {
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "3").option("pageSize", "7").load()
    def dataBodies(): List[String] = bodies.synchronized(bodies.toList)
      .filterNot(b => b.contains("__scatter__") || b.contains("aggregationQuery"))
    // id-only projection: every data request must be keys-only — the
    // server ships key paths, never entity payloads
    bodies.synchronized(bodies.clear())
    val ids = df.select("id").collect().map(_.getString(0))
    assert(ids.length == nUsers && ids.toSet.size == nUsers)
    val d1 = dataBodies()
    assert(d1.nonEmpty && d1.forall(_.contains("\"projection\"")),
      s"id-only scan must be keys-only: ${d1.filterNot(_.contains("projection")).take(1)}")
    // filtered count: only the key survives pruning -> keys-only too
    // (bare count() takes the aggregation pushdown path instead)
    bodies.synchronized(bodies.clear())
    assert(df.filter(col("id") >= "e05" && col("id") < "e10").count() == 5)
    val d2 = dataBodies()
    assert(d2.nonEmpty && d2.forall(_.contains("\"projection\"")),
      "filtered count must scan keys-only")
    // json still required -> full entities (values come through intact)
    val full = df.select("id", "json").where(col("id") === "e07").collect()
    assert(full.length == 1 && full(0).getString(1).contains("u7@x.com"))
  }

  test("numPartitions=1 plans a single partition with zero planning requests") {
    bodies.synchronized(bodies.clear())
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "1").option("pageSize", "9").load()
    assert(df.count() == nUsers)
    assert(df.rdd.getNumPartitions == 1)
    val bs = bodies.synchronized(bodies.toList)
    assert(!bs.exists(b => b.contains("__scatter__") || b.contains("projection")),
      "numPartitions=1 (the mixed-key setting) must not issue planning requests")
  }

  test("inequality on a name bound stays consistent with Spark semantics") {
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "3").option("pageSize", "7").load()
    // name bound above '9': pushdown sound — ids are below "e05" in
    // BOTH service order and Spark's lexicographic semantics. Full rows
    // selected so data requests are not keys-only and a projection body
    // can only mean driver-side key enumeration.
    bodies.synchronized(bodies.clear())
    assert(df.filter(col("id") >= "e05" && col("id") < "e10")
      .select("id", "json").collect().length == 5)
    // bounded scans also plan from the scatter sample — never by
    // cursor-paging the range's keys through the driver
    assert(!bodies.synchronized(bodies.toList)
      .exists(b => b.contains("projection") && !b.contains("__scatter__")),
      "bounded scan must not enumerate keys")
    // digit bound: pushdown must NOT shard the scan by a range that
    // disagrees with lexicographic semantics ("9" >= "12" lexically)
    val lex = df.filter(col("id") >= "12").collect().map(_.getString(0)).toSet
    val expected = ((1 to 30).map(i => f"e$i%02d") ++
      numericIds.map(_.toString).filter(_ >= "12")).toSet
    assert(lex == expected, s"lexicographic >= must hold: ${lex -- expected} / ${expected -- lex}")
  }
}
