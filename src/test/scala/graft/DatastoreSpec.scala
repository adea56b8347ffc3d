package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.sources.DatastoreRestClient

/** S6/S7 live-transport plumbing: a localhost stub implements the
  * Datastore REST v1 runQuery contract (cursor paging, key-range
  * propertyFilters on __key__, keys-only projection, __kind__
  * pseudo-kind) and the client + DSv2 source are checked against it. */
class DatastoreSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  // 30 named entities + 1 numeric-id entity (key promotion fallback)
  private case class Ent(kind: String, name: Option[String], id: Option[Long], props: String)
  private val ents: Seq[Ent] =
    (1 to 30).map(i => Ent("User", Some(f"e$i%02d"), None, f"""{"email":{"stringValue":"u$i@x.com"}}""")) :+
      Ent("User", None, Some(12345L), """{"email":{"stringValue":"numeric@x.com"}}""") :+
      Ent("Session", Some("s1"), None, "{}") :+
      Ent("__stat__", Some("total"), None, "{}")

  private def keyStr(e: Ent): String = e.name.getOrElse(e.id.get.toString)

  private val bodies = mutable.ArrayBuffer[String]()
  private val failNext = new AtomicInteger(0)

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      bodies.synchronized { bodies += body }
      if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        val q = mapper.readTree(body).path("query")
        val kind = q.path("kind").get(0).path("name").asText
        val limit = if (q.has("limit")) q.get("limit").asInt else Int.MaxValue
        val start = Option(q.path("startCursor").asText(null))
          .map(_.stripPrefix("c").toInt).getOrElse(0)
        // collect __key__ propertyFilters (single or AND-composite)
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
              // bounds arrive as `name` for string keys, `id` for numeric
              val v = if (el.hasNonNull("id")) el.get("id").asText else el.path("name").asText
              pf.path("op").asText match {
                case "GREATER_THAN_OR_EQUAL" => lo = Some(v)
                case "LESS_THAN" => hi = Some(v)
                case _ => ()
              }
            }
          }
          (lo, hi)
        }
        val matching =
          (if (kind == "__kind__") ents.map(_.kind).distinct.sorted.map(k => Ent("__kind__", Some(k), None, "{}"))
           else ents.filter(_.kind == kind))
            .sortBy(keyStr)
            .filter(e => pfs._1.forall(keyStr(e) >= _) && pfs._2.forall(keyStr(e) < _))
        val page = matching.slice(start, start + limit)
        val results = page.map { e =>
          val keyPart = e.name.map(n => s""""name":"$n"""").getOrElse(s""""id":"${e.id.get}"""")
          s"""{"entity":{"key":{"path":[{"kind":"${e.kind}",$keyPart}]},"properties":${e.props}}}"""
        }.mkString("[", ",", "]")
        val more = if (start + page.size < matching.size) "NOT_FINISHED" else "NO_MORE_RESULTS"
        val resp = s"""{"batch":{"entityResults":$results,"endCursor":"c${start + page.size}","moreResults":"$more"}}"""
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
    assert(rows.size == 31)
    assert(rows.map(_._1).contains("12345"), "numeric key id stringified")
    assert(rows.forall(_._2.contains("stringValue")))
    assert(bodies.synchronized(bodies.size) >= 5, "31 rows at 7/page needs 5 requests")
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
    client.runQuery("User", Some("12345"), None).toSeq
    val b = bodies.synchronized(bodies.head)
    assert(b.contains("\"id\":\"12345\"") && !b.contains("\"name\":\"12345\""),
      s"numeric bound must use the id branch: $b")
  }

  test("S7 kind discovery filters system kinds; S8 count via keys-only") {
    assert(client.listKinds() == Seq("Session", "User"))
    assert(client.countEntities("User") == 31L)
    failNext.set(1)
    assert(client.countEntities("Session") == 1L, "retries past a transient 500")
  }

  test("DSv2: sharded range scan matches, point lookup prunes to one partition") {
    val df = spark.read.format("graft.sources.DatastoreSource")
      .option("url", base).option("projectId", "test-proj").option("kind", "User")
      .option("numPartitions", "4").option("pageSize", "9").load()
    assert(df.count() == 31)
    assert(df.rdd.getNumPartitions == 4)
    val one = df.filter(col("id") === "e07").collect()
    assert(one.length == 1 && one(0).getAs[String]("json").contains("u7@x.com"))
    assert(df.filter(col("id") === "zzz").count() == 0, "empty range -> zero partitions")
  }
}
