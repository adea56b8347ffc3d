package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.sources.AuthRestClient

/** S5/J1 live-transport plumbing: a localhost stub implements the
  * Identity Toolkit accounts:lookup contract (batched localId lookup)
  * and the batched executor-side fetch + enrichment join are checked
  * against it — the scale answer to the reference's N+1 RPC loop. */
class AuthRestSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  // service knows u01..u15; u13+ have no email (auth-miss branch)
  private def known(uid: String): Boolean = uid.matches("u(0[1-9]|1[0-5])")

  private val batches = mutable.ArrayBuffer[Int]()
  private val failNext = new AtomicInteger(0)

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (ex: HttpExchange) => {
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      val uids = (0 until body.path("localId").size).map(body.path("localId").get(_).asText)
      batches.synchronized { batches += uids.size }
      if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        val users = uids.filter(known).map { uid =>
          val n = uid.drop(1).toInt
          val email = if (n <= 12) s""""email":"$uid@auth.example","emailVerified":${n % 2 == 0},""" else ""
          s"""{"localId":"$uid",$email"providerUserInfo":[{"providerId":"${if (n % 3 == 0) "google.com" else "password"}"}]}"""
        }.mkString("[", ",", "]")
        val bytes = s"""{"users":$users}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    s.start()
    s
  }
  private lazy val client =
    new AuthRestClient(s"http://127.0.0.1:${server.getAddress.getPort}", backoffMs = 1)

  test("lookup batches, parses records, omits unknown uids, retries a 500") {
    failNext.set(1)
    val m = client.lookup(Seq("u02", "u03", "u13", "u99"))
    assert(m.keySet == Set("u02", "u03", "u13"), "u99 unknown -> absent")
    assert(m("u02").email.contains("u02@auth.example") && m("u02").emailVerified)
    assert(m("u03").providerIds == Seq("google.com"))
    assert(m("u13").email.isEmpty, "known uid without email")
  }

  test("executor-side batched fetch honors batchSize and feeds enrichFromAuth") {
    batches.synchronized(batches.clear())
    val uids = (1 to 20).map(i => f"u$i%02d").toDF("user_id").repartition(2)
    val auth = AuthRestClient.fetchAuthUsers(uids, "user_id", client, batchSize = 6)
    assert(auth.count() == 15)
    val sizes = batches.synchronized(batches.toList)
    assert(sizes.forall(_ <= 6), s"no batch exceeds the API limit: $sizes")
    assert(sizes.sum == 20, s"every uid looked up exactly once: $sizes")

    val users = Seq(("u02", null), ("u04", "db@x.com"), ("u99", null))
      .toDF("user_id", "email")
    val enriched = graft.ops.Ops.enrichFromAuth(users,
      auth.withColumnRenamed("uid", "user_id"), "user_id")
      .select("user_id", "email", "authSource").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(enriched("u02") == (("u02@auth.example", "auth")), "auth fills missing email")
    assert(enriched("u04") == (("db@x.com", "database")), "db email wins")
    assert(enriched("u99") == ((null, "none")), "unknown uid null-fills")
  }
}
