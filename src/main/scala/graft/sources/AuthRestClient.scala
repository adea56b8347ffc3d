package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** One resolved auth record (the fields the reference reads off
  * `auth.get_user`, `firebase_service.py:79-95`). */
case class AuthRecord(uid: String, email: Option[String],
                      emailVerified: Boolean, providerIds: Seq[String])

/** Minimal Firebase Auth lookup client — the live-service half of the
  * S5/J1 enrichment path. The reference issues ONE Admin-SDK RPC per
  * user lacking a DB email (`firebase_service.py:79-106`, driven at
  * `:155`) — the N+1 that dominates its runtime. The SDK fronts the
  * public Identity Toolkit surface, which is natively BATCHED:
  *
  *   POST <base>/v1/accounts:lookup   {"localId": ["uid1", ...]}
  *   →  {"users": [{"localId":..., "email":..., "emailVerified":...,
  *                  "providerUserInfo":[{"providerId":...}]}]}
  *
  * (up to 100 uids per call). Unknown uids are simply absent from the
  * response — the caller null-fills, same as the reference's
  * exception→default. POSTs are read-only lookups, so 5xx/transport
  * errors retry with backoff; 4xx fails fast. */
class AuthRestClient(baseUrl: String, authToken: Option[String] = None,
                     maxRetries: Int = 3, backoffMs: Long = 100) extends Serializable {

  @transient private lazy val mapper = new ObjectMapper()

  private[graft] def lookupUrl: String = s"${baseUrl.stripSuffix("/")}/v1/accounts:lookup"

  private def post(url: String, body: String): String =
    Http.request(url, "POST", Some(body),
      Seq("Content-Type" -> "application/json") ++
        authToken.map(t => "Authorization" -> s"Bearer $t"),
      maxRetries, backoffMs)

  /** One batched lookup (≤100 uids per the public API). Returns only
    * the uids the service knows. */
  def lookup(uids: Seq[String]): Map[String, AuthRecord] = {
    if (uids.isEmpty) return Map.empty
    val body = mapper.createObjectNode()
    val arr = body.putArray("localId")
    uids.foreach(arr.add)
    val resp = mapper.readTree(post(lookupUrl, mapper.writeValueAsString(body)))
    val users = resp.path("users")
    if (!users.isArray) Map.empty
    else users.elements().asScala.map { u =>
      val uid = u.path("localId").asText
      uid -> AuthRecord(
        uid,
        Option(u.path("email").asText(null)).filter(_.nonEmpty),
        u.path("emailVerified").asBoolean(false),
        u.path("providerUserInfo").elements().asScala
          .map(_.path("providerId").asText).filter(_.nonEmpty).toSeq)
    }.toMap
  }
}

object AuthRestClient {
  /** The auth snapshot as a DataFrame, fetched with BATCHED lookups
    * from the executors: distinct uids are chunked to the API's batch
    * limit inside each partition, so a 1000-executor cluster issues
    * 1000 concurrent batch streams instead of the reference's serial
    * N+1 loop. Output schema matches `Ops.enrichFromAuth`'s auth-side
    * contract (uid, email, email_verified, provider_ids); unknown uids
    * produce no row and null-fill through the left-outer join. */
  def fetchAuthUsers(uids: DataFrame, uidCol: String, client: AuthRestClient,
                     batchSize: Int = 100): DataFrame = {
    val schema = StructType(Seq(
      StructField("uid", StringType, nullable = false),
      StructField("email", StringType, nullable = true),
      StructField("email_verified", BooleanType, nullable = false),
      StructField("provider_ids", ArrayType(StringType), nullable = true)))
    import org.apache.spark.sql.Encoders
    uids.select(col(uidCol).cast("string").as("uid")).na.drop().distinct()
      .mapPartitions { it =>
        it.map(_.getString(0)).grouped(batchSize).flatMap { chunk =>
          client.lookup(chunk).valuesIterator.map(a =>
            Row(a.uid, a.email.orNull, a.emailVerified, a.providerIds))
        }
      }(Encoders.row(schema))
  }
}
