package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.Exprs
import graft.ops.Ops

/** Canonical typed record — the reference's pydantic `UserModel`
  * (user_transformer.py:14-32) as a Scala case class with a Spark
  * Encoder (SURVEY.md §1.2). */
case class User(
  id: String,
  email: String,
  emailVerified: Boolean,
  password: Option[String],
  uid: Option[String],
  provider: String,
  profilePic: Option[String],
  phoneNumber: Option[String],
  phoneVerified: Boolean,
  name: Option[String],
  city: Option[String],
  birthdate: Option[Timestamp],
  photo: Option[String],
  createdAt: Timestamp,
  updatedAt: Timestamp,
  status: String,
  interests: Option[Seq[String]],
  lastConnexion: Option[Timestamp])

object User {
  implicit val encoder: Encoder[User] = Encoders.product[User]
  val schema: StructType = encoder.schema

  object Status { // user_transformer.py:9-12
    val Active = "ACTIVE"; val Inactive = "INACTIVE"; val Banned = "BANNED"
    val all = Seq(Active, Inactive, Banned)
  }
  val DefaultProvider = "CREDENTIALS" // user_transformer.py:20

  /** P6 — alias table (user_transformer.py:328-347). */
  val aliases: Seq[(String, Seq[String])] = Seq(
    "id" -> Seq("id"),
    "email" -> Seq("email"),
    "emailVerified" -> Seq("emailVerified", "email_verified"),
    "password" -> Seq("password"),
    "uid" -> Seq("uid"),
    "provider" -> Seq("provider"),
    "profilePic" -> Seq("profilePic", "profile_pic"),
    "phoneNumber" -> Seq("phoneNumber", "phone_number"),
    "phoneVerified" -> Seq("phoneVerified", "phone_verified"),
    "name" -> Seq("name", "displayName"),
    "city" -> Seq("city"),
    "birthdate" -> Seq("birthdate", "birthDate", "birth_date"),
    "photo" -> Seq("photo", "photoURL"),
    "createdAt" -> Seq("createdAt", "created_at"),
    "updatedAt" -> Seq("updatedAt", "updated_at"),
    "status" -> Seq("status"),
    "interests" -> Seq("interests"),
    "lastConnexion" -> Seq("lastConnexion", "last_connexion"))

  /** The full transform stage (`transform_users_dataframe`,
    * user_transformer.py:394-441) as one declarative plan:
    * alias-coalesce → scalar cleaning (F-series) → defaults → dedup W1.
    * Returns the flagged frame; split with Ops.validateSplit checks.
    *
    * `keepInvalidEmails = false` (default) matches the reference's
    * default path: detect_and_remove_duplicates drops null-email rows
    * before deduping (df.dropna(subset=['email']),
    * user_transformer.py:249), so they never reach its error channel.
    * `true` is a DELIBERATE DIVERGENCE: null-email rows pass through
    * un-deduped so Ops.validateSplit(checks) can route them to the
    * typed error channel instead of silently losing them. */
  def transform(raw: DataFrame, now: org.apache.spark.sql.Column = current_timestamp(),
                keepInvalidEmails: Boolean = false): DataFrame = {
    val projected = Ops.coalesceAliases(aliases)(raw)
    val cleaned = projected
      .withColumn("email", Exprs.cleanString(col("email")))
      .withColumn("name", Exprs.cleanString(col("name")))
      .withColumn("city", Exprs.cleanString(col("city")))
      .withColumn("provider", Exprs.withDefault(Exprs.cleanString(col("provider")), lit(DefaultProvider)))
      .withColumn("email", Exprs.placeholderEmail(col("email"), col("provider"), col("uid")))
      .withColumn("emailVerified", Exprs.cleanBool(col("emailVerified")))
      .withColumn("phoneVerified", Exprs.cleanBool(col("phoneVerified")))
      .withColumn("birthdate", Exprs.parseFlexibleTimestamp(col("birthdate")))
      .withColumn("createdAt", Exprs.withDefault(Exprs.parseFlexibleTimestamp(col("createdAt")), now))
      .withColumn("updatedAt", Exprs.withDefault(Exprs.parseFlexibleTimestamp(col("updatedAt")), now))
      .withColumn("lastConnexion", Exprs.parseFlexibleTimestamp(col("lastConnexion")))
      .withColumn("status", Exprs.normalizeStatus(col("status")))
      .withColumn("interests", Exprs.parseInterests(col("interests")))
      // P8 — required-field backfill (user_transformer.py:354-362)
      .withColumn("id", Exprs.withDefault(Exprs.cleanString(col("id")), Exprs.uuid20))
    // W1 dedup keep-latest on email. In error-channel mode null-email
    // rows pass through untouched; one window pass with
    // `isNull || rn = 1` keeps it a single scan of the cleaning lineage
    // (a filter/union split would evaluate the whole upstream plan
    // twice). In reference mode they are dropped before the window.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("email"))
      .orderBy(col("createdAt").desc_nulls_last, col("id").desc)
    val base = if (keepInvalidEmails) cleaned else cleaned.filter(col("email").isNotNull)
    val keepRow = if (keepInvalidEmails) col("email").isNull || col("__rn") === 1
                  else col("__rn") === 1
    base.withColumn("__rn", row_number().over(w))
      .filter(keepRow)
      .drop("__rn")
  }

  /** §2.8 checks for the typed channel (missing email is the one
    * hard row-level error — main.py:71-73). */
  val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "missing_email" -> col("email").isNull,
    "missing_id" -> col("id").isNull,
    "bad_status" -> !col("status").isin(Status.all: _*))
}
