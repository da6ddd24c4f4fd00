package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** P9 — JWT decode (reference
  * `src/middleware/authenticate-middleware.ts:17-42`): unverified decode
  * of a bearer token, extracting `user_id` (the `sub` claim) and
  * `isAdmin` (`realm_access.roles` contains `tdei-admin`). The reference
  * uses `jwt.decode` — NO signature verification — so parity is a pure
  * base64url + JSON parse; a malformed token decodes to null (the
  * middleware's UnAuthenticated path).
  */
object JwtDecode extends Serializable {

  @transient private lazy val mapper = new ObjectMapper()

  final case class Identity(user_id: String, isAdmin: Boolean)

  /** Strip an optional `Bearer ` prefix (`:27`). */
  def stripBearer(header: String): String =
    if (header == null) null else header.replaceFirst("^Bearer\\s", "")

  /** Unverified payload decode; null for anything malformed (`:33-36`). */
  def decode(token: String): Identity = {
    if (token == null || token.isEmpty) return null
    val parts = token.split('.')
    if (parts.length < 2) return null
    try {
      val payload = new String(
        Base64.getUrlDecoder.decode(parts(1)), StandardCharsets.UTF_8)
      val node = mapper.readTree(payload)
      if (node == null || !node.isObject) return null
      val sub = Option(node.get("sub")).filter(_.isTextual).map(_.asText).orNull
      val roles = Option(node.get("realm_access")).map(_.get("roles")).orNull
      val isAdmin = roles != null && roles.isArray &&
        (0 until roles.size).exists(i => roles.get(i).asText == "tdei-admin")
      Identity(sub, isAdmin)
    } catch { case _: Exception => null }
  }

  private val decodeUdf = udf((header: String) => Option(decode(stripBearer(header))))

  /** Column API: bearer header → struct<user_id string, isAdmin boolean>,
    * null when unauthenticated.
    */
  def jwt_identity(bearerHeader: Column): Column = decodeUdf(bearerHeader)
}
