package graft

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.JwtDecode

/** P9 JWT decode: unverified payload extraction with the reference's
  * sub / realm_access.roles semantics and null-on-malformed behavior.
  */
class JwtDecodeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def b64(s: String): String =
    Base64.getUrlEncoder.withoutPadding()
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def token(payload: String): String =
    b64("""{"alg":"none"}""") + "." + b64(payload) + ".sig"

  test("decode extracts sub and tdei-admin role") {
    val admin = JwtDecode.decode(token(
      """{"sub":"user-1","realm_access":{"roles":["x","tdei-admin"]}}"""))
    assert(admin == JwtDecode.Identity("user-1", isAdmin = true))
    val plain = JwtDecode.decode(token("""{"sub":"user-2"}"""))
    assert(plain == JwtDecode.Identity("user-2", isAdmin = false))
  }

  test("malformed tokens decode to null; Bearer prefix stripped") {
    assert(JwtDecode.decode(null) == null)
    assert(JwtDecode.decode("") == null)
    assert(JwtDecode.decode("notatoken") == null)
    assert(JwtDecode.decode("a.!!!.c") == null)
    assert(JwtDecode.stripBearer("Bearer abc.def") == "abc.def")
    assert(JwtDecode.stripBearer("abc.def") == "abc.def")
  }

  test("jwt_identity column API") {
    import spark.implicits._
    val df = Seq(
      "Bearer " + token("""{"sub":"u9","realm_access":{"roles":["tdei-admin"]}}"""),
      "garbage").toDF("auth")
    val got = df.select(JwtDecode.jwt_identity(col("auth")).as("id")).collect()
    assert(got(0).getStruct(0).getString(0) == "u9")
    assert(got(0).getStruct(0).getBoolean(1))
    assert(got(1).isNullAt(0))
  }
}
