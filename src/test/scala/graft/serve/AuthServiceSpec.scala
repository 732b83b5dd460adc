package graft.serve

import org.scalatest.funsuite.AnyFunSuite

class AuthServiceSpec extends AnyFunSuite {

  private def service(clock: () => Long = () => System.currentTimeMillis()) =
    new AuthService("0123456789abcdef-secret", accessTtlMs = 1000,
      refreshTtlMs = 5000, now = clock)

  test("issue -> validate round-trip") {
    val a = service()
    val pair = a.issue("alice")
    val c = a.validate(pair.accessToken)
    assert(c.exists(_.subject == "alice"))
    assert(c.exists(_.typ == "access"))
    // refresh token is not an access token
    assert(a.validate(pair.refreshToken).isLeft)
    assert(a.validate(pair.refreshToken, expectTyp = "refresh").isRight)
  }

  test("expired tokens are rejected") {
    var t = 1000000L
    val a = service(() => t)
    val pair = a.issue("bob")
    assert(a.validate(pair.accessToken).isRight)
    t += 1001 // past access TTL
    assert(a.validate(pair.accessToken) == Left("token expired"))
    assert(a.validate(pair.refreshToken, "refresh").isRight) // longer TTL
    t += 5000
    assert(a.validate(pair.refreshToken, "refresh") == Left("token expired"))
  }

  test("tampered tokens are rejected") {
    val a = service()
    val tok = a.issue("carol").accessToken
    val Array(payload, sig) = tok.split('.')
    // re-encode a payload with a different subject, keep the old signature
    val forged = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      new String(java.util.Base64.getUrlDecoder.decode(payload))
        .replace("carol", "admin").getBytes)
    assert(a.validate(s"$forged.$sig") == Left("invalid signature"))
    assert(a.validate("garbage").isLeft)
    assert(a.validate(null).isLeft)
  }

  test("refresh rotates: old refresh token is single-use") {
    val a = service()
    val pair = a.issue("dave")
    val next = a.refresh(pair.refreshToken)
    assert(next.isRight)
    assert(next.exists(_.accessToken != pair.accessToken))
    // replaying the consumed refresh token fails
    assert(a.refresh(pair.refreshToken) == Left("token revoked"))
    // the new pair works
    assert(next.flatMap(p => a.validate(p.accessToken)).isRight)
  }

  test("revocation blocks a live token") {
    val a = service()
    val pair = a.issue("erin")
    assert(a.validate(pair.accessToken).isRight)
    assert(a.revoke(pair.accessToken).isRight)
    assert(a.validate(pair.accessToken) == Left("token revoked"))
    // revoking a forged token is refused
    assert(a.revoke("AAAA.BBBB").isLeft)
  }

  test("facade exposes the auth verbs when enabled") {
    val spark = graft.TestSpark.spark
    val store = new graft.catalog.TableStore(spark,
      java.nio.file.Files.createTempDirectory("auth").toString)
    val svc = new ServiceFacade(store, authSecret = Some("0123456789abcdef"))
    // the mint requires the deployment credential (reference
    // GetTokenRequest{api_key, secret}); a wrong secret never mints
    intercept[IllegalArgumentException](svc.getToken("ops", "wrong-secret"))
    val pair = svc.getToken("ops", "0123456789abcdef")
    assert(svc.validateToken(pair.accessToken).exists(_.subject == "ops"))
    assert(svc.refreshToken(pair.refreshToken).isRight)
    assert(svc.revokeToken(pair.accessToken).isRight)
    assert(svc.validateToken(pair.accessToken).isLeft)
    // disabled facade throws
    val bare = new ServiceFacade(store)
    intercept[IllegalStateException](bare.getToken("x", "y"))
  }
}
