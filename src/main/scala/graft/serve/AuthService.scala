package graft.serve

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.collection.concurrent.TrieMap

/** Token issue / validate / refresh / revoke — the reference's
  * AuthService verbs (`api/proto/miniodb/v1/miniodb.proto` AuthService:
  * GetToken / RefreshToken / RevokeToken; JWT middleware
  * `internal/transport/rest/server.go:477-521`) with dependency-free
  * HMAC-SHA256 tokens (JWT-shaped semantics without a JWT library:
  * signed payload, expiry, token id, type-scoped refresh).
  *
  * Token format: `base64url(payload).base64url(hmac_sha256(payload))`
  * with payload `sub=<subject>;typ=<access|refresh>;exp=<epochMillis>;
  * jti=<uuid>`. Revocation is an in-memory jti set (single-service
  * deployment, like the reference's in-process middleware; a
  * multi-node deployment would back it with shared storage) pruned of
  * expired entries on access.
  *
  * @param secret HMAC key — supply from deployment config
  * @param now    injectable clock for expiry tests */
class AuthService(
    secret: String,
    accessTtlMs: Long = 60L * 60 * 1000,
    refreshTtlMs: Long = 7L * 24 * 60 * 60 * 1000,
    now: () => Long = () => System.currentTimeMillis()) {

  require(secret != null && secret.length >= 16,
    "auth secret must be at least 16 characters")

  final case class Claims(subject: String, typ: String, expiresAt: Long, jti: String)
  final case class TokenPair(accessToken: String, refreshToken: String, expiresAt: Long)

  // jti -> token expiry; entries self-expire (no unbounded growth)
  private val revoked = TrieMap[String, Long]()

  private def hmac(payload: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(payload.getBytes(UTF_8))
  }

  private def b64(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private def mint(subject: String, typ: String, ttlMs: Long): (String, Claims) = {
    val c = Claims(subject, typ, now() + ttlMs, java.util.UUID.randomUUID().toString)
    val payload = s"sub=${c.subject};typ=${c.typ};exp=${c.expiresAt};jti=${c.jti}"
    (s"${b64(payload.getBytes(UTF_8))}.${b64(hmac(payload))}", c)
  }

  /** GetToken: authenticate `subject` (credential check is the caller's
    * concern — the reference validates against configured creds) and
    * issue an access + refresh pair. */
  def issue(subject: String): TokenPair = {
    require(subject != null && subject.nonEmpty, "subject required")
    require(!subject.contains(';') && !subject.contains('='),
      "subject must not contain ';' or '='") // payload-injection guard
    val (access, c) = mint(subject, "access", accessTtlMs)
    val (refresh, _) = mint(subject, "refresh", refreshTtlMs)
    TokenPair(access, refresh, c.expiresAt)
  }

  /** Parse + authenticate a token (signature only — no expiry/type/
    * revocation policy). The single parser behind [[validate]] and
    * [[revoke]], so the two paths can never diverge on what counts as
    * an authentic token. */
  private def parseAuthentic(token: String): Either[String, Claims] = {
    val parts = Option(token).map(_.split('.')).getOrElse(Array.empty[String])
    if (parts.length != 2) return Left("malformed token")
    val payload = scala.util.Try(
      new String(Base64.getUrlDecoder.decode(parts(0)), UTF_8)).getOrElse(return Left("malformed token"))
    val sig = scala.util.Try(Base64.getUrlDecoder.decode(parts(1)))
      .getOrElse(return Left("malformed token"))
    if (!java.security.MessageDigest.isEqual(sig, hmac(payload))) // constant-time
      return Left("invalid signature")
    val kv = payload.split(';').flatMap { p =>
      p.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    (kv.get("sub"), kv.get("typ"), kv.get("exp").flatMap(_.toLongOption), kv.get("jti")) match {
      case (Some(sub), Some(typ), Some(exp), Some(jti)) =>
        Right(Claims(sub, typ, exp, jti))
      case _ => Left("malformed token payload")
    }
  }

  /** Validate signature, expiry and revocation; returns the claims. */
  def validate(token: String, expectTyp: String = "access"): Either[String, Claims] = {
    pruneRevoked()
    parseAuthentic(token).flatMap { c =>
      if (c.typ != expectTyp) Left(s"expected $expectTyp token, got ${c.typ}")
      else if (c.expiresAt <= now()) Left("token expired")
      else if (revoked.contains(c.jti)) Left("token revoked")
      else Right(c)
    }
  }

  /** RefreshToken: exchange a valid refresh token for a new pair; the
    * used refresh token is revoked (rotation — replay of a stolen
    * refresh token after its first use fails). */
  def refresh(refreshToken: String): Either[String, TokenPair] =
    validate(refreshToken, expectTyp = "refresh").map { c =>
      revoked.put(c.jti, c.expiresAt)
      issue(c.subject)
    }

  /** RevokeToken: invalidate a specific token (access or refresh) by its
    * id; succeeds only for authentic tokens (any type, even expired —
    * revoking early does no harm). */
  def revoke(token: String): Either[String, Unit] =
    parseAuthentic(token).map(c => { revoked.put(c.jti, c.expiresAt); () })

  private def pruneRevoked(): Unit = {
    val t = now()
    revoked.filterInPlace((_, exp) => exp > t)
    ()
  }
}
