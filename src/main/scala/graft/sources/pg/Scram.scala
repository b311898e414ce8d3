package graft.sources.pg

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.text.Normalizer
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** SCRAM-SHA-256 (RFC 5802 + RFC 7677) — the SASL mechanism PostgreSQL
  * defaults to since `password_encryption = scram-sha-256` became the
  * default in PG 14. The reference gets this for free from pgx v5
  * (go.mod:11-13); here it is implemented from the RFCs so the raw-socket
  * client can authenticate against a stock modern server.
  *
  * Primitives (RFC 5802 §2.2):
  *   Hi(str, salt, i)  = PBKDF2-HMAC-SHA-256 with dkLen = output length
  *   HMAC(key, str)    = HMAC-SHA-256
  *   H(str)            = SHA-256
  *
  * The exchange (client side, [[ScramClient]]):
  *   C: n,,n=,r=<cnonce>                          (client-first)
  *   S: r=<cnonce><snonce>,s=<salt64>,i=<iters>   (server-first)
  *   C: c=biws,r=<cnonce><snonce>,p=<proof64>     (client-final)
  *   S: v=<server-signature64>                    (server-final, verified)
  *
  * PostgreSQL ignores the SCRAM `n=` username and uses the startup-packet
  * user, so the client sends an empty `n=` like libpq does.
  */
object Scram {

  val Mechanism = "SCRAM-SHA-256"

  def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def h(data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(data)

  /** Hi() — PBKDF2 with HMAC-SHA-256, written out per RFC 5802 §2.2:
    * U1 = HMAC(str, salt || INT(1)); Un = HMAC(str, Un-1); Hi = U1 ^…^ Ui.
    */
  def hi(password: Array[Byte], salt: Array[Byte], iterations: Int): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(password, "HmacSHA256"))
    mac.update(salt)
    mac.update(Array[Byte](0, 0, 0, 1))
    var u = mac.doFinal()
    val out = u.clone()
    var i = 1
    while (i < iterations) {
      u = mac.doFinal(u)
      var j = 0
      while (j < out.length) { out(j) = (out(j) ^ u(j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < out.length) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  /** SASLprep (RFC 4013) profile of stringprep, the subset that matters
    * for password normalization: map non-ASCII spaces (C.1.2) to SPACE,
    * drop the commonly-mapped-to-nothing set (B.1), NFKC-normalize, and
    * reject prohibited output (control characters, surrogates,
    * replacement char). ASCII passwords pass through unchanged.
    */
  def saslPrep(password: String): String = {
    val mapped = new StringBuilder(password.length)
    password.foreach {
      case c if isNonAsciiSpace(c) => mapped.append(' ')
      case c if isMappedToNothing(c) => ()
      case c => mapped.append(c)
    }
    val normalized = Normalizer.normalize(mapped, Normalizer.Form.NFKC)
    normalized.foreach { c =>
      if (c < 0x20 || (c >= 0x7f && c <= 0x9f) || Character.isSurrogate(c) ||
          c == 0xfffd)
        throw PgError("28P01", "password contains prohibited character (SASLprep)")
    }
    normalized
  }

  private def isNonAsciiSpace(c: Char): Boolean =
    c == 0x00a0 || c == 0x1680 || (c >= 0x2000 && c <= 0x200b) ||
      c == 0x202f || c == 0x205f || c == 0x3000

  private def isMappedToNothing(c: Char): Boolean =
    c == 0x00ad || c == 0x034f || c == 0x1806 ||
      (c >= 0x180b && c <= 0x180d) || (c >= 0x200c && c <= 0x200d) ||
      c == 0x2060 || (c >= 0xfe00 && c <= 0xfe0f) || c == 0xfeff

  def b64(bytes: Array[Byte]): String = Base64.getEncoder.encodeToString(bytes)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** Parse `k1=v1,k2=v2,…` attribute lists (values may contain '='). */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").iterator.filter(_.length >= 2).map { kv =>
      require(kv.charAt(1) == '=', s"malformed SCRAM attribute: $kv")
      kv.charAt(0) -> kv.substring(2)
    }.toMap

  def randomNonce(rng: SecureRandom = new SecureRandom()): String = {
    // printable ASCII excluding ',' per RFC 5802 attr grammar
    val bytes = new Array[Byte](18)
    rng.nextBytes(bytes)
    Base64.getEncoder.encodeToString(bytes)
  }
}

/** One client-side SCRAM-SHA-256 exchange. Stateful: call
  * [[clientFirstMessage]], then [[handleServerFirst]], then
  * [[verifyServerFinal]]; each exactly once, in order.
  *
  * @param username SCRAM `n=` name — PostgreSQL ignores it in favor of
  *                 the startup-packet user, so the client passes ""
  *                 (like libpq); non-empty only for RFC test vectors
  * @param nonceOverride fixed nonce for deterministic tests
  */
final class ScramClient(password: String, username: String = "",
                        nonceOverride: Option[String] = None) {
  import Scram._

  private val cnonce = nonceOverride.getOrElse(randomNonce())
  private val clientFirstBare = s"n=$username,r=$cnonce"
  // gs2 header "n,," = no channel binding; its base64 is the "biws" in c=
  private var serverFirst: String = _
  private var expectedServerSig: Array[Byte] = _

  def clientFirstMessage: Array[Byte] = ("n,," + clientFirstBare).getBytes(UTF_8)

  /** server-first → client-final (with proof). */
  def handleServerFirst(msg: String): Array[Byte] = {
    serverFirst = msg
    val a = attrs(msg)
    val fullNonce = a.getOrElse('r', throw PgError("08P01", "SCRAM server-first missing r="))
    if (!fullNonce.startsWith(cnonce) || fullNonce.length <= cnonce.length)
      throw PgError("28P01", "SCRAM server nonce does not extend client nonce")
    val salt = unb64(a.getOrElse('s', throw PgError("08P01", "SCRAM server-first missing s=")))
    val iters = a.getOrElse('i', throw PgError("08P01", "SCRAM server-first missing i=")).toInt
    if (iters < 1 || iters > 1000000)
      throw PgError("28P01", s"SCRAM iteration count $iters out of range")

    // pg_saslprep falls back to the RAW password when SASLprep fails
    // (the server computed its stored verifier the same way), so a
    // prohibited-character password must not be rejected client-side —
    // libpq authenticates it and so must we.
    val prepped =
      try saslPrep(password)
      catch { case _: PgError => password }
    val salted = hi(prepped.getBytes(UTF_8), salt, iters)
    val clientKey = hmac(salted, "Client Key".getBytes(UTF_8))
    val storedKey = h(clientKey)
    val withoutProof = s"c=biws,r=$fullNonce"
    val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof".getBytes(UTF_8)
    val proof = xor(clientKey, hmac(storedKey, authMessage))
    expectedServerSig = hmac(hmac(salted, "Server Key".getBytes(UTF_8)), authMessage)
    s"$withoutProof,p=${b64(proof)}".getBytes(UTF_8)
  }

  /** server-final: verify v= against the signature derived from the
    * shared AuthMessage — this is what authenticates the SERVER to us
    * (a MITM without the stored key cannot produce it).
    */
  def verifyServerFinal(msg: String): Unit = {
    val a = attrs(msg)
    a.get('e').foreach(e => throw PgError("28P01", s"SCRAM server error: $e"))
    val v = a.getOrElse('v', throw PgError("08P01", "SCRAM server-final missing v="))
    val ok = MessageDigest.isEqual(unb64(v), expectedServerSig)
    if (!ok) throw PgError("28P01", "SCRAM server signature verification failed")
  }
}
