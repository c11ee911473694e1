package graft.pg.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** Server side of SCRAM-SHA-256 (RFC 5802/7677) — the modern PostgreSQL
  * default password scheme (PG 10+): a salted PBKDF2 credential plus a
  * mutual challenge-response proof, so neither the password nor anything
  * replayable crosses the wire, and the v= server signature proves the
  * SERVER knew the credential too (mutual auth — md5/cleartext have
  * neither). One instance per connection attempt; the wire handler feeds it
  * the two client SASL messages.
  *
  * Channel binding: the server advertises only SCRAM-SHA-256 (not -PLUS),
  * so clients send gs2 header "n,," (no CB support) or "y,," (client
  * supports CB, server didn't offer it — libpq's TLS downgrade guard);
  * the client-final c= attribute must round-trip that exact header.
  */
final class ScramSha256Server(password: String) {
  private val iterations = 4096
  private val rng = new java.security.SecureRandom()
  private val salt = { val b = new Array[Byte](16); rng.nextBytes(b); b }

  private val saltedPassword: Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }
  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(UTF_8))
  }
  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  private val clientKey = hmac(saltedPassword, "Client Key")
  private val storedKey = sha256(clientKey)
  private val serverKey = hmac(saltedPassword, "Server Key")

  private var gs2Header: String = _
  private var clientFirstBare: String = _
  private var serverFirst: String = _
  private var serverNonce: String = _

  private def attrs(msg: String): Map[String, String] =
    msg.split(",").filter(_.length >= 2).map(a => a.substring(0, 1) -> a.substring(2)).toMap

  /** client-first-message → server-first-message (None = malformed). */
  def clientFirst(msg: String): Option[String] = {
    val gs2 = Seq("n,,", "y,,").find(msg.startsWith)
    gs2.flatMap { h =>
      gs2Header = h
      clientFirstBare = msg.substring(h.length)
      attrs(clientFirstBare).get("r").map { clientNonce =>
        val extra = new Array[Byte](18); rng.nextBytes(extra)
        serverNonce = clientNonce + Base64.getEncoder.encodeToString(extra)
        serverFirst = s"r=$serverNonce,s=${Base64.getEncoder.encodeToString(salt)},i=$iterations"
        serverFirst
      }
    }
  }

  /** client-final-message → server-final "v=..." on success, None on any
    * mismatch (wrong proof, nonce, or channel-binding echo).
    */
  def clientFinal(msg: String): Option[String] = {
    val a = attrs(msg)
    val proofIdx = msg.lastIndexOf(",p=")
    for {
      c <- a.get("c")
      r <- a.get("r")
      p <- a.get("p")
      if proofIdx > 0 && r == serverNonce &&
        c == Base64.getEncoder.encodeToString(gs2Header.getBytes(UTF_8))
      withoutProof = msg.substring(0, proofIdx)
      authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      clientSig = hmac(storedKey, authMessage)
      proof = Base64.getDecoder.decode(p)
      if proof.length == clientSig.length
      recoveredKey = proof.zip(clientSig).map { case (x, y) => (x ^ y).toByte }
      if MessageDigest.isEqual(sha256(recoveredKey), storedKey)
    } yield "v=" + Base64.getEncoder.encodeToString(hmac(serverKey, authMessage))
  }
}
