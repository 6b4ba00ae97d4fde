package graft.sources.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 (RFC 5802 framing, RFC 7677 hash suite) — the
  * authentication real PostgreSQL demands since v10 (public docs
  * "SASL Authentication", `password_encryption = scram-sha-256`).
  * The reference's pooled Postgres connection authenticates through
  * exactly this exchange under psycopg (main_graph_topraq.py:94-95).
  *
  * Pure JDK crypto, both halves of the exchange:
  *
  *   C: client-first  `n,,n=<user>,r=<cnonce>`
  *   S: server-first  `r=<cnonce+snonce>,s=<b64 salt>,i=<iterations>`
  *   C: client-final  `c=biws,r=<nonce>,p=<b64 ClientProof>`
  *   S: server-final  `v=<b64 ServerSignature>`
  *
  * The server never needs the password — it stores the derived
  * verifier (StoredKey, ServerKey, salt, i), PostgreSQL's
  * pg_authid shape — and the client proves possession without ever
  * sending the password (ClientProof = ClientKey XOR
  * HMAC(StoredKey, AuthMessage)). The `v=` check runs the proof in
  * reverse: MUTUAL authentication, the client rejects a server that
  * does not hold the verifier. Verified against the RFC 7677
  * published test vector in PgWireSpec.
  */
object Scram {

  final val Mechanism = "SCRAM-SHA-256"

  /** What the server persists per user — derived once from the
    * password, which is then discarded. */
  final case class Verifier(salt: Array[Byte], iterations: Int,
                            storedKey: Array[Byte], serverKey: Array[Byte])

  /** Hi(password, salt, i) = PBKDF2-HMAC-SHA-256 (RFC 5802 §2.2). */
  def saltedPassword(password: String, salt: Array[Byte],
                     iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg.getBytes(UTF_8))
  }

  def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "xor length mismatch")
    a.zip(b).map { case (x, y) => (x ^ y).toByte }
  }

  def deriveVerifier(password: String, salt: Array[Byte],
                     iterations: Int): Verifier = {
    val sp = saltedPassword(password, salt, iterations)
    val clientKey = hmac(sp, "Client Key")
    Verifier(salt, iterations, sha256(clientKey), hmac(sp, "Server Key"))
  }

  def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** RFC 5802 §7: AuthMessage := client-first-message-bare + "," +
    * server-first-message + "," + client-final-message-without-proof */
  def authMessage(clientFirstBare: String, serverFirst: String,
                  fullNonce: String): String =
    s"$clientFirstBare,$serverFirst,c=biws,r=$fullNonce"

  /** ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage); the
    * client side holds the password and recomputes everything. */
  def clientProof(password: String, salt: Array[Byte], iterations: Int,
                  authMsg: String): Array[Byte] = {
    val sp = saltedPassword(password, salt, iterations)
    val clientKey = hmac(sp, "Client Key")
    xor(clientKey, hmac(sha256(clientKey), authMsg))
  }

  /** Server check: recover ClientKey' = proof XOR ClientSignature and
    * require SHA-256(ClientKey') == StoredKey (constant-time). */
  def verifyProof(v: Verifier, authMsg: String,
                  proof: Array[Byte]): Boolean = {
    if (proof.length != 32) return false
    val clientKey = xor(proof, hmac(v.storedKey, authMsg))
    java.security.MessageDigest.isEqual(sha256(clientKey), v.storedKey)
  }

  def serverSignature(v: Verifier, authMsg: String): Array[Byte] =
    hmac(v.serverKey, authMsg)

  def serverSignatureFromPassword(password: String, salt: Array[Byte],
                                  iterations: Int,
                                  authMsg: String): Array[Byte] =
    hmac(hmac(saltedPassword(password, salt, iterations), "Server Key"),
      authMsg)

  // ---- message formats (RFC 5802 §7; GS2 header "n,," = no channel
  // binding, which is what `c=biws` — base64("n,,") — echoes) ----

  def clientFirst(user: String, clientNonce: String): String =
    s"n,,n=${escape(user)},r=$clientNonce"

  /** → (user, clientNonce); rejects channel-binding requests the
    * fixture does not support. */
  def parseClientFirst(msg: String): (String, String) = {
    require(msg.startsWith("n,,"),
      s"unsupported GS2 header in client-first: ${msg.take(8)}")
    val attrs = parseAttrs(msg.drop(3))
    (unescape(attrs('n')), attrs('r'))
  }

  def clientFirstBare(msg: String): String = msg.drop(3)

  def serverFirst(fullNonce: String, salt: Array[Byte],
                  iterations: Int): String =
    s"r=$fullNonce,s=${b64(salt)},i=$iterations"

  /** → (fullNonce, salt, iterations). */
  def parseServerFirst(msg: String): (String, Array[Byte], Int) = {
    val attrs = parseAttrs(msg)
    (attrs('r'), unb64(attrs('s')), attrs('i').toInt)
  }

  def clientFinal(fullNonce: String, proof: Array[Byte]): String =
    s"c=biws,r=$fullNonce,p=${b64(proof)}"

  /** → (channelBinding, fullNonce, proof). */
  def parseClientFinal(msg: String): (String, String, Array[Byte]) = {
    val attrs = parseAttrs(msg)
    (attrs('c'), attrs('r'), unb64(attrs('p')))
  }

  def serverFinal(signature: Array[Byte]): String = s"v=${b64(signature)}"

  def parseServerFinal(msg: String): Array[Byte] = {
    val attrs = parseAttrs(msg)
    require(!attrs.contains('e'), s"server rejected auth: ${attrs('e')}")
    unb64(attrs('v'))
  }

  private def parseAttrs(msg: String): Map[Char, String] =
    msg.split(",").iterator.filter(_.length >= 2).map { kv =>
      require(kv.charAt(1) == '=', s"malformed SCRAM attribute: $kv")
      kv.charAt(0) -> kv.substring(2)
    }.toMap

  /** RFC 5802 username escaping: '=' → "=3D", ',' → "=2C". */
  def escape(user: String): String =
    user.replace("=", "=3D").replace(",", "=2C")

  def unescape(user: String): String =
    user.replace("=2C", ",").replace("=3D", "=")

  /** Printable nonce (RFC 5802: any printable ASCII except ','). */
  def newNonce(): String = {
    val rnd = new java.security.SecureRandom()
    val chars = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    Iterator.continually(chars(rnd.nextInt(chars.length))).take(24).mkString
  }

  /** Full server half of the SCRAM-SHA-256 exchange over pgwire
    * (AuthenticationSASL → SASLInitialResponse → SASLContinue →
    * SASLResponse → SASLFinal + AuthenticationOk), verifying the
    * client proof against the stored verifier and sending the mutual
    * server signature. Returns true on success; on ANY failure writes
    * the 28P01 ErrorResponse (best-effort — the peer may be gone) and
    * returns false. Shared by the loopback source fixture and
    * [[SparkSqlPgServer]].
    */
  def serverExchange(user: String, users: Map[String, Verifier],
                     in: java.io.DataInputStream,
                     out: java.io.DataOutputStream): Boolean = {
    def fail(msg: String): Boolean = {
      try PgWire.writeError(out, "28P01", msg)
      catch { case _: java.io.IOException => () }
      false
    }
    try {
      PgWire.writeAuthSasl(out, Seq(Mechanism))
      val init = PgWire.readMsg(in)
      if (init.tag.toChar != 'p')
        return fail(s"expected SASLInitialResponse, got '${init.tag.toChar}'")
      val (mech, cFirst) = PgWire.parseSaslInitialResponse(init.body)
      if (mech != Mechanism)
        return fail(s"unsupported SASL mechanism $mech")
      val (_, clientNonce) = parseClientFirst(cFirst)
      val verifier = users.get(user) match {
        case Some(v) => v
        case None =>
          return fail(s"password authentication failed for user \"$user\"")
      }
      val fullNonce = clientNonce + newNonce()
      val sFirst = serverFirst(fullNonce, verifier.salt, verifier.iterations)
      PgWire.writeAuthSaslContinue(out, sFirst)
      val fin = PgWire.readMsg(in)
      if (fin.tag.toChar != 'p')
        return fail(s"expected SASLResponse, got '${fin.tag.toChar}'")
      val cFinal = new String(fin.body, UTF_8)
      val (cb, nonce, proof) = parseClientFinal(cFinal)
      val cut = cFinal.lastIndexOf(",p=")
      if (cb != "biws" || nonce != fullNonce || cut < 0)
        return fail("SCRAM channel-binding/nonce mismatch")
      val authMsg = clientFirstBare(cFirst) + "," + sFirst + "," +
        cFinal.substring(0, cut)
      if (!verifyProof(verifier, authMsg, proof))
        return fail(s"password authentication failed for user \"$user\"")
      PgWire.writeAuthSaslFinal(out, serverFinal(serverSignature(verifier, authMsg)))
      PgWire.writeAuthOk(out)
      true
    } catch {
      case scala.util.control.NonFatal(e) =>
        fail(s"SCRAM exchange failed: ${e.getMessage}")
    }
  }
}
