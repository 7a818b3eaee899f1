package graft.core.security

import java.security.{KeyFactory, KeyPair, KeyPairGenerator, PrivateKey, PublicKey, SecureRandom}
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}
import javax.crypto.{Cipher, KeyGenerator}

/** Per-segment AES-256 data key + AAD pair.
  * Ref `core/.../security/AesEncryptionProvider.java:52-58`. */
final case class DataKeyAndAAD(dataKey: Array[Byte], aad: Array[Byte])

/** AES data-key generation. AES-256-GCM; a fresh data key and AAD per
  * segment. Ref `AesEncryptionProvider.java:36-101`. */
object AesEncryptionProvider {
  val KeySizeBits = 256
  val AadSize = 32
  private val random = new SecureRandom()

  def createDataKeyAndAAD(): DataKeyAndAAD = {
    val kg = KeyGenerator.getInstance("AES")
    kg.init(KeySizeBits, random)
    val aad = new Array[Byte](AadSize)
    random.nextBytes(aad)
    DataKeyAndAAD(kg.generateKey().getEncoded, aad)
  }
}

/** RSA-OAEP wrapping of data keys with a keyring + active key id, enabling
  * key rotation: old segments stay decryptable with retired private keys.
  *
  * Ref `RsaEncryptionProvider.java:42-104`: BouncyCastle's
  * `RSA/NONE/OAEPWithSHA3-512AndMGF1Padding` — SHA3-512 for both the OAEP
  * digest and the MGF1 mask. The JDK's generic `RSA/ECB/OAEPPadding` with an
  * explicit [[javax.crypto.spec.OAEPParameterSpec]] pins the same
  * parameters, so SHA3-512-wrapped blobs match the reference's construction
  * (default since r3). The pre-r3 `RSA/ECB/OAEPWithSHA-256AndMGF1Padding`
  * stays unwrappable: the manifest's `wrapAlg` field selects the cipher per
  * segment.
  */
final class RsaKeyRing(
    keyRing: Map[String, KeyPair],
    val activeKeyId: String,
    val wrapAlg: String = RsaKeyRing.WrapAlgSha3512) {
  require(keyRing.contains(activeKeyId), s"active key id $activeKeyId not in key ring")

  private def cipherFor(alg: String, mode: Int, key: java.security.Key): Cipher = alg match {
    case RsaKeyRing.WrapAlgSha256 =>
      // Self-consistent with blobs written by pre-r3 builds (SunJCE named
      // transformation); not the reference's parameters.
      val c = Cipher.getInstance("RSA/ECB/OAEPWithSHA-256AndMGF1Padding")
      c.init(mode, key)
      c
    case RsaKeyRing.WrapAlgSha3512 =>
      val c = Cipher.getInstance("RSA/ECB/OAEPPadding")
      c.init(mode, key, new javax.crypto.spec.OAEPParameterSpec(
        "SHA3-512", "MGF1", new java.security.spec.MGF1ParameterSpec("SHA3-512"),
        javax.crypto.spec.PSource.PSpecified.DEFAULT))
      c
    case other => throw new IllegalArgumentException(
      s"unknown key-wrap algorithm '$other' " +
        s"(expected ${RsaKeyRing.WrapAlgSha3512} or ${RsaKeyRing.WrapAlgSha256})")
  }

  def wrapDataKey(dataKey: Array[Byte]): (String, Array[Byte]) = {
    val cipher = cipherFor(wrapAlg, Cipher.ENCRYPT_MODE, keyRing(activeKeyId).getPublic)
    (activeKeyId, cipher.doFinal(dataKey))
  }

  def unwrapDataKey(keyId: String, wrapped: Array[Byte], alg: String = wrapAlg): Array[Byte] = {
    val pair = keyRing.getOrElse(keyId,
      throw new IllegalArgumentException(s"unknown encryption key id $keyId"))
    val cipher = cipherFor(alg, Cipher.DECRYPT_MODE, pair.getPrivate)
    cipher.doFinal(wrapped)
  }
}

object RsaKeyRing {
  /** Manifest `wrapAlg` names (`SegmentManifest` reuses these). */
  val WrapAlgSha256 = "RSA-OAEP-SHA256"
  val WrapAlgSha3512 = "RSA-OAEP-SHA3-512"

  def generate(keyIds: String*): RsaKeyRing = {
    val gen = KeyPairGenerator.getInstance("RSA")
    gen.initialize(2048)
    val ring = keyIds.map(id => id -> gen.generateKeyPair()).toMap
    new RsaKeyRing(ring, keyIds.last)
  }

  def serializePublic(k: PublicKey): Array[Byte] = k.getEncoded
  def serializePrivate(k: PrivateKey): Array[Byte] = k.getEncoded
  def deserialize(pub: Array[Byte], priv: Array[Byte]): KeyPair = {
    val kf = KeyFactory.getInstance("RSA")
    new KeyPair(kf.generatePublic(new X509EncodedKeySpec(pub)),
      kf.generatePrivate(new PKCS8EncodedKeySpec(priv)))
  }
}
