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
  * Ref `RsaEncryptionProvider.java:42-104`. The reference uses BouncyCastle's
  * OAEP-SHA3-512; offline we use the JDK's
  * `RSA/ECB/OAEPWithSHA-256AndMGF1Padding` — a documented deviation (same
  * construction, different hash; wrapped-key blobs are not byte-compatible
  * with the reference, manifests carry the key id so rotation semantics are
  * identical).
  */
final class RsaKeyRing(keyRing: Map[String, KeyPair], val activeKeyId: String) {
  require(keyRing.contains(activeKeyId), s"active key id $activeKeyId not in key ring")
  private val Transform = "RSA/ECB/OAEPWithSHA-256AndMGF1Padding"

  def wrapDataKey(dataKey: Array[Byte]): (String, Array[Byte]) = {
    val cipher = Cipher.getInstance(Transform)
    cipher.init(Cipher.ENCRYPT_MODE, keyRing(activeKeyId).getPublic)
    (activeKeyId, cipher.doFinal(dataKey))
  }

  def unwrapDataKey(keyId: String, wrapped: Array[Byte]): Array[Byte] = {
    val pair = keyRing.getOrElse(keyId,
      throw new IllegalArgumentException(s"unknown encryption key id $keyId"))
    val cipher = Cipher.getInstance(Transform)
    cipher.init(Cipher.DECRYPT_MODE, pair.getPrivate)
    cipher.doFinal(wrapped)
  }
}

object RsaKeyRing {
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
