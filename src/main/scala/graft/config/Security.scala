package graft.config

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

/** Settings-file crypto — behavioral re-expression of the reference's
  * pyDes scheme (utils/security.py:7-36): key = MD5(password) (16
  * bytes), cipher = two-key triple DES in ECB mode with PKCS5 padding
  * (pyDes `triple_des` defaults + `padmode=2`). JCE's DESede wants a
  * 24-byte key; the two-key form is K1‖K2‖K1, which is exactly what
  * pyDes does with a 16-byte key — so ciphertexts interoperate both
  * ways with the reference's files.
  *
  * ECB with an unsalted MD5-derived key is NOT modern cryptography;
  * parity with the reference's existing encrypted settings files is
  * the entire point. Do not use this scheme for new secrets.
  */
object Security {

  private def keySpec(password: Array[Byte]): SecretKeySpec = {
    val k16 = MessageDigest.getInstance("MD5").digest(password)
    new SecretKeySpec(k16 ++ k16.take(8), "DESede") // K1‖K2‖K1
  }

  private def cipher(mode: Int, password: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("DESede/ECB/PKCS5Padding")
    c.init(mode, keySpec(password))
    c
  }

  /** utils/security.py:13-16 (`pydes_encrypt`). */
  def encrypt(plain: Array[Byte], password: String): Array[Byte] =
    cipher(Cipher.ENCRYPT_MODE, password.getBytes(UTF_8)).doFinal(plain)

  /** utils/security.py:7-10 (`pydes_decrypt`). */
  def decrypt(cipherText: Array[Byte], password: String): Array[Byte] =
    cipher(Cipher.DECRYPT_MODE, password.getBytes(UTF_8)).doFinal(cipherText)

  /** utils/security.py:30-36 (`encrypt_json`): write `<path>.pydes`. */
  def encryptJsonFile(path: String, password: String): String = {
    val plain = Files.readAllBytes(Paths.get(path))
    val out = path + ".pydes"
    Files.write(Paths.get(out), encrypt(plain, password))
    out
  }

  /** utils/security.py:23-27 (`decrypt_json`): decrypted JSON text
    * (callers feed it to the config codecs). */
  def decryptJsonFile(path: String, password: String): String =
    new String(decrypt(Files.readAllBytes(Paths.get(path)), password), UTF_8)
}
