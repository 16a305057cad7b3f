package graft.args

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType}

/** Job-name normalization — reference
  * `options/JobNameConfiguration.java:36-57`: lowercase, strip
  * `[^a-z0-9]`, `dbeam-<db>-<table>[-<suffix>]`.
  */
object JobName {
  private def norm(s: String): String = s.toLowerCase.replaceAll("[^a-z0-9]", "")

  def jobName(dbName: String, tableName: String, suffix: Option[String] = None): String =
    (Seq("dbeam", norm(dbName), norm(tableName)) ++ suffix.map(norm)).mkString("-")
}

/** Split-column typing rule — reference `ParallelQueryBuilder.java:63-75`:
  * ranges can only be computed over integral columns. (The reference accepts
  * INTEGER/BIGINT from JDBC metadata; the Spark seam checks the DataFrame
  * schema.)
  */
object SplitColumn {
  def validate(df: DataFrame, splitColumn: String): Unit = {
    val field = df.schema.fields.find(_.name == splitColumn).getOrElse(
      throw new IllegalArgumentException(s"Split column $splitColumn not found in schema"))
    if (!isSplittable(field.dataType))
      throw new IllegalArgumentException(
        s"Column $splitColumn should be of type INTEGER or BIGINT to use for splitting, found ${field.dataType.sql}")
  }

  def isSplittable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }
}

/** Password sources — reference `options/PasswordReader.java:41-55`:
  * priority `passwordFileKmsEncrypted` > `passwordFile` > inline
  * `password`. The decrypted password is trimmed like the reference
  * (`PasswordReader.java:47`).
  */
object PasswordReader {
  trait Decrypter { def decrypt(ciphertext: Array[Byte]): String }

  def read(
      password: Option[String],
      passwordFile: Option[String],
      encryptedPasswordFile: Option[String] = None,
      decrypter: Option[Decrypter] = None): Option[String] =
    (encryptedPasswordFile, passwordFile, password) match {
      case (Some(f), _, _) =>
        val d = decrypter.getOrElse(throw new IllegalStateException(
          "KMS decryption requires a Decrypter (GCP KMS unavailable offline)"))
        Some(d.decrypt(Files.readAllBytes(Paths.get(f))).trim)
      case (_, Some(f), _) =>
        // like the reference, trailing newline is the file's own content issue;
        // dbeam reads the raw file and strips the trailing newline
        Some(new String(Files.readAllBytes(Paths.get(f)), StandardCharsets.UTF_8)
          .stripSuffix("\n"))
      case (_, _, p) => p
    }
}

/** KMS password decryption — reference `options/KmsDecrypter.java:44-171`.
  *
  * The format pipeline is implemented faithfully: the encrypted password
  * file holds base64 ciphertext (whitespace tolerated anywhere, matching
  * `CharMatcher.whitespace().removeFrom`); the KMS backend receives
  * `(fully-qualified key name, cleaned base64 ciphertext)` and returns
  * base64 plaintext (the GCP `DecryptResponse` contract); that decodes to
  * the UTF-8 password, which [[PasswordReader]] trims. Key naming and
  * system-property configuration match the reference (`KMS_KEYRING` /
  * `KMS_KEY` / `KMS_LOCATION` / `KMS_PROJECT`, defaults
  * `dbeam`/`default`/`global`, `KmsDecrypter.java:52-58,126-131`).
  *
  * Only the HTTP transport to Cloud KMS is pluggable (no GCP SDK offline) —
  * [[KmsDecrypter.LocalAesKms]] is a behaviorally faithful local backend
  * (authenticated decryption keyed by key name) used by the specs.
  */
final case class KmsDecrypter(
    kms: KmsDecrypter.KmsService,
    location: String = sys.props.getOrElse("KMS_LOCATION", "global"),
    keyring: String = sys.props.getOrElse("KMS_KEYRING", "dbeam"),
    key: String = sys.props.getOrElse("KMS_KEY", "default"),
    project: Option[String] = sys.props.get("KMS_PROJECT"))
    extends PasswordReader.Decrypter {

  /** `projects/P/locations/L/keyRings/R/cryptoKeys/K` — `KmsDecrypter.java:126-131`. */
  def keyName: String = {
    val p = project.getOrElse(throw new IllegalStateException(
      "KMS_PROJECT is not set and no default project is detectable offline"))
    s"projects/$p/locations/$location/keyRings/$keyring/cryptoKeys/$key"
  }

  /** Base64 ciphertext → plaintext password (reference `decrypt`/`decryptBinary`). */
  def decrypt(base64Ciphertext: String): String = {
    val cleaned = base64Ciphertext.filterNot(_.isWhitespace)
    val plaintextB64 = kms.decrypt(keyName, cleaned)
    new String(java.util.Base64.getDecoder.decode(plaintextB64), StandardCharsets.UTF_8)
  }

  override def decrypt(ciphertext: Array[Byte]): String =
    decrypt(new String(ciphertext, StandardCharsets.UTF_8))
}

object KmsDecrypter {

  /** The decrypt RPC: (key name, base64 ciphertext) → base64 plaintext —
    * exactly the Cloud KMS `cryptoKeys.decrypt` request/response shape.
    */
  trait KmsService { def decrypt(keyName: String, ciphertextBase64: String): String }

  /** Local AES-GCM envelope backend: ciphertext = base64(12-byte IV ||
    * AES-GCM(plaintext)), with the AES key derived from (master key, key
    * name) — so decrypting under the wrong key name fails authentication,
    * like the real service. Test double only; not a KMS.
    */
  final class LocalAesKms(masterKey: Array[Byte]) extends KmsService {
    import javax.crypto.Cipher
    import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

    private def derivedKey(keyName: String): SecretKeySpec = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(masterKey)
      md.update(keyName.getBytes(StandardCharsets.UTF_8))
      new SecretKeySpec(md.digest().take(16), "AES")
    }

    /** Produces the file content for `--passwordFileKmsEncrypted`. */
    def encrypt(keyName: String, plaintext: String): String = {
      val iv = new Array[Byte](12)
      new java.security.SecureRandom().nextBytes(iv)
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, derivedKey(keyName), new GCMParameterSpec(128, iv))
      val ct = c.doFinal(plaintext.getBytes(StandardCharsets.UTF_8))
      java.util.Base64.getEncoder.encodeToString(iv ++ ct)
    }

    override def decrypt(keyName: String, ciphertextBase64: String): String = {
      val blob = java.util.Base64.getDecoder.decode(ciphertextBase64)
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.DECRYPT_MODE, derivedKey(keyName), new GCMParameterSpec(128, blob.take(12)))
      val plain = c.doFinal(blob.drop(12))
      java.util.Base64.getEncoder.encodeToString(plain) // response is base64 plaintext
    }
  }
}
