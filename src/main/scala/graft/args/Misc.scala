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
  * priority `passwordFile` > inline `password`. The KMS-encrypted variant
  * (`passwordFileKmsEncrypted`, `options/KmsDecrypter.java`) requires GCP
  * SDKs that are out of scope offline; the hook is kept as an interface.
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
        Some(d.decrypt(Files.readAllBytes(Paths.get(f))))
      case (_, Some(f), _) =>
        // like the reference, trailing newline is the file's own content issue;
        // dbeam reads the raw file and strips the trailing newline
        Some(new String(Files.readAllBytes(Paths.get(f)), StandardCharsets.UTF_8)
          .stripSuffix("\n"))
      case (_, _, p) => p
    }
}
