package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field-level encryption (reference
  * `internal/security/field_encryption.go`: AES on selected payload
  * fields at ingest, decrypted on result rows).
  *
  * Spark-first: the built-in `aes_encrypt`/`aes_decrypt` expressions
  * (codegen'd) run distributed — no row round-trip through a service.
  * Default mode GCM (random IV per row, authenticated — ciphertexts are
  * non-deterministic by design); pass "ECB" only if deterministic
  * ciphertext is required for equality predicates on encrypted columns.
  * Keys must be 16/24/32 bytes. */
object FieldEncryption {

  def encryptCol(c: Column, key: String, mode: String = "GCM"): Column =
    base64(aes_encrypt(c.cast("string").cast("binary"), lit(key), lit(mode)))

  def decryptCol(c: Column, key: String, mode: String = "GCM"): Column =
    aes_decrypt(unbase64(c), lit(key), lit(mode)).cast("string")

  /** Encrypt the named fields of a frame (ingest-side hook). */
  def encryptFields(df: DataFrame, fields: Seq[String], key: String,
      mode: String = "GCM"): DataFrame =
    fields.foldLeft(df)((d, f) => d.withColumn(f, encryptCol(col(f), key, mode)))

  /** Decrypt the named fields (result-side hook). */
  def decryptFields(df: DataFrame, fields: Seq[String], key: String,
      mode: String = "GCM"): DataFrame =
    fields.foldLeft(df)((d, f) => d.withColumn(f, decryptCol(col(f), key, mode)))
}
