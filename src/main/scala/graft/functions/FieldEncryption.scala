package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Process-local registry of encryption keys, addressed by opaque id —
  * the only thing a plan ever carries or prints. */
object SecretKeys {
  private val byId = scala.collection.concurrent.TrieMap[Long, Array[Byte]]()
  private val ids = scala.collection.concurrent.TrieMap[String, Long]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong(0)

  def idFor(key: String): Long = ids.getOrElseUpdate(key, {
    val id = ctr.incrementAndGet()
    byId(id) = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    id
  })
  def bytesFor(id: Long): Array[Byte] =
    byId.getOrElse(id, throw new IllegalStateException(s"unknown secret key id $id"))
}

/** AES key as a plan-opaque leaf expression. A `lit(key)` literal
  * appears in plaintext wherever plans surface — explain output, the
  * Spark UI SQL tab, event logs, plan JSON. This expression's only
  * constructor argument is an opaque [[SecretKeys]] id; the key bytes
  * are resolved driver-side at construction and travel to executors as
  * a serialized field / codegen reference object, never as a printable
  * literal. Non-foldable, so the optimizer cannot constant-fold it back
  * into one. */
case class SecretKeyBytes(keyId: Long) extends LeafExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "secret_key"
  override def toString: String = s"secret_key(#$keyId)"
  override def sql: String = s"secret_key(#$keyId)"

  // resolved on the driver; serialized with the expression for
  // interpreted eval, captured as a reference object for codegen
  private val bytes: Array[Byte] = SecretKeys.bytesFor(keyId)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = bytes
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("secretKey", bytes, "byte[]")
    ev.copy(code = code"byte[] ${ev.value} = $ref;", isNull = FalseLiteral)
  }
}

/** Field-level encryption (reference
  * `internal/security/field_encryption.go`: AES on selected payload
  * fields at ingest, decrypted on result rows).
  *
  * Spark-first: the built-in `aes_encrypt`/`aes_decrypt` expressions
  * (codegen'd) run distributed — no row round-trip through a service.
  * Default mode GCM (random IV per row, authenticated — ciphertexts are
  * non-deterministic by design); pass "ECB" only if deterministic
  * ciphertext is required for equality predicates on encrypted columns.
  * Keys must be 16/24/32 bytes and are carried as [[SecretKeyBytes]],
  * never as plan literals. */
object FieldEncryption {

  /** Key column built directly from the expression — deliberately NOT
    * registered in any SQL function registry: a registry entry would let
    * any principal with SELECT access (SqlGate blocks only mutations and
    * qualified names, not functions) read raw key bytes with
    * `SELECT graft_secret_key(id)` over the trivially-enumerable
    * sequential key ids, or decrypt encrypted columns inline. The
    * expression is reachable only from this code path. */
  private def keyExpr(key: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SecretKeyBytes(SecretKeys.idFor(key)))

  def encryptCol(c: Column, key: String, mode: String = "GCM"): Column =
    base64(aes_encrypt(c.cast("string").cast("binary"), keyExpr(key), lit(mode)))

  def decryptCol(c: Column, key: String, mode: String = "GCM"): Column =
    aes_decrypt(unbase64(c), keyExpr(key), lit(mode)).cast("string")

  /** Encrypt the named fields of a frame (ingest-side hook). */
  def encryptFields(df: DataFrame, fields: Seq[String], key: String,
      mode: String = "GCM"): DataFrame =
    fields.foldLeft(df)((d, f) => d.withColumn(f, encryptCol(col(f), key, mode)))

  /** Decrypt the named fields (result-side hook). */
  def decryptFields(df: DataFrame, fields: Seq[String], key: String,
      mode: String = "GCM"): DataFrame =
    fields.foldLeft(df)((d, f) => d.withColumn(f, decryptCol(col(f), key, mode)))
}
