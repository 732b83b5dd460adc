package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Process-wide cache of hash-derived hyperplane matrices.
  *
  * A plane component is a pure function of (seed, plane, dim) —
  * `xxhash64(seed, plane, dim)` scaled into [-1, 1) — so the matrix is
  * row-independent and must NOT be recomputed per input row (the
  * expression-composition formulation did exactly that: tables×bits×dim
  * chained hashes per row; hoisting them here turns signature
  * computation into a tight multiply-add loop). Deterministic: no RNG,
  * same planes in every JVM, so executor- and driver-side evaluation
  * agree bit-for-bit. */
object HyperplanePlanes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  /** Matrix [nPlanes][dim]; component = signed xxhash64 chain / Long.Max. */
  def get(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, nPlanes, dim), _ => {
      val h0 = XXH64.hashLong(seed, 42L) // 42 = Spark's xxhash64 default seed
      Array.tabulate(nPlanes) { i =>
        val hi = XXH64.hashLong(i.toLong, h0)
        Array.tabulate(dim)(d =>
          XXH64.hashLong(d.toLong, hi).toDouble / Long.MaxValue.toDouble)
      }
    })
}

/** `tables` LSH signatures of `bits` sign-bits each for an
  * `array<double>` vector — output `array<long>` of length `tables`,
  * element t = Σ_p (1<<p)·[v · plane(t·bits+p) > 0].
  *
  * Codegen emits one fused loop over (table, bit, dim) against the
  * cached plane matrix: per row cost is exactly tables·bits·dim
  * multiply-adds, no hashing, no allocation beyond the result array. */
case class HyperplaneSigs(child: Expression, seed: Long, bits: Int, tables: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
  require(tables >= 1, s"tables must be >= 1, got $tables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sigs expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_sigs"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val planes = HyperplanePlanes.get(seed, tables * bits, n)
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        val plane = planes(t * bits + p)
        var s = 0.0
        var d = 0
        while (d < n) { s += v.getDouble(d) * plane(d); d += 1 }
        if (s > 0) sig |= 1L << p
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val planes = ctx.freshName("planes")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val pl = ctx.freshName("pl")
      s"""
         |int $n = $v.numElements();
         |double[][] $planes =
         |  graft.functions.HyperplanePlanes.get(${seed}L, ${tables * bits}, $n);
         |long[] $sigs = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $bits; $p++) {
         |    double[] $pl = $planes[$t * $bits + $p];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) { $s += $v.getDouble($d) * $pl[$d]; }
         |    if ($s > 0) $sig |= 1L << $p;
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared row-kernel for [[HashedShingles]] — one static entry point
  * used by both interpreted eval and codegen (the generated code calls
  * it, keeping the surrounding operators inside whole-stage codegen
  * without inlining a large loop body). */
object ShingleKernel {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Distinct 64-bit hashes of word k-shingles of a token array —
    * value-identical to the composition
    * `transform(array_distinct(transform(sequence(...), i =>
    * array_join(slice(toks, i, k), " "))), xxhash64)`: same shingle
    * strings (space-joined, null tokens skipped like array_join), same
    * xxhash64 seed, same first-occurrence order. The only divergence is
    * a 2⁻⁶⁴-probability hash collision between distinct shingles (the
    * composition would keep both longs, this dedupes on the hash). */
  def hashedShingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      val sh = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      seen.add(XXH64.hashUTF8String(sh, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    var p = 0
    val it = seen.iterator()
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct hashed word k-shingles of a token array in ONE fused pass —
  * output `array<long>`. Replaces a 4-layer interpreted HOF chain
  * (shingle transform → array_join → array_distinct → hash transform)
  * that materialized every shingle STRING and ran boxed lambda calls
  * per element; this builds each shingle once, hashes it, and dedupes
  * longs — the dominant map stage of both the MinHash and the n-gram
  * dedup plans. */
case class HashedShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any =
    ShingleKernel.hashedShingles(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleKernel.hashedShingles($v, $k);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All `numHashes` MinHash signature slots in one fused pass — output
  * `array<long>`, element i = min over the input 64-bit shingle hashes
  * of permutation i. Bit-identical to the expression-composed form
  * `array_min(transform(hs, h => xxhash64(lit(i), h)))` (permutation
  * seed chain: `hashInt(i, 42)` then `hashLong(h, seed_i)`) — but the
  * composed form runs `numHashes` interpreted higher-order lambdas per
  * row; this is one codegen'd loop with the seeds hoisted. An empty
  * shingle set yields all-null slots, matching `array_min([]) = null`. */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<long>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  // permutation seeds: xxhash64's fold of the INT literal i onto the
  // default seed 42, hoisted once per JVM
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var d = 0
    while (d < n) {
      // null shingle element: xxhash64 SKIPS null inputs, so the composed
      // form's hash is just the folded seed — matching that (instead of
      // reading the undefined slot) keeps the claimed bit-identity with
      // array_min(transform(hs, h => xxhash64(lit(i), h)))
      val isNull = v.isNullAt(d)
      val h = if (isNull) 0L else v.getLong(d) // hoisted: read once per element
      var i = 0
      while (i < numHashes) {
        val x = if (isNull) seeds(i) else XXH64.hashLong(h, seeds(i))
        if (x < mins(i)) mins(i) = x
        i += 1
      }
      d += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      s"""
         |int $n = $v.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$numHashes]);
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $d = 0; $d < $n; $d++) {
         |    boolean ${h}Null = $v.isNullAt($d);
         |    long $h = ${h}Null ? 0L : $v.getLong($d);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $x = ${h}Null ? $seedsRef[$i]
         |        : org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, $seedsRef[$i]);
         |      if ($x < $mins[$i]) $mins[$i] = $x;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array in one fused pass: per token
  * `h = xxhash64(token)`, per bit b a ±1 count of `(h >> b) & 1`, sign
  * of each count becomes bit b. Bit-identical to the explode +
  * 64-bit-sum-aggregate formulation (same per-token hash, same sign
  * rule) minus its per-token shuffle. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      // null token: xxhash64 skips null inputs → hash stays the seed
      val h = if (v.isNullAt(i)) 42L else XXH64.hashUTF8String(v.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $v.isNullAt($i) ? 42L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
         |        $v.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] > 0) $sig |= 1L << $b; }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshFunctions {

  /** Build HyperplaneSigs from SQL-registry expressions (last three must
    * be foldable literals). */
  def fromExprs(exprs: Seq[Expression]): HyperplaneSigs = {
    require(exprs.length == 4,
      s"graft_lsh_sigs expects (vec, seed, bits, tables), got ${exprs.length} args")
    def asLong(e: Expression, name: String): Long = {
      require(e.foldable, s"graft_lsh_sigs: $name must be a literal")
      e.eval(null) match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case other => throw new IllegalArgumentException(
          s"graft_lsh_sigs: $name must be integral, got $other")
      }
    }
    HyperplaneSigs(exprs.head, asLong(exprs(1), "seed"),
      asLong(exprs(2), "bits").toInt, asLong(exprs(3), "tables").toInt)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_sigs", fromExprs, "built-in")

  /** Signature array column: `tables` × `bits`-bit signatures of `v`. */
  def lshSigs(spark: SparkSession, v: Column, seed: Long, bits: Int, tables: Int): Column = {
    register(spark)
    call_function("graft_lsh_sigs", v, lit(seed), lit(bits), lit(tables))
  }

  def shinglesFromExprs(exprs: Seq[Expression]): HashedShingles = {
    require(exprs.length == 2,
      s"graft_shingles expects (array<string>, k), got ${exprs.length} args")
    HashedShingles(exprs.head, asLongArg(exprs(1), "k").toInt)
  }

  /** Distinct hashed k-shingles of a token array, one fused kernel. */
  def hashedShingles(spark: SparkSession, toks: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", shinglesFromExprs, "built-in")
    call_function("graft_shingles", toks, lit(k))
  }

  /** Shared SQL-registry builders (used by both the session-extension
    * registration and the per-call fallback — one validation path). */
  def minhashFromExprs(exprs: Seq[Expression]): MinHashSigs = {
    require(exprs.length == 2,
      s"graft_minhash expects (array<long>, numHashes), got ${exprs.length} args")
    MinHashSigs(exprs.head, asLongArg(exprs(1), "numHashes").toInt)
  }

  def simhashFromExprs(exprs: Seq[Expression]): SimHashSig = {
    require(exprs.length == 1,
      s"graft_simhash expects (array<string>), got ${exprs.length} args")
    SimHashSig(exprs.head)
  }

  private def asLongArg(e: Expression, name: String): Long = {
    require(e.foldable, s"$name must be a literal")
    e.eval(null) match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
      case other => throw new IllegalArgumentException(
        s"$name must be integral, got $other")
    }
  }

  /** All MinHash slots of a hashed-shingle array in one fused kernel. */
  def minhashSigs(spark: SparkSession, hs: Column, numHashes: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashFromExprs, "built-in")
    call_function("graft_minhash", hs, lit(numHashes))
  }

  /** 64-bit SimHash of a token array in one fused kernel. */
  def simhashSig(spark: SparkSession, tokens: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", simhashFromExprs, "built-in")
    call_function("graft_simhash", tokens)
  }
}
