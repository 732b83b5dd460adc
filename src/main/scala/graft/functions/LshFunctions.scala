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
}
