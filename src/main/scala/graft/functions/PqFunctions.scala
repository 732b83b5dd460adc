package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization kernels for the ANN family.
  *
  * A PQ code splits the (unit-normalized) vector into `m` contiguous
  * subspaces and replaces each slice with the id of its nearest
  * codebook centroid — here m ≤ 8 subspaces × ks ≤ 256 centroids, so a
  * whole vector's code PACKS INTO ONE LONG (byte i = subspace i's
  * code). That packing is the point at 100 TB: the candidate scan of
  * the IVF-PQ query path reads an 8-byte column instead of the raw
  * 256–512-byte vector — the big join's byte volume drops ~64× and raw
  * vectors are touched only for the few re-rank survivors per query
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — public method).
  *
  * Asymmetric distance (ADC): the query is NOT quantized; per query a
  * small lookup table lut[s*ks + c] = dot(q_slice_s, centroid_{s,c})
  * is computed once (ks·dim multiply-adds — microseconds), and each
  * candidate's approximate cosine is m byte-indexed lookups. Both
  * kernels are codegen'd through small static entry points (the
  * [[ShingleKernel]] pattern) so the surrounding operators stay inside
  * whole-stage codegen.
  *
  * The codebook rides in the expression as a reference object —
  * m·ks·subdim doubles ≈ 128 KB at the (8, 256, 8) config, shipped
  * once per task closure like any literal; at cluster scale the same
  * task-closure path serves (a codebook is a few hundred KB at any
  * practical config — it is trained state, not data).
  */
object PqKernel {

  /** Number of subspaces: fixed at 8 so codes pack into one long. */
  val M = 8

  /** Centroids per subspace: fixed at 256 so each code is one byte. */
  val Ks = 256

  /** Subspace bounds for a `dim`-wide vector: subspace s covers
    * [s·w, min((s+1)·w, dim)) with w = ⌈dim/M⌉ — ragged tail allowed,
    * so any dim works (64 here → 8 even slices of 8). */
  def width(dim: Int): Int = (dim + M - 1) / M

  /** Pack the nearest-centroid code of each subspace of v/‖v‖ into one
    * long. `cb(s)(c)` is centroid c of subspace s (length = that
    * subspace's width). The zero vector encodes all subspaces against
    * the raw zero slice (normalization is skipped) — deterministic. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]]): Long = {
    val dim = v.numElements()
    val w = width(dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); n2 += x * x; i += 1 }
    val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 1.0
    var codes = 0L
    var s = 0
    while (s < M) {
      val lo = s * w
      val hi = math.min(lo + w, dim)
      val cents = cb(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d2 = 0.0
        var j = lo
        while (j < hi) {
          val diff = v.getDouble(j) * inv - cent(j - lo)
          d2 += diff * diff
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes |= (best.toLong & 0xffL) << (8 * s)
      s += 1
    }
    codes
  }

  /** Pack the nearest-centroid code of each subspace of the RESIDUAL
    * v/‖v‖ − c into one long — the IVFADC form (Jégou et al. §IV):
    * residuals of a fine cell partition have a fraction of the unit
    * sphere's spread, so the same 8×256 codebook quantizes them far
    * more accurately than raw vectors (measured on the synthesized
    * corpus: mean |cosine−ADC| 0.055 raw → the residual form restores
    * deep-corpus recall). `c` must be the vector's assigned cell
    * centroid; the exact dot(q, c) term is added back at scoring time. */
  def encodeRes(v: ArrayData, cell: Long, cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]]): Long = {
    val dim = v.numElements()
    val w = width(dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); n2 += x * x; i += 1 }
    val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 1.0
    val c: Array[Double] =
      if (cell >= 0 && cell < cents.length) cents(cell.toInt)
      else Array.emptyDoubleArray
    var codes = 0L
    var s = 0
    while (s < M) {
      val lo = s * w
      val hi = math.min(lo + w, dim)
      val subCents = cb(s)
      var best = 0
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < subCents.length) {
        val cent = subCents(cc)
        var d2 = 0.0
        var j = lo
        while (j < hi) {
          val cj = if (j < c.length) c(j) else 0.0
          val diff = v.getDouble(j) * inv - cj - cent(j - lo)
          d2 += diff * diff
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = cc }
        cc += 1
      }
      codes |= (best.toLong & 0xffL) << (8 * s)
      s += 1
    }
    codes
  }

  /** ADC score: Σ_s lut[s·Ks + byte_s(codes)] — m byte-indexed adds. */
  def adc(codes: Long, lut: ArrayData): Double = {
    var score = 0.0
    var s = 0
    while (s < M) {
      val c = ((codes >>> (8 * s)) & 0xffL).toInt
      score += lut.getDouble(s * Ks + c)
      s += 1
    }
    score
  }

  /** Per-query ADC lookup table over the UNIT query: lut[s·Ks + c] =
    * dot(q_slice_s/‖q‖, centroid_{s,c}). Approximates cosine(q, v)
    * because codes quantize the unit corpus vector. */
  def lut(q: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val dim = q.numElements()
    val w = width(dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) { val x = q.getDouble(i); n2 += x * x; i += 1 }
    val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 1.0
    val out = new Array[Double](M * Ks)
    var s = 0
    while (s < M) {
      val lo = s * w
      val hi = math.min(lo + w, dim)
      val cents = cb(s)
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var j = lo
        while (j < hi) { d += q.getDouble(j) * inv * cent(j - lo); j += 1 }
        out(s * Ks + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<double>` vector → packed 8-byte PQ code (see [[PqKernel]]). */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(cb.length == PqKernel.M, s"codebook must have ${PqKernel.M} subspaces")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<double>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(a: Any): Any =
    PqKernel.encode(a.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.encode($v, $cbRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (`array<double>` vector, cell id) → packed 8-byte residual PQ code
  * against the referenced centroid matrix (see [[PqKernel.encodeRes]]).
  * Pairs with [[graft.functions.NearestCentroid]]: assignment and
  * encoding are two projections over the corpus row — no join attaches
  * the centroid. */
case class PqEncodeRes(left: Expression, right: Expression,
    cents: Array[Array[Double]], cb: Array[Array[Array[Double]]])
    extends BinaryExpression {

  require(cb.length == PqKernel.M, s"codebook must have ${PqKernel.M} subspaces")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode_res expects (array<double>, long), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_encode_res"

  override def nullSafeEval(v: Any, cell: Any): Any =
    PqKernel.encodeRes(v.asInstanceOf[ArrayData], cell.asInstanceOf[Long], cents, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCentroids", cents, "double[][]")
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.PqKernel.encodeRes($v, $cell, $centsRef, $cbRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `array<double>` query vector → ADC lookup table (`array<double>` of
  * M·Ks) for [[PqAdc]] — evaluated once per QUERY row. */
case class PqLut(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(cb.length == PqKernel.M, s"codebook must have ${PqKernel.M} subspaces")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(a: Any): Any =
    PqKernel.lut(a.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.lut($v, $cbRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (packed codes, lut) → approximate cosine — the candidate-scan
  * scorer: 8 byte-indexed lookups, no vector access. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (long, array<double>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqKernel.adc(codes.asInstanceOf[Long], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.PqKernel.adc($c, $l);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqFunctions {

  // The codebook is trained state, not a SQL literal — the registry
  // builder closes over it (resolution happens at Dataset creation, so
  // re-registration for a different codebook cannot retarget an
  // already-built plan; the expression itself carries the codebook to
  // executors as a reference object).

  /** Packed 8-byte PQ code of an `array<double>` vector column. */
  def pqEncode(spark: SparkSession, v: Column,
      cb: Array[Array[Array[Double]]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode", exprs => PqEncode(exprs.head, cb), "built-in")
    call_function("graft_pq_encode", v)
  }

  /** Packed 8-byte residual PQ code of (vector, cell id). */
  def pqEncodeRes(spark: SparkSession, v: Column, cell: Column,
      cents: Array[Array[Double]], cb: Array[Array[Array[Double]]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode_res",
      exprs => PqEncodeRes(exprs(0), exprs(1), cents, cb), "built-in")
    call_function("graft_pq_encode_res", v, cell)
  }

  /** Per-query ADC lookup table column (M·Ks doubles). */
  def pqLut(spark: SparkSession, q: Column,
      cb: Array[Array[Array[Double]]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_lut", exprs => PqLut(exprs.head, cb), "built-in")
    call_function("graft_pq_lut", q)
  }

  /** Approximate cosine of (packed codes, lut) — no vector access. */
  def pqAdc(spark: SparkSession, codes: Column, lut: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_adc", exprs => PqAdc(exprs(0), exprs(1)), "built-in")
    call_function("graft_pq_adc", codes, lut)
  }
}
