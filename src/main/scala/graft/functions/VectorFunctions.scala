package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * `zip_with(a, b, _*_)` + `aggregate(_+_)` runs interpreted lambda
  * calls per element (HigherOrderFunction); over an O(n²) near-dup or
  * ANN candidate join that is hundreds of millions of boxed calls. This
  * expression emits a primitive fused multiply-add loop via codegen —
  * the preference order the build follows: compose built-ins < custom
  * codegen Expression < UDF.
  *
  * Accumulation is sequential in element order, matching the
  * `aggregate`-based formulation and the DuckDB oracle bit-for-bit. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared row-kernel for [[NearestCentroid]] — one static entry point
  * for interpreted eval and codegen. */
object VectorKernel {

  /** Index of the max-dot centroid (ties → lowest index; the zero
    * vector lands in cell 0). Over unit centroids, argmax dot equals
    * argmax cosine for any nonzero vector — no normalization needed. */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]]): Long = {
    val n = v.numElements()
    var best = 0
    var bd = Double.MinValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var d = 0.0
      var i = 0
      while (i < n && i < cv.length) { d += v.getDouble(i) * cv(i); i += 1 }
      if (d > bd) { bd = d; best = c }
      c += 1
    }
    best.toLong
  }

  /** Index of the max-dot centroid within the slice
    * `cents[lo, lo+len)` (ties → lowest index), returned as a GLOBAL
    * index — the two-level assignment kernel: a row's level-2 cell is
    * the best sub-centroid of its level-1 cell's slice of the flat
    * sub-centroid matrix. */
  def nearestInSlice(v: ArrayData, cents: Array[Array[Double]],
      lo: Int, len: Int): Long = {
    val n = v.numElements()
    val hi = math.min(cents.length, lo + len)
    var best = lo
    var bd = Double.MinValue
    var c = lo
    while (c < hi) {
      val cv = cents(c)
      var d = 0.0
      var i = 0
      while (i < n && i < cv.length) { d += v.getDouble(i) * cv(i); i += 1 }
      if (d > bd) { bd = d; best = c }
      c += 1
    }
    best.toLong
  }
}

/** `array<double>` vector → index of its nearest centroid (max dot) in
  * the reference-object centroid matrix.
  *
  * This replaces the crossJoin(centroids) → `max_by` groupBy spelling
  * of IVF assignment, which materialized n×cells intermediate rows
  * (205M at the 200k-vector sf10 with 1024 cells) through a partial
  * aggregate and then needed a corpus-sized JOIN to attach the cell
  * back to the vector row. As a projection the assignment is computed
  * where the row lives — no aggregate, no join, no shuffle of the
  * corpus anywhere in the IVF build. */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty, "need at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell expects array<double>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_nearest_cell"

  override def nullSafeEval(a: Any): Any =
    VectorKernel.nearestCentroid(a.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorKernel.nearestCentroid($v, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Two-level IVF assignment: (vector, level-1 cell) → global sub-cell
  * id over a FLAT sub-centroid matrix whose row `c·subPerCell + j` is
  * sub-centroid j of level-1 cell c. Same projection-not-join shape as
  * [[NearestCentroid]] — the deep-cell growth ([[graft.operators
  * .SemanticDedup]] past the coarse cap) costs one more codegen'd
  * argmax over `subPerCell` rows, never a per-row join against a
  * sub-centroid table. */
case class NearestSubCentroid(left: Expression, right: Expression,
    cents: Array[Array[Double]], subPerCell: Int)
    extends BinaryExpression {

  require(cents.nonEmpty && subPerCell > 0, "need sub-centroids")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), org.apache.spark.sql.types.LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_subcell expects (array<double>, bigint), got ($l, $r)")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_nearest_subcell"

  override def nullSafeEval(v: Any, cell: Any): Any =
    VectorKernel.nearestInSlice(v.asInstanceOf[ArrayData], cents,
      (cell.asInstanceOf[Long] * subPerCell).toInt, subPerCell)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subCentroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.VectorKernel.nearestInSlice(" +
        s"$v, $ref, (int)($cell * $subPerCell), $subPerCell);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** Register the vector functions in this session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Nearest-centroid cell id of an array<double> vector column. */
  def nearestCell(spark: SparkSession, v: Column,
      cents: Array[Array[Double]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_cell", exprs => NearestCentroid(exprs.head, cents), "built-in")
    call_function("graft_nearest_cell", v)
  }

  /** Two-level assignment: global sub-cell id of `v` among the
    * `subPerCell` sub-centroids of its level-1 `cell` in the flat
    * matrix (row `c·subPerCell + j` = sub-centroid j of cell c). */
  def nearestSubCell(spark: SparkSession, v: Column, cell: Column,
      subCents: Array[Array[Double]], subPerCell: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_subcell",
      exprs => NearestSubCentroid(exprs(0), exprs(1), subCents, subPerCell),
      "built-in")
    call_function("graft_nearest_subcell", v, cell)
  }

  /** dot(a, b) over array<double> columns — codegen'd primitive loop. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }

  /** L2 norm via the same kernel. */
  def norm(spark: SparkSession, v: Column): Column = sqrt(dot(spark, v, v))
}
