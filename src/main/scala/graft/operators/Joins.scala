package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as single primitives, composed from
  * built-ins per the preference order (compose > custom plan > UDF).
  */
object Joins {

  /** As-of join: for each left row, the single latest right row with
    * `rightTime <= leftTime`, per join key.
    *
    * Implementation is the scalable union-scan formulation — NOT the
    * naive range join (which explodes to |L|·|R| per key before
    * aggregation):
    *   1. tag and union both sides (one shuffle on (key, time)),
    *   2. one window pass carries the last-seen right payload forward,
    *   3. keep left rows.
    * Wall-clock is one sort-shuffle of |L|+|R| — the same shape Flink's
    * temporal join and kdb's aj use. Right payload columns come back
    * null when no right row precedes the left row.
    *
    * @param leftTime/rightTime event-time columns (same type)
    * @param keys equi-join key column names present on both sides
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      keys: Seq[String]): DataFrame = {
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val leftCols = left.columns
    require(rightPayload.intersect(leftCols).isEmpty,
      s"asOf: right payload columns ${rightPayload.mkString(",")} must not " +
        "collide with left columns — alias before joining")
    val reserved = Seq("__r", "__t", "__side")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      s"asOf: column names ${reserved.mkString(",")} are reserved")
    // The whole right payload is carried as ONE struct: carrying columns
    // independently with last(ignoreNulls) would let a NULL field in the
    // matched right row resurrect a stale value from an older row —
    // fields must travel together, exactly like a join row would.
    val lNorm = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        keys.map(col) ++ Seq(col("__t"), col("__side")) ++
          leftCols.filterNot(keys.contains).map(c => col(c)) :+
          lit(null).cast(org.apache.spark.sql.types.StructType(
            rightPayload.map(c => org.apache.spark.sql.types.StructField(
              c, right.schema(c).dataType)))).as("__r"): _*)
    val rNorm = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        keys.map(col) ++ Seq(col("__t"), col("__side")) ++
          leftCols.filterNot(keys.contains).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightPayload.map(col): _*).as("__r"): _*)
    // right rows sort before left rows at equal times (side 0 < 1), so a
    // right row AT the left timestamp is visible to it (<= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lNorm.unionByName(rNorm)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          rightPayload.map(c => col("__r").getField(c).as(c))): _*)
  }

  /** Salted equi-join for skewed keys: the big side gets a random-free,
    * deterministic salt from its row content; the small side is
    * replicated `saltFactor` times. A hot key's rows then spread over
    * `saltFactor` reducers instead of one. (AQE skew-join handles sort-
    * merge skew automatically; explicit salting remains necessary for
    * deliberate distribution control, e.g. before a groupBy on the join
    * output.) */
  def salted(
      big: DataFrame, small: DataFrame,
      key: String, saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
