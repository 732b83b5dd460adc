package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the deep-regime table-growth policy
  * ([[Dedup.adaptiveEmbTables]]): the model the policy holds constant
  * is family boundary recall 1−(1−c(b))^T(b) at exactly τ=0.8, with
  * c(b) the ≤1-bit multi-probe per-table collision. The r8 record
  * disclosed recall ≈ 0.75 at the 22-bit/2M-vector regime under fixed
  * 32 tables; the policy must hold the MODEL ≥ 0.9 at every depth the
  * bits ladder can select (the measured end-to-end point lives in the
  * scaling record via RecallProbe). */
class EmbTablePolicySpec extends AnyFunSuite {

  private val p = 1.0 - math.acos(Dedup.ProductionEmbTau) / math.Pi
  private def c(b: Int): Double =
    math.pow(p, b) + b * math.pow(p, b - 1) * (1 - p)
  private def familyRecall(b: Int): Double =
    1.0 - math.pow(1.0 - c(b), Dedup.adaptiveEmbTables(b).toDouble)

  test("every measured config through 19 bits is unchanged (32 tables)") {
    (16 to 19).foreach(b => assert(Dedup.adaptiveEmbTables(b) === 32))
  }

  test("model boundary recall ≥ 0.9 at every selectable depth") {
    (16 to 26).foreach { b =>
      assert(familyRecall(b) >= 0.9,
        s"bits=$b tables=${Dedup.adaptiveEmbTables(b)} recall=${familyRecall(b)}")
    }
  }

  test("fixed 32 tables would NOT hold the deep regime (the r8 disclosure)") {
    val fixed22 = 1.0 - math.pow(1.0 - c(22), 32.0)
    assert(fixed22 < 0.8, s"fixed-32 model at 22 bits = $fixed22")
  }

  test("table count is monotone in depth and capped") {
    (16 to 25).foreach { b =>
      assert(Dedup.adaptiveEmbTables(b) <= Dedup.adaptiveEmbTables(b + 1))
    }
    assert(Dedup.adaptiveEmbTables(22) >= 50 &&
      Dedup.adaptiveEmbTables(22) <= 64)
    assert(Dedup.adaptiveEmbTables(26) <= Dedup.MaxProbeTables)
  }
}
