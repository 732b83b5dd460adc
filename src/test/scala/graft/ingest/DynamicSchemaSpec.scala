package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.ingest.DynamicSchema._

class DynamicSchemaSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("sanitize: specials to underscore, lowercased, digit-leading prefixed") {
    assert(sanitizeName("User Name") == "user_name")
    assert(sanitizeName("order-id") == "order_id")
    assert(sanitizeName("精度") == "__")
    assert(sanitizeName("2fast") == "f_2fast")
    assert(sanitizeName("") == "f_")
  }

  test("collisions get _2 suffix in first-appearance order (reference buffer_test.go:531-568)") {
    val names = assignNames(Seq("user name", "user_name", "user-name"))
    assert(names("user name") == "user_name")
    assert(names("user_name") == "user_name_2")
    assert(names("user-name") == "user_name_3")
  }

  test("system-column collisions are suffixed (reference TestMarshalRowToJSON_SystemColumnsNotOverwritten)") {
    val names = assignNames(Seq("table_name", "id", "timestamp", "date"))
    assert(names("table_name") == "table_name_2")
    assert(names("id") == "id_2")
    assert(names("timestamp") == "timestamp_2")
    assert(names("date") == "date_2")
  }

  test("all numerics widen to double; mixed scalar types widen to JSON text") {
    assert(typeOf(1).contains(VNum))
    assert(typeOf(1L).contains(VNum))
    assert(typeOf(1.5).contains(VNum))
    assert(typeOf(true).contains(VBool))
    assert(typeOf("x").contains(VStr))
    assert(typeOf(Map("a" -> 1)).contains(VJson))
    assert(widen(VNum, VNum) == VNum)
    assert(widen(VNum, VStr) == VJson)
    assert(widen(VBool, VNum) == VJson)
  }

  test("convert: ints become doubles (proto-Struct float64 semantics)") {
    assert(convert(7, VNum) == 7.0)
    assert(convert(7L, VNum) == 7.0)
    assert(convert(Map("c" -> "x"), VJson) == """{"c":"x"}""")
    assert(convert(Seq(1, 2), VJson) == "[1,2]")
  }

  test("toJson escapes control characters and quotes") {
    assert(toJson("a\"b\n") == "\"a\\\"b\\n\"")
    assert(toJson(null) == "null")
    assert(toJson(Map("k" -> Seq(true, null))) == """{"k":[true,null]}""")
  }

  test("property: sanitized names always match parquet-safe pattern") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      assert(sanitizeName(s).matches("[a-z0-9_]+|f_[a-z0-9_]*"), s"input: '$s'")
    }
  }

  test("property: assignNames is injective (no two keys share a column)") {
    samples(Gen.listOfN(20, Gen.oneOf("a b", "a_b", "A-B", "id", "x", "y "))).foreach { keys =>
      val distinctKeys = keys.distinct
      val names = assignNames(distinctKeys)
      assert(names.values.toSeq.distinct.size == distinctKeys.size)
    }
  }
}
