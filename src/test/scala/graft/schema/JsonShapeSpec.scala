package graft.schema

import org.scalatest.funspec.AnyFunSpec

class JsonShapeSpec extends AnyFunSpec {

  describe("JsonShape.of") {
    it("extracts nested object shape (typed)") {
      assert(JsonShape.of("""{"a": 1, "b": {"c": [1.5, 2.5]}, "d": true}""", typed = true) ==
        Some(JStruct(Vector(
          "a" -> JLong,
          "b" -> JStruct(Vector("c" -> JArr(JDouble))),
          "d" -> JBool))))
    }
    it("collapses primitives to STRING in hive mode (CreateHQL.scala:81)") {
      assert(JsonShape.of("""{"a": 1, "b": true}""", typed = false) ==
        Some(JStruct(Vector("a" -> JStr, "b" -> JStr))))
    }
    it("merges ALL array elements (divergence from head-only CreateHQL.scala:55)") {
      assert(JsonShape.of("""[{"a": 1}, {"b": 2}]""", typed = true) ==
        Some(JArr(JStruct(Vector("a" -> JLong, "b" -> JLong)))))
    }
    it("rejects trailing garbage (stricter than org.json's tokener)") {
      assert(JsonShape.of("""{"a": 1} trailing""", typed = false).isEmpty)
      assert(JsonShape.of("""{"a": 1}{"b": 2}""", typed = false).isEmpty)
    }
    it("rejects non-JSON and empty input") {
      assert(JsonShape.of("ThisIsNotJSON", typed = false).isEmpty)
      assert(JsonShape.of("", typed = false).isEmpty)
      assert(JsonShape.of(null, typed = false).isEmpty)
    }
    it("treats an empty array as ARRAY<STRING> evidence") {
      assert(JsonShape.of("""{"a": []}""", typed = false) ==
        Some(JStruct(Vector("a" -> JArr(JNull)))))
    }
  }

  describe("JsonShape.ofRecord") {
    it("poisons top-level non-objects to JTop (vs reference ERROR DDL)") {
      assert(JsonShape.ofRecord("[1,2]", typed = false) == JTop)
      assert(JsonShape.ofRecord("42", typed = false) == JTop)
      assert(JsonShape.ofRecord("garbage", typed = false) == JTop)
    }
    it("accepts top-level objects") {
      assert(JsonShape.ofRecord("""{"k": 7}""", typed = false) ==
        JStruct(Vector("k" -> JStr)))
    }
  }
}
