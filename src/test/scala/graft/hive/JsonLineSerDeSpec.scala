package graft.hive

import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.serde2.objectinspector.StructObjectInspector
import org.apache.hadoop.io.Text
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Unit coverage of the SerDe both ways, without a Hive session (the
  * metastore path itself is exercised end-to-end by p09). */
class JsonLineSerDeSpec extends AnyFunSpec with Matchers {

  private def serde(cols: String, types: String): JsonLineSerDe = {
    val sd = new JsonLineSerDe
    val props = new Properties()
    props.setProperty("columns", cols)
    props.setProperty("columns.types", types)
    sd.initialize(null, props)
    sd
  }

  private def row(sd: JsonLineSerDe, json: String): java.util.List[AnyRef] =
    sd.deserialize(new Text(json)).asInstanceOf[java.util.List[AnyRef]]

  describe("JsonLineSerDe.deserialize") {
    it("reads primitives, missing keys and JSON null as NULL") {
      val sd = serde("k,name,score,ok", "bigint,string,double,boolean")
      val r = row(sd, """{"k": 7, "name": "a", "score": 1.5, "ok": true}""")
      r.asScala shouldBe Seq(7L, "a", 1.5d, true)
      val miss = row(sd, """{"k": null}""")
      miss.asScala shouldBe Seq(null, null, null, null)
    }

    it("reads nested struct, array and map columns") {
      val sd = serde("s,a,m",
        "struct<x:bigint,y:string>,array<bigint>,map<string,string>")
      val r = row(sd,
        """{"s": {"x": 1, "y": "z"}, "a": [1, 2, 3], "m": {"p": "q"}}""")
      r.get(0).asInstanceOf[java.util.List[AnyRef]].asScala shouldBe
        Seq(1L, "z")
      r.get(1).asInstanceOf[java.util.List[AnyRef]].asScala shouldBe
        Seq(1L, 2L, 3L)
      r.get(2).asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala shouldBe
        Map("p" -> "q")
    }

    it("matches Hive's lower-cased identifiers case-insensitively") {
      val sd = serde("userid", "bigint")
      row(sd, """{"userId": 42}""").asScala shouldBe Seq(42L)
    }

    it("reads numeric JSON under a retyped STRING column as its text " +
       "form — the in-place migration contract p14 executes") {
      val sd = serde("k,v2", "string,string")
      // old-cohort file written when k was BIGINT, read post-ALTER
      row(sd, """{"k": 37}""").asScala shouldBe Seq("37", null)
      row(sd, """{"k": "37", "v2": "beta"}""").asScala shouldBe
        Seq("37", "beta")
    }

    it("rejects out-of-lattice declared types with a clear SerDeException") {
      val e = intercept[org.apache.hadoop.hive.serde2.SerDeException] {
        serde("d", "decimal(10,2)")
      }
      e.getMessage should include("unsupported primitive")
      intercept[org.apache.hadoop.hive.serde2.SerDeException] {
        serde("ts", "array<timestamp>")
      }
    }
  }

  describe("JsonLineSerDe.serialize") {
    it("round-trips a row back to an equivalent JSON document") {
      val sd = serde("k,name,a", "bigint,string,array<bigint>")
      val oi = sd.getObjectInspector.asInstanceOf[StructObjectInspector]
      val in = """{"k": 9, "name": "doc", "a": [4, 5]}"""
      val out = sd.serialize(row(sd, in), oi).toString
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.readTree(out) shouldBe m.readTree(in)
    }
  }
}
