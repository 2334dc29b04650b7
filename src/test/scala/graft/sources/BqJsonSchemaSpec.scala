package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** nvd_schema_parse gate (SURVEY §2.1): BQ JSON schema → StructType, every
  * type/mode branch, driven by the reference's real schema.json.
  */
class BqJsonSchemaSpec extends AnyFunSuite {

  private lazy val nvd = BqJsonSchema.parseFile(NvdEtl.DefaultSchemaPath)

  private def field(st: StructType, path: String*): StructField = {
    var cur: StructField = StructField("<root>", st)
    path.foreach { p =>
      val inner = cur.dataType match {
        case s: StructType => s
        case ArrayType(s: StructType, _) => s
        case other => fail(s"expected struct at $p, got $other")
      }
      cur = inner(p)
    }
    cur
  }

  test("reference schema.json: top-level shape") {
    assert(nvd.fieldNames.toSet ===
      Set("lastModifiedDate", "impact", "configurations", "publishedDate", "cve"))
    assert(field(nvd, "lastModifiedDate").dataType === TimestampType)
    assert(field(nvd, "publishedDate").dataType === TimestampType)
    assert(field(nvd, "cve").nullable)
  }

  test("reference schema.json: nested RECORD paths") {
    assert(field(nvd, "cve", "CVE_data_meta", "ID").dataType === StringType)
    assert(field(nvd, "cve", "data_version").dataType === DoubleType) // BQ FLOAT
    assert(field(nvd, "impact", "baseMetricV2", "cvssV2", "baseScore").dataType === DoubleType)
    assert(field(nvd, "impact", "baseMetricV2", "obtainAllPrivilege").dataType === BooleanType)
    assert(field(nvd, "impact", "baseMetricV3", "cvssV3", "baseSeverity").dataType === StringType)
  }

  test("reference schema.json: REPEATED RECORD → array<struct>, incl. doubly-nested") {
    val nodes = field(nvd, "configurations", "nodes")
    assert(nodes.dataType.isInstanceOf[ArrayType])
    assert(nodes.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType])
    // nodes[].cpe_match[] — the doubly-repeated path of the README query
    val cpeMatch = field(nvd, "configurations", "nodes", "cpe_match")
    assert(cpeMatch.dataType.isInstanceOf[ArrayType])
    assert(field(nvd, "configurations", "nodes", "cpe_match", "cpe23Uri").dataType === StringType)
    assert(field(nvd, "configurations", "nodes", "cpe_match", "vulnerable").dataType === BooleanType)
    // nodes[].children[].cpe_match[] — triple nesting
    assert(field(nvd, "configurations", "nodes", "children", "cpe_match", "cpe23Uri").dataType === StringType)
  }

  test("reference schema.json: REPEATED scalar (tags) → array<string>") {
    val tags = field(nvd, "cve", "references", "reference_data", "tags")
    assert(tags.dataType === ArrayType(StringType, containsNull = true))
  }

  test("defaults: type→STRING, mode→NULLABLE") {
    val st = BqJsonSchema.parseString("""[{"name":"bare"}]""")
    assert(st === StructType(Seq(StructField("bare", StringType, nullable = true))))
  }

  test("REQUIRED mode → non-nullable") {
    val st = BqJsonSchema.parseString(
      """[{"name":"k","type":"STRING","mode":"REQUIRED"}]""")
    assert(!st("k").nullable)
  }

  test("every scalar type branch, legacy and standard-SQL names") {
    val st = BqJsonSchema.parseString("""[
      {"name":"s","type":"STRING"}, {"name":"ts","type":"TIMESTAMP"},
      {"name":"f","type":"FLOAT"}, {"name":"f64","type":"FLOAT64"},
      {"name":"b","type":"BOOLEAN"}, {"name":"b2","type":"BOOL"},
      {"name":"i","type":"INTEGER"}, {"name":"i64","type":"INT64"},
      {"name":"num","type":"NUMERIC"}, {"name":"d","type":"DATE"},
      {"name":"by","type":"BYTES"}]""")
    assert(st("s").dataType === StringType)
    assert(st("ts").dataType === TimestampType)
    assert(st("f").dataType === DoubleType)
    assert(st("f64").dataType === DoubleType)
    assert(st("b").dataType === BooleanType)
    assert(st("b2").dataType === BooleanType)
    assert(st("i").dataType === LongType)
    assert(st("i64").dataType === LongType)
    assert(st("num").dataType === DecimalType(38, 9))
    assert(st("d").dataType === DateType)
    assert(st("by").dataType === BinaryType)
  }

  test("STRUCT alias for RECORD; empty fields → empty struct") {
    val st = BqJsonSchema.parseString(
      """[{"name":"r","type":"STRUCT","fields":[{"name":"x","type":"INT64"}]},
          {"name":"empty","type":"RECORD"}]""")
    assert(st("r").dataType === StructType(Seq(StructField("x", LongType))))
    assert(st("empty").dataType === StructType(Nil))
  }

  test("unknown type / mode rejected") {
    intercept[IllegalArgumentException] {
      BqJsonSchema.parseString("""[{"name":"x","type":"GEOGRAPHY"}]""")
    }
    intercept[IllegalArgumentException] {
      BqJsonSchema.parseString("""[{"name":"x","type":"STRING","mode":"WEIRD"}]""")
    }
  }
}
