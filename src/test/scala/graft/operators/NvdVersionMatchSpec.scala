package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.NvdEtl

/** Tree-semantics gates for q_nvd_version_match (SURVEY §2.1): the
  * committed fixture grades operator/negate shapes cross-engine via the
  * DuckDB oracle; this spec drives the shapes the fixture does NOT carry
  * (AND children, multi-entry AND own lists, negate under AND) from tiny
  * generated feeds, and pins the flat-OR vs config-tree DISAGREEMENT on
  * the committed fixture so the discriminating cases can never silently
  * vanish from the corpus.
  */
class NvdVersionMatchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def writeFeed(name: String, items: String*): String = {
    val dir = TestSpark.tmpDir(name)
    val path = s"$dir/$name.json.gz"
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(path))
    out.write(
      (s"""{"CVE_data_type":"CVE","CVE_Items":[${items.mkString(",")}]}""")
        .getBytes("UTF-8"))
    out.close()
    path
  }

  private def item(id: String, nodesJson: String): String =
    s"""{"cve":{"CVE_data_meta":{"ID":"$id"}},
       |"configurations":{"nodes":[$nodesJson]}}""".stripMargin

  private def cpe(product: String, uriVer: String, vulnerable: Boolean,
      bounds: String = ""): String =
    s"""{"vulnerable":$vulnerable,
       |"cpe23Uri":"cpe:2.3:a:v:$product:$uriVer:*:*:*:*:*:*:*"$bounds}"""
      .stripMargin

  private def run(path: String) =
    Nvd.versionMatchOver(spark, NvdEtl.ingest(spark, path))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  test("AND node: a child that merely names another product vetoes the " +
      "conjunction (running-on x vulnerable-to)") {
    // child1 carries the vulnerable product4 range; child2 is the
    // running-on OS. A single-product probe cannot satisfy both — the
    // flat-OR reading counts product4@2.0, the tree must not.
    val path = writeFeed("vm_and_children",
      item("CVE-9000-0001",
        s"""{"operator":"AND","children":[
           |{"operator":"OR","negate":false,"cpe_match":[
           |  ${cpe("product4", "*", vulnerable = true,
                ""","versionStartIncluding":"1.0.0","versionEndExcluding":"3.0.0"""")}]},
           |{"operator":"OR","negate":false,"cpe_match":[
           |  ${cpe("linux_kernel", "*", vulnerable = false)}]}
           |]}""".stripMargin),
      // conjunction of ONE vulnerable child: the probe satisfies the
      // whole node, so AND nodes are not unconditionally dead
      item("CVE-9000-0002",
        s"""{"operator":"AND","children":[
           |{"operator":"OR","negate":false,"cpe_match":[
           |  ${cpe("product5", "5.0.2", vulnerable = true)}]}
           |]}""".stripMargin))
    val got = run(path)
    assert(!got.contains(("product4", "2.0")))
    assert(got(("product5", "5.0.2")) === 1L)
  }

  test("AND child: every entry of the child must apply, and an unmatched " +
      "child cannot donate its vulnerable flag") {
    val andChild = (hi: String) =>
      s"""{"operator":"OR","cpe_match":[
         |  ${cpe("product6", "7.0.5", vulnerable = false)}]},
         |{"operator":"AND","negate":false,"cpe_match":[
         |  ${cpe("product2", "*", vulnerable = true,
              ""","versionStartIncluding":"2.0.0","versionEndExcluding":"3.0.0"""")},
         |  ${cpe("product2", "*", vulnerable = true,
              s""","versionStartIncluding":"2.100.0","versionEndExcluding":"$hi"""")}]}
         |""".stripMargin
    val path = writeFeed("vm_and_child_entries",
      // probe 2.150.1 inside BOTH entry ranges → child matches → hit
      item("CVE-9000-0003",
        s"""{"operator":"OR","children":[${andChild("2.200.0")}]}"""),
      // probe inside entry1 only (entry2 ends at 2.150.0) → AND child
      // unmatched → its vulnerable entries don't count → no hit, even
      // though the node's own OR list has an applying (non-vulnerable)
      // product6 entry for a different probe
      item("CVE-9000-0004",
        s"""{"operator":"OR","children":[${andChild("2.150.0")}]}"""))
    val got = run(path)
    assert(got(("product2", "2.150.1")) === 1L)
  }

  test("negated child vetoes under an AND node exactly as under OR") {
    val path = writeFeed("vm_neg_under_and",
      item("CVE-9000-0005",
        s"""{"operator":"AND","cpe_match":[
           |  ${cpe("product0", "*", vulnerable = true,
                ""","versionEndExcluding":"1.0.0"""")}],
           |"children":[
           |{"operator":"OR","negate":true,"cpe_match":[
           |  ${cpe("product0", "*", vulnerable = false,
                ""","versionStartIncluding":"0.4.0","versionEndExcluding":"0.6.0"""")}]}
           |]}""".stripMargin),
      // same shape, carve-out range NOT covering the probe → hit stands
      item("CVE-9000-0006",
        s"""{"operator":"AND","cpe_match":[
           |  ${cpe("product0", "*", vulnerable = true,
                ""","versionEndExcluding":"1.0.0"""")}],
           |"children":[
           |{"operator":"OR","negate":true,"cpe_match":[
           |  ${cpe("product0", "*", vulnerable = false,
                ""","versionStartIncluding":"0.6.0","versionEndExcluding":"0.8.0"""")}]}
           |]}""".stripMargin))
    val got = run(path)
    assert(got(("product0", "0.5")) === 1L) // only CVE-9000-0006
  }

  test("AND node over its OWN entry list: every entry must apply") {
    val path = writeFeed("vm_and_own",
      // both ranges contain 1.0 → hit
      item("CVE-9000-0007",
        s"""{"operator":"AND","cpe_match":[
           |  ${cpe("device1", "*", vulnerable = true,
                ""","versionStartIncluding":"0.5.0","versionEndExcluding":"2.0.0"""")},
           |  ${cpe("device1", "*", vulnerable = true,
                ""","versionStartIncluding":"1.0.0","versionEndExcluding":"3.0.0"""")}]}"""
          .stripMargin),
      // first range ends BELOW 1.0 → conjunction fails → no hit
      item("CVE-9000-0008",
        s"""{"operator":"AND","cpe_match":[
           |  ${cpe("device1", "*", vulnerable = true,
                ""","versionStartIncluding":"0.5.0","versionEndExcluding":"1.0.0"""")},
           |  ${cpe("device1", "*", vulnerable = true,
                ""","versionStartIncluding":"0.5.0","versionEndExcluding":"3.0.0"""")}]}"""
          .stripMargin))
    val got = run(path)
    assert(got(("device1", "1.0")) === 1L) // only CVE-9000-0007
  }

  test("committed fixture: the config-tree answer DISAGREES with the " +
      "flat-OR reading on the odd-k AND nodes") {
    val cves = NvdEtl.ingest(spark, NvdEtl.FixturePath)
    // tree answer (the graded query)
    val tree = Nvd.versionMatchOver(spark, cves).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tree(("linux_kernel", "5.4")) === 5L)
    assert(tree(("device1", "1.0")) === 2L)
    // flat-OR reading, recomputed in-driver over the collected entry
    // relation (the fixture is 96 CVEs): any reachable vulnerable
    // applying entry hits, ignoring operator and child identity
    def vnum(v: String): Long = {
      val p = v.split("\\.")
      def at(i: Int) = if (p.length > i && p(i).nonEmpty) p(i).toLong else 0L
      at(0) * 1000000L + at(1) * 1000L + at(2)
    }
    val nd = cves
      .select(NvdEtl.cveId.as("cve_id"),
        explode(col("configurations.nodes")).as("nd"))
    val entries = nd.filter(col("nd.cpe_match").isNotNull)
      .select(col("cve_id"), explode(col("nd.cpe_match")).as("m"))
      .unionAll(nd.filter(col("nd.children").isNotNull)
        .select(col("cve_id"), explode(col("nd.children")).as("ch"))
        .filter(col("ch.cpe_match").isNotNull)
        .select(col("cve_id"), explode(col("ch.cpe_match")).as("m")))
      .select(col("cve_id"), col("m.vulnerable").as("vul"),
        split(col("m.cpe23Uri"), ":").getItem(4).as("product"),
        split(col("m.cpe23Uri"), ":").getItem(5).as("uver"),
        col("m.versionEndExcluding").as("ee"),
        col("m.versionEndIncluding").as("ei"),
        col("m.versionStartIncluding").as("si"),
        col("m.versionStartExcluding").as("se"))
      .collect()
    def flatCount(product: String, qv: String): Long = {
      val q = vnum(qv)
      entries.iterator.filter { r =>
        val vul = r.getAs[Boolean]("vul")
        val p = r.getAs[String]("product")
        val bounds = Seq("ee", "ei", "si", "se").map(r.getAs[String])
        val ranged = bounds.exists(_ != null)
        val applies =
          if (ranged)
            (bounds(2) == null || q >= vnum(bounds(2))) &&
              (bounds(3) == null || q > vnum(bounds(3))) &&
              (bounds(1) == null || q <= vnum(bounds(1))) &&
              (bounds(0) == null || q < vnum(bounds(0)))
          else r.getAs[String]("uver") == qv
        vul && p == product && applies
      }.map(_.getAs[String]("cve_id")).toSet.size.toLong
    }
    // AND-node disagreements: the flat reading counts the odd-k
    // running-on children as hits, the tree does not
    assert(flatCount("linux_kernel", "5.4") === 9L)
    assert(flatCount("device1", "1.0") === 5L)
    // negate disagreement (the r10 k=76 case): flat-OR also ignores the
    // negated child's carve-out, so product4@2.0 reads one higher flat
    assert(tree(("product4", "2.0")) === 4L)
    assert(flatCount("product4", "2.0") === 5L)
    // an OR-node probe with no carve-out in range agrees between readings
    assert(tree(("product0", "0.5")) === flatCount("product0", "0.5"))
  }
}
