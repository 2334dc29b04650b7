package graft.sources

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Deterministic NVD-feed fixture generator.
  *
  * Emits gzipped JSON feeds in the exact NVD 1.1 shape the reference ingests
  * (reference bq_nvd/etl.py:19-49: a single JSON object whose `CVE_Items`
  * array carries the CVE records, one per schema.json item) so both Spark
  * (schema-driven gz JSON read) and DuckDB (the correctness oracle) read the
  * same bytes. No RNG — every field is index arithmetic, so the fixture is
  * reproducible byte-for-byte and committed to the repo.
  *
  * Structural coverage knobs (per CVE index k):
  *  - k % 3 == 0   → a linux cpe23Uri in nodes[].cpe_match[]  (README query hits)
  *  - k % 7 == 0   → a linux cpe23Uri ONLY in nodes[].children[].cpe_match[]
  *                   (the README query must NOT hit these — children is a
  *                   different repeated path)
  *  - k % 11 == 0  → configurations.nodes = [] (empty repeated)
  *  - k % 13 == 0  → impact omitted entirely (NULLABLE record)
  *  - k % 17 == 0  → description/problemtype entries in a second language
  *  - k even       → the vendor/product match is RANGED ('*' URI version +
  *                   version bounds, family cycling on k%8 over all four
  *                   schema.json bounds incl. a minor>=100 bound that
  *                   mis-ranks under naive major*100+minor packing);
  *                   k odd → pinned exact 3-component URI version
  *  - k % 7 == 0   → children also carry ranged entries ([start,end) and
  *                   (start,end] shapes) so the children-level bounds of
  *                   schema.json:245-260 are populated
  *  - k % 19 == 0  → a NEGATED child (schema.json `negate`) carving the
  *                   [2.0.0, 3.0.0) series out of the node's own product —
  *                   the flat-vs-config-tree disagreement case
  *                   q_nvd_version_match grades
  */
object NvdFixtureGen {

  private val mapper = new ObjectMapper()

  private def pad2(n: Int): String = f"$n%02d"

  private def tsOf(year: Int, k: Int): String =
    s"$year-${pad2((k % 12) + 1)}-${pad2((k % 28) + 1)}T${pad2(k % 24)}:${pad2((k * 7) % 60)}:00Z"

  /** One cpe_match entry carrying any subset of the four NVD range bounds
    * (schema.json:206-221 at the node level, :245-260 in children) — real
    * feeds mix pinned-URI matches (no bounds) with half-open and closed
    * version intervals, and the bounds appear independently.
    */
  private def cpeMatch(arr: ArrayNode, uri: String, vulnerable: Boolean,
      endExcluding: Option[String] = None,
      endIncluding: Option[String] = None,
      startIncluding: Option[String] = None,
      startExcluding: Option[String] = None): Unit = {
    val m = arr.addObject()
    m.put("vulnerable", vulnerable)
    m.put("cpe23Uri", uri)
    endExcluding.foreach(v => m.put("versionEndExcluding", v))
    endIncluding.foreach(v => m.put("versionEndIncluding", v))
    startIncluding.foreach(v => m.put("versionStartIncluding", v))
    startExcluding.foreach(v => m.put("versionStartExcluding", v))
  }

  /** One CVE item in schema.json's exact shape. */
  private def cveItem(k: Int): ObjectNode = {
    val year = 2002 + (k % 24)
    val id = s"CVE-$year-${1000 + k}"
    val item = mapper.createObjectNode()

    // --- cve record (schema.json:319-446) ---
    val cve = item.putObject("cve")
    cve.put("data_type", "CVE")
    cve.put("data_format", "MITRE")
    cve.put("data_version", 4.0)
    val meta = cve.putObject("CVE_data_meta")
    meta.put("ID", id)
    meta.put("ASSIGNER", if (k % 4 == 0) "security@vendor.example" else "cve@mitre.example")
    val pt = cve.putObject("problemtype").putArray("problemtype_data")
    val ptDesc = pt.addObject().putArray("description")
    val cwe = ptDesc.addObject()
    cwe.put("lang", "en"); cwe.put("value", s"CWE-${(k * 13) % 400 + 20}")
    if (k % 17 == 0) {
      val cwe2 = ptDesc.addObject()
      cwe2.put("lang", "es"); cwe2.put("value", s"CWE-${(k * 13) % 400 + 20}")
    }
    val refs = cve.putObject("references").putArray("reference_data")
    val nRefs = k % 3 + 1
    (0 until nRefs).foreach { r =>
      val ref = refs.addObject()
      ref.put("url", s"https://refs.example/advisory/$id/$r")
      ref.put("name", s"ADV-$id-$r")
      ref.put("refsource", if (r == 0) "MISC" else "CONFIRM")
      val tags = ref.putArray("tags")
      tags.add("Third Party Advisory")
      if (r % 2 == 1) tags.add("Patch")
    }
    val desc = cve.putObject("description").putArray("description_data")
    val d = desc.addObject()
    d.put("lang", "en")
    d.put("value", s"A deterministic synthetic vulnerability number $k in component c${k % 10} allowing issue type ${(k * 13) % 400 + 20}.")
    if (k % 17 == 0) {
      val d2 = desc.addObject()
      d2.put("lang", "es"); d2.put("value", s"Vulnerabilidad sintetica $k.")
    }

    // --- configurations record (schema.json:198-312) ---
    val conf = item.putObject("configurations")
    conf.put("CVE_data_version", 4.0)
    val nodes = conf.putArray("nodes")
    if (k % 11 != 0) {
      val node = nodes.addObject()
      node.put("operator", if (k % 2 == 0) "OR" else "AND")
      val matches = node.putArray("cpe_match")
      if (k % 2 == 0) {
        // ranged match: URI version is '*' (the real-feed shape for ranged
        // entries); the bound FAMILY cycles on k%8 so every one of the four
        // schema.json bounds governs somewhere, alone and in combination
        val vp = s"cpe:2.3:a:vendor${k % 5}:product${k % 9}:*:*:*:*:*:*:*:*"
        (k % 8) match {
          case 0 => // closed-below half-open-above interval [start, end)
            cpeMatch(matches, vp, vulnerable = true,
              startIncluding = Some(s"${k % 3}.0.0"),
              endExcluding = Some(s"${k % 9 + 1}.0.0"))
          case 2 => // inclusive upper bound only: (-inf, end]
            cpeMatch(matches, vp, vulnerable = true,
              endIncluding = Some(s"${k % 9}.${k % 10}.${k % 3}"))
          case 4 => // exclusive lower + exclusive upper: (start, end)
            cpeMatch(matches, vp, vulnerable = true,
              startExcluding = Some(s"${k % 3}.2.0"),
              endExcluding = Some(s"${k % 9 + 1}.0.0"))
          case _ => // minor >= 100: a bound that mis-ranks under any
            // major*100+minor packing (x.150.0 must sort BELOW (x+1).0.0)
            cpeMatch(matches, vp, vulnerable = true,
              endExcluding = Some(s"${k % 9}.150.0"))
        }
      } else {
        // pinned match: exact 3-component version in the URI, no bounds
        cpeMatch(matches,
          s"cpe:2.3:a:vendor${k % 5}:product${k % 9}:${k % 4}.${k % 10}.${k % 3}:*:*:*:*:*:*:*",
          vulnerable = true)
      }
      if (k % 3 == 0)
        cpeMatch(matches, s"cpe:2.3:o:linux:linux_kernel:${k % 6}.${k % 20}:*:*:*:*:*:*:*",
          vulnerable = true)
      val children = node.putArray("children")
      if (k % 7 == 0) {
        val child = children.addObject()
        child.put("operator", "OR")
        child.put("negate", false)
        val cm = child.putArray("cpe_match")
        cpeMatch(cm, s"cpe:2.3:o:linux:linux_kernel:5.${k % 20}:*:*:*:*:*:*:*", vulnerable = true)
        cpeMatch(cm, s"cpe:2.3:h:vendor${k % 5}:device${k % 3}:-:*:*:*:*:*:*:*", vulnerable = false)
        // ranged child entries — schema.json carries the same four bounds
        // inside children[].cpe_match[] (:245-260); both interval shapes
        // appear here so the children path exercises them too
        cpeMatch(cm, "cpe:2.3:o:linux:linux_kernel:*:*:*:*:*:*:*:*",
          vulnerable = true,
          startIncluding = Some("5.0.0"),
          endExcluding = Some(s"5.${k % 20}.0"))
        cpeMatch(cm, s"cpe:2.3:h:vendor${k % 5}:device${k % 3}:*:*:*:*:*:*:*:*",
          vulnerable = true,
          startExcluding = Some("0.5.0"),
          endIncluding = Some(s"1.${k % 10}.0"))
      }
      if (k % 19 == 0) {
        // a NEGATED child: the real-feed "affected EXCEPT this range"
        // shape (schema.json `negate` on nodes) — the node's own product
        // is vulnerable everywhere its top-level entry says, MINUS the
        // [2.0.0, 3.0.0) series this child carves out. Flat applicability
        // readings count probes inside the carve-out; the config-tree
        // reading must not (q_nvd_version_match's graded disagreement:
        // k=76 → CVE-2006-1076, probe product4@2.0).
        val nchild = children.addObject()
        nchild.put("operator", "OR")
        nchild.put("negate", true)
        val ncm = nchild.putArray("cpe_match")
        cpeMatch(ncm,
          s"cpe:2.3:a:vendor${k % 5}:product${k % 9}:*:*:*:*:*:*:*:*",
          vulnerable = false,
          startIncluding = Some("2.0.0"),
          endExcluding = Some("3.0.0"))
      }
      if (k % 5 == 0) {
        // a second top-level node, no children
        val node2 = nodes.addObject()
        node2.put("operator", "OR")
        val m2 = node2.putArray("cpe_match")
        cpeMatch(m2, s"cpe:2.3:a:vendor${(k + 1) % 5}:lib${k % 6}:*:*:*:*:*:*:*:*", vulnerable = true)
        node2.putArray("children")
      }
    }

    // --- impact record (schema.json:9-197) ---
    if (k % 13 != 0) {
      val impact = item.putObject("impact")
      val v2 = impact.putObject("baseMetricV2")
      val score2 = ((k * 37) % 100) / 10.0
      v2.put("severity", if (score2 >= 7.0) "HIGH" else if (score2 >= 4.0) "MEDIUM" else "LOW")
      v2.put("exploitabilityScore", ((k * 29) % 100) / 10.0)
      v2.put("impactScore", ((k * 23) % 100) / 10.0)
      v2.put("obtainAllPrivilege", k % 10 == 0)
      v2.put("obtainUserPrivilege", k % 9 == 0)
      v2.put("obtainOtherPrivilege", false)
      v2.put("userInteractionRequired", k % 2 == 0)
      v2.put("acInsufInfo", false)
      val cvss2 = v2.putObject("cvssV2")
      cvss2.put("version", 2.0)
      cvss2.put("baseScore", score2)
      cvss2.put("accessVector", if (k % 3 == 0) "NETWORK" else "LOCAL")
      cvss2.put("accessComplexity", if (k % 2 == 0) "LOW" else "MEDIUM")
      cvss2.put("authentication", "NONE")
      cvss2.put("confidentialityImpact", "PARTIAL")
      cvss2.put("integrityImpact", if (k % 2 == 0) "PARTIAL" else "NONE")
      cvss2.put("availabilityImpact", "PARTIAL")
      cvss2.put("vectorString", s"AV:${if (k % 3 == 0) "N" else "L"}/AC:L/Au:N/C:P/I:P/A:P")
      if (year >= 2016) { // CVSS v3 only exists for newer CVEs — real-feed shape
        val v3 = impact.putObject("baseMetricV3")
        v3.put("exploitabilityScore", ((k * 19) % 100) / 10.0)
        v3.put("impactScore", ((k * 17) % 100) / 10.0)
        val cvss3 = v3.putObject("cvssV3")
        val score3 = ((k * 41) % 100) / 10.0
        cvss3.put("version", 3.1)
        cvss3.put("baseScore", score3)
        cvss3.put("baseSeverity",
          if (score3 >= 9.0) "CRITICAL" else if (score3 >= 7.0) "HIGH"
          else if (score3 >= 4.0) "MEDIUM" else "LOW")
        cvss3.put("attackVector", if (k % 3 == 0) "NETWORK" else "LOCAL")
        cvss3.put("attackComplexity", "LOW")
        cvss3.put("privilegesRequired", if (k % 2 == 0) "NONE" else "LOW")
        cvss3.put("userInteraction", if (k % 2 == 0) "REQUIRED" else "NONE")
        cvss3.put("scope", if (k % 6 == 0) "CHANGED" else "UNCHANGED")
        cvss3.put("confidentialityImpact", "HIGH")
        cvss3.put("integrityImpact", if (k % 2 == 0) "HIGH" else "NONE")
        cvss3.put("availabilityImpact", "LOW")
        cvss3.put("vectorString", s"CVSS:3.1/AV:${if (k % 3 == 0) "N" else "L"}/AC:L")
      }
    }

    item.put("publishedDate", tsOf(year, k))
    item.put("lastModifiedDate", tsOf(year + (if (k % 6 == 0) 1 else 0), k + 3))
    item
  }

  /** Feed wrapper in NVD 1.1 shape; metadata keys are feed-level strings the
    * ETL drops (reference etl.py:75-77 keeps only CVE_Items).
    */
  private def feed(ks: Seq[Int]): ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("CVE_data_type", "CVE")
    root.put("CVE_data_format", "MITRE")
    root.put("CVE_data_version", "4.0")
    root.put("CVE_data_numberOfCVEs", ks.size.toString)
    root.put("CVE_data_timestamp", "2026-01-01T00:00:00Z")
    val items = root.putArray("CVE_Items")
    ks.foreach(k => items.add(cveItem(k)))
    root
  }

  private def writeGz(path: String, node: ObjectNode): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    val out = new GZIPOutputStream(new FileOutputStream(path))
    try out.write(mapper.writeValueAsBytes(node))
    finally out.close()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/nvd")
    args.drop(1).headOption match {
      case Some(nStr) =>
        // scale mode: n CVEs over `shards` feed files (default 1) —
        // baseline benchmarking; not committed, the tracked fixtures stay
        // small and deterministic
        val n = nStr.toInt
        val shards = args.drop(2).headOption.map(_.toInt).getOrElse(1)
        if (shards == 1) {
          writeGz(s"$dir/nvdcve-1.1-big.json.gz", feed(0 until n))
          println(s"wrote $dir/nvdcve-1.1-big.json.gz ($n CVEs)")
        } else {
          val per = n / shards
          (0 until shards).foreach { s =>
            // last shard absorbs the remainder so exactly n CVEs land
            val hi = if (s == shards - 1) n else (s + 1) * per
            writeGz(f"$dir/nvdcve-1.1-shard$s%02d.json.gz", feed(s * per until hi))
          }
          println(s"wrote $shards shards, $n CVEs total under $dir")
        }
      case None =>
        // Bootstrap feed: 96 CVEs across years 2002..2025.
        writeGz(s"$dir/nvdcve-1.1-fixture.json.gz", feed(0 until 96))
        // Recent feed: overlaps the bootstrap tail (k 72..95 → already
        // loaded) plus 24 new CVEs (k 96..119) — the incremental case.
        writeGz(s"$dir/nvdcve-1.1-recent.json.gz", feed(72 until 120))
        println(s"wrote $dir/nvdcve-1.1-fixture.json.gz and $dir/nvdcve-1.1-recent.json.gz")
    }
  }
}
