package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.NvdEtl

/** Queries over the nested NVD CVE table (SURVEY.md §2.1) — the reference's
  * actual query surface: deep dotted struct access and doubly-UNNESTed
  * repeated records, re-expressed with higher-order array functions so no
  * explode/shuffle ever touches rows that a predicate can reject in place.
  *
  * All four run over the committed deterministic feed fixture (the sfDir
  * argument is ignored — the NVD table is feed-derived, not SF-scaled), so
  * DuckDB can read the exact same gz bytes as the oracle.
  */
object Nvd {

  private def cves(spark: SparkSession): DataFrame =
    NvdEtl.ingest(spark, NvdEtl.FixtureAbsPath)

  /** §2.1 q_nvd_count: COUNT over the nested ID path — the reference
    * README's counting query (README.md:29-34) and the bootstrap probe
    * (bq.py:125-127).
    */
  def qNvdCount(spark: SparkSession, dir: String): DataFrame =
    cves(spark).agg(count(NvdEtl.cveId).as("cve_count"))

  /** §2.1 q_nvd_linux_exists: the reference README's flagship query
    * (README.md:39-61) — EXISTS over UNNEST(configurations.nodes), nested
    * EXISTS over UNNEST(nodes.cpe_match), cpe23Uri LIKE '%linux%'. Two
    * levels of repeated records, evaluated as nested higher-order `exists`
    * predicates: zero row multiplication, fully codegen'd, and NULL/empty
    * node arrays short-circuit exactly like BQ's EXISTS. Note the query
    * deliberately does NOT search nodes[].children[].cpe_match — the
    * fixture plants linux entries there to prove the paths stay distinct.
    */
  def qNvdLinuxExists(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .filter(exists(col("configurations.nodes"),
        n => exists(n.getField("cpe_match"),
          m => m.getField("cpe23Uri").contains("linux"))))
      .select(NvdEtl.cveId.as("cve_id"),
        unix_timestamp(col("publishedDate")).as("published_s"),
        col("impact.baseMetricV2.severity").as("severity_v2"))
      .orderBy(col("cve_id"))

  /** §2.1 q_nvd_mod_lag: publication→last-modification lag per v2
    * severity — "how long do records of each severity keep churning
    * after publication", the feed-freshness panel a vulnerability
    * warehouse reports beside the upsert (the reference stores both
    * timestamps verbatim, etl.py:94-116, and derives nothing from
    * them). Lags stay in exact SECONDS (BIGINT differences of epoch
    * timestamps — no day division, whose floor semantics engines
    * disagree on for negatives); same-day churn counts lag < 86400.
    *
    * Scale shape: one scan, ONE map-side-combined aggregate into
    * ≤ |severities| rows.
    */
  def qNvdModLag(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(col("impact.baseMetricV2.severity").as("severity_v2"),
        (unix_timestamp(col("lastModifiedDate")) -
          unix_timestamp(col("publishedDate"))).as("lag_s"))
      .groupBy(col("severity_v2"))
      .agg(count(lit(1)).as("n_cves"),
        min(col("lag_s")).as("min_lag_s"),
        max(col("lag_s")).as("max_lag_s"),
        sum(col("lag_s")).as("sum_lag_s"),
        sum(when(col("lag_s") < 86400L, 1L).otherwise(0L))
          .as("n_same_day"))
      .orderBy(col("severity_v2").asc_nulls_first)

  /** §2.1 q_nvd_severity_hist: aggregate over a three-level-deep nested
    * numeric (impact.baseMetricV2.cvssV2.baseScore) grouped by a
    * two-level-deep string — the "dashboard over the warehouse" shape.
    * NULL impact records (feeds omit them) form their own group. Scores are
    * 1dp, so the decimal(18,1) sum is exact on both engines.
    */
  def qNvdSeverityHist(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .groupBy(col("impact.baseMetricV2.severity").as("severity_v2"))
      .agg(count(lit(1)).as("n_cves"),
        sum(col("impact.baseMetricV2.cvssV2.baseScore").cast(DecimalType(18, 1)))
          .cast("double").as("sum_v2_score"),
        count(col("impact.baseMetricV3.cvssV3.baseScore")).as("n_with_v3"))
      .orderBy(col("severity_v2").asc_nulls_first)

  /** §2.1 q_nvd_v3_vector: CVSSv3 attack-vector histogram — the v3 twin of
    * the severity histogram, reaching one level deeper (cvssV3 record
    * grouped field + a sibling metric OUTSIDE the cvssV3 record,
    * exploitabilityScore, counted per group). Scores are 1dp → exact
    * decimal sums.
    */
  def qNvdV3Vector(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .groupBy(col("impact.baseMetricV3.cvssV3.attackVector").as("av"))
      .agg(count(lit(1)).as("n_cves"),
        sum(col("impact.baseMetricV3.cvssV3.baseScore").cast(DecimalType(18, 1)))
          .cast("double").as("sum_v3_score"),
        count(col("impact.baseMetricV3.exploitabilityScore")).as("n_with_expl"))
      .orderBy(col("av").asc_nulls_first)

  /** §2.1 q_nvd_cwe_top: flatten the doubly-repeated problemtype path
    * (problemtype_data[].description[]) and count CVEs per English CWE tag.
    * `flatten ∘ transform` keeps the nesting collapse inside codegen; the
    * single explode feeds a map-side-combined count.
    */
  def qNvdCweTop(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(explode(flatten(transform(
        col("cve.problemtype.problemtype_data"),
        p => p.getField("description")))).as("d"))
      .filter(col("d.lang") === "en")
      .groupBy(col("d.value").as("cwe"))
      .agg(count(lit(1)).as("n_cves"))
      .orderBy(col("n_cves").desc, col("cwe"))

  /** §2.1 q_nvd_product_top: affected vendor:product histogram over the
    * doubly-repeated configurations.nodes[].cpe_match[] path — the same
    * nesting as the README flagship EXISTS, but TRANSFORMING the nested
    * records instead of testing them: cpe23Uri parses to its vendor and
    * product fields in place. cpe_match is OPTIONAL per node (nodes with
    * only children carry none): a null element would null the whole
    * flatten, silently dropping every other node's matches for that CVE —
    * so nulls are filtered at the node level first, mirrored exactly in
    * the oracle.
    */
  def qNvdProductTop(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(explode(flatten(filter(
        transform(col("configurations.nodes"), n => n.getField("cpe_match")),
        x => x.isNotNull))).as("m"))
      .select(concat_ws(":",
        split(col("m.cpe23Uri"), ":").getItem(3),
        split(col("m.cpe23Uri"), ":").getItem(4)).as("vendor_product"))
      .groupBy(col("vendor_product"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("vendor_product"))

  /** §2.1 q_nvd_yearly_trend: CVE volume + CVSSv3 score mass per CVE year
    * — the dashboard over the warehouse's PARTITION KEY (cve_year is
    * derived from the ID exactly as [[NvdEtl.cveYear]] derives the
    * partitioning column, so on the year-partitioned warehouse this query
    * prunes to the partitions it touches).
    */
  def qNvdYearlyTrend(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .groupBy(substring(NvdEtl.cveId, 5, 4).cast("int").as("cve_year"))
      .agg(count(lit(1)).as("n_cves"),
        sum(col("impact.baseMetricV3.cvssV3.baseScore").cast(DecimalType(18, 1)))
          .cast("double").as("sum_v3"),
        count(col("impact.baseMetricV3.cvssV3.baseScore")).as("n_v3"))
      .orderBy(col("cve_year"))

  /** §2.1 q_nvd_modified_upsert: the recent-feed UPSERT view — the
    * reference's daily `recent` feed re-publishes CVEs it already loaded
    * (bq-nvd.py:98-104 loads it on every cron tick), so a warehouse that
    * keeps history needs a latest-revision-wins resolution. Winner per CVE
    * = max(lastModifiedDate) with feed precedence (recent=2 over yearly=1)
    * as the tie-break — real feeds re-publish unchanged CVEs with
    * unchanged timestamps, so precedence, not time alone, must decide.
    * One map-side-combined aggregate over the feed union; the winning
    * (timestamp, source) travels as a single struct max, so no per-CVE
    * window or self-join ever runs.
    */
  def qNvdModifiedUpsert(spark: SparkSession, dir: String): DataFrame = {
    val yearly = cves(spark).withColumn("src_rank", lit(1L))
    val recent = NvdEtl.ingest(spark, NvdEtl.RecentFixtureAbsPath)
      .withColumn("src_rank", lit(2L))
    yearly.unionByName(recent)
      .groupBy(NvdEtl.cveId.as("cve_id"))
      .agg(count(lit(1)).as("n_revisions"),
        max(struct(unix_timestamp(col("lastModifiedDate")).as("lm"),
          col("src_rank").as("sr"))).as("w"))
      .select(col("cve_id"), col("n_revisions"),
        col("w.lm").as("last_modified_s"), col("w.sr").as("winner_src"))
      .orderBy(col("cve_id"))
  }

  /** §2.1 q_nvd_child_cpes: vendor histogram with vulnerable/non-vulnerable
    * counts over the TRIPLY-repeated configurations.nodes[].children[]
    * .cpe_match[] path — AND-nodes keep their running-on vs vulnerable-to
    * split in child OR-groups, which q_nvd_linux_exists deliberately does
    * NOT search (the fixture plants linux entries here to keep the paths
    * distinct; this query is the one that reads them). Two null-safe
    * flatten levels (children and cpe_match are both optional), then one
    * explode into a map-side-combined conditional count — the BOOLEAN leaf
    * (vulnerable) aggregates in exact integers.
    */
  def qNvdChildCpes(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(explode(flatten(filter(
        transform(col("configurations.nodes"), n => n.getField("children")),
        x => x.isNotNull))).as("ch"))
      .filter(col("ch.cpe_match").isNotNull)
      .select(explode(col("ch.cpe_match")).as("m"))
      .select(split(col("m.cpe23Uri"), ":").getItem(3).as("vendor"),
        col("m.vulnerable").as("vul"))
      .groupBy(col("vendor"))
      .agg(count(lit(1)).as("n_matches"),
        sum(when(col("vul"), 1L).otherwise(0L)).as("n_vulnerable"))
      .orderBy(col("vendor"))

  /** §2.1 q_nvd_desc_langs: description-language coverage — per language,
    * how many description entries exist, how many distinct CVEs carry one,
    * and the total description mass (the "which locales does the feed
    * cover" report). One explode of the singly-repeated description_data
    * path; the distinct-CVE count rides the same single aggregate.
    */
  def qNvdDescLangs(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(NvdEtl.cveId.as("cve_id"),
        explode(col("cve.description.description_data")).as("d"))
      .groupBy(col("d.lang").as("lang"))
      .agg(count(lit(1)).as("n_descriptions"),
        countDistinct(col("cve_id")).as("n_cves"),
        sum(length(col("d.value")).cast("bigint")).as("sum_chars"))
      .orderBy(col("lang"))

  /** §2.1 q_nvd_tag_hist: histogram over a REPEATED scalar nested inside a
    * REPEATED record (references.reference_data[].tags[]) — the remaining
    * repetition shape the other queries don't touch.
    */
  def qNvdTagHist(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(explode(flatten(transform(
        col("cve.references.reference_data"),
        r => r.getField("tags")))).as("tag"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n_refs"))
      .orderBy(col("n_refs").desc, col("tag"))

  /** §2.1 q_nvd_version_ranges: affected-version analysis — per vendor,
    * how many cpe_match entries pin an exact version vs carry version-range
    * bounds, split by bound kind across ALL FOUR schema.json leaves
    * (versionEndExcluding/EndIncluding/StartIncluding/StartExcluding,
    * schema.json:206-221), plus the lexical max exclusive-end bound (THE
    * practical NVD question: "which products have open-ended exposure
    * windows"). The null-safe flatten is the same shape as
    * q_nvd_product_top.
    */
  def qNvdVersionRanges(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(explode(flatten(filter(
        transform(col("configurations.nodes"), n => n.getField("cpe_match")),
        x => x.isNotNull))).as("m"))
      .select(split(col("m.cpe23Uri"), ":").getItem(3).as("vendor"),
        col("m.versionEndExcluding").as("ee"),
        col("m.versionEndIncluding").as("ei"),
        col("m.versionStartIncluding").as("si"),
        col("m.versionStartExcluding").as("se"))
      .groupBy(col("vendor"))
      .agg(count(lit(1)).as("n_matches"),
        sum(when(col("ee").isNotNull || col("ei").isNotNull ||
          col("si").isNotNull || col("se").isNotNull, 1L).otherwise(0L))
          .as("n_ranged"),
        count(col("ee")).as("n_end_excl"),
        count(col("ei")).as("n_end_incl"),
        count(col("si")).as("n_start_incl"),
        count(col("se")).as("n_start_excl"),
        max(col("ee")).as("max_end_version"))
      // vendor is parsed from an optional cpe23Uri, so it CAN be null:
      // pin null placement (Spark defaults nulls-first, DuckDB nulls-last)
      // so the hash gate can't flip on future fixture regeneration
      .orderBy(col("vendor").asc_nulls_last)

  /** The version-match probe set — plan literals mirrored VERBATIM in the
    * oracle SQL (the shared-constant contract §2.3's RHP buckets use).
    * Probes with zero matching CVEs drop out of both engines identically.
    */
  private val VersionProbes = Seq(
    ("product0", "0.5"), ("product4", "2.0"), ("product4", "1.2.0"),
    ("product5", "5.0.2"), ("product6", "7.0.5"), ("linux_kernel", "5.4"),
    ("device1", "1.0"), ("product2", "2.150.1"))

  /** Dotted version as an exact integer rank
    * (major·10⁶ + minor·10³ + patch) — missing components rank as 0, so
    * "5.4" ≡ "5.4.0" and 2- and 3-component versions order consistently.
    * Bounds on both engines use the identical packing; minor/patch < 1000
    * is validated by construction in the fixture (real NVD versions fit —
    * a minor like 150 mis-ranks under the naive major·100+minor packing
    * this replaces, and the fixture's x.150.0 bounds prove the difference).
    */
  private def vnum(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // get(), not getItem(): ANSI mode throws on an out-of-bounds index,
    // and 2-component versions have no patch element
    val p = split(v, "\\.")
    coalesce(get(p, lit(0)).cast("bigint"), lit(0L)) * 1000000L +
      coalesce(get(p, lit(1)).cast("bigint"), lit(0L)) * 1000L +
      coalesce(get(p, lit(2)).cast("bigint"), lit(0L))
  }

  /** §2.1 q_nvd_version_match: the NVD's core point query — "which CVEs
    * affect product P at version V" — evaluated for a fixed probe set
    * with FULL configuration-tree semantics over everything the data
    * contract carries (schema.json:198-312): node-level `operator`
    * (AND/OR), child-level `operator` and `negate`, `vulnerable` per
    * cpe_match. The contract has NO node-level `negate` field — negate
    * exists only on children (schema.json, /configurations/nodes vs
    * /configurations/nodes/children; the reference's bq.py:24-82 loads
    * the same schema) — so child negation is the entire negation
    * surface, consulted in full. The evaluation, stated exactly, per
    * (probe, cve, top-level node):
    *
    *  - a cpe_match ENTRY applies iff its product equals the probe's,
    *    and: ANY of the four schema.json range bounds present → the
    *    full interval test (V ≥ versionStartIncluding,
    *    V > versionStartExcluding, V ≤ versionEndIncluding,
    *    V < versionEndExcluding — absent bounds leave that side open);
    *    NO bound present → the URI pins V exactly;
    *  - a CHILD matches per its own `operator`: OR (default) → any of
    *    its entries applies; AND → every one of its entries applies;
    *  - the NODE evaluates per its `operator` over its components (own
    *    entries + non-negated children): AND → every own entry applies
    *    and every non-negated child matches; OR (default) → any own
    *    entry applies or any non-negated child matches. The probe is a
    *    single (product, version) inventory, so an AND node whose
    *    components name different products cannot match — the
    *    conservative reading: a CPE that merely RUNS ON a vulnerable
    *    configuration (the running-on × vulnerable-to conjunction
    *    q_nvd_child_cpes reads) no longer counts as vulnerable, where
    *    the flat-OR reading counted it (the fixture's odd-k·(k%7=0)
    *    CVEs — AND nodes whose linux/device children apply while the
    *    own product entry does not — encode exactly this disagreement;
    *    the oracle grades the tree answer);
    *  - a NEGATED child is an inverted conjunct under EITHER node
    *    operator — "this configuration, EXCEPT": if the child matches
    *    the probe (vulnerable or not — exclusions describe
    *    configurations, not vulnerabilities), the node yields NO hit
    *    (the fixture's k%19 CVEs grade this carve-out);
    *  - a hit additionally needs a VULNERABLE applying entry among the
    *    node's own entries or its MATCHED non-negated children — a
    *    child that does not match cannot donate its vulnerable flag;
    *  - scope is per (cve, node): a hit from a sibling top-level node
    *    survives another node's failed conjunction or carve-out
    *    (top-level nodes union, the schema's implicit OR).
    *
    * Scale shape: the probe table broadcasts into the entry scan (one
    * row per reachable cpe_match, never the CVE row multiplied); the
    * per-child and per-node rollups are integer-count aggregates over
    * slim keyed relations; component totals join back hash-by-hash;
    * version order is exact integer arithmetic end to end.
    */
  def qNvdVersionMatch(spark: SparkSession, dir: String): DataFrame =
    versionMatchOver(spark, cves(spark))

  /** Tree evaluation over an arbitrary CVE corpus — split out so specs
    * can drive operator/negate shapes the committed fixture does not
    * carry (AND children, multi-entry AND nodes) from tiny generated
    * feeds.
    */
  private[graft] def versionMatchOver(spark: SparkSession,
      cveDf: DataFrame): DataFrame = {
    // (cve, node_idx, op, node) — node identity scopes the conjunction
    // and the carve-out; operator defaults OR (schema: NULLABLE STRING)
    val nodes = cveDf
      .select(NvdEtl.cveId.as("cve_id"),
        posexplode(col("configurations.nodes")))
      .toDF("cve_id", "node_idx", "node")
      .select(col("cve_id"), col("node_idx"),
        upper(coalesce(col("node.operator"), lit("OR"))).as("op"),
        col("node"))
    // entry-level relation: src_idx = -1 → the node's own cpe_match;
    // src_idx ≥ 0 → child position (child identity for per-child
    // match + totals). A child with NULL cpe_match has no entries and
    // is not a component.
    val own = nodes.filter(col("node.cpe_match").isNotNull)
      .select(col("cve_id"), col("node_idx"), col("op"),
        lit(-1).as("src_idx"), lit(false).as("cneg"), lit("OR").as("cop"),
        explode(col("node.cpe_match")).as("m"))
    val fromChildren = nodes.filter(col("node.children").isNotNull)
      .select(col("cve_id"), col("node_idx"), col("op"),
        posexplode(col("node.children")))
      .toDF("cve_id", "node_idx", "op", "src_idx", "ch")
      .filter(col("ch.cpe_match").isNotNull)
      .select(col("cve_id"), col("node_idx"), col("op"), col("src_idx"),
        coalesce(col("ch.negate"), lit(false)).as("cneg"),
        upper(coalesce(col("ch.operator"), lit("OR"))).as("cop"),
        explode(col("ch.cpe_match")).as("m"))
    // three consumers (child totals, node totals, probe join) — persist
    // with the eager-count contract (CLAUDE.md)
    val entries = own.unionAll(fromChildren)
      .select(col("cve_id"), col("node_idx"), col("op"), col("src_idx"),
        col("cneg"), col("cop"),
        col("m.vulnerable").as("vul"),
        split(col("m.cpe23Uri"), ":").getItem(4).as("product"),
        split(col("m.cpe23Uri"), ":").getItem(5).as("uver"),
        col("m.versionEndExcluding").as("ee"),
        col("m.versionEndIncluding").as("ei"),
        col("m.versionStartIncluding").as("si"),
        col("m.versionStartExcluding").as("se"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    entries.count()
    // probe-independent component totals: per child (for AND children —
    // every entry must apply) and per node (for AND nodes — every own
    // entry and every non-negated child must match)
    val childTot = entries.filter(col("src_idx") >= 0)
      .groupBy(col("cve_id"), col("node_idx"), col("src_idx"))
      .agg(count(lit(1)).as("n_tot"))
    val nodeTot = entries.groupBy(col("cve_id"), col("node_idx"))
      .agg(sum(when(col("src_idx") === -1, 1L).otherwise(0L))
        .as("n_own_total"),
        countDistinct(when(col("src_idx") >= 0 && !col("cneg"),
          col("src_idx"))).as("n_pos_children"))
    val probes = spark.createDataFrame(VersionProbes)
      .toDF("product", "qversion")
    val q = vnum(col("qversion"))
    val ranged = col("ee").isNotNull || col("ei").isNotNull ||
      col("si").isNotNull || col("se").isNotNull
    val inInterval =
      (col("si").isNull || q >= vnum(col("si"))) &&
        (col("se").isNull || q > vnum(col("se"))) &&
        (col("ei").isNull || q <= vnum(col("ei"))) &&
        (col("ee").isNull || q < vnum(col("ee")))
    val applies = (ranged && inInterval) ||
      (!ranged && col("uver") === col("qversion"))
    val applying = broadcast(probes).join(entries, Seq("product"))
      .filter(applies)
    // per-(probe, node, component) rollup: applying-entry count + the
    // vulnerable flag of this component's applying entries
    val perSrc = applying
      .groupBy(col("product"), col("qversion"), col("cve_id"),
        col("node_idx"), col("op"), col("src_idx"), col("cneg"), col("cop"))
      .agg(count(lit(1)).as("n_app"),
        max(when(!col("cneg") && col("vul"), 1).otherwise(0)).as("vul_app"))
    // child match per its own operator; own entries roll up at node level
    val srcEval = perSrc
      .join(childTot, Seq("cve_id", "node_idx", "src_idx"), "left")
      .withColumn("matched",
        when(col("src_idx") === -1, lit(true))
          .when(col("cop") === "AND", col("n_app") === col("n_tot"))
          .otherwise(col("n_app") > 0))
    val nodeEval = srcEval
      .groupBy(col("product"), col("qversion"), col("cve_id"),
        col("node_idx"), col("op"))
      .agg(sum(when(col("src_idx") === -1, col("n_app")).otherwise(0L))
        .as("n_own_app"),
        countDistinct(when(col("src_idx") >= 0 && !col("cneg") &&
          col("matched"), col("src_idx"))).as("n_pos_child_matched"),
        max(when(col("cneg") && col("matched"), 1).otherwise(0))
          .as("neg_bad"),
        max(when(col("src_idx") === -1, col("vul_app"))
          .when(!col("cneg") && col("matched"), col("vul_app"))
          .otherwise(0)).as("vul_hit"))
    nodeEval.join(nodeTot, Seq("cve_id", "node_idx"))
      .filter(col("neg_bad") === 0 && col("vul_hit") === 1 &&
        when(col("op") === "AND",
          col("n_own_app") === col("n_own_total") &&
            col("n_pos_child_matched") === col("n_pos_children"))
          .otherwise(col("n_own_app") > 0 || col("n_pos_child_matched") > 0))
      .select(col("product"), col("qversion"), col("cve_id"))
      .distinct()
      .groupBy(col("product"), col("qversion"))
      .agg(count(lit(1)).as("n_cves"),
        min(col("cve_id")).as("first_cve"),
        max(col("cve_id")).as("last_cve"))
      .orderBy(col("product"), col("qversion"))
  }

  /** §2.1 q_nvd_cvss_recompute: re-derive every CVSS v3.1 base score
    * from its vector COMPONENTS (first.org CVSS v3.1 specification
    * §7.1: ISS → Impact with the scope-changed 15th-power term →
    * Exploitability → Roundup) and grade the recomputation against the
    * stored baseScore — the integrity audit a vulnerability warehouse
    * runs on ingest (a feed whose stored scores drift from their own
    * vectors is corrupt upstream). The fixture's scores are synthetic,
    * so the interesting outputs are the recomputed distribution per
    * (scope, attackVector) cell and how often recomputed > stored.
    *
    * Float discipline, cross-engine exact: every constant is an IEEE
    * double and every formula is an EXPLICIT multiply/add chain in the
    * identical association order on both engines — no pow() (libm pow
    * is not bit-specified; (ISS−0.02)¹⁵ is y·y→y²·y²→y⁴·y⁴ then
    * ((y⁸·y⁴)·y²)·y), so both engines produce bit-identical doubles.
    * The spec's own Roundup (§Appendix A: integer inspection at 1e5,
    * designed by first.org precisely to kill float ambiguity) then
    * lands every score on an exact 1dp value, and the sum aggregates
    * in DECIMAL(18,1).
    *
    * Scale shape: one scan, all arithmetic map-side inside codegen,
    * one map-side-combined aggregate into ≤ |scopes|·|vectors| cells.
    */
  def qNvdCvssRecompute(spark: SparkSession, dir: String): DataFrame = {
    val m = col("impact.baseMetricV3.cvssV3")
    val base = cves(spark)
      .filter(col("impact.baseMetricV3").isNotNull)
      .select(m.getField("baseScore").as("stored"),
        m.getField("attackVector").as("av"),
        m.getField("attackComplexity").as("ac"),
        m.getField("privilegesRequired").as("pr"),
        m.getField("userInteraction").as("ui"),
        m.getField("scope").as("sc"),
        m.getField("confidentialityImpact").as("c"),
        m.getField("integrityImpact").as("i"),
        m.getField("availabilityImpact").as("a"))
    def cia(x: org.apache.spark.sql.Column) =
      when(x === "HIGH", lit(0.56)).when(x === "LOW", lit(0.22))
        .otherwise(lit(0.0))
    val w = base.select(col("stored"), col("sc"), col("av"),
      when(col("av") === "NETWORK", lit(0.85))
        .when(col("av") === "ADJACENT_NETWORK", lit(0.62))
        .when(col("av") === "LOCAL", lit(0.55)).otherwise(lit(0.2))
        .as("wav"),
      when(col("ac") === "LOW", lit(0.77)).otherwise(lit(0.44)).as("wac"),
      when(col("sc") === "CHANGED",
        when(col("pr") === "NONE", lit(0.85))
          .when(col("pr") === "LOW", lit(0.68)).otherwise(lit(0.5)))
        .otherwise(
          when(col("pr") === "NONE", lit(0.85))
            .when(col("pr") === "LOW", lit(0.62)).otherwise(lit(0.27)))
        .as("wpr"),
      when(col("ui") === "NONE", lit(0.85)).otherwise(lit(0.62)).as("wui"),
      cia(col("c")).as("wc"), cia(col("i")).as("wi"), cia(col("a")).as("wa"))
    val s = w.select(col("stored"), col("sc"), col("av"),
      (lit(1.0) - ((lit(1.0) - col("wc")) * (lit(1.0) - col("wi"))) *
        (lit(1.0) - col("wa"))).as("iss"),
      (((lit(8.22) * col("wav")) * col("wac")) * (col("wpr") * col("wui")))
        .as("expl"))
    // the 15th power as the explicit squaring chain — same association
    // order as the oracle so the doubles agree bit-for-bit
    val y1 = s.withColumn("y", col("iss") - lit(0.02))
    val y2 = y1.withColumn("yy", col("y") * col("y"))
    val y4 = y2.withColumn("y4v", col("yy") * col("yy"))
    val y8 = y4.withColumn("y8v", col("y4v") * col("y4v"))
    val imp = y8.select(col("stored"), col("sc"), col("av"), col("expl"),
      when(col("sc") === "CHANGED",
        lit(7.52) * (col("iss") - lit(0.029)) -
          lit(3.25) * (((col("y8v") * col("y4v")) * col("yy")) * col("y")))
        .otherwise(lit(6.42) * col("iss")).as("impact"))
    val raw = imp.select(col("stored"), col("sc"), col("av"),
      when(col("impact") <= lit(0.0), lit(0.0))
        .when(col("sc") === "CHANGED",
          when(lit(1.08) * (col("impact") + col("expl")) < lit(10.0),
            lit(1.08) * (col("impact") + col("expl"))).otherwise(lit(10.0)))
        .otherwise(
          when(col("impact") + col("expl") < lit(10.0),
            col("impact") + col("expl")).otherwise(lit(10.0)))
        .as("rawscore"))
    // CVSS v3.1 Roundup: inspect at 1e5 in integers (the spec's own
    // float-proofing), then 1 decimal place; the quotient runs in
    // doubles (iscore ≤ 1e6 — exact) because Spark's bigint `/` is
    // already double division
    val fin = raw
      .withColumn("iscore",
        floor(col("rawscore") * lit(100000.0) + lit(0.5)).cast("bigint"))
      .select(col("stored"), col("sc"), col("av"),
        when(col("iscore") % 10000L === 0L,
          col("iscore").cast("double") / lit(100000.0))
          .otherwise(
            (floor(col("iscore").cast("double") / lit(10000.0)) + lit(1.0))
              / lit(10.0))
          .as("recomputed"))
    fin
      .groupBy(col("sc").as("scope"), col("av").as("attack_vector"))
      .agg(count(lit(1)).as("n_cves"),
        min(col("recomputed")).as("min_score"),
        max(col("recomputed")).as("max_score"),
        sum(col("recomputed").cast(DecimalType(18, 1))).cast("double")
          .as("sum_score"),
        sum(when(col("recomputed") > col("stored"), 1L).otherwise(0L))
          .as("n_above_stored"))
      .orderBy(col("scope"), col("attack_vector"))
  }

  /** §2.1 q_nvd_cvss_v2_recompute: re-derive every CVSS v2.0 base score
    * from its vector COMPONENTS (first.org CVSS v2 complete guide
    * §3.2.1: Impact = 10.41·(1−(1−C)(1−I)(1−A)), Exploitability =
    * 20·AV·AC·Au, BaseScore = round₁(((0.6·I)+(0.4·E)−1.5)·f(I)) with
    * f(I) = 1.176 unless I = 0) and grade it against the stored
    * baseScore / impactScore / exploitabilityScore triple — the v2 leg
    * of the ingest integrity audit beside [[qNvdCvssRecompute]]'s v3.1
    * leg (reference mirrors bq-nvd's schema surface: schema.json
    * baseMetricV2; the reference stores these fields verbatim, etl.py:
    * 94-116, and never validates them — this is the audit it should
    * run). Fixture scores are synthetic, so the graded outputs are the
    * recomputed distribution per (accessVector, accessComplexity) cell
    * and the above-stored counts for all three sub-scores.
    *
    * Float discipline, cross-engine exact: every constant is an IEEE
    * double, every formula an explicit multiply/add chain in the
    * identical association order on both engines (no pow anywhere in
    * v2), and the 1dp landing is the integer inspection
    * floor(x·10+0.5)/10 — v2 predates v3.1's Roundup so the graded
    * definition pins half-up explicitly; Impact = 0 happens only as
    * exact 1−(1·1)·1, so f(I)'s branch is float-safe.
    *
    * Scale shape: one scan, all arithmetic map-side inside codegen,
    * one map-side-combined aggregate into ≤ |AV|·|AC| cells.
    */
  def qNvdCvssV2Recompute(spark: SparkSession, dir: String): DataFrame = {
    val m = col("impact.baseMetricV2")
    val base = cves(spark)
      .filter(col("impact.baseMetricV2").isNotNull)
      .select(m.getField("cvssV2").getField("baseScore").as("stored"),
        m.getField("impactScore").as("stored_imp"),
        m.getField("exploitabilityScore").as("stored_expl"),
        m.getField("cvssV2").getField("accessVector").as("av"),
        m.getField("cvssV2").getField("accessComplexity").as("ac"),
        m.getField("cvssV2").getField("authentication").as("au"),
        m.getField("cvssV2").getField("confidentialityImpact").as("c"),
        m.getField("cvssV2").getField("integrityImpact").as("i"),
        m.getField("cvssV2").getField("availabilityImpact").as("a"))
    def cia(x: org.apache.spark.sql.Column) =
      when(x === "COMPLETE", lit(0.66)).when(x === "PARTIAL", lit(0.275))
        .otherwise(lit(0.0))
    val w = base.select(col("stored"), col("stored_imp"),
      col("stored_expl"), col("av"), col("ac"),
      when(col("av") === "NETWORK", lit(1.0))
        .when(col("av") === "ADJACENT_NETWORK", lit(0.646))
        .otherwise(lit(0.395)).as("wav"),
      when(col("ac") === "LOW", lit(0.71))
        .when(col("ac") === "MEDIUM", lit(0.61)).otherwise(lit(0.35))
        .as("wac"),
      when(col("au") === "NONE", lit(0.704))
        .when(col("au") === "SINGLE", lit(0.56)).otherwise(lit(0.45))
        .as("wau"),
      cia(col("c")).as("wc"), cia(col("i")).as("wi"), cia(col("a")).as("wa"))
    val s = w.select(col("stored"), col("stored_imp"), col("stored_expl"),
      col("av"), col("ac"),
      (lit(10.41) * (lit(1.0) -
        ((lit(1.0) - col("wc")) * (lit(1.0) - col("wi"))) *
        (lit(1.0) - col("wa")))).as("impact"),
      (((lit(20.0) * col("wav")) * col("wac")) * col("wau")).as("expl"))
    val raw = s.select(col("stored"), col("stored_imp"), col("stored_expl"),
      col("av"), col("ac"), col("impact"), col("expl"),
      when(col("impact") === lit(0.0), lit(0.0))
        .otherwise(((lit(0.6) * col("impact")) +
          (lit(0.4) * col("expl")) - lit(1.5)) * lit(1.176))
        .as("rawscore"))
    // v2 1dp landing: integer inspection half-up, identical on both
    // engines (raw ≥ 0 by the formula's floor at Impact = 0)
    def round1(x: org.apache.spark.sql.Column) =
      floor(x * lit(10.0) + lit(0.5)).cast("bigint").cast("double") /
        lit(10.0)
    val fin = raw.select(col("av"), col("ac"),
      round1(col("rawscore")).as("recomputed"),
      round1(col("impact")).as("imp1"),
      round1(col("expl")).as("expl1"),
      col("stored"), col("stored_imp"), col("stored_expl"))
    fin
      .groupBy(col("av").as("access_vector"),
        col("ac").as("access_complexity"))
      .agg(count(lit(1)).as("n_cves"),
        min(col("recomputed")).as("min_score"),
        max(col("recomputed")).as("max_score"),
        sum(col("recomputed").cast(DecimalType(18, 1))).cast("double")
          .as("sum_score"),
        sum(when(col("recomputed") > col("stored"), 1L).otherwise(0L))
          .as("n_above_stored"),
        sum(when(col("imp1") > col("stored_imp"), 1L).otherwise(0L))
          .as("n_impact_above"),
        sum(when(col("expl1") > col("stored_expl"), 1L).otherwise(0L))
          .as("n_expl_above"))
      .orderBy(col("access_vector"), col("access_complexity"))
  }

  /** §2.1 q_nvd_score_corr: CVSS v2↔v3 score agreement — Pearson
    * correlation, sample covariance, and both sample deviations over CVEs
    * carrying both metrics (the "did the v3 rescoring change the ranking"
    * dashboard). Exercises the statistical-aggregate family (corr/covar/
    * stddev) over three-level-deep nested numerics; one map-side-combined
    * moment aggregate, no shuffle beyond the 1-row final merge. Moments
    * are order-insensitive at 6dp for 1dp scores, so the round is safe
    * cross-engine.
    */
  def qNvdScoreCorr(spark: SparkSession, dir: String): DataFrame =
    cves(spark)
      .select(col("impact.baseMetricV2.cvssV2.baseScore").as("v2"),
        col("impact.baseMetricV3.cvssV3.baseScore").as("v3"))
      .filter(col("v2").isNotNull && col("v3").isNotNull)
      .agg(count(lit(1)).as("n_pairs"),
        round(corr(col("v2"), col("v3")), 6).as("corr_v23"),
        round(covar_samp(col("v2"), col("v3")), 6).as("covar_v23"),
        round(stddev_samp(col("v2")), 6).as("sd_v2"),
        round(stddev_samp(col("v3")), 6).as("sd_v3"))

  /** §2.1 q_nvd_score_drift: two-sample Kolmogorov-Smirnov distance
    * between the v2 base-score distributions of pre- and post-2015 CVE
    * cohorts (v2 spans every era; v3 only exists post-2016 in real feeds) — "did severity scoring drift", the distribution-shift
    * test a vulnerability dashboard runs before comparing eras. The
    * statistic is EXACT until one division: scores are 1dp (≤ 101
    * distinct deci-score bins), CDFs are integer cumulative counts,
    * and D's numerator max_s |k₁(s)·n₂ − k₂(s)·n₁| is an integer
    * argmax with an integer tie-break (smallest score) — no float ever
    * ranks, so both engines pick the identical (D, location) pair.
    *
    * Scale shape: one conditional-count aggregate into ≤ 101 bins;
    * cumulative windows and the argmax run over that fixed-size
    * relation; cohort totals broadcast as a 1-row crossJoin.
    */
  def qNvdScoreDrift(spark: SparkSession, dir: String): DataFrame = {
    val bins = cves(spark)
      .select(
        (substring(NvdEtl.cveId, 5, 4).cast("int") < 2015).as("old"),
        expr("CAST(round(impact.baseMetricV2.cvssV2.baseScore * 10) AS BIGINT)")
          .as("sds"))
      .filter(col("sds").isNotNull)
      .groupBy(col("sds"))
      .agg(sum(when(col("old"), 1L).otherwise(0L)).as("c_old"),
        sum(when(!col("old"), 1L).otherwise(0L)).as("c_new"))
    val w = Window.orderBy(col("sds"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("k_old", sum(col("c_old")).over(w).cast("bigint"))
      .withColumn("k_new", sum(col("c_new")).over(w).cast("bigint"))
    val tot = bins.agg(sum(col("c_old")).cast("bigint").as("n_old"),
      sum(col("c_new")).cast("bigint").as("n_new"))
    cum.crossJoin(broadcast(tot))
      .select(col("sds"), col("n_old"), col("n_new"),
        abs(col("k_old") * col("n_new") - col("k_new") * col("n_old"))
          .as("num"))
      .orderBy(col("num").desc, col("sds"))
      .limit(1)
      .select(col("n_old"), col("n_new"),
        round(col("num").cast("double") /
          (col("n_old") * col("n_new")).cast("double"), 6).as("ks_d"),
        (col("sds").cast("double") / 10.0).as("ks_at_score"))
  }

  /** §2.1 q_nvd_severity_transition: severity transition matrix across
    * the recent-feed upsert — which CVEs the daily feed RE-SCORED (the
    * question a vulnerability-management consumer asks of every cron
    * tick the reference's loop takes: did anything I triaged as LOW
    * become CRITICAL?): for CVEs present in BOTH the yearly corpus and
    * the recent feed, count (old severity → new severity) pairs;
    * missing v3 scores read NONE. Exact integer counts; the recent
    * side broadcasts (a daily feed is always dimension-sized next to
    * the corpus).
    */
  def qNvdSeverityTransition(spark: SparkSession, dir: String): DataFrame = {
    val sev = coalesce(
      col("impact.baseMetricV3.cvssV3.baseSeverity"), lit("NONE"))
    val yearly = cves(spark)
      .select(NvdEtl.cveId.as("cve_id"), sev.as("old_sev"))
    val recent = NvdEtl.ingest(spark, NvdEtl.RecentFixtureAbsPath)
      .select(NvdEtl.cveId.as("cve_id"), sev.as("new_sev"))
    yearly.join(broadcast(recent), Seq("cve_id"))
      .groupBy(col("old_sev"), col("new_sev"))
      .agg(count(lit(1)).as("n_cves"))
      .orderBy(col("old_sev"), col("new_sev"))
  }
}
