package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftKernels

/** SQL-surface gate: every graft kernel is reachable from plain
  * `spark.sql(...)` via GraftExtensions, and agrees with the kernel.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("scalar functions registered and agree with kernels") {
    val fp = spark.sql("SELECT graft_fingerprint64('hello world') AS fp")
      .head().getLong(0)
    assert(fp === GraftKernels.fingerprint64(UTF8String.fromString("hello world")))

    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0 / math.sqrt(2)) < 1e-12)

    val jac = spark.sql(
      "SELECT graft_jaccard_sorted(array('a','b','c'), array('b','c','d')) AS j")
      .head().getDouble(0)
    assert(math.abs(jac - 0.5) < 1e-15)

    val cont = spark.sql(
      "SELECT graft_containment_sorted(array('a','b'), array('a','b','c')) AS c")
      .head().getDouble(0)
    assert(cont === 1.0)

    val mh = spark.sql(
      "SELECT size(graft_minhash(array('x','y'), 32, 42)) AS n").head().getInt(0)
    assert(mh === 32)

    assert(spark.sql(
      "SELECT graft_simhash64(cast(array() AS array<string>)) AS s")
      .head().getLong(0) === 0L)

    // chunk lengths partition the payload: they sum to its byte length,
    // and the digest count never exceeds the chunk count (digests dedup)
    val Seq(lenSum, nLens, nDigs) = spark.sql(
      """SELECT aggregate(graft_cdc_chunk_lens(cast('abcdefghijklmnop' AS BINARY)),
           0L, (a, x) -> a + x) AS s,
           size(graft_cdc_chunk_lens(cast('abcdefghijklmnop' AS BINARY))) AS nl,
           size(graft_cdc_chunks(cast('abcdefghijklmnop' AS BINARY))) AS nd""")
      .head().toSeq.map(_.asInstanceOf[Number].longValue)
    assert(lenSum === 16L)
    assert(nDigs <= nLens)
  }

  test("graft_top_k aggregate works from SQL") {
    spark.sql(
      """SELECT * FROM VALUES (1, 10L, 0.5D), (1, 3L, 0.5D), (1, 7L, 0.9D)
         AS t(g, id, score)""").createOrReplaceTempView("topk_in")
    val top = spark.sql(
      """SELECT g, graft_top_k(score, id, 2) AS top
         FROM topk_in GROUP BY g""")
      .selectExpr("g", "top.c_id AS ids").head()
    assert(top.getSeq[Long](1) === Seq(7L, 3L)) // 0.9 first, tie → lower id
  }

  test("bloom runtime-filter pair works from plain SQL (scalar-subquery build)") {
    Tables.registerAll(spark, TestSpark.sfDir)
    // the canonical SQL form: sketch the build keys in a scalar subquery,
    // probe map-side, exact semi join removes false positives — result
    // must equal the plain semi join exactly
    val got = spark.sql(
      """SELECT l_returnflag, count(*) AS n
         FROM lineitem
         WHERE graft_might_contain(
                 (SELECT graft_bloom_agg(xxhash64(o_orderkey), 50000L, 400000L)
                  FROM orders WHERE o_orderpriority = '1-URGENT'),
                 xxhash64(l_orderkey))
           AND l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag ORDER BY l_returnflag""").collect().map(_.toSeq)
    val want = spark.sql(
      """SELECT l_returnflag, count(*) AS n
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag ORDER BY l_returnflag""").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("graft_bitmap_distinct from SQL == Column form == count(DISTINCT)") {
    Tables.registerAll(spark, TestSpark.sfDir)
    val maxId = spark.sql("SELECT max(o_custkey) FROM orders")
      .head().getLong(0)
    val sql = spark.sql(
      s"""SELECT o_orderpriority,
                 graft_bitmap_distinct(o_custkey, ${maxId}L) AS n_cust
          FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      .collect().map(_.toSeq).toSeq
    val api = Tables.orders(spark, TestSpark.sfDir)
      .groupBy(org.apache.spark.sql.functions.col("o_orderpriority"))
      .agg(org.apache.spark.sql.graft.GraftAggregates
        .bitmapDistinct(org.apache.spark.sql.functions.col("o_custkey"),
          maxId).as("n_cust"))
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    assert(sql === api)
    val exact = spark.sql(
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      .collect().map(_.toSeq).toSeq
    assert(sql === exact)
    // a non-literal domain bound must be rejected loudly at resolution
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_bitmap_distinct(o_custkey, o_custkey) FROM orders")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("registerAll: the whole star schema is reachable from plain SQL") {
    Tables.registerAll(spark, TestSpark.sfDir)
    // a multi-table SQL join over the registered views, no DataFrame API
    val top = spark.sql(
      """SELECT n_name, count(*) AS n_cust
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 1""").head()
    assert(top.getLong(1) > 0)
    // events view carries the ns→µs-truncated timestamp, usable in SQL
    val d = spark.sql(
      "SELECT count(DISTINCT CAST(ts AS DATE)) AS days FROM events")
      .head().getLong(0)
    assert(d > 0)
    // graft functions compose with the views in one SQL statement
    val fp = spark.sql(
      """SELECT count(DISTINCT graft_fingerprint64(text)) AS n
         FROM documents""").head().getLong(0)
    assert(fp > 0)
  }

  test("table functions: graft_pagerank and graft_minhash_dedup from " +
      "plain SQL == the DataFrame runners, row for row") {
    val sf = TestSpark.sfDir
    // pagerank: the SQL-first user runs the whole iterative core as one
    // FROM clause — and can compose it (filter/order/limit) in SQL
    val sqlPr = spark.sql(
      s"SELECT * FROM graft_pagerank('$sf')").collect().map(_.toSeq).toSeq
    val apiPr = graft.operators.Relational.graphPagerank(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(sqlPr === apiPr)
    spark.catalog.clearCache()
    val sqlDd = spark.sql(
      s"SELECT * FROM graft_minhash_dedup('$sf')").collect().map(_.toSeq).toSeq
    val apiDd = graft.operators.Dedup.dedupMinhashLsh(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(sqlDd === apiDd)
    // composability: the TVF is a relation like any other
    val top = spark.sql(
      s"""SELECT count(*) AS n FROM graft_pagerank('$sf')""").head().getLong(0)
    assert(top > 0)
    // a non-literal argument must be rejected loudly at resolution
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_pagerank(1)").collect()
    }
    assert(e.getMessage.contains("string literal"), e.getMessage)
    spark.catalog.clearCache()
  }

  test("table functions: graft_connected_components and graft_sim_topk " +
      "from plain SQL == the DataFrame runners, row for row") {
    val sf = TestSpark.sfDir
    val sqlCc = spark.sql(
      s"SELECT * FROM graft_connected_components('$sf')")
      .collect().map(_.toSeq).toSeq
    val apiCc = graft.operators.Relational.graphConnectedComponents(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(sqlCc === apiCc)
    spark.catalog.clearCache()
    val sqlTk = spark.sql(
      s"SELECT * FROM graft_sim_topk('$sf')").collect().map(_.toSeq).toSeq
    val apiTk = graft.operators.Similarity.simTopkBruteforce(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(sqlTk === apiTk)
    // composable like any relation: aggregate the TVF output in SQL
    val nComp = spark.sql(
      s"""SELECT count(DISTINCT component_type, component_key) AS n
          FROM graft_connected_components('$sf')""").head().getLong(0)
    assert(nComp > 0)
    spark.catalog.clearCache()
  }

  test("table function: graft_scc from plain SQL == the DataFrame " +
      "runner, row for row") {
    val sf = TestSpark.sfDir
    val sqlScc = spark.sql(s"SELECT * FROM graft_scc('$sf')")
      .collect().map(_.toSeq).toSeq
    val apiScc = graft.operators.Relational.graphScc(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(sqlScc === apiScc)
    spark.catalog.clearCache()
  }

  test("table function: graft_betweenness_approx from plain SQL == the " +
      "DataFrame runner, row for row (incl. the k literal)") {
    val sf = TestSpark.sfDir
    val sqlBa = spark.sql(
      s"SELECT * FROM graft_betweenness_approx('$sf', 4)")
      .collect().map(_.toSeq).toSeq
    graft.GraftCaches.release(spark)
    val apiBa = graft.operators.Relational
      .graphBetweennessApprox(spark, sf, nPivots = 4)
      .collect().map(_.toSeq).toSeq
    assert(sqlBa === apiBa)
    assert(sqlBa.nonEmpty)
    // a non-literal k must be rejected loudly at resolution (1+1 stays
    // an unevaluated Add at TVF-build time — constant folding runs later)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_betweenness_approx('$sf', 1+1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
    graft.GraftCaches.release(spark)
  }

  test("table function: graft_quantile_bisect from plain SQL == the " +
      "DataFrame runner, row for row") {
    val sf = TestSpark.sfDir
    val sqlQb = spark.sql(s"SELECT * FROM graft_quantile_bisect('$sf')")
      .collect().map(_.toSeq).toSeq
    val apiQb = graft.operators.Relational.qQuantileBisect(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(sqlQb === apiQb)
    assert(sqlQb.nonEmpty)
    spark.catalog.clearCache()
  }

  test("table function: graft_group_quantile_bisect from plain SQL == " +
      "the DataFrame runner, row for row") {
    val sf = TestSpark.sfDir
    val sqlGb = spark
      .sql(s"SELECT * FROM graft_group_quantile_bisect('$sf')")
      .collect().map(_.toSeq).toSeq
    val apiGb = graft.operators.Relational.qGroupQuantileBisect(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(sqlGb === apiGb)
    assert(sqlGb.nonEmpty)
    spark.catalog.clearCache()
  }

  test("full SQL query over a real table through the extension functions") {
    Tables.embeddings(spark, TestSpark.sfDir).createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT count(*) AS n FROM emb a JOIN emb b
         ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5
         WHERE graft_cosine(a.embedding, b.embedding) > -1.0""")
      .head().getLong(0)
    assert(n === 10) // C(5,2) pairs, all with cosine > -1
  }
}
