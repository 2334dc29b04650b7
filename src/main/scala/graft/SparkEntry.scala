package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  *
  * Every `queries` entry is a Spark-first re-expression of a capability of
  * the reference (redteam-project/bq-nvd) or of the LLM-pipeline extensions;
  * `oracleSql` carries the DuckDB-equivalent SQL the driver uses as the
  * correctness gate. Aliases are kept identical on both sides (the compare
  * sorts columns by name), aggregates accumulate in exact DECIMAL so results
  * hash-match bit-for-bit, and every result has a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 reference-surface queries
    "q_count" -> (Relational.qCount _),
    "q_nested_exists" -> (Relational.qNestedExists _),
    "q_incremental_antijoin" -> (Relational.qIncrementalAntijoin _),
    "q_dedup_load" -> (Relational.qDedupLoad _),
    // §2.2 relational analytics suite
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q_top_customers_per_nation" -> (Relational.qTopCustomersPerNation _),
    "q_order_priority_exists" -> (Relational.qOrderPriorityExists _),
    "q_customer_no_orders" -> (Relational.qCustomerNoOrders _),
    "q_events_windowed" -> (Relational.qEventsWindowed _),
    "q_events_sessionize" -> (Relational.qEventsSessionize _),
    "q_part_topn_price" -> (Relational.qPartTopnPrice _),
  )

  /** DuckDB-equivalent SQL per query (the driver's correctness oracle). */
  def oracleSql: Map[String, String] = Map(
    "q_count" ->
      "SELECT count(o_orderkey) AS n_orders FROM orders",

    "q_nested_exists" ->
      """SELECT vec_id, label FROM embeddings
         WHERE len(list_filter(embedding, e -> e > CAST(0.3 AS DOUBLE))) > 0
         ORDER BY vec_id""",

    "q_incremental_antijoin" ->
      """SELECT event_id, event_type, user_id FROM events f
         WHERE f.ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND NOT EXISTS (SELECT 1 FROM events w
                           WHERE w.ts < TIMESTAMP '2024-01-15 00:00:00'
                             AND w.event_id = f.event_id)
         ORDER BY event_id""",

    "q_dedup_load" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
                    FROM events),
              r AS (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY tus, event_id) AS rn FROM e)
         SELECT user_id, event_type, event_id AS first_event_id,
                tus AS first_ts_us
         FROM r WHERE rn = 1
         ORDER BY user_id, event_type""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
             COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
             CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",

    "q5_region_revenue" ->
      """SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",

    "q6_forecast_revenue" ->
      """SELECT
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",

    "q_top_customers_per_nation" ->
      """WITH r AS (SELECT c_custkey, c_name, c_acctbal, c_nationkey,
                        row_number() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rk
                    FROM customer)
         SELECT n_name, rk, c_custkey, c_name, c_acctbal
         FROM r JOIN nation ON c_nationkey = n_nationkey
         WHERE rk <= 3
         ORDER BY n_name, rk""",

    "q_order_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    "q_customer_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
         ORDER BY c_custkey""",

    "q_events_windowed" ->
      """SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
             MIN(value) AS min_value,
             MAX(value) AS max_value
         FROM events
         GROUP BY 1, 2
         ORDER BY 1, 2""",

    "q_events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
              s AS (SELECT user_id, event_id, tus,
                        CASE WHEN tus - lag(tus) OVER w > 1800000000
                               OR lag(tus) OVER w IS NULL
                             THEN 1 ELSE 0 END AS new_s
                    FROM e WINDOW w AS (PARTITION BY user_id
                                        ORDER BY tus, event_id)),
              t AS (SELECT user_id, tus,
                        CAST(SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY tus, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
                    FROM s)
         SELECT user_id, session_idx, COUNT(*) AS n_events,
                MIN(tus) AS start_us, MAX(tus) AS end_us
         FROM t GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",

    "q_part_topn_price" ->
      """WITH r AS (SELECT p_brand, p_partkey, p_retailprice,
                        dense_rank() OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC) AS rk
                    FROM part)
         SELECT p_brand, rk, p_partkey, p_retailprice
         FROM r WHERE rk <= 2
         ORDER BY p_brand, rk, p_partkey""",
  )
}
