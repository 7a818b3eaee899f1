package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2's inventory (or a
  * training-data-pipeline extension), and each has a DuckDB-runnable oracle
  * in [[oracleSql]] with identical column names/types. Non-SQL-expressible
  * operators (crypto round trips, wire codecs) are covered by ScalaTest specs
  * and appear here as rows-only checks where meaningful.
  */
object SparkEntry {
  import graft.queries._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (RelationalQueries.q01PricingSummary _),
    "q02_revenue_filter" -> (RelationalQueries.q02Revenue _),
    "q03_top_customers" -> (RelationalQueries.q03TopCustomers _),
    "q04_region_revenue" -> (RelationalQueries.q04RegionRevenue _),
    "q05_running_total" -> (RelationalQueries.q05RunningTotal _),
    "q06_top_orders" -> (RelationalQueries.q06TopOrders _),
    "q07_key_sets" -> (RelationalQueries.q07KeySets _),
    "q08_event_types" -> (RelationalQueries.q08EventTypes _),
    "q09_object_keys" -> (RelationalQueries.q09ObjectKeys _),
    "q10_hourly_events" -> (RelationalQueries.q10HourlyEvents _),
    "q11_event_regroup" -> (RelationalQueries.q11EventRegroup _),
    "q12_chunk_index" -> (SegmentQueries.q12ChunkIndex _),
    "q13_chunks_for_range" -> (SegmentQueries.q13ChunksForRange _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        | SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        | SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS sum_disc_price,
        | SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_filter" ->
      """SELECT SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_top_customers" ->
      """SELECT c_custkey, c_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
        |       COUNT(*) AS order_cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q04_region_revenue" ->
      """SELECT n_name, SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q05_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
        |FROM orders WHERE o_custkey <= 200""".stripMargin,
    "q06_top_orders" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q07_key_sets" ->
      """SELECT
        | (SELECT COUNT(*) FROM (SELECT c_nationkey AS nk FROM customer UNION
        |                        SELECT s_nationkey FROM supplier) u) AS union_count,
        | (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer INTERSECT
        |                        SELECT DISTINCT s_nationkey FROM supplier) i) AS intersect_count,
        | (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer EXCEPT
        |                        SELECT DISTINCT s_nationkey FROM supplier) e) AS except_count""".stripMargin,
    "q08_event_types" ->
      """SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |       SUM(CAST(value AS DECIMAL(18,2))) AS total_value
        |FROM events GROUP BY event_type HAVING COUNT(*) > 10""".stripMargin,
    "q09_object_keys" ->
      """SELECT o_orderkey,
        | lpad(CAST(o_orderkey AS VARCHAR), 20, '0') AS padded_offset,
        | concat_ws('/', 'topic', CAST(o_custkey AS VARCHAR),
        |           lpad(CAST(o_orderkey AS VARCHAR), 20, '0')) AS object_key,
        | md5(o_orderpriority) AS priority_md5,
        | base64(encode(o_orderstatus)) AS status_b64,
        | substring(o_orderpriority, 1, 1) AS priority_prefix
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q10_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |       SUM(CAST(value AS DECIMAL(18,2))) AS hourly_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    "q11_event_regroup" ->
      """SELECT user_id, COUNT(*) AS n, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
        |       string_agg(event_type, ',' ORDER BY ts, event_id) AS trace
        |FROM events WHERE user_id <= 500 GROUP BY user_id""".stripMargin,
    "q12_chunk_index" ->
      """SELECT doc_id, n_chars,
        | CASE WHEN n_chars = 0 THEN 0 ELSE (n_chars + 63) // 64 END AS chunk_count,
        | CASE WHEN n_chars = 0 THEN 0
        |      ELSE n_chars - ((n_chars + 63) // 64 - 1) * 64 END AS final_chunk_size,
        | CASE WHEN n_chars = 0 THEN 0
        |      ELSE ((n_chars + 63) // 64 - 1) * 92
        |           + (n_chars - ((n_chars + 63) // 64 - 1) * 64) + 28 END AS transformed_size
        |FROM documents""".stripMargin,
    "q13_chunks_for_range" ->
      """WITH docs AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN n_chars = 0 THEN 0 ELSE (n_chars + 63) // 64 END AS chunk_count
        |  FROM documents),
        |exploded AS (
        |  SELECT doc_id, n_chars, chunk_count,
        |         unnest(generate_series(0, chunk_count - 1)) AS chunk_id
        |  FROM docs WHERE chunk_count > 0)
        |SELECT doc_id, chunk_id, chunk_id * 64 AS orig_pos,
        |       CASE WHEN chunk_id = chunk_count - 1
        |            THEN n_chars - (chunk_count - 1) * 64 ELSE 64 END AS orig_size,
        |       chunk_id * 92 AS trans_pos
        |FROM exploded
        |WHERE chunk_id * 64 <= 300
        |  AND chunk_id * 64 + (CASE WHEN chunk_id = chunk_count - 1
        |                         THEN n_chars - (chunk_count - 1) * 64 ELSE 64 END) > 100""".stripMargin,
  )
}
