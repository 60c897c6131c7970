package graft.operators

/** DuckDB oracle SQL for the Relational queries — same table names, same
  * output column names/aliases, same total ORDER BY, same DECIMAL(18,4)
  * discipline as the Spark programs (driver hash-compares after sorting
  * columns by name).
  *
  * DuckDB-specific care:
  *   - SUM(INTEGER/BIGINT) returns HUGEINT in DuckDB → CAST to BIGINT to
  *     match Spark's LongType.
  *   - GROUPING() width differs → CAST to INT on both sides.
  *   - Default null ordering differs (Spark ASC=NULLS FIRST, DuckDB
  *     ASC=NULLS LAST) → always explicit where a sort key is nullable.
  *   - Bare numeric literals are DECIMAL in DuckDB → CAST comparison
  *     literals to DOUBLE to reproduce Spark's double comparison.
  */
object RelationalOracle {
  val sql: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,4)) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_join_agg" ->
      """SELECT r_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "q04_topk" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q05_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY n_orders DESC, c_custkey""".stripMargin,

    "q05_full_outer" ->
      """WITH f AS (SELECT o_custkey AS custkey, COUNT(*) AS n_f
        |           FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
        |     o AS (SELECT o_custkey AS custkey, COUNT(*) AS n_o
        |           FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
        |SELECT COALESCE(f.custkey, o.custkey) AS custkey, n_f, n_o
        |FROM f FULL OUTER JOIN o ON f.custkey = o.custkey
        |ORDER BY custkey""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > CAST(400000 AS DOUBLE))
        |ORDER BY c_custkey""".stripMargin,

    "q07_range_join" ->
      """SELECT p1.p_brand, COUNT(*) AS n_pairs
        |FROM part p1
        |JOIN part p2 ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        |GROUP BY p1.p_brand
        |ORDER BY p1.p_brand""".stripMargin,

    "q08_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
        |    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q09_window_frame" ->
      """SELECT user_id, ts, event_id, value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |       OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q10_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status
        |FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS LAST, o_orderstatus NULLS LAST""".stripMargin,

    "q11_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q12_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer
        |ORDER BY custkey""".stripMargin,

    "q12_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q12_intersect_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
        |INTERSECT ALL
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q12_except_all" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q13_string_fns" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  COUNT(CASE WHEN text LIKE '%spark%' THEN 1 END) AS n_spark,
        |  MIN(UPPER(source)) AS min_source_upper
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q14_date_fns" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,

    "q15_json_fns" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS bucket,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY 1
        |ORDER BY bucket NULLS LAST""".stripMargin,

    "q16_array_fns" ->
      """SELECT label, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,4))) AS DOUBLE) AS sum_first,
        |  COUNT(CASE WHEN len(embedding) = 64 THEN 1 END) AS n_full
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin,

    "q17_explode_topk" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,

    "q18_union_dedup" ->
      """WITH u AS (
        |  SELECT * FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT * FROM events WHERE value > CAST(50 AS DOUBLE))
        |SELECT (SELECT COUNT(DISTINCT event_id) FROM u) AS n_dedup_by_key,
        |       (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM u)) AS n_union_distinct""".stripMargin,

    "q19_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN as the cross-engine oracle for the
    // custom AsOfJoinExec. (user_id, ts) is unique within the purchase
    // slice at every sf (verified), so the at-or-before winner is unique
    // and the tie-break disciplines can't diverge; null keys/times are
    // dropped on both sides in all three faces (see Relational.q21AsOfJoin)
    // so the exec's window-null semantics can't diverge from SQL either.
    "q21_asof_join" ->
      """SELECT l.event_id, l.user_id, l.ts, r.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL) l
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts AS pts, value FROM events
        |      WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL) r
        |  ON l.user_id = r.user_id AND r.pts <= l.ts
        |ORDER BY l.event_id""".stripMargin,

    // q22: the forward direction — DuckDB's ASOF with >= picks the
    // smallest r.pts at-or-after each click. Tie-free by the same
    // argument as q21 (purchase timestamps are distinct per user).
    "q22_asof_forward" ->
      """SELECT l.event_id, l.user_id, l.ts, r.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL) l
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts AS pts, value FROM events
        |      WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL) r
        |  ON l.user_id = r.user_id AND r.pts >= l.ts
        |ORDER BY l.event_id""".stripMargin,
  )
}
