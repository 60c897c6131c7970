package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Determinism._
import graft.core.Tables

/** The batch relational surface (SURVEY.md §2.B/§2.C, Q1–Q19).
  *
  * Pure declarative DataFrame programs — no RDDs, no UDFs — so Catalyst
  * gets full predicate pushdown / column pruning / join selection, and at
  * cluster scale AQE can re-plan (skew join, partition coalescing).
  * Every query ends in a total ORDER BY with a unique tie-breaker and
  * routes double aggregation through DECIMAL(18,4) (see core.Determinism).
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Q1 — scan + filter + project. Filter and projection both reach the
    * parquet scan (PushedFilters / 3-column ReadSchema). */
  def q01FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(lit(0.05), lit(0.07)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Q2 — TPC-H-Q1-style hash aggregate with exact decimal sums.
    * Partial (map-side) + final aggregation is automatic in Spark. */
  def q02Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        // scale-8 product sum reaches ~18 significant digits at sf>=0.1 —
        // beyond double, and Spark (BigDecimal, correctly rounded) and
        // DuckDB (hugeint/10^8, double-rounded) disagree in the last ulp.
        // Rescale to DECIMAL(30,4) (exact in both engines), then present
        // as DOUBLE like every other exact sum: decimal output of ANY
        // precision hashes unstably cross-engine (r8-r10), and this was
        // the last grandfathered exception. The scale-4 image stays below
        // 2^53 through sf1, so decimal→double converts identically
        // (exact integer then one correctly-rounded /10^4) in both.
        sum(dec(col("l_extendedprice")) * (lit(1).cast(Dec) - dec(col("l_discount"))))
          .cast(org.apache.spark.sql.types.DecimalType(30, 4))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q3 — dimension joins: nation and region are tiny, so both sides are
    * explicitly broadcast (no shuffle of the customer fact table). */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name"))

  /** Q4 — multi-way fact-fact join + top-k. The final top-10 compiles to
    * TakeOrderedAndProject (no global sort materialization). */
  def q04TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** Q5 — left outer join + null-tolerant count (0 for order-less customers). */
  def q05OuterJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("n_orders").desc, col("c_custkey"))

  /** Q5b — FULL OUTER join of two disjoint-filtered per-customer
    * aggregates (finished vs open orders): each side holds keys the
    * other lacks, so both null-extension directions are non-vacuous at
    * every sf. Keys are unique per side, so ORDER BY the coalesced key
    * is total. */
  def q05FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val f = orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("custkey_f"))
      .agg(count(lit(1)).as("n_f"))
    val o = orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("custkey_o"))
      .agg(count(lit(1)).as("n_o"))
    f.join(o, col("custkey_f") === col("custkey_o"), "full_outer")
      .select(coalesce(col("custkey_f"), col("custkey_o")).as("custkey"),
        col("n_f"), col("n_o"))
      .orderBy(col("custkey"))
  }

  /** Q6a — left semi join (EXISTS). */
  def q06Semi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Q6b — left anti join (NOT EXISTS). The right side is predicate-filtered
    * (orders over 400k) so the result is non-empty at every scale factor —
    * an empty result would be a vacuous correctness check. */
  def q06Anti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(
        t(spark, dir, "orders").filter(col("o_totalprice") > lit(400000.0)),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Q7 — self join with a range predicate on top of the brand equi-key
    * (equi-join + residual filter, not a nested-loop cross product). */
  def q07RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
    val p1 = part.select(col("p_brand"), col("p_size").as("size1"))
    val p2 = part.select(col("p_brand"), col("p_size").as("size2"))
    p1.join(p2, Seq("p_brand"))
      .filter(col("size1") < col("size2"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("p_brand"))
  }

  /** Q8 — ranking window functions. row_number uses a fully tie-broken
    * order; rank/dense_rank use a coarser order (real ties) — both are
    * deterministic because rank functions are tie-order independent. */
  def q08WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val wRn = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wRk = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .withColumn("rn", row_number().over(wRn))
      .withColumn("rnk", rank().over(wRk))
      .withColumn("drnk", dense_rank().over(wRk))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Q9 — analytic window (lag) + running decimal sum over a rows frame. */
  def q09WindowFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("running_sum",
        sum(dec(col("value")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Q10 — rollup with GROUPING() markers; subtotal rows ordered NULLS LAST
    * (explicit, because Spark and DuckDB default null order differ). */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(col("o_orderpriority").asc_nulls_last, col("o_orderstatus").asc_nulls_last)

  /** Q11 — exact distinct aggregate (expand + two-phase agg in Spark). */
  def q11CountDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("l_returnflag"))

  /** Q12a — INTERSECT (set semantics). */
  def q12Intersect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
      .intersect(t(spark, dir, "customer").select(col("c_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** Q12b — EXCEPT (set semantics): customers with no finished ('F') order
    * (filtered right side keeps the result non-empty at every sf). */
  def q12Except(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_custkey").as("custkey"))
      .except(t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** Q12c — INTERSECT ALL (multiset semantics): per-custkey copies =
    * min(multiplicity left, multiplicity right). Both sides carry real
    * duplicate custkeys, so the bag semantics are non-vacuous — the
    * result differs from q12_intersect's set form. Rows of equal key
    * are identical, so ORDER BY custkey is total. */
  def q12IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    orders.filter(col("o_totalprice") > lit(150000.0))
      .select(col("o_custkey").as("custkey"))
      .intersectAll(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
  }

  /** Q12d — EXCEPT ALL (multiset semantics): keeps multiplicity-left −
    * multiplicity-right copies per custkey — the bag-difference face of
    * q12_except. */
  def q12ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    orders.select(col("o_custkey").as("custkey"))
      .exceptAll(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
  }

  /** Q13 — string function family over documents. */
  def q13StringFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        count(when(col("text").like("%spark%"), lit(1))).as("n_spark"),
        min(upper(col("source"))).as("min_source_upper"))
      .orderBy(col("lang"))

  /** Q14 — date functions: per-day, per-type event stats. */
  def q14DateFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** Q15 — JSON extraction + modulo bucketing. */
  def q15JsonFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket").asc_nulls_last)

  /** Q16 — array functions over the embeddings table. */
  def q16ArrayFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(element_at(col("embedding"), 1).cast("double").cast(Dec))
          .cast("double").as("sum_first"),
        count(when(size(col("embedding")) === 64, lit(1))).as("n_full"))
      .orderBy(col("label"))

  /** Q17 — generator surface: tokenize + explode + top-k with total order. */
  def q17ExplodeTopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** Q18 — UNION ALL of two overlapping slices, then key-dedup vs row-dedup
    * cardinalities as a single row. */
  def q18UnionDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val slices = ev.filter(col("event_type") === "click")
      .unionByName(ev.filter(col("value") > lit(50.0)))
    val byKey = slices.dropDuplicates("event_id").agg(count(lit(1)).as("n_dedup_by_key"))
    val byRow = slices.distinct().agg(count(lit(1)).as("n_union_distinct"))
    byKey.crossJoin(byRow)
  }

  /** Q19 — tumbling event-time window, batch form (streaming form must
    * produce the identical table — see streaming layer + tests). */
  def q19TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Q21 — point-in-time enrichment through graft's NATIVE as-of join
    * operator (AsOfJoinNode → AsOfJoinExec merge scan; see
    * plans/NativeAsOfJoin.scala): each click event picks up the value of
    * the same user's latest purchase at-or-before its timestamp, null
    * when the user hasn't purchased yet. The oracle is DuckDB's own
    * ASOF LEFT JOIN — a cross-engine check of the custom exec; the Spark
    * SQL twin (RelationalSql) is a correlated max_by lookup (Spark has no
    * ASOF syntax). Both sides drop null keys/times explicitly: asOfNative
    * uses window semantics there (null matches null, null time sorts
    * first) while SQL joins drop them, so the three faces are kept
    * equal-by-construction rather than equal-by-fixture-accident. */
  def q21AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts").as("pts"), col("value").as("purchase_value"))
    AsOfJoin.asOfNative(clicks, purchases, "user_id", "ts", "pts")
      .orderBy(col("event_id"))
  }

  /** Q22: FORWARD as-of — each click's NEXT purchase (earliest at-or-
    * after, per user). Same inputs and output shape as q21; checked
    * against DuckDB's ASOF JOIN in the >= direction. */
  def q22AsOfForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts").as("pts"), col("value").as("purchase_value"))
    AsOfJoin.asOfForward(clicks, purchases, "user_id", "ts", "pts")
      .orderBy(col("event_id"))
  }
}
