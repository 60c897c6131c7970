package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, RelationalOracle}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every key in `queries` with a DuckDB-expressible semantics has a
  * matching key in `oracleSql` with identical output column names and
  * identical total ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> (Relational.q01FilterProject _),
    "q02_agg"            -> (Relational.q02Agg _),
    "q03_join_agg"       -> (Relational.q03JoinAgg _),
    "q04_topk"           -> (Relational.q04TopK _),
    "q05_outer_join"     -> (Relational.q05OuterJoin _),
    "q06_semi_join"      -> (Relational.q06Semi _),
    "q06_anti_join"      -> (Relational.q06Anti _),
    "q07_range_join"     -> (Relational.q07RangeJoin _),
    "q08_window_rank"    -> (Relational.q08WindowRank _),
    "q09_window_frame"   -> (Relational.q09WindowFrame _),
    "q10_rollup"         -> (Relational.q10Rollup _),
    "q11_count_distinct" -> (Relational.q11CountDistinct _),
    "q12_intersect"      -> (Relational.q12Intersect _),
    "q12_except"         -> (Relational.q12Except _),
    "q13_string_fns"     -> (Relational.q13StringFns _),
    "q14_date_fns"       -> (Relational.q14DateFns _),
    "q15_json_fns"       -> (Relational.q15JsonFns _),
    "q16_array_fns"      -> (Relational.q16ArrayFns _),
    "q17_explode_topk"   -> (Relational.q17ExplodeTopK _),
    "q18_union_dedup"    -> (Relational.q18UnionDedup _),
    "q19_tumbling_window" -> (Relational.q19TumblingWindow _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = RelationalOracle.sql
}
