package graft

/** Smoke-level invariants for every SparkEntry query at sf0.001.
  * Exact value correctness is the DuckDB oracle gate (tools/check_oracle.py
  * locally, CORRECTNESS_r{N}.json in the driver) — these specs guard the
  * structural contract: runs, non-empty, oracle key present.
  */
class RelationalSpec extends SparkSpec {

  test("every query has an oracle entry or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- SparkEntry.rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
