package graft

import graft.core.Tables
import graft.operators.RelationalSql

/** SQL-surface equivalence (SURVEY.md §2.B extensibility row "SQL
  * injection" + VERDICT round-2 item 5): every relational query must be
  * expressible as `spark.sql` text over the registered views and produce
  * EXACTLY the DataFrame form's result — same column names, same rows,
  * same order. This is the surface a SQL-first user types; equality here
  * proves the two faces share one semantics (both compile to the same
  * Catalyst plans). */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  private def assertSame(name: String, sqlText: String): Unit = {
    val viaDf = SparkEntry.queries(name)(spark, dir)
    val viaSql = spark.sql(sqlText)
    assert(viaSql.columns.toSeq == viaDf.columns.toSeq,
      s"$name: column mismatch ${viaSql.columns.toSeq} vs ${viaDf.columns.toSeq}")
    val a = viaSql.collect().toSeq
    val b = viaDf.collect().toSeq
    assert(a.size == b.size, s"$name: ${a.size} SQL rows vs ${b.size} DataFrame rows")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"$name: row $i differs — SQL $x vs DataFrame $y")
    }
  }

  test("Q1-Q19 + Q21: spark.sql text over registered views equals the DataFrame form") {
    Tables.registerAll(spark, dir)
    RelationalSql.sql.toSeq.sortBy(_._1).foreach { case (name, text) =>
      withClue(name)(assertSame(name, text))
    }
    // Q1-Q19 with q05 contributing two entries (left + full outer),
    // q06 two, q12 four (set + multiset forms), plus Q21 and Q22 = 26
    // texts (the as-of twins are correlated lookups — Spark SQL has no
    // ASOF)
    assert(RelationalSql.sql.size == 26, "every relational query needs a SQL twin")
  }

  test("LLM-pipeline extras: SQL texts (incl. injected shingle fns) equal DataFrame forms") {
    Tables.registerAll(spark, dir)
    RelationalSql.extrasSql.toSeq.sortBy(_._1).foreach { case (name, text) =>
      withClue(name)(assertSame(name, text))
    }
    // 28 through x35, plus x36-x48, x50, x52-x53, and x55-x70's
    // thirty-two twins (x37/x44/x55 sharing x26/x01/x16 texts — one
    // selection, two physical strategies each; x49's sketch twin is the
    // dedicated tolerant test below; x51's media decode has no SQL
    // image; x54's estimates are merge-order-dependent), plus sixteen
    // r12 texts (x109-x113, x115, x117-x118, x121-x122, x125-x128,
    // x131-x132 — the URL/markup plants embed page-sized literal
    // expressions and stay DataFrame-first; x129 has no SQL image),
    // plus the r11 SQL-friendly trio x84/x93/x108, plus the
    // twenty-two r13 texts (the plain aggregates x79-x82, x85-x86,
    // x88-x90, x95-x99, x134-x136, the x137 hybrid-RRF fusion, the
    // x139 line-dedup rewrite, the x141-x143 training-prep trio, and
    // the x144 threshold sweep (sharing x46's vpairs CTE), and the
    // x146 SFT pair extraction —
    // x141's SQL face is the window form of the engine's distributed
    // rank; x140's JL floats have no portable SQL image beyond the
    // registered jl_project function itself), plus the twelve r14
    // web-prep texts (x102-x104 URL/markup ladders, x107 waterfall,
    // x114/x116/x123 link-graph family, x119 host reputation, x124
    // robots gate, x130 snapshot PSI, x138 label propagation, x145
    // triangles — the planted pages are CTE stages over one shared
    // canonicalization generator)
    // plus the r14 quality/curriculum quartet x147-x150, the x151
    // contamination excision, and the second-wave five (x87/x94/x100/
    // x105/x120 — previously DataFrame-first, but their DuckDB oracles
    // proved the semantics portable)
    // plus x77's zone map, the unrolled deterministic k-means chain
    // (x78/x83/x92), and x101's closed-form Dawid-Skene round,
    // plus the r15 trio: x152 per-doc leakage probe, x153 DSIR weights,
    // x154 within-doc line repetition,
    // plus the r15 second wave: x155 NB quality classifier, x156
    // DoReMi reweighting, x157 exact-substring self-excision, and
    // x158's in-engine unrolled power iteration (the engine face
    // iterates the collected d×d Gram driver-side — two strategies,
    // one arithmetic), x159's window-form CCNet bucket rank (the
    // engine face rides the distributed prefix scan), x160's budget
    // planner over the shared x156 core, and x161's run-parity window
    // rewrite (a THIRD strategy beside the engine fold and the DuckDB
    // windows — all value-identical); x162's deflation chain exceeds
    // Spark's CTE analysis budget and stays DuckDB-oracle-only,
    // plus the r16 batch: x163 fused quality panel, x164 encoding
    // damage, x165 context sweep, x166 span corruption, x168 source
    // scorecard over the shared panel body, x169 bipartite cross probe (x167's Bradley-Terry
    // chain re-references each round twice, the x162 doubling class —
    // DuckDB-oracle-only),
    // plus the r17 four: x171 sharing x169's text (frozen-index probe
    // vs union re-mine — two strategies, one selection), x173's
    // sweep-winner packing, and x177's calibration audit (x170/x174/
    // x176 join the k-means chain class, x172 the x167 doubling class
    // — DuckDB-oracle-only)
    assert(RelationalSql.extrasSql.size == 156)
  }

  test("x49: registered kll_* SQL functions answer the sketch rollup") {
    Tables.registerAll(spark, dir)
    // estimates are randomized (KLL compaction), so the SQL face is
    // checked structurally — same groups, EXACT deterministic counts,
    // estimates inside the group's value range — not cell-exactly
    val viaDf = SparkEntry.queries("x49_kll_quantiles")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // natural call forms on purpose: the DECIMAL column and DECIMAL
    // rank literals must be accepted (the registration casts them)
    val viaSql = spark.sql(
      """WITH per AS (
        |  SELECT l_returnflag AS grp, kll_sketch_agg(l_extendedprice) AS sk
        |  FROM lineitem GROUP BY l_returnflag),
        |u AS (SELECT * FROM per
        |      UNION ALL SELECT 'TOTAL' AS grp, kll_union_agg(sk) AS sk FROM per)
        |SELECT grp, kll_count(sk) AS n,
        |       kll_quantile(sk, 0.5) AS p50,
        |       kll_quantile(sk, 0.95) AS p95
        |FROM u ORDER BY grp""".stripMargin).collect()
    assert(viaSql.map(_.getString(0)).toSeq == viaDf.keys.toSeq.sorted)
    val Array(lo, hi) = spark.sql(
      "SELECT CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem")
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    viaSql.foreach { r =>
      assert(r.getLong(1) == viaDf(r.getString(0)), s"${r.getString(0)}: count drift")
      Seq(r.getDouble(2), r.getDouble(3)).foreach(q =>
        assert(q >= lo && q <= hi, s"${r.getString(0)}: estimate $q outside [$lo, $hi]"))
      assert(r.getDouble(2) <= r.getDouble(3), "p50 above p95")
    }
  }

  test("Q20: the pipeline as one SQL statement equals SensorPipeline.run") {
    spark.read.text(Fixtures.sensorNdjson).createOrReplaceTempView("sensor_lines")
    spark.read.option("header", "true")
      .schema("sensor_id INT, group_id STRING")
      .csv(Fixtures.sensorDim)
      .createOrReplaceTempView("sensor_dim_raw")
    assertSame("q20_sensor_pipeline", RelationalSql.q20Sql)
  }
}
