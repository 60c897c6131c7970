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
    // Q1-Q19 with q06/q12 each contributing two entries, plus Q21 = 22
    // texts (Q21's twin is the correlated lookup — Spark SQL has no ASOF)
    assert(RelationalSql.sql.size == 22, "every relational query needs a SQL twin")
  }

  test("LLM-pipeline extras: SQL texts (incl. injected shingle fns) equal DataFrame forms") {
    Tables.registerAll(spark, dir)
    RelationalSql.extrasSql.toSeq.sortBy(_._1).foreach { case (name, text) =>
      withClue(name)(assertSame(name, text))
    }
    // 28 through x35, plus x36-x47's twelve twins (x37/x44 sharing
    // x26/x01 texts — one selection, two physical strategies each)
    assert(RelationalSql.extrasSql.size == 40)
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
