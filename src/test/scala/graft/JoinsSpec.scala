package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AsOfJoin, IntervalJoin}

/** Join-shape and aggregate-surface coverage beyond the oracle queries
  * (SURVEY.md §2.B rows not exercised by Q1-Q20): outer/cross joins,
  * hint-forced strategies, multiset set-ops, collect/distinct aggregates,
  * range frames, and the as-of join compositions. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val customer = Tables.load(spark, sf("sf0.001"), "customer")
  private lazy val orders = Tables.load(spark, sf("sf0.001"), "orders")

  test("full outer join keeps both dangling sides") {
    val bigCust = orders.filter($"o_totalprice" > 400000).select($"o_custkey").distinct()
    val left = customer.filter($"c_custkey" <= 50).select($"c_custkey".as("k"))
    val out = left.join(bigCust.select($"o_custkey".as("k2")), $"k" === $"k2", "full_outer")
    assert(out.filter($"k".isNull).count() > 0, "no right-dangling rows")
    assert(out.filter($"k2".isNull).count() > 0, "no left-dangling rows")
    val right = left.join(bigCust.select($"o_custkey".as("k2")), $"k" === $"k2", "right")
    assert(right.count() == bigCust.count())
  }

  test("cross join cardinality") {
    val n = Tables.load(spark, sf("sf0.001"), "nation")
    val r = Tables.load(spark, sf("sf0.001"), "region")
    assert(n.crossJoin(r).count() == n.count() * r.count())
  }

  test("join hints force SMJ / shuffle-hash physical strategies") {
    val a = orders.select($"o_custkey")
    val b = customer.select($"c_custkey")
    val smj = a.hint("merge").join(b, $"o_custkey" === $"c_custkey")
      .queryExecution.executedPlan.toString
    assert(smj.contains("SortMergeJoin"), s"merge hint ignored:\n$smj")
    val shj = a.hint("shuffle_hash").join(b, $"o_custkey" === $"c_custkey")
      .queryExecution.executedPlan.toString
    assert(shj.contains("ShuffledHashJoin"), s"shuffle_hash hint ignored:\n$shj")
  }

  test("intersectAll / exceptAll keep multiplicities") {
    val x = Seq(1, 1, 2, 3).toDF("v")
    val y = Seq(1, 2, 2).toDF("v")
    assert(x.intersectAll(y).as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(x.exceptAll(y).as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(x.intersect(y).as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("collect_list / collect_set / sum_distinct / first / last") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "v")
    val r = df.groupBy($"k").agg(
      sort_array(collect_list($"v")).as("cl"),
      sort_array(collect_set($"v")).as("cs"),
      sum_distinct(when($"v" === "a", 10).otherwise(20)).as("sd"),
      first($"v").as("f"), last($"v").as("l")).head()
    assert(r.getSeq[String](r.fieldIndex("cl")).toSeq == Seq("a", "a", "b"))
    assert(r.getSeq[String](r.fieldIndex("cs")).toSeq == Seq("a", "b"))
    assert(r.getAs[Long]("sd") == 30)
  }

  test("window range frame (rangeBetween) vs rows frame") {
    val df = Seq((1, 10, 1.0), (1, 20, 2.0), (1, 21, 4.0), (1, 40, 8.0))
      .toDF("k", "pos", "v")
    val byRange = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"pos").rangeBetween(-10, 0)
    val got = df.withColumn("s", sum($"v").over(byRange))
      .orderBy($"pos").select($"s").as[Double].collect().toSeq
    // pos=21 covers pos in [11,21] → 2+4; pos=40 covers [30,40] → 8
    assert(got == Seq(1.0, 3.0, 6.0, 8.0))
  }

  test("salted join equals plain join on skewed data") {
    import graft.operators.SkewTools
    // heavily skewed: 90% of lineitem rows mapped to one key
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
      .withColumn("skew_key", when($"l_orderkey" % 10 =!= 0, 1L).otherwise($"l_orderkey"))
    val dim = Seq((1L, "hot"), (10L, "cold10"), (20L, "cold20")).toDF("skew_key", "tag")
    val plain = li.join(dim, Seq("skew_key")).groupBy($"tag").count()
      .orderBy($"tag").collect().toSeq
    val salted = SkewTools.saltedJoin(li, dim, "skew_key", saltFactor = 8,
      entropy = Seq("l_orderkey", "l_linenumber"))
      .groupBy($"tag").count().orderBy($"tag").collect().toSeq
    assert(salted == plain)
  }

  test("salted aggregation equals direct aggregation") {
    import graft.operators.SkewTools
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("decimal(18,4)")).as("s"))
      .orderBy($"l_returnflag").collect().toSeq
    val salted = SkewTools.saltedAgg(li, "l_returnflag", 8,
      Seq("l_orderkey", "l_linenumber")) {
      _.agg(count(lit(1)).as("pn"), sum($"l_quantity".cast("decimal(18,4)")).as("ps"))
    } {
      _.agg(sum($"pn").as("n"), sum($"ps").as("s"))
    }.orderBy($"l_returnflag").collect().toSeq
    assert(salted == direct)
  }

  test("as-of join: union-timeline form picks latest at-or-before per key") {
    val quotes = Seq(
      ("A", "2024-01-01 10:00:00", 100.0),
      ("A", "2024-01-01 10:05:00", 101.0),
      ("B", "2024-01-01 10:01:00", 50.0))
      .toDF("sym", "qt", "price")
      .withColumn("qt", $"qt".cast("timestamp"))
    val trades = Seq(
      ("A", "2024-01-01 10:03:00", 5L),  // sees 100.0
      ("A", "2024-01-01 10:05:00", 6L),  // equal ts → sees 101.0
      ("B", "2024-01-01 10:00:30", 7L),  // before any quote → null
      ("B", "2024-01-01 11:00:00", 8L))  // sees 50.0
      .toDF("sym", "tt", "qty")
      .withColumn("tt", $"tt".cast("timestamp"))
    val out = AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt")
      .orderBy($"sym", $"tt")
      .select($"qty", $"price").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((5L, Some(100.0)), (6L, Some(101.0)), (7L, None), (8L, Some(50.0))))
  }

  test("as-of join preserves duplicate left rows and rejects name collisions") {
    val quotes = Seq(("A", "2024-01-01 10:00:00", 100.0))
      .toDF("sym", "qt", "price").withColumn("qt", $"qt".cast("timestamp"))
    val dupTrades = Seq(
      ("A", "2024-01-01 10:00:30", 1L),
      ("A", "2024-01-01 10:00:30", 1L)) // identical rows — both must survive
      .toDF("sym", "tt", "qty").withColumn("tt", $"tt".cast("timestamp"))
    val out = graft.operators.AsOfJoin.asOfRange(dupTrades, quotes, "sym", "tt", "qt",
      expr("INTERVAL 1 MINUTE"))
    assert(out.count() == 2, "duplicate left rows collapsed")
    // shared payload column name must error, not silently overwrite
    val clashRight = quotes.withColumnRenamed("price", "qty")
    val e = intercept[IllegalArgumentException](
      graft.operators.AsOfJoin.asOf(dupTrades, clashRight, "sym", "tt", "qt"))
    assert(e.getMessage.contains("collide"))
  }

  test("guard rails: salted outer join and wide simhash threshold are rejected") {
    import graft.operators.{Dedup, SkewTools}
    val a = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException](
      SkewTools.saltedJoin(a, a, "k", 4, Seq("v"), joinType = "full_outer"))
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(Seq((1L, "t")).toDF("doc_id", "text"), maxHamming = 5))
  }

  test("as-of join: union and range forms pick the same winner on tied right rows") {
    val quotes = Seq(
      ("A", "2024-01-01 10:00:00", 100.0),
      ("A", "2024-01-01 10:00:00", 101.0)) // tied on time — payload breaks it
      .toDF("sym", "qt", "price").withColumn("qt", $"qt".cast("timestamp"))
    val trades = Seq(("A", "2024-01-01 10:00:30", 1L))
      .toDF("sym", "tt", "qty").withColumn("tt", $"tt".cast("timestamp"))
    val viaUnion = AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt")
      .select($"qty", $"price").as[(Long, Double)].head()
    val viaRange = AsOfJoin.asOfRange(trades, quotes, "sym", "tt", "qt",
      expr("INTERVAL 1 MINUTE"))
      .select($"qty", $"price").as[(Long, Double)].head()
    assert(viaUnion == viaRange, s"tie-break disagreement: $viaUnion vs $viaRange")
    assert(viaUnion._2 == 101.0, "largest payload must win in both forms")
  }

  test("native as-of exec equals the union-timeline form on ties, nulls, and null times") {
    val quotes = Seq(
      (Some("A"), Some("2024-01-01 10:00:00"), Some(100.0)),
      (Some("A"), Some("2024-01-01 10:00:00"), Some(101.0)), // tied time — larger payload wins
      (Some("A"), Some("2024-01-01 10:05:00"), Some(102.0)),
      (Some("B"), Some("2024-01-01 10:01:00"), Some(50.0)),
      (None,      Some("2024-01-01 10:00:00"), Some(77.0)),  // null key partition
      (Some("C"), None,                        Some(88.0)))  // null time: at-or-before anything
      .toDF("sym", "qt", "price").withColumn("qt", $"qt".cast("timestamp"))
    val trades = Seq(
      (Some("A"), Some("2024-01-01 10:03:00"), 1L),
      (Some("A"), Some("2024-01-01 10:00:00"), 2L),
      (Some("B"), Some("2024-01-01 10:00:30"), 3L),
      (Some("B"), Some("2024-01-01 11:00:00"), 4L),
      (None,      Some("2024-01-01 10:30:00"), 5L), // sees the null-key quote
      (Some("C"), None,                        6L), // null time sees only null-time quotes
      (Some("C"), Some("2024-01-01 09:00:00"), 7L),
      (Some("D"), Some("2024-01-01 10:00:00"), 8L)) // key with no quotes → null
      .toDF("sym", "tt", "qty").withColumn("tt", $"tt".cast("timestamp"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qty", $"price").as[(Long, Option[Double])].collect().toSeq.sorted
    val native = rows(AsOfJoin.asOfNative(trades, quotes, "sym", "tt", "qt"))
    val union = rows(AsOfJoin.asOf(trades, quotes, "sym", "tt", "qt"))
    assert(native == union, s"native $native != union-timeline $union")
    assert(native == Seq((1L, Some(101.0)), (2L, Some(101.0)), (3L, None),
      (4L, Some(50.0)), (5L, Some(77.0)), (6L, Some(88.0)), (7L, Some(88.0)), (8L, None)))
  }

  test("forward as-of: earliest at-or-after per key, timestamps and brute force") {
    val quotes = Seq(
      ("A", "2024-01-01 10:00:00", 100.0),
      ("A", "2024-01-01 10:05:00", 101.0),
      ("B", "2024-01-01 10:01:00", 50.0))
      .toDF("sym", "qt", "price")
      .withColumn("qt", $"qt".cast("timestamp"))
    val trades = Seq(
      ("A", "2024-01-01 10:03:00", 5L),  // next quote at 10:05 → 101.0
      ("A", "2024-01-01 10:05:00", 6L),  // equal ts is inclusive → 101.0
      ("B", "2024-01-01 10:00:30", 7L),  // next B quote 10:01 → 50.0
      ("B", "2024-01-01 11:00:00", 8L))  // nothing after → null
      .toDF("sym", "tt", "qty")
      .withColumn("tt", $"tt".cast("timestamp"))
    val out = AsOfJoin.asOfForward(trades, quotes, "sym", "tt", "qt")
      .orderBy($"sym", $"tt")
      .select($"qty", $"price").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((5L, Some(101.0)), (6L, Some(101.0)),
      (7L, Some(50.0)), (8L, None)))
    // the original right time column is excluded, like the backward form
    assert(!AsOfJoin.asOfForward(trades, quotes, "sym", "tt", "qt")
      .columns.contains("qt"))
    // shared time-column names work, like the backward form
    val sameName = AsOfJoin.asOfForward(
        trades.withColumnRenamed("tt", "ts"),
        quotes.withColumnRenamed("qt", "ts"), "sym", "ts", "ts")
      .orderBy($"sym", $"ts")
      .select($"qty", $"price").as[(Long, Option[Double])].collect().toSeq
    assert(sameName == out)

    // randomized brute-force cross-check on integer times
    val rnd = new scala.util.Random(11)
    val lrows = Seq.fill(300)((rnd.nextInt(6).toString, rnd.nextInt(40), rnd.nextInt(1000).toLong))
    val rrows = Seq.fill(300)((rnd.nextInt(8).toString, rnd.nextInt(40), rnd.nextInt(500).toDouble))
    val l = lrows.toDF("k", "t", "lval")
    val r = rrows.toDF("k", "rt", "p")
    val got = AsOfJoin.asOfForward(l, r, "k", "t", "rt")
      .select($"k", $"t", $"lval", $"p")
      .as[(String, Int, Long, Option[Double])].collect().toSeq.sorted
    val expected = lrows.map { case (k, t, v) =>
      val matches = rrows.filter(rr => rr._1 == k && rr._2 >= t)
      val best =
        if (matches.isEmpty) None
        else {
          val minRt = matches.map(_._2).min
          // the composed form's deterministic tie-break at equal time:
          // largest payload struct wins
          Some(matches.filter(_._2 == minRt).map(_._3).max)
        }
      (k, t, v, best)
    }.sorted
    assert(got == expected)
    assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
  }

  test("native as-of exec equals the union-timeline form on randomized data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(400)((rnd.nextInt(8).toString, rnd.nextInt(50), rnd.nextInt(1000).toLong))
      .toDF("k", "t", "lval")
    val right = Seq.fill(400)((rnd.nextInt(10).toString, rnd.nextInt(50), rnd.nextInt(5).toDouble,
        rnd.nextInt(3).toString))
      .toDF("k", "rt", "p1", "p2") // narrow p1 range → frequent (key, time, p1) ties
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"t", $"lval", $"p1", $"p2")
        .as[(String, Int, Long, Option[Double], Option[String])].collect().toSeq.sorted
    val native = rows(AsOfJoin.asOfNative(left, right, "k", "t", "rt"))
    val union = rows(AsOfJoin.asOf(left, right, "k", "t", "rt"))
    assert(native == union)
    assert(native.nonEmpty)
  }

  test("native as-of join plans to the custom exec: merge scan, no join, no window") {
    val quotes = Seq(("A", 10, 1.0)).toDF("sym", "qt", "price")
    val trades = Seq(("A", 11, 5L)).toDF("sym", "tt", "qty")
    val out = AsOfJoin.asOfNative(trades, quotes, "sym", "tt", "qt")
    val plan = out.queryExecution.executedPlan.toString
    // the exec prints under its stripped node name "AsOfJoin"
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("Window"), s"native form must not fall back to join/window:\n$plan")
    assert(out.as[(String, Int, Long, Double)].collect().toSeq == Seq(("A", 11, 5L, 1.0)))
  }

  test("native as-of with tolerance equals the range form (bounded lookback)") {
    val quotes = Seq(("A", "2024-01-01 10:00:00", 100.0))
      .toDF("sym", "qt", "price").withColumn("qt", $"qt".cast("timestamp"))
    val trades = Seq(
      ("A", "2024-01-01 10:00:30", 1L),   // within 1 min tolerance
      ("A", "2024-01-01 10:30:00", 2L))   // stale — match exists but out of window
      .toDF("sym", "tt", "qty").withColumn("tt", $"tt".cast("timestamp"))
    val out = AsOfJoin.asOfNative(trades, quotes, "sym", "tt", "qt",
      expr("INTERVAL 1 MINUTE"))
      .orderBy($"qty").select($"qty", $"price").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((1L, Some(100.0)), (2L, None)))
    // randomized cross-check vs the range-join composition
    val rnd = new scala.util.Random(11)
    val left = Seq.fill(300)((rnd.nextInt(6).toString, rnd.nextInt(40), rnd.nextInt(1000).toLong))
      .toDF("k", "t", "lval")
    val right = Seq.fill(300)((rnd.nextInt(8).toString, rnd.nextInt(40), rnd.nextInt(4).toDouble))
      .toDF("k", "rt", "p")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"t", $"lval", $"p")
        .as[(String, Int, Long, Option[Double])].collect().toSeq.sorted
    val native = rows(AsOfJoin.asOfNative(left, right, "k", "t", "rt", lit(5)))
    val range = rows(AsOfJoin.asOfRange(left, right, "k", "t", "rt", lit(5)))
    assert(native == range)
    assert(native.nonEmpty)
    // null keys: the native form keeps asOf's window discipline (null
    // matches null, within the window) — documented divergence from
    // asOfRange's SQL join, which drops null keys (as asOf vs asOfRange
    // already do)
    val nullLeft = Seq((Option.empty[String], 10, 1L)).toDF("k", "t", "lval")
    val nullRight = Seq((Option.empty[String], 8, 7.0)).toDF("k", "rt", "p")
    val viaNative = AsOfJoin.asOfNative(nullLeft, nullRight, "k", "t", "rt", lit(5))
      .select($"p").as[Option[Double]].head()
    val viaRange = AsOfJoin.asOfRange(nullLeft, nullRight, "k", "t", "rt", lit(5))
      .select($"p").as[Option[Double]].head()
    assert(viaNative == Some(7.0), "native tolerance form must match null keys like asOf")
    assert(viaRange == None, "range form drops null keys (SQL join semantics)")
  }

  test("as-of join: range form with tolerance matches and bounds lookback") {
    val quotes = Seq(("A", "2024-01-01 10:00:00", 100.0))
      .toDF("sym", "qt", "price").withColumn("qt", $"qt".cast("timestamp"))
    val trades = Seq(
      ("A", "2024-01-01 10:00:30", 1L),   // within 1 min tolerance
      ("A", "2024-01-01 10:30:00", 2L))   // stale — outside tolerance
      .toDF("sym", "tt", "qty").withColumn("tt", $"tt".cast("timestamp"))
    val out = AsOfJoin.asOfRange(trades, quotes, "sym", "tt", "qt",
      expr("INTERVAL 1 MINUTE"))
      .orderBy($"qty").select($"qty", $"price").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((1L, Some(100.0)), (2L, None)))
  }

  test("binned interval join: boundary inclusivity, bin crossings, zero-length, empty intervals") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val iv = Seq(
      (1L, d("1995-01-01"), d("1995-01-09")), // crosses a 7-day bin edge
      (2L, d("1995-01-05"), d("1995-01-05")), // zero-length
      (3L, d("1996-06-01"), d("1996-06-30"))) // no points at all
      .toDF("id", "d0", "d1")
    val pts = Seq(
      d("1995-01-01"),  // == d0 of 1: inclusive
      d("1995-01-09"),  // == d1 of 1: inclusive
      d("1995-01-05"),  // inside 1 AND == both ends of 2
      d("1994-12-31"),  // one day before 1
      d("1995-01-10"))  // one day after 1
      .map(Tuple1(_)).toDF("d")
    val out = IntervalJoin.pointInIntervalCount(iv, pts, binDays = 7)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 1L), (3L, 0L)))
  }

  test("binned interval join equals the naive BETWEEN join on real tables") {
    val dir = sf("sf0.001")
    val iv = Tables.load(spark, dir, "orders").select(
      $"o_orderkey".as("id"),
      to_date($"o_orderdate").as("d0"),
      date_add(to_date($"o_orderdate"), ($"o_orderkey" % 29).cast("int")).as("d1"))
    val pts = Tables.load(spark, dir, "lineitem")
      .filter($"l_quantity" >= 48.0).select(to_date($"l_shipdate").as("d"))
    val naive = iv.join(pts, $"d".between($"d0", $"d1"))
      .groupBy($"id").agg(count(lit(1)).as("n_hits"))
    val expected = iv.select($"id").join(naive, Seq("id"), "left")
      .withColumn("n_hits", coalesce($"n_hits", lit(0L)))
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    // every bin width gives the same answer; only the plan changes
    for (binDays <- Seq(1, 7, 40)) {
      val got = IntervalJoin.pointInIntervalCount(iv, pts, binDays)
        .orderBy($"id").as[(Long, Long)].collect().toSeq
      assert(got == expected, s"binDays=$binDays drifted from the BETWEEN join")
    }
  }

  test("interval top-k equals the naive BETWEEN+rank join; per-day pre-reduction is lossless") {
    val dir = sf("sf0.001")
    val iv = Tables.load(spark, dir, "orders").select(
      $"o_orderkey".as("id"),
      to_date($"o_orderdate").as("d0"),
      date_add(to_date($"o_orderdate"), ($"o_orderkey" % 29).cast("int")).as("d1"))
    val pts = Tables.load(spark, dir, "lineitem")
      .filter($"l_quantity" >= 48.0)
      .select(to_date($"l_shipdate").as("d"), $"l_orderkey".as("pt_orderkey"),
        $"l_linenumber".as("pt_linenumber"), $"l_extendedprice".as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"id")
      .orderBy($"score".desc, $"pt_orderkey", $"pt_linenumber")
    val expected = iv.join(pts, $"d".between($"d0", $"d1"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"id", $"rank", $"pt_orderkey", $"pt_linenumber", $"score")
      .orderBy($"id", $"rank")
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    assert(expected.nonEmpty && expected.exists(_._2 == 3),
      "vacuous fixture: no interval reaches rank 3")
    for (binDays <- Seq(1, 7, 40)) {
      val got = IntervalJoin.topKPointsPerInterval(iv, pts, binDays, k = 3)
        .orderBy($"id", $"rank")
        .as[(Long, Int, Long, Long, Double)].collect().toSeq
      assert(got == expected, s"binDays=$binDays drifted from the BETWEEN+rank join")
    }
    // the broadcast-calendar plan (what x61 runs) is cell-identical
    val ptsKeyed = pts.select($"d",
      ($"pt_orderkey" * IntervalJoin.PtKeyStride + $"pt_linenumber").as("pt_key"),
      $"score")
    val viaCal = IntervalJoin.topKPointsPerIntervalBroadcast(iv, ptsKeyed, k = 3)
      .select($"id", $"rank",
        expr(s"pt_key div ${IntervalJoin.PtKeyStride}").as("pt_orderkey"),
        ($"pt_key" % IntervalJoin.PtKeyStride).as("pt_linenumber"), $"score")
      .orderBy($"id", $"rank")
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    assert(viaCal == expected, "broadcast-calendar plan drifted from the window form")
    // and it is shuffle-free over the interval side: no Exchange above
    // the orders scan (the one job in the plan is the calendar collect)
    val plan = IntervalJoin.topKPointsPerIntervalBroadcast(iv, ptsKeyed, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a shuffle-free projection:\n$plan")
  }

  test("broadcast-calendar guard: over-bound domains fall back to the join form, same rows") {
    val dir = sf("sf0.001")
    val iv = Tables.load(spark, dir, "orders").select(
      $"o_orderkey".as("id"),
      to_date($"o_orderdate").as("d0"),
      date_add(to_date($"o_orderdate"), ($"o_orderkey" % 29).cast("int")).as("d1"))
    val ptsKeyed = Tables.load(spark, dir, "lineitem")
      .filter($"l_quantity" >= 48.0)
      .select(to_date($"l_shipdate").as("d"),
        ($"l_orderkey" * IntervalJoin.PtKeyStride + $"l_linenumber").as("pt_key"),
        $"l_extendedprice".as("score"))
    val kernel = IntervalJoin.topKPointsPerIntervalBroadcast(iv, ptsKeyed, k = 3)
      .orderBy($"id", $"rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(kernel.nonEmpty)

    // trip 1: entry count — a 4-entry cap is far below this calendar
    val viaEntryTrip = IntervalJoin.topKPointsPerIntervalBroadcast(
      iv, ptsKeyed, k = 3, maxCalendarEntries = 4)
    assert(viaEntryTrip.queryExecution.executedPlan.toString.contains("Exchange"),
      "expected the DISTRIBUTED join plan after the entry-count trip")
    val gotEntry = viaEntryTrip.orderBy($"id", $"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(gotEntry == kernel, "fallback join form drifted from the kernel path")

    // trip 2: dense SPAN — one stray far-future point keeps the entry
    // count tiny but stretches [min day, max day] past the bound (the
    // bad-data shape that would otherwise inflate the driver array)
    val stray = Seq((java.sql.Date.valueOf("2247-01-01"), 1L, 0.0001))
      .toDF("d", "pt_key", "score")
    val withStray = ptsKeyed.union(stray)
    val viaSpanTrip = IntervalJoin.topKPointsPerIntervalBroadcast(
      iv, withStray, k = 3, maxCalendarEntries = 50000)
    assert(viaSpanTrip.queryExecution.executedPlan.toString.contains("Exchange"),
      "expected the DISTRIBUTED join plan after the span trip")
    // the stray point is outside every interval, so rows are unchanged
    val gotSpan = viaSpanTrip.orderBy($"id", $"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(gotSpan == kernel, "span-trip fallback drifted from the kernel path")
  }
}
