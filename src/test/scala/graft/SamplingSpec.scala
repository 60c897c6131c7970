package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sampling

/** Semantic coverage for the corpus-assembly operators: deterministic
  * splitting, per-source mixing, and sequence packing. Cell-exact
  * cross-engine agreement is the driver oracle's job (x19-x21); these
  * pin the properties a training pipeline actually leans on —
  * partition-independence, nested samples, packing invariants. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf("sf0.001"), "documents")

  test("split assignment is a pure function of the key: stable under repartitioning") {
    val a = Sampling.splitQuery(spark, sf("sf0.001"))
      .as[(Long, String)].collect().toSeq
    val b = docs.repartition(7)
      .select($"doc_id",
        Sampling.assignSplit($"doc_id", "graft", Sampling.splitFractions).as("split"))
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(a == b, "split flipped under a different partitioning")
  }

  test("split fractions track the requested 80/10/10 within binomial noise") {
    val n = 20000L
    val ids = spark.range(n).toDF("doc_id")
    val counts = ids
      .select(Sampling.assignSplit($"doc_id", "graft", Sampling.splitFractions).as("split"))
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 5 sigma at p=0.1, n=20k is ~212 docs ≈ 1.1% absolute
    def frac(s: String) = counts(s).toDouble / n
    assert(math.abs(frac("train") - 0.8) < 0.02, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.015, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.015, s"test ${frac("test")}")
  }

  test("samples at increasing rates are nested; rate 0 empty, rate 1 total") {
    val ids = spark.range(5000).toDF("doc_id")
    def kept(rate: Double) = ids
      .filter(Sampling.keepAtRate($"doc_id", "s", lit(rate)))
      .as[Long].collect().toSet
    val k25 = kept(0.25)
    val k75 = kept(0.75)
    assert(k25.subsetOf(k75), "low-rate sample is not nested in the high-rate one")
    assert(kept(0.0).isEmpty)
    assert(kept(1.0).size == 5000)
    // and the rates are roughly honored
    assert(math.abs(k25.size / 5000.0 - 0.25) < 0.03)
    assert(math.abs(k75.size / 5000.0 - 0.75) < 0.03)
  }

  test("null keys get a null split, not a silent bucket; bad fractions rejected") {
    val d = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val out = d.select($"doc_id",
        Sampling.assignSplit($"doc_id", "graft", Sampling.splitFractions).as("split"))
      .orderBy($"doc_id".asc_nulls_first).collect()
    assert(out(0).isNullAt(1), "null key must yield a null split")
    assert(!out(1).isNullAt(1) && !out(2).isNullAt(1))
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(lit(1L), "s", Seq("a" -> 0.9, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(lit(1L), "s", Seq.empty)
    }
  }

  test("split and mix plans are pure narrow projections: zero exchanges") {
    // the unordered operator forms (what a 100 TB pipeline composes) must
    // not shuffle at all — the orderBy in the driver queries is only the
    // oracle's total-order contract
    val split = docs.select($"doc_id",
      Sampling.assignSplit($"doc_id", "graft", Sampling.splitFractions).as("split"))
    val mix = Sampling.mixCorpus(docs, $"doc_id", "mix", Sampling.mixRates)
    Seq(split, mix).foreach { df =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    }
  }

  test("mix keeps each source at its own rate") {
    val n = 4000L
    val d = spark.range(n).select($"id".as("doc_id"),
      concat(lit("src"), ($"id" % 4).cast("string")).as("source"))
    val rates = Map("src0" -> 0.1, "src1" -> 0.5, "src2" -> 0.9, "src3" -> 1.0)
    val kept = Sampling.mixCorpus(d, $"doc_id", "m", rates)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    rates.foreach { case (src, r) =>
      val f = kept.getOrElse(src, 0L) / (n / 4).toDouble
      assert(math.abs(f - r) < 0.06, s"$src kept $f, wanted $r")
    }
    // absent sources use the default rate (1.0 → all kept)
    val all = Sampling.mixCorpus(d, $"doc_id", "m", Map("srcX" -> 0.5))
    assert(all.count() == n)
  }

  test("weighted mix (broadcast-join form) is decision-identical to the literal form") {
    val weights = Sampling.mixRates.toSeq.toDF("source", "rate")
    val viaCase = Sampling.mixCorpus(docs, $"doc_id", "mix", Sampling.mixRates)
      .select($"doc_id").as[Long].collect().toSet
    val viaJoin = Sampling.mixCorpusWeighted(docs, $"doc_id", "mix", weights)
      .select($"doc_id").as[Long].collect().toSet
    assert(viaCase == viaJoin, "broadcast-weights mix disagrees with the CASE-chain mix")
    // sources absent from the weights table fall back to defaultRate —
    // same fallback the literal form applies
    val partial = Sampling.mixRates.toSeq.filter(_._1 != "src3").toDF("source", "rate")
    val viaCasePartial = Sampling.mixCorpus(docs, $"doc_id", "mix",
        Sampling.mixRates - "src3", defaultRate = 0.4)
      .select($"doc_id").as[Long].collect().toSet
    val viaJoinPartial = Sampling.mixCorpusWeighted(docs, $"doc_id", "mix",
        partial, defaultRate = 0.4)
      .select($"doc_id").as[Long].collect().toSet
    assert(viaCasePartial == viaJoinPartial)
    // malformed (duplicate-keyed) weights tables are rejected up front
    intercept[IllegalArgumentException] {
      Sampling.mixCorpusWeighted(docs, $"doc_id", "mix",
        Seq(("src0", 0.5), ("src0", 0.9)).toDF("source", "rate"))
    }
    // and the weighted form keeps the same output columns as the input
    assert(Sampling.mixCorpusWeighted(docs, $"doc_id", "mix", weights).columns.toSeq
      == docs.columns.toSeq)
  }

  test("weighted mix plan: broadcast join, fact side never shuffles") {
    val weights = Sampling.mixRates.toSeq.toDF("source", "rate")
    val df = Sampling.mixCorpusWeighted(docs, $"doc_id", "mix", weights)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weights join not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"fact side shuffled in what must be a narrow pass:\n$plan")
  }

  test("stratified sample: exactly n per stratum, whole stratum when smaller, stable") {
    val d = spark.range(1000).select($"id".as("doc_id"),
      concat(lit("s"), ($"id" % 3).cast("string")).as("source"))
      .union(Seq((9991L, "tiny"), (9992L, "tiny")).toDF("doc_id", "source"))
    val out = Sampling.stratifiedSample(d, $"source", $"doc_id", "t", 10)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(out == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L, "tiny" -> 2L))
    // selection is a pure function of (key, salt): repartitioning the
    // input changes nothing
    val a = Sampling.stratifiedSample(d, $"source", $"doc_id", "t", 10)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(d.repartition(13), $"source", $"doc_id", "t", 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "stratified selection flipped under a different partitioning")
    // a different salt draws a different sample (not degenerate)
    val c = Sampling.stratifiedSample(d, $"source", $"doc_id", "u", 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(a != c)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(d, $"source", $"doc_id", "t", 0)
    }
  }

  test("packing: every doc's start offset lands in its pack's token range") {
    val budget = 2000L
    val out = Sampling.packSequences(docs, budget = budget, shards = 32)
      .orderBy($"shard", $"doc_id")
      .as[(Long, Long, Long, Long)].collect()
    var cum = Map.empty[Long, Long].withDefaultValue(0L)
    out.foreach { case (docId, nTok, shard, packId) =>
      val start = cum(shard)
      val bin = start / budget
      assert(packId == shard * Sampling.ShardStride + bin,
        s"doc $docId: pack $packId, expected shard $shard bin $bin (start $start)")
      cum += shard -> (start + nTok)
    }
    // pack ids never decrease along a shard's doc order, and every doc of
    // a pack is contiguous in that order (greedy fill)
    out.groupBy(_._3).foreach { case (_, rows) =>
      val packs = rows.sortBy(_._1).map(_._4)
      assert(packs.zip(packs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("packing: pack ids stay disjoint across shards past 10^6 bins per shard") {
    // Round-4 verdict: the old shard*1e6 stride silently collided once a
    // shard held >1M bins. Force shard 0 past 2.5M bins (budget=1, one
    // 2.5M-token doc) and check its ids never enter another shard's range.
    val big = Seq.fill(2500000)("w").mkString(" ") // 2.5M tokens, shard 0
    val d = Seq(
      (0L, big),          // shard 0, bin 0
      (2L, "w w"),        // shard 0, starts at 2.5M tokens → bin 2_500_000
      (1L, "w"),          // shard 1, bin 0
      (3L, "w w w")       // shard 1, starts at 1 → bin 1
    ).toDF("doc_id", "text")
    val out = Sampling.packSequences(d, budget = 1L, shards = 2)
      .select($"shard", $"pack_id").as[(Long, Long)].collect()
    val byShard = out.groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).toSet }
    // shard 0 really exceeded the old 1e6 stride...
    assert(byShard(0L).exists(_ >= 1000000L), s"test did not reach 1e6 bins: $byShard")
    // ...and every shard's ids stay inside [shard*stride, (shard+1)*stride)
    byShard.foreach { case (s, ids) =>
      ids.foreach { id =>
        assert(id >= s * Sampling.ShardStride && id < (s + 1) * Sampling.ShardStride,
          s"pack id $id of shard $s escaped its stride range")
      }
    }
    assert(byShard(0L).intersect(byShard(1L)).isEmpty)
    // shard count itself is bounded to keep ids within positive Long
    intercept[IllegalArgumentException] {
      Sampling.packSequences(d, budget = 1L, shards = (1 << 22) + 1)
    }
  }

  test("packing: an over-budget doc occupies its own bins without derailing the fill") {
    val d = Seq(
      (0L, Seq.fill(500)("w").mkString(" ")),   // bin 0: 500
      (32L, Seq.fill(5000)("w").mkString(" ")), // starts at 500 → bin 0, spills
      (64L, Seq.fill(100)("w").mkString(" ")),  // starts at 5500 → bin 5
      (96L, Seq.fill(100)("w").mkString(" "))   // starts at 5600 → bin 5
    ).toDF("doc_id", "text") // all shard 0 (ids ≡ 0 mod 32)
    val out = Sampling.packSequences(d, budget = 1000L, shards = 32)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._4).toSeq == Seq(0L, 0L, 5L, 5L))
  }

  test("denseIds: exactly 0..N-1, in total order, stable under repartitioning") {
    val d = docs.select($"doc_id", $"source")
    val rows = Sampling.denseIds(d, Seq($"source", $"doc_id"))
      .select($"source", $"doc_id", $"dense_id")
      .orderBy($"dense_id").as[(String, Long, Long)].collect().toSeq
    // dense: ids are exactly the contiguous range
    assert(rows.map(_._3) == (0L until rows.size).toSeq)
    // ordered: id order IS (source, doc_id) order
    assert(rows.map(r => (r._1, r._2)) == rows.map(r => (r._1, r._2)).sorted)
    // the assignment is partition-count independent
    val again = Sampling.denseIds(d.repartition(13), Seq($"source", $"doc_id"),
        numPartitions = 5)
      .select($"source", $"doc_id", $"dense_id")
      .orderBy($"dense_id").as[(String, Long, Long)].collect().toSeq
    assert(again == rows, "dense ids flipped under a different partitioning")
    intercept[IllegalArgumentException] { Sampling.denseIds(d, Seq.empty) }
  }

  test("stratifiedSampleAgg: cell-identical to the window form") {
    val win = Sampling.stratifiedSample(docs, $"source", $"doc_id", "strat", 12)
      .select($"doc_id", $"source").as[(Long, String)].collect().toSet
    val heap = Sampling.stratifiedSampleAgg(docs, $"source", "doc_id", "strat", 12)
      .select($"doc_id", $"source").as[(Long, String)].collect().toSet
    assert(heap == win, "heap plan selected a different sample than the window plan")
    assert(heap.groupBy(_._2).forall(_._2.size == 12))
  }

  test("stratifiedSampleAgg: a null stratum is its own stratum, same as the window form") {
    val d = spark.range(100).select($"id".as("doc_id"),
      when($"id" % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("s"), ($"id" % 3).cast("string"))).as("source"))
    val win = Sampling.stratifiedSample(d, $"source", $"doc_id", "ns", 5)
      .as[(Long, Option[String])].collect().toSet
    val heap = Sampling.stratifiedSampleAgg(d, $"source", "doc_id", "ns", 5)
      .as[(Long, Option[String])].collect().toSet
    assert(win.count(_._2.isEmpty) == 5, "window form lost the null stratum")
    assert(heap == win, "null-stratum selection diverged between the two forms")
  }

  test("weightedSample: weight-proportional selection, non-positive excluded, deterministic") {
    val rows = spark.range(1000).select($"id".as("k"),
      when($"id" < 50, 99.0).otherwise(1.0).as("w"))
    val picked = Sampling.weightedSample(rows, $"k", "t", $"w", 100)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(picked.size == 100)
    // heavy rows are 50 of 1000 ids but ~84% of total weight: A-ES should
    // take nearly all of them into a 100-row sample (p(miss) per heavy
    // row is tiny; 45 is a >5-sigma floor)
    val heavy = picked.count(_ < 50)
    assert(heavy >= 45, s"only $heavy of 50 heavy rows selected")
    // deterministic: same (key, salt, weight) → same sample, any partitioning
    val again = Sampling.weightedSample(rows.repartition(7), $"k", "t", $"w", 100)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(again == picked, "sample flipped under a different partitioning")
    // non-positive weights are ineligible, not an error; n caps at the
    // eligible count
    val mixed = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0), (4L, 5.0)).toDF("k", "w")
    val out = Sampling.weightedSample(mixed, $"k", "t2", $"w", 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(out == Set(1L, 4L), s"non-positive-weight rows leaked: $out")
  }

  test("weightedSamplePerGroup: heap form matches the window form cell-exactly") {
    // Same A-ES score arithmetic, selected via row_number per group —
    // the reference semantics the bounded heap replaces at scale.
    val rows = docs.select($"doc_id", $"source",
      size(graft.operators.TextAnalysis.wsTokens($"text")).cast("long").as("w"))
    val viaHeap = Sampling.weightedSamplePerGroup(rows, $"source", "doc_id", "g", $"w", 5)
      .select($"doc_id", $"source").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    val u = (Sampling.hashBucket($"doc_id", "g") + lit(1L)).cast("double") / lit(Sampling.BucketSpace)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"_score".desc, $"doc_id")
    val viaWindow = rows.filter($"w" > 0)
      .withColumn("_score", pow(u, lit(1.0) / $"w".cast("double")))
      .withColumn("rn", row_number().over(win)).filter($"rn" <= 5)
      .select($"doc_id", $"source").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    assert(viaHeap == viaWindow)
    // and stable under a different input partitioning
    val again = Sampling.weightedSamplePerGroup(
        rows.repartition(7), $"source", "doc_id", "g", $"w", 5)
      .select($"doc_id", $"source").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    assert(again == viaHeap, "per-group sample flipped under repartitioning")
  }

  test("weightedSamplePerGroup: caps at group size, excludes non-positive, null group stands alone") {
    val rows = Seq(
      (1L, Some("a"), 2.0), (2L, Some("a"), 3.0), (3L, Some("a"), 0.0),
      (4L, Some("b"), 1.0),
      (5L, None, 1.0), (6L, None, -2.0)
    ).toDF("k", "g", "w")
    val got = Sampling.weightedSamplePerGroup(rows, $"g", "k", "s", $"w", 10)
      .select($"k", $"g").as[(Long, Option[String])].collect().toSeq.sortBy(_._1)
    // every positive-weight row survives (n=10 > any group); zero/negative never
    assert(got == Seq((1L, Some("a")), (2L, Some("a")), (4L, Some("b")), (5L, None)))
  }

  // -------------------------------------------------- epoch upsampling

  test("upsampleEpochs: every doc gets floor(w) or ceil(w) copies with contiguous ordinals") {
    val n = 4000L
    val d = spark.range(n).select($"id".as("doc_id"),
      concat(lit("src"), ($"id" % 4).cast("string")).as("source"))
    val w = Map("src0" -> 0.4, "src1" -> 1.0, "src2" -> 1.7, "src3" -> 2.5)
    val out = Sampling.upsampleEpochs(d, $"doc_id", "es", w)
      .select($"doc_id", $"source", $"copy")
      .as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, rs) =>
      val src = rs.head._2
      val lo = math.floor(w(src)).toLong
      assert(rs.length == lo || rs.length == lo + 1,
        s"doc $id ($src, w=${w(src)}): ${rs.length} copies")
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"doc $id: non-contiguous copy ordinals ${rs.map(_._3).sorted.toSeq}")
    }
    // per-source total mass tracks w * n_src within binomial noise
    // (the fractional coin is the only randomness; sd = sqrt(n p (1-p)))
    out.groupBy(_._2).foreach { case (src, rs) =>
      val nSrc = n / 4.0
      val expected = w(src) * nSrc
      val frac = w(src) - math.floor(w(src))
      val sd = math.sqrt(nSrc * frac * (1 - frac))
      assert(math.abs(rs.length - expected) <= 4 * sd + 1e-9,
        s"$src: ${rs.length} copies vs expected $expected (sd=$sd)")
    }
    // integral weights are exact: every src1 doc exactly once, src3 at
    // least twice
    assert(byDoc.collect { case (_, rs) if rs.head._2 == "src1" => rs.length }
      .forall(_ == 1))
  }

  test("upsampleEpochs: extra-copy subset IS the keepAtRate subset (nested with the mix)") {
    val d = spark.range(2000).select($"id".as("doc_id"), lit("srcA").as("source"))
    val w = 1.3
    val extras = Sampling.upsampleEpochs(d, $"doc_id", "es", Map("srcA" -> w))
      .filter($"copy" === 1).select($"doc_id").as[Long].collect().toSet
    val kept = d.filter(Sampling.keepAtRate($"doc_id", "es", lit(w - 1.0)))
      .select($"doc_id").as[Long].collect().toSet
    assert(extras == kept,
      "fractional extra copies must be the same hash-selected subset the mix keeps")
  }

  test("upsampleEpochs is a pure narrow plan: zero exchanges, partition-stable") {
    val d = Tables.load(spark, sf("sf0.001"), "documents")
    val up = Sampling.upsampleEpochs(d, $"doc_id", "epoch", Sampling.epochWeights)
      .select($"doc_id", $"source", $"copy")
    up.collect()
    val plan = up.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val base = up.as[(Long, String, Long)].collect().toSet
    val reparted = Sampling.upsampleEpochs(d.repartition(13), $"doc_id", "epoch",
        Sampling.epochWeights)
      .select($"doc_id", $"source", $"copy").as[(Long, String, Long)].collect().toSet
    assert(base == reparted)
  }

  test("prefixSum equals the per-group window cumsum (multi-partition, null group)") {
    import org.apache.spark.sql.expressions.Window
    // deterministic pseudo-random values; group g6 is NULL (its own group)
    val rows = (0L until 997L).map { i =>
      val g = if (i % 7 == 6) None else Some(s"g${i % 7}")
      (i, g, (i * 2654435761L % 100).toLong)
    }
    val df = rows.toDF("id", "g", "v").repartition(5)
    val win = Window.partitionBy($"g").orderBy($"id").rowsBetween(Window.unboundedPreceding, 0)
    val expected = df.withColumn("cum", sum($"v").over(win))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val got = Sampling.prefixSum(df, Seq("g"), Seq($"id"), "v", "cum", numPartitions = 6)
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(got == expected, "distributed prefix scan drifted from the window form")
    // and the scan's partition count is what was asked for, not 1
    assert(Sampling.prefixSum(df, Seq("g"), Seq($"id"), "v", numPartitions = 6)
      .rdd.getNumPartitions == 6)
  }

  test("tokenBudget keeps the budget-crossing doc and drops the rest") {
    // four 3-token docs per source, budget 8: cum 3,6,9,12 — the doc that
    // CROSSES the budget (starts at 6 < 8) is kept, the next is not
    val d = (0L until 8L).map(i => (i, s"s${i / 4}", "w w w")).toDF("doc_id", "source", "text")
    val out = Sampling.tokenBudget(d, budget = 8).orderBy($"doc_id")
      .select($"doc_id", $"cum_tokens", $"kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, true), (1L, 6L, true), (2L, 9L, true), (3L, 12L, false),
      (4L, 3L, true), (5L, 6L, true), (6L, 9L, true), (7L, 12L, false)))
  }

  test("x56 face: prefix-scan token budget matches the window form on real docs") {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, sf("sf0.001"), "documents")
    val base = d.select($"doc_id", $"source",
      size(graft.operators.TextAnalysis.wsTokens($"text")).cast("long").as("n_tokens"))
    val win = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = base
      .withColumn("cum_tokens", sum($"n_tokens").over(win))
      .withColumn("kept", $"cum_tokens" - $"n_tokens" < Sampling.TokenBudgetPerSource)
      .orderBy($"doc_id")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    val got = Sampling.tokenBudgetQuery(spark, sf("sf0.001"))
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got == expected)
  }

  test("x66: length buckets are exact binary magnitudes at power-of-two boundaries") {
    val out = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 127L, 128L).toDF("n")
      .select(Sampling.lengthBucket($"n")).as[Int].collect().toSeq
    assert(out == Seq(1, 1, 2, 2, 3, 3, 4, 7, 8))
    // and the histogram aggregates per (source, bucket) with exact extremes
    val d = Seq((1L, "s", "a"), (2L, "s", "a b"), (3L, "s", "a b c"),
      (4L, "t", "a b c d")).toDF("doc_id", "source", "text")
    val h = Sampling.lengthHistogram(d).orderBy($"source", $"bucket")
      .as[(String, Int, Long, Long, Long, Long)].collect().toSeq
    assert(h == Seq(("s", 1, 1L, 1L, 1L, 1L), ("s", 2, 2L, 5L, 2L, 3L),
      ("t", 3, 1L, 4L, 4L, 4L)))
  }

  test("x68: temperature mix keeps the smallest source whole at sqrt-scaled rates") {
    // counts 4 : 16 → rates sqrt(4/4) = 1.0 and sqrt(4/16) = 0.5
    val d = ((0L until 4L).map(i => (i, "small")) ++
      (100L until 116L).map(i => (i, "big"))).toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(d, $"doc_id", "temp")
      .select($"doc_id").as[Long].collect().toSet
    // rate 1.0 keeps every small doc unconditionally
    assert((0L until 4L).forall(kept), s"small source not fully kept: $kept")
    // independent recompute of the decisions: pure-JVM md5 arithmetic
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:temp".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val expected = ((0L until 4L) ++
      (100L until 116L).filter(i => bucket(i) < 0.5 * Sampling.BucketSpace)).toSet
    assert(kept == expected, s"diff: ${kept.diff(expected)} / ${expected.diff(kept)}")
  }

  test("x69: straddling pairs are counted per normalized split pair") {
    // derive each id's actual split, then hand-aggregate the expectation
    val ids = (0L until 400L)
    val splits = ids.map(Tuple1(_)).toDF("id")
      .select($"id", Sampling.assignSplit($"id", "graft", Sampling.splitFractions).as("s"))
      .as[(Long, String)].collect().toMap
    // pair consecutive ids — some straddle, some do not
    val pairRows = ids.sliding(2, 2).map(w => (w(0), w(1))).toSeq
    val expected = pairRows
      .map { case (a, b) => (splits(a), splits(b)) }
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sorted
    assert(expected.nonEmpty, "vacuous: no consecutive-id pair straddles a split")
    val got = Sampling.splitLeakage(pairRows.toDF("d1", "d2"),
        "graft", Sampling.splitFractions)
      .orderBy($"split_a", $"split_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == expected)
  }
}
