package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.SensorPipeline
import graft.streaming.SensorStream

/** Streaming/batch equivalence — the faithful replacement for the
  * reference's manual cqlsh verification (SURVEY.md §5.2 item 4): the
  * same records replayed through the streaming pipeline must produce the
  * byte-identical table the batch pipeline produces.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ndjsonLines: Seq[String] =
    scala.io.Source.fromFile(Fixtures.sensorNdjson).getLines().toSeq

  test("streaming upsert over MemoryStream equals batch pipeline (Q20)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val store = java.nio.file.Files.createTempDirectory("upsert").toString + "/store"
    val dim = SensorPipeline.loadDim(spark, Fixtures.sensorDim)
    val transformed = SensorStream.transform(stream.toDF(), dim)
    val q = transformed.writeStream
      .outputMode("append")
      .foreachBatch(SensorStream.upsertBatch(spark, store) _)
      .start()
    // replay the fixture in 3 micro-batches (out-of-order arrival within
    // each batch, ordered delivery across batches — Kafka-like)
    val lines = ndjsonLines
    val third = (lines.length + 2) / 3
    lines.grouped(third).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()

    // the store persists `seq` as its version column — drop it for the
    // comparison against the batch pipeline's public output
    val streamed = spark.read.parquet(store).drop("seq")
      .orderBy("sensor_group", "sensor_id", "time_received")
    val batch = SensorPipeline.run(spark, Fixtures.sensorNdjson, Fixtures.sensorDim)
    assert(streamed.columns.sorted.sameElements(batch.columns.sorted))
    val a = streamed.select(batch.columns.map(col): _*).collect().toSeq
    val b = batch.collect().toSeq
    assert(a == b)
  }

  test("re-running a batch converges (idempotent upsert)") {
    val store = java.nio.file.Files.createTempDirectory("upsert2").toString + "/store"
    val dim = SensorPipeline.loadDim(spark, Fixtures.sensorDim)
    val lines = spark.read.text(Fixtures.sensorNdjson)
    val batch = SensorStream.transform(lines, dim)
    SensorStream.upsertBatch(spark, store)(batch, 0L)
    val first = spark.read.parquet(store).collect().toSet
    SensorStream.upsertBatch(spark, store)(batch, 0L) // replay same batch
    val second = spark.read.parquet(store).collect().toSet
    assert(first == second)
  }

  test("Q19 streaming form over replayed events equals the batch form") {
    // SURVEY §2.C: "the streaming form of Q19 replayed through the ingest
    // pipeline must equal the batch form" — literally, on the events table.
    implicit val sqlCtx = spark.sqlContext
    case class Ev(event_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
    val evs = graft.core.Tables.load(spark, sf("sf0.001"), "events")
      .select($"event_id", $"ts", $"event_type", $"value")
      .as[(Long, java.sql.Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = stream.toDF().toDF("event_id", "ts", "event_type", "value")
    val agg = df.groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(graft.core.Determinism.Dec)).cast("double").as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type", $"n", $"sum_value")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("q19_stream").start()
    evs.grouped(300).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("q19_stream")
      .orderBy($"window_start", $"event_type").collect().toSeq
    val batch = SparkEntry.queries("q19_tumbling_window")(spark, sf("sf0.001"))
      .collect().toSeq
    assert(streamed == batch)
  }

  test("checkpointed file source survives restart without loss or dupes") {
    // exactly-once claim (SURVEY §4.3): checkpointed offsets + idempotent
    // upsert. Run over files, stop, add a file, restart with the SAME
    // checkpoint — the store must equal the batch pipeline over all files.
    val base = java.nio.file.Files.createTempDirectory("ckpt").toString
    val inDir = s"$base/in"; val store = s"$base/store"; val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()
    val lines = ndjsonLines
    val (part1, part2) = lines.splitAt(lines.length / 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/a.ndjson"),
      part1.mkString("\n").getBytes)

    val dim = SensorPipeline.loadDim(spark, Fixtures.sensorDim)
    def startQuery() = SensorStream
      .transform(graft.sources.SensorSources.fromNdjsonDir(spark, inDir), dim)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch(SensorStream.upsertBatch(spark, store) _)
      .start()

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val afterFirst = spark.read.parquet(store).count()
    assert(afterFirst > 0)

    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/b.ndjson"),
      part2.mkString("\n").getBytes)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val streamed = spark.read.parquet(store)
      .orderBy("sensor_group", "sensor_id", "time_received")
    val batch = SensorPipeline.run(spark, Fixtures.sensorNdjson, Fixtures.sensorDim)
    assert(streamed.count() == batch.count(), "restart lost or duplicated rows")
    assert(streamed.select(batch.columns.map(col): _*).collect().toSeq ==
      batch.collect().toSeq)
  }

  // -- partition-pruned upsert: hand-crafted storage-shaped batches --------
  private val storageCols = Seq("sensor_group", "time_received", "sensor_id",
    "uptime", "temperature", "pressure", "humidity", "ix", "iy", "iz", "mask", "seq")
  private def rec(group: String, id: Int, ts: String, seqNo: Long, temp: Int = 20) =
    (group, java.sql.Timestamp.valueOf(ts), id, 100, temp, 1000, 50, 1, 2, 3, 0, seqNo)

  /** Per-file snapshot of a partition dir: name → (length, mtime, content hash). */
  private def snapshot(dir: String): Map[String, (Long, Long, Int)] = {
    val d = new java.io.File(dir)
    assert(d.exists(), s"expected partition dir $dir")
    d.listFiles().filter(_.isFile).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      f.getName -> ((f.length(), f.lastModified(), java.util.Arrays.hashCode(bytes)))
    }.toMap
  }

  test("upsert rewrites only the group partitions present in the batch") {
    val store = java.nio.file.Files.createTempDirectory("pruned").toString + "/store"
    val up = SensorStream.upsertBatch(spark, store) _
    up(Seq(
      rec("alpha", 1, "2024-01-01 00:00:00", 1),
      rec("beta", 2, "2024-01-01 00:00:00", 1)).toDF(storageCols: _*), 0L)
    val betaBefore = snapshot(s"$store/sensor_group=beta")

    // second batch touches only alpha — beta's files must be untouched
    // (same names, sizes, mtimes, bytes: never rewritten, not just equal)
    up(Seq(rec("alpha", 1, "2024-01-01 00:01:00", 2)).toDF(storageCols: _*), 1L)
    assert(snapshot(s"$store/sensor_group=beta") == betaBefore,
      "untouched partition was rewritten")
    val alpha = spark.read.parquet(store).filter(col("sensor_group") === "alpha")
    assert(alpha.count() == 2)
  }

  test("numeric-looking group names keep their directory across merges") {
    // partition type inference would retype "01" → int 1 on the store
    // read-back and re-publish it under sensor_group=1, stranding the old
    // sensor_group=01 dir with duplicate PK rows. The explicit-schema read
    // keeps the group a STRING end-to-end.
    val store = java.nio.file.Files.createTempDirectory("numgrp").toString + "/store"
    val up = SensorStream.upsertBatch(spark, store) _
    up(Seq(rec("01", 1, "2024-01-01 00:00:00", 1)).toDF(storageCols: _*), 0L)
    up(Seq(rec("01", 1, "2024-01-01 00:00:00", 2, temp = 30)).toDF(storageCols: _*), 1L)
    val dirs = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("sensor_group=")).map(_.getName).toSeq
    assert(dirs == Seq("sensor_group=01"), s"partition dirs diverged: $dirs")
    val rows = spark.read.schema(
        Seq(rec("01", 1, "2024-01-01 00:00:00", 1)).toDF(storageCols: _*).schema)
      .parquet(store).select("sensor_group", "temperature", "seq").collect()
    assert(rows.length == 1, s"duplicate PK rows in store: ${rows.toSeq}")
    assert(rows(0).getString(0) == "01" && rows(0).getInt(1) == 30)
  }

  test("upsert fails fast on null sensor_group and sweeps orphan staging dirs") {
    val store = java.nio.file.Files.createTempDirectory("nullgrp").toString + "/store"
    val up = SensorStream.upsertBatch(spark, store) _
    val withNull = Seq(rec("alpha", 1, "2024-01-01 00:00:00", 1))
      .toDF(storageCols: _*)
      .withColumn("sensor_group", org.apache.spark.sql.functions.lit(null).cast("string"))
    val e = intercept[IllegalArgumentException](up(withNull, 0L))
    assert(e.getMessage.contains("null sensor_group"))
    // an orphan staging dir from a crashed run under a DIFFERENT batch id
    // (e.g. after a checkpoint reset) must be swept by the next upsert
    val orphan = new java.io.File(store + "._staging_7777")
    orphan.mkdirs()
    up(Seq(rec("alpha", 1, "2024-01-01 00:00:00", 1)).toDF(storageCols: _*), 0L)
    assert(!orphan.exists(), "orphan staging dir survived recovery")
    assert(spark.read.parquet(store).count() == 1)
  }

  test("cross-batch out-of-seq delivery converges to the max-seq row") {
    // multi-partition-Kafka shape: a PK's later-seq record can land in an
    // EARLIER micro-batch; the store must still keep the max-seq payload.
    val store = java.nio.file.Files.createTempDirectory("ooo").toString + "/store"
    val up = SensorStream.upsertBatch(spark, store) _
    up(Seq(rec("alpha", 1, "2024-01-01 00:00:00", 5, temp = 50)).toDF(storageCols: _*), 0L)
    up(Seq(rec("alpha", 1, "2024-01-01 00:00:00", 3, temp = 99)).toDF(storageCols: _*), 1L)
    val row = spark.read.parquet(store).select("temperature", "seq").collect()
    assert(row.length == 1)
    assert(row(0).getInt(0) == 50, "stale lower-seq record overwrote the store")
    assert(row(0).getLong(1) == 5L, "store version column must carry the max seq")
  }

  test("compaction bin-packs fragmented partitions and preserves content") {
    val store = java.nio.file.Files.createTempDirectory("compact").toString + "/store"
    // fragmentation comes from the append-based batch-ingest path (the
    // upsert swap rewrites whole partitions, so it never fragments):
    // 10 appends leave >= 10 files in alpha and in the numeric-named "01"
    // group (both pack-to-one, exercising the batched single-job path and
    // dir-name preservation); beta written once stays whole
    (0 until 10).foreach { i =>
      Seq(rec("alpha", i, s"2024-01-01 00:0$i:00", i + 1),
        rec("01", i, s"2024-01-01 00:0$i:00", i + 1)).toDF(storageCols: _*)
        .write.mode("append").partitionBy("sensor_group").parquet(store)
    }
    Seq(rec("beta", 1, "2024-01-01 00:00:00", 1)).toDF(storageCols: _*)
      .write.mode("append").partitionBy("sensor_group").parquet(store)
    def files(p: String): Seq[String] =
      new java.io.File(s"$store/$p").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSeq
    val betaBefore = snapshot(s"$store/sensor_group=beta")
    val before = spark.read.parquet(store).collect().map(_.toString).sorted.toSeq

    val rewritten = SensorStream.compactStore(spark, store, maxFiles = 2)
    assert(rewritten.sorted == Seq("sensor_group=01", "sensor_group=alpha"),
      s"rewrote: $rewritten")
    assert(files("sensor_group=alpha").size == 1,
      s"alpha not packed: ${files("sensor_group=alpha")}")
    assert(files("sensor_group=01").size == 1,
      "numeric-named group not packed under its original dir name")
    assert(snapshot(s"$store/sensor_group=beta") == betaBefore,
      "single-file partition was rewritten")
    val after = spark.read.parquet(store).collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction changed store content")
    // idempotent: nothing left to do
    assert(SensorStream.compactStore(spark, store, maxFiles = 2).isEmpty)
    // the next upsert still merges correctly on the compacted store
    SensorStream.upsertBatch(spark, store)(
      Seq(rec("alpha", 0, "2024-01-01 00:00:00", 99, temp = 77)).toDF(storageCols: _*), 11L)
    val r = spark.read.parquet(store)
      .filter(col("sensor_group") === "alpha" && col("sensor_id") === 0)
      .select("temperature").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(77))
  }

  test("compaction packs an over-target partition into multiple files") {
    val store = java.nio.file.Files.createTempDirectory("compactN").toString + "/store"
    (0 until 12).foreach { i =>
      Seq(rec("gamma", i, s"2024-01-01 00:0${i % 10}:0${i / 10}", i + 1))
        .toDF(storageCols: _*)
        .write.mode("append").partitionBy("sensor_group").parquet(store)
    }
    val dir = new java.io.File(s"$store/sensor_group=gamma")
    def parquets = dir.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val bytes = parquets.map(_.length).sum
    val before = spark.read.parquet(store).collect().map(_.toString).sorted.toSeq
    // target half the bytes -> packed = 2 output files via the coalesce arm
    val target = bytes / 2 + 1
    val rewritten = SensorStream.compactStore(spark, store, targetBytes = target,
      maxFiles = 3)
    assert(rewritten == Seq("sensor_group=gamma"))
    assert(parquets.length == 2, s"expected 2 packed files, got ${parquets.length}")
    assert(spark.read.parquet(store).collect().map(_.toString).sorted.toSeq == before)
    // repacking shrinks the bytes (12 tiny files carried footer overhead),
    // so the packing floor can legitimately drop further — the contract is
    // convergence: a bounded number of passes reaches a terminal layout
    var passes = 0
    while (SensorStream.compactStore(spark, store, targetBytes = target,
      maxFiles = 3).nonEmpty) {
      passes += 1
      assert(passes <= 2, "compaction did not converge")
    }
    assert(spark.read.parquet(store).collect().map(_.toString).sorted.toSeq == before)
  }

  test("dynamic topic routing: per-topic dirs equal batch partitionBy across restart") {
    // R9/R10's one untested-at-runtime reference behavior (topic :=
    // sensor_group, mqtt_kafka_producer.py:117): route the stream into a
    // directory per topic, kill the query between files, restart on the
    // same checkpoint, and demand the final layout equal a batch
    // partitionBy of the same records — no loss, no dup, per topic.
    import graft.streaming.TopicRouter
    val base = java.nio.file.Files.createTempDirectory("route").toString
    val inDir = s"$base/in"; val outDir = s"$base/topics"; val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()
    val lines = ndjsonLines
    val (part1, part2) = lines.splitAt(lines.length / 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/a.ndjson"),
      part1.mkString("\n").getBytes)

    val dim = SensorPipeline.loadDim(spark, Fixtures.sensorDim)
    def startQuery() = SensorStream
      .transform(graft.sources.SensorSources.fromNdjsonDir(spark, inDir), dim)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch(TopicRouter.routeToTopicDirs(outDir, "sensor_group") _)
      .start()

    val q1 = startQuery(); q1.processAllAvailable(); q1.stop() // "kill"
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/b.ndjson"),
      part2.mkString("\n").getBytes)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val batch = SensorStream.transform(
      graft.sources.SensorSources.fromNdjsonBatch(spark, inDir), dim)
    val batchDir = s"$base/batch"
    batch.write.partitionBy("sensor_group").parquet(batchDir)
    def topicDirs(root: String) = graft.core.Fs.listOrEmpty(new java.io.File(root))
      .filter(_.getName.startsWith("sensor_group=")).map(_.getName).toSet
    assert(topicDirs(outDir) == topicDirs(batchDir) && topicDirs(outDir).nonEmpty,
      s"routed layout ${topicDirs(outDir)} != batch layout ${topicDirs(batchDir)}")
    // per-topic row multisets equal (schema pinned: group names must not
    // be re-typed by partition inference)
    val schema = spark.read.parquet(batchDir).schema
    val routed = spark.read.schema(schema).parquet(outDir)
      .collect().map(_.toString).sorted.toSeq
    val direct = spark.read.schema(schema).parquet(batchDir)
      .collect().map(_.toString).sorted.toSeq
    assert(routed == direct, "routed rows diverge from the batch layout")

    // checkpoint-replay idempotence: re-publishing a batch id replaces its
    // files instead of accumulating (and restores a partial publication)
    val replayOut = s"$base/replay"
    TopicRouter.routeToTopicDirs(replayOut, "sensor_group")(batch, 7L)
    val once = spark.read.schema(schema).parquet(replayOut)
      .collect().map(_.toString).sorted.toSeq
    // simulate a crash that lost one topic's published file mid-batch
    val victim = graft.core.Fs.listOrEmpty(new java.io.File(replayOut))
      .filter(_.getName.startsWith("sensor_group=")).head
    graft.core.Fs.listOrThrow(victim).foreach(graft.core.Fs.deleteRecursively)
    TopicRouter.routeToTopicDirs(replayOut, "sensor_group")(batch, 7L)
    val twice = spark.read.schema(schema).parquet(replayOut)
      .collect().map(_.toString).sorted.toSeq
    assert(once == twice, "batch replay did not converge per topic")

    // null topics fail fast instead of un-routing rows
    intercept[IllegalArgumentException] {
      TopicRouter.routeToTopicDirs(s"$base/nulls", "sensor_group")(
        batch.withColumn("sensor_group",
          when($"sensor_id" === batch.select(min($"sensor_id")).head.getInt(0),
            lit(null).cast("string")).otherwise($"sensor_group")), 0L)
    }
  }

  test("equivalent spellings of one store path share one lock") {
    // ADVICE r4: absolute-path keying let "/s/x" and "/s/./x" acquire
    // DIFFERENT locks — two writers could then race the staging sweep.
    val dir = java.nio.file.Files.createTempDirectory("lockkey").toString
    val store = dir + "/store"
    assert(SensorStream.storeLock(store) eq SensorStream.storeLock(dir + "/./store"),
      "dot-segment spelling got a different lock")
    assert(SensorStream.storeLock(store) eq
      SensorStream.storeLock(dir + "/sub/../store"),
      "dot-dot spelling got a different lock")
    // symlinked parent resolves to the same lock as the real path
    val linked = java.nio.file.Paths.get(dir + "/link")
    java.nio.file.Files.createSymbolicLink(linked, java.nio.file.Paths.get(dir))
    assert(SensorStream.storeLock(store) eq SensorStream.storeLock(dir + "/link/store"),
      "symlink spelling got a different lock")
  }

  test("store writers serialize behind the per-store lock") {
    // the recovery preamble sweeps every sibling ._staging_* dir, so a
    // second concurrent writer would have its live staging deleted — the
    // lock serializes writers instead (both are idempotent, so waiting is
    // always correct, and a timer-driven compaction overlapping a trigger
    // must not kill the streaming query with an exception)
    val store = java.nio.file.Files.createTempDirectory("lock").toString + "/store"
    SensorStream.upsertBatch(spark, store)(
      Seq(rec("alpha", 1, "2024-01-01 00:00:00", 1)).toDF(storageCols: _*), 0L)
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      SensorStream.storeLock(store).lock()
      held.countDown()
      release.await()
      SensorStream.storeLock(store).unlock()
    })
    holder.start()
    held.await()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      SensorStream.upsertBatch(spark, store)(
        Seq(rec("alpha", 2, "2024-01-01 00:00:00", 1)).toDF(storageCols: _*), 1L)
      done.set(true)
    })
    writer.start()
    Thread.sleep(500)
    assert(!done.get(), "writer proceeded while another writer held the store lock")
    release.countDown(); holder.join(); writer.join(30000)
    assert(done.get(), "writer did not proceed after the lock was released")
    val rows = spark.read.parquet(store).select("sensor_id").collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(1, 2), "serialized write lost data")
    // compactStore must ALSO wait behind the lock: its recovery preamble
    // sweeps every sibling ._staging_* dir, so running it while another
    // writer is live would delete that writer's staging mid-publish —
    // plant a stand-in staging dir for the "in-flight" writer and assert
    // it survives for as long as the lock is held
    val held2 = new java.util.concurrent.CountDownLatch(1)
    val release2 = new java.util.concurrent.CountDownLatch(1)
    val holder2 = new Thread(() => {
      SensorStream.storeLock(store).lock()
      held2.countDown()
      release2.await()
      SensorStream.storeLock(store).unlock()
    })
    holder2.start()
    held2.await()
    val liveStaging = new java.io.File(store + "._staging_99")
    assert(liveStaging.mkdirs())
    val compacted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactor = new Thread(() => {
      SensorStream.compactStore(spark, store, maxFiles = 1)
      compacted.set(true)
    })
    compactor.start()
    Thread.sleep(500)
    assert(!compacted.get(), "compaction proceeded while another writer held the store lock")
    assert(liveStaging.isDirectory, "compaction swept a live writer's staging while blocked")
    release2.countDown(); holder2.join(); compactor.join(30000)
    assert(compacted.get(), "compaction did not proceed after the lock was released")
    // once the lock is free the planted dir is orphaned staging, and the
    // recovery preamble is REQUIRED to reclaim it
    assert(!liveStaging.exists(), "orphaned staging was not reclaimed after the lock was released")
    // and a follow-up writer with no contention proceeds normally
    assert(SensorStream.compactStore(spark, store).isEmpty)
  }

  test("batched compaction routes schema-diverged partitions through their own read") {
    // the single-job arm pins one payload schema for every partition it
    // covers; a partition whose files evolved past the sampled schema must
    // be rewritten with its OWN schema, not silently nulled to the sample
    val store = java.nio.file.Files.createTempDirectory("evolve").toString + "/store"
    (0 until 3).foreach { i =>
      Seq(rec("alpha", i, s"2024-01-01 00:0$i:00", i + 1)).toDF(storageCols: _*)
        .drop("sensor_group")
        .write.mode("append").parquet(s"$store/sensor_group=alpha")
      Seq(rec("delta", i, s"2024-01-01 00:0$i:00", i + 1)).toDF(storageCols: _*)
        .drop("sensor_group").withColumn("extra", lit(i * 10))
        .write.mode("append").parquet(s"$store/sensor_group=delta")
    }
    def read(p: String) = spark.read.parquet(s"$store/sensor_group=$p")
    val alphaBefore = read("alpha").collect().map(_.toString).sorted.toSeq
    val deltaBefore = read("delta").collect().map(_.toString).sorted.toSeq
    val rewritten = SensorStream.compactStore(spark, store, maxFiles = 1)
    assert(rewritten.sorted == Seq("sensor_group=alpha", "sensor_group=delta"))
    def files(p: String) = new java.io.File(s"$store/sensor_group=$p").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files("alpha").length == 1 && files("delta").length == 1)
    assert(read("alpha").collect().map(_.toString).sorted.toSeq == alphaBefore)
    // the evolved partition keeps its extra column and values intact
    assert(read("delta").columns.contains("extra"))
    assert(read("delta").collect().map(_.toString).sorted.toSeq == deltaBefore)
  }

  test("batched compaction detects schema evolution WITHIN one partition") {
    // an append-ingested partition can hold files of DIFFERENT schemas;
    // sampling only its first file would classify it batchable and the
    // pinned-schema rewrite would permanently drop the later files' new
    // column — the divergence check must inspect every file
    val store = java.nio.file.Files.createTempDirectory("evolveIn").toString + "/store"
    (0 until 3).foreach { i =>
      Seq(rec("alpha", i, s"2024-01-01 00:0$i:00", i + 1)).toDF(storageCols: _*)
        .drop("sensor_group")
        .write.mode("append").parquet(s"$store/sensor_group=alpha")
      val base = Seq(rec("mixed", i, s"2024-01-01 00:0$i:00", i + 1))
        .toDF(storageCols: _*).drop("sensor_group")
      // one file keeps the old schema; the others carry an added column
      (if (i == 0) base else base.withColumn("extra", lit(i * 10)))
        .write.mode("append").parquet(s"$store/sensor_group=mixed")
    }
    def readM(p: String) = spark.read.option("mergeSchema", "true")
      .parquet(s"$store/sensor_group=$p")
    def rowsOf(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
    val keep = Seq("sensor_id", "seq", "temperature")
    val alphaBefore = rowsOf(readM("alpha"), keep: _*)
    val mixedBefore = rowsOf(readM("mixed"), keep :+ "extra": _*)
    val rewritten = SensorStream.compactStore(spark, store, maxFiles = 1)
    assert(rewritten.sorted == Seq("sensor_group=alpha", "sensor_group=mixed"))
    def files(p: String) = new java.io.File(s"$store/sensor_group=$p").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files("alpha").length == 1 && files("mixed").length == 1)
    assert(rowsOf(readM("alpha"), keep: _*) == alphaBefore)
    // the mixed partition keeps the evolved column: values intact, and
    // null (not dropped) for the rows written before the column existed
    assert(readM("mixed").columns.contains("extra"))
    assert(rowsOf(readM("mixed"), keep :+ "extra": _*) == mixedBefore)
  }

  test("pub/sub fan-out delivers each batch to every sink; listener counts rows") {
    implicit val sqlCtx = spark.sqlContext
    val listener = new SensorStream.CountingListener
    spark.streams.addListener(listener)
    val stream = MemoryStream[String]
    val dim = SensorPipeline.loadDim(spark, Fixtures.sensorDim)
    val store = java.nio.file.Files.createTempDirectory("fan").toString + "/store"
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val q = SensorStream.transform(stream.toDF(), dim)
      .writeStream.outputMode("append")
      .queryName("fanout_q")
      .foreachBatch(SensorStream.fanOutBatch(Seq(
        SensorStream.upsertBatch(spark, store) _,
        (b: org.apache.spark.sql.DataFrame, _: Long) => seen.addAndGet(b.count()): Unit)) _)
      .start()
    val lines = ndjsonLines.take(600)
    stream.addData(lines)
    q.processAllAvailable()
    q.stop()
    spark.streams.removeListener(listener)
    // both subscribers observed the batch
    assert(seen.get() == 600)
    assert(spark.read.parquet(store).count() > 0)
    // listener accumulated the input rows for this query
    assert(listener.rowsByQuery.getOrDefault("fanout_q", 0L) == 600L)
    // R22/metrics-export: the accumulated counters round-trip through
    // the durable parquet metrics store...
    import graft.streaming.MetricsExport
    val snap = MetricsExport.snapshot(listener)
    assert(snap.get("fanout_q").contains(600L))
    val mdir = java.nio.file.Files.createTempDirectory("metrics").toString
    MetricsExport.appendSnapshot(spark, snap, s"$mdir/store", epochSec = 1000L)
    MetricsExport.appendSnapshot(spark,
      snap.map { case (k, v) => k -> (v + 50L) }, s"$mdir/store",
      epochSec = 1060L)
    val series = spark.read.parquet(s"$mdir/store")
      .filter(col("name") === "fanout_q")
      .orderBy("epoch_sec")
      .select("epoch_sec", "value")
      .as[(Long, Long)].collect().toSeq
    assert(series == Seq((1000L, 600L), (1060L, 650L)), series)
  }

  test("graphite wire format is spec-locked: sorted lines, sanitized paths, no injection") {
    import graft.streaming.MetricsExport
    val lines = MetricsExport.graphiteLines("graft.sensors",
      Map("fanout_q" -> 600L, "a q.2" -> 7L), epochSec = 1234L)
    // delimiters in a query name cannot smuggle fields or split paths
    assert(lines == Seq(
      "graft.sensors.a_q_2 7 1234",
      "graft.sensors.fanout_q 600 1234"), lines)
    assert(lines.forall(l => l.split(" ").length == 3 && !l.contains("\n")))
    intercept[IllegalArgumentException] { MetricsExport.sanitize("") }
    intercept[IllegalArgumentException] {
      MetricsExport.graphiteLines("p", Map("x" -> 1L), epochSec = -5L)
    }
  }

  test("streaming tumbling window equals batch form (Q19 discipline)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = SensorPipeline.loadDim(spark, Fixtures.sensorDim)
    val batchRecords = SensorStream.transform(spark.read.text(Fixtures.sensorNdjson), dim)
    val expected = SensorStream.tumblingStats(batchRecords, "5 minutes")
      .orderBy("window_start", "sensor_group").collect().toSeq

    val stream = MemoryStream[String]
    val streamStats = SensorStream.tumblingStats(
      SensorStream.transform(stream.toDF(), dim), "5 minutes")
    val q = streamStats.writeStream
      .outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    ndjsonLines.grouped(900).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("tumbling_out")
      .orderBy("window_start", "sensor_group").collect().toSeq
    assert(got == expected)
  }
}
