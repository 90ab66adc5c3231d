package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming semantics beyond the oracle-checked st*
  * queries: native session windows (the stateful merge operator) in a
  * streaming aggregation must agree with the same session_window
  * aggregation run in batch on identical data.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sessionization emits correct sessions") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val rawSchema = graft.core.Tables.eventsRawSchema(spark, sf)
    val gapUs = 1800L * 1000000L
    // (user, sessionStartUs, sessionEndUs, n); event-time logic runs at
    // µs precision (matching batch st02), state timeouts at ms
    def sessionize(uid: Long, rows: Iterator[(Long, Long)],
        state: GroupState[(Long, Long, Long)]): Iterator[(Long, Long, Long, Long)] = {
      if (rows.isEmpty && state.hasTimedOut) {
        val (st, last, n) = state.get
        state.remove()
        return Iterator.single((uid, st, last, n))
      }
      val sorted = rows.toIndexedSeq.sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var (st, last, n) = state.getOption.getOrElse((-1L, -1L, 0L))
      sorted.foreach { case (us, _) =>
        if (last >= 0 && us - last > gapUs) { out += ((uid, st, last, n)); n = 0; st = us }
        if (last < 0) st = us
        n += 1; last = us
      }
      state.update((st, last, n))
      state.setTimeoutTimestamp((last + gapUs) / 1000 + 1)
      out.iterator
    }
    val q = graft.core.Tables.normalizeEventsTs(
        spark.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(sf))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         st: GroupState[(Long, Long, Long)]) =>
          sessionize(uid, it.map { r =>
            val us = r._2.getTime * 1000 + (r._2.getNanos / 1000) % 1000
            (us, r._3)
          }, st))
      .toDF("user_id", "start_us", "end_us", "n")
      .writeStream.format("memory").queryName("fmgs_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("fmgs_mem").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.streaming.Streaming.st02(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)))
      .toSet
    assert(streamed.nonEmpty, "no sessions emitted")
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch reference: ${(streamed -- batch).take(3)}")
    // all but the per-user trailing sessions must have been emitted
    val maxUs = graft.core.Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val mustEmit = batch.filter { case (_, _, end, _) =>
      end + gapUs < maxUs - 60L * 1000000L }
    assert(mustEmit.subsetOf(streamed),
      s"sessions past watermark not emitted: ${(mustEmit -- streamed).take(3)}")
  }

  test("sessionize: bounded typed secondary-sort variant equals window form") {
    // st02 is two shuffle-sort window passes (lag + running sum) — no
    // per-group in-memory buffer, so a hot user larger than executor
    // memory only costs sort spill. The typed variant streams a
    // secondary-sorted iterator with O(1) state; both must agree.
    val win = graft.streaming.Streaming.st02(spark, sf).collect().toSeq
    val typed = graft.streaming.Streaming.sessionizeTyped(spark, sf).collect().toSeq
    assert(win.nonEmpty && win == typed)
    // plan shape: WindowExec, and NO FlatMapGroups / per-group collect
    val plan = graft.streaming.Streaming.st02(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(500))
    assert(!plan.contains("FlatMapGroups"), "st02 must not buffer groups")
  }

  test("streaming session_window aggregation equals batch") {
    val rawSchema = graft.core.Tables.eventsRawSchema(spark, sf)
    val q = graft.core.Tables.normalizeEventsTs(
        spark.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(sf))
      .withWatermark("ts", "1 second")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ss_mem")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ss_mem")
      .select(col("user_id"), col("session_window.start").as("st"), col("n"))
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("st"), col("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0
      && batch.exceptAll(streamed).count() == 0)
  }

  test("dropDuplicatesWithinWatermark: bounded state — far-apart dup re-emits") {
    // the watermark-bounded dedup (the unbounded-corpus shape next to
    // st03's exact global dedup): a duplicate inside the delay is
    // suppressed; one arriving after the watermark passed the first
    // copy's expiry re-emits, proving state was EVICTED, not kept
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-wmdedup")
    sys.addShutdownHook(graft.core.TempDirs.rmTree(dir.toFile))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType)))
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("k", "s").select(col("k"), col("s").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/src/$name")
    }
    // a persistent checkpoint + one AvailableNow run per file makes the
    // batch boundaries deterministic (a fresh glob run may coalesce or
    // reorder same-mtime files, which would watermark-drop the probe row)
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .parquet(s"$dir/src/*")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("k")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: key 1 twice within 10 min (dup suppressed), key 2 once
    write("b1", Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:05:00"),
      (2L, "2024-01-01 10:00:00")))
    run()
    val first = spark.read.parquet(s"$dir/out").collect()
    assert(first.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      s"within-delay dup not suppressed: ${first.toSeq}")
    // batch 2 advances the watermark far past key 1's expiry (10:00 +
    // 30 min); its own key-1 row is still suppressed (eviction applies
    // at batch END). Batch 3's key-1 row then sees evicted state and
    // MUST re-emit.
    write("b2", Seq((1L, "2024-01-01 16:00:00")))
    run()
    write("b3", Seq((1L, "2024-01-01 17:00:00")))
    run()
    val rows = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).sorted.toSeq
    assert(rows.count(_._1 == 1L) == 2 && rows.exists(_._2.startsWith("2024-01-01 17")),
      s"far-apart duplicate did not re-emit — state never evicted ($rows)")
  }

  test("st08 streaming semantic dedup: state catches cross-batch dups") {
    // the corpus streams as 4 vec_id-quartile files (one micro-batch
    // each); a duplicate whose earlier partner arrived in a PREVIOUS
    // file can only be caught through flatMapGroupsWithState state
    // carried across batches — assert at least one such verdict, plus
    // the invariants the oracle also enforces
    val out = graft.streaming.Streaming.st08(spark, sf).collect()
    val n = out.length
    assert(n > 0)
    val maxId = out.map(_.getLong(0)).max
    val cut = maxId / 4 + 1
    val dropped = out.filter(!_.getBoolean(3))
    assert(dropped.nonEmpty, "fixture should contain in-bucket near-dups")
    dropped.foreach { r =>
      assert(r.getLong(2) < r.getLong(0), "dupe_of must be an earlier id")
    }
    val crossBatch = dropped.count(r =>
      r.getLong(2) / cut < r.getLong(0) / cut)
    assert(crossBatch > 0,
      s"no cross-batch dup caught (state not exercised): $n rows, ${dropped.length} dropped")
  }

  test("st08 idle-bucket state is evicted once the watermark passes the horizon") {
    // Three vectors, event time = vec_id seconds. A (id 10000) and C
    // (id 100000) are identical (cos = 1), same LSH bucket;
    // B (id 50000) is A's negation — its hyperplane signature is the
    // bitwise complement, guaranteeing a DIFFERENT bucket — and only
    // exists to advance the watermark between A and C. With a 100 s
    // eviction horizon, A's bucket times out (watermark 49 900 s ≫
    // timeout 100 s) before C arrives, so C must re-emit as kept —
    // state was dropped, exactly st03's far-apart-dup discipline. The
    // unbounded-horizon control run (what the oracle computes) still
    // catches C as a dup of A.
    import spark.implicits._
    val dir = graft.core.TempDirs.scratch("st08spec")
    Seq((10000L, Seq(1f, 0f, 0f, 0f)),
        (50000L, Seq(-1f, 0f, 0f, 0f)),
        (100000L, Seq(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def run(horizon: Option[Long]): Map[Long, Option[Long]] =
      graft.streaming.Streaming.st08Core(spark, dir, sigBits = 8,
        evictDelaySec = horizon).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val unbounded = run(None)
    assert(unbounded(100000L).contains(10000L),
      s"control: far-apart dup should be caught without eviction ($unbounded)")
    val bounded = run(Some(100L))
    assert(bounded(10000L).isEmpty && bounded(50000L).isEmpty)
    assert(bounded(100000L).isEmpty,
      s"idle bucket state not evicted — dup past the horizon was still caught ($bounded)")
  }

  test("st05 incremental rollup: multiple merge batches, equals batch rollup") {
    import graft.streaming.Streaming
    val out = Streaming.st05(spark, sf)
    val got = out.collect()
    // the maintenance loop must actually have been incremental — the
    // source split guarantees 4 files → 4 merge-on-write batches
    assert(Streaming.lastSt05Batches >= 2,
      s"expected >1 micro-batch, got ${Streaming.lastSt05Batches}")
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.core.Tables.dec6(col("value"))).cast("double").as("total_value"))
      .orderBy("day", "event_type")
      .collect()
    assert(got.length == batch.length && got.sameElements(batch),
      "incrementally-maintained rollup diverged from full recompute")
  }

  test("st05 merge is idempotent under batch redelivery (exactly-once sink)") {
    import graft.streaming.Streaming
    // foreachBatch is at-least-once: a crash between sink write and
    // checkpoint commit REDELIVERS the last batch on restart. The sink
    // must make the re-application a no-op — batch id recovered from
    // the committed dir name, never driver memory.
    val root = java.nio.file.Files.createTempDirectory("graft-redeliver")
      .toString
    sys.addShutdownHook(graft.core.TempDirs.rmTree(new java.io.File(root)))
    val batch = graft.core.Tables.events(spark, sf)
      .withColumn("tsm", col("ts")).limit(100)
    Streaming.applyRollupBatch(spark, root, batch, bid = 0L)
    val afterFirst = spark.read
      .parquet(Streaming.rollupState(root).get._1)
      .agg(sum(col("n"))).first().getLong(0)
    // redelivery of the SAME batch id: must not double-count
    Streaming.applyRollupBatch(spark, root, batch, bid = 0L)
    val st = Streaming.rollupState(root).get
    assert(st._2 == 1, s"redelivery must not commit a new version: $st")
    val afterRedeliver = spark.read.parquet(st._1)
      .agg(sum(col("n"))).first().getLong(0)
    assert(afterRedeliver == afterFirst,
      s"redelivered batch was double-counted: $afterFirst -> $afterRedeliver")
    // the NEXT batch id still applies normally
    Streaming.applyRollupBatch(spark, root, batch, bid = 1L)
    val st2 = Streaming.rollupState(root).get
    assert(st2._2 == 2 && st2._3 == 1L, s"next batch failed to apply: $st2")
    val afterNext = spark.read.parquet(st2._1)
      .agg(sum(col("n"))).first().getLong(0)
    assert(afterNext == 2 * afterFirst,
      s"second distinct batch should double the count: $afterNext")
  }

  test("st10: compaction bounds the file count and restores off-axis pruning") {
    import graft.streaming.Streaming
    Streaming.st10(spark, sf).collect()
    val (staging, compacted) = Streaming.lastSt10Dirs
      .getOrElse(fail("st10 did not record its dirs"))
    def parquetFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet"))
    // the small-file problem: one file set per micro-batch (4 batches
    // here) — staging accumulates at least one file per batch, with
    // arrival-order stats; compaction rewrites to a bounded count
    assert(parquetFiles(staging).size >= 4,
      s"expected >= 4 appended staging files, saw ${parquetFiles(staging).size}")
    assert(parquetFiles(compacted).size <= 16,
      s"compaction must bound the file count, saw ${parquetFiles(compacted).size}")
    // clustered stats: a selective box on the SECOND clustered column
    // (event_id) must prune compacted files, while the append-order
    // staging files all span the id range (every batch sees all ids)
    val n = parquetFiles(compacted).size
    val hi = spark.read.parquet(compacted)
      .agg(max(col("event_id"))).first().getLong(0)
    val zN = graft.core.Layout.filesIntersecting(spark, compacted,
      "event_id", 0, hi / 20)
    val sN = graft.core.Layout.filesIntersecting(spark, staging,
      "event_id", 0, hi / 20)
    assert(sN == parquetFiles(staging).size,
      s"staging should not prune (arrival order): $sN")
    assert(zN * 2 <= n,
      s"compacted layout should prune the off-axis box: $zN of $n files")
  }

  test("st12 redelivered merge batch converges: same state, EMPTY net CDC") {
    import spark.implicits._
    import graft.core.TxnTable
    val dir = graft.core.TempDirs.scratchShared("st12redeliver")
    TxnTable.init(spark, dir,
      (0L until 1000L).map(k => (k, s"g${k % 3}", k.toDouble))
        .toDF("k", "g", "v")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
        .sortWithinPartitions("k"),
      numFiles = 0, statsCols = Seq("k"))
    val batch = Seq((10L, "gX", -1.0), (2000L, "gX", -2.0))
      .toDF("k", "g", "v")
    TxnTable.merge(spark, dir, "k", batch, deletes = Seq(20L)) // applied
    val v1 = TxnTable.version(dir)
    val state1 = TxnTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // the at-least-once sink redelivers the SAME batch after a crash
    TxnTable.merge(spark, dir, "k", batch, deletes = Seq(20L)) // replay
    assert(TxnTable.version(dir) == v1 + 1,
      "the replay commits (at-least-once), but...")
    val state2 = TxnTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(state2 == state1, "...the state must converge (idempotent)")
    // and the duplicate version's NET change set is empty — a
    // downstream CDC follower (st11) sees a no-op, not churn
    assert(TxnTable.changes(spark, dir, v1, v1 + 1).count() == 0,
      "identical removed/added rows must cancel in the CDC read")
  }

  test("st11 follower recovers from the persisted (lastApplied, rollup) pair") {
    import spark.implicits._
    import graft.core.TxnTable
    import graft.streaming.Streaming
    val tableDir = graft.core.TempDirs.scratchShared("st11rec")
    val root = java.nio.file.Files.createTempDirectory("st11rec-state")
      .toString
    TxnTable.init(spark, tableDir,
      (0L until 1000L).map(k => (k, s"g${k % 4}", k.toDouble))
        .toDF("k", "g", "v")
        .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
        .sortWithinPartitions("k"),
      numFiles = 0, statsCols = Seq("k"))
    TxnTable.deleteKeys(spark, tableDir, "k", Seq(10L, 20L, 30L)) // v2
    val keys = Seq("g"); val sums = Seq("v")
    def stateRows(): Set[(String, Long, java.math.BigDecimal)] = {
      val (dir, _, _) = Streaming.rollupState(root).get
      spark.read.parquet(dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    }
    def recompute(): Set[(String, Long, java.math.BigDecimal)] =
      TxnTable.rollupOf(TxnTable.read(spark, tableDir), keys, sums)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    // batch 0: bootstrap (v1 snapshot) + catch-up to v2, persisted
    Streaming.st11ApplyBatch(spark, tableDir, root, 0L, keys, sums)
    assert(Streaming.rollupState(root).exists(s => s._2 == 2 && s._3 == 0))
    assert(stateRows() == recompute())
    // REDELIVERY of batch 0 (crash between sink write and checkpoint
    // commit): must be a no-op — same committed state dir
    val dirBefore = Streaming.rollupState(root).get._1
    Streaming.st11ApplyBatch(spark, tableDir, root, 0L, keys, sums)
    assert(Streaming.rollupState(root).get._1 == dirBefore,
      "a redelivered batch must not re-apply its delta")
    // the table mutates on; a RESTARTED follower (fresh call, no
    // driver memory — only the persisted pair) catches up exactly
    TxnTable.upsert(spark, tableDir, "k",
      Seq((5L, "g9", 500.0), (2000L, "g9", 999.0)).toDF("k", "g", "v")) // v3
    TxnTable.deleteKeys(spark, tableDir, "k", Seq(2000L, 40L)) // v4
    Streaming.st11ApplyBatch(spark, tableDir, root, 1L, keys, sums)
    assert(Streaming.rollupState(root).exists(s => s._2 == 4 && s._3 == 1))
    assert(stateRows() == recompute(),
      "recovered follower must land exactly on the full recompute")
    // a batch with nothing new writes nothing (no state churn)
    val v = Streaming.rollupState(root).get
    Streaming.st11ApplyBatch(spark, tableDir, root, 2L, keys, sums)
    assert(Streaming.rollupState(root).get == v,
      "an already-caught-up batch must not rewrite state")
  }
}
