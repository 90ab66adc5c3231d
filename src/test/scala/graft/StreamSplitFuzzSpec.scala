package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Streaming

/** STREAMING SPLIT-INVARIANCE FUZZING — the generalization of the CDC
  * batching-invariance idea to the watermark operators: a seeded
  * random event stream with late/jittered event times is replayed
  * under RANDOM CONTIGUOUS TRIGGER SPLITS (each arrival file = one
  * micro-batch via maxFilesPerTrigger=1) through the IDENTICAL
  * production transforms (the `From` seams in [[Streaming]]), and
  * every replay must converge to an independently computed plain-Scala
  * batch dual. Watermark eviction boundaries, session merges across
  * batch fragments, and outer-join null emission are exactly the
  * semantics only fixed splits pinned before this spec.
  *
  * Two lateness regimes:
  *  - JITTERED: arrival order perturbed by ±20 min (max lateness 40
  *    min < the 1 h watermark delay) — nothing may ever be dropped,
  *    so EVERY split shape must equal the plain batch dual exactly.
  *  - HOSTILE (complete-mode aggs only): hours-late stragglers —
  *    complete mode keeps all state, so even these must equal batch.
  */
class StreamSplitFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // ---- generator ---------------------------------------------------

  private case class Ev(eventId: Long, tsUs: Long, userId: Long,
    eventType: String, value: Double)

  private val baseUs = 1704067200L * 1000000L // 2024-01-01 UTC

  /** ~320 events over ~3 days for 8 users; value has 2 decimals. */
  private def genEvents(seed: Int): Vector[Ev] = {
    val r = new scala.util.Random(seed * 9176 + 3)
    val types = Vector("view", "view", "view", "view", "click", "click",
      "purchase", "signup", "error")
    (0 until 320).map { i =>
      Ev(i.toLong,
        baseUs + i * 13L * 60 * 1000000L + r.nextInt(600) * 1000000L +
          r.nextInt(1000000),
        r.nextInt(8).toLong,
        types(r.nextInt(types.length)),
        (r.nextInt(10000) + 1) / 100.0)
    }.toVector
  }

  /** Arrival order = event time + bounded jitter (±`jitterUs`), so
    * max lateness vs the running max is 2×jitter. */
  private def arrivalOrder(evs: Vector[Ev], seed: Int,
      jitterUs: Long): Vector[Ev] = {
    val r = new scala.util.Random(seed * 31 + 7)
    evs.map(e => (e, e.tsUs + (r.nextLong(2 * jitterUs + 1) - jitterUs)))
      .sortBy(_._2).map(_._1)
  }

  /** Random contiguous split of the arrival sequence into 2-6 files. */
  private def splitPoints(n: Int, seed: Int, shape: Int): Vector[Int] = {
    val r = new scala.util.Random(seed * 1237 + shape * 101)
    val k = 2 + r.nextInt(5)
    (Vector(0, n) ++ Vector.fill(k - 1)(1 + r.nextInt(n - 1)))
      .distinct.sorted
  }

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Write the arrival sequence as one parquet file per split with
    * ascending mtimes; returns the source dir. */
  private def writeSplits(arrivals: Vector[Ev], cuts: Vector[Int])
      : String = {
    val dir = graft.core.TempDirs.scratchShared("stfuzz")
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      val rows = arrivals.slice(a, b).map(e =>
        Row(e.eventId, new java.sql.Timestamp(e.tsUs / 1000) {
          setNanos(((e.tsUs % 1000000) * 1000).toInt)
        }, e.userId, e.eventType, e.value, "{}"))
      val tmp = s"$dir/tmp$i"
      spark.createDataFrame(
        new java.util.ArrayList[Row](rows.length) {
          rows.foreach(add) }, evSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"e$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(60000L * (i + 1))
    }
    dir
  }

  private def srcStream(dir: String): DataFrame =
    graft.core.Tables.normalizeEventsTs(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir))

  // ---- plain-Scala batch duals ------------------------------------

  private def dayOf(tsUs: Long): String =
    java.time.Instant.ofEpochSecond(tsUs / 1000000)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  private def dualSt01(evs: Vector[Ev]): Seq[(String, String, Long, Double)] =
    evs.groupBy(e => (dayOf(e.tsUs), e.eventType)).toSeq
      .sortBy(_._1).map { case ((day, tpe), xs) =>
        val sum = xs.map(e => BigDecimal(e.value).setScale(6)).sum
        (day, tpe, xs.size.toLong, sum.toDouble)
      }

  private def dualSt03(evs: Vector[Ev]): Set[(Long, String)] =
    evs.map(e => (e.userId, e.eventType)).toSet

  private def joinPairs(evs: Vector[Ev])
      : Seq[(Long, Long, Long, Long, Long)] =
    (for {
      c <- evs if c.eventType == "click"
      p <- evs if p.eventType == "purchase"
      if p.userId == c.userId
      if p.tsUs >= c.tsUs && p.tsUs <= c.tsUs + 6L * 3600 * 1000000L
    } yield (c.userId, c.eventId, p.eventId, c.tsUs, p.tsUs))
      .sortBy(x => (x._1, x._2, x._3))

  // ---- the battery -------------------------------------------------

  private def collectT[T](df: DataFrame)(f: Row => T): Seq[T] =
    df.collect().toSeq.map(f)

  test("split-invariance: st01/st06/st09 complete-mode aggregations " +
      "equal the batch dual under every random trigger split, jittered " +
      "AND hours-late regimes") {
    for (seed <- Seq(1, 2); shape <- 1 to 5) {
      val evs = genEvents(seed)
      // hostile lateness for complete mode: ±4 h displacement
      val jitter = if (shape % 2 == 0) 4L * 3600 * 1000000L
        else 20L * 60 * 1000000L
      val arr = arrivalOrder(evs, seed + shape, jitter)
      val dir = writeSplits(arr, splitPoints(arr.length, seed, shape))
      val tag = s"s${seed}p$shape"

      val g01 = collectT(Streaming.st01From(spark, srcStream(dir),
        s"fz01_$tag"))(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      assert(g01 == dualSt01(evs),
        s"[st01 $tag] ${g01.take(3)} vs ${dualSt01(evs).take(3)}")

      val g06 = collectT(Streaming.st06From(spark, srcStream(dir),
        s"fz06_$tag"))(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      val wts = Map("view" -> ("browse", 1L), "click" -> ("engage", 5L),
        "purchase" -> ("convert", 25L), "signup" -> ("convert", 40L),
        "error" -> ("ops", 0L))
      val d06 = evs.map(e => (dayOf(e.tsUs), wts(e.eventType)._1,
          wts(e.eventType)._2))
        .groupBy(x => (x._1, x._2)).toSeq.sortBy(_._1)
        .map { case ((day, cat), xs) =>
          (day, cat, xs.size.toLong, xs.map(_._3).sum) }
      assert(g06 == d06, s"[st06 $tag] ${g06.take(3)} vs ${d06.take(3)}")

      val g09 = collectT(Streaming.st09From(spark, srcStream(dir),
        s"fz09_$tag"))(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
      val d09 = evs.groupBy(e => (dayOf(e.tsUs), e.eventType)).toSeq
        .map { case ((day, tpe), xs) => (day, tpe, xs.size.toLong) }
        .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (day, xs) =>
          xs.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex
            .map { case ((_, tpe, n), i) => (day, i + 1L, tpe, n) }
        }
      assert(g09 == d09, s"[st09 $tag] ${g09.take(3)} vs ${d09.take(3)}")
    }
  }

  test("split-invariance: st03 streaming dedup emits exactly the " +
      "distinct set under every random split") {
    for (seed <- Seq(1, 2); shape <- 1 to 5) {
      val evs = genEvents(seed)
      val arr = arrivalOrder(evs, seed + shape, 20L * 60 * 1000000L)
      val dir = writeSplits(arr, splitPoints(arr.length, seed, shape))
      val got = collectT(Streaming.st03From(spark,
        spark.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", 1).parquet(dir),
        s"fz03_s${seed}p$shape"))(r => (r.getLong(0), r.getString(1)))
      assert(got.toSet == dualSt03(evs) && got.size == dualSt03(evs).size,
        s"[st03 s${seed}p$shape] ${got.size} vs ${dualSt03(evs).size}")
    }
  }

  test("split-invariance: st04 inner interval join finds every " +
      "attribution pair under every random split (jitter < watermark " +
      "delay: zero state-eviction loss allowed)") {
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    for (seed <- Seq(1, 2); shape <- 1 to 5) {
      val evs = genEvents(seed)
      val arr = arrivalOrder(evs, seed + shape, 20L * 60 * 1000000L)
      val dir = writeSplits(arr, splitPoints(arr.length, seed, shape))
      val prev = spark.conf.get(noDataKey)
      spark.conf.set(noDataKey, "false")
      val got = try collectT(Streaming.streamJoinRun(spark,
          () => srcStream(dir), "inner", s"fz04_s${seed}p$shape"))(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      finally spark.conf.set(noDataKey, prev)
      assert(got == joinPairs(evs),
        s"[st04 s${seed}p$shape] ${got.size} vs ${joinPairs(evs).size}")
    }
  }

  test("split-invariance: st07 left-outer join emits every pair PLUS " +
      "null rows for exactly the unmatched clicks older than the " +
      "final watermark's 6 h horizon, under every random split") {
    for (seed <- Seq(1, 2); shape <- 1 to 5) {
      val evs = genEvents(seed)
      val arr = arrivalOrder(evs, seed + shape, 20L * 60 * 1000000L)
      val dir = writeSplits(arr, splitPoints(arr.length, seed, shape))
      val got = collectT(Streaming.streamJoinRun(spark,
          () => srcStream(dir), "leftOuter", s"fz07_s${seed}p$shape")) {
        r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))
      }
      val pairs = joinPairs(evs).map(x => (x._1, x._2, x._3))
      // final watermark = min(max click ts, max purchase ts) - 1 h;
      // an unmatched click emits null once its 6 h window is closed
      val maxC = evs.filter(_.eventType == "click").map(_.tsUs).max
      val maxP = evs.filter(_.eventType == "purchase").map(_.tsUs).max
      val wm = math.min(maxC, maxP) - 3600L * 1000000L
      val matched = pairs.map(_._2).toSet
      val nulls = evs.filter(e => e.eventType == "click" &&
          !matched(e.eventId) && e.tsUs + 6L * 3600 * 1000000L < wm)
        .map(e => (e.userId, e.eventId, -1L))
      val want = (pairs ++ nulls).sortBy(x => (x._1, x._2, x._3))
      assert(got.sortBy(x => (x._1, x._2, x._3)) == want,
        s"[st07 s${seed}p$shape] got ${got.size} vs want ${want.size}")
    }
  }

  test("split-invariance: st05 incremental rollup maintenance " +
      "converges to the batch rollup under every random batch split") {
    for (seed <- Seq(1, 2); shape <- 1 to 5) {
      val evs = genEvents(seed)
      val arr = arrivalOrder(evs, seed + shape, 20L * 60 * 1000000L)
      val cuts = splitPoints(arr.length, seed, shape)
      val root = graft.core.TempDirs.scratchShared("st05fz")
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        val batch = spark.createDataFrame(
          new java.util.ArrayList[Row](b - a) {
            arr.slice(a, b).foreach(e => add(Row(e.eventId,
              new java.sql.Timestamp(e.tsUs / 1000), e.userId,
              e.eventType, e.value, "{}"))) }, evSchema)
          .withColumn("tsm", col("ts"))
        Streaming.applyRollupBatch(spark, root, batch, i.toLong)
      }
      val got = Streaming.rollupState(root) match {
        case Some((dir, _, _)) => collectT(spark.read.parquet(dir)
          .select(col("day").cast("string"), col("event_type"), col("n"),
            col("val_sum").cast("double"))
          .orderBy("day", "event_type"))(r =>
          (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        case None => Nil
      }
      // micro-second truncation: applyRollupBatch days from ms ts
      val want = dualSt01(evs)
      assert(got == want, s"[st05 s${seed}p$shape] ${got.take(3)} vs " +
        s"${want.take(3)}")
    }
  }

  test("split-invariance: fmgws sessionization merges session " +
      "fragments across arbitrary trigger boundaries — streamed " +
      "sessions ⊆ batch and every watermark-closed session emits") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    def sessionize(uid: Long, rows: Iterator[(Long, Long)],
        state: GroupState[(Long, Long, Long)])
        : Iterator[(Long, Long, Long, Long)] = {
      if (rows.isEmpty && state.hasTimedOut) {
        val (st, last, n) = state.get
        state.remove()
        return Iterator.single((uid, st, last, n))
      }
      val sorted = rows.toIndexedSeq.sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var (st, last, n) = state.getOption.getOrElse((-1L, -1L, 0L))
      sorted.foreach { case (us, _) =>
        if (last >= 0 && us - last > gapUs) {
          out += ((uid, st, last, n)); n = 0; st = us }
        if (last < 0) st = us
        n += 1; last = us
      }
      state.update((st, last, n))
      state.setTimeoutTimestamp((last + gapUs) / 1000 + 1)
      out.iterator
    }
    for (seed <- Seq(1, 2); shape <- 1 to 5) {
      val evs = genEvents(seed)
      val arr = arrivalOrder(evs, seed + shape, 20L * 60 * 1000000L)
      val dir = writeSplits(arr, splitPoints(arr.length, seed, shape))
      val sink = s"fzsess_s${seed}p$shape"
      spark.catalog.dropTempView(sink)
      val q = srcStream(dir)
        .withWatermark("ts", "40 minutes") // > the 2×20 min max lateness
        .select(col("user_id"), col("ts"), col("event_id"))
        .as[(Long, java.sql.Timestamp, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
            GroupStateTimeout.EventTimeTimeout)(
          (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
           st: GroupState[(Long, Long, Long)]) =>
            sessionize(uid, it.map { r =>
              val us = r._2.getTime * 1000 + (r._2.getNanos / 1000) % 1000
              (us, r._3)
            }, st))
        .toDF("user_id", "start_us", "end_us", "n")
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation",
          graft.core.TempDirs.scratchShared("ckpt-fzsess"))
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // plain-Scala batch sessions
      val batch = evs.groupBy(_.userId).toSeq.flatMap { case (uid, xs) =>
        val ts = xs.map(_.tsUs).sorted
        val sessions = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        var st = ts.head; var last = ts.head; var n = 1L
        ts.tail.foreach { us =>
          if (us - last > gapUs) {
            sessions += ((uid, st, last, n)); st = us; n = 0 }
          n += 1; last = us
        }
        sessions += ((uid, st, last, n))
        sessions
      }.toSet
      assert(streamed.subsetOf(batch),
        s"[sess s${seed}p$shape] phantom sessions: " +
          s"${(streamed -- batch).take(3)}")
      val maxUs = evs.map(_.tsUs).max
      val wmUs = maxUs - 40L * 60 * 1000000L
      val mustEmit = batch.filter { case (_, _, end, _) =>
        end + gapUs < wmUs - 60L * 1000000L }
      assert(mustEmit.subsetOf(streamed),
        s"[sess s${seed}p$shape] unclosed sessions: " +
          s"${(mustEmit -- streamed).take(3)}")
    }
  }

  test("split-invariance: st08 streaming semantic dedup verdicts are " +
      "identical under random vec_id split boundaries") {
    val sf = "/root/testdata/sf0.001"
    // reference run: the default 4-way equal split
    val base = Streaming.st08Core(spark, sf, sigBits = 8,
      evictDelaySec = None).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSeq
    assert(base.nonEmpty)
    val mx = base.map(_._1).max
    for (seed <- Seq(1, 2); shape <- 1 to 5) {
      val r = new scala.util.Random(seed * 773 + shape)
      val k = 2 + r.nextInt(5)
      val bounds = (Vector(0L, mx + 1) ++
        Vector.fill(k - 1)(1L + r.nextLong(mx))).distinct.sorted
      val got = Streaming.st08Core(spark, sf, sigBits = 8,
        evictDelaySec = None, splitBounds = Some(bounds)).collect()
        .map(r2 => (r2.getLong(0), r2.getInt(1),
          if (r2.isNullAt(2)) -1L else r2.getLong(2), r2.getBoolean(3)))
        .toSeq
      assert(got == base,
        s"[st08 s${seed}p$shape bounds=$bounds] verdicts differ: " +
          s"${got.diff(base).take(3)} vs ${base.diff(got).take(3)}")
    }
  }
}
