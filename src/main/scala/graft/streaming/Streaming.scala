package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.core.Tables

/** Structured Streaming extension over the events table (SURVEY.md
  * §2.9: the reference has no streaming surface — this is the optional
  * Spark-native extension for near-real-time cubes).
  *
  * st01 runs a real streaming query: file source → event-time windowed
  * aggregation → memory sink, driven to completion with
  * Trigger.AvailableNow so the result is deterministic and equals the
  * batch group-by (which is exactly what the DuckDB oracle computes).
  * At scale the same plan runs unbounded with the watermark bounding
  * state; partitioning is the shuffle on (window, event_type).
  *
  * st02 is sessionization in its scale-safe shape: lag + running-sum
  * windows (shuffle-sort all the way — no per-group buffer, so one
  * bot user with millions of events costs only sort spill).
  * `sessionizeTyped` keeps the imperative per-group operator family
  * (mapGroupsWithState-style) bounded via secondary sort + an O(1)
  * streaming iterator; StreamingSpec cross-checks both against a real
  * flatMapGroupsWithState run with event-time timeouts.
  */
object Streaming {

  /** Checkpoint root for the bounded (AvailableNow) runs: tmpfs when
    * available (TempDirs.fastBase) — the offset/commit WAL fsyncs
    * dominate small bounded runs; production unbounded streams would
    * point this at durable storage instead. */
  private def ckptDir(name: String): String =
    graft.core.TempDirs.scratchShared(s"ckpt-$name")

  /** Raw parquet schema of events as the file in `d` decodes (ts is
    * raw INT64 for nanos files, TimestampType for µs files — see
    * Tables.events); readStream requires it declared up front.
    * Footer-only batch read, negligible cost. */
  private def rawSchema(s: SparkSession, d: String): StructType =
    Tables.eventsRawSchema(s, d)

  /** Run `body` with a temporarily reduced shuffle-partition count:
    * each streaming state partition carries fixed per-batch overhead
    * (store init, commit, snapshot), so a bounded run with tiny state
    * wants few partitions; an unbounded production stream would size
    * this to state volume instead. */
  private def withFewPartitions[A](s: SparkSession, n: Int = 4)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** The default bounded event file-stream (ts normalized either
    * encoding). The `From` variants below take an arbitrary source so
    * the split-invariance fuzzer (StreamSplitFuzzSpec) can drive the
    * IDENTICAL transforms with a maxFilesPerTrigger=1 stream over
    * randomly split arrival files. */
  private[graft] def eventsStream(s: SparkSession, d: String): DataFrame =
    Tables.normalizeEventsTs(s.readStream
      .schema(rawSchema(s, d))
      .option("pathGlobFilter", "events.parquet")
      .parquet(d))

  /** Drive `df` to completion into a fresh memory sink. The previous
    * run's temp view is dropped first (a memory sink pins its result
    * on the driver for the view's lifetime; append-mode reruns would
    * otherwise collide on the name). */
  private[graft] def runToMemory(s: SparkSession, df: DataFrame,
      sink: String, mode: String, ckpt: Option[String] = None): DataFrame = {
    s.catalog.dropTempView(sink)
    val q = df.writeStream
      .format("memory")
      .queryName(sink)
      // `ckpt` seam: the skew-regime spec passes an explicit location
      // so it can read the final state stores back (statestore source)
      // and gate per-partition state growth under a hot key
      .option("checkpointLocation", ckpt.getOrElse(ckptDir(sink)))
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  /** Streaming daily windowed aggregation with a watermark, driven to
    * completion (AvailableNow) into a memory sink. */
  def st01(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    st01From(s, eventsStream(s, d), "st01_mem")
  }

  private[graft] def st01From(s: SparkSession, src: DataFrame,
      sink: String): DataFrame = {
    val stream = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec6(col("value"))).cast("double").as("total_value"))
    runToMemory(s, stream, sink, "complete")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("day", "event_type")
  }

  /** Session gap: a new session starts after a ≥30-minute gap in a
    * user's event-time sequence. */
  private val gapUs = 1800L * 1000000L

  /** Sessionization, scale-safe shape: lag + running sum over a
    * per-user event-time window. Both windows are shuffle-sort
    * (Catalyst's WindowExec streams sorted rows) — NO per-group
    * in-memory buffer, so a 100 TB corpus with one bot user holding
    * millions of events still fits: the only memory is the sort
    * spill, which Tungsten handles. Emits one row per session. */
  def st02(s: SparkSession, d: String): DataFrame = {
    val evs = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val brk = when(lag(col("ts_us"), 1).over(w).isNull
        .or(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs), 1L)
      .otherwise(0L)
    evs.withColumn("session_idx",
        sum(brk).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"))
      .orderBy("user_id", "session_idx")
  }

  /** Typed-state sessionization (the mapGroupsWithState-style operator
    * family), BOUNDED: secondary sort — repartition on user_id, sort
    * within partitions by (user_id, ts_us, event_id), then a single
    * streaming mapPartitions pass holding O(1) state (the open session
    * of the current user). No `it.toIndexedSeq`: a hot user with more
    * events than executor memory streams through. Kept alongside st02
    * as the imperative-per-group escape hatch; SessionizeSpec asserts
    * it matches the window formulation row-for-row. */
  def sessionizeTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .as[(Long, Long, Long)]
    evs.mapPartitions { it =>
      new Iterator[(Long, Long, Long, Long, Long)] {
        private var curUid = Long.MinValue
        private var sid = 0L; private var n = 0L
        private var start = 0L; private var last = 0L
        private var pending: Option[(Long, Long, Long, Long, Long)] = None
        private var done = false
        private def closed: Option[(Long, Long, Long, Long, Long)] =
          if (n > 0) Some((curUid, sid, n, start, last)) else None
        private def advance(): Unit = {
          while (pending.isEmpty && !done) {
            if (it.hasNext) {
              val (uid, _, ts) = it.next()
              if (uid != curUid) {
                pending = closed
                curUid = uid; sid = 1L; n = 1L; start = ts; last = ts
              } else if (ts - last > gapUs) {
                pending = closed
                sid += 1; n = 1L; start = ts; last = ts
              } else { n += 1; last = ts }
            } else { pending = closed; n = 0; done = true }
          }
        }
        def hasNext: Boolean = { advance(); pending.isDefined }
        def next(): (Long, Long, Long, Long, Long) = {
          advance(); val r = pending.get; pending = None; r
        }
      }
    }
      .toDF("user_id", "session_idx", "n_events", "start_us", "end_us")
      .orderBy("user_id", "session_idx")
  }

  /** Streaming exact deduplication: dropDuplicates over the key
    * columns is Structured Streaming's stateful dedup operator (state =
    * seen keys, shuffled on the key — the streaming counterpart of
    * dd01's hash-groupBy). Run to completion with AvailableNow;
    * projecting only the key columns makes the result deterministic. */
  def st03(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    st03From(s, s.readStream
      .schema(rawSchema(s, d))
      .option("pathGlobFilter", "events.parquet")
      .parquet(d), "st03_mem")
  }

  private[graft] def st03From(s: SparkSession, src: DataFrame,
      sink: String): DataFrame =
    runToMemory(s, src
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type"), sink, "append")
      .orderBy("user_id", "event_type")

  /** Watermarked stream-stream interval join (click→purchase
    * attribution): each purchase joins the same user's clicks from the
    * preceding 6 hours. Both sides carry a watermark and the join
    * condition bounds event-time distance, so streaming state is
    * evictable — the canonical Structured Streaming interval-join shape
    * (state per side ≈ watermark + interval of events, shuffled on
    * user_id). AvailableNow drives it to completion, making the result
    * equal the batch/oracle join. */
  // 2 state partitions: a stream-stream join keeps FOUR stores per
  // partition (keyToNumValues + keyWithIndexToValue per side), so its
  // per-batch fixed cost is ~4× a windowed agg's — halve the partition
  // count for the bounded run; unbounded production sizes it to state.
  def st04(s: SparkSession, d: String): DataFrame = withFewPartitions(s, n = 2) {
    // INNER join output is emitted in the batch where rows match, not
    // gated on the watermark — the trailing no-data micro-batch exists
    // only to evict state, which a bounded run doesn't need
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = s.conf.get(noDataKey)
    s.conf.set(noDataKey, "false")
    try st04Run(s, d) finally s.conf.set(noDataKey, prevNoData)
  }

  private def st04Run(s: SparkSession, d: String): DataFrame =
    streamJoinRun(s, () => eventsStream(s, d), "inner", "st04_mem")

  private[graft] def streamJoinRun(s: SparkSession, mkSrc: () => DataFrame,
      joinType: String, sink: String,
      ckpt: Option[String] = None): DataFrame = {
    def side(tpe: String, prefix: String): DataFrame =
      mkSrc()
      .filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${prefix}_user"),
        col("event_id").as(s"${prefix}_id"),
        col("ts").as(s"${prefix}_ts"))
      .withWatermark(s"${prefix}_ts", "1 hour")
    val joined = side("click", "c").join(side("purchase", "p"),
      expr("""c_user = p_user AND
             |p_ts >= c_ts AND p_ts <= c_ts + interval 6 hours""".stripMargin),
      joinType)
    runToMemory(s, joined, sink, "append", ckpt)
      .select(col("c_user").as("user_id"), col("c_id").as("click_id"),
        col("p_id").as("purchase_id"),
        unix_micros(col("c_ts")).as("click_us"),
        unix_micros(col("p_ts")).as("purchase_us"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  /** Watermarked stream-stream LEFT OUTER join — the semantics st04's
    * inner join doesn't cover: a click with no purchase inside its
    * 6-hour attribution window must still emit (with nulls), and in a
    * STREAM that emission can only happen once the watermark proves no
    * matching purchase can still arrive — i.e. when the click's state
    * expires. The trailing no-data micro-batch stays ENABLED here (the
    * opposite of st04): it is what advances the final watermark and
    * flushes the null side. Clicks younger than (final watermark − 6 h)
    * are still legitimately "awaiting a match" when the bounded run
    * drains, so they do not emit — the oracle replicates exactly that
    * boundary from the data (min of both sides' max event time − 1 h
    * delay). State size and eviction match st04; the null path adds no
    * extra state. */
  def st07(s: SparkSession, d: String): DataFrame = withFewPartitions(s, n = 2) {
    streamJoinRun(s, () => eventsStream(s, d), "leftOuter", "st07_mem")
  }

  /** Batch count of the last [[st05]] run — exposed so specs can
    * assert the maintenance was actually incremental (>1 merge). */
  @volatile private[graft] var lastSt05Batches: Int = 0

  /** Incremental ROLLUP MAINTENANCE via foreachBatch merge-on-write —
    * the realtime-ingestion analogue of the reference's Druid realtime
    * cubes (new events continuously folded into a day-grain rollup
    * that the semantic layer then serves).
    *
    * Shape: file stream split into several micro-batches
    * (maxFilesPerTrigger=1); each batch partial-aggregates to the
    * rollup grain (map-side combine — raw rows never cross batches),
    * then merges with the current target by re-aggregating
    * target ∪ partial and writing a NEW versioned parquet dir, swap-
    * on-success. Per-batch cost scales with the GRAIN cardinality
    * (bounded by calendar × type), not the corpus; at 100 TB the same
    * loop partitions the target by day so a batch rewrites only
    * touched partitions (dynamic partition overwrite). The decimal
    * sum is re-normalized to DECIMAL(30,6) after every merge so the
    * target schema is stable regardless of how many batches ran.
    * AvailableNow drives it to completion → result equals the batch
    * rollup, which is exactly what the oracle computes. */
  /** The current rollup state under `root`: highest COMPLETE
    * (_SUCCESS-marked) versioned dir, parsed from its
    * `v<version>-b<batchId>` name. Recovered from the FILESYSTEM,
    * never from driver memory — a restarted driver must see exactly
    * what the previous incarnation committed. */
  private[graft] def rollupState(root: String): Option[(String, Int, Long)] = {
    val pat = """v(\d+)-b(\d+)""".r
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f => f.getName match {
        case pat(v, b) => Some((f.getAbsolutePath, v.toInt, b.toLong))
        case _ => None
      })
      .sortBy(_._2).lastOption
  }

  /** One IDEMPOTENT merge step of the incremental rollup. foreachBatch
    * is at-least-once: after a crash between the sink write and the
    * checkpoint commit, the restarted query REDELIVERS the last batch
    * — so exactly-once lives in the sink, not the engine. The applied
    * batch id is encoded in the committed dir name ([[rollupState]]);
    * a redelivered batch (bid ≤ last committed bid) is a no-op, and
    * an interrupted write leaves no _SUCCESS marker so readers and
    * recovery both ignore it. Batch ids are monotone per checkpoint,
    * which is what makes the ≤ comparison sufficient. */
  private[graft] def applyRollupBatch(s: SparkSession, root: String,
      batch: DataFrame, bid: Long): Unit = {
    val cur = rollupState(root)
    if (cur.exists(_._3 >= bid)) return // redelivery after crash: skip
    val partial = batch
      .groupBy(to_date(col("tsm")).as("day"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(Tables.dec6(col("value"))).cast(DecimalType(30, 6)).as("val_sum"))
    val merged = cur match {
      case None => partial
      case Some((dir, _, _)) => s.read.parquet(dir).unionByName(partial)
        .groupBy("day", "event_type")
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("val_sum")).cast(DecimalType(30, 6)).as("val_sum"))
    }
    val next = s"$root/v${cur.fold(1)(_._2 + 1)}-b$bid"
    merged.write.mode("overwrite").parquet(next)
    // _SUCCESS written by the committer = the swap: readers see old or new
  }

  def st05(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    val root = graft.core.TempDirs.scratchShared("st05")
    // split the arrivals into 4 files so AvailableNow sees 4 batches
    // (ts kept in its file encoding; the write preserves it, so the
    // stream read below declares the same raw schema)
    s.read.schema(rawSchema(s, d)).option("pathGlobFilter", "events.parquet")
      .parquet(d).repartition(4)
      .write.mode("overwrite").parquet(s"$root/src")
    val rollup = s"$root/rollup"
    lastSt05Batches = 0
    val q = Tables.normalizeEventsTs(s.readStream.schema(rawSchema(s, d))
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src"))
      .withColumn("tsm", col("ts"))
      .writeStream
      .option("checkpointLocation", ckptDir("st05"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyRollupBatch(s, rollup, batch, bid)
        lastSt05Batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    rollupState(rollup).fold(s.emptyDataFrame) { case (dir, _, _) =>
      s.read.parquet(dir)
        .select(col("day"), col("event_type"), col("n"),
          col("val_sum").cast("double").as("total_value"))
        .orderBy("day", "event_type")
    }
  }

  /** Stream-STATIC enrichment join (the remaining §2.9 join mode after
    * st04's stream-stream interval join): the event stream broadcast-
    * joins a static dimension (event_type → category/weight — the
    * streaming analogue of q26's lookup join), then rolls up weighted
    * engagement per (day, category). The static side is planned as a
    * plain broadcast into every micro-batch — no state store rows for
    * the dim side (unlike stream-stream), which is why enrichment
    * against slowly-changing dims is modeled this way at scale; dim
    * updates arrive by swapping the static table between restarts. */
  def st06(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    st06From(s, eventsStream(s, d), "st06_mem")
  }

  private[graft] def st06From(s: SparkSession, src: DataFrame,
      sink: String): DataFrame = {
    import s.implicits._
    val dim = Seq(
      ("view", "browse", 1L), ("click", "engage", 5L),
      ("purchase", "convert", 25L), ("signup", "convert", 40L),
      ("error", "ops", 0L))
      .toDF("event_type", "category", "weight")
    val stream = src
      .withWatermark("ts", "1 hour")
      .join(broadcast(dim), "event_type")
      .groupBy(window(col("ts"), "1 day"), col("category"))
      .agg(count(lit(1)).as("n"),
        sum(col("weight")).as("engagement"))
    runToMemory(s, stream, sink, "complete")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("category"), col("n"), col("engagement"))
      .orderBy("day", "category")
  }

  /** Exact fixed-point dot of two float vectors, descaled — the pure-
    * Scala twin of [[graft.functions.FixedPointDot]] for state-side
    * comparisons inside stateful operators (same floor(a·b·10¹²)
    * element terms, same exact long sum). */
  private def fixdotDescaled(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(a(i).toDouble * b(i).toDouble * 1e12).toLong
      i += 1
    }
    acc.toDouble / 1e12
  }

  /** st08 — STREAMING SEMANTIC DEDUP: suppress incoming embedding
    * vectors that are near-duplicates (cosine ≥ τ) of an already-
    * ingested vector in the same LSH bucket — the ingest-time
    * counterpart of dd03/dd08 ("dedup new data against what the
    * pipeline already accepted"), which a 100 TB training-data feed
    * runs continuously rather than as a batch sweep.
    *
    * Shape: single-band hyperplane signature ([[graft.functions
    * .HyperplaneBands]], the sim03/sim04 kernel) buckets the stream;
    * `flatMapGroupsWithState` keyed by bucket keeps the vectors seen
    * so far in that bucket and tags each arrival with the smallest
    * earlier vec_id whose cosine clears τ (NULL → kept). Recall is
    * one-sided exactly like dd03's banding: only in-bucket pairs are
    * compared, and every emitted verdict is exact fixed-point
    * arithmetic.
    *
    * Determinism of the bounded run: the corpus is split into four
    * vec_id-range files with ascending modification times, so file-
    * source arrival order equals id order and the greedy "duplicate
    * of an EARLIER id" rule gives one fixed answer — which is the
    * closed form the DuckDB oracle computes (min earlier same-bucket
    * id with cosine ≥ τ), with no sequential recursion needed. */
  def st08(s: SparkSession, d: String): DataFrame =
    st08Core(s, d, sigBits = 8, evictDelaySec = None)

  /** [[st08]]'s core with the two state-bounding deployment knobs
    * explicit — together they bound state at (buckets active within
    * the eviction horizon) × (expected bucket population), never
    * O(corpus):
    *
    *  - `sigBits`: hyperplane signature bits = log₂(bucket fan-out).
    *    Expected bucket population is n/2^sigBits, so a deployment
    *    sizes this to its feed (≈26 bits keeps buckets ~1.5k vectors
    *    at 10¹¹ docs); the shipped query uses 8 → 256 buckets at
    *    sf0.01, same recall semantics as dd03's banding.
    *  - `evictDelaySec`: event-time horizon after which an IDLE
    *    bucket's state is evicted via
    *    `GroupStateTimeout.EventTimeTimeout` — the same watermark-
    *    eviction discipline StreamingSpec pins for st03's
    *    `dropDuplicatesWithinWatermark`. A vector's event time is
    *    vec_id seconds (the bounded run's files arrive in id order,
    *    so event time is monotone exactly like a wall-clock feed's).
    *    `None` sizes the horizon past the corpus span: no mid-run
    *    eviction, which is what the closed-form oracle computes;
    *    StreamingSpec runs a tight horizon and proves an idle
    *    bucket's state is dropped (dup past the horizon re-emits as
    *    kept). */
  private[graft] def st08Core(s: SparkSession, d: String, sigBits: Int,
      evictDelaySec: Option[Long],
      splitBounds: Option[Seq[Long]] = None): DataFrame = withFewPartitions(s) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val tau = 0.3
    val root = new java.io.File(graft.core.TempDirs.scratchShared("st08"))
    val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val mxRow = base.agg(max("vec_id")).head()
    require(!mxRow.isNullAt(0), "st08: embeddings corpus is empty")
    val mx = mxRow.getLong(0)
    val delaySec = evictDelaySec.getOrElse(mx + 60L)
    val delayMs = delaySec * 1000L
    // arrival files = contiguous vec_id ranges in id order; the fuzz
    // spec injects RANDOM cut points (split-invariance: the greedy
    // "dup of an earlier id" verdict must not depend on where the
    // trigger boundaries fall), default 4 equal ranges
    val cut = mx / 4 + 1
    val bounds = splitBounds
      .getOrElse((0 until 4).map(b => b * cut) :+ (mx + 1))
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    for (b <- 0 until bounds.length - 1) {
      val tmp = s"$root/tmp$b"
      base.filter(col("vec_id") >= bounds(b) && col("vec_id") < bounds(b + 1))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"b$b%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(60000L * (b + 1))
    }
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = s.readStream.schema(embSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
      // event time = vec_id seconds, offset one day past the epoch:
      // a row whose event time EQUALS the initial watermark (0) is
      // filtered as late before reaching the stateful operator, so
      // vec_id 0 must not map to the epoch itself
      .withColumn("ts", (col("vec_id") + 86400L).cast("timestamp"))
      .withWatermark("ts", s"$delaySec seconds")
      .withColumn("sig", graft.functions.GraftFunctions.hyperplaneBands(
        col("embedding"), 1, sigBits, 42L).getItem(0))
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions
        .fixdotD(col("embedding"), col("embedding"))))
      .select(col("vec_id"), col("embedding"), col("sig"), col("nrm"), col("ts"))
      .as[(Long, Seq[Float], Int, Double, java.sql.Timestamp)]
    val deduped = rows.groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Seq[Float], Double)],
          (Long, Int, Option[Long], Boolean)](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (sig, it, state) =>
        if (state.hasTimedOut) {
          // idle past the horizon: drop the whole bucket's vectors
          state.remove()
          Iterator.empty
        } else {
          var seen = state.getOption.getOrElse(Nil)
          val batch = it.toSeq.sortBy(_._1)
          val out = batch.map { case (vid, emb, _, nrm, _) =>
            val dupeOf = seen.iterator
              .filter(_._1 < vid)
              .filter { case (_, se, sn) =>
                fixdotDescaled(emb, se) / (nrm * sn) >= tau }
              .map(_._1).minOption
            seen = (vid, emb, nrm) :: seen
            (vid, sig, dupeOf, dupeOf.isEmpty)
          }
          state.update(seen)
          // re-arm: evict once the watermark passes last arrival + horizon
          state.setTimeoutTimestamp(batch.map(_._5.getTime).max + delayMs)
          out.iterator
        }
      }
    // fixed sink name, previous run's view dropped first: a memory
    // sink pins its full result set on the driver for as long as the
    // temp view exists, so per-run unique names would accumulate one
    // result copy per invocation for the session lifetime (a caller's
    // handle from a PREVIOUS run goes stale at that point — callers
    // collect before re-invoking, as Verify/Bench/specs do)
    val qn = "st08_mem"
    s.catalog.dropTempView(qn)
    val q = deduped.toDF("vec_id", "bucket", "dupe_of", "kept")
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", ckptDir("st08"))
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(qn).orderBy("vec_id")
  }

  /** Streaming trending top-K: the watermarked daily (window,
    * event_type) counts stream into the materialized aggregate
    * (identical machinery to st01 — the corpus-sized work); the
    * per-day top-3 rank runs on that TINY aggregate at serve time via
    * the same map-side-combining top-k aggregate the ANN path uses.
    * This split is the production shape for "trending" dashboards:
    * state is the windowed counts (bounded by watermark), never a
    * rank buffer. Ranking is a row_number over the ≤ |event_types|
    * rows per day — trivial at any corpus scale — ordered (n DESC,
    * event_type) so ties break deterministically. */
  def st09(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    st09From(s, eventsStream(s, d), "st09_mem")
  }

  private[graft] def st09From(s: SparkSession, src: DataFrame,
      sink: String): DataFrame = {
    val stream = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val agg = runToMemory(s, stream, sink, "complete")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(desc("n"), col("event_type"))
    agg.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select("day", "rank", "event_type", "n")
      .orderBy("day", "rank")
  }

  /** Streaming ingest with LAYOUT MAINTENANCE — the small-file
    * problem and its production answer in one query. Micro-batches
    * append raw parquet to a staging area (what every streaming sink
    * produces: one file set per trigger — unbounded file count,
    * footer stats scattered across arrival order); a compaction pass
    * then rewrites the accumulated staging data as ONE Z-ordered
    * table ([[graft.core.Layout]], clustered on (user_id, event_id))
    * and the serve read answers a selective per-user query from the
    * compacted copy. The oracle runs the identical predicate on the
    * original events table — ingest path + physical layout must be
    * result-invisible, which is exactly what the row pins. At 100 TB
    * this is the OPTIMIZE/compaction job every streaming lakehouse
    * table schedules: bounded file count, clustered stats, and
    * multi-dimension pruning for the readers (StreamingSpec measures
    * staging vs compacted file counts + off-axis footer pruning). */
  @volatile private[graft] var lastSt10Dirs: Option[(String, String)] = None
  def st10(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    val root = graft.core.TempDirs.scratchShared("st10")
    // 4 arrival files → 4 micro-batches (the st05 discipline)
    s.read.schema(rawSchema(s, d)).option("pathGlobFilter", "events.parquet")
      .parquet(d).repartition(4)
      .write.mode("overwrite").parquet(s"$root/src")
    val staging = s"$root/staging"
    val q = Tables.normalizeEventsTs(s.readStream.schema(rawSchema(s, d))
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src"))
      .writeStream
      .option("checkpointLocation", ckptDir("st10"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the raw streaming sink shape: append-only, per-trigger files
        batch.write.mode("append").parquet(staging)
        ()
      }
      .start()
    q.awaitTermination()
    // compaction: staging → one Z-ordered table (swap-on-success dir;
    // a scheduled job in production, inline after AvailableNow here)
    val compacted = s"$root/compacted"
    graft.core.Layout.writeZOrdered(
      s.read.parquet(staging)
        .select("event_id", "user_id", "event_type", "value"),
      compacted, Seq("user_id", "event_id"), numFiles = 16)
    lastSt10Dirs = Some((staging, compacted))
    s.read.parquet(compacted)
      .filter(col("user_id").between(1, 40))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec6(col("value"))).cast("double").as("total_value"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("user_id")
  }

  /** One micro-batch of the st11 follower: catch the persisted
    * (lastApplied, rollup) pair up to the table's CURRENT latest
    * version via `changes` + `applyCdcDelta` — O(commit delta) work,
    * never a table rescan. Persistence uses the st05 sink discipline
    * (`v<lastAppliedVersion>-b<batchId>` dir, _SUCCESS = the swap):
    * a redelivered batch (bid ≤ last committed) is a no-op, recovery
    * is a directory listing ([[rollupState]]), and a crash between
    * write and checkpoint commit can only replay — never double-apply
    * — a delta. A batch that finds no new version writes nothing. */
  private[graft] def st11ApplyBatch(s: SparkSession, tableDir: String,
      root: String, bid: Long, keys: Seq[String],
      sums: Seq[String]): Unit = {
    val cur = rollupState(root)
    if (cur.exists(_._3 >= bid)) return // redelivery after crash: skip
    val latest = graft.core.TxnTable.version(tableDir)
    val (prior, from) = cur match {
      case Some((dir, applied, _)) => (s.read.parquet(dir), applied)
      case None => // bootstrap: the initial snapshot rollup of v1
        (graft.core.TxnTable.rollupOf(
          graft.core.TxnTable.read(s, tableDir, v = 1), keys, sums), 1)
    }
    if (latest == from && cur.nonEmpty) return // already caught up
    val next =
      if (latest > from)
        graft.core.TxnTable.applyCdcDelta(prior,
          graft.core.TxnTable.changes(s, tableDir, from, latest),
          keys, sums)
      else prior
    next.write.mode("overwrite").parquet(s"$root/v$latest-b$bid")
  }

  /** st11 — STREAMING CDC FOLLOWER: tails a mutating copy-on-write
    * table ([[graft.core.TxnTable]]) continuously. The manifest
    * directory itself is the file stream: every committed mutation
    * lands exactly one new `manifest-v<N>.json`, so the transaction
    * log IS the wake-up signal — no polling interval to tune, no
    * commit ever missed, and the file source's tracked-files offset
    * is the stream cursor (the Delta CDF consumer contract, driven
    * by Structured Streaming instead of q44's batch loop). Each
    * micro-batch folds the net change set since the last applied
    * version into the persisted rollup ([[st11ApplyBatch]] —
    * exactly-once in the sink via the st05 versioned-_SUCCESS
    * discipline; StreamingSpec pins crash recovery and redelivery).
    * At 100 TB the per-trigger cost is O(commit delta) + a merge on
    * the small rollup — the whole point of following CDC instead of
    * rescanning. Oracle: the mutation history replayed relationally
    * over `orders`, aggregated to the final state. */
  def st11(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    import s.implicits._
    import graft.core.TxnTable
    // a four-commit mutation history: init, takedown, correction
    // batch, takedown-of-a-correction (the shapes a real table sees)
    val tableDir = graft.core.TempDirs.scratchShared("st11cdc")
    TxnTable.init(s, tableDir,
      graft.core.Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      numFiles = 0, statsCols = Seq("o_orderkey"))
    TxnTable.deleteKeys(s, tableDir, "o_orderkey",
      Seq(25L, 27L, 29L)) // v2
    TxnTable.upsert(s, tableDir, "o_orderkey",
      Seq((26L, "W", 11.5), (28L, "W", 22.25), (30000000L, "W", 33.75))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice")) // v3
    TxnTable.deleteKeys(s, tableDir, "o_orderkey",
      Seq(26L, 35L)) // v4 — removes an upserted row and a base row
    val root = graft.core.TempDirs.scratchShared("st11")
    val keys = Seq("o_orderstatus")
    val sums = Seq("o_totalprice")
    val q = s.readStream.format("text")
      .option("maxFilesPerTrigger", 1) // one micro-batch per commit
      .load(s"$tableDir/manifest-v*.json")
      .writeStream
      .option("checkpointLocation", ckptDir("st11"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: DataFrame, bid: Long) =>
        // content unused: the manifest file is the wake-up signal;
        // the follower reads its own cursor + the table's log
        st11ApplyBatch(s, tableDir, root, bid, keys, sums)
        ()
      }
      .start()
    q.awaitTermination()
    rollupState(root).fold(s.emptyDataFrame) { case (dir, _, _) =>
      s.read.parquet(dir)
        .select(col("o_orderstatus"), col("n"),
          col("sum_o_totalprice").cast("double").as("total_price"))
        .orderBy("o_orderstatus")
    }
  }

  /** st12 — STREAMING MERGE SINK (the CDC-IN direction; st11 is
    * CDC-out): a stream of correction batches — rows tagged
    * `_op ∈ {upsert, delete}`, the Debezium/CDC-feed shape — applies
    * to a copy-on-write [[graft.core.TxnTable]] via `MERGE` in
    * foreachBatch: each micro-batch lands as ONE committed version
    * (deletes + replacements + inserts atomically; readers never see
    * a half-applied batch), under the table's own OCC retry if a
    * maintenance job commits concurrently. Delivery: foreachBatch is
    * at-least-once; a redelivered batch re-merges the same rows,
    * which CONVERGES — same final state, and the duplicate version's
    * net CDC is EMPTY (the rewrite's removed and added rows are
    * identical multisets, so `changes()` cancels them) — so even a
    * downstream st11 follower sees a no-op. StreamingSpec pins both.
    * Batches here touch disjoint keys (commutative), so the result
    * is independent of file-arrival order. Oracle: the three
    * correction batches replayed relationally over `orders`. */
  def st12(s: SparkSession, d: String): DataFrame = withFewPartitions(s) {
    import s.implicits._
    import graft.core.TxnTable
    val tableDir = graft.core.TempDirs.scratchShared("st12merge")
    TxnTable.init(s, tableDir,
      graft.core.Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      numFiles = 0, statsCols = Seq("o_orderkey"))
    // the correction feed: one parquet file per batch, disjoint keys
    val src = graft.core.TempDirs.scratchShared("st12")
    val batches = Seq(
      Seq((41L, "", 0.0, "delete"), (43L, "", 0.0, "delete"),
        (42L, "S", 11.11, "upsert")),
      Seq((44L, "S", 22.22, "upsert"), (40000001L, "S", 33.33, "upsert")),
      Seq((45L, "", 0.0, "delete"), (40000002L, "S", 44.44, "upsert")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice", "_op")
        .coalesce(1).write.parquet(s"$src/b$i")
    }
    val q = s.readStream
      .schema("o_orderkey LONG, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, _op STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/b*")
      .writeStream
      .option("checkpointLocation", ckptDir("st12"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the whole tagged batch rides the frame carrier — delete
        // keys included: a CDC correction feed is exactly where a
        // 10⁶-delete batch shows up, so nothing here may collect
        if (!batch.isEmpty)
          TxnTable.mergeFrame(s, tableDir, "o_orderkey", batch)
        ()
      }
      .start()
    q.awaitTermination()
    TxnTable.read(s, tableDir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec6(col("o_totalprice"))).cast("double")
          .as("total_price"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st12_stream_merge_sink" -> (st12 _),
    "st11_cdc_follow_stream" -> (st11 _),
    "st10_compacted_ingest" -> (st10 _),
    "st09_trending_topk" -> (st09 _),
    "st06_stream_enrich" -> (st06 _),
    "st01_stream_window" -> (st01 _),
    "st02_sessionize" -> (st02 _),
    "st03_stream_dedup" -> (st03 _),
    "st04_stream_join" -> (st04 _),
    "st05_incremental_rollup" -> (st05 _),
    "st07_stream_outer_join" -> (st07 _),
    "st08_semantic_dedup" -> (st08 _),
  )

  val oracle: Map[String, String] = Map(
    // st12's oracle replays the three streamed correction batches
    // (disjoint keys — commutative) over the base table
    "st12_stream_merge_sink" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (41, 43, 45)
        |    AND o_orderkey NOT IN (42, 44)),
        |up AS (SELECT * FROM (VALUES
        |  (CAST(42 AS BIGINT), 'S', 11.11),
        |  (CAST(44 AS BIGINT), 'S', 22.22),
        |  (CAST(40000001 AS BIGINT), 'S', 33.33),
        |  (CAST(40000002 AS BIGINT), 'S', 44.44))
        |  t(o_orderkey, o_orderstatus, o_totalprice)),
        |final AS (SELECT * FROM base UNION ALL SELECT * FROM up)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin,
    // st11's oracle replays the four-commit mutation history
    // relationally and aggregates the FINAL state — the streaming
    // follower's delta-maintained rollup must land exactly there
    "st11_cdc_follow_stream" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (25, 27, 29)
        |    AND o_orderkey NOT IN (26, 28)),
        |up AS (SELECT * FROM (VALUES
        |  (CAST(26 AS BIGINT), 'W', 11.5),
        |  (CAST(28 AS BIGINT), 'W', 22.25),
        |  (CAST(30000000 AS BIGINT), 'W', 33.75))
        |  t(o_orderkey, o_orderstatus, o_totalprice)),
        |merged AS (SELECT * FROM base UNION ALL SELECT * FROM up),
        |final AS (SELECT * FROM merged WHERE o_orderkey NOT IN (26, 35))
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin,
    // st10 reads a compacted Z-ordered copy built from streamed
    // micro-batches; the oracle reads the original table — the ingest
    // path and the layout must be result-invisible
    "st10_compacted_ingest" ->
      """SELECT user_id, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        | COUNT(DISTINCT event_type) AS n_types
        |FROM events WHERE user_id BETWEEN 1 AND 40
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "st09_trending_topk" ->
      """WITH daily AS (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT day, rank, event_type, n FROM (
        |  SELECT day, event_type, n,
        |    row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rank
        |  FROM daily) t
        |WHERE rank <= 3 ORDER BY day, rank""".stripMargin,
    // closed form of the greedy in-bucket streaming dedup: a vector's
    // dupe_of is the MIN earlier same-bucket vec_id with cosine ≥ τ
    // (arrival order equals id order by construction of the bounded
    // run, so greedy == closed form); signatures via the shared
    // single-band hyperplane replica, cosines in exact fixed point
    "st08_semantic_dedup" -> {
      s"""WITH ${graft.operators.Similarity.hyperSigCtes(1, 8, 42L)},
         |sv AS (SELECT v.vec_id, v.embedding, v.nrm, s.band_sig sig
         |  FROM v JOIN sigs s USING (vec_id)),
         |dup AS (SELECT a.vec_id, CAST(MIN(b.vec_id) AS BIGINT) dupe_of
         |  FROM sv a JOIN sv b ON a.sig = b.sig AND b.vec_id < a.vec_id
         |  WHERE (CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
         |    z -> CAST(floor(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)
         |    / (a.nrm * b.nrm) >= 0.3
         |  GROUP BY a.vec_id)
         |SELECT sv.vec_id, CAST(sv.sig AS INTEGER) AS bucket, d.dupe_of,
         |  (d.dupe_of IS NULL) AS kept
         |FROM sv LEFT JOIN dup d USING (vec_id) ORDER BY sv.vec_id""".stripMargin
    },
    "st06_stream_enrich" ->
      """WITH dim(event_type, category, weight) AS (VALUES
        |  ('view', 'browse', 1), ('click', 'engage', 5),
        |  ('purchase', 'convert', 25), ('signup', 'convert', 40),
        |  ('error', 'ops', 0))
        |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, category,
        |  COUNT(*) AS n, CAST(SUM(weight) AS BIGINT) AS engagement
        |FROM events JOIN dim USING (event_type)
        |GROUP BY 1, 2 ORDER BY day, category""".stripMargin,
    "st01_stream_window" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "st03_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    // ground truth for the incrementally-maintained rollup: the full
    // batch recompute (n batches of merge-on-write must equal it)
    "st05_incremental_rollup" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    // the left-outer run: matches emit as in st04; unmatched clicks
    // emit (null purchase) only once the final watermark passes their
    // window end. The watermark is replicated at Spark's precision:
    // per-side max event time floored to MILLISECONDS minus the 1 h
    // delay, min across the two sides, strict '<' eviction.
    "st07_stream_outer_join" ->
      """WITH c AS (SELECT user_id, event_id, epoch_us(ts) us FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, epoch_us(ts) us FROM events
        |      WHERE event_type = 'purchase'),
        |wm AS (SELECT (least((SELECT max(us) // 1000 FROM c),
        |                     (SELECT max(us) // 1000 FROM p))
        |               - 3600000) * 1000 AS w),
        |j AS (SELECT c.user_id, c.event_id AS click_id,
        |        p.event_id AS purchase_id, c.us AS click_us, p.us AS purchase_us
        |      FROM c JOIN p ON c.user_id = p.user_id
        |        AND p.us >= c.us AND p.us <= c.us + 21600000000)
        |SELECT user_id, click_id, purchase_id, click_us, purchase_us FROM j
        |UNION ALL
        |SELECT c.user_id, c.event_id, NULL, c.us, NULL FROM c
        |WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
        |        AND p.us >= c.us AND p.us <= c.us + 21600000000)
        |  AND c.us + 21600000000 < (SELECT w FROM wm)
        |ORDER BY user_id, click_id, purchase_id""".stripMargin,
    "st04_stream_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        | p.event_id AS purchase_id,
        | epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 21600000000
        |ORDER BY user_id, click_id, purchase_id""".stripMargin,
    // Both windows order by (ts_us, event_id) — the SAME µs precision
    // Spark sorts on. Ordering window w by raw ns-precision `ts` shifts
    // session boundaries for events that tie at µs but not ns.
    "st02_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |o AS (
        | SELECT user_id, event_id, ts_us,
        |  CASE WHEN lag(ts_us) OVER w IS NULL
        |       OR ts_us - lag(ts_us) OVER w > 1800000000
        |   THEN 1 ELSE 0 END AS brk
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        | SELECT user_id, ts_us,
        |  -- CAST: DuckDB types SUM(int) OVER as HUGEINT; Spark emits
        |  -- BIGINT and the driver's hasher is type-sensitive.
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        | FROM o)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        | MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
  )
}
