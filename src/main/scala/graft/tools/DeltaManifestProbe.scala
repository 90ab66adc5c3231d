package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-METADATA cost vs live-file count (verdict r13 #1): before
  * delta manifests, every commit re-rendered the full live set —
  * O(live files) bytes written per commit, per streaming trigger. Now
  * a mutation's manifest lists only its changes. This probe builds
  * one TxnTable at several live-file counts F, runs the SAME
  * single-key upsert against each, and reports the new manifest's
  * byte size (expected: flat in F) next to what a full snapshot of
  * the same version would have rendered (expected: linear in F — the
  * checkpoint sidecar, paid once per CheckpointInterval commits, not
  * per commit). Also re-times read planning to show the recorded-
  * schema zero-job property still holds over delta resolution.
  * Run: `runMain graft.tools.DeltaManifestProbe`. */
object DeltaManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (files <- Seq(16, 64, 256)) {
      val dir = graft.core.TempDirs.scratchShared(s"dmprobe$files")
      graft.core.TxnTable.init(spark, dir,
        (0L until 200000L).map(k => (k, k * 3, s"v$k"))
          .toDF("k", "v", "tag")
          .repartitionByRange(files, col("k"))
          .sortWithinPartitions("k"),
        numFiles = 0, statsCols = Seq("k"))
      graft.core.TxnTable.upsert(spark, dir, "k",
        Seq((7L, -7L, "x")).toDF("k", "v", "tag"), numFiles = 1)
      val v = graft.core.TxnTable.version(dir)
      val deltaBytes = new java.io.File(dir, s"manifest-v$v.json").length()
      // what the pre-delta format would have written for this commit:
      // the full live set (the checkpoint sidecar materializes exactly
      // that, so its size IS the old per-commit cost)
      graft.core.TxnTable.checkpoint(dir, v)
      val snapshotBytes =
        new java.io.File(dir, s"checkpoint-v$v.json").length()
      // read planning over delta resolution: still zero Spark jobs
      graft.core.TxnTable.dropMetaCacheForTest(dir)
      val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      graft.core.TxnTable.read(spark, dir)
        .filter(col("k") < 10).queryExecution.executedPlan
      val planJobs =
        spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0
      println(f"DMPROBE files=$files%4d commitDeltaBytes=$deltaBytes%7d " +
        f"fullSnapshotBytes=$snapshotBytes%8d " +
        f"ratio=${snapshotBytes.toDouble / deltaBytes}%6.1fx planJobs=$planJobs")
    }
    // phase 2 — resolution cost vs VERSION COUNT (the streaming-table
    // regime: one commit per trigger, hundreds of versions): with the
    // auto-checkpoint cadence a cold read resolves O(checkpoint +
    // ≤8-delta tail) regardless of history length; stripping the
    // checkpoint sidecars forces the full chain walk, the cost curve
    // the cadence exists to cut
    for (n <- Seq(32, 128)) {
      val dir = graft.core.TempDirs.scratchShared(s"dmver$n")
      graft.core.TxnTable.init(spark, dir,
        (0L until 1000L).map(k => (k, k)).toDF("k", "v"),
        numFiles = 1, statsCols = Seq("k"))
      (1 to n).foreach { i =>
        graft.core.TxnTable.upsert(spark, dir, "k",
          Seq((i.toLong % 1000L, -i.toLong)).toDF("k", "v"), numFiles = 1)
      }
      def coldResolve(): Double = {
        graft.core.TxnTable.dropMetaCacheForTest(dir)
        val t0 = System.nanoTime()
        graft.core.TxnTable.liveEntries(dir)
        (System.nanoTime() - t0) / 1e9
      }
      coldResolve() // warm the JIT, not the caches
      val withCkpt = (1 to 5).map(_ => coldResolve()).min
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("checkpoint-v")).foreach(_.delete())
      val bare = (1 to 5).map(_ => coldResolve()).min
      println(f"DMPROBE versions=$n%4d coldResolveCkpt=$withCkpt%7.4fs " +
        f"coldResolveChain=$bare%7.4fs ratio=${bare / withCkpt}%5.1fx")
    }
    // phase 3 — METADATA ROUND TRIPS PER READ vs version count (the
    // object-store cost model: a directory LIST is paged — ~1 round
    // trip per 1,000 keys — while an existence probe / header GET is
    // one; local listFiles is µs, so wall time hides this entirely).
    // With the head hint a cold read pays ZERO LISTs and O(hint +
    // tail + checkpoint) GET-class probes, flat in version count;
    // with the hint stripped every head resolution re-LISTs the root
    // — linear round trips in versions/page-size on a real store.
    for (n <- Seq(32, 128, 512)) {
      val dir = graft.core.TempDirs.scratchShared(s"dmrt$n")
      graft.core.TxnTable.init(spark, dir,
        (0L until 1000L).map(k => (k, k)).toDF("k", "v"),
        numFiles = 1, statsCols = Seq("k"))
      (1 to n).foreach { i =>
        graft.core.TxnTable.upsert(spark, dir, "k",
          Seq((i.toLong % 1000L, -i.toLong)).toDF("k", "v"), numFiles = 1)
      }
      def coldReadIo(): (Long, Long) = {
        graft.core.TxnTable.dropMetaCacheForTest(dir)
        graft.core.TxnTable.resetIoCountersForTest()
        graft.core.TxnTable.read(spark, dir)
          .queryExecution.executedPlan
        (graft.core.TxnTable.rootLists.get(),
          graft.core.TxnTable.headProbes.get())
      }
      val (hintLists, hintProbes) = coldReadIo()
      // strip the hint: the pre-r15 shape — every head resolution is
      // a root LIST (paged at real version counts)
      val hint = new java.io.File(dir, "_head.json")
      hint.delete()
      graft.core.TxnTable.dropMetaCacheForTest(dir)
      graft.core.TxnTable.resetIoCountersForTest()
      graft.core.TxnTable.read(spark, dir).queryExecution.executedPlan
      val bareLists = graft.core.TxnTable.rootLists.get()
      println(f"DMPROBE versions=$n%4d readLists(hint)=$hintLists " +
        f"readProbes(hint)=$hintProbes readLists(noHint)=$bareLists " +
        f"(1 LIST = ~${math.max(1, n / 1000)}+ paged trips at $n " +
        "versions, 10+ at 10k)")
    }
    spark.stop()
  }
}
