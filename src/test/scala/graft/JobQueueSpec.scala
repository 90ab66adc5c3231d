package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.SemanticQueries
import graft.serving.JobQueue

/** Async job queue (reference worker/job-service analogue):
  * submit → poll → fetch, with sync guards untouched. */
class JobQueueSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def asyncJson(body: String): String =
    body.replaceFirst("\\{", """{"requestType": "async", """)

  test("submit → poll → fetch returns the same rows as the inline run") {
    val resultDir = java.nio.file.Files.createTempDirectory("jobq")
    val q = new JobQueue(spark, sf, resultDir)
    try {
      val json = asyncJson(SemanticQueries.sem01Json)
      val id = q.submit(json).toOption.get
      val st = q.await(id)
      assert(st.contains(JobQueue.Completed(5)), s"status: $st")
      val fetched = q.fetch(id).get
      val direct = SemanticQueries.run(json)(spark, sf)
      assert(fetched.columns.toSeq == direct.columns.toSeq)
      assert(fetched.orderBy("Order Priority").collect().toSeq ==
        direct.orderBy("Order Priority").collect().toSeq)
    } finally q.shutdown()
  }

  test("worker-side monitor brackets the async RUN with outcome + wall") {
    val mon = new graft.serving.ServiceMonitor.Counting
    val resultDir = java.nio.file.Files.createTempDirectory("jobqmon")
    val q = new JobQueue(spark, sf, resultDir, monitor = mon)
    try {
      val ok = q.submit(asyncJson(SemanticQueries.sem01Json)).toOption.get
      q.await(ok)
      val bad = q.submit(asyncJson(
        """{"cube": "order_stats", "selectFields": [{"field": "No Such"}]}"""))
        .toOption.get
      q.await(bad)
      assert(mon.started("job-run") == 2 && mon.succeeded("job-run") == 1
        && mon.failures("job-run") == 1)
      assert(mon.wallMillis("job-run") >= 0)
    } finally q.shutdown()
  }

  test("sync requests are rejected; bad requests fail with an error") {
    val resultDir = java.nio.file.Files.createTempDirectory("jobq2")
    val q = new JobQueue(spark, sf, resultDir)
    try {
      val sync = q.submit(SemanticQueries.sem01Json)
      assert(sync.isLeft && sync.swap.toOption.get.contains("async"))
      // unknown field → job transitions to Failed, not an exception
      val id = q.submit(asyncJson(
        """{"cube": "order_stats", "selectFields": [{"field": "No Such"}]}"""))
        .toOption.get
      q.await(id) match {
        case Some(JobQueue.Failed(err)) => assert(err.contains("No Such"))
        case other => fail(s"expected Failed, got $other")
      }
      assert(q.fetch(id).isEmpty, "failed jobs have nothing to fetch")
      assert(q.status("no-such-job").isEmpty)
    } finally q.shutdown()
  }

  test("cancel: a queued job never starts; a running job reports Cancelled") {
    // a monitor whose begin() blocks pins job 1 in the RUNNING state
    // (single worker), so job 2 is deterministically QUEUED — no
    // sleeps, no timing races
    val gate = new java.util.concurrent.CountDownLatch(1)
    val began = new java.util.concurrent.CountDownLatch(1)
    val beginCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val mon = new graft.serving.ServiceMonitor {
      def begin(requestId: String, kind: String): Unit = {
        beginCount.incrementAndGet(); began.countDown(); gate.await()
      }
      def complete(requestId: String, kind: String, success: Boolean,
          wallMillis: Long): Unit = ()
    }
    val resultDir = java.nio.file.Files.createTempDirectory("jobqcancel")
    val q = new JobQueue(spark, sf, resultDir, workers = 1, monitor = mon)
    try {
      val json = asyncJson(SemanticQueries.sem01Json)
      val running = q.submit(json).toOption.get
      assert(began.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "worker never began job 1")
      val queued = q.submit(json).toOption.get
      assert(q.status(queued).contains(JobQueue.Queued))
      // cancel the queued job, then cancel the running one, release
      assert(q.cancel(queued), "queued cancel must succeed")
      assert(q.cancel(running), "running cancel must succeed")
      gate.countDown()
      assert(q.await(running).contains(JobQueue.Cancelled))
      assert(q.await(queued).contains(JobQueue.Cancelled))
      // the cancelled-while-queued job must never have started
      q.await(queued); Thread.sleep(100)
      assert(beginCount.get() == 1,
        s"queued job must not begin after cancel: ${beginCount.get()}")
      assert(q.fetch(running).isEmpty && q.fetch(queued).isEmpty)
      // terminal states refuse further cancels
      assert(!q.cancel(running) && !q.cancel(queued))
    } finally { gate.countDown(); q.shutdown() }
  }
}
