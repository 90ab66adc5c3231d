package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.operators.SemanticQueries
import graft.serving.{HttpFrontDoor, JobQueue, RequestLog}

/** HTTP front door e2e (reference api-jersey MahaResource analogue):
  * real server, real client, JSON request in → envelope out; async
  * jobs submit/poll; request-id plumbing into the request log. */
class HttpFrontDoorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String,
      headers: Map[String, String] = Map.empty): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /report round-trips a request; request id reaches the log") {
    val mem = new RequestLog.InMemoryWriter
    val prev = SemanticQueries.requestLogWriter
    SemanticQueries.requestLogWriter = mem
    val jobs = new JobQueue(spark, sf, java.nio.file.Files.createTempDirectory("httpjobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs)
    val port = door.start()
    try {
      val r = post(port, "/report", SemanticQueries.sem01Json,
        Map("X-Request-Id" -> "http-req-7"))
      assert(r.statusCode() == 200, r.body())
      assert(r.headers().firstValue("X-Request-Id").get() == "http-req-7")
      assert(r.body().contains("\"fields\":[{\"fieldName\":\"Order Priority\"")
        && r.body().contains("\"rowCount\":5"), r.body().take(300))
      // plan-time envelope (model detail) + completion-time envelope
      assert(mem.records.exists(x => x.requestId == "http-req-7" && x.status == 200))
      assert(mem.records.exists(x => x.requestId == "http-req-7-served"
        && x.requestEndTime >= x.requestStartTime))
      // a broken request surfaces 400 with the error, and logs it
      val bad = post(port, "/report",
        """{"cube": "order_stats", "selectFields": [{"field": "No Such"}]}""")
      assert(bad.statusCode() == 400 && bad.body().contains("No Such"))
      assert(mem.records.exists(_.status == 400))
    } finally {
      door.stop(); jobs.shutdown()
      SemanticQueries.requestLogWriter = prev
    }
  }

  test("POST /sql serves SQL and DESCRIBE through the same envelope") {
    val jobs = new JobQueue(spark, sf, java.nio.file.Files.createTempDirectory("httpsql"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs)
    val port = door.start()
    try {
      val r = post(port, "/sql",
        "SELECT `Order Priority`, `Order Count` FROM order_stats " +
          "ORDER BY `Order Priority`",
        Map("X-Request-Id" -> "sql-req-1"))
      assert(r.statusCode() == 200, r.body())
      assert(r.headers().firstValue("X-Request-Id").get() == "sql-req-1")
      assert(r.body().contains("\"fieldName\":\"Order Priority\"")
        && r.body().contains("\"rowCount\":5"), r.body().take(300))
      val desc = post(port, "/sql", "DESCRIBE order_stats")
      assert(desc.statusCode() == 200, desc.body())
      assert(desc.body().contains("Order Priority")
        && desc.body().contains("\"rows\":["), desc.body().take(300))
      val bad = post(port, "/sql", "SELECT nope FROM nowhere")
      assert(bad.statusCode() == 400 && bad.body().contains("error"), bad.body())
    } finally { door.stop(); jobs.shutdown() }
  }

  test("service monitor sees begin/complete per request, outcome and wall") {
    val mon = new graft.serving.ServiceMonitor.Counting
    val jobs = new JobQueue(spark, sf, java.nio.file.Files.createTempDirectory("httpmon"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      monitor = mon)
    val port = door.start()
    try {
      assert(post(port, "/report", SemanticQueries.sem01Json).statusCode() == 200)
      val bad = post(port, "/report",
        """{"cube": "order_stats", "selectFields": [{"field": "No Such"}]}""")
      assert(bad.statusCode() == 400)
      assert(post(port, "/sql", "DESCRIBE order_stats").statusCode() == 200)
      assert(mon.started("report") == 2 && mon.succeeded("report") == 1
        && mon.failures("report") == 1, "report counts")
      assert(mon.started("sql") == 1 && mon.succeeded("sql") == 1)
      assert(mon.wallMillis("report") >= 0 && mon.succeeded("job") == 0)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("a throwing monitor never fails the request it observes") {
    val boom = new graft.serving.ServiceMonitor {
      def begin(id: String, kind: String): Unit = sys.error("monitor down")
      def complete(id: String, kind: String, ok: Boolean, ms: Long): Unit =
        sys.error("monitor down")
    }
    val jobs = new JobQueue(spark, sf, java.nio.file.Files.createTempDirectory("httpmon2"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      monitor = boom)
    val port = door.start()
    try {
      val r = post(port, "/report", SemanticQueries.sem01Json)
      assert(r.statusCode() == 200 && r.body().contains("\"rowCount\":5"))
    } finally { door.stop(); jobs.shutdown() }
  }

  test("GET /domain serves introspection with freshness; /jobs round-trips") {
    val jobs = new JobQueue(spark, sf, java.nio.file.Files.createTempDirectory("httpjobs2"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs)
    val port = door.start()
    try {
      val d = get(port, "/domain")
      assert(d.statusCode() == 200)
      assert(d.body().contains("\"name\":\"order_stats\"")
        && d.body().contains("\"dataAsOf\":[{\"table\":"))
      // async job lifecycle over HTTP
      val asyncJson = SemanticQueries.sem01Json
        .replaceFirst("\\{", """{"requestType": "async", """)
      val sub = post(port, "/jobs", asyncJson)
      assert(sub.statusCode() == 202, sub.body())
      val jobId = sub.body().split("\"")(3)
      var status = ""
      val deadline = System.currentTimeMillis() + 120000
      while (!status.contains("completed") && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        status = get(port, s"/jobs/$jobId").body()
        assert(!status.contains("failed"), status)
      }
      assert(status.contains("\"rowCount\":5") && status.contains("\"rows\":["))
      // sync submissions to the queue are rejected at the door
      val rej = post(port, "/jobs", SemanticQueries.sem01Json)
      assert(rej.statusCode() == 400 && rej.body().contains("async"))
      assert(get(port, "/jobs/nope").statusCode() == 404)
      // DELETE surface: a terminal (completed) job refuses the cancel
      // with 409 + its status; an unknown id is 404. (The
      // queued/running transitions are pinned race-free in
      // JobQueueSpec with a latch-blocked worker.)
      val del = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/jobs/$jobId")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode() == 409 && del.body().contains("Completed"),
        del.body())
      val delNope = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/jobs/nope")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(delNope.statusCode() == 404)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("POST /refresh: externally landed dim reaches the next served request") {
    // the wire form of Freshness.refresh — the callback an ingestion
    // job fires instead of restarting the server
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.scratch("httpfresh")
    for (t <- Seq("orders", "customer", "nation", "region"))
      Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$tmp/$t.parquet"))
    val jobs = new JobQueue(spark, tmp, Files.createTempDirectory("httpjobs3"))
    val mon = new graft.serving.ServiceMonitor.Counting
    val door = new HttpFrontDoor(spark, tmp, SemanticQueries.registry, jobs,
      monitor = mon)
    val port = door.start()
    val json =
      """{"cube": "order_stats",
        | "selectFields": [{"field": "Region Name"}, {"field": "Order Count"}]}""".stripMargin
    try {
      assert(post(port, "/report", json).body().contains("ASIA"))
      // land a renamed region table the EXTERNAL way (staged + moved,
      // so no same-session write masks staleness)
      val out = graft.core.Tables.tbl(spark, tmp, "region")
        .withColumn("r_name", org.apache.spark.sql.functions
          .concat(org.apache.spark.sql.functions.col("r_name"),
            org.apache.spark.sql.functions.lit("_V2")))
      val rows = java.util.Arrays.asList(out.collect(): _*)
      spark.createDataFrame(rows, out.schema).write.parquet(s"$tmp/_stage")
      assert(new java.io.File(s"$tmp/region.parquet").delete())
      Files.move(Paths.get(s"$tmp/_stage"), Paths.get(s"$tmp/region.parquet"))
      assert(get(port, "/refresh").statusCode() == 405)
      val r = post(port, "/refresh", "")
      assert(r.statusCode() == 200 && r.body().contains(tmp), r.body())
      val after = post(port, "/report", json).body()
      assert(after.contains("ASIA_V2") , after.take(300))
      assert(mon.succeeded("refresh") == 1L)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("POST /maintenance compacts and vacuums a REGISTERED table only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.core.TxnTable
    val tdir = graft.core.TempDirs.scratchShared("httpmaint")
    TxnTable.init(spark, tdir,
      (0L until 50000L).toDF("k").withColumn("payload", col("k")),
      numFiles = 1, statsCols = Seq("k"))
    (0 until 5).foreach { i => // tiny streaming-style commits
      TxnTable.upsert(spark, tdir, "k",
        Seq((100000L + i, 1L)).toDF("k", "payload"), numFiles = 1)
    }
    val rows = TxnTable.read(spark, tdir).count()
    val filesBefore = TxnTable.liveFiles(tdir).size
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("httpjobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainable = Map("events_live" -> tdir))
    val port = door.start()
    try {
      // unregistered table name → 404, no path traversal surface
      assert(post(port, s"/maintenance/other?op=compact", "")
        .statusCode() == 404)
      assert(post(port, s"/maintenance/events_live?op=nope", "")
        .statusCode() == 400)
      val c = post(port,
        s"/maintenance/events_live?op=compact&minBytes=100000", "")
      assert(c.statusCode() == 200 && c.body().contains("\"packed\":"),
        c.body())
      assert(TxnTable.liveFiles(tdir).size < filesBefore)
      assert(TxnTable.read(spark, tdir).count() == rows,
        "maintenance must not change contents")
      // the audit surface: one row per committed version, metadata only
      val h = post(port, s"/maintenance/events_live?op=history", "")
      assert(h.statusCode() == 200, h.body())
      assert(h.body().contains("\"version\":1") &&
        h.body().contains(s""""version":${TxnTable.version(tdir)}"""),
        h.body())
      // explicit checkpoint over the wire: materializes the resolved
      // live set, history labels the version, a bad target is a 400
      val ckv = TxnTable.version(tdir)
      val ck = post(port, s"/maintenance/events_live?op=checkpoint", "")
      assert(ck.statusCode() == 200 &&
        ck.body().contains(s""""version":$ckv"""), ck.body())
      assert(TxnTable.hasCheckpoint(tdir, ckv))
      val h2 = post(port, s"/maintenance/events_live?op=history", "")
      assert(h2.body().contains(
        s""""version":$ckv,"kind":"data""""), h2.body())
      assert(h2.body().contains("\"checkpoint\":true"), h2.body())
      assert(post(port,
        s"/maintenance/events_live?op=checkpoint&version=999", "")
        .statusCode() == 400)
      // region-scoped re-clustering over the wire (params validated)
      assert(post(port,
        s"/maintenance/events_live?op=optimizeRange&keyCol=k", "")
        .statusCode() == 400)
      val orr = post(port,
        s"/maintenance/events_live?op=optimizeRange&keyCol=k&lo=0&hi=99999", "")
      assert(orr.statusCode() == 200 &&
        orr.body().contains("\"reclustered\":"), orr.body())
      assert(TxnTable.read(spark, tdir).count() == rows,
        "optimizeRange must not change contents")
      // malformed numeric params and out-of-range requests are the
      // CALLER's fault: 400, never a 500
      assert(post(port,
        s"/maintenance/events_live?op=compact&minBytes=junk", "")
        .statusCode() == 400)
      val tooFar = post(port,
        s"/maintenance/events_live?op=vacuum&keepSince=999", "")
      assert(tooFar.statusCode() == 400, s"${tooFar.statusCode()}: ${tooFar.body()}")
      assert(post(port,
        s"/maintenance/events_live?op=vacuum&keepSince=x", "")
        .statusCode() == 400)
      // CHECK-constraint management over the wire: declare (predicate
      // URL-encoded), list, watch it reject a bad mutation as a 400,
      // drop
      val enc = java.net.URLEncoder.encode("payload >= 0", "UTF-8")
      assert(post(port,
        s"/maintenance/events_live?op=addConstraint&name=p_pos&predicate=$enc",
        "").statusCode() == 200)
      val lst = post(port, s"/maintenance/events_live?op=constraints", "")
      assert(lst.statusCode() == 200 && lst.body().contains("p_pos") &&
        lst.body().contains("payload >= 0"), lst.body())
      val viol = intercept[IllegalArgumentException] {
        TxnTable.upsert(spark, tdir, "k",
          Seq((1L, -5L)).toDF("k", "payload"))
      }
      assert(viol.getMessage.contains("p_pos"))
      // a predicate containing a literal '%' (SQL modulo / LIKE) must
      // survive the wire: params decode EXACTLY once (double-decoding
      // the already-decoded query threw on '%' and ate '+')
      val encMod = java.net.URLEncoder.encode("k % 2 >= 0", "UTF-8")
      assert(post(port,
        s"/maintenance/events_live?op=addConstraint&name=kmod&predicate=$encMod",
        "").statusCode() == 200)
      val lst2 = post(port, s"/maintenance/events_live?op=constraints", "")
      assert(lst2.body().contains("k % 2 >= 0"), lst2.body())
      assert(post(port,
        s"/maintenance/events_live?op=dropConstraint&name=kmod", "")
        .statusCode() == 200)
      // an unanalyzable predicate is the CALLER's mistake: 400, not 500
      val encBad = java.net.URLEncoder.encode("nosuchcol > 0", "UTF-8")
      val badPred = post(port,
        s"/maintenance/events_live?op=addConstraint&name=b&predicate=$encBad", "")
      assert(badPred.statusCode() == 400, s"${badPred.statusCode()}: ${badPred.body()}")
      assert(post(port,
        s"/maintenance/events_live?op=dropConstraint&name=p_pos", "")
        .statusCode() == 200)
      TxnTable.upsert(spark, tdir, "k", Seq((1L, -5L)).toDF("k", "payload"))
      // the retention guard is ON over the wire: the freshly
      // superseded versions refuse as a 409 conflict (a pinned reader
      // may still be scanning), and force=true is the explicit
      // operator override
      val refused = post(port, s"/maintenance/events_live?op=vacuum", "")
      assert(refused.statusCode() == 409, s"${refused.statusCode()}: ${refused.body()}")
      val v = post(port, s"/maintenance/events_live?op=vacuum&force=true", "")
      assert(v.statusCode() == 200, v.body())
      // pre-compaction versions are gone, the live one reads intact
      intercept[RuntimeException](TxnTable.read(spark, tdir, v = 1))
      assert(TxnTable.read(spark, tdir).count() == rows)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("POST /index: balance detects drift, retrain publishes the repair, history lists generations") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Similarity
    // a deliberately DRIFTED layout published as gen 1: everything in
    // one list — the operational loop is: schedule `balance`, see
    // drifted=true, run `retrain`, serve the successor generation
    val k = 8
    val layout = graft.core.TempDirs.scratchShared("httpivf")
    (0L until 400L).map { i =>
      val e = Seq((math.cos(i * 0.01)).toFloat, (math.sin(i * 0.01)).toFloat)
      (i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("vec_id", "embedding", "nrm")
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(layout)
    val root = graft.core.TempDirs.scratchShared("httpivfroot")
    assert(Similarity.ivfPublish(root, layout, k) == 1)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("ivfjobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainableIndexes = Map("docs_ann" -> root))
    val port = door.start()
    try {
      assert(post(port, "/index/nope?op=balance", "").statusCode() == 404)
      assert(post(port, "/index/docs_ann?op=wat", "").statusCode() == 400)
      val b1 = post(port, "/index/docs_ann?op=balance", "")
      assert(b1.statusCode() == 200 && b1.body().contains("\"drifted\":true"),
        b1.body())
      val rt = post(port, "/index/docs_ann?op=retrain&iters=2", "")
      assert(rt.statusCode() == 200 && rt.body().contains("\"gen\":2"),
        rt.body())
      val b2 = post(port, "/index/docs_ann?op=balance", "")
      assert(b2.statusCode() == 200 && b2.body().contains("\"gen\":2") &&
        b2.body().contains("\"drifted\":false"), b2.body())
      val h = post(port, "/index/docs_ann?op=history", "")
      assert(h.statusCode() == 200 && h.body().contains("\"gen\":1") &&
        h.body().contains("\"gen\":2"), h.body())
      // SEARCH with the nprobe knob, over the retrained generation:
      // k results per query, ranks 1..k, served from gen 2
      val sr = post(port,
        "/index/docs_ann?op=search&vecId=10,390&k=3&nprobe=2", "")
      assert(sr.statusCode() == 200 && sr.body().contains("\"gen\":2") &&
        sr.body().contains("\"nprobe\":2"), sr.body())
      assert("\"qid\":10,".r.findAllIn(sr.body()).size == 3 &&
        "\"qid\":390,".r.findAllIn(sr.body()).size == 3, sr.body())
      // nprobe=k = exact flat search: for this smooth 2-D circle
      // corpus the true nearest neighbors of id 10 are ids 9 and 11 —
      // full-probe search must find them
      val ex = post(port,
        s"/index/docs_ann?op=search&vecId=10&k=2&nprobe=$k", "")
      assert(ex.statusCode() == 200 &&
        ex.body().contains("\"nid\":9") && ex.body().contains("\"nid\":11"),
        ex.body())
      // knob validation: nprobe/k/vecId are the caller's problem
      assert(post(port, "/index/docs_ann?op=search&vecId=10&nprobe=0", "")
        .statusCode() == 400)
      assert(post(port, "/index/docs_ann?op=search&vecId=10&k=0", "")
        .statusCode() == 400)
      assert(post(port, "/index/docs_ann?op=search", "").statusCode() == 400)
      assert(post(port, "/index/docs_ann?op=search&vecId=x", "")
        .statusCode() == 400)
      // query-by-EXTERNAL-vector: serve the caller's embedding (not a
      // corpus id) — the nearest corpus vector to id 10's own
      // coordinates is id 10 itself (cosine 1), then its ring
      // neighbors; dim/NaN garbage is the caller's problem
      val v10 = Seq(math.cos(10 * 0.01), math.sin(10 * 0.01))
        .map(_.toFloat).mkString(",")
      val vq = post(port,
        s"/index/docs_ann?op=search&vec=$v10&k=3&nprobe=$k", "")
      assert(vq.statusCode() == 200, vq.body())
      assert(vq.body().contains("\"nid\":10") &&
        vq.body().contains("\"rank\":1"), vq.body())
      assert(post(port, "/index/docs_ann?op=search&vec=1.0", "")
        .statusCode() == 400, "dim mismatch must 400")
      assert(post(port, "/index/docs_ann?op=search&vec=NaN,1.0", "")
        .statusCode() == 400, "non-finite components must 400")
      assert(post(port, "/index/docs_ann?op=search&vec=0.0,0.0", "")
        .statusCode() == 400,
        "a zero vector must 400 (NaN cosine would corrupt the JSON)")
      // generation vacuum over the wire: the retention guard refuses
      // the freshly superseded gen 1 as a 409; force sweeps it and
      // the current generation keeps serving
      val rv = post(port, "/index/docs_ann?op=vacuum&keepGens=1", "")
      assert(rv.statusCode() == 409, s"${rv.statusCode()}: ${rv.body()}")
      val fv = post(port, "/index/docs_ann?op=vacuum&keepGens=1&force=true", "")
      assert(fv.statusCode() == 200 && fv.body().contains("[1]"), fv.body())
      val h2 = post(port, "/index/docs_ann?op=history", "")
      assert(!h2.body().contains("\"gen\":1") && h2.body().contains("\"gen\":2"),
        h2.body())
      assert(post(port,
        s"/index/docs_ann?op=search&vecId=10&k=2&nprobe=$k", "")
        .statusCode() == 200, "the surviving generation must keep serving")
      // ROLLBACK over the wire: gen 3 is a bad retrain; a takedown
      // lands while it serves; rollback publishes gen 4 re-serving
      // gen 2's layout by pointer — and the takedown survives
      val rt3 = post(port, "/index/docs_ann?op=retrain&iters=1", "")
      assert(rt3.statusCode() == 200 && rt3.body().contains("\"gen\":3"),
        rt3.body())
      // takedown batch via the JSON body (the over-URL-limit shape)
      val delB = post(port, "/index/docs_ann?op=delete",
        """{"vecIds":[10]}""")
      assert(delB.statusCode() == 200 &&
        delB.body().contains("\"tombstoned\":1"), delB.body())
      assert(post(port, "/index/docs_ann?op=delete", "").statusCode() == 400)
      assert(post(port, "/index/docs_ann?op=delete",
        """{"vecIds":[[1]]}""").statusCode() == 400)
      val rb = post(port, "/index/docs_ann?op=rollback&gen=2", "")
      assert(rb.statusCode() == 200 && rb.body().contains("\"gen\":4") &&
        rb.body().contains("\"serves\":2"), rb.body())
      val h3 = post(port, "/index/docs_ann?op=history", "")
      assert(h3.body().contains("\"gen\":4") &&
        h3.body().contains("\"rollbackOf\":2"), h3.body())
      assert(h3.body().contains("\"tombstones\":1"),
        s"the carried takedown must be visible in history: ${h3.body()}")
      // the takedown binds on the rolled-back generation: deleted as
      // a neighbor AND refused as a query (gone means gone)
      val sr4 = post(port,
        s"/index/docs_ann?op=search&vecId=12&k=5&nprobe=$k", "")
      assert(sr4.statusCode() == 200 && !sr4.body().contains("\"nid\":10"),
        sr4.body())
      assert(post(port,
        s"/index/docs_ann?op=search&vecId=10&k=2&nprobe=$k", "")
        .statusCode() == 400, "a tombstoned query id must 400")
      val bal4 = post(port, "/index/docs_ann?op=balance", "")
      assert(bal4.statusCode() == 200 &&
        bal4.body().contains("\"tombstones\":1"), bal4.body())
      // client errors: vacuumed target, already-current target
      assert(post(port, "/index/docs_ann?op=rollback&gen=1", "")
        .statusCode() == 400, "a vacuumed rollback target must 400")
      assert(post(port, "/index/docs_ann?op=rollback&gen=4", "")
        .statusCode() == 400)
      assert(post(port, "/index/docs_ann?op=rollback", "")
        .statusCode() == 400)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("serve-path generation resolution is LIST-free and GET-bounded; " +
      "a lost/corrupt head hint self-heals over the wire") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Similarity
    val k = 4
    val layout = graft.core.TempDirs.scratchShared("iolayout")
    (0L until 200L).map { i =>
      val e = Seq(math.cos(i * 0.02).toFloat, math.sin(i * 0.02).toFloat)
      (i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("vec_id", "embedding", "nrm")
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(layout)
    val root = graft.core.TempDirs.scratchShared("ioroot")
    Similarity.ivfPublish(root, layout, k)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("iojobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainableIndexes = Map("io_ann" -> root))
    val port = door.start()
    try {
      def search() = post(port,
        s"/index/io_ann?op=search&vecId=10&k=2&nprobe=$k", "")
      assert(search().statusCode() == 200) // warm pointer + plan caches
      // STEADY STATE: every request resolves the serving generation
      // through hint + memoized pointer parse — zero root LISTs, zero
      // pointer-body GETs (on an object store each of those is one
      // round trip PER GENERATION per request without the hint)
      Similarity.resetIvfIoCountersForTest()
      (1 to 3).foreach(_ => assert(search().statusCode() == 200))
      assert(Similarity.ivfRootLists.get() == 0,
        s"serve path must not LIST the index root " +
          s"(${Similarity.ivfRootLists.get()})")
      assert(Similarity.ivfPointerReads.get() == 0,
        s"serve path must not re-read pointer bodies " +
          s"(${Similarity.ivfPointerReads.get()})")
      // a RETRAIN publishes gen 2: the next serve pays exactly one
      // pointer-body GET (the new generation), still zero LISTs
      assert(post(port, "/index/io_ann?op=retrain&iters=1", "")
        .statusCode() == 200)
      Similarity.resetIvfIoCountersForTest()
      assert(search().statusCode() == 200)
      assert(Similarity.ivfRootLists.get() == 0 &&
        Similarity.ivfPointerReads.get() <= 1,
        s"post-retrain serve: lists=${Similarity.ivfRootLists.get()} " +
          s"reads=${Similarity.ivfPointerReads.get()}")
      // LOST HINT (crash between publish and hint-write, or external
      // cleanup): one LIST fallback, correct generation, re-primed
      val hint = new java.io.File(root, "_head.json")
      assert(hint.delete())
      val r1 = search()
      assert(r1.statusCode() == 200 && r1.body().contains("\"gen\":2"),
        r1.body())
      assert(hint.exists(), "the LIST fallback must re-prime the hint")
      Similarity.resetIvfIoCountersForTest()
      assert(search().statusCode() == 200)
      assert(Similarity.ivfRootLists.get() == 0)
      // CORRUPT + STALE-BEHIND hints: correct answer either way (the
      // stale case walks forward on probes, zero LISTs)
      java.nio.file.Files.write(hint.toPath, "garbage".getBytes("UTF-8"))
      assert(search().body().contains("\"gen\":2"))
      java.nio.file.Files.write(hint.toPath,
        """{"gen":1}""".getBytes("UTF-8"))
      Similarity.resetIvfIoCountersForTest()
      val r2 = search()
      assert(r2.statusCode() == 200 && r2.body().contains("\"gen\":2"),
        r2.body())
      assert(Similarity.ivfRootLists.get() == 0,
        "a stale-behind hint heals via forward probes, not a LIST")
      // TOMBSTONE CHANNEL: a takedown re-reads ONCE (seq-marker keyed)
      // with read-your-writes — the deleted id is gone from the very
      // next search — and steady state pays zero tombstone LISTs
      val del = post(port, "/index/io_ann?op=delete&vecId=11", "")
      assert(del.statusCode() == 200, del.body())
      val sAfter = post(port,
        s"/index/io_ann?op=search&vecId=10&k=5&nprobe=$k", "")
      assert(sAfter.statusCode() == 200 &&
        !sAfter.body().contains("\"nid\":11"),
        s"a takedown must bind on the very next search: ${sAfter.body()}")
      Similarity.ivfTombstoneLists.set(0)
      (1 to 3).foreach(_ => assert(search().statusCode() == 200))
      assert(Similarity.ivfTombstoneLists.get() == 0,
        "steady-state serves must not LIST the tombstone dir " +
          s"(${Similarity.ivfTombstoneLists.get()})")
    } finally { door.stop(); jobs.shutdown() }
  }

  test("soak: /report traffic races maintenance + merges, snapshot-consistent, zero 500s") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, sum}
    import graft.core.TxnTable
    import graft.semantic.model._
    // the long-lived-service race the per-component specs never run
    // together: concurrent /report reads over a cube SERVED FROM a
    // TxnTable while writers commit merges and /maintenance
    // re-clusters it. Every served total must equal SOME committed
    // version's total (snapshot isolation end-to-end), and nothing
    // may 500. Each writer commit moves key 0's payload to a fresh
    // value, so every content version has a DISTINCT total — a torn
    // read (mixing files of two versions) would produce a sum outside
    // the committed set.
    val tdir = graft.core.TempDirs.scratchShared("soak")
    TxnTable.init(spark, tdir,
      (0L until 20000L).toDF("k").withColumn("payload", col("k"))
        .withColumn("grp", lit("all"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      numFiles = 0, statsCols = Seq("k"))
    val soakCube = CubeDef(
      name = "soak_stats",
      variants = Seq(FactDef(
        name = "soak_base", table = "orders",
        dimCols = Seq(PubCol("Group", "grp")),
        metrics = Seq(PubMetric("Total Payload", SumRollup,
          df => df.col("payload"))),
        cost = 1,
        view = Some((s, _) => TxnTable.read(s, tdir)))),
      dims = Nil)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("soakjobs"))
    val door = new HttpFrontDoor(spark, sf, Registry(soakCube), jobs,
      maintainable = Map("soak" -> tdir))
    val port = door.start()
    val reportJson =
      """{"cube":"soak_stats","selectFields":[{"field":"Group"},{"field":"Total Payload"}]}"""
    val statuses = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, String)]()
    val served = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val totalRe = """"all",(-?\d+)""".r
    def reporter(): Unit = (1 to 25).foreach { _ =>
      val r = post(port, "/report", reportJson)
      statuses.add(("report", r.statusCode(), r.body().take(200)))
      totalRe.findFirstMatchIn(r.body())
        .foreach(m => served.add(m.group(1).toLong))
    }
    def writer(): Unit = (1 to 12).foreach { i =>
      // the streaming-MERGE commit shape (st12's foreachBatch body):
      // one _op-tagged correction frame per batch through mergeFrame.
      // Bounded outer retry on top of withOcc: a real writer replans
      // on sustained contention rather than dying
      var done = false; var attempts = 0
      while (!done && attempts < 10) {
        try {
          TxnTable.mergeFrame(spark, tdir, "k",
            Seq((0L, 1000000L * i, "all", "upsert"))
              .toDF("k", "payload", "grp", "_op"),
            numFiles = 1)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException => attempts += 1
        }
      }
      assert(done, s"writer starved out after $attempts OCC rounds")
    }
    def maintainer(): Unit = while (!stop.get()) {
      for (op <- Seq("op=compact&minBytes=4096",
          "op=optimizeRange&keyCol=k&lo=0&hi=30000", "op=history")) {
        val r = post(port, s"/maintenance/soak?$op", "")
        statuses.add(("maint", r.statusCode(), r.body().take(200)))
      }
      val rf = post(port, "/refresh", "")
      statuses.add(("refresh", rf.statusCode(), rf.body().take(200)))
    }
    val threads =
      (1 to 4).map(_ => new Thread(() => reporter())) ++
        Seq(new Thread(() => writer()), new Thread(() => maintainer()))
    try {
      threads.foreach(_.start())
      // join reporters + writer, then stop the maintenance loop
      threads.take(5).foreach(_.join(300000))
      stop.set(true)
      threads.last.join(300000)
      import scala.jdk.CollectionConverters._
      val bad = statuses.asScala.filter(_._2 >= 500)
      assert(bad.isEmpty, s"soak produced 5xx responses: ${bad.take(3)}")
      assert(statuses.asScala.count(s => s._1 == "report" && s._2 == 200) == 100,
        s"every /report must have served; sample: ${
          statuses.asScala.filter(_._1 == "report").take(2)}")
      // snapshot consistency: each served total equals some committed
      // version's total (no vacuum ran, so every version is readable)
      val committed = (1 to TxnTable.version(tdir)).map { v =>
        TxnTable.read(spark, tdir, v).agg(sum(col("payload")))
          .first().getLong(0)
      }.toSet
      val outside = served.asScala.toSeq.filterNot(committed)
      assert(outside.isEmpty,
        s"served totals outside the committed set: ${outside.take(3)} " +
          s"(committed: ${committed.toSeq.sorted.take(5)}...)")
    } finally { stop.set(true); door.stop(); jobs.shutdown() }
  }

  test("op=schema describes the logical surface; history labels metadata epochs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.core.TxnTable
    val tdir = graft.core.TempDirs.scratchShared("httpdesc")
    TxnTable.init(spark, tdir,
      (0L until 20L).map(i => (i, i * 2)).toDF("k", "v"),
      numFiles = 1, statsCols = Seq("k"))                   // v1 data
    TxnTable.renameColumn(spark, tdir, "v", "score")        // v2 colmap
    TxnTable.addConstraint(spark, tdir, "s_pos", "score >= 0") // v3 constraints
    TxnTable.upsert(spark, tdir, "k", Seq((1L, 5L)).toDF("k", "score")) // v4 data
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("descjobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainable = Map("t" -> tdir))
    val port = door.start()
    try {
      val sc = post(port, "/maintenance/t?op=schema", "")
      assert(sc.statusCode() == 200, sc.body())
      assert(sc.body().contains(""""name":"score","type":"bigint""""),
        sc.body())
      assert(!sc.body().contains(""""name":"v""""),
        "renamed-away spelling must not describe: " + sc.body())
      assert(sc.body().contains(""""predicate":"score >= 0""""), sc.body())
      assert(sc.body().contains(""""physical":"v","logical":"score""""),
        sc.body())
      val h = post(port, "/maintenance/t?op=history", "")
      assert(h.statusCode() == 200, h.body())
      for (frag <- Seq(""""version":1,"kind":"data"""",
          """"version":2,"kind":"colmap"""",
          """"version":3,"kind":"constraints"""",
          """"version":4,"kind":"data""""))
        assert(h.body().contains(frag), s"missing $frag in ${h.body()}")
      // DEFAULT optimize after the rename: table.json still holds the
      // PHYSICAL stats spelling ("k" here, but a renamed key would be
      // stale) — the default must resolve current logical names, so
      // the zcols-less call keeps working after any rename
      TxnTable.renameColumn(spark, tdir, "k", "id")
      TxnTable.deleteKeys(spark, tdir, "id", Seq(0L)) // appends physical k
      val opt = post(port, "/maintenance/t?op=optimize", "")
      assert(opt.statusCode() == 200,
        s"default optimize must survive a rename: ${opt.body()}")
    } finally { door.stop(); jobs.shutdown() }
  }

  test("fuzzed maintenance/index params: every malformed request is a 4xx, never a 5xx") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val tdir = graft.core.TempDirs.scratchShared("httpfuzz")
    graft.core.TxnTable.init(spark, tdir,
      (0L until 20L).map(i => (i, i)).toDF("k", "v"),
      numFiles = 1, statsCols = Seq("k"))
    val layout = graft.core.TempDirs.scratchShared("httpfuzzivf")
    (0L until 50L).map { i =>
      val e = Seq(i.toFloat, (i * 2).toFloat)
      (i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("vec_id", "embedding", "nrm")
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(layout)
    val root = graft.core.TempDirs.scratchShared("httpfuzzroot")
    graft.operators.Similarity.ivfPublish(root, layout, 4)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("fuzzjobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainable = Map("t" -> tdir),
      maintainableIndexes = Map("ix" -> root))
    val port = door.start()
    try {
      val junkVals = Seq("", "x", "-1", "0", "999999999999999999999999",
        "1e9", "NaN", "%00", "..%2F..", "true", "a,b,c", " 1 ")
      val maintOps = Seq("optimize", "compact", "vacuum", "constraints",
        "addConstraint", "dropConstraint", "renameColumn", "dropColumn",
        "schema", "history", "optimizeRange", "bogus")
      val maintParams = Seq("zcols", "minBytes", "keepSince", "retainMs",
        "force", "name", "predicate", "from", "to", "keyCol", "lo", "hi")
      val ixOps = Seq("balance", "retrain", "history", "search", "vacuum",
        "bogus")
      val ixParams = Seq("iters", "vecId", "k", "nprobe", "keepGens",
        "retainMs", "force")
      val rnd = new scala.util.Random(4242)
      var checked = 0
      for (_ <- 1 to 150) {
        val (path, ops, params) =
          if (rnd.nextBoolean()) ("/maintenance/t", maintOps, maintParams)
          else ("/index/ix", ixOps, ixParams)
        val op = ops(rnd.nextInt(ops.size))
        val extra = (0 to rnd.nextInt(3)).map(_ =>
          s"${params(rnd.nextInt(params.size))}=${
            java.net.URLEncoder.encode(junkVals(rnd.nextInt(junkVals.size)),
              "UTF-8")}").mkString("&", "&", "")
        // junk BODIES too: op=search accepts a JSON vector batch, and
        // malformed ones must 400, never 500
        val junkBodies = Seq("", "{", """{"vecs":}""", """{"vecs":[[]]}""",
          """{"vecs":[[1,x]]}""", """{"vecs":[["NaN","Inf"]]}""",
          """{"vecs":[[1,2],[3]]}""", "vecs", """{"vecs":[[1e999]]}""")
        val r = post(port, s"$path?op=$op$extra",
          junkBodies(rnd.nextInt(junkBodies.size)))
        assert(r.statusCode() < 500,
          s"5xx for $path?op=$op$extra -> ${r.statusCode()}: ${r.body().take(300)}")
        checked += 1
      }
      assert(checked == 150)
      // the table and index remain healthy after the storm
      assert(graft.core.TxnTable.read(spark, tdir).count() == 20)
      assert(post(port, "/index/ix?op=history", "").statusCode() == 200)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("soak 2: live CDC follower tracks mutations + optimize; racing retrains -> one winner") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, sum => fsum}
    import graft.core.TxnTable
    import graft.operators.Similarity
    // PART 1 — a LIVE st11 follower (a running Structured Streaming
    // query tailing the manifest log) while writers commit and a
    // maintenance loop re-clusters: the follower must apply every
    // commit exactly once — optimize's identical-content versions as
    // empty deltas — so its final rollup EXACTLY equals a recompute.
    val tdir = graft.core.TempDirs.scratchShared("soak2")
    TxnTable.init(spark, tdir,
      (0L until 20000L).toDF("k").withColumn("payload", col("k"))
        .withColumn("grp", lit("all"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      numFiles = 0, statsCols = Seq("k"))
    val rollupRoot = graft.core.TempDirs.scratchShared("soak2rollup")
    val follower = spark.readStream.format("text")
      .load(s"$tdir/manifest-v*.json")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("soak2ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, bid: Long) =>
        graft.streaming.Streaming.st11ApplyBatch(
          spark, tdir, rollupRoot, bid, Seq("grp"), Seq("payload"))
        ()
      }
      .start()
    // PART 2 — two retrainers race the SAME index root while a reader
    // hammers balance/history/search over the wire: every generation
    // slot gets exactly one winner (losers see a conflict, never a
    // lost index), and the read path never 5xxes mid-publish.
    val k = 8
    val layout0 = graft.core.TempDirs.scratchShared("soak2ivf")
    (0L until 400L).map { i =>
      val e = Seq(math.cos(i * 0.01).toFloat, math.sin(i * 0.01).toFloat)
      (i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("vec_id", "embedding", "nrm")
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(layout0)
    val ivfRoot = graft.core.TempDirs.scratchShared("soak2ivfroot")
    assert(Similarity.ivfPublish(ivfRoot, layout0, k) == 1)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("soak2jobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainable = Map("soak2" -> tdir),
      maintainableIndexes = Map("soak2_ann" -> ivfRoot))
    val port = door.start()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val statuses = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, String)]()
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    def writer(): Unit = (1 to 8).foreach { i =>
      var done = false; var attempts = 0
      while (!done && attempts < 10) {
        try {
          TxnTable.mergeFrame(spark, tdir, "k",
            Seq((0L, 1000000L * i, "all", "upsert"))
              .toDF("k", "payload", "grp", "_op"), numFiles = 1)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException => attempts += 1
        }
      }
      assert(done, s"writer starved out after $attempts OCC rounds")
    }
    def optimizer(): Unit = while (!stop.get()) {
      try { TxnTable.optimize(spark, tdir, Seq("k"), numFiles = 2) }
      catch { case _: java.util.ConcurrentModificationException => () }
      try { TxnTable.compactSmall(spark, tdir, minBytes = 4096) }
      catch { case _: java.util.ConcurrentModificationException => () }
    }
    def retrainer(): Unit = (1 to 3).foreach { _ =>
      try {
        Similarity.ivfRetrainPublish(spark, ivfRoot, iters = 1)
        wins.incrementAndGet(); ()
      } catch {
        case _: java.util.ConcurrentModificationException =>
          conflicts.incrementAndGet(); ()
      }
    }
    def ivfReader(): Unit = while (!stop.get()) {
      for (op <- Seq("op=balance", "op=history",
          "op=search&vecId=7&k=2&nprobe=2")) {
        val r = post(port, s"/index/soak2_ann?$op", "")
        statuses.add(("index", r.statusCode(), r.body().take(200)))
      }
    }
    val threads = Seq(new Thread(() => writer()),
      new Thread(() => retrainer()), new Thread(() => retrainer())) ++
      Seq(new Thread(() => optimizer()), new Thread(() => ivfReader()))
    try {
      threads.foreach(_.start())
      threads.take(3).foreach(_.join(300000)) // writer + retrainers
      stop.set(true)
      threads.drop(3).foreach(_.join(300000))
      // drain the follower to the final committed version, then stop
      follower.processAllAvailable()
      follower.stop()
      import scala.jdk.CollectionConverters._
      // read path never 5xxes mid-publish
      val bad = statuses.asScala.filter(_._2 >= 500)
      assert(bad.isEmpty, s"index reads produced 5xx: ${bad.take(3)}")
      assert(statuses.asScala.nonEmpty)
      // the follower applied every commit exactly once: its rollup
      // EXACTLY equals a full recompute of the final table (a missed
      // or double-applied delta breaks the exact sum), and its cursor
      // sits at the final version
      val st = graft.streaming.Streaming.rollupState(rollupRoot)
      assert(st.nonEmpty, "follower never committed a rollup")
      val (rdir, applied, _) = st.get
      assert(applied == TxnTable.version(tdir),
        s"follower cursor $applied != table version ${TxnTable.version(tdir)}")
      val followed = spark.read.parquet(rdir)
        .select(col("grp"), col("n"),
          col("sum_payload").cast("decimal(30,6)").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).longValueExact())).toSet
      val truth = TxnTable.rollupOf(TxnTable.read(spark, tdir),
          Seq("grp"), Seq("payload"))
        .select(col("grp"), col("n"),
          col("sum_payload").cast("decimal(30,6)").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).longValueExact())).toSet
      assert(followed == truth,
        s"follower rollup diverged: $followed vs $truth")
      // every generation slot has exactly one winner, consecutively
      val gens = Similarity.ivfHistory(ivfRoot).map(_._1)
      assert(gens == (1 to (1 + wins.get())).toSeq,
        s"generations must be consecutive single-winner slots: $gens " +
          s"(wins=${wins.get()}, conflicts=${conflicts.get()})")
      assert(wins.get() >= 2, "both retrainers together must land retrains")
    } finally {
      stop.set(true)
      try follower.stop() catch { case _: Throwable => () }
      door.stop(); jobs.shutdown()
    }
  }

  test("soak 3 — restart recovery: fresh sessions continue ingest, retrain " +
      "and serve mid-lifecycle; batch search serves N vectors in one request") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, expr}
    import graft.operators.Similarity
    val rnd = new scala.util.Random(1313)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextGaussian().toFloat)
    def batch(ids: Range) = ids.map(i => (i.toLong, vec()))
      .toDF("vec_id", "embedding")
    val k = 4
    val lay0 = graft.core.TempDirs.scratchShared("soak3lay")
    batch(0 until 60)
      .withColumn("nrm", expr(
        "sqrt(aggregate(embedding, 0D, (a,x) -> a + cast(x as double)*x))"))
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(s"$lay0/seg=base")
    val root = graft.core.TempDirs.scratchShared("soak3root")
    Similarity.ivfPublish(root, lay0, k)
    val (_, lay2) = Similarity.ivfRetrainPublish(spark, root, iters = 2)
    // batch 0 lands in the original process…
    Similarity.ivfStreamAppendCurrent(spark, root, batch(60 until 70), 0L)
    // …RESTART between streamed batches: a cold session (empty memo)
    // appends the next batch against the same published generation
    val s2 = spark.newSession()
    Similarity.ivfStreamAppendCurrent(s2, root, batch(70 until 80), 1L)
    // …RESTART again: a third cold process runs the scheduled retrain
    val s3 = spark.newSession()
    val (g3, lay3) = Similarity.ivfRetrainPublish(s3, root, iters = 1)
    assert(g3 == 3)
    val folded = Similarity.ivfReadLayout(s3, lay3)
    assert(folded.count() == 80 &&
      folded.select("vec_id").distinct().count() == 80,
      "every batch from every process must land exactly once")
    // …and a FOURTH cold process re-runs the catch-up sweep (the
    // crash-between-publish-and-sweep recovery): idempotent, empty
    val s4 = spark.newSession()
    assert(Similarity.ivfFoldForward(s4, lay2, lay3).isEmpty,
      "a cold re-run of a completed sweep must fold nothing")
    // BATCH SERVE over the wire: 32 external vectors POSTed as one
    // JSON body run through ONE routed scan; each query gets its own
    // ranked top-k and every cosine is JSON-finite
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("soak3jobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainableIndexes = Map("ann3" -> root))
    val port = door.start()
    try {
      val body = (0 until 32).map(_ => vec())
        .map(v => v.mkString("[", ",", "]"))
        .mkString("""{"vecs":[""", ",", "]}")
      val r = post(port, "/index/ann3?op=search&k=3&nprobe=2", body)
      assert(r.statusCode() == 200, r.body().take(400))
      val qids = """"qid":(\d+)""".r.findAllMatchIn(r.body())
        .map(_.group(1).toInt).toSeq
      assert(qids.distinct.sorted == (0 until 32), s"got ${qids.distinct.size} queries")
      assert(qids.size == 32 * 3, s"expected 96 ranked rows, got ${qids.size}")
      assert(!r.body().contains("NaN") && !r.body().contains("Infinity"),
        "the wire response must be valid JSON (finite cosines only)")
      // single-vector and empty requests keep their contracts
      val single = post(port,
        s"/index/ann3?op=search&k=2&nprobe=$k&vec=${vec().mkString(",")}", "")
      assert(single.statusCode() == 200 &&
        """"rank":""".r.findAllIn(single.body()).size == 2)
      assert(post(port, "/index/ann3?op=search", "").statusCode() == 400)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("soak 4 — takedown + restore under fire: deletes, retrains, a " +
      "rollback, vacuums, checkpoints and a RESTORE race writers/readers; " +
      "zero 5xx, served top-k always excludes tombstoned ids, CDC " +
      "followers stay exactly consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.core.TxnTable
    import graft.operators.Similarity
    // TABLE under fire: writers + a mid-storm RESTORE + checkpoint
    // hammering + (guarded) vacuums; INDEX under fire: takedowns +
    // retrains + one rollback + readers asserting the takedown
    // invariant on every response.
    // the re-verify counter is process-global: reset so THIS storm's
    // verdict isn't poisoned by an unrelated earlier test
    TxnTable.restoreReVerifyTrips.set(0)
    val tdir = graft.core.TempDirs.scratchShared("soak4")
    TxnTable.init(spark, tdir,
      (0L until 5000L).toDF("k").withColumn("payload", col("k"))
        .withColumn("grp", lit("all"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      numFiles = 0, statsCols = Seq("k"))
    val k = 8
    val layout0 = graft.core.TempDirs.scratchShared("soak4ivf")
    (0L until 400L).map { i =>
      val e = Seq(math.cos(i * 0.013).toFloat, math.sin(i * 0.013).toFloat)
      (i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("vec_id", "embedding", "nrm")
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(s"$layout0/seg=base")
    val ivfRoot = graft.core.TempDirs.scratchShared("soak4ivfroot")
    assert(Similarity.ivfPublish(ivfRoot, layout0, k) == 1)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("soak4jobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainable = Map("soak4" -> tdir),
      maintainableIndexes = Map("soak4_ann" -> ivfRoot))
    val port = door.start()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val statuses = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, String)]()
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // ids CONFIRMED tombstoned (delete returned 200) — monotonic; a
    // search STARTED after the confirmation must never serve them
    val dead = new java.util.concurrent.ConcurrentSkipListSet[Long]()
    def rec(kind: String, r: java.net.http.HttpResponse[String]): Unit = {
      statuses.add((kind, r.statusCode(), r.body().take(200))); ()
    }
    // table writers: OCC-retried upserts on a fixed key band
    def writer(seedK: Long): Unit = (1 to 6).foreach { i =>
      var done = false; var attempts = 0
      while (!done && attempts < 12) {
        try {
          TxnTable.upsert(spark, tdir, "k",
            Seq((seedK, 1000L * i, "all")).toDF("k", "payload", "grp"),
            numFiles = 1)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException => attempts += 1
        }
      }
      assert(done, s"writer $seedK starved after $attempts OCC rounds")
    }
    // checkpoint + guarded-vacuum hammering: checkpoints must be 200
    // while writers commit; vacuums with live retention must refuse
    // (409) or abort on a restore race (409) — never 5xx, never a
    // destroyed manifest the CDC fold below would need
    def maintainer(): Unit = while (!stop.get()) {
      rec("ckpt", post(port, "/maintenance/soak4?op=checkpoint", ""))
      rec("vac", post(port, "/maintenance/soak4?op=vacuum&keepSince=2", ""))
      rec("hist", post(port, "/maintenance/soak4?op=history", ""))
      Thread.sleep(50)
    }
    // takedowns: confirm-then-record (the reader invariant's clock)
    def deleter(): Unit = (0 until 12).foreach { i =>
      val id = 100L + i * 7
      val r = post(port, s"/index/soak4_ann?op=delete&vecId=$id", "")
      rec("delete", r)
      if (r.statusCode() == 200) { dead.add(id); () }
    }
    def retrainer(): Unit = (1 to 2).foreach { _ =>
      rec("retrain", post(port, "/index/soak4_ann?op=retrain&iters=1", ""))
    }
    // one rollback lands mid-storm: re-read the pointer per attempt
    // (racing retrains conflict as 409/400 — acceptable; 5xx is not)
    def rollbacker(): Unit = {
      var ok = false; var attempts = 0
      while (!ok && attempts < 20) {
        attempts += 1
        val cur = Similarity.ivfCurrent(ivfRoot).map(_._1).getOrElse(1)
        if (cur < 2) Thread.sleep(100)
        else {
          val r = post(port,
            s"/index/soak4_ann?op=rollback&gen=${cur - 1}", "")
          rec("rollback", r)
          ok = r.statusCode() == 200
          if (!ok) Thread.sleep(100)
        }
      }
      assert(ok, s"rollback never landed in $attempts attempts")
    }
    // readers: every response sub-500, and no response may contain an
    // id whose takedown was CONFIRMED before the request started
    def reader(): Unit = while (!stop.get()) {
      val snapshot = new java.util.HashSet[Long](dead)
      val r = post(port,
        s"/index/soak4_ann?op=search&vecId=3,9&k=8&nprobe=$k", "")
      rec("search", r)
      if (r.statusCode() == 200) {
        """"nid":(\d+)""".r.findAllMatchIn(r.body())
          .map(_.group(1).toLong)
          .filter(snapshot.contains).foreach { bad =>
            violations.add(s"served tombstoned id $bad: ${r.body().take(200)}")
            ()
          }
      }
      // a confirmed-tombstoned QUERY id must never serve a ranking:
      // 400 while its tombstone is live; after a retrain's physical
      // purge the id is simply absent (200 with ZERO rows, same as a
      // never-existed id) — rows for it are the violation
      if (!snapshot.isEmpty) {
        val q = snapshot.iterator().next()
        val rq = post(port,
          s"/index/soak4_ann?op=search&vecId=$q&k=2&nprobe=2", "")
        rec("deadquery", rq)
        val servedRows = rq.statusCode() == 200 &&
          s""""qid":$q,""".r.findFirstIn(rq.body()).nonEmpty
        if ((rq.statusCode() != 400 && rq.statusCode() != 200) || servedRows)
          violations.add(s"tombstoned query $q -> ${rq.statusCode()}: " +
            rq.body().take(120))
      }
      rec("balance", post(port, "/index/soak4_ann?op=balance", ""))
      rec("ihist", post(port, "/index/soak4_ann?op=history", ""))
    }
    val storm = Seq(
      new Thread(() => writer(1L)), new Thread(() => writer(2L)),
      new Thread(() => deleter()), new Thread(() => retrainer()),
      new Thread(() => rollbacker())) ++
      Seq(new Thread(() => maintainer()), new Thread(() => reader()))
    try {
      storm.foreach(_.start())
      storm.take(5).foreach(_.join(300000))
      // the RESTORE lands while maintainer + reader still fire. It may
      // 409 on the maintenance lease while a vacuum holds it (the
      // lease's contract: conflicts are loud and retryable) — retry
      // until it lands; anything not 200/409 is a violation
      val preRestoreV = TxnTable.version(tdir)
      var restored = false
      var rAttempts = 0
      while (!restored && rAttempts < 50) {
        rAttempts += 1
        val r = post(port, "/maintenance/soak4?op=restore&version=2", "")
        rec("restore", r)
        restored = r.statusCode() == 200
        if (!restored) Thread.sleep(50)
      }
      assert(restored, s"restore never landed in $rAttempts attempts")
      Thread.sleep(500)
      stop.set(true)
      storm.drop(5).foreach(_.join(300000))
      import scala.jdk.CollectionConverters._
      val all = statuses.asScala.toSeq
      val bad5 = all.filter(_._2 >= 500)
      assert(bad5.isEmpty, s"soak produced 5xx: ${bad5.take(3)}")
      assert(violations.isEmpty,
        s"takedown invariant violated: ${violations.asScala.take(3)}")
      assert(all.count(_._1 == "search") > 0 && dead.size() > 0)
      assert(all.filter(t => t._1 == "ckpt" && t._2 == 200).nonEmpty,
        "at least one checkpoint must land under fire")
      assert(all.filter(t => t._1 == "restore")
        .forall(t => t._2 == 200 || t._2 == 409),
        "a restore outcome other than landed/lease-conflict is a bug")
      // the lease makes the restore-vs-vacuum window structurally
      // closed: the post-publish re-verify must never have fired
      assert(TxnTable.restoreReVerifyTrips.get() == 0,
        "restore's defense-in-depth re-verify fired despite the lease")
      // post-storm: index vacuum past the storm (force) keeps serving
      // with the rollback alias intact
      val fv = post(port,
        "/index/soak4_ann?op=vacuum&keepGens=2&retainMs=0&force=true", "")
      assert(fv.statusCode() == 200, fv.body())
      val post1 = post(port,
        s"/index/soak4_ann?op=search&vecId=3&k=5&nprobe=$k", "")
      assert(post1.statusCode() == 200, post1.body())
      assert(""""nid":(\d+)""".r.findAllMatchIn(post1.body())
        .map(_.group(1).toLong).forall(id => !dead.contains(id)))
      // CDC follower across the WHOLE history — upserts, checkpoints,
      // the restore — exactly equals a recompute of the final table
      // (the restore must read back as ordinary net changes)
      val keys = Seq("grp"); val sums = Seq("payload")
      val headV = TxnTable.version(tdir)
      assert(headV > preRestoreV, "the restore must have committed")
      val followed = (2 to headV).foldLeft(
        TxnTable.rollupOf(TxnTable.read(spark, tdir, v = 1), keys, sums)) {
        (roll, v) => TxnTable.applyCdcDelta(roll,
          TxnTable.changes(spark, tdir, v - 1, v), keys, sums)
      }.select(col("grp"), col("n"),
        col("sum_payload").cast("decimal(30,6)").as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).longValueExact())).toSet
      val truth = TxnTable.rollupOf(TxnTable.read(spark, tdir), keys, sums)
        .select(col("grp"), col("n"),
          col("sum_payload").cast("decimal(30,6)").as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).longValueExact())).toSet
      assert(followed == truth,
        s"CDC follower diverged across the restore: $followed vs $truth")
      // and the restored head is v2's logical content under every
      // later writer's upserts... which the rollup equality already
      // proves; spot-check the surface stayed sane
      assert(TxnTable.read(spark, tdir).columns.toSeq ==
        Seq("k", "payload", "grp"))
    } finally {
      stop.set(true); door.stop(); jobs.shutdown()
    }
  }

  test("op=asOf resolves the generation SERVING at an instant; " +
      "op=lease exposes the maintenance holder") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Similarity
    val k = 4
    val layout = graft.core.TempDirs.scratchShared("asoflayout")
    (0L until 100L).map { i =>
      val e = Seq(math.cos(i * 0.05).toFloat, math.sin(i * 0.05).toFloat)
      (i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("vec_id", "embedding", "nrm")
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(layout)
    val root = graft.core.TempDirs.scratchShared("asofroot")
    val before = System.currentTimeMillis() - 1
    Similarity.ivfPublish(root, layout, k)
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    Similarity.ivfRetrainPublish(spark, root, iters = 1)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("asofjobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs,
      maintainableIndexes = Map("asof_ann" -> root))
    val port = door.start()
    try {
      // which generation served when: gen 1 between the publishes,
      // gen 2 now; before the index existed is the loud client error
      val a1 = post(port, s"/index/asof_ann?op=asOf&ts=$between", "")
      assert(a1.statusCode() == 200 && a1.body().contains("\"gen\":1"),
        a1.body())
      val a2 = post(port,
        s"/index/asof_ann?op=asOf&ts=${System.currentTimeMillis()}", "")
      assert(a2.statusCode() == 200 && a2.body().contains("\"gen\":2"),
        a2.body())
      assert(post(port, s"/index/asof_ann?op=asOf&ts=$before", "")
        .statusCode() == 400, "before the first publish must 400")
      assert(post(port, "/index/asof_ann?op=asOf", "").statusCode() == 400)
      // the answer keys off RECORDED instants: an mtime rewrite (the
      // migration event) must not move it
      Seq(1, 2).foreach(g => assert(
        new java.io.File(root, s"gen-$g.json").setLastModified(0L)))
      Similarity.dropGenPtrCacheForTest(root)
      assert(post(port, s"/index/asof_ann?op=asOf&ts=$between", "")
        .body().contains("\"gen\":1"))
      // LEASE VISIBILITY: free, then held (named), then expired
      val l0 = post(port, "/index/asof_ann?op=lease", "")
      assert(l0.statusCode() == 200 && l0.body().contains("\"held\":false"),
        l0.body())
      val lock = new java.io.File(root, "_maintenance.lock")
      java.nio.file.Files.write(lock.toPath,
        (s"""{"holder":"index-vacuum@pid7","token":"t0",""" +
          s""""ts":${System.currentTimeMillis()},"ttlMs":600000}""")
          .getBytes("UTF-8"))
      val l1 = post(port, "/index/asof_ann?op=lease", "")
      assert(l1.statusCode() == 200 &&
        l1.body().contains("\"holder\":\"index-vacuum@pid7\"") &&
        l1.body().contains("\"expired\":false"), l1.body())
      java.nio.file.Files.write(lock.toPath,
        (s"""{"holder":"index-vacuum@pid7","token":"t0",""" +
          s""""ts":${System.currentTimeMillis() - 9999},"ttlMs":1}""")
          .getBytes("UTF-8"))
      val l2 = post(port, "/index/asof_ann?op=lease", "")
      assert(l2.body().contains("\"expired\":true"), l2.body())
      java.nio.file.Files.delete(lock.toPath)
      // the table side serves the same surface
      val tdir = graft.core.TempDirs.scratchShared("asoftable")
      graft.core.TxnTable.init(spark, tdir,
        (0L until 10L).toDF("k"), numFiles = 1)
      val door2 = new HttpFrontDoor(spark, sf, SemanticQueries.registry,
        jobs, maintainable = Map("t" -> tdir))
      val port2 = door2.start()
      try {
        val tl = post(port2, "/maintenance/t?op=lease", "")
        assert(tl.statusCode() == 200 &&
          tl.body().contains("\"held\":false"), tl.body())
      } finally door2.stop()
    } finally { door.stop(); jobs.shutdown() }
  }

  test("op=bpeTrain: async merge-table training over the job queue; " +
      "the artifact table applies tx18-style identically to the " +
      "inline trainer; state=<name> resumes") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("bpejobs"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs)
    val port = door.start()
    try {
      // parameter validation: k required and positive, m positive,
      // state name constrained (a path traversal must not become a
      // scratch dir)
      assert(post(port, "/maintenance?op=bpeTrain", "").statusCode() == 400)
      assert(post(port, "/maintenance?op=bpeTrain&k=0", "").statusCode() == 400)
      assert(post(port, "/maintenance?op=bpeTrain&k=4&m=x", "")
        .statusCode() == 400)
      assert(post(port, "/maintenance?op=bpeTrain&k=4&state=../evil", "")
        .statusCode() == 400)
      // the 32k-regime drive loop in miniature: submit async, poll,
      // fetch the artifact
      val r = post(port, "/maintenance?op=bpeTrain&k=5&m=1&state=e2e", "")
      assert(r.statusCode() == 202, r.body())
      val id = """"jobId":"([^"]+)"""".r.findFirstMatchIn(r.body())
        .get.group(1)
      val g1 = this.get(port, s"/jobs/$id")
      assert(g1.statusCode() == 200, g1.body())
      val st = jobs.await(id, 300000)
      assert(st.exists(_.isInstanceOf[JobQueue.Completed]), st.toString)
      val art = jobs.fetch(id).get.orderBy("ord").collect()
        .map(row => (row.getAs[String]("l"), row.getAs[String]("r"),
          row.getAs[Long]("cnt"), row.getAs[Long]("pieces"))).toSeq
      // m=1 ≡ the sequential trainer, row for row
      val inline = TextOps.bpeMergesIncremental(spark, sf, 5)
      assert(art == inline,
        s"job artifact must equal the inline trainer:\n$art\nvs\n$inline")
      // tx18-style APPLY of the job-produced table: fold its merges
      // (ord order) over the raw corpus — the encoded corpus must
      // hash-match the inline bpeEncoded
      def mergedTok(l: String, rr: String) =
        "<" + l.substring(1, l.length - 1) +
          rr.substring(1, rr.length - 1) + ">"
      val raw = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), expr(
          "array_join(transform(split(trim(text), '\\\\s+'), " +
            "t -> concat('<', t, '>')), ' ')").as("seq"))
      val applied = art.foldLeft(raw) { case (df, (l, rr, _, _)) =>
        df.select(col("doc_id"),
          org.apache.spark.sql.functions.replace(col("seq"),
            lit(l + " " + rr), lit(mergedTok(l, rr))).as("seq"))
      }.orderBy("doc_id").collect().map(_.getString(1)).toSeq
      val expected = TextOps.bpeEncoded(spark, sf, 5)
        .orderBy("doc_id").collect().map(_.getString(1)).toSeq
      assert(applied.hashCode == expected.hashCode &&
        applied == expected,
        "applying the job-produced merge table must reproduce the " +
          "inline encode")
      // RESUME over the wire: re-submitting under the same state name
      // answers from the persisted trainer state (same artifact)
      val r2 = post(port, "/maintenance?op=bpeTrain&k=5&m=1&state=e2e", "")
      assert(r2.statusCode() == 202, r2.body())
      val id2 = """"jobId":"([^"]+)"""".r.findFirstMatchIn(r2.body())
        .get.group(1)
      assert(jobs.await(id2, 300000)
        .exists(_.isInstanceOf[JobQueue.Completed]))
      val art2 = jobs.fetch(id2).get.orderBy("ord").collect()
        .map(row => (row.getAs[String]("l"), row.getAs[String]("r"),
          row.getAs[Long]("cnt"), row.getAs[Long]("pieces"))).toSeq
      assert(art2 == art, "a resumed submit must reproduce the artifact")
      // a DUPLICATE submit while a same-state trainer runs fails
      // LOUDLY naming the holder — two trainers racing one state dir
      // would corrupt each other's checkpoints
      val sd = jobs.taskStateDir("bpe-e2e")
      val tok = graft.core.Lease.acquire(sd, "bpeTrain",
        ttlMillis = 600000)
      try {
        val r3 = post(port,
          "/maintenance?op=bpeTrain&k=5&m=1&state=e2e", "")
        assert(r3.statusCode() == 202, r3.body())
        val id3 = """"jobId":"([^"]+)"""".r.findFirstMatchIn(r3.body())
          .get.group(1)
        val st3 = jobs.await(id3, 300000)
        assert(st3.exists {
          case JobQueue.Failed(e) => e.contains("held by")
          case _ => false
        }, s"a duplicate same-state submit must fail on the lease: $st3")
      } finally graft.core.Lease.release(sd, tok)
    } finally { door.stop(); jobs.shutdown() }
  }

  test("soak 5 — metadata churn under fire: hint/lease crash injection " +
      "races writers, readers, checkpoints, vacuum, restore and " +
      "rollback; zero 5xx, every read resolves a committed version, " +
      "leftovers self-heal") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, sum}
    import graft.core.TxnTable
    import graft.operators.Similarity
    import graft.semantic.model._
    // THE NEW SEAMS UNDER FIRE: the r15 head hints (table + index) and
    // the maintenance lease. A chaos thread repeatedly simulates the
    // crash windows — hint deleted (crash between publish and
    // hint-write), hint garbage (torn external write), hint stale
    // (slow writer's hint landing last), and a crashed maintenance
    // holder's EXPIRED lock dropped in front of every op. Invariants:
    // hints are ADVISORY (any shape degrades to the listing, so every
    // served total still equals some committed version's total), the
    // lease reclaims expired locks without wedging, and nothing 5xxs.
    val tdir = graft.core.TempDirs.scratchShared("soak5")
    TxnTable.init(spark, tdir,
      (0L until 10000L).toDF("k").withColumn("payload", col("k"))
        .withColumn("grp", lit("all"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      numFiles = 0, statsCols = Seq("k"))
    val cube = CubeDef(
      name = "soak5_stats",
      variants = Seq(FactDef(
        name = "soak5_base", table = "orders",
        dimCols = Seq(PubCol("Group", "grp")),
        metrics = Seq(PubMetric("Total Payload", SumRollup,
          df => df.col("payload"))),
        cost = 1,
        view = Some((s, _) => TxnTable.read(s, tdir)))),
      dims = Nil)
    val k = 4
    val layout0 = graft.core.TempDirs.scratchShared("soak5ivf")
    (0L until 200L).map { i =>
      val e = Seq(math.cos(i * 0.02).toFloat, math.sin(i * 0.02).toFloat)
      (i, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("vec_id", "embedding", "nrm")
      .select(lit(1).as("cid"), col("vec_id"), col("embedding"), col("nrm"))
      .write.partitionBy("cid").mode("overwrite").parquet(layout0)
    val ivfRoot = graft.core.TempDirs.scratchShared("soak5ivfroot")
    assert(Similarity.ivfPublish(ivfRoot, layout0, k) == 1)
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("soak5jobs"))
    val door = new HttpFrontDoor(spark, sf, Registry(cube), jobs,
      maintainable = Map("soak5" -> tdir),
      maintainableIndexes = Map("soak5_ann" -> ivfRoot))
    val port = door.start()
    val statuses =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, String)]()
    val served = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    def rec(kind: String, r: java.net.http.HttpResponse[String]): Unit = {
      statuses.add((kind, r.statusCode(), r.body().take(200))); ()
    }
    TxnTable.restoreReVerifyTrips.set(0)
    val reportJson =
      """{"cube":"soak5_stats","selectFields":[{"field":"Group"},{"field":"Total Payload"}]}"""
    val totalRe = """"all",(-?\d+)""".r
    def writer(seed: Long): Unit = (1 to 8).foreach { i =>
      var done = false; var attempts = 0
      while (!done && attempts < 12) {
        try {
          TxnTable.mergeFrame(spark, tdir, "k",
            Seq((0L, 1000000L * (seed * 100 + i), "all", "upsert"))
              .toDF("k", "payload", "grp", "_op"),
            numFiles = 1)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException => attempts += 1
        }
      }
      assert(done, s"writer $seed starved after $attempts OCC rounds")
    }
    def reader(): Unit = while (!stop.get()) {
      val r = post(port, "/report", reportJson)
      rec("report", r)
      totalRe.findFirstMatchIn(r.body())
        .foreach(m => served.add(m.group(1).toLong))
      val sr = post(port,
        s"/index/soak5_ann?op=search&vecId=7&k=3&nprobe=$k", "")
      rec("search", sr)
      // a search must always resolve a published generation — never a
      // torn pointer state, whatever the chaos thread did to the hint
      if (sr.statusCode() == 200)
        assert(sr.body().contains("\"gen\":"), sr.body().take(120))
    }
    def maintainer(): Unit = while (!stop.get()) {
      rec("ckpt", post(port, "/maintenance/soak5?op=checkpoint", ""))
      // guarded vacuum: live retention -> refuses as 409 (and takes/
      // releases the lease each attempt, racing the chaos injection)
      rec("vac", post(port, "/maintenance/soak5?op=vacuum&keepSince=2", ""))
      rec("hist", post(port, "/maintenance/soak5?op=history", ""))
      rec("ihist", post(port, "/index/soak5_ann?op=history", ""))
    }
    def retrainer(): Unit = (1 to 3).foreach { _ =>
      rec("retrain", post(port, "/index/soak5_ann?op=retrain&iters=1", ""))
      Thread.sleep(100)
    }
    // CRASH INJECTION at the new seams, in a loop
    val rnd = new java.util.Random(5)
    def chaos(): Unit = while (!stop.get()) {
      try {
        val tHint = new java.io.File(tdir, "_head.json")
        val iHint = new java.io.File(ivfRoot, "_head.json")
        rnd.nextInt(5) match {
          case 0 => tHint.delete(); iHint.delete(); ()
          case 1 =>
            java.nio.file.Files.write(tHint.toPath,
              "torn garbage".getBytes("UTF-8"))
            java.nio.file.Files.write(iHint.toPath,
              "torn garbage".getBytes("UTF-8"))
            ()
          case 2 =>
            java.nio.file.Files.write(tHint.toPath,
              """{"head":1}""".getBytes("UTF-8"))
            java.nio.file.Files.write(iHint.toPath,
              """{"gen":1}""".getBytes("UTF-8"))
            ()
          case 3 =>
            // a maintenance holder that crashed: its expired lock
            // must be reclaimed by the next op, never a wedge
            for (d <- Seq(tdir, ivfRoot)) {
              val lock = new java.io.File(d, "_maintenance.lock")
              if (!lock.exists()) {
                try java.nio.file.Files.write(lock.toPath,
                  (s"""{"holder":"crashed@pid1","token":"tx",""" +
                    s""""ts":${System.currentTimeMillis() - 9999}""" +
                    s""","ttlMs":1}""").getBytes("UTF-8"),
                  java.nio.file.StandardOpenOption.CREATE_NEW)
                catch { case _: java.nio.file.FileAlreadyExistsException => }
              }
            }
          case 4 =>
            // a REAPER that crashed inside its takeover section: the
            // stale .reaper.lock must self-clear (age-based) rather
            // than block expiry takeovers forever. Planted pre-aged
            // so the 10 s clearance applies immediately.
            for (d <- Seq(tdir, ivfRoot)) {
              val sec = new java.io.File(d, ".reaper.lock")
              if (!sec.exists()) {
                try {
                  java.nio.file.Files.write(sec.toPath,
                    Array.emptyByteArray,
                    java.nio.file.StandardOpenOption.CREATE_NEW)
                  sec.setLastModified(
                    System.currentTimeMillis() - 60000L)
                  ()
                } catch { case _: java.nio.file.FileAlreadyExistsException => }
              }
            }
        }
      } catch { case scala.util.control.NonFatal(_) => () }
      Thread.sleep(20)
    }
    val storm = Seq(
      new Thread(() => writer(1L)), new Thread(() => writer(2L)),
      new Thread(() => retrainer())) ++
      Seq(new Thread(() => maintainer()), new Thread(() => reader()),
        new Thread(() => chaos()))
    try {
      storm.foreach(_.start())
      storm.take(3).foreach(_.join(300000))
      // mid-storm (maintainer/reader/chaos still firing): a ROLLBACK
      // and a RESTORE, both retrying lease conflicts
      var rolled = false; var attempts = 0
      while (!rolled && attempts < 50) {
        attempts += 1
        val cur = Similarity.ivfCurrent(ivfRoot).map(_._1).getOrElse(1)
        if (cur > 1) {
          val r = post(port,
            s"/index/soak5_ann?op=rollback&gen=${cur - 1}", "")
          rec("rollback", r)
          rolled = r.statusCode() == 200
        }
        if (!rolled) Thread.sleep(50)
      }
      assert(rolled, s"rollback never landed in $attempts attempts")
      var restored = false; attempts = 0
      while (!restored && attempts < 50) {
        attempts += 1
        val r = post(port, "/maintenance/soak5?op=restore&version=2", "")
        rec("restore", r)
        restored = r.statusCode() == 200
        if (!restored) Thread.sleep(50)
      }
      assert(restored, s"restore never landed in $attempts attempts")
      // FENCE INTERLEAVING UNDER FIRE (r16): a forced sweep whose
      // holder "stalls past its TTL and is taken over" right before
      // its delete loop (the hook plants the contender's fresh claim
      // over the holder's lock) must refuse as a 409 naming the
      // fencing, drop NOTHING, and leave the table serving — with the
      // reader/maintainer/chaos threads still firing around it.
      val headF = TxnTable.version(tdir)
      val tLock = new java.io.File(tdir, "_maintenance.lock")
      TxnTable.onBeforeVacuumDelete = () =>
        java.nio.file.Files.write(tLock.toPath,
          (s"""{"holder":"contender@pid7","token":"other-token",""" +
            s""""ts":${System.currentTimeMillis()},"ttlMs":600000}""")
            .getBytes("UTF-8"))
      val fr =
        try post(port, s"/maintenance/soak5?op=vacuum&keepSince=$headF" +
          "&retainMs=0&force=true", "")
        finally TxnTable.onBeforeVacuumDelete = () => ()
      rec("fencedvac", fr)
      assert(fr.statusCode() == 409 && fr.body().contains("fencing"),
        s"${fr.statusCode()}: ${fr.body().take(200)}")
      // unwedge: the planted long-TTL contender claim is test scaffolding
      java.nio.file.Files.deleteIfExists(tLock.toPath)
      assert(new java.io.File(tdir, s"manifest-v$headF.json").exists() &&
        TxnTable.read(spark, tdir).count() == 10000,
        "the fence-refused sweep must have dropped nothing")
      Thread.sleep(300)
      stop.set(true)
      storm.drop(3).foreach(_.join(300000))
      import scala.jdk.CollectionConverters._
      val all = statuses.asScala.toSeq
      val bad5 = all.filter(_._2 >= 500)
      assert(bad5.isEmpty, s"soak 5 produced 5xx: ${bad5.take(3)}")
      // ZERO WRONG READS: every served total equals some committed
      // version's total — a hint corruption that resolved a torn or
      // phantom head would have produced a total outside this set
      val committed = (1 to TxnTable.version(tdir)).map { v =>
        TxnTable.read(spark, tdir, v).agg(sum(col("payload")))
          .first().getLong(0)
      }.toSet
      val outside = served.asScala.toSeq.filterNot(committed)
      assert(outside.isEmpty,
        s"served totals outside the committed set: ${outside.take(3)}")
      assert(all.count(s => s._1 == "report" && s._2 == 200) > 0 &&
        all.count(s => s._1 == "search" && s._2 == 200) > 0)
      assert(all.filter(t => t._1 == "ckpt").forall(_._2 == 200),
        "checkpoints are derivable — they must land under any chaos")
      // the lease closed the window: restore's defense-in-depth
      // re-verify never fired, even with chaos-injected stale locks
      assert(TxnTable.restoreReVerifyTrips.get() == 0)
      // LEFTOVERS SELF-HEAL: one read re-primes both hints; no lease
      // residue survives its holder (chaos-injected locks are expired
      // by construction and reclaimed by the next maintenance op)
      val headNow = TxnTable.version(tdir)
      assert(TxnTable.read(spark, tdir).count() == 10000)
      val genNow = Similarity.ivfCurrent(ivfRoot).map(_._1)
      assert(genNow.exists(_ >= 2), s"index must still serve: $genNow")
      val fv = post(port, "/maintenance/soak5?op=vacuum&keepSince=" +
        s"$headNow&retainMs=0&force=true", "")
      assert(fv.statusCode() == 200, fv.body())
      val ifv = post(port,
        "/index/soak5_ann?op=vacuum&keepGens=2&retainMs=0&force=true", "")
      assert(ifv.statusCode() == 200, ifv.body())
      // an expired chaos lock may sit on disk until the NEXT op runs —
      // the two sweeps above are that op; after them, zero residue
      assert(!new java.io.File(tdir, "_maintenance.lock").exists() &&
        !new java.io.File(ivfRoot, "_maintenance.lock").exists(),
        "a completed op must reclaim and release any expired lock")
      assert(TxnTable.version(tdir) == headNow &&
        TxnTable.read(spark, tdir).count() == 10000,
        "the post-storm sweep must keep the head serving")
    } finally {
      stop.set(true); door.stop(); jobs.shutdown()
    }
  }

  test("unread-body drain is CAPPED: a 4 MiB POST to an unrouted path " +
      "answers promptly with Connection: close (socket torn down, not " +
      "reused); a small unrouted POST keeps keep-alive") {
    val jobs = new JobQueue(spark, sf,
      java.nio.file.Files.createTempDirectory("httpdrain"))
    val door = new HttpFrontDoor(spark, sf, SemanticQueries.registry, jobs)
    val port = door.start()
    // a PRIVATE client: the class-shared one carries pooled keep-alive
    // connections from earlier tests, and the post-close teardown can
    // race a pooled connection's reuse — this test is about the
    // SERVER's drain/teardown contract, not the client's pool
    val me = HttpClient.newHttpClient()
    def postHere(body: String): HttpResponse[String] = {
      val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/no/such/route"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      // one retry: a response carrying Connection: close tears the
      // socket down server-side; a racing reuse surfaces as a
      // transient IOException on the NEXT request, and a retry opens
      // a fresh connection (what every HTTP client does on a stale
      // keep-alive connection)
      try me.send(req, HttpResponse.BodyHandlers.ofString())
      catch { case _: java.io.IOException =>
        me.send(req, HttpResponse.BodyHandlers.ofString())
      }
    }
    try {
      val small = postHere("x" * 1024)
      assert(small.statusCode() == 404, small.body())
      assert(!small.headers().firstValue("Connection").isPresent
          || !small.headers().firstValue("Connection").get()
            .equalsIgnoreCase("close"),
        "a small unread body must stay inside the drain budget")
      // the oversized send itself has TWO legitimate outcomes (r18
      // ADVICE: retrying the same over-cap body can fail identically —
      // a flake, not a signal): the client reads the early 404 +
      // Connection: close, OR the server's teardown lands while the
      // client is still writing the body and the send surfaces as an
      // IOException (a mid-upload reset). Both prove the capped-drain
      // contract: the handler did NOT drain 4 MiB.
      val bigReq = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/no/such/route"))
        .POST(HttpRequest.BodyPublishers.ofString("y" * (4 << 20))).build()
      (try Right(me.send(bigReq, HttpResponse.BodyHandlers.ofString()))
      catch { case e: java.io.IOException => Left(e) }) match {
        case Right(big) =>
          assert(big.statusCode() == 404, big.body())
          assert(big.headers().firstValue("Connection").isPresent &&
            big.headers().firstValue("Connection").get()
              .equalsIgnoreCase("close"),
            "an over-budget body must mark the connection for teardown " +
              "instead of pinning the handler thread on an unbounded drain")
        case Left(_) => // mid-upload reset: the capped drain tore the
          // socket down under the still-writing client — the contract
          // this test pins, observed from the other side
      }
      // the server stays healthy after the capped drain
      val after = postHere("z" * 64)
      assert(after.statusCode() == 404)
    } finally { door.stop(); jobs.shutdown() }
  }
}
