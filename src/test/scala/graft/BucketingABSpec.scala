package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.analyzer.{request, RequestModel}
import graft.operators.SemanticQueries
import graft.semantic.Bucketing._
import graft.semantic.model.Registry
import graft.serving.RequestLog

/** Cube-revision A/B bucketing (reference bucketing/BucketingConfig +
  * BucketSelector) and the request-log sink (reference request-log
  * module's writer contract + envelope).
  */
class BucketingABSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  // rev 1 of order_stats: same cube surface, base variant only (the
  // typical rollout shape: candidate revision drops/changes variants)
  private val rev1 = SemanticQueries.orderCube.copy(revision = 1,
    variants = Seq(SemanticQueries.orderCube.base))
  private val reg = Registry(SemanticQueries.orderCube, rev1)

  test("percentage maps must sum to 100") {
    val e = intercept[IllegalArgumentException] {
      CubeBucketingConfig(externalBucketPercentage = Map(0 -> 50, 1 -> 30))
    }
    assert(e.getMessage.contains("not 100%"))
  }

  test("selection order: force > whitelist > bucket > default") {
    val cfg = BucketingConfig(Map("order_stats" -> CubeBucketingConfig(
      externalBucketPercentage = Map(0 -> 100),
      userWhiteList = Map("canary" -> 1))))
    val sel = new BucketSelector(reg, cfg)
    assert(sel.select("order_stats",
      BucketParams(UserInfo("canary", false), forceRevision = Some(0)))
      .toOption.get.revision == 0, "force wins over whitelist")
    assert(sel.select("order_stats", BucketParams(UserInfo("canary", false)))
      .toOption.get.revision == 1, "whitelist wins over bucket")
    assert(sel.select("order_stats", BucketParams(UserInfo("alice", false)))
      .toOption.get.revision == 0, "external bucket map applies")
    // no config for the cube → registry default revision
    val noCfg = new BucketSelector(reg, BucketingConfig())
    assert(noCfg.select("order_stats", BucketParams(UserInfo("alice", false)))
      .toOption.get.revision == 0)
    // unknown forced revision is an error, not a silent fallback
    assert(sel.select("order_stats",
      BucketParams(UserInfo("x", false), forceRevision = Some(9))).isLeft)
  }

  test("bucket assignment is sticky per user and follows percentages") {
    val cfg = BucketingConfig(Map("order_stats" -> CubeBucketingConfig(
      internalBucketPercentage = Map(0 -> 100),
      externalBucketPercentage = Map(0 -> 80, 1 -> 20))))
    val sel = new BucketSelector(reg, cfg)
    def rev(u: String) =
      sel.select("order_stats", BucketParams(UserInfo(u, false))).toOption.get.revision
    val users = (1 to 1000).map(i => s"user-$i")
    val first = users.map(rev)
    assert(users.map(rev) == first, "same user must always land in the same bucket")
    val share1 = first.count(_ == 1).toDouble / users.size
    assert(share1 > 0.12 && share1 < 0.28, s"rev-1 share $share1 not ≈ 20%")
    // internal population uses its own map (100% rev 0)
    assert(users.forall(u => sel.select("order_stats",
      BucketParams(UserInfo(u, true))).toOption.get.revision == 0))
  }

  test("dry-run revision rides along without replacing the served one") {
    val cfg = BucketingConfig(Map("order_stats" -> CubeBucketingConfig(
      externalBucketPercentage = Map(0 -> 100),
      dryRunPercentage = Map(1 -> 100))))
    val sel = new BucketSelector(reg, cfg)
    val s = sel.select("order_stats", BucketParams(UserInfo("alice", false))).toOption.get
    assert(s.revision == 0 && s.dryRunRevision.contains(1))
    // an explicitly pinned dry-run revision wins; equal-to-served is dropped
    val pinned = sel.select("order_stats",
      BucketParams(UserInfo("alice", false), dryRunRevision = Some(1))).toOption.get
    assert(pinned.dryRunRevision.contains(1))
    val same = sel.select("order_stats",
      BucketParams(UserInfo("alice", false), dryRunRevision = Some(0))).toOption.get
    assert(same.dryRunRevision.isEmpty, "dry-running the served revision is pointless")
    // an explicitly pinned dry-run revision that does not exist is an
    // error (silently shadow-testing nothing would look configured)
    val unknown = sel.select("order_stats",
      BucketParams(UserInfo("alice", false), dryRunRevision = Some(9)))
    assert(unknown.isLeft && unknown.swap.toOption.get.contains("dry-run"))
    // dry-run percentages are per-revision sampling rates in 0..100
    val bad = intercept[IllegalArgumentException] {
      CubeBucketingConfig(dryRunPercentage = Map(1 -> 120))
    }
    assert(bad.getMessage.contains("0..100"))
  }

  test("end-to-end: whitelisted user is served by the revision-1 cube") {
    val cfg = BucketingConfig(Map("order_stats" -> CubeBucketingConfig(
      externalBucketPercentage = Map(0 -> 100),
      userWhiteList = Map("canary" -> 1))))
    val sel = new BucketSelector(reg, cfg)
    val picked = sel.select("order_stats",
      BucketParams(UserInfo("canary", false))).toOption.get
    val planned = for {
      req <- request.parse(SemanticQueries.sem01Json)
      m <- RequestModel.from(req, reg, Some(picked.revision))
      p <- graft.planner.Planner.plan(m, spark, sf)
    } yield p
    val p = planned.toOption.get
    // rev 1 has no rollup variant, so the base must serve the request
    // (on rev 0 this same request picks orders_by_priority_day_rollup)
    assert(p.factName == "orders_base")
    assert(p.df.count() == 5)
  }

  test("request log: SemanticQueries.run emits envelopes end-to-end") {
    val mem = new RequestLog.InMemoryWriter
    val prev = SemanticQueries.requestLogWriter
    SemanticQueries.requestLogWriter = mem
    try {
      SemanticQueries.runLogged(SemanticQueries.sem01Json, "req-e2e-1")(spark, sf)
      val ok = mem.records.find(_.requestId == "req-e2e-1").get
      assert(ok.status == 200 && ok.cube == "order_stats" &&
        ok.drivingTable.nonEmpty)
      // a failing request logs a 400 envelope with the cube it parsed
      intercept[IllegalArgumentException] {
        SemanticQueries.runLogged(
          """{"cube": "order_stats", "selectFields": [{"field": "No Such"}]}""",
          "req-e2e-2")(spark, sf)
      }
      val bad = mem.records.find(_.requestId == "req-e2e-2").get
      assert(bad.status == 400 && bad.cube == "order_stats" &&
        bad.errorMessage.isDefined)
    } finally SemanticQueries.requestLogWriter = prev
  }

  test("request log: envelope fields and JSON-lines backend") {
    val planned = for {
      req <- request.parse(SemanticQueries.sem01Json)
      m <- RequestModel.from(req, reg)
      p <- graft.planner.Planner.plan(m, spark, sf)
    } yield (m, p)
    val (m, p) = planned.toOption.get
    val rec = RequestLog.record("req-1", m, p, startMs = 1000L, endMs = 1500L)
    assert(rec.cube == "order_stats" && rec.revision == 0)
    assert(rec.drivingTable == p.factName && rec.status == 200)
    assert(rec.numDays == Some(731), "sem01 spans 1995-01-01..1996-12-31")
    assert(rec.requestType == "sync" && !rec.isDimDriven)
    // sem01 filters only the fact-level Order Date: fact yes, dim no
    assert(rec.hasFactFilters && !rec.hasDimFilters && !rec.hasMetricFilters)

    val mem = new RequestLog.InMemoryWriter
    mem.write(rec)
    assert(mem.records == Seq(rec))

    val path = java.nio.file.Files.createTempFile("reqlog", ".jsonl")
    val w = new RequestLog.JsonLinesWriter(path)
    w.write(rec)
    w.write(RequestLog.failure("req-2", "order_stats", "no \"such\" field", 1L, 2L))
    w.close()
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(path)).asScala
    assert(lines.size == 2)
    assert(lines.head.contains("\"requestId\":\"req-1\"") &&
      lines.head.contains("\"drivingTable\":\"orders_by_priority_day_rollup\""))
    assert(lines(1).contains("\"status\":400") &&
      lines(1).contains("\\\"such\\\""), "quotes must be escaped")
    java.nio.file.Files.delete(path)
  }
}
