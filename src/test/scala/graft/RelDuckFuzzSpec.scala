package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** In-CI budgeted slice of the cross-engine relational-corpus leg
  * (r18 verdict, ranked task #1): two adversarial corpora — seed 1
  * (EMPTY-REGION / 1-nation) and seed 4 (30% NULL density +
  * duplicate nation names) — dumped through [[RelDuckFuzzMain]] and
  * compared against the DuckDB-rendered duals by tools/relcheck.py
  * (ICU timezones, Spark null ordering, VARCHAR-hop decimal→double).
  * The full 12-corpus sweep (the same corpora and request streams as
  * RelCorpusFuzzSpec) runs offline:
  * `sbt 'Test/runMain graft.RelDuckFuzzMain'` + relcheck per corpus.
  *
  * DuckDB lives in the harness' python3 (the driver's own oracle
  * stack); if this environment lacks it the spec cancels rather than
  * failing — the offline sweep is the authoritative artifact. */
class RelDuckFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val root = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = root.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  private def run(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.directory(new java.io.File("."))
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  test("RelDuckDual translation is pinned construct-by-construct " +
      "(the closed dual vocabulary; a silent non-match would make the " +
      "cross-engine leg vacuously compare Spark SQL run by DuckDB)") {
    val t = RelDuckDual.translate _
    assert(t("date_format(o_orderdate, 'yyyy-MM-dd') AS `Order Date`") ==
      "strftime(o_orderdate, '%Y-%m-%d') AS \"Order Date\"")
    assert(t("date_format(date_trunc('hour', from_utc_timestamp(ts, " +
      "'Asia/Kolkata')), 'yyyy-MM-dd HH')") ==
      "strftime(date_trunc('hour', (ts AT TIME ZONE 'UTC') AT TIME " +
        "ZONE 'Asia/Kolkata'), '%Y-%m-%d %H')")
    assert(t("ts >= to_utc_timestamp('2024-11-03 00:00:00', " +
      "'America/New_York')") ==
      "ts >= ((TIMESTAMP '2024-11-03 00:00:00' AT TIME ZONE " +
        "'America/New_York') AT TIME ZONE 'UTC')")
    assert(t("date_format(date_add(o_orderdate, 7), 'yyyy-MM-dd')") ==
      "strftime(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d')")
    // DST TimeShift's prev-day column: LOCAL day arithmetic
    assert(t("date_format(date_add(date_trunc('day', " +
      "from_utc_timestamp(ts, 'Australia/Sydney')), 5), 'yyyy-MM-dd')") ==
      "strftime(CAST(date_trunc('day', (ts AT TIME ZONE 'UTC') AT " +
        "TIME ZONE 'Australia/Sydney') AS DATE) + 5, '%Y-%m-%d')")
    // decimal→double goes through the correctly-rounded VARCHAR parse
    // (DuckDB's direct cast double-rounds past 2^53 scaled units)
    assert(t("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)") ==
      "CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)")
    assert(t("CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)") ==
      "CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) " +
        "AS DOUBLE)")
    assert(t("drill LEFT SEMI JOIN parents") == "drill SEMI JOIN parents")
  }

  test("cross-engine leg: 2 adversarial relational corpora × the full " +
      "battery (incl. DST-transition windows) ≡ the DuckDB-rendered " +
      "duals (relcheck.py: ICU tz, Spark null order, correctly-rounded " +
      "decimal→double)") {
    val probe = run(Seq("python3", "-c", "import duckdb"))
    assume(probe._1 == 0,
      s"python3+duckdb unavailable in this environment: ${probe._2}")
    val root = graft.core.TempDirs.scratchShared("relduckci")
    var cases = 0
    Seq(1, 4).foreach { seed =>
      val dir = s"$root/rc$seed"
      val out = s"$root/rc$seed-out"
      val sparkFails = RelDuckFuzzMain.dumpCorpus(spark, seed, dir, out)
      assert(sparkFails == 0, s"seed=$seed: $sparkFails spark-side failures")
      cases += RelDuckFuzzMain.corpusCases(seed).size
      val (rc, log) = run(Seq("python3", "tools/relcheck.py", dir, out))
      assert(rc == 0, s"relcheck FAILED for seed=$seed:\n$log")
      info(log.linesIterator.toSeq.lastOption.getOrElse(""))
    }
    info(s"$cases cross-engine comparisons green")
  }
}
