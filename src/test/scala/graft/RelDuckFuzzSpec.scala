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
