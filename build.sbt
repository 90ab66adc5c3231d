ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mahaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// PARALLEL FORKED TEST GROUPS (r21): the single-JVM 719-test battery
// ran ~35-65 min wall — past the verify driver's patience (the r20
// driver run was externally killed mid-suite, recorded tests_ok=false
// with a SparkContext shutdown racing in-flight tasks). Suites are
// independent across JVMs (per-JVM Spark sessions, per-JVM scratch
// roots via TempDirs, in-memory catalogs), so run them as forked JVM
// groups, up to 4 at a time, grouped to balance measured duration
// (the two corpus-fuzz batteries are additionally split in half at
// the suite level — identical seeds, two JVMs). All 719 tests passed
// under a heavily loaded host in the measuring run, so cross-group
// CPU contention is within the suites' demonstrated tolerance.
Test / testGrouping := {
  def bucket(fqn: String): String = fqn.stripPrefix("graft.") match {
    case "RelCorpusFuzzSpec" => "fuzz-rel-a"
    case "RelCorpusFuzzSpecB" => "fuzz-rel-b"
    case "CorpusFuzzSpec" => "fuzz-corpus-a"
    case "CorpusFuzzSpecB" => "fuzz-corpus-b"
    case "RequestFuzzSpec" => "fuzz-request"
    case "RelDuckFuzzSpec" | "RelFuzzBattery" => "fuzz-duck"
    case n if n.startsWith("Stream") => "streaming"
    case n if n.startsWith("Http") || n == "ServingSpec" ||
      n == "JobQueueSpec" => "serving"
    case "TxnTableSpec" | "StorageFuzzSpec" | "TornWriteSpec" |
      "LayoutSpec" => "storage"
    case "PlanShapeSpec" | "PlanAuditSpec" | "OperatorSmokeSpec" => "plans"
    case _ => "core"
  }
  // last -Xmx wins: bound EACH forked test JVM at 8g regardless of
  // SPARK_DRIVER_MEM (which sizes the single-JVM bench/run) — six
  // concurrent groups times a large driver heap must not outgrow the
  // host, and the whole battery is proven green at 8g per JVM
  val opts = Tests.SubProcess(ForkOptions()
    .withRunJVMOptions(((Test / javaOptions).value :+
      s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "8g")}").toVector))
  // heaviest groups first: sbt starts groups in sequence order as
  // slots free, so the measured long-runners must not queue behind
  // short ones (first grouped run: the last group to START, not the
  // slowest, set the 18 min wall)
  val weight = Map("fuzz-rel-a" -> 0, "fuzz-rel-b" -> 1,
    "fuzz-corpus-a" -> 2, "fuzz-corpus-b" -> 3, "fuzz-request" -> 4,
    "core" -> 5, "streaming" -> 6, "serving" -> 7)
  (Test / definedTests).value.groupBy(t => bucket(t.name)).toSeq
    .sortBy { case (g, _) => (weight.getOrElse(g, 99), g) }
    .map { case (g, ts) => Tests.Group(g, ts, opts) }
}
// 6 concurrent forked groups (default is 1); sessions use local[4]/
// local[8], so even 6 groups stay within the 32 hardware threads, and
// the full battery PASSED while sharing the host with far heavier
// ambient load than this in the measuring run. SPARK_GRAFT_TEST_GROUPS
// overrides (1 ⇒ sequential groups) for constrained environments.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.get("SPARK_GRAFT_TEST_GROUPS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(6)),
  Tags.limitAll(32))
// Forked run output goes STRAIGHT to stdout, not through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any
// consumer that parses the benchmark's one-line JSON out of the
// captured tail (a line must START with '{' to json-parse).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
