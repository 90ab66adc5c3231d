import org.apache.spark.scheduler._
spark.sparkContext.setLogLevel("ERROR")
val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(j: SparkListenerJobStart): Unit = {
    val names = j.stageInfos.map(si => si.name.takeWhile(_ != '(').trim + ":" + si.numTasks).mkString(" | ")
    lines.add(f"JOB ${j.jobId}%3d nstages=${j.stageInfos.size}%2d  $names")
  }
})
val d = "/root/testdata/sf0.1"
graft.SparkEntry.queries("dd08_semdedup")(spark, d).count()
Thread.sleep(500)
println("=== dd08 jobs ===")
lines.forEach(l => println(l))
println(s"total=${lines.size}")
System.exit(0)
