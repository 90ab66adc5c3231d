package graft.tools
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._

/** Connected-components loop profiler (dev tool): jobs/tasks/wall of
  * the star-contraction on dd02's verified pairs at sf0.1, plus the
  * partition count of each round's checkpointed edge RDD — the input
  * to the next round's task fan-out. */
object CcProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir",
        graft.core.TempDirs.scratchShared("spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("QT_DIR", "/root/testdata/sf0.1")
    val jobs = new AtomicInteger(); val tasks = new AtomicInteger()
    val taskNanos = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          { taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L); () }
      }
    })
    // build + materialize the pair list once (outside the CC timing)
    val pairs = graft.operators.Dedup.ddNgramJaccard(spark, d)
      .select("x", "y")
    val n = pairs.count()
    println(s"pairs=$n")
    for (sp <- Seq("32", "32", "32", "2", "2", "2", "32", "2")) {
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      jobs.set(0); tasks.set(0); taskNanos.set(0)
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.connectedComponents(pairs)
      val rows = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"sp=$sp rows=$rows rounds=${graft.operators.Dedup.lastCcRounds} wall=$wall%.2f jobs=${jobs.get} tasks=${tasks.get} task_s=${taskNanos.get / 1e9}%.2f outParts=${out.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
