import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
spark.sparkContext.setLogLevel("ERROR")
val jobs = new java.util.concurrent.atomic.AtomicInteger()
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
})
// synthetic pair list shaped like dd08's: some chains + small clusters
val pairs = spark.range(0, 300).selectExpr("id as x", "id + 1 as y")
  .union(spark.range(1000, 1200).selectExpr("id as x", "id + 7 as y"))
var edges = pairs.select(col("y").as("u"), col("x").as("v"))
  .distinct().localCheckpoint(eager = false)
def checksum(e: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
  (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
}
jobs.set(0)
val sig0 = checksum(edges)
println(s"INIT jobs=${jobs.get}")
// one round
val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
val minsL = sym.groupBy("u").agg(min(col("v")).as("mn"))
  .select(col("u"), least(col("mn"), col("u")).as("m"))
val afterLarge = sym.filter(col("v") > col("u"))
  .join(minsL, "u")
  .select(col("v").as("u"), col("m").as("v"))
  .distinct()
val minsS = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
val afterSmall = afterLarge.join(minsS, "u")
  .filter(col("v") =!= col("m"))
  .select(col("v").as("u"), col("m").as("v"))
  .union(minsS.select(col("u"), col("m").as("v")))
  .distinct().localCheckpoint(eager = false)
println("=== afterSmall explain ===")
afterSmall.explain("formatted")
jobs.set(0)
val sig1 = checksum(afterSmall)
println(s"ROUND jobs=${jobs.get}")
System.exit(0)
