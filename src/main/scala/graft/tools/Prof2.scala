package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dd02/dd03 phase profiler (dev tool). */
object Prof2 extends App {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val d = "/root/testdata/sf0.1"
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  graft.core.Tables.documents(s, d).count()

  val shingledDf = graft.core.Tables.documents(s, d)
    .withColumn("tokens", expr("split(trim(text), '\\\\s+')"))
    .filter(size(col("tokens")) >= 5)
    .withColumn("shingles", expr(
      """array_distinct(transform(sequence(0, size(tokens) - 5),
        |  i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2], tokens[i+3], tokens[i+4])))""".stripMargin))
    .select("doc_id", "shingles")
  t("shingled once")(shingledDf.count())

  val ex = shingledDf.select(col("doc_id"),
    size(col("shingles")).cast("bigint").as("n"),
    explode(col("shingles")).as("s"))
  t("exploded count")(println("ex=" + ex.count()))
  val pairs = ex.as("a")
    .join(ex.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
  t("pair join count")(println("pairs=" + pairs.count()))
  t("dd02 full (current)")(graft.operators.Dedup.ddNgramJaccard(s, d).count())
  t("dd03 full (current)")(graft.operators.Dedup.ddMinhashLsh(s, d).count())
  s.stop()
}
