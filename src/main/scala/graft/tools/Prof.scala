package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the dedup hot paths (dev tool). */
object Prof extends App {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val d = "/root/testdata/sf0.1"

  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  // warm
  graft.core.Tables.documents(s, d).count()

  val tok = graft.core.Tables.documents(s, d)
    .select(col("doc_id"),
      explode(expr("array_distinct(split(trim(text), '\\\\s+'))")).as("t"))
    .select(col("doc_id"), xxhash64(col("t")).as("h"))
  val bitCnts = (0 until 64).map(b =>
    sum(shiftright(col("h"), b).bitwiseAND(1L)).as(s"c$b"))
  val simhashExpr = (0 until 64).map(b =>
    when(col(s"c$b") * 2 >= col("n"), lit(1L << b)).otherwise(0L)).reduce(_ + _)
  val sh = tok.groupBy("doc_id").agg(count(lit(1)).as("n"), bitCnts: _*)
    .select(col("doc_id"), simhashExpr.as("simhash"))

  t("signature (no cache)")(sh.count())
  val shc = sh.cache()
  t("signature cache")(shc.count())

  val blocked = shc.select(col("doc_id"), col("simhash"),
    posexplode(expr(
      "transform(sequence(0, 3), b -> shiftrightunsigned(simhash, b * 16) & 65535L)"))
      .as(Seq("band_idx", "band_val")))
  val cand = blocked.groupBy("band_idx", "band_val")
    .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
    .filter(size(col("ids")) > 1)
    .select(explode(expr(
      """flatten(transform(sequence(0, size(ids) - 2),
        |  i -> transform(sequence(i + 1, size(ids) - 1),
        |    j -> struct(ids[i] as x, ids[j] as y))))""".stripMargin)).as("p"))
    .select(col("p.x").as("x"), col("p.y").as("y"))
    .distinct()
  t("candidates")(println("cand=" + cand.count()))
  val fin = cand
    .join(shc.select(col("doc_id").as("x"), col("simhash").as("hx")), "x")
    .join(shc.select(col("doc_id").as("y"), col("simhash").as("hy")), "y")
    .withColumn("hamming", bit_count(col("hx").bitwiseXOR(col("hy"))).cast("bigint"))
    .filter(col("hamming") <= 3)
    .select("x", "y", "hamming")
    .orderBy("x", "y")
  t("verify+sort")(fin.count())
  t("full re-run")(graft.operators.Dedup.ddSimhash(s, d).count())
  s.stop()
}
