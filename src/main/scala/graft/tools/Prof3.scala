package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dd04 (md5 simhash) phase profiler (dev tool). */
object Prof3 extends App {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val d = "/root/testdata/sf0.1"
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  graft.core.Tables.documents(s, d).count()

  // tokenize + md5 halves
  val tok = graft.core.Tables.documents(s, d)
    .select(col("doc_id"),
      explode(expr("array_distinct(split(trim(text), '\\\\s+'))")).as("t"))
    .select(col("doc_id"), md5(col("t")).as("m"))
    .select(col("doc_id"),
      conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("lo"))
  t("tokenize+md5")(tok.count())

  val bitCnts =
    (0 until 32).map(b => sum(shiftright(col("hi"), b).bitwiseAND(1L)).as(s"h$b")) ++
      (0 until 32).map(b => sum(shiftright(col("lo"), b).bitwiseAND(1L)).as(s"l$b"))
  def sig(p: String) = (0 until 32).map(b =>
    when(col(s"$p$b") * 2 >= col("n"), lit(1L << b)).otherwise(0L)).reduce(_ + _)
  val sh = tok.groupBy("doc_id")
    .agg(count(lit(1)).as("n"), bitCnts: _*)
    .select(col("doc_id"), sig("h").as("hi_sig"), sig("l").as("lo_sig"))
  t("signatures (no cache)")(sh.count())
  val shc = sh.cache()
  t("signatures cached")(shc.count())

  val blocked = shc.select(col("doc_id"), col("hi_sig"), col("lo_sig"),
    posexplode(expr(
      "array(shiftrightunsigned(hi_sig, 16), hi_sig & 65535L," +
        " shiftrightunsigned(lo_sig, 16), lo_sig & 65535L)"))
      .as(Seq("band_idx", "band_val")))
  val a = blocked.select(col("band_idx"), col("band_val"),
    col("doc_id").as("x"), col("hi_sig").as("hx"), col("lo_sig").as("lx"))
  val b = blocked.select(col("band_idx"), col("band_val"),
    col("doc_id").as("y"), col("hi_sig").as("hy"), col("lo_sig").as("ly"))
  val ham = (bit_count(col("hx").bitwiseXOR(col("hy")))
    + bit_count(col("lx").bitwiseXOR(col("ly"))))
  val joined = a.join(b, Seq("band_idx", "band_val"))
    .filter(col("x") < col("y") && ham <= 3)
  t("band join + filter")(joined.count())
  val dist = joined.select(col("x"), col("y"), ham.cast("bigint").as("hamming")).distinct()
  t("distinct")(dist.count())
  t("orderBy+count")(dist.orderBy("x", "y").count())
  t("full dd04 again")(graft.operators.Dedup.queries("dd04_simhash")(s, d).count())
  s.stop()
}
