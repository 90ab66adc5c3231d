package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sim05 (IVF ANN) phase profiler (dev tool). */
object Prof4 extends App {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val d = "/root/testdata/sf0.1"
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  // warm the full path once (codegen classes)
  t("full sim05 (cold codegen)")(
    graft.operators.Similarity.queries("sim05_ivf_ann")(s, d).count())
  graft.core.Caches.releaseAll()
  t("full sim05 (warm 1)")(
    graft.operators.Similarity.queries("sim05_ivf_ann")(s, d).count())
  graft.core.Caches.releaseAll()
  t("full sim05 (warm 2)")(
    graft.operators.Similarity.queries("sim05_ivf_ann")(s, d).count())
  // phase split: the run right after releaseAll RETRAINS (cold memo);
  // only the following run measures search with a memoized quantizer
  graft.core.Caches.releaseAll()
  t("train + search (cold memo)")(
    graft.operators.Similarity.queries("sim05_ivf_ann")(s, d).count())
  t("search only (memoized train)")(
    graft.operators.Similarity.queries("sim05_ivf_ann")(s, d).count())
  s.stop()
}
