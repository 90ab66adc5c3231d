package graft

import org.apache.spark.sql.SparkSession

/** One-shot sf1 certification for dd08/dd09 (SemDeDup): their DuckDB
  * duals are O(pairs·dim) in SQL list ops — ~25M candidate pairs at
  * 20k vectors needed >6 h and spilled tens of GB (the ENOSPC that
  * killed a concurrent test run), so the sf1 row for these two
  * queries is certified against the INDEPENDENT plain-Scala dual
  * ([[CorpusDuals]] — itself cross-checked against DuckDB on 20
  * corpora at small scale in CorpusFuzzSpec). Exit 0 = both match.
  *
  * Run: sbt 'Test/runMain graft.Sf1SemDedupCheck'
  */
object Sf1SemDedupCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = graft.core.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2))).toSeq
    println(s"[sf1semdedup] ${embs.size} vectors")
    var failures = 0
    for ((name, dual) <- Seq(
        "dd08_semdedup" -> (() => CorpusDuals.dd08(embs)),
        "dd09_semdedup_hier" -> (() => CorpusDuals.dd09(embs)))) {
      val t0 = System.nanoTime()
      val want = dual()
      println(s"[sf1semdedup] $name dual: ${want.size} rows in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      val got = SparkEntry.queries(name)(spark, dir).collect().toSeq
        .map(r => r.schema.fieldNames.toSeq.map(f =>
          f -> r.get(r.fieldIndex(f))))
      def norm(v: Any): Any = v match {
        case i: Int => i.toLong
        case f: Float => f.toDouble
        case x => x
      }
      def ok(a: Any, b: Any): Boolean = (norm(a), norm(b)) match {
        case (x: Double, y: Double) => x == y ||
          math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x))
        case (x, y) => x == y
      }
      val mismatch =
        if (got.size != want.size) Some(s"rows ${got.size} != ${want.size}")
        else got.zip(want).zipWithIndex.collectFirst {
          case ((g, w), i) if !(g.sortBy(_._1).map(_._1) ==
              w.sortBy(_._1).map(_._1) &&
              g.sortBy(_._1).zip(w.sortBy(_._1)).forall {
                case ((_, gv), (_, wv)) => ok(gv, wv) }) =>
            s"row $i: ${g.sortBy(_._1)} != ${w.sortBy(_._1)}"
        }
      mismatch match {
        case None => println(s"[sf1semdedup] OK $name (${got.size} rows)")
        case Some(m) =>
          println(s"[sf1semdedup] FAIL $name: $m"); failures += 1
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
