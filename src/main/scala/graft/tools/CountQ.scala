package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("queries=" + q.size + " oracles=" + o.size)
    println("no-oracle: " + (q -- o).toSeq.sorted.mkString(","))
    println("orphan-oracle: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
