spark.sparkContext.setLogLevel("WARN")
val src = "/root/repo/data/sf1"
val dst = "/root/repo/data/sf1par"
for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings",
    "customer", "nation", "region")) {
  val df = if (t == "events") graft.core.Tables.rawEvents(spark, src)
    else spark.read.parquet(s"$src/$t.parquet")
  val n = if (Seq("nation", "region").contains(t)) 1 else 32
  df.repartition(n).write.mode("overwrite").parquet(s"$dst/$t.parquet")
  println(s"SF1PAR $t done")
}
System.exit(0)
