package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-round cost of the incremental-count BPE trainer at a real
  * vocab size (k=256 default): one line per round (round, merged-pair
  * count, wall seconds). The naive trainer pays a FLAT full-corpus
  * pair-explode every round; the incremental state shrinks each
  * round's corpus-sized work to the documents that actually contain
  * the merged pair, so per-round cost falls as training proceeds —
  * the recorded slope lives in SCALE_SLOPE.md. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("BPE_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(256)
    // batch width m > 1 runs the SentencePiece-style batched trainer:
    // ~k/m rounds, each applying the top-m compatible merges in one
    // rewrite pass — the 32k-vocab regime
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    // third arg > 0: persist resumable trainer state every N rounds —
    // the per-round timings then INCLUDE the checkpoint overhead, so
    // (run with ckpt) vs (run without) quantifies its cost
    val ckptEvery = args.drop(2).headOption.map(_.toInt).getOrElse(0)
    // fourth arg: heavy (corpus-carrying) commit every Nth checkpoint
    // — the two-tier cadence; checkpoint rounds in the per-round
    // timings then split into LIGHT (counts+merges) and HEAVY
    // (+corpus) costs
    val corpusEvery = args.drop(3).headOption.map(_.toInt).getOrElse(4)
    val stateDir =
      if (ckptEvery > 0)
        Some(graft.core.TempDirs.scratchShared("bpestate"))
      else None
    var last = System.nanoTime()
    val t0 = last
    // the batched regime's headline metric is the ROUND REDUCTION
    // (k merges in ~k/m rounds) — record the actual count
    var lastRound = 0
    val rows =
      if (m <= 1)
        graft.operators.TextOps.bpeMergesIncremental(spark, d, k,
          onRound = (round, cnt) => {
            val now = System.nanoTime()
            println(f"BPE round=$round%4d cnt=$cnt%9d sec=${(now - last) / 1e9}%7.3f")
            last = now
            lastRound = round
          })
      else
        graft.operators.TextOps.bpeMergesBatched(spark, d, k, m,
          onRound = (round, applied) => {
            val now = System.nanoTime()
            println(f"BPEB round=$round%4d applied=$applied%4d " +
              f"sec=${(now - last) / 1e9}%7.3f")
            last = now
            lastRound = round
          }, stateDir = stateDir, checkpointEvery = ckptEvery,
          corpusEvery = corpusEvery)
    println(f"BPE total k=$k m=$m ckptEvery=$ckptEvery " +
      f"corpusEvery=$corpusEvery rounds=$lastRound " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.1f " +
      s"merges=${rows.size} finalPieces=${rows.last._4}")
    // the two-tier SIZE statement: a light state's bytes are
    // O(pair vocabulary), a heavy one's O(corpus) — the wall-clock
    // gap at sf0.1 understates what the cadence saves at 100 TB
    for (sd <- stateDir;
        st <- Option(new java.io.File(sd).listFiles()).toSeq.flatten
        if st.getName.startsWith("state-v")) {
      def du(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(du).sum)
        else f.length()
      val corpus = du(new java.io.File(st, "corpus"))
      val rest = du(st) - corpus
      println(s"BPE state ${st.getName} " +
        s"tier=${if (corpus > 0) "heavy" else "light"} " +
        s"corpusBytes=$corpus stateBytes=$rest")
    }
    spark.stop()
  }
}
