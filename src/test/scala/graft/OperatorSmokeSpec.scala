package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Every registered query runs and returns rows at sf0.001, and every
  * oracle key exists in the query map (value correctness is covered by
  * the driver's DuckDB compare + tools/selfcheck.py). */
class OperatorSmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("incremental-count BPE trainer is row-for-row identical to the " +
      "full-recount reference") {
    // the incremental trainer carries the pair-count table as state
    // and folds per-merge deltas in; any drift in counts, tie-breaks
    // or piece accounting would surface as a differing merge sequence
    val inc = graft.operators.TextOps.bpeMergesIncremental(spark, sf, 6)
    val ref = graft.operators.TextOps.bpeMergesReference(spark, sf, 6)
    assert(inc == ref,
      s"incremental and reference trainers diverged:\n$inc\nvs\n$ref")
  }

  test("batched BPE: batched(1) ≡ sequential unconditionally; " +
      "batched(m) ≡ sequential when rounds' top picks are symbol-disjoint") {
    import spark.implicits._
    // m=1 degenerates to the sequential argmax — row-for-row equal on
    // the REAL corpus, counts and piece accounting included
    val seq5 = graft.operators.TextOps.bpeMergesIncremental(spark, sf, 5)
    val b1 = graft.operators.TextOps.bpeMergesBatched(spark, sf, 5, 1)
    assert(b1 == seq5,
      s"batched(1) must equal the sequential trainer:\n$b1\nvs\n$seq5")
    // constructed corpus: every document is exactly two tokens, all
    // pair symbols disjoint, frequencies strictly ordered — a merge
    // creates no new pairs (the doc becomes one piece) and cannot
    // change another pair's count, so batched(m) must reproduce the
    // sequential merge sequence exactly, m merges per round
    val dir = graft.core.TempDirs.scratchShared("bpebatch")
    Seq.tabulate(6) { i =>
      Seq.fill(30 - i * 4)(s"s${i}a s${i}b")
    }.flatten.zipWithIndex.map { case (t, id) => (id.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ref = graft.operators.TextOps.bpeMergesIncremental(spark, dir, 6)
    var rounds = 0
    val b3 = graft.operators.TextOps.bpeMergesBatched(spark, dir, 6, 3,
      onRound = (_, _) => rounds += 1)
    assert(b3 == ref,
      s"batched(3) must equal sequential on a disjoint corpus:\n$b3\nvs\n$ref")
    assert(rounds == 2, s"6 merges at m=3 must take 2 rounds, took $rounds")
  }

  test("resumable batched BPE: a killed run resumes to a byte-identical " +
      "merge list; a completed state answers without a corpus pass") {
    val ref = graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 2)
    val stateDir = graft.core.TempDirs.scratchShared("bperesume")
    // kill the trainer mid-run (round 3; the round-2 checkpoint is the
    // last committed state) — the crash window a 32k-merge run needs
    // to survive
    val boom = intercept[RuntimeException] {
      graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 2,
        onRound = (round, _) =>
          if (round == 3) throw new RuntimeException("kill -9"),
        stateDir = Some(stateDir), checkpointEvery = 2)
    }
    assert(boom.getMessage == "kill -9")
    val committed = Option(new java.io.File(stateDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => new java.io.File(f, "meta.json").exists())
    assert(committed.nonEmpty, "the killed run must have committed a state")
    // resume: continues from the persisted corpus/counts/merges and
    // must be BYTE-IDENTICAL to the uninterrupted run — state is
    // exact (round-tripped strings, exact longs), selection is
    // deterministic
    val resumed = graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 2,
      stateDir = Some(stateDir), checkpointEvery = 2)
    assert(resumed == ref,
      s"crashed+resumed must equal uninterrupted:\n$resumed\nvs\n$ref")
    // a COMPLETED state answers from the persisted merge list alone
    // (k at or below the trained count), including truncation
    assert(graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 2,
      stateDir = Some(stateDir)) == ref)
    assert(graft.operators.TextOps.bpeMergesBatched(spark, sf, 5, 2,
      stateDir = Some(stateDir)) == ref.take(5))
    // and a LARGER k continues training from the completed state
    val extended = graft.operators.TextOps.bpeMergesBatched(spark, sf, 10, 2,
      stateDir = Some(stateDir), checkpointEvery = 2)
    assert(extended.take(8) == ref && extended.size == 10,
      "a raised k must extend, not retrain")
  }

  test("two-tier BPE state: light checkpoints skip the corpus (O(vocab) " +
      "commit) and anchor the newest heavy state; resume from a light " +
      "state replays the gap byte-identically; retirement keeps the " +
      "anchor alive") {
    val ref = graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 1)
    // fresh run, checkpoint every 2 rounds, corpus every 2nd checkpoint:
    // commits land at produced 2 (heavy), 4 (light→2), 6 (heavy),
    // 8 (light→6)
    val sd = graft.core.TempDirs.scratchShared("bpetier")
    assert(graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 1,
      stateDir = Some(sd), checkpointEvery = 2, corpusEvery = 2) == ref)
    def dir(p: Int) = new java.io.File(sd, s"state-v$p")
    def hasCorpus(p: Int) = new java.io.File(dir(p), "corpus").exists()
    def meta(p: Int) = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir(p), "meta.json").toPath), "UTF-8")
    assert(dir(8).exists() && !hasCorpus(8) &&
      meta(8).contains("\"corpusFrom\":6"),
      s"the final light state must anchor the newest heavy: ${meta(8)}")
    assert(dir(6).exists() && hasCorpus(6) &&
      !meta(6).contains("corpusFrom"),
      "the anchor heavy state must survive retirement with its corpus")
    assert(!dir(2).exists() && !dir(4).exists(),
      "superseded non-anchor states must retire")
    // a raised k RESUMES FROM THE LIGHT STATE: the corpus is rebuilt
    // by replaying merges 7..8 onto state-v6's copy — the continued
    // training must be byte-identical to an uninterrupted run
    val ref10 = graft.operators.TextOps.bpeMergesBatched(spark, sf, 10, 1)
    assert(graft.operators.TextOps.bpeMergesBatched(spark, sf, 10, 1,
      stateDir = Some(sd), checkpointEvery = 2, corpusEvery = 2) == ref10,
      "resume-from-light (gap replay) must equal uninterrupted")
    // a KILLED run whose newest committed state is light resumes the
    // same way — the crash shape the two-tier cadence must survive
    val sd2 = graft.core.TempDirs.scratchShared("bpetierkill")
    val boom = intercept[RuntimeException] {
      graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 1,
        onRound = (round, _) =>
          if (round == 5) throw new RuntimeException("kill -9"),
        stateDir = Some(sd2), checkpointEvery = 2, corpusEvery = 2)
    }
    assert(boom.getMessage == "kill -9")
    assert(new java.io.File(sd2, "state-v4").exists() &&
      !new java.io.File(sd2, "state-v4/corpus").exists(),
      "the killed run's newest committed state must be the light one")
    assert(graft.operators.TextOps.bpeMergesBatched(spark, sf, 8, 1,
      stateDir = Some(sd2), checkpointEvery = 2, corpusEvery = 2) == ref,
      "crashed-at-light + resumed must equal uninterrupted")
  }

  test("BPE checkpoint tracking is plan-derived: a concurrent thread's " +
      "localCheckpoint survives a training run, and the trainer leaks " +
      "no persistent RDDs") {
    // a FOREIGN lineage-truncated checkpoint alive across the run —
    // the global before/after-diff tracking this pins against would
    // have force-unpersisted it (its ONLY blocks) and any later use
    // would die with 'Checkpoint block not found'
    val foreign = spark.range(0, 1000).toDF("x").localCheckpoint()
    assert(foreign.count() == 1000)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    graft.operators.TextOps.bpeMergesIncremental(spark, sf, 3)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"the trainer must release every per-round checkpoint: $leaked")
    assert(foreign.count() == 1000,
      "a foreign checkpoint's blocks must survive the training run")
    foreign.unpersist()
    ()
  }

  test("tx18 BPE apply: decode == input, pieces conserve vs tx05's token counts") {
    import org.apache.spark.sql.functions._
    val k = 4
    // decode(encode(x)) conservation: a merge welds two pieces'
    // CONTENT ('<a> <b>' -> '<ab>'), so the character stream of the
    // pieces — brackets stripped, concatenated — must equal the
    // character stream of the raw tokens for EVERY document: no
    // character lost, duplicated, or reordered by any merge round
    val enc = graft.operators.TextOps.bpeEncoded(spark, sf, k)
    val decoded = enc.select(col("doc_id"), expr(
      """array_join(transform(split(seq, ' '),
        |  p -> substring(p, 2, length(p) - 2)), '')""".stripMargin)
      .as("dec"))
    val raw = graft.core.Tables.documents(spark, sf).select(col("doc_id"),
      expr("array_join(split(trim(text), '\\\\s+'), '')").as("orig"))
    assert(decoded.join(raw, "doc_id")
      .filter(col("dec") =!= col("orig")).count() == 0,
      "piece contents must concatenate back to the original tokens")
    // piece-count conservation: total pieces = total raw tokens minus
    // the merges actually applied (each replace removes exactly one
    // piece per non-overlapping occurrence); tx18's final
    // pieces_after must equal the encoded corpus's own piece count,
    // and every merge round must strictly shrink the corpus
    val report = graft.operators.TextOps.txBpeApply(spark, sf).collect()
    assert(report.length == k)
    val piecesAfter = report.map(_.getLong(4))
    val totalRaw = graft.core.Tables.documents(spark, sf)
      .agg(sum(size(expr("split(trim(text), '\\\\s+')")))).first().getLong(0)
    assert(piecesAfter.head < totalRaw && piecesAfter.toSeq ==
      piecesAfter.sorted(Ordering[Long].reverse).toSeq,
      s"each merge must shrink the corpus: raw=$totalRaw after=$piecesAfter")
    val encPieces = enc.agg(sum(size(split(col("seq"), " "))))
      .first().getLong(0)
    assert(piecesAfter.last == encPieces,
      "tx18's reported pieces must equal the encoded corpus")
    // the first trained merge is tx11's rank-1 pair — the apply loop
    // and the training statistic cannot drift apart
    val top = graft.operators.TextOps.txBpeMergeRank(spark, sf).first()
    assert((report.head.getString(1), report.head.getString(2)) ==
      (top.getString(1), top.getString(2)))
    // tx19 emits exactly one (pos, token_id) row per final piece, ids
    // are a dense 1..|vocab| range, and every document's positions
    // are gapless from 1 — the artifact sequence packing consumes
    val ids = graft.operators.TextOps.txTokenIds(spark, sf)
    assert(ids.count() == piecesAfter.last,
      "token-id rows must equal the encoded corpus piece count")
    val vocabIds = ids.select("token_id").distinct().count()
    val maxId = ids.agg(max(col("token_id"))).first().getLong(0)
    assert(maxId == vocabIds, s"ids must be dense 1..$vocabIds, max=$maxId")
    assert(ids.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"))
      .filter(col("n") =!= col("mx")).count() == 0,
      "per-document positions must be gapless from 1")
  }

  test("Verify.dump writes a loud error marker for a crashing query") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-verify-err").toString
    val boom: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new IllegalStateException("synthetic query failure")
    val ok: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, d) => graft.core.Tables.region(s, d)
    val failed = Verify.dump(spark, sf, out,
      Seq("zz_boom" -> boom, "zz_ok" -> ok))
    assert(failed.keySet == Set("zz_boom"))
    assert(failed("zz_boom").contains("synthetic query failure"))
    // the marker parquet exists and can never schema-match an oracle
    val marker = spark.read.parquet(s"$out/zz_boom")
    assert(marker.columns.toSeq == Seq("verify_error"))
    assert(marker.head().getString(0).contains("synthetic query failure"))
    // the healthy query's artifact is untouched by the failure path
    assert(spark.read.parquet(s"$out/zz_ok").count() > 0)
    val errors = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errors.contains("zz_boom") &&
      errors.contains("synthetic query failure"))
    graft.core.TempDirs.rmTree(new java.io.File(out))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      // sim04 legitimately depends on data similarity; everything else
      // must return rows on the test corpus
      if (name != "sim04_embedding_near_dups") assert(n > 0, s"$name empty")
    }
  }
}
