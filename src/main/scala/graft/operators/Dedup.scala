package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Near-duplicate detection at training-data scale.
  *
  * Three families, all shuffle-on-signature (never all-pairs over the
  * corpus):
  *  - exact n-gram Jaccard via shingle-explode + equi-join on shingle
  *    (the candidate space is pairs sharing ≥1 shingle — at 100 TB
  *    this is the standard "inverted index join" and shuffles on the
  *    shingle hash; frequent-shingle skew is handled by AQE).
  *  - MinHash + LSH banding: k=32 minhashes (xxhash64 seeded per
  *    function), 8 bands × 4 rows; candidates share a band signature,
  *    then exact-Jaccard verification on the candidates only.
  *  - SimHash: 64-bit token-vote signature, blocked on 4 × 16-bit
  *    chunks (two signatures within Hamming distance r share a chunk
  *    with high probability), verified with bit_count(xor).
  *
  * Everything is higher-order Column expressions — per-row signature
  * computation is a map-only stage.
  */
object Dedup {

  /** Memoized per-(session, dir) cached intermediates via the shared
    * session-keyed registry [[graft.core.Caches]]. */
  private def memo(s: SparkSession, d: String, tag: String)
      (mk: => DataFrame): DataFrame =
    graft.core.Caches.memo(s, s"dedup|$d|$tag")(mk)

  /** Unpersist every memoized intermediate cache (all operators, all
    * sessions — single-session tools only). Call after the consuming
    * queries' results have been fully executed/written — the returned
    * DataFrames are lazy, so releasing earlier would recompute the
    * expensive shingle/signature stages uncached. */
  def releaseCaches(): Unit = graft.core.Caches.releaseAll()

  /** 5-token shingles, distinct, per document — CACHED: the shingle
    * array is an expensive higher-order expression, and every consumer
    * references it multiple times (both sides of the inverted-index
    * self-join, the verification joins). Without materialization,
    * Catalyst re-evaluates the transform per Generate output row /
    * join side — measured as a 10–50× blowup at sf0.1. The cache is a
    * few MB per 5k docs (scales linearly). */
  /** Shingle computation over any documents-shaped frame (doc_id,
    * text) — exposed so specs can run the pipeline on synthetic
    * corpora. */
  private[graft] def shingle(docs: DataFrame): DataFrame =
    docs
      .withColumn("tokens", expr(TextOps.tokensExpr))
      .filter(size(col("tokens")) >= 5)
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(0, size(tokens) - 5),
          |  i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2], tokens[i+3], tokens[i+4])))""".stripMargin))
      .select("doc_id", "shingles")

  private[graft] def shingled(s: SparkSession, d: String): DataFrame =
    memo(s, d, "shingles")(shingle(documents(s, d)))

  /** Document-frequency cap on shingles entering the inverted-index
    * self-join: a shingle appearing in k documents emits k·(k-1)/2
    * candidate pairs, so boilerplate/hot shingles (df in the millions
    * in real web corpora) blow up quadratically. Shingles with df >
    * cap are dropped BEFORE the join — standard practice (near-dup
    * pairs share many shingles, so recall is barely affected). The
    * default is far above the test corpus's max df, so oracle results
    * are unchanged there.
    *
    * Error bound above the cap (one-sided, dd02): set sizes `n` are
    * computed from the UNCAPPED shingle sets while intersections count
    * only capped shingles, so reported jaccard ≤ true jaccard — the
    * cap can only DROP pairs near the threshold, never admit a false
    * pair. dd10's asymmetric divisor |A| is instead computed from the
    * CAPPED set (see [[ddContainmentFrom]]): its target case is a doc
    * made mostly of high-df boilerplate, exactly what the uncapped
    * divisor would bias below threshold. */
  val DefaultMaxShingleDf = 1000

  /** Exact n-gram Jaccard similarity join (oracle-checked): pairs of
    * documents sharing at least one 5-gram, with exact Jaccard ≥ 0.2.
    * The inverted-index join carries each side's shingle-set size, so
    * intersection AND union sizes fall out of one shuffle — no
    * join-back against the corpus for sizes. */
  def ddNgramJaccard(s: SparkSession, d: String): DataFrame =
    // memoized: the verified pair frame is tiny relative to the
    // corpus and is read by three consumers (the dd02 result, dd05's
    // closure via ccLabels, pp02's source rollup) — the
    // materialize-once intermediate a 100 TB pipeline would write out
    memo(s, d, "ngrampairs")(
      ddNgramJaccardFrom(shingled(s, d), DefaultMaxShingleDf))

  private[graft] def ddNgramJaccardFrom(sh: DataFrame, maxDf: Int): DataFrame = {
    val ex = sh.select(col("doc_id"),
      size(col("shingles")).cast("bigint").as("n"),
      explode(col("shingles")).as("s"))
    // hot-shingle cap: the over-cap shingle list is small by
    // construction (≤ |postings|/cap entries), so it broadcasts and the
    // anti-join removes hot postings without re-shuffling `ex`
    val hot = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("s")
    val capped = ex.join(broadcast(hot), Seq("s"), "left_anti")
    capped.as("a")
      .join(capped.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        col("a.n").as("nx"), col("b.n").as("ny"))
      .agg(count(lit(1)).as("inter"))
      .select(col("x"), col("y"), col("inter"), col("nx"), col("ny"),
        (col("inter").cast("double") / (col("nx") + col("ny") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("x", "y")
  }

  /** dd10 — n-gram CONTAINMENT dedup (Broder's asymmetric measure
    * c(A,B) = |A∩B|/|A|, "On the resemblance and containment of
    * documents", SEQUENCES 1997): flags a document whose shingle set
    * is (nearly) a subset of another's — boilerplate-wrapped copies,
    * quoted inclusions, page-in-page duplication — which resemblance
    * (dd02's Jaccard) is structurally blind to: a 100-shingle doc fully
    * embedded in a 10,000-shingle doc has Jaccard ≈ 0.01 but
    * containment 1.0. Emits ORDERED (contained, container) pairs at
    * containment ≥ 0.8; mutual near-identical docs emit both
    * directions, which is the informative output (each tells you which
    * side is droppable).
    *
    * Scale shape is exactly dd02's: one inverted-index self-join on
    * the shingle postings with the df cap bounding hot-shingle blowup;
    * the asymmetric score costs nothing extra (same intersection
    * count, divided by the contained side's set size only). */
  def ddContainment(s: SparkSession, d: String): DataFrame =
    ddContainmentFrom(shingled(s, d), DefaultMaxShingleDf)

  private[graft] def ddContainmentFrom(sh: DataFrame, maxDf: Int): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val hot = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("s")
    // |A| is the CAPPED set size: hot shingles leave numerator and
    // denominator TOGETHER, so above the cap the score is exact
    // containment restricted to the capped shingle universe. Dividing
    // the capped intersection by the uncapped |A| (dd02's one-sided
    // shape, fine for Jaccard) would bias a boilerplate-heavy
    // contained doc — this operator's stated target case — below the
    // 0.8 threshold. Below the cap (the oracle corpora: the default
    // cap exceeds the test corpus's max df, same guard as dd02) hot
    // is empty and n_contained equals |A| exactly, so DuckDB parity
    // holds. The size is a map-side-combined per-doc aggregate joined
    // onto the (already small) pair output — NOT a window over the
    // postings, which would shuffle the largest intermediate a second
    // time, and NOT carried through the self-join.
    val capped = ex.join(broadcast(hot), Seq("s"), "left_anti")
    val sizes = capped.groupBy("doc_id")
      .agg(count(lit(1)).as("n_contained"))
      .withColumnRenamed("doc_id", "contained_id")
    capped.as("a")
      .join(capped.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("contained_id"),
        col("b.doc_id").as("container_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes, "contained_id")
      .withColumn("containment",
        col("inter").cast("double") / col("n_contained"))
      .filter(col("containment") >= 0.8)
      .select("contained_id", "container_id", "inter", "n_contained",
        "containment")
      .orderBy("contained_id", "container_id")
  }

  /** MinHash signatures: k minhashes; minhash_i = min over shingles of
    * xxhash64(i, shingle). Computed as explode(shingles) → k codegen'd
    * MIN aggregates per doc (one hash call per (shingle, i), map-side
    * combined) — the interpreted array_min(transform(...)) form
    * re-walked the shingle array k times per document outside codegen. */
  private[graft] def minhashedFrom(sh: DataFrame, k: Int): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("t"))
    val mins = (0 until k).map(i => min(xxhash64(lit(i.toLong), col("t"))).as(s"m$i"))
    ex.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH band-bucket cap (the dd02 hot-shingle / sim04 hot-bucket
    * discipline applied to dd03): a band bucket holding B documents
    * explodes into B·(B−1)/2 candidate pairs, so one boilerplate-heavy
    * band signature shared by thousands of docs makes a single
    * aggregation row quadratic. Buckets over the cap are dropped
    * BEFORE the collect_set, bounding both the aggregation buffer
    * (O(cap) ids per bucket) and the pair explode (O(cap²) per
    * bucket). Recall loss is one-sided and confined to pairs whose
    * EVERY colliding band is degenerate — near-identical docs collide
    * in several bands, and a band shared by >cap docs carries almost
    * no discriminating signal. The default sits far above the test
    * corpus's max bucket, so oracle results are unchanged there. */
  val DefaultMaxLshBucket = 10000

  /** MinHash + LSH near-dup pairs. 8 bands × 4 rows, candidates
    * verified with exact Jaccard ≥ 0.5 over the shingle sets.
    *
    * Oracle-checked via the SUBSET-EQUALITY argument: verification
    * makes every emitted pair a member of the exact-Jaccard≥0.5 set,
    * and on this corpus the banding finds every such pair (the corpus's
    * minimum true-pair Jaccard is 0.857, where a 4-row band collides
    * with prob 0.857⁴≈0.54, so missing all 8 bands has prob
    * 0.46⁸≈0.2% — and the hashes are deterministic, so the observed
    * full recall at each SF is a fixed fact, not a sample). The oracle
    * is therefore the exact-Jaccard≥0.5 pair set in SQL. */
  def ddMinhashLsh(s: SparkSession, d: String): DataFrame =
    ddMinhashLshFrom(shingled(s, d), DefaultMaxLshBucket)

  private[graft] def ddMinhashLshFrom(sh: DataFrame,
      maxBucket: Int): DataFrame =
    ddMinhashLshBanded(sh, maxBucket, DefaultLshBands, DefaultLshRows)

  /** dd03's default banding: 8 bands × 4 rows (k = 32 minhashes) —
    * the S-curve's midpoint sits at J ≈ (1/8)^(1/4) ≈ 0.59 with
    * analytic catch probability 1−(1−J⁴)⁸ (0.67 at J=0.6, 0.89 at
    * 0.7, 0.985 at 0.8, 0.9996 at 0.9 — the table in COVERAGE.md). */
  val DefaultLshBands = 8
  val DefaultLshRows = 4

  /** The banding PARAMETERIZED (bands × rowsPerBand; k = product):
    * a pipeline trades recall for cost by widening bands — 16×2
    * catches J=0.6 pairs with p=0.9992 at 4× the candidate volume;
    * 4×8 prunes harder for high-threshold dedup. Recall floors per
    * parameterization are regression-gated (Dd03RecallGateSpec, the
    * AnnRecallGateSpec discipline applied to MinHash). Emitted pairs
    * are always verified with exact Jaccard ≥ 0.5 over the shingle
    * sets, so banding choice moves RECALL only, never soundness. */
  private[graft] def ddMinhashLshBanded(sh: DataFrame, maxBucket: Int,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand; val rows = rowsPerBand
    val mh = minhashedFrom(sh, k)
    val bandCols = (0 until bands).map { b =>
      val slots = (0 until rows).map(r => col(s"m${b * rows + r}"))
      xxhash64((lit(b.toLong) +: slots): _*)
    }
    val exploded = mh.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
    // cap via a COUNT window over the band key rather than a separate
    // hot-bucket aggregate + anti-join: the two-consumer form would
    // recompute the whole minhash aggregation (the dominant stage —
    // Spark does not dedupe a shared unpersisted subplan), while the
    // window computes `exploded` once, shuffles it on exactly the key
    // the candidate groupBy needs next (partitioning reused, no second
    // shuffle), and drops over-cap buckets in-stream
    val wband = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_hash")
    val capped = exploded
      .withColumn("sz", count(lit(1)).over(wband))
      .filter(col("sz") <= maxBucket).drop("sz")
    val cand = capped.groupBy("band_idx", "band_hash")
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2),
          |  i -> transform(sequence(i + 1, size(ids) - 1),
          |    j -> struct(ids[i] as x, ids[j] as y))))""".stripMargin)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("x"), col("shingles").as("shx")), "x")
      .join(sh.select(col("doc_id").as("y"), col("shingles").as("shy")), "y")
      .withColumn("jaccard",
        size(array_intersect(col("shx"), col("shy"))).cast("double")
          / size(array_union(col("shx"), col("shy"))))
      .filter(col("jaccard") >= 0.5)
      .select("x", "y", "jaccard")
      .orderBy("x", "y")
  }

  /** SimHash near-dup pairs (oracle-checked): 64-bit signature from
    * token votes, 16-bit band blocking, Hamming ≤ 3 verification.
    *
    * The signature is computed as explode(distinct tokens) → one
    * md5-derived 64-bit hash per token (two 32-bit halves from the
    * first 16 hex chars, so a DuckDB oracle reproduces the EXACT same
    * bits: md5 is the one hash both engines compute identically) → 64
    * conditional SUMs in a single hash aggregate on doc_id (bit b is
    * set iff ≥ half the tokens hash with bit b set — identical to the
    * ±1-vote formulation since 2·setCount ≥ n ⟺ Σ votes ≥ 0).
    * Everything stays inside whole-stage codegen with map-side partial
    * aggregation; the interpreted higher-order-function formulation
    * (re-hashing each token 64×) was 70× slower at sf0.1. The halves
    * are kept separate (hi_sig/lo_sig, each < 2³²) so neither engine
    * ever touches the BIGINT sign bit. */
  /** The (doc_id, hi_sig, lo_sig) signature stage of [[ddSimhash]],
    * exposed so specs can compute brute-force ground truth over the
    * SAME signatures the blocked join sees. */
  private[graft] def simhashSignaturesFrom(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"),
        explode(expr(s"array_distinct(${TextOps.tokensExpr})")).as("t"))
      .select(col("doc_id"), md5(col("t")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("hi"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("lo"))
    val bitCnts =
      (0 until 32).map(b => sum(shiftright(col("hi"), b).bitwiseAND(1L)).as(s"h$b")) ++
        (0 until 32).map(b => sum(shiftright(col("lo"), b).bitwiseAND(1L)).as(s"l$b"))
    def sig(p: String) = (0 until 32).map(b =>
      when(col(s"$p$b") * 2 >= col("n"), lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), bitCnts: _*)
      .select(col("doc_id"), sig("h").as("hi_sig"), sig("l").as("lo_sig"))
  }

  private[graft] def simhashSignatures(s: SparkSession, d: String): DataFrame =
    memo(s, d, "simhash")(simhashSignaturesFrom(documents(s, d)))

  def ddSimhash(s: SparkSession, d: String): DataFrame =
    ddSimhashFrom(simhashSignatures(s, d))

  private[graft] def ddSimhashFrom(sh: DataFrame): DataFrame = {
    // Candidate generation + verification fused into one self-equi-join
    // on the band: the Hamming predicate runs streamed inside the join
    // stage, so the (potentially huge, skew-prone) candidate pair set
    // is never materialized or shuffled — only verified pairs reach the
    // final distinct. (The collect_set → pair-explode → distinct →
    // join-back formulation shuffled 1.3M candidate pairs at sf0.1.)
    // 4 bands × 16 bits over the 64 signature bits: lossless for
    // Hamming ≤ 3 by pigeonhole (3 flipped bits touch ≤ 3 bands).
    val blocked = sh.select(col("doc_id"), col("hi_sig"), col("lo_sig"),
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
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("x") < col("y") && ham <= 3)
      .select(col("x"), col("y"), ham.cast("bigint").as("hamming"))
      .distinct()
      .orderBy("x", "y")
  }

  /** Connected components over an undirected pair list via alternating
    * large-star / small-star rounds (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the piece that
    * turns pairwise near-dup DETECTION into corpus DEDUP: transitive
    * closure of the pair relation, one canonical doc per cluster.
    *
    * Why not plain label propagation: min-label flooding needs
    * O(component diameter) rounds; the star alternation contracts
    * paths geometrically and converges in O(log n) rounds on any
    * graph. Why this formulation scales: both star steps are written
    * as a min-AGGREGATE per node plus an equi-join back onto the edge
    * list — no neighbor list is ever collected, so a 100M-member
    * boilerplate cluster costs a partial-aggregated shuffle, not a
    * single-task `collect_list`. Each round persists its edge set and
    * unpersists the previous one; convergence is detected by an
    * order-insensitive (count, xor-of-hashes) checksum, one tiny job
    * per round.
    *
    * Input: pairs (x, y) with x < y. Output: one row per clustered
    * vertex — (doc_id, canonical = component minimum). */
  /** Rounds the last [[connectedComponents]] call took — observability
    * for specs (the star contraction must converge in O(log n), not
    * run to the safety cap). */
  @volatile private[graft] var lastCcRounds: Int = 0

  /** @param pairsDistinct the caller PROVES `pairs` carries no
    *   duplicate rows (every in-repo producer is a groupBy/aggregate
    *   output, so the proof is structural) — the initial dedup
    *   exchange is skipped. A duplicated input would only thicken
    *   round 1's edge multiset (the checksum still converges to the
    *   same fixpoint), never change the result. */
  private[graft] def connectedComponents(pairs: DataFrame,
      pairsDistinct: Boolean = false): DataFrame = {
    // canonical directed form: u > v always (edge points high → low).
    // localCheckpoint (not just persist): each round's plan must start
    // from the materialized edge set, or the lineage — and Catalyst
    // re-optimization time — grows exponentially with round count, the
    // standard iterative-DataFrame trap.
    //
    // LAZY checkpoint + checksum fusion (r20, guide §1.2 "remove
    // passes"): an EAGER localCheckpoint schedules its own
    // materialization job and the convergence checksum then runs a
    // second job over the cached blocks — two scheduled actions per
    // round where one suffices. With eager = false the checksum IS the
    // materializing action (it reads every partition, so the full edge
    // set caches under it), halving the per-round action count. The
    // blocks are always materialized before the previous round's are
    // freed (the checksum runs first), so the truncated-lineage
    // recompute hazard the eager form guarded is still closed.
    val oriented = pairs.select(col("y").as("u"), col("x").as("v"))
    var edges = (if (pairsDistinct) oriented else oriented.distinct())
      .localCheckpoint(eager = false)
    // Dataset.unpersist is a NO-OP on a localCheckpoint'd frame (its
    // LogicalRDD was never registered with the CacheManager); freeing a
    // round's blocks promptly means unpersisting the underlying RDD.
    def freeCheckpoint(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false)
        case _ => ()
      }
    def checksum(e: DataFrame): (Long, Long) = {
      // xor, not sum: order-insensitive and can't overflow under ANSI
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = checksum(edges)
    var done = false
    var rounds = 0
    while (!done && rounds < 64) {
      // large-star: m(u) = min over Γ(u) ∪ {u}; every neighbor w > u
      // re-attaches to m(u). Computed on the symmetric adjacency.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val afterLarge = sym.filter(col("v") > col("u"))
        .join(minsL, "u")
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m, no loops
        .distinct()
      // small-star: on high→low edges, every small neighbor (and u
      // itself) re-attaches to u's minimum neighbor.
      val minsS = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val afterSmall = afterLarge.join(minsS, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(minsS.select(col("u"), col("m").as("v")))
        .distinct().localCheckpoint(eager = false)
      // the checksum materializes the lazy checkpoint (all partitions)
      val sig2 = checksum(afterSmall)
      freeCheckpoint(edges)
      edges = afterSmall
      done = sig2 == sig
      sig = sig2
      rounds += 1
    }
    lastCcRounds = rounds
    // fixpoint edge set is a star forest rooted at each component min.
    // The returned frame is LAZY and reads the final checkpointed
    // blocks — freeing them here would race the caller's consumption
    // (a localCheckpoint'd RDD cannot recompute evicted blocks). The
    // registry keeps the frame reachable until release(); after that
    // the RDD is unreferenced and ContextCleaner's weak-ref pass
    // unpersists the blocks (Dataset.unpersist can't — see above).
    graft.core.Caches.track(edges.sparkSession,
      s"cc:edges:${System.identityHashCode(pairs)}", edges)
    edges.select(col("u").as("doc_id"), col("v").as("canonical"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("canonical")))
      .distinct()
  }

  /** Duplicate-cluster assignment (oracle-checked against a DuckDB
    * recursive-CTE transitive closure): each document that appears in
    * an exact-Jaccard ≥ 0.2 near-dup pair, its cluster's canonical
    * (minimum) doc_id, and the cluster size. Downstream dedup keeps
    * `doc_id = canonical_doc` and drops the rest. */
  /** The per-doc cluster label frame, memoized: the contraction is
    * iterative (localCheckpoint per round — it materializes its own
    * input, so the pair frame needs no cache of its own), and both
    * dd05 and dd07 consume the labels. */
  private def ccLabels(s: SparkSession, d: String): DataFrame =
    memo(s, d, "cclabels") {
      // the pair frame is a groupBy output: provably duplicate-free
      connectedComponents(ddNgramJaccard(s, d).select("x", "y"),
        pairsDistinct = true)
        .select(col("doc_id"), col("canonical").as("canonical_doc"))
    }

  def ddComponents(s: SparkSession, d: String): DataFrame = {
    val labels = ccLabels(s, d)
    // cluster sizes via groupBy + join, NOT a window over canonical_doc:
    // a window would funnel a whole (possibly 100M-member boilerplate)
    // cluster into one sort task; the aggregate is map-side partial and
    // the join side of a giant cluster is AQE-skew-splittable
    val sizes = labels.groupBy("canonical_doc")
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "canonical_doc")
      .select("doc_id", "canonical_doc", "cluster_size")
      .orderBy("doc_id")
  }

  /** Passage-level exact-dup signal (the CCNet paragraph-dedup shape,
    * adapted to newline-free docs): each document is cut into
    * contiguous 32-token passages, each passage is fingerprinted
    * (md5 of the joined tokens), and a passage is "duplicated" when
    * its fingerprint occurs more than once in the whole corpus. The
    * per-doc output is the fraction of duplicated passages — the
    * boilerplate/copy signal a filtering pipeline thresholds on.
    *
    * Scale shape: chunking + fingerprinting are map-only codegen'd
    * expressions (no explode of raw tokens — one row per PASSAGE, 32×
    * fewer than per-token); the corpus-wide count is one shuffle on
    * the 128-bit fingerprint; the count map joins back on the same
    * key, then a per-doc partial aggregate. No all-pairs anything. */
  def ddPassageDedup(s: SparkSession, d: String): DataFrame =
    ddPassageDedupFrom(graft.core.Tables.documents(s, d), chunk = 32)

  private[graft] def ddPassageDedupFrom(docs: DataFrame, chunk: Int): DataFrame = {
    val pas = docs
      .withColumn("tokens", expr(TextOps.tokensExpr))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(tokens) - 1) DIV $chunk),
           |  i -> md5(concat_ws(' ', slice(tokens, i * $chunk + 1, $chunk))))""".stripMargin))
        .as(Seq("pos", "fp")))
    val counts = pas.groupBy("fp").agg(count(lit(1)).as("c"))
    pas.join(counts, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_passages"))
      .withColumn("dup_frac",
        col("n_dup_passages").cast("double") / col("n_passages"))
      .select("doc_id", "n_passages", "n_dup_passages", "dup_frac")
      .orderBy("doc_id")
  }

  /** dd11 — DUPLICATED-SPAN COVERAGE (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr signal, arXiv:2107.06499: exact duplication located
    * by matching fixed-length token windows; 20 tokens here to suit
    * the test corpus, 50 in the paper): for every document, the
    * fraction of its SLIDING 20-token windows whose exact token
    * sequence also appears in at least one OTHER document. This is
    * position-weighted and cross-document — dd02/dd10 measure set
    * resemblance over distinct shingles (drop/keep decisions), dd06
    * counts repeated non-overlapping chunks including same-doc
    * repeats; dd11 is the "how much of this doc is copied from
    * elsewhere" number that decides how much to CUT.
    *
    * Scale shape: one sliding-window explode (n_tok rows per doc —
    * linear), exact per-gram document frequency, join back on the
    * gram key, per-doc aggregate. Windows travel as md5 digests — a
    * fixed 32-char shuffle key instead of ~120-char strings, and both
    * engines compute the identical digest (collisions included), so
    * the oracle replicates value-for-value. df feeds only a ≥ 2
    * test, so a boilerplate-hot gram saturates immediately and the
    * join fan-out is one df row per gram — no dd02-style cap needed
    * for the pair-explode (there is no pair stage at all). */
  def ddSpanCoverage(s: SparkSession, d: String): DataFrame =
    // the gram frame feeds BOTH the df aggregate and the join side,
    // and Spark materializes no shared subplan on its own (measured:
    // 2 scans + 2 explodes, no ReusedExchange) — memoize it exactly
    // like dd02's shingle frame, so the dominant explode runs once
    ddSpanCoverageGrams(memo(s, d, "spangrams")(
      spanGramsOf(documents(s, d), w = 20)))

  private[graft] def ddSpanCoverageFrom(docs: DataFrame, w: Int): DataFrame =
    ddSpanCoverageGrams(spanGramsOf(docs, w))

  /** Windows travel as the first 60 bits of their md5, as a BIGINT —
    * both engines compute the identical value (the pp01 split-bucket
    * pattern), and a fixed 8-byte key makes both the gh shuffle and
    * the memoized cache ~5× narrower than the 32-char digest string
    * (measured: the string form's 100× persist cost more than
    * recomputing the explode twice). Cross-gram 60-bit collisions are
    * identical in Spark and DuckDB, so parity holds regardless. */
  private[graft] def spanGramsOf(docs: DataFrame, w: Int): DataFrame =
    docs
      .withColumn("tokens", expr(TextOps.tokensExpr))
      .filter(size(col("tokens")) >= w)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(tokens) - $w),
           |  i -> cast(conv(substring(md5(concat_ws(' ', slice(tokens, i + 1, $w))), 1, 15), 16, 10) as bigint))""".stripMargin))
        .as("gh"))

  private[graft] def ddSpanCoverageGrams(grams: DataFrame): DataFrame = {
    val dfreq = grams.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("docs_with"))
    grams.join(dfreq, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("docs_with") >= 2, 1L).otherwise(0L)).as("dup_windows"))
      .withColumn("dup_fraction",
        col("dup_windows").cast("double") / col("n_windows"))
      .select("doc_id", "n_windows", "dup_windows", "dup_fraction")
      .orderBy("doc_id")
  }

  /** Canonical selection across a duplicate cluster (the "keep the
    * best copy" step of a multi-source corpus merge): every member of
    * a near-dup cluster (dd05's connected components) is scored by a
    * deterministic quality signal (uniq-token ratio of the RAW text —
    * copies that normalize identically can still differ in casing /
    * punctuation), and the cluster keeps its argmax (ties → lowest
    * doc_id). Scale shape: the argmax is max(struct(score, -doc_id))
    * — a map-side-combined aggregate joined back on the cluster key,
    * never a window over a possibly-100M-member boilerplate cluster
    * (the same discipline as dd05's cluster sizes). */
  def ddCanonicalPick(s: SparkSession, d: String): DataFrame = {
    // the memoized label frame directly — not ddComponents, whose
    // cluster-size aggregate+join would ride along only to be pruned.
    // Tokenization happens AFTER the join so the (expensive) text scan
    // is confined to cluster members, and the agg+join-back's double
    // reference re-tokenizes members only, never the whole corpus.
    val scored = ccLabels(s, d).join(documents(s, d), "doc_id")
      .withColumn("tokens", expr(TextOps.tokensExpr))
      .select(col("doc_id"), col("canonical_doc"),
        (size(array_distinct(col("tokens"))).cast("double")
          / size(col("tokens"))).as("uniq_ratio"))
    val best = scored.groupBy("canonical_doc")
      .agg(max(struct(col("uniq_ratio"), (-col("doc_id")).as("neg_id"))).as("b"))
      .select(col("canonical_doc"), (-col("b.neg_id")).as("best_doc"))
    scored.join(best, "canonical_doc")
      .select(col("doc_id"), col("canonical_doc").as("cluster"),
        col("best_doc"), (col("doc_id") === col("best_doc")).as("kept"),
        col("uniq_ratio"))
      .orderBy("doc_id")
  }

  /** dd12 — INCREMENTAL delta-vs-index dedup (the production shape:
    * a continuously-ingesting corpus never re-dedups its history —
    * the daily batch is checked against a PERSISTED shingle index of
    * everything already accepted, cf. the incremental MinHashLSH
    * discipline in CCNet/RefinedWeb-style pipelines and maha's
    * incremental-rollup stance generally). The corpus is split
    * deterministically: docs with doc_id % 10 == 9 are "today's
    * batch" (the delta), the rest are the accepted history. Every
    * delta doc gets a verdict row: is it a near-dup (exact 5-gram
    * Jaccard ≥ 0.5) of ANY history doc, and if so which history doc
    * matches best (ties → lowest doc_id).
    *
    * Scale shape — why this is the 100 TB path while dd02 is not:
    * the join is delta-postings ⋈ history-index on the shingle key,
    * so per-batch cost is O(|delta postings| · capped-df), NOT
    * O(corpus²) and NOT even O(corpus): history is touched only
    * through index lookups on the delta's own shingles. The
    * hot-shingle df cap is computed ON THE INDEX side at build time
    * (the cap statistic is part of the persisted artifact, exactly
    * where a production index stores it) and applied with the same
    * broadcast anti-join as dd02; it is one-sided — capping can only
    * drop borderline matches, never admit a false one — and the
    * default sits above the test corpus's max df, so oracle parity
    * is exact there. The delta side needs no cap: with the index
    * capped, a delta shingle fans out at most `cap` index rows, and
    * there is no pair-explode stage at all. The best-match argmax is
    * a per-delta-doc window over candidates that passed the ≥ 0.5
    * verify — O(matches), not O(candidates). */
  def ddIncremental(s: SparkSession, d: String): DataFrame =
    ddIncrementalFrom(documents(s, d), shingled(s, d), DefaultMaxShingleDf)

  private[graft] def ddIncrementalFrom(docs: DataFrame, sh: DataFrame,
      maxDf: Int): DataFrame = {
    val isDelta = pmod(col("doc_id"), lit(10)) === 9
    // index build (one-time in production; the memoized shingle frame
    // is shared with dd02/dd03, so the split re-reads a cached stage)
    val exh = sh.filter(!isDelta).select(col("doc_id").as("hid"),
      size(col("shingles")).cast("bigint").as("nh"),
      explode(col("shingles")).as("s"))
    val hot = exh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("s")
    val index = exh.join(broadcast(hot), Seq("s"), "left_anti")
    // the daily batch probes the index on its own shingles only
    val exd = sh.filter(isDelta).select(col("doc_id").as("did"),
      size(col("shingles")).cast("bigint").as("nd"),
      explode(col("shingles")).as("s"))
    val matches = exd.join(index, "s")
      .groupBy("did", "hid", "nd", "nh").agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double")
        / (col("nd") + col("nh") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    // best match per delta doc = argmax by (jaccard DESC, hid ASC) —
    // a map-side-combined max(struct(jaccard, -hid)) aggregate, not a
    // per-did rank window: each partition reduces to one candidate
    // per did before the shuffle (dd07's argmax discipline)
    val best = matches
      .groupBy("did")
      .agg(max(struct(col("jaccard"), (-col("hid")).as("nh_neg"))).as("b"))
      .select(col("did"), (-col("b.nh_neg")).as("best_match"),
        col("b.jaccard").as("best_jaccard"))
    docs.filter(isDelta).select(col("doc_id"))
      .join(best, col("doc_id") === col("did"), "left")
      .select(col("doc_id"), col("did").isNotNull.as("is_dup"),
        col("best_match"), col("best_jaccard"))
      .orderBy("doc_id")
  }

  /** dd13 — fuzzy string self-join via symmetric-delete blocking (the
    * SymSpell / FastSS construction, public domain since Bocek et al.
    * 2007 "Fast Similarity Search in Large Dictionaries"): every name
    * emits itself plus its |name| delete-one-char variants as join
    * keys; two strings within edit distance 1 PROVABLY share a key
    * (substitution → both delete position i; insertion/deletion → the
    * longer's delete equals the shorter itself), so the equi-join on
    * variants has COMPLETE recall at d ≤ 1 with zero all-pairs work —
    * entity-resolution blocking for name/title/URL matching in a
    * curation pipeline, where an n² levenshtein over 10⁹ strings is
    * unthinkable but O(n·L) candidate keys shuffle fine. Candidates
    * then verify with the exact codegen'd `levenshtein` and dedupe.
    * Block sizes are bounded by construction (a delete variant is
    * shared only by strings within one edit of each other at equal-ish
    * length); the reference has no fuzzy matching at all — its DECODE/
    * lookup joins are exact-key only. The oracle replays the identical
    * variant generation + verification in SQL. */
  def ddFuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val names = graft.core.Tables.customer(s, d)
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("id"), lower(col("c_name")).as("name"))
    // keys = the name itself ∪ its delete-1 variants (pure codegen:
    // transform over sequence, no UDF)
    val variants = expr(
      """transform(sequence(1, length(name)),
        |  i -> concat(substring(name, 1, i - 1),
        |              substring(name, i + 1, length(name))))""".stripMargin)
    val keys = names.select(col("id"), col("name"),
      explode(concat(array(col("name")), variants)).as("key"))
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("a.name").as("a_name"),
        col("b.id").as("b_id"), col("b.name").as("b_name"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 1)
      .select(col("a_id"), col("b_id"), col("dist").cast("bigint").as("dist"))
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd13_fuzzy_join" -> (ddFuzzyJoin _),
    "dd02_ngram_jaccard" -> (ddNgramJaccard _),
    "dd10_containment" -> (ddContainment _),
    "dd03_minhash_lsh" -> (ddMinhashLsh _),
    "dd04_simhash" -> (ddSimhash _),
    "dd05_components" -> (ddComponents _),
    "dd06_passage_dedup" -> (ddPassageDedup _),
    "dd07_canonical_pick" -> (ddCanonicalPick _),
    "dd11_span_coverage" -> (ddSpanCoverage _),
    "dd12_incremental" -> (ddIncremental _),
  )

  /** Shared oracle CTEs for dd05/dd07: shingles → verified Jaccard
    * pairs → undirected edges → transitive closure (`reach`) →
    * per-doc cluster label `lab(doc_id, canonical_doc)`. Also leaves
    * `tok` in scope for quality scoring. */
  private val ccClosureCtes: String =
    """tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') t FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 4),
      |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) shingles
      |       FROM tok WHERE len(t) >= 5),
      |ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
      |hot AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) > __MAXDF__),
      |cap AS (SELECT doc_id, s FROM ex WHERE s NOT IN (SELECT s FROM hot)),
      |cand AS (SELECT a.doc_id x, b.doc_id y, COUNT(*) inter
      |         FROM cap a JOIN cap b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (SELECT x, y FROM cand
      |          JOIN sh sa ON sa.doc_id = x JOIN sh sb ON sb.doc_id = y
      |          WHERE CAST(inter AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - inter) >= 0.2),
      |e AS (SELECT x a, y b FROM pairs UNION SELECT y, x FROM pairs),
      |reach(a, b) AS (SELECT a, b FROM e
      |                UNION
      |                SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
      |lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_doc
      |        FROM reach GROUP BY a)""".stripMargin
      .replace("__MAXDF__", DefaultMaxShingleDf.toString)

  /** DuckDB replica of [[simhashSignatures]]+[[ddSimhash]]: identical
    * md5-derived token bits, identical vote rule, brute-force pairs
    * (the band blocking is lossless for Hamming ≤ 3, so the blocked
    * join's output EQUALS the all-pairs set — what this SQL computes). */
  private def simhashOracleSql: String = {
    val sums = ((0 until 32).map(b => s"sum((hi >> $b) & 1) AS h$b") ++
      (0 until 32).map(b => s"sum((lo >> $b) & 1) AS l$b")).mkString(", ")
    def sig(p: String) = (0 until 32).map(b =>
      s"(CASE WHEN 2 * $p$b >= n THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+'))) AS t FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
       |              ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo FROM tok),
       |v AS (SELECT doc_id, count(*) AS n, $sums FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, ${sig("h")} AS hi_sig, ${sig("l")} AS lo_sig FROM v)
       |SELECT a.doc_id AS x, b.doc_id AS y,
       | CAST(bit_count(xor(a.hi_sig, b.hi_sig)) + bit_count(xor(a.lo_sig, b.lo_sig)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.hi_sig, b.hi_sig)) + bit_count(xor(a.lo_sig, b.lo_sig)) <= 3
       |ORDER BY x, y""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // dd13 replays the symmetric-delete blocking + exact levenshtein
    // verification; the idx series is constant (names are bounded),
    // filtered to each name's true length
    // dd13's declared distance is CODEPOINT levenshtein (Spark's
    // native semantics); DuckDB's levenshtein counts BYTES (corpus-
    // fuzz r17 finding: 'cafe'→'café' is 1 codepoint edit but 2 byte
    // edits). The oracle folds the fuzz corpus's non-ASCII alphabet
    // to single-byte sentinels before the distance call, making the
    // byte count equal the codepoint count; on ASCII corpora (the
    // driver's fixed customer table) the fold is the identity.
    "dd13_fuzzy_join" ->
      """WITH folded AS (
        |  SELECT c_custkey AS id,
        |    replace(replace(lower(c_name), 'é', chr(1)), 'è', chr(2))
        |      AS name FROM customer
        |  WHERE c_custkey <= 300),
        |names AS (
        |  -- GUARD: the fold table must cover the generator's whole
        |  -- non-ASCII alphabet — a codepoint it misses would silently
        |  -- revert this oracle to byte-counted levenshtein (DuckDB
        |  -- counts bytes, the engine counts codepoints). Fail LOUDLY
        |  -- instead of drifting.
        |  SELECT id, CASE WHEN length(name) = strlen(name)
        |    THEN name ELSE error('dd13 oracle: fold missed a ' ||
        |      'non-ASCII codepoint in c_name — extend the fold table '
        |      || 'to match the generator alphabet') END AS name
        |  FROM folded),
        |idx AS (SELECT i FROM generate_series(1, 64) t(i)),
        |keys AS (
        |  SELECT id, name, name AS key FROM names
        |  UNION ALL
        |  SELECT id, name,
        |    substr(name, 1, CAST(i - 1 AS INTEGER)) ||
        |    substr(name, CAST(i + 1 AS INTEGER)) AS key
        |  FROM names CROSS JOIN idx WHERE i <= length(name)),
        |cand AS (
        |  SELECT DISTINCT a.id AS a_id, a.name AS a_name,
        |    b.id AS b_id, b.name AS b_name
        |  FROM keys a JOIN keys b ON a.key = b.key AND a.id < b.id)
        |SELECT a_id, b_id,
        |  CAST(levenshtein(a_name, b_name) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(a_name, b_name) <= 1
        |ORDER BY a_id, b_id""".stripMargin,
    "dd06_passage_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') toks FROM documents),
        |pas AS (SELECT doc_id, unnest(list_transform(range(0, (len(toks) - 1) // 32 + 1),
        |          i -> md5(array_to_string(toks[(i * 32 + 1):((i + 1) * 32)], ' ')))) fp
        |        FROM tok),
        |cnt AS (SELECT fp, COUNT(*) c FROM pas GROUP BY fp),
        |per AS (SELECT p.doc_id, COUNT(*) n_passages,
        |          SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) n_dup
        |        FROM pas p JOIN cnt USING (fp) GROUP BY p.doc_id)
        |SELECT doc_id, CAST(n_passages AS BIGINT) n_passages,
        |  CAST(n_dup AS BIGINT) n_dup_passages,
        |  CAST(n_dup AS DOUBLE) / n_passages AS dup_frac
        |FROM per ORDER BY doc_id""".stripMargin,
    // dd11: sliding 20-token windows as md5 digests (identical digest
    // both engines), cross-document df, per-doc position-weighted
    // coverage — SUM(CASE) is HUGEINT in DuckDB, cast to match Spark
    "dd11_span_coverage" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 19),
        |        i -> ('0x' || substr(md5(array_to_string(t[i:i+19], ' ')), 1, 15))::BIGINT)) gh
        |      FROM tok WHERE len(t) >= 20),
        |dfreq AS (SELECT gh, COUNT(DISTINCT doc_id) dw FROM g GROUP BY gh)
        |SELECT g.doc_id, COUNT(*) AS n_windows,
        |  CAST(SUM(CASE WHEN dfreq.dw >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows,
        |  CAST(SUM(CASE WHEN dfreq.dw >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_fraction
        |FROM g JOIN dfreq USING (gh)
        |GROUP BY 1 ORDER BY g.doc_id""".stripMargin,
    "dd04_simhash" -> simhashOracleSql,
    // dd12: dd02's shingle CTEs split into history (doc_id%10<>9) and
    // delta (doc_id%10=9); best history match per delta doc by
    // (jaccard DESC, hid ASC); every delta doc gets a verdict row
    "dd12_incremental" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 4),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) shingles
        |       FROM tok WHERE len(t) >= 5),
        |exh AS (SELECT doc_id hid, len(shingles) nh, unnest(shingles) s FROM sh WHERE doc_id % 10 <> 9),
        |hot AS (SELECT s FROM exh GROUP BY s HAVING COUNT(*) > __MAXDF__),
        |idx AS (SELECT hid, nh, s FROM exh WHERE s NOT IN (SELECT s FROM hot)),
        |exd AS (SELECT doc_id did, len(shingles) nd, unnest(shingles) s FROM sh WHERE doc_id % 10 = 9),
        |m AS (SELECT did, hid, nd, nh, COUNT(*) inter
        |      FROM exd JOIN idx USING (s) GROUP BY 1, 2, 3, 4),
        |j AS (SELECT did, hid, CAST(inter AS DOUBLE) / (nd + nh - inter) jac FROM m
        |      WHERE CAST(inter AS DOUBLE) / (nd + nh - inter) >= 0.5),
        |best AS (SELECT did, hid, jac FROM (
        |           SELECT did, hid, jac,
        |             ROW_NUMBER() OVER (PARTITION BY did ORDER BY jac DESC, hid ASC) rn
        |           FROM j) WHERE rn = 1)
        |SELECT d.doc_id, (best.did IS NOT NULL) AS is_dup,
        |  best.hid AS best_match, best.jac AS best_jaccard
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 9) d
        |LEFT JOIN best ON best.did = d.doc_id
        |ORDER BY d.doc_id""".stripMargin
        .replace("__MAXDF__", DefaultMaxShingleDf.toString),
    // the df-cap is MIRRORED (hot/cap CTEs): on heavy-tail corpora
    // (data/sf1skew's planted boilerplate) the engine's hot-shingle
    // drop ENGAGES, and an uncapped oracle diverges — intersections
    // count capped postings only, set sizes stay UNCAPPED, exactly
    // the engine's one-sided semantics (found by the r18 skew run:
    // 33858 vs 38984 rows)
    "dd02_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 4),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) shingles
        |       FROM tok WHERE len(t) >= 5),
        |ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
        |hot AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) > __MAXDF__),
        |cap AS (SELECT doc_id, s FROM ex WHERE s NOT IN (SELECT s FROM hot)),
        |cand AS (SELECT a.doc_id x, b.doc_id y, COUNT(*) inter
        |         FROM cap a JOIN cap b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT x, y, inter, len(sa.shingles) AS nx, len(sb.shingles) AS ny,
        | CAST(inter AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - inter) AS jaccard
        |FROM cand
        |JOIN sh sa ON sa.doc_id = x
        |JOIN sh sb ON sb.doc_id = y
        |WHERE CAST(inter AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - inter) >= 0.2
        |ORDER BY x, y""".stripMargin
        .replace("__MAXDF__", DefaultMaxShingleDf.toString),
    // dd02's intersection with the asymmetric divisor: ordered pairs,
    // containment = inter / |contained side's shingle set|
    // df-cap mirrored; dd10's divisor is the CAPPED per-doc posting
    // count (hot shingles leave numerator and denominator together —
    // the engine's documented asymmetric-containment semantics)
    "dd10_containment" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 4),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) shingles
        |       FROM tok WHERE len(t) >= 5),
        |ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
        |hot AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) > __MAXDF__),
        |cap AS (SELECT doc_id, s FROM ex WHERE s NOT IN (SELECT s FROM hot)),
        |sz AS (SELECT doc_id, COUNT(*) n FROM cap GROUP BY doc_id),
        |cand AS (SELECT a.doc_id cx, b.doc_id cy, COUNT(*) inter
        |         FROM cap a JOIN cap b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT cx AS contained_id, cy AS container_id, inter,
        |  CAST(sz.n AS BIGINT) AS n_contained,
        |  CAST(inter AS DOUBLE) / sz.n AS containment
        |FROM cand
        |JOIN sz ON sz.doc_id = cx
        |WHERE CAST(inter AS DOUBLE) / sz.n >= 0.8
        |ORDER BY contained_id, container_id""".stripMargin
        .replace("__MAXDF__", DefaultMaxShingleDf.toString),
    // same pair derivation as dd02, then a recursive transitive
    // closure: comp(a) = min over everything reachable from a — the
    // declarative ground truth for the star-contraction algorithm
    "dd05_components" ->
      s"""WITH RECURSIVE $ccClosureCtes
         |SELECT doc_id, canonical_doc,
         |  COUNT(*) OVER (PARTITION BY canonical_doc) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin,
    // dd05's transitive closure + the raw-text quality score + a
    // per-cluster argmax (ratio DESC, doc_id ASC — the same order as
    // max(struct(uniq_ratio, -doc_id)))
    "dd07_canonical_pick" ->
      s"""WITH RECURSIVE $ccClosureCtes,
         |q AS (SELECT doc_id,
         |  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS uniq_ratio FROM tok),
         |sc AS (SELECT l.doc_id, l.canonical_doc, q.uniq_ratio
         |       FROM lab l JOIN q USING (doc_id)),
         |best AS (SELECT canonical_doc, doc_id AS best_doc FROM (
         |  SELECT canonical_doc, doc_id,
         |    row_number() OVER (PARTITION BY canonical_doc
         |      ORDER BY uniq_ratio DESC, doc_id) rn FROM sc) t WHERE rn = 1)
         |SELECT sc.doc_id, sc.canonical_doc AS cluster, best.best_doc,
         |  sc.doc_id = best.best_doc AS kept, sc.uniq_ratio
         |FROM sc JOIN best USING (canonical_doc) ORDER BY sc.doc_id""".stripMargin,
    // the exact-Jaccard≥0.5 pair set: equals dd03's output because the
    // LSH verify step admits only exact-J≥0.5 pairs and the banding's
    // recall on this corpus is complete (see ddMinhashLsh scaladoc)
    "dd03_minhash_lsh" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 4),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) shingles
        |       FROM tok WHERE len(t) >= 5),
        |ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
        |cand AS (SELECT a.doc_id x, b.doc_id y, COUNT(*) inter
        |         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT x, y,
        | CAST(inter AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - inter) AS jaccard
        |FROM cand
        |JOIN sh sa ON sa.doc_id = x
        |JOIN sh sb ON sb.doc_id = y
        |WHERE CAST(inter AS DOUBLE) / (len(sa.shingles) + len(sb.shingles) - inter) >= 0.5
        |ORDER BY x, y""".stripMargin,
  )
}
