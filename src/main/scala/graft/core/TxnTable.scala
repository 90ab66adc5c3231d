package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write table with a versioned manifest — the lakehouse
  * transaction-log pattern in miniature, built for the two mutations a
  * 100 TB training-data platform cannot avoid: key deletion (GDPR /
  * takedown: "remove every row of these users") and upsert (late
  * corrections). Plain parquet directories can only append; rewriting
  * the whole table for a thousand deleted keys is a non-starter at
  * scale.
  *
  * Mechanics:
  *  - data lives in immutable commit directories
  *    (`files/<commit-uuid>/part-*.parquet`) — nothing is ever
  *    modified in place;
  *  - each version is a `manifest-v<N>.json` listing its live files;
  *    the manifest write is atomic (temp + rename), so readers see
  *    version N or N+1, never a torn state — SNAPSHOT ISOLATION, and
  *    reading an older manifest is TIME TRAVEL for free;
  *  - a mutation rewrites ONLY the files whose footer [min,max] on
  *    the key column can contain an affected key
  *    ([[Layout.statsForFiles]] — the same stats scans prune by), so
  *    a delete of k keys touches O(files-containing-k), not O(table);
  *    untouched files carry over into the new manifest BY REFERENCE;
  *  - [[vacuum]] physically deletes files no live manifest references.
  *
  * The key set rides the driver (a takedown batch is thousands of ids
  * — request metadata, not data). A key set too large for the driver
  * would flip the pruning to a broadcast semi-join against per-file
  * ranges; same plan shape, different carrier. At production file
  * counts the per-file stats would be written INTO the manifest at
  * commit time (the Delta-style stats channel) instead of re-read
  * from footers on every mutation — same numbers, O(1) manifest read
  * instead of an O(files) footer walk. Concurrent WRITERS are out of
  * scope (single-writer, like the reference's ingestion pipelines);
  * readers are isolated by the manifest.
  */
object TxnTable {

  private def fileOf(dir: String, name: String) = new java.io.File(dir, name)

  private def manifests(dir: String): Seq[(Int, java.io.File)] = {
    val pat = """manifest-v(\d+)\.json""".r
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName match {
        case pat(v) => Some((v.toInt, f))
        case _ => None
      }).sortBy(_._1)
  }

  /** Latest committed version, or the explicit one. */
  def version(dir: String): Int =
    manifests(dir).lastOption.map(_._1).getOrElse(
      sys.error(s"no manifest under $dir"))

  /** Live file list (relative paths) of `v` (default: latest). */
  def liveFiles(dir: String, v: Int = -1): Seq[String] = {
    val ms = manifests(dir)
    val f = (if (v < 0) ms.lastOption
             else ms.find(_._1 == v)).getOrElse(
      sys.error(s"no manifest v$v under $dir"))._2
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // one relative path per line between the brackets
    txt.split('\n').map(_.trim.stripPrefix("\"").stripSuffix(",")
        .stripSuffix("\"")).filter(s => s.nonEmpty && s != "[" && s != "]")
      .toSeq
  }

  private def writeManifest(dir: String, v: Int, files: Seq[String]): Unit = {
    val body = files.map("\"" + _ + "\"").mkString("[\n", ",\n", "\n]")
    val tmp = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(dir), s".manifest-v$v", ".tmp")
    java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, fileOf(dir, s"manifest-v$v.json").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Write `df` as one immutable commit dir; returns its files'
    * RELATIVE paths. `numFiles <= 0` keeps the frame's own
    * partitioning (a caller-supplied range/Z layout — repartitioning
    * would scatter the clustering the stats pruning depends on). */
  private def commitFiles(s: SparkSession, dir: String, df: DataFrame,
      numFiles: Int): Seq[String] = {
    val commit = java.util.UUID.randomUUID().toString
    val out = s"$dir/files/$commit"
    (if (numFiles > 0) df.repartition(numFiles) else df).write.parquet(out)
    Option(new java.io.File(out).listFiles()).getOrElse(Array.empty).toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"files/$commit/${f.getName}")
  }

  /** Create the table at `dir` from `df` as version 1. */
  def init(s: SparkSession, dir: String, df: DataFrame,
      numFiles: Int = 8): Unit = {
    new java.io.File(dir).mkdirs()
    writeManifest(dir, 1, commitFiles(s, dir, df, numFiles))
  }

  /** Snapshot read of `v` (default: latest). mergeSchema unions the
    * commit schemas — SCHEMA EVOLUTION: an upsert may carry columns
    * the older commits lack (rows from before the column existed read
    * as null), so a table can grow columns without rewriting history. */
  def read(s: SparkSession, dir: String, v: Int = -1): DataFrame =
    s.read.option("mergeSchema", "true")
      .parquet(liveFiles(dir, v).map(rel => s"$dir/$rel"): _*)

  /** Which live files can contain any of `keys` on `keyCol`, by
    * footer stats — the rewrite set. */
  private def matchedFiles(s: SparkSession, dir: String, keyCol: String,
      keys: Seq[Long]): (Seq[String], Seq[String]) = {
    val sorted = keys.sorted.toArray
    def anyKeyIn(lo: Long, hi: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(sorted, lo)
      val from = if (i >= 0) i else -i - 1
      from < sorted.length && sorted(from) <= hi
    }
    val live = liveFiles(dir)
    val stats = Layout.statsForFiles(s, live.map(rel => s"$dir/$rel"), keyCol)
    val matchedAbs = stats.filter { case (_, lo, hi) => anyKeyIn(lo, hi) }
      .map(_._1).toSet
    live.partition(rel => matchedAbs.contains(s"$dir/$rel"))
  }

  /** Delete every row whose `keyCol` is in `keys`: rewrite only the
    * stat-matched files, carry the rest by reference, commit one new
    * manifest version. Returns the number of files rewritten. */
  def deleteKeys(s: SparkSession, dir: String, keyCol: String,
      keys: Seq[Long], numFiles: Int = 4): Int = {
    val (matched, untouched) = matchedFiles(s, dir, keyCol, keys)
    if (matched.isEmpty) return 0
    val kept = s.read.parquet(matched.map(rel => s"$dir/$rel"): _*)
      .filter(!col(keyCol).isin(keys: _*))
    val fresh = commitFiles(s, dir, kept, math.min(numFiles, matched.size))
    writeManifest(dir, version(dir) + 1, untouched ++ fresh)
    matched.size
  }

  /** Upsert: rows of `updates` replace same-key rows (delete + insert
    * in ONE committed version — readers never see the gap). */
  def upsert(s: SparkSession, dir: String, keyCol: String,
      updates: DataFrame, numFiles: Int = 4): Unit = {
    val keys = updates.select(col(keyCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val (matched, untouched) = matchedFiles(s, dir, keyCol, keys)
    val survivors =
      if (matched.isEmpty) Nil
      else commitFiles(s, dir,
        s.read.parquet(matched.map(rel => s"$dir/$rel"): _*)
          .filter(!col(keyCol).isin(keys: _*)),
        math.min(numFiles, matched.size))
    val inserted = commitFiles(s, dir, updates, numFiles)
    writeManifest(dir, version(dir) + 1, untouched ++ survivors ++ inserted)
  }

  /** OPTIMIZE: rewrite the whole live set as one freshly clustered
    * commit — range-clustered on `zcols.head` when one column is
    * given, Z-ordered ([[Layout]]) for several — and commit it as a
    * new version. Copy-on-write mutations hash-scatter their rewrite
    * commits, so pruning quality decays with every delete/upsert;
    * this is the scheduled re-clustering pass that restores it (the
    * lakehouse `OPTIMIZE [ZORDER BY]`). Old files stay until
    * [[vacuum]]; readers on the prior version are unaffected. */
  def optimize(s: SparkSession, dir: String, zcols: Seq[String],
      numFiles: Int = 8): Unit = {
    val live = read(s, dir)
    val clustered =
      if (zcols.size == 1)
        live.repartitionByRange(numFiles, col(zcols.head))
          .sortWithinPartitions(zcols.head)
      else
        live.withColumn("__z", Layout.zValueFor(live, zcols))
          .repartitionByRange(numFiles, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
    writeManifest(dir, version(dir) + 1,
      commitFiles(s, dir, clustered, numFiles = 0))
  }

  /** Incremental compaction: bin-pack ONLY the live files smaller
    * than `minBytes` into `numFiles` fresh files; files already at
    * target size carry over by reference. This is the compaction a
    * streaming ingest actually schedules — each trigger lands small
    * commits, and rewriting the whole table per sweep ([[optimize]])
    * would be O(table) per trigger interval; this sweep is O(recent
    * small files). Returns how many small files were packed. */
  def compactSmall(s: SparkSession, dir: String, minBytes: Long,
      numFiles: Int = 1): Int = {
    val live = liveFiles(dir)
    val (small, big) = live.partition(rel =>
      new java.io.File(dir, rel).length() < minBytes)
    if (small.size <= numFiles) return 0 // nothing worth packing
    val packed = commitFiles(s, dir,
      s.read.option("mergeSchema", "true")
        .parquet(small.map(rel => s"$dir/$rel"): _*),
      numFiles)
    writeManifest(dir, version(dir) + 1, big ++ packed)
    small.size
  }

  /** Physically delete files referenced by NO manifest ≥
    * `keepSince` and drop the older manifests — the retention sweep
    * that bounds storage after many copy-on-write commits. */
  def vacuum(dir: String, keepSince: Int): Unit = {
    val ms = manifests(dir)
    val (drop, keep) = ms.partition(_._1 < keepSince)
    require(keep.nonEmpty, s"vacuum would drop every manifest in $dir")
    val referenced = keep.flatMap { case (v, _) => liveFiles(dir, v) }.toSet
    val root = new java.io.File(dir, "files")
    for {
      commit <- Option(root.listFiles()).getOrElse(Array.empty)
      f <- Option(commit.listFiles()).getOrElse(Array.empty)
      if f.getName.endsWith(".parquet")
      if !referenced.contains(s"files/${commit.getName}/${f.getName}")
    } { f.delete(); () }
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(c => Option(c.listFiles()).forall(_.forall(!_.getName.endsWith(".parquet"))))
      .foreach(c => TempDirs.rmTree(c))
    drop.foreach(_._2.delete())
  }
}
