package graft

import graft.tools.CorpusGen.Doc

/** PLAIN-SCALA reference implementations of the tx/dd/sp/mm battery —
  * the in-CI duals for the generated-corpus differential program
  * (CorpusFuzzSpec). Each function recomputes a query's declared
  * semantics from first principles on the driver (corpora are ~140
  * docs), sharing NO code with the Spark operators: different
  * substrate (plain collections vs DataFrames), different hashing
  * call sites, different traversal order. The only shared artifacts
  * are the declared semantics themselves (tokenizer class, md5
  * derivations, fixed-point quantization) — which is the point: a
  * logic change on either side breaks the agreement.
  *
  * Rows come back as ordered Seq[(colName, value)] matching each
  * query's ORDER BY; doubles are compared with tolerance by the spec
  * (the bit-exact layer is the offline DuckDB run).
  */
object CorpusDuals {

  type Row = Seq[(String, Any)]

  // ---- shared primitive semantics ----------------------------------

  /** Spark `trim` strips ASCII space only (not \t\n, not NBSP). */
  def trimSpaces(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  /** Spark split(trim(text), '\\s+') — limit -1 keeps trailing empty
    * tokens (unlike bare Java split), matching DuckDB
    * string_split_regex. */
  def toks(text: String): Vector[String] =
    trimSpaces(text).split("\\s+", -1).toVector

  def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** ('0x' || substr(md5(s), 1, n))::BIGINT, n <= 15. */
  def md5Long(s: String, n: Int): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, n), 16)

  /** UTF-8 binary string ordering (Spark/DuckDB default collation) —
    * differs from String.compareTo for supplementary characters. */
  val utf8Ord: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    var r = 0
    while (r == 0 && i < n) { r = (x(i) & 255) - (y(i) & 255); i += 1 }
    if (r != 0) r else x.length - y.length
  }

  /** Codepoint count — Spark length() semantics. */
  def cpLen(s: String): Int = s.codePointCount(0, s.length)

  def utf8Len(s: String): Int = s.getBytes("UTF-8").length

  /** Interpolated quantile (quantile_cont) over a non-empty sorted
    * sequence. */
  def quantileCont(sorted: Vector[Double], q: Double): Double = {
    val h = (sorted.length - 1) * q
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  def shingles5(t: Vector[String]): Vector[String] =
    if (t.length < 5) Vector.empty
    else (0 to t.length - 5).map(i => t.slice(i, i + 5).mkString(" "))
      .distinct.toVector

  private def bitLen(c: Long): Int =
    java.lang.Long.toBinaryString(c).length

  private val stop6 = Set("the", "a", "of", "and", "to", "in")

  // ---- tx ----------------------------------------------------------

  def tx01(docs: Seq[Doc]): Seq[Row] = docs.sortBy(_.docId).map { d =>
    val t = toks(d.text)
    val len = cpLen(d.text)
    val punct = d.text.codePoints().toArray
      .count(c => ".,!?;:".indexOf(c) >= 0)
    Seq(
      "doc_id" -> d.docId, "n_chars" -> d.nChars,
      "len_actual" -> len.toLong, "n_tokens" -> t.length.toLong,
      "n_uniq_tokens" -> t.distinct.length.toLong,
      "uniq_ratio" -> t.distinct.length.toDouble / t.length,
      "avg_token_len" -> t.map(cpLen).sum.toDouble / t.length,
      "punct_ratio" -> (if (len == 0) null else punct.toDouble / len),
      "stopword_ratio" -> t.count(stop6).toDouble / t.length)
  }

  def tx02(docs: Seq[Doc]): Seq[Row] = {
    val en = Set("the", "a", "of", "and", "is")
    val fr = Set("le", "la", "et", "est", "un")
    val de = Set("der", "die", "und", "ist", "ein")
    val es = Set("el", "los", "es", "una", "que")
    docs.map { d =>
      val t = toks(d.text)
      val (se, sf, sd, ss) = (t.count(en), t.count(fr), t.count(de), t.count(es))
      val p =
        if (se >= sf && se >= sd && se >= ss && se > 0) "en"
        else if (sf >= sd && sf >= ss && sf > 0) "fr"
        else if (sd >= ss && sd > 0) "de"
        else if (ss > 0) "es" else "und"
      (d.lang, p)
    }.groupBy(identity).toSeq
      .map { case ((l, p), xs) => (l, p, xs.size.toLong) }
      .sortBy { case (l, p, _) => (l, p) }
      .map { case (l, p, n) =>
        Seq("lang" -> l, "predicted_lang" -> p, "n" -> n) }
  }

  def tx03(docs: Seq[Doc]): Seq[Row] =
    docs.flatMap(d => toks(d.text)).groupBy(identity).toSeq
      .map { case (t, xs) => (t, xs.size.toLong) }
      .sortBy { case (t, n) => (-n, t) }(
        Ordering.Tuple2(Ordering.Long, utf8Ord))
      .take(20)
      .map { case (t, n) => Seq("token" -> t, "n" -> n) }

  def normFingerprint(text: String): String = {
    val lowered = text.toLowerCase
    val stripped = lowered.codePoints().toArray.collect {
      case c if (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ' =>
        c.toChar
    }.mkString
    md5hex(trimSpaces(stripped.replaceAll(" +", " ")))
  }

  def tx04(docs: Seq[Doc]): Seq[Row] = docs.sortBy(_.docId).map(d =>
    Seq("doc_id" -> d.docId, "fingerprint" -> normFingerprint(d.text)))

  def tx05(docs: Seq[Doc]): Seq[Row] = docs.sortBy(_.docId).map { d =>
    val m = java.util.regex.Pattern
      .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]").matcher(d.text)
    val pieces = Iterator.continually(m.find()).takeWhile(identity)
      .map(_ => m.group()).toVector
    val len = cpLen(d.text)
    Seq("doc_id" -> d.docId, "n_pieces" -> pieces.length.toLong,
      "n_alpha" -> pieces.count(_.matches("[A-Za-z]+")).toLong,
      "n_digit" -> pieces.count(_.matches("[0-9]+")).toLong,
      "n_punct" -> pieces.count(p =>
        !p.headOption.exists(c =>
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9'))).toLong,
      "pieces_per_char" ->
        (if (len == 0) null else pieces.length.toDouble / len))
  }

  def tx06(docs: Seq[Doc]): Seq[Row] = docs.sortBy(_.docId).map { d =>
    val t = toks(d.text)
    val cnt = t.groupBy(identity).map(_._2.size)
    val bigrams = if (t.length < 2) Vector.empty
      else (0 until t.length - 1).map(i => t(i) + " " + t(i + 1)).toVector
    val nb = bigrams.length.toLong
    val dup = nb - bigrams.distinct.length
    Seq("doc_id" -> d.docId, "n_tokens" -> t.length.toLong,
      "n_distinct_tokens" -> cnt.size.toLong,
      "top_token_n" -> cnt.max.toLong,
      "top_token_frac" -> cnt.max.toDouble / t.length,
      "dup_bigram_n" -> (if (nb == 0) 0L else dup),
      "dup_bigram_frac" ->
        (if (nb == 0) 0.0 else dup.toDouble / nb))
  }

  private val piiPat = java.util.regex.Pattern.compile(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" +
      "|\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b|\\b[0-9]{10}\\b" +
      "|\\b(?:customer|vector)\\b")

  def tx07(docs: Seq[Doc]): Seq[Row] = docs.sortBy(_.docId).map { d =>
    val m = piiPat.matcher(d.text)
    var n = 0L
    while (m.find()) n += 1
    Seq("doc_id" -> d.docId, "n_redacted" -> n,
      "scrubbed" -> piiPat.matcher(d.text).replaceAll("[REDACTED]"))
  }

  def tx08(docs: Seq[Doc]): Seq[Row] = {
    val sh = docs.map(d => d.docId -> shingles5(toks(d.text)))
      .filter(_._2.nonEmpty).toMap
    val bench = sh.filter(_._1 % 50 == 0).values.flatten.toSet
    docs.sortBy(_.docId)
      .filter(d => d.docId % 50 != 0 && sh.contains(d.docId))
      .map { d =>
        val grams = sh(d.docId)
        val hit = grams.count(bench).toLong
        Seq("doc_id" -> d.docId, "n_grams" -> grams.length.toLong,
          "n_contaminated" -> hit,
          "contamination_frac" -> hit.toDouble / grams.length)
      }
  }

  def tx09(docs: Seq[Doc]): Seq[Row] =
    docs.groupBy(_.lang).toSeq.sortBy(_._1).map { case (l, ds) =>
      val v = ds.map(_.nChars.toDouble).sorted.toVector
      Seq("lang" -> l, "q10" -> quantileCont(v, 0.1),
        "q50" -> quantileCont(v, 0.5), "q90" -> quantileCont(v, 0.9),
        "q99" -> quantileCont(v, 0.99), "n_docs" -> ds.size.toLong)
    }

  def tx10(docs: Seq[Doc]): Seq[Row] = {
    val all = docs.flatMap(d => toks(d.text).map(d.docId -> _))
    val rank = all.groupBy(_._2).toSeq
      .map { case (t, xs) => (t, xs.size) }
      .sortBy { case (t, n) => (-n.toLong, t) }(
        Ordering.Tuple2(Ordering.Long, utf8Ord))
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    all.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, xs) =>
      val rs = xs.map(x => rank(x._2))
      Seq("doc_id" -> id, "n_tokens" -> xs.size.toLong,
        "rank_sum" -> rs.sum,
        "mean_rank" -> rs.sum.toDouble / xs.size)
    }
  }

  def tx11(docs: Seq[Doc]): Seq[Row] = {
    val pairs = docs.flatMap { d =>
      val t = toks(d.text)
      if (t.length < 2) Nil
      else (0 until t.length - 1).map(i => (t(i), t(i + 1)))
    }
    pairs.groupBy(identity).toSeq
      .map { case ((l, r), xs) => (l, r, xs.size.toLong) }
      .sortBy { case (l, r, n) => (-n, l, r) }(
        Ordering.Tuple3(Ordering.Long, utf8Ord, utf8Ord))
      .take(8).zipWithIndex
      .map { case ((l, r, n), i) =>
        Seq("pair_rank" -> (i + 1L), "left_tok" -> l,
          "right_tok" -> r, "cnt" -> n) }
  }

  def tx12(docs: Seq[Doc]): Seq[Row] =
    docs.flatMap(d => toks(d.text).map(d.source -> _))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
        val cnt = xs.groupBy(_._2).map(_._2.size)
        val nTok = xs.size.toLong
        val hapax = cnt.count(_ == 1).toLong
        Seq("source" -> src, "n_tokens" -> nTok,
          "vocab_size" -> cnt.size.toLong, "n_hapax" -> hapax,
          "type_token_ratio" -> cnt.size.toDouble / nTok,
          "hapax_frac" -> hapax.toDouble / cnt.size)
      }

  def tx13(docs: Seq[Doc]): Seq[Row] =
    docs.groupBy(_.lang).toSeq.sortBy(_._1).map { case (l, ds) =>
      val v = ds.map(_.nChars.toDouble).sorted.toVector
      Seq("lang" -> l, "q50_exact" -> quantileCont(v, 0.5),
        "n_docs" -> ds.size.toLong, "estimate_ok" -> true)
    }

  def tx14(docs: Seq[Doc]): Seq[Row] = {
    val w = (0 until 1024)
      .map(b => b -> (md5Long("w" + b, 8) % 2001 - 1000)).toMap
    docs.sortBy(_.docId).map { d =>
      val t = toks(d.text)
      val ws = t.map(tok => w((md5Long(tok, 8) % 1024).toInt))
      Seq("doc_id" -> d.docId, "n_tokens" -> t.length.toLong,
        "score_raw" -> ws.sum,
        "score" -> ws.sum.toDouble / (t.length * 1000L).toDouble,
        "keep" -> (ws.sum > 0))
    }
  }

  /** (docId, nBigrams, lbSum) for docs with >= 2 tokens. */
  private def fluencyRows(docs: Seq[Doc]): Seq[(Long, Long, Long)] = {
    val bi = docs.flatMap { d =>
      val t = toks(d.text)
      if (t.length < 2) Nil
      else (0 until t.length - 1).map(i => (d.docId, t(i) + " " + t(i + 1)))
    }
    val cnt = bi.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    bi.groupBy(_._1).toSeq.map { case (id, xs) =>
      (id, xs.size.toLong, xs.map(x => bitLen(cnt(x._2)).toLong).sum)
    }
  }

  def tx15(docs: Seq[Doc]): Seq[Row] =
    fluencyRows(docs).sortBy(_._1).map { case (id, nb, lb) =>
      Seq("doc_id" -> id, "n_bigrams" -> nb, "lb_sum" -> lb,
        "fluency" -> lb.toDouble / nb)
    }

  def tx16(docs: Seq[Doc]): Seq[Row] =
    docs.flatMap(d => toks(d.text).map(d.source -> _))
      .groupBy(identity).toSeq
      .map { case ((s, t), xs) => (s, t, xs.size.toLong) }
      .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, xs) =>
        xs.sortBy { case (_, t, n) => (-n, t) }(
            Ordering.Tuple2(Ordering.Long, utf8Ord))
          .take(5).zipWithIndex.map { case ((_, t, n), i) =>
            Seq("source" -> src, "rank" -> (i + 1L), "token" -> t,
              "n" -> n)
          }
      }

  def tx17(docs: Seq[Doc]): Seq[Row] = {
    val lang = docs.map(d => d.docId -> d.lang).toMap
    val scored = fluencyRows(docs)
      .map { case (id, nb, lb) => (lang(id), lb.toDouble / nb) }
    val bounds = scored.groupBy(_._1).map { case (l, xs) =>
      val v = xs.map(_._2).sorted.toVector
      l -> (quantileCont(v, 0.25), quantileCont(v, 0.75))
    }
    scored.map { case (l, f) =>
      val (lo, hi) = bounds(l)
      (l, if (f > hi) "head" else if (f > lo) "middle" else "tail", f)
    }.groupBy(x => (x._1, x._2)).toSeq
      .sortBy { case ((l, b), _) => (l, b) }
      .map { case ((l, b), xs) =>
        Seq("lang" -> l, "bucket" -> b, "n_docs" -> xs.size.toLong,
          "min_fluency" -> xs.map(_._3).min,
          "max_fluency" -> xs.map(_._3).max)
      }
  }

  /** tx18/tx19's shared 4-round BPE replay over wrapped-token
    * sequences; returns (per-round stats, final per-doc sequences). */
  private def bpeRounds(docs: Seq[Doc])
      : (Seq[(Int, String, String, Long, Long)], Seq[(Long, Vector[String])]) = {
    var seqs: Seq[(Long, String)] = docs.map(d =>
      d.docId -> toks(d.text).map(t => "<" + t + ">").mkString(" "))
    val stats = (1 to 4).map { r =>
      val pairs = seqs.flatMap { case (_, s) =>
        val t = s.split(" ", -1).toVector
        if (t.length < 2) Nil
        else (0 until t.length - 1).map(i => (t(i), t(i + 1)))
      }
      val (l, rr, cnt) = pairs.groupBy(identity).toSeq
        .map { case ((a, b), xs) => (a, b, xs.size.toLong) }
        .minBy { case (a, b, n) => (-n, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8Ord, utf8Ord))
      def inner(x: String) = x.substring(1, x.length - 1)
      val merged = "<" + inner(l) + inner(rr) + ">"
      seqs = seqs.map { case (id, s) =>
        id -> s.replace(l + " " + rr, merged) }
      val pieces = seqs.map(_._2.split(" ", -1).length.toLong).sum
      (r, inner(l), inner(rr), cnt, pieces)
    }
    (stats, seqs.map { case (id, s) => id -> s.split(" ", -1).toVector })
  }

  def tx18(docs: Seq[Doc]): Seq[Row] =
    bpeRounds(docs)._1.map { case (r, l, rr, cnt, pieces) =>
      Seq("round" -> r.toLong, "left_tok" -> l, "right_tok" -> rr,
        "cnt" -> cnt, "pieces_after" -> pieces)
    }

  def tx19(docs: Seq[Doc]): Seq[Row] = {
    val finalSeqs = bpeRounds(docs)._2
    def inner(x: String) = x.substring(1, x.length - 1)
    val pp = finalSeqs.flatMap { case (id, t) =>
      t.zipWithIndex.map { case (p, i) => (id, i + 1L, inner(p)) } }
    val vocab = pp.groupBy(_._3).toSeq
      .map { case (p, xs) => (p, xs.size.toLong) }
      .sortBy { case (p, n) => (-n, p) }(
        Ordering.Tuple2(Ordering.Long, utf8Ord))
      .zipWithIndex.map { case ((p, _), i) => p -> (i + 1L) }.toMap
    pp.sortBy(x => (x._1, x._2)).map { case (id, pos, p) =>
      Seq("doc_id" -> id, "pos" -> pos, "token_id" -> vocab(p)) }
  }

  // ---- dd ----------------------------------------------------------

  def dd01(docs: Seq[Doc]): Seq[Row] =
    docs.map(d => (normFingerprint(d.text), d.docId))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (fp, xs) =>
        Seq("fingerprint" -> fp, "canonical_doc" -> xs.map(_._2).min,
          "n_copies" -> xs.size.toLong)
      }

  private def shingleMap(docs: Seq[Doc]): Map[Long, Vector[String]] =
    docs.map(d => d.docId -> shingles5(toks(d.text)))
      .filter(_._2.nonEmpty).toMap

  /** (x, y, inter) for unordered pairs sharing >= 1 shingle. */
  private def interPairs(sh: Map[Long, Vector[String]])
      : Map[(Long, Long), Int] = {
    val inv = sh.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).values
    val m = scala.collection.mutable.Map.empty[(Long, Long), Int]
    inv.foreach { xs =>
      val ids = xs.map(_._2).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        m((ids(i), ids(j))) = m.getOrElse((ids(i), ids(j)), 0) + 1
    }
    m.toMap
  }

  def dd02(docs: Seq[Doc]): Seq[Row] = {
    val sh = shingleMap(docs)
    interPairs(sh).toSeq.sortBy(_._1).flatMap { case ((x, y), inter) =>
      val (nx, ny) = (sh(x).length, sh(y).length)
      val j = inter.toDouble / (nx + ny - inter)
      if (j >= 0.2)
        Some(Seq("x" -> x, "y" -> y, "inter" -> inter.toLong,
          "nx" -> nx.toLong, "ny" -> ny.toLong, "jaccard" -> j))
      else None
    }
  }

  /** Replica of Spark's chained xxhash64 (seed 42): the SAME bits the
    * operator's minhash/banding computes, recomputed through the
    * catalyst XXH64 primitive directly. */
  private def xxLong(v: Long, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, seed)
  private def xxString(s: String, seed: Long): Long = {
    val b = s.getBytes("UTF-8")
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  def dd03(docs: Seq[Doc]): Seq[Row] = {
    val sh = shingleMap(docs)
    val k = 32; val bands = 8; val rows = k / bands
    val mh: Map[Long, Vector[Long]] = sh.map { case (id, ss) =>
      id -> (0 until k).map(i =>
        ss.map(t => xxString(t, xxLong(i.toLong, 42L))).min).toVector
    }
    val buckets = mh.toSeq.flatMap { case (id, m) =>
      (0 until bands).map { b =>
        val h = (0 until rows).foldLeft(xxLong(b.toLong, 42L)) {
          (acc, r) => xxLong(m(b * rows + r), acc) }
        ((b, h), id)
      }
    }.groupBy(_._1).values
    val cand = scala.collection.mutable.Set.empty[(Long, Long)]
    buckets.foreach { xs =>
      val ids = xs.map(_._2).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        cand += ((ids(i), ids(j)))
    }
    cand.toSeq.sorted.flatMap { case (x, y) =>
      val (sx, sy) = (sh(x).toSet, sh(y).toSet)
      val inter = (sx & sy).size
      val j = inter.toDouble / (sx | sy).size
      if (j >= 0.5) Some(Seq("x" -> x, "y" -> y, "jaccard" -> j))
      else None
    }
  }

  def dd04(docs: Seq[Doc]): Seq[Row] = {
    val sigs = docs.map { d =>
      val t = toks(d.text).distinct
      val hs = t.map { tok =>
        val h = md5hex(tok)
        (java.lang.Long.parseLong(h.substring(0, 8), 16),
          java.lang.Long.parseLong(h.substring(8, 16), 16))
      }
      val n = t.length
      def sig(sel: ((Long, Long)) => Long): Long =
        (0 until 32).map { b =>
          val cnt = hs.count(x => ((sel(x) >> b) & 1L) == 1L)
          if (2 * cnt >= n) 1L << b else 0L
        }.sum
      (d.docId, sig(_._1), sig(_._2))
    }
    (for {
      i <- sigs.indices; j <- i + 1 until sigs.length
      (x, hx, lx) = sigs(i); (y, hy, ly) = sigs(j)
      a = if (x < y) (x, hx, lx, y, hy, ly) else (y, hy, ly, x, hx, lx)
      ham = java.lang.Long.bitCount(a._2 ^ a._5) +
        java.lang.Long.bitCount(a._3 ^ a._6)
      if ham <= 3
    } yield Seq("x" -> a._1, "y" -> a._4, "hamming" -> ham.toLong))
      .sortBy(r => (r(0)._2.asInstanceOf[Long], r(1)._2.asInstanceOf[Long]))
  }

  /** dd02-threshold pairs -> union-find components (docs in pairs
    * only); canonical = component min. */
  private def components(docs: Seq[Doc]): Map[Long, Long] = {
    val sh = shingleMap(docs)
    val edges = interPairs(sh).toSeq.flatMap { case ((x, y), inter) =>
      val j = inter.toDouble / (sh(x).length + sh(y).length - inter)
      if (j >= 0.2) Some((x, y)) else None
    }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(a: Long): Long = {
      val p = parent.getOrElse(a, a)
      if (p == a) a else { val r = find(p); parent(a) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> find(id)).toMap
  }

  def dd05(docs: Seq[Doc]): Seq[Row] = {
    val lab = components(docs)
    val size = lab.values.groupBy(identity).map { case (c, xs) => c -> xs.size }
    lab.toSeq.sortBy(_._1).map { case (id, c) =>
      Seq("doc_id" -> id, "canonical_doc" -> c,
        "cluster_size" -> size(c).toLong)
    }
  }

  def dd06(docs: Seq[Doc]): Seq[Row] = {
    val pas = docs.flatMap { d =>
      val t = toks(d.text)
      val n = (t.length - 1) / 32 + 1
      (0 until n).map(i =>
        (d.docId, md5hex(t.slice(i * 32, (i + 1) * 32).mkString(" "))))
    }
    val cnt = pas.groupBy(_._2).map { case (fp, xs) => fp -> xs.size }
    pas.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, xs) =>
      val dup = xs.count(x => cnt(x._2) > 1).toLong
      Seq("doc_id" -> id, "n_passages" -> xs.size.toLong,
        "n_dup_passages" -> dup,
        "dup_frac" -> dup.toDouble / xs.size)
    }
  }

  def dd07(docs: Seq[Doc]): Seq[Row] = {
    val lab = components(docs)
    val uniq = docs.map { d =>
      val t = toks(d.text)
      d.docId -> t.distinct.length.toDouble / t.length
    }.toMap
    val best = lab.groupBy(_._2).map { case (c, xs) =>
      c -> xs.keys.toSeq.sortBy(id => (-uniq(id), id))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)).head
    }
    lab.toSeq.sortBy(_._1).map { case (id, c) =>
      Seq("doc_id" -> id, "cluster" -> c, "best_doc" -> best(c),
        "kept" -> (id == best(c)), "uniq_ratio" -> uniq(id))
    }
  }

  def dd10(docs: Seq[Doc]): Seq[Row] = {
    val sh = shingleMap(docs)
    interPairs(sh).toSeq.flatMap { case ((x, y), inter) =>
      Seq((x, y, inter), (y, x, inter))
    }.flatMap { case (cx, cy, inter) =>
      val na = sh(cx).length
      val c = inter.toDouble / na
      if (c >= 0.8)
        Some(Seq("contained_id" -> cx, "container_id" -> cy,
          "inter" -> inter.toLong, "n_contained" -> na.toLong,
          "containment" -> c))
      else None
    }.sortBy(r => (r(0)._2.asInstanceOf[Long], r(1)._2.asInstanceOf[Long]))
  }

  def dd11(docs: Seq[Doc]): Seq[Row] = {
    val g = docs.flatMap { d =>
      val t = toks(d.text)
      if (t.length < 20) Nil
      else (0 to t.length - 20).map(i =>
        (d.docId, java.lang.Long.parseLong(
          md5hex(t.slice(i, i + 20).mkString(" ")).substring(0, 15), 16)))
    }
    val dw = g.groupBy(_._2).map { case (h, xs) =>
      h -> xs.map(_._1).distinct.size }
    g.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, xs) =>
      val dup = xs.count(x => dw(x._2) >= 2).toLong
      Seq("doc_id" -> id, "n_windows" -> xs.size.toLong,
        "dup_windows" -> dup,
        "dup_fraction" -> dup.toDouble / xs.size)
    }
  }

  def dd12(docs: Seq[Doc]): Seq[Row] = {
    val sh = shingleMap(docs)
    val hist = sh.filter(_._1 % 10 != 9)
    val delta = docs.map(_.docId).filter(_ % 10 == 9).sorted
    delta.map { did =>
      val best = sh.get(did).flatMap { sd =>
        val cands = hist.toSeq.flatMap { case (hid, shh) =>
          val inter = (sd.toSet & shh.toSet).size
          if (inter == 0) None
          else {
            val j = inter.toDouble / (sd.length + shh.length - inter)
            if (j >= 0.5) Some((hid, j)) else None
          }
        }
        cands.sortBy { case (hid, j) => (-j, hid) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
          .headOption
      }
      Seq("doc_id" -> did, "is_dup" -> best.isDefined,
        "best_match" -> best.map(_._1).orNull,
        "best_jaccard" -> best.map(_._2).orNull)
    }
  }

  /** Codepoint levenshtein — the operator's declared distance. */
  private def lev(a: Array[Int], b: Array[Int]): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  def dd13(cust: Seq[(Long, String)]): Seq[Row] = {
    val names = cust.filter(_._1 <= 300)
      .map { case (id, n) => id -> n.toLowerCase }
    def cps(s: String): Array[Int] = s.codePoints().toArray
    val keys = names.flatMap { case (id, n) =>
      val c = cps(n)
      (n +: (0 until math.min(64, c.length)).map(i =>
        new String((c.take(i) ++ c.drop(i + 1)).flatMap(
          Character.toChars), 0,
          (c.take(i) ++ c.drop(i + 1)).map(Character.charCount).sum)))
        .map(k => k -> id)
    }
    val cand = keys.groupBy(_._1).values.flatMap { xs =>
      val ids = xs.map(_._2).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j))
    }.toSet
    val byId = names.toMap
    cand.toSeq.sorted.flatMap { case (a, b) =>
      val d = lev(cps(byId(a)), cps(byId(b)))
      if (d <= 1)
        Some(Seq("a_id" -> a, "b_id" -> b, "dist" -> d.toLong))
      else None
    }
  }

  // ---- dd08/dd09: fixed-point SemDeDup -----------------------------

  private def fixdot(a: Array[Float], b: Array[Float]): Double =
    a.indices.map(i =>
      math.floor(a(i).toDouble * b(i).toDouble * 1e12).toLong).sum / 1e12

  private def semPipeline(embs: Seq[(Long, Array[Float], Int)],
      assign: Map[Long, (Int, Double)]): Seq[Row] = {
    val vecs = embs.map(e => e._1 -> e._2).toMap
    val nrm = embs.map(e => e._1 -> math.sqrt(fixdot(e._2, e._2))).toMap
    val byCid = assign.toSeq.groupBy(_._2._1)
    val edges = byCid.values.flatMap { xs =>
      val ids = xs.map(_._1).sorted
      for {
        i <- ids.indices; j <- i + 1 until ids.length
        x = ids(i); y = ids(j)
        if fixdot(vecs(x), vecs(y)) / (nrm(x) * nrm(y)) >= 0.3
      } yield (x, y)
    }.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(a: Long): Long = {
      val p = parent.getOrElse(a, a)
      if (p == a) a else { val r = find(p); parent(a) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val lab = members.map(id => id -> find(id)).toMap
    lab.groupBy(_._2).toSeq.sortBy(_._1).map { case (grp, xs) =>
      val ids = xs.keys.toSeq
      val keep = ids.sortBy(id => (assign(id)._2, id))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)).head
      Seq("grp" -> grp, "sz" -> ids.size.toLong, "keep_id" -> keep,
        "n_dropped" -> (ids.size - 1).toLong,
        "keep_cos" -> assign(keep)._2)
    }
  }

  def dd08(embs: Seq[(Long, Array[Float], Int)]): Seq[Row] = {
    val cents = embs.filter(_._1 < 8)
      .map(e => ((e._1 + 1).toInt, e._2, fixdot(e._2, e._2)))
    val assign = embs.map { case (id, v, _) =>
      val nrm = math.sqrt(fixdot(v, v))
      val best = cents.minBy { case (cid, cemb, cn2) =>
        (cn2 - 2 * fixdot(v, cemb), cid)
      }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
      id -> (best._1, fixdot(v, best._2) / (nrm * math.sqrt(best._3)))
    }.toMap
    semPipeline(embs, assign)
  }

  def dd09(embs: Seq[(Long, Array[Float], Int)]): Seq[Row] = {
    val cents = embs.filter(_._1 < 16)
      .map(e => ((e._1 + 1).toInt, e._2, fixdot(e._2, e._2)))
    val sup = cents.filter(_._1 <= 4)
    def nearestSup(v: Array[Float]): Int =
      sup.minBy { case (sid, semb, sn2) => (sn2 - 2 * fixdot(v, semb), sid) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))._1
    val cg = cents.map(c => c._1 -> nearestSup(c._2)).toMap
    val assign = embs.map { case (id, v, _) =>
      val nrm = math.sqrt(fixdot(v, v))
      val sid = nearestSup(v)
      val group = cents.filter(c => cg(c._1) == sid)
      val best = group.minBy { case (cid, cemb, cn2) =>
        (cn2 - 2 * fixdot(v, cemb), cid)
      }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
      id -> (best._1, fixdot(v, best._2) / (nrm * math.sqrt(best._3)))
    }.toMap
    semPipeline(embs, assign)
  }

  // ---- mm ----------------------------------------------------------

  private def hexUpper(b: Array[Byte]): String =
    b.map("%02X".format(_)).mkString

  def mm01(docs: Seq[Doc]): Seq[Row] = docs.sortBy(_.docId).map { d =>
    val b = d.text.getBytes("UTF-8")
    Seq("doc_id" -> d.docId, "n_bytes" -> b.length.toLong,
      "payload_md5" -> md5hex(d.text),
      "head_hex" -> hexUpper(b).take(16))
  }

  def mm05(docs: Seq[Doc]): Seq[Row] = {
    val ch = docs.flatMap { d =>
      val h = hexUpper(d.text.getBytes("UTF-8"))
      if (h.isEmpty) Nil
      else {
        val n = (h.length - 1) / 128 + 1
        (0 until n).map(i =>
          (d.docId, md5hex(h.substring(i * 128,
            math.min((i + 1) * 128, h.length)))))
      }
    }
    val nd = ch.groupBy(_._2).map { case (fp, xs) =>
      fp -> xs.map(_._1).distinct.size }
    ch.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, xs) =>
      val shared = xs.count(x => nd(x._2) > 1).toLong
      Seq("doc_id" -> id, "n_chunks" -> xs.size.toLong,
        "n_shared_chunks" -> shared,
        "shared_frac" -> shared.toDouble / xs.size)
    }
  }

  // ---- sp ----------------------------------------------------------

  def sp01(docs: Seq[Doc]): Seq[Row] = docs.sortBy(_.docId).map { d =>
    val b = md5Long("split:" + d.docId, 15) % 1000
    Seq("doc_id" -> d.docId, "bucket" -> b,
      "split" -> (if (b < 900) "train" else if (b < 950) "val" else "test"))
  }

  def sp02(docs: Seq[Doc]): Seq[Row] = {
    val rates = Map("en" -> 10, "fr" -> 50, "es" -> 50, "de" -> 50,
      "zh" -> 50)
    docs.sortBy(_.docId).flatMap { d =>
      rates.get(d.lang).flatMap { rate =>
        if (md5Long("sample:" + d.docId, 15) % 100 < rate)
          Some(Seq("doc_id" -> d.docId, "lang" -> d.lang,
            "source" -> d.source))
        else None
      }
    }
  }

  private def offsets(docs: Seq[Doc]): Seq[(Long, Long, Long)] = {
    var off = 0L
    docs.sortBy(_.docId).map { d =>
      val n = toks(d.text).length.toLong
      val r = (d.docId, n, off)
      off += n
      r
    }
  }

  def sp03(docs: Seq[Doc]): Seq[Row] =
    offsets(docs).map { case (id, n, st) =>
      Seq("doc_id" -> id, "n_tok" -> n, "start_off" -> st,
        "first_seq" -> st / 512,
        "last_seq" -> (st + n - 1) / 512)
    }

  def sp04(docs: Seq[Doc]): Seq[Row] = {
    val per = docs.groupBy(_.source)
      .map { case (s, ds) => s -> ds.map(d => toks(d.text).length.toLong).sum }
    val total = per.values.sum
    val k = per.size
    per.toSeq.sortBy(_._1).map { case (src, n) =>
      Seq("source" -> src, "n_tokens" -> n,
        "natural_share" -> n.toDouble / total,
        "sample_rate" -> math.min(1.0, (total.toDouble / k) / n),
        "expected_tokens" -> math.min(n.toDouble, total.toDouble / k))
    }
  }

  def sp05(docs: Seq[Doc]): Seq[Row] =
    docs.map { d =>
      val skey = md5Long("shuffle:" + d.docId, 15)
      (d.docId, skey % 8, skey)
    }.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (shard, xs) =>
      xs.sortBy(x => (x._3, x._1)).zipWithIndex.map { case ((id, _, _), i) =>
        Seq("doc_id" -> id, "shard" -> shard,
          "shuffle_rank" -> (i + 1L))
      }
    }

  def sp06(docs: Seq[Doc]): Seq[Row] =
    offsets(docs).flatMap { case (id, n, st) =>
      (st / 512 to (st + n - 1) / 512).map { seq =>
        (seq, id, math.max(0L, seq * 512 - st),
          math.min(st + n, (seq + 1) * 512) - math.max(st, seq * 512))
      }
    }.sortBy(x => (x._1, x._2)).map { case (seq, id, dts, nts) =>
      Seq("seq_id" -> seq, "doc_id" -> id, "doc_tok_start" -> dts,
        "n_tok_in_seq" -> nts)
    }

  def sp07(docs: Seq[Doc]): Seq[Row] = {
    val per = docs.groupBy(_.lang)
      .map { case (l, ds) => l -> ds.map(d => toks(d.text).length.toLong).sum }
    val total = per.values.sum
    val fp = per.map { case (l, n) =>
      l -> math.floor(math.sqrt(n.toDouble / total) * 1e12).toLong }
    val z = fp.values.sum
    per.toSeq.sortBy(_._1).map { case (l, n) =>
      val prob = fp(l).toDouble / z.toDouble
      Seq("lang" -> l, "n_tokens" -> n,
        "natural_share" -> n.toDouble / total,
        "sample_prob" -> prob,
        "expected_tokens" -> prob * total.toDouble)
    }
  }

  def sp08(docs: Seq[Doc]): Seq[Row] =
    docs.groupBy(_.source).toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      ds.sortBy(d => (-d.nChars, d.docId)).take(40).zipWithIndex
        .map { case (d, i) =>
          Seq("doc_id" -> d.docId, "source" -> src,
            "n_chars" -> d.nChars, "rank_in_source" -> (i + 1L))
        }
    }

  def sp09(docs: Seq[Doc]): Seq[Row] = {
    var off = 0L
    val o = docs.sortBy(_.docId).map { d =>
      val n = utf8Len(d.text).toLong
      val r = (d.docId, n, off)
      off += n
      r
    }
    o.groupBy(_._3 / 16384).toSeq.sortBy(_._1).map { case (shard, xs) =>
      Seq("shard_id" -> shard, "n_docs" -> xs.size.toLong,
        "shard_bytes" -> xs.map(_._2).sum,
        "first_doc" -> xs.map(_._1).min, "last_doc" -> xs.map(_._1).max)
    }
  }

  def sp10(docs: Seq[Doc]): Seq[Row] =
    docs.map { d =>
      val u = (md5Long("prio:" + d.docId, 15) + 1).toDouble /
        1152921504606846976.0
      (d, d.nChars.toDouble / u)
    }.sortBy { case (d, p) => (-p, d.docId) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      .take(100).zipWithIndex.map { case ((d, p), i) =>
        Seq("draw_rank" -> (i + 1L), "doc_id" -> d.docId,
          "source" -> d.source, "n_chars" -> d.nChars, "priority" -> p)
      }

  def sp11(docs: Seq[Doc]): Seq[Row] = {
    val nt = docs.map(d => toks(d.text).length.toLong)
    val gmax = nt.max
    nt.groupBy(_ / 16).toSeq.sortBy(_._1).map { case (b, xs) =>
      val mx = xs.max
      Seq("bucket" -> b, "n_docs" -> xs.size.toLong,
        "sum_tok" -> xs.sum, "max_tok" -> mx,
        "pad_tok" -> xs.size * mx,
        "efficiency" -> xs.sum.toDouble / (xs.size * mx),
        "global_pad_tok" -> xs.size * gmax)
    }
  }

  def sp12(docs: Seq[Doc]): Seq[Row] = {
    val lang = docs.map(d => d.docId -> d.lang).toMap
    val nTok = docs.map(d => d.docId -> toks(d.text).length.toLong).toMap
    val scored = fluencyRows(docs)
      .map { case (id, nb, lb) => (id, lang(id), lb.toDouble / nb) }
    val bounds = scored.groupBy(_._2).map { case (l, xs) =>
      val v = xs.map(_._3).sorted.toVector
      l -> (quantileCont(v, 0.25), quantileCont(v, 0.75))
    }
    val rates = Map("head" -> 100, "middle" -> 50, "tail" -> 10)
    scored.map { case (id, l, f) =>
      val (lo, hi) = bounds(l)
      val bucket = if (f > hi) "head" else if (f > lo) "middle" else "tail"
      val kept = md5Long("curate:" + id, 15) % 100 < rates(bucket)
      (l, bucket, kept, nTok(id))
    }.groupBy(x => (x._1, x._2)).toSeq
      .sortBy { case ((l, b), _) => (l, b) }
      .map { case ((l, b), xs) =>
        Seq("lang" -> l, "bucket" -> b, "n_docs" -> xs.size.toLong,
          "n_kept" -> xs.count(_._3).toLong,
          "tokens_kept" -> xs.filter(_._3).map(_._4).sum)
      }
  }
}
