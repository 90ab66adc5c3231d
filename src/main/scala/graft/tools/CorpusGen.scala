package graft.tools

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Seeded ADVERSARIAL corpus generator — the data-side twin of the
  * request fuzzing in RequestFuzzSpec (r16): where that program draws
  * random QUERIES over a fixed corpus, this draws random CORPORA for
  * the fixed tx/dd/sp battery, so the dedup/text/sampling operators'
  * duals are exercised at the inputs where they actually break:
  *
  *  - near-duplicate pairs PLANTED at controlled distances that
  *    STRADDLE each operator's decision threshold (5-gram Jaccard
  *    around dd02/dd12's 0.5; shared chunk-aligned 32-token passages
  *    for dd06; shared 20-token windows for dd11; token-multiset
  *    containment for dd10; 1-2 token edits for dd04's SimHash bands);
  *  - adversarial unicode mixes (CJK with and without spaces,
  *    combining marks, emoji + ZWJ families, RTL runs, zero-width and
  *    exotic-space glue INSIDE tokens) that stress tokenization and
  *    fingerprint normalization;
  *  - planted PII at boundary positions (doc start/end, punctuation-
  *    adjacent) plus lookalikes that must NOT match (11-digit runs,
  *    bare @, trailing-digit SSN shapes);
  *  - contamination plants: 5-gram shingles copied from the benchmark
  *    split (doc_id % 50 == 0) into train docs;
  *  - pathological lengths: empty, whitespace-only, 1-token, and the
  *    exact boundary counts of every windowed operator (4/5 tokens for
  *    shingles, 19/20/21 for dd11, 31/32/33 for dd06), plus a long
  *    multi-thousand-token tail;
  *  - history/delta split interaction: variants intentionally landed
  *    on doc_id % 10 == 9 so dd12's incremental path sees matches.
  *
  * Everything is a pure function of the seed — re-running a seed
  * reproduces the corpus byte-for-byte, so a divergence shrinks to a
  * named fixture. The same generator feeds the in-CI differential
  * spec (CorpusFuzzSpec) and the offline DuckDB dual re-render
  * (graft.tools.CorpusFuzz + tools/selfcheck.py). */
object CorpusGen {

  final case class Doc(docId: Long, text: String, lang: String,
      source: String, nChars: Long)

  private val langs = Vector("en", "fr", "de", "es", "zh")

  private val enWords = Vector(
    "the", "a", "of", "and", "to", "in", "is", "data", "query", "table",
    "row", "scan", "join", "merge", "sort", "hash", "filter", "value",
    "stream", "batch", "window", "agg", "spark", "fast", "slow", "part",
    "big", "small", "line", "order", "column", "key", "customer", "plan")
  private val frWords = Vector(
    "le", "la", "et", "est", "un", "une", "avec", "pour", "dans", "sur",
    "requete", "table", "jointure", "tri", "flux", "valeur", "rapide")
  private val deWords = Vector(
    "der", "die", "und", "ist", "ein", "eine", "mit", "nicht", "daten",
    "abfrage", "tabelle", "zeile", "schnell", "langsam", "wert")
  private val esWords = Vector(
    "el", "los", "es", "una", "que", "con", "para", "datos", "consulta",
    "tabla", "fila", "rapido", "lento", "valor", "flujo")
  private val zhChars =
    "的一是在不了有和人这中大为上个国我以要他时来用们生到作地于出就分对成会可主发年动"
  private val uniWords = Vector(
    "café", "naïve", "über", "mañana", "привет", "мир", "αλφα", "βήτα",
    "שלום", "مرحبا", "😀", "👍🏽", "👨‍👩‍👧‍👦",
    "éclair", "ab​cd", "x y", "漢　字", "ｆｕｌｌ",
    "ﬁligree", "ǅungla")
  private val punctTokens = Vector(
    "word.", "“quoted”", "end!?", "semi;colon:", "(paren)",
    "[#hash]", "a,b", "...", "—dash—", "tail,", "mid.dot",
    "x:y;z", "!bang", "q?")
  private val piiTokens = Vector(
    "john.doe@example.com", "a@b.co", "x.y+z@sub.domain.org",
    "123-45-6789", "1234567890", "customer", "vector")
  private val piiLookalikes = Vector(
    "notpii@", "@nodomain", "12345678901", "999-99-99990", "12-34-5678",
    "customers", "vectors", "a@b.c")
  private val digitTokens = Vector("42", "3.14", "0x1f", "1e9", "007")

  /** Mostly single spaces with occasional runs/tabs/newlines — every
    * alternative matches Java's \s AND the oracle's explicit
    * [ \t\n\x0b\f\r]+ class, so a separator choice can never itself
    * be a cross-engine divergence (U+000B vertical tab is DELIBERATELY
    * included: Java \s matches it, RE2 \s does not — the oracle regex must
    * spell the class out, and this keeps it honest). */
  private def sep(r: Random): String = r.nextInt(20) match {
    case 0 => "\t"
    case 1 => "\n"
    case 2 => "  "
    case 3 => "\r\n"
    case 4 => " \t "
    case 5 => "\u000B" // vertical tab: in Java \s, NOT in RE2 \s
    case _ => " "
  }

  private def pool(lang: String): Vector[String] = lang match {
    case "fr" => frWords
    case "de" => deWords
    case "es" => esWords
    case _ => enWords
  }

  private def zhToken(r: Random): String = {
    val n = 1 + r.nextInt(3)
    (0 until n).map(_ => zhChars(r.nextInt(zhChars.length))).mkString
  }

  private def drawToken(r: Random, lang: String): String =
    r.nextInt(100) match {
      case x if x < 70 =>
        if (lang == "zh") zhToken(r)
        else { val p = pool(lang); p(r.nextInt(p.length)) }
      case x if x < 78 => enWords(r.nextInt(enWords.length))
      case x if x < 85 => punctTokens(r.nextInt(punctTokens.length))
      case x if x < 90 => uniWords(r.nextInt(uniWords.length))
      case x if x < 94 => digitTokens(r.nextInt(digitTokens.length))
      case x if x < 97 => piiLookalikes(r.nextInt(piiLookalikes.length))
      case _ => piiTokens(r.nextInt(piiTokens.length))
    }

  private def tokensOf(r: Random, lang: String, n: Int): Vector[String] =
    Vector.fill(n)(drawToken(r, lang))

  /** Token count drawn with the operators' windowing boundaries
    * over-weighted: the off-by-one regions of 5-gram shingling (4/5),
    * dd11's 20-token windows (19/20/21), and dd06's 32-token passages
    * (31/32/33). */
  private def drawLen(r: Random): Int = r.nextInt(20) match {
    case 0 => r.nextInt(2) // 0 or 1 tokens
    case 1 => 2 + r.nextInt(3) // 2-4: below the 5-shingle floor
    case 2 => 5 // exactly one shingle
    case 3 => 19 + r.nextInt(3) // dd11 boundary
    case 4 => 31 + r.nextInt(3) // dd06 boundary
    case 5 => 300 + r.nextInt(200) // long
    case _ => 6 + r.nextInt(90)
  }

  private def render(r: Random, toks: Seq[String]): String = {
    val body = if (toks.isEmpty) "" else
      toks.tail.foldLeft(new StringBuilder(toks.head)) {
        (b, t) => b.append(sep(r)).append(t) }.toString
    r.nextInt(8) match {
      case 0 => " " + body
      case 1 => body + "\n"
      case 2 => "\t" + body + " "
      case _ => body
    }
  }

  /** Substitute `k` token positions (spread out, so each edit kills a
    * full window of shingles) — the Jaccard/SimHash distance dial. */
  private def perturb(r: Random, toks: Vector[String], k: Int)
      : Vector[String] = {
    if (toks.isEmpty) return toks
    val idx = r.shuffle(toks.indices.toList).take(k).toSet
    toks.zipWithIndex.map { case (t, i) =>
      if (idx(i)) t + "~" + r.nextInt(1000) else t }
  }

  /** The documents table for `seed`: ~`n` docs, ids 0..n-1. */
  def documents(seed: Int, n: Int = 140): Seq[Doc] = {
    val r = new Random(seed * 7919 + 17)
    val texts = ArrayBuffer.empty[(String, String, String)] // (text, lang, source)
    def lang(): String = langs(r.nextInt(langs.length))
    def source(): String = s"src${r.nextInt(8)}"

    // base docs
    while (texts.length < n) {
      val i = texts.length
      val l = lang()
      if (i % 50 == 0) {
        // benchmark-split doc (tx08): long enough to donate shingles
        texts += ((render(r, tokensOf(r, "en", 40 + r.nextInt(30))),
          "en", source()))
      } else if (i % 10 == 9 && i > 20 && r.nextBoolean()) {
        // dd12 delta doc: a controlled-distance variant of an earlier
        // HISTORY doc (id % 10 != 9 guaranteed by construction below)
        val cand = r.nextInt(i)
        val hid = if (cand % 10 == 9) cand - 1 else cand
        val baseToks = texts(hid)._1.trim
          .split("\\s+").toVector.filter(_.nonEmpty)
        if (baseToks.size >= 10) {
          // k edits on T tokens: 5-gram Jaccard lands on both sides
          // of 0.5 as k sweeps 1..T/6
          val k = 1 + r.nextInt(math.max(1, baseToks.size / 6))
          texts += ((render(r, perturb(r, baseToks, k)),
            texts(hid)._2, source()))
        } else texts += ((render(r, tokensOf(r, l, drawLen(r))), l, source()))
      } else r.nextInt(24) match {
        case 0 => // pathological: empty / whitespace-only
          texts += ((Vector("", " ", "\n", " \t ",
            " ")(r.nextInt(5)), l, source()))
        case 1 => // zh no-space blob: one giant token
          texts += (((0 until 30 + r.nextInt(50))
            .map(_ => zhChars(r.nextInt(zhChars.length))).mkString,
            "zh", source()))
        case 2 if texts.nonEmpty => // exact dup modulo case+punct (dd01/dd07)
          val base = texts(r.nextInt(texts.length))._1
          val noisy = base.toUpperCase + "!!"
          texts += ((noisy, l, source()))
        case 3 if texts.nonEmpty => // containment plant (dd10): subset doc
          val base = texts(r.nextInt(texts.length))._1.trim
            .split("\\s+").toVector.filter(_.nonEmpty)
          if (base.size >= 12) {
            val from = r.nextInt(base.size / 2)
            val len = 6 + r.nextInt(base.size - from - 6)
            texts += ((render(r, base.slice(from, from + len)), l, source()))
          } else texts += ((render(r, tokensOf(r, l, drawLen(r))), l, source()))
        case 4 => // dd06 passage plant: chunk-aligned shared 32-token block
          val shared = tokensOf(r, "en", 32)
          val a = tokensOf(r, "en", 32) ++ shared ++ tokensOf(r, "en", 32)
          val b = tokensOf(r, "en", 32) ++ shared
          texts += ((render(r, a), "en", source()))
          if (texts.length < n) texts += ((render(r, b), "en", source()))
        case 5 => // dd11 window plant: shared 20-token run, arbitrary offset
          val run = tokensOf(r, "en", 20 + r.nextInt(4))
          val a = tokensOf(r, "en", r.nextInt(15)) ++ run ++
            tokensOf(r, "en", r.nextInt(15))
          texts += ((render(r, a), "en", source()))
          if (texts.length < n) texts += ((render(r, run), "en", source()))
        case 6 if texts.nonEmpty => // SimHash plant: 1-2 edits on a 40-token doc
          val base = tokensOf(r, "en", 40)
          texts += ((render(r, base), "en", source()))
          if (texts.length < n)
            texts += ((render(r, perturb(r, base, 1 + r.nextInt(2))),
              "en", source()))
        case 7 => // PII boundary plant
          val pii = piiTokens(r.nextInt(piiTokens.length))
          val t = r.nextInt(4) match {
            case 0 => pii + " " + render(r, tokensOf(r, "en", 8))
            case 1 => render(r, tokensOf(r, "en", 8)) + " " + pii
            case 2 => render(r, tokensOf(r, "en", 4)) + " (" + pii + ")," +
              " " + render(r, tokensOf(r, "en", 4))
            case _ => pii
          }
          texts += ((t, "en", source()))
        case _ =>
          texts += ((render(r, tokensOf(r, l, drawLen(r))), l, source()))
      }
    }
    val trimmed = texts.take(n)
    // contamination plants: copy a 5-token shingle from each benchmark
    // doc (id % 50 == 0) into a few later train docs
    val out = trimmed.zipWithIndex.map { case ((t, l, s), i) => (t, l, s, i) }
      .toArray
    for (b <- 0 until n by 50) {
      val bt = out(b)._1.trim.split("\\s+").toVector.filter(_.nonEmpty)
      if (bt.size >= 5) {
        val nPlants = 1 + r.nextInt(3)
        for (_ <- 0 until nPlants) {
          val at = 1 + r.nextInt(n - 1)
          if (at % 50 != 0) {
            val from = r.nextInt(bt.size - 4)
            val sh = bt.slice(from, from + 5)
            val (t, l, s, i) = out(at)
            out(at) = (t + " " + sh.mkString(" "), l, s, i)
          }
        }
      }
    }
    out.toSeq.map { case (t, l, s, i) =>
      Doc(i.toLong, t, l, s, t.codePointCount(0, t.length).toLong) }
  }

  /** Customer names for dd13's edit-distance-1 fuzzy join: planted
    * pairs at Levenshtein 1 (must match), 2 (must not), identical
    * names, 1-char names, and unicode names. Keys stay <= 300 (the
    * query's filter). */
  def customer(seed: Int, n: Int = 60): Seq[(Long, String)] = {
    val r = new Random(seed * 31337 + 5)
    val rows = ArrayBuffer.empty[String]
    def baseName(): String =
      (0 until 4 + r.nextInt(6)).map(_ => ('a' + r.nextInt(26)).toChar)
        .mkString + "#" + r.nextInt(100)
    while (rows.length < n) {
      r.nextInt(10) match {
        case 0 => // levenshtein-1 pair: one substitution
          val b = baseName()
          val i = r.nextInt(b.length)
          rows += b
          if (rows.length < n)
            rows += b.updated(i, if (b(i) == 'x') 'y' else 'x')
        case 1 => // levenshtein-1 pair: one deletion
          val b = baseName()
          rows += b
          if (rows.length < n) {
            val i = r.nextInt(b.length)
            rows += b.substring(0, i) + b.substring(i + 1)
          }
        case 2 => // levenshtein-2: must NOT match at threshold 1
          val b = baseName()
          rows += b
          if (rows.length < n && b.length > 3)
            rows += b.updated(0, '!').updated(b.length - 1, '?')
        case 3 => rows += rows.lift(r.nextInt(math.max(1, rows.length)))
          .getOrElse(baseName()) // exact duplicate name
        case 4 => rows += ('a' + r.nextInt(26)).toChar.toString // 1-char
        case 5 => // unicode near-pairs: é/è (1 codepoint AND 1 byte
          // after the oracle's fold), é/e (1 codepoint, 2 bytes — the
          // byte-vs-codepoint levenshtein trap the fold neutralizes)
          rows += "caf" + Vector("é", "è", "e")(r.nextInt(3)) + "#" +
            r.nextInt(10)
        case _ => rows += baseName()
      }
    }
    rows.take(n).zipWithIndex.map { case (nm, i) => ((i + 1).toLong, nm) }
      .toSeq
  }

  /** Embeddings with cosine pairs planted to straddle dd08/dd09's
    * 0.3 threshold: b = a·cosθ + e⊥·sinθ at cosθ ∈ {0.27..0.33}. */
  def embeddings(seed: Int, n: Int = 90, dim: Int = 64)
      : Seq[(Long, Array[Float], Int)] = {
    val r = new Random(seed * 104729 + 11)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(r.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    val out = ArrayBuffer.empty[Array[Float]]
    while (out.length < n) {
      if (r.nextInt(3) == 0 && out.length + 1 < n) {
        // threshold-straddling pair
        val a = unit()
        val cosT = 0.27 + r.nextInt(7) * 0.01
        val sinT = math.sqrt(1 - cosT * cosT)
        val e0 = unit()
        // orthogonalize e0 against a
        val d = a.zip(e0).map { case (x, y) => x * y }.sum
        val perp = e0.zip(a).map { case (y, x) => y - d * x }
        val pn = math.sqrt(perp.map(x => x * x).sum)
        val b = a.zip(perp).map { case (x, p) => cosT * x + sinT * p / pn }
        out += a.map(_.toFloat)
        out += b.map(_.toFloat)
      } else out += unit().map(_.toFloat)
    }
    out.take(n).zipWithIndex
      .map { case (v, i) => (i.toLong, v, r.nextInt(10)) }.toSeq
  }
}
