package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Second-wave operator inventory: the remaining SURVEY.md §2
  * capabilities — SQL front door (§3.2), Druid lookup-join analogue
  * (§2.3.3), semi-structured props extraction, BPE-style
  * sub-tokenization, and multimodal binary chunking / decode-stub
  * plumbing (mapInPandas analogue via typed mapPartitions).
  */
object Extended {

  /** Supplier-side star join (uses the supplier dim chain:
    * lineitem ⋈ supplier ⋈ nation): revenue per supplier nation.
    * nation is broadcast; supplier⋈lineitem shuffles on s_suppkey.
    * (Fact–dim join matrix, reference RequestModel.scala:180-228.) */
  def q24(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("revenue"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")

  /** Semi-structured JSON props extraction on the events stream table
    * (Druid extraction-fn / PostResultColumn analogue, reference
    * Column.scala:127): get_json_object stays inside codegen. */
  def q25(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        (get_json_object(col("props"), "$.k").cast("bigint") / 10)
          .cast("bigint").as("k_decile"),
        col("value"))
      .groupBy("event_type", "k_decile")
      .agg(count(lit(1)).as("n"),
        sum(dec6(col("value"))).cast("double").as("total_value"))
      .orderBy("event_type", "k_decile")

  /** Druid lookup-extraction analogue (LOOKUP_WITH_DECODE /
    * LOOKUP_WITH_RETAIN_MISSING_VALUE, reference
    * DerivedFunction.scala:157-347): a small in-memory lookup table
    * broadcast map-side-joined onto the dim chain; missing keys retain
    * the original value via coalesce. */
  def q26(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lookup = Seq(
      ("ASIA", "East"), ("EUROPE", "North"), ("AMERICA", "West"))
      .toDF("r_key", "zone")
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(lookup), col("r_name") === col("r_key"), "left_outer")
      .groupBy(coalesce(col("zone"), col("r_name")).as("zone"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec2(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy("zone")
  }

  /** SQL front door (§3.2: the Calcite/Avatica layer collapses into
    * spark.sql over registered temp views). The SQL text is ANSI
    * enough to run verbatim on both Spark and the DuckDB oracle. */
  val sql01Text: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority
      |HAVING COUNT(*) > 10
      |ORDER BY o_orderpriority""".stripMargin

  def sql01(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders")
    customer(s, d).createOrReplaceTempView("customer")
    s.sql(sql01Text)
  }

  /** BPE-style sub-tokenization: a regex piece-splitter
    * (letters | digits | single punctuation) via regexp_extract_all,
    * with per-document piece-class statistics. Map-only, codegen'd. */
  def tx05(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("pieces",
        expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
      .select(
        col("doc_id"),
        size(col("pieces")).cast("bigint").as("n_pieces"),
        expr("size(filter(pieces, p -> p rlike '^[A-Za-z]+$'))")
          .cast("bigint").as("n_alpha"),
        expr("size(filter(pieces, p -> p rlike '^[0-9]+$'))")
          .cast("bigint").as("n_digit"),
        expr("size(filter(pieces, p -> p not rlike '^[A-Za-z0-9]'))")
          .cast("bigint").as("n_punct"),
        // try_divide: empty doc → NULL, matching DuckDB x/0 → NULL
        // rather than an ANSI divide-by-zero crash (corpus-fuzz r17)
        try_divide(size(col("pieces")).cast("double"),
          length(col("text"))).as("pieces_per_char"))
      .orderBy("doc_id")

  /** Multimodal frame chunking: fixed-size 64-byte frames over the
    * binary payload (posexplode of a computed frame index — the
    * partitioning/batch shape a video frame-sampler would use), with
    * per-frame hash + length. The corpus is ASCII (verified), so
    * character frames == byte frames and the DuckDB oracle can chunk
    * with substring. */
  def mm02(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text"),
        posexplode(expr(
          // empty text → no frames (sequence(0,-1) would count DOWN and
          // fabricate two phantom frames, diverging from the oracle)
          "case when length(text) = 0 then array() else " +
            "transform(sequence(0, int(ceil(length(text) / 64.0)) - 1)," +
            " i -> substring(text, i * 64 + 1, 64)) end"))
          .as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        md5(encode(col("frame"), "UTF-8")).as("frame_md5"),
        length(col("frame")).cast("bigint").as("frame_len"))
      .orderBy("doc_id", "frame_idx")

  /** Weekly grain bucketing (GET_INTERVAL_DATE 'w' / START_OF_THE_WEEK,
    * reference DerivedFunction.scala:21-48, PostResultFunction.scala:117):
    * ISO-Monday week start via date_trunc('week'). */
  def q29(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1996-04-01"))
      .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd")
        .as("week_start"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("week_start")

  /** Stride resampling ("resize" plumbing): take every 4th byte of the
    * payload — the downsample shape an image/audio resizer runs (the
    * real kernel would interpolate; the stride indexing, schema and
    * per-row output contract are the same). ASCII corpus ⇒ char
    * stride == byte stride, so the DuckDB oracle can check it. */
  def mm04(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("resized", expr(
        "array_join(transform(sequence(1, length(text), 4)," +
          " i -> substring(text, i, 1)), '')"))
      .select(col("doc_id"),
        length(col("text")).cast("bigint").as("n_orig"),
        length(col("resized")).cast("bigint").as("n_resized"),
        md5(encode(col("resized"), "UTF-8")).as("resized_md5"))
      .orderBy("doc_id")

  /** Real multimodal decode (mapInPandas analogue): each document's
    * bytes become a REAL image payload — PNG for even doc_ids, BMP for
    * odd, both written and read by the pure-JDK `javax.imageio` codecs
    * — then decoded back to pixel features inside the typed
    * mapPartitions pipeline a production decoder runs in: binary
    * payload in, fixed feature schema out, per-partition codec state.
    * 24-bit RGB round-trips losslessly through both formats, so the
    * decoded pixel bytes equal the source UTF-8 text bytes (each byte
    * replicated across R=G=B) and the DuckDB oracle recomputes
    * width/height/pixel-hash directly from the text bytes — scale-
    * independent, no golden pin, and byte-exact on non-ASCII corpora
    * (the hash is over the hex encoding, never a char-truncated
    * string). At 100 TB the same operator reads a
    * parquet binary column instead of encoding its own payloads; the
    * decode side is unchanged. */
  def mm03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      // per-partition codec/digest state — the shape a JNI decoder
      // context would take. Memory-cached image streams: the default
      // disk-backed ImageIO cache creates (and fsyncs) a temp FILE per
      // encode/decode — pure overhead for kilobyte payloads
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (docId, bytes) =>
        val w = (docId % 5 + 4).toInt // 4..8
        val h = (docId % 3 + 4).toInt // 4..6
        val n = w * h
        val pix = java.util.Arrays.copyOf(bytes, n)
        java.util.Arrays.fill(pix, math.min(bytes.length, n), n, ' '.toByte)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < n) {
          val v = pix(i) & 0xff
          img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
          i += 1
        }
        val fmt = if (docId % 2 == 0) "png" else "bmp"
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, baos)
        // the decode path under test: real payload bytes → pixels
        val dec = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(baos.toByteArray))
        val out = new Array[Byte](dec.getWidth * dec.getHeight)
        var j = 0
        var y = 0
        while (y < dec.getHeight) {
          var x = 0
          while (x < dec.getWidth) {
            out(j) = (dec.getRGB(x, y) & 0xff).toByte
            j += 1; x += 1
          }
          y += 1
        }
        md.reset()
        // fingerprint the HEX of the pixel bytes, not the raw bytes:
        // hex is ASCII, so the DuckDB replica can md5 it even when a
        // byte-truncated payload is not valid UTF-8 (DuckDB's md5 is
        // VARCHAR-only — raw bytes would force an ASCII-corpus
        // assumption)
        val hexPix = out.map("%02x".format(_)).mkString
        val pixelMd5 = md.digest(
          hexPix.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          .map("%02x".format(_)).mkString
        (docId, fmt, dec.getWidth, dec.getHeight,
          (dec.getWidth.toLong * dec.getHeight), pixelMd5)
      }
    }.toDF("doc_id", "format", "width", "height", "n_pixels", "pixel_md5")
      .orderBy("doc_id")
  }

  /** Scala-UDF escape hatch (JavaScriptFilter analogue, reference
    * FilterOperation.scala:278: Druid-only JS predicates become Scala
    * UDFs in the Spark rebuild). The predicate itself is arbitrary JVM
    * code; this one is chosen to be SQL-expressible so the oracle can
    * check it. UDFs break codegen/pushdown — reserved for logic the
    * function library can't express. */
  def q27(s: SparkSession, d: String): DataFrame = {
    s.udf.register("js_pred",
      (k: Long) => ((k % 100003L) * 31L + 7L) % 100L < 15L)
    orders(s, d)
      .filter(expr("js_pred(o_orderkey)"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("o_orderpriority")
  }

  /** Typed Aggregator UDAF (reference UDAF surface,
    * UDFRegistration.scala:10-28): exact sum-of-squares with a custom
    * buffer + merge, plus variance derived from the exact partials. */
  def q28(s: SparkSession, d: String): DataFrame = {
    val sq = udaf(graft.functions.Udafs.sumOfSquares)
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        sq(col("o_totalprice")).as("sum_sq"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .withColumn("variance",
        (col("sum_sq") - col("total") * col("total") / col("n")) / col("n"))
      .orderBy("o_orderpriority")
  }

  /** Perceptual-hash (aHash) image near-dup pairs — the IMAGE leg of
    * the dedup stack (text: dd01-dd08, binary chunks: mm05): each
    * payload is decoded through the real javax.imageio path (the same
    * codec mm03 exercises), the decoded grayscale pixels vote a
    * mean-threshold bit each (bit_i = pix_i·n ≥ Σpix — exact integer
    * arithmetic, no float mean), and the ≤48-bit hash is blocked on
    * four 12-bit chunks exactly like dd04's SimHash: two hashes within
    * Hamming ≤ 3 must agree on ≥1 chunk (pigeonhole — the blocked join
    * is lossless), so candidate generation is an equi-join on
    * (w, h, chunk), never all-pairs over the corpus. The oracle
    * replicates the pixels from the source bytes (the round-trip is
    * lossless) and brute-forces the pair set the blocking must equal.
    * At 100 TB the decode is the scan-time cost and the join shuffles
    * on the chunk key; a degenerate hot chunk (constant-color corpora)
    * caps exactly as dd04/sim04 do. */
  def mm06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val sig = graft.core.Caches.memo(s, s"mm06|$d") {
      payloads.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (docId, bytes) =>
          val w = (docId % 5 + 4).toInt
          val h = (docId % 3 + 4).toInt
          val n = w * h
          val pix = java.util.Arrays.copyOf(bytes, n)
          java.util.Arrays.fill(pix, math.min(bytes.length, n), n, ' '.toByte)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < n) {
            val v = pix(i) & 0xff
            img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
            i += 1
          }
          val fmt = if (docId % 2 == 0) "png" else "bmp"
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, baos)
          val dec = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(baos.toByteArray))
          // aHash over the DECODED pixels: exact integer mean vote
          var sum = 0L
          var j = 0
          val dn = dec.getWidth * dec.getHeight
          val g = new Array[Int](dn)
          var y = 0
          while (y < dec.getHeight) {
            var x = 0
            while (x < dec.getWidth) {
              g(j) = dec.getRGB(x, y) & 0xff
              sum += g(j); j += 1; x += 1
            }
            y += 1
          }
          var hash = 0L
          j = 0
          while (j < dn) {
            if (g(j).toLong * dn >= sum) hash |= 1L << j
            j += 1
          }
          (docId, dec.getWidth, dec.getHeight, hash)
        }
      }.toDF("doc_id", "w", "h", "ahash")
    }
    val ex = sig.select(col("doc_id"), col("w"), col("h"), col("ahash"),
        explode(expr("sequence(0, 3)")).as("ci"))
      .withColumn("cv", expr("shiftright(ahash, ci * 12) & 4095"))
    val a = ex.select(col("w"), col("h"), col("ci"), col("cv"),
      col("doc_id").as("x"), col("ahash").as("ha"))
    val b = ex.select(col("w"), col("h"), col("ci"), col("cv"),
      col("doc_id").as("y"), col("ahash").as("hb"))
    a.join(b, Seq("w", "h", "ci", "cv"))
      .filter(col("x") < col("y"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("bigint"))
      .filter(col("hamming") <= 3)
      .select("x", "y", "hamming").distinct()
      .orderBy("x", "y")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm06_phash_neardup" -> (mm06 _),
    "q27_udf_filter" -> (q27 _),
    "q28_custom_udaf" -> (q28 _),
    "q24_supplier_star" -> (q24 _),
    "q29_weekly_grain" -> (q29 _),
    "q25_props_json" -> (q25 _),
    "q26_lookup_decode_join" -> (q26 _),
    "sql01_front_door" -> (sql01 _),
    "tx05_bpe_pieces" -> (tx05 _),
    "mm02_frame_chunks" -> (mm02 _),
    "mm03_decode" -> (mm03 _),
    "mm04_resize_stride" -> (mm04 _),
  )

  val oracle: Map[String, String] = Map(
    // pixels replicated from the source bytes (lossless round-trip),
    // aHash votes in exact integer arithmetic, brute-force pair set —
    // which the blocked join must EQUAL (chunking lossless at
    // Hamming ≤ 3 by pigeonhole over 4 chunks)
    "mm06_phash_neardup" ->
      """WITH g AS (SELECT doc_id, hex(encode(text)) hx,
        |  CAST(doc_id % 5 + 4 AS INTEGER) w, CAST(doc_id % 3 + 4 AS INTEGER) h
        |  FROM documents),
        |p AS (SELECT doc_id, w, h, w*h n,
        |  list_transform(range(0, w*h), i ->
        |    CASE WHEN 2*i + 2 <= length(hx)
        |         THEN ('0x' || substr(hx, 2*i + 1, 2))::INTEGER ELSE 32 END) pix
        |  FROM g),
        |ps AS (SELECT doc_id, w, h, n, pix, list_sum(pix) s FROM p),
        |hsh AS (SELECT doc_id, w, h,
        |  CAST(list_sum(list_transform(range(0, n), i ->
        |    CASE WHEN pix[i+1] * n >= s THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) ahash
        |  FROM ps)
        |SELECT a.doc_id x, b.doc_id y,
        |  CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) hamming
        |FROM hsh a JOIN hsh b ON a.w = b.w AND a.h = b.h AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        |ORDER BY x, y""".stripMargin,
    // the imageio round-trip is pixel-lossless (24-bit RGB), so the
    // decoded pixel bytes are exactly the first w*h UTF-8 text BYTES
    // (space-padded). Both sides hash the lowercase HEX of those bytes
    // (mm06's byte-slicing discipline): hex slicing is bytewise like
    // the operator, so non-ASCII corpora — where a byte cut can split
    // a codepoint — verify identically
    "mm03_decode" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
        | CAST(doc_id % 5 + 4 AS INTEGER) AS width,
        | CAST(doc_id % 3 + 4 AS INTEGER) AS height,
        | CAST((doc_id % 5 + 4) * (doc_id % 3 + 4) AS BIGINT) AS n_pixels,
        | md5(substr(lower(hex(encode(text))) || repeat('20', 48), 1,
        |            2 * CAST((doc_id % 5 + 4) * (doc_id % 3 + 4) AS INTEGER))) AS pixel_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q27_udf_filter" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE ((o_orderkey % 100003) * 31 + 7) % 100 < 15
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q28_custom_udaf" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_sq,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        | COUNT(*) AS n,
        | (CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |   - CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |     * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) / COUNT(*) AS variance
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q29_weekly_grain" ->
      """SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1 ORDER BY week_start""".stripMargin,
    "q24_supplier_star" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT l_suppkey) AS n_suppliers,
        | COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q25_props_json" ->
      """SELECT event_type,
        | CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decile,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, k_decile""".stripMargin,
    "q26_lookup_decode_join" ->
      """SELECT COALESCE(l.zone, r_name) AS zone, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |LEFT JOIN (VALUES ('ASIA', 'East'), ('EUROPE', 'North'),
        |  ('AMERICA', 'West')) AS l(r_key, zone) ON r_name = l.r_key
        |GROUP BY 1 ORDER BY zone""".stripMargin,
    "sql01_front_door" -> sql01Text,
    "tx05_bpe_pieces" ->
      """WITH p AS (SELECT doc_id, text,
        |  regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS pieces
        | FROM documents)
        |SELECT doc_id, len(pieces) AS n_pieces,
        | len(list_filter(pieces, p -> regexp_matches(p, '^[A-Za-z]+$'))) AS n_alpha,
        | len(list_filter(pieces, p -> regexp_matches(p, '^[0-9]+$'))) AS n_digit,
        | len(list_filter(pieces, p -> NOT regexp_matches(p, '^[A-Za-z0-9]'))) AS n_punct,
        | CAST(len(pieces) AS DOUBLE) / length(text) AS pieces_per_char
        |FROM p ORDER BY doc_id""".stripMargin,
    "mm04_resize_stride" ->
      """WITH r AS (
        | SELECT doc_id, text,
        |  array_to_string(list_transform(range(1, length(text) + 1, 4),
        |    i -> substring(text, CAST(i AS BIGINT), 1)), '') AS resized
        | FROM documents)
        |SELECT doc_id, length(text) AS n_orig, length(resized) AS n_resized,
        | md5(resized) AS resized_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm02_frame_chunks" ->
      """WITH f AS (
        | SELECT doc_id, text,
        |  unnest(generate_series(1, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i
        | FROM documents)
        |SELECT doc_id, i - 1 AS frame_idx,
        | md5(substring(text, (i - 1) * 64 + 1, 64)) AS frame_md5,
        | length(substring(text, (i - 1) * 64 + 1, 64)) AS frame_len
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
