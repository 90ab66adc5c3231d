package graft.tools

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Seeded ADVERSARIAL relational-corpus generator — the star-schema
  * twin of [[CorpusGen]] and the last uncovered axis of the
  * differential program (r17 verdict, ranked task #1): RequestFuzzSpec
  * proves query-space coverage over ONE fixed dataset; this draws
  * random DATASETS for that same battery, so the semantic layer's
  * planner/renderer agreement is exercised at the inputs where
  * relational engines actually break:
  *
  *  - Zipf-skewed foreign keys (custkey 1 carries ~15% of orders,
  *    key 2 ~5%) plus DANGLING keys (orders whose customer row does
  *    not exist — inner vs left-join classification must still agree);
  *  - NULL-dense columns: status/priority/date/price/mktsegment/
  *    nationkey/regionkey/returnflag/value all go NULL at a per-seed
  *    rate — COUNT(col) vs COUNT(*), NULL group keys, NOT-IN
  *    semantics, display-default reverse mappings over NULL storage;
  *  - decimal/double edge values: ±0.0, DECIMAL(12,2) extremes,
  *    sub-cent prices, negative money, sums crossing zero;
  *  - date boundaries: o_orderdate heavily weighted onto the request
  *    windows' exact endpoints (boundary inclusivity), plus intra-day
  *    timestamps ON the endpoint day; events.ts planted at exact
  *    local-midnight instants ±1s/±1min for each request timezone
  *    (incl. the :30-offset zone) so grain truncation and half-open
  *    window edges are hit from both sides;
  *  - degenerate shapes by seed profile: empty region + 1-row nation,
  *    EMPTY orders (grand totals / pagination / curators over zero
  *    rows), empty lineitem, duplicate non-key dim attributes
  *    (two nations named alike — IN filters matching several rows);
  *  - garbage enum values ('X' status, unmapped priorities) that must
  *    flow through static-mapping DEFAULT branches identically in the
  *    planner and the independently-rendered dual.
  *
  * Everything is a pure function of the seed. Customer names stay
  * UNIQUE (the cube declares "Customer Name" a candidate key — the
  * GenSf1 lesson: violating a declared invariant tests nothing).
  * The battery itself lives in the test-side RelFuzzBattery object;
  * the corpora are written by [[RelCorpusGen.writeCorpus]] as
  * single-file parquet tables in the driver's testdata layout. */
object RelCorpusGen {

  val Regions = Vector("ASIA", "AMERICA", "EUROPE", "AFRICA", "MIDDLE EAST")
  val Nations = Vector("CHINA", "INDIA", "FRANCE", "BRAZIL", "CANADA",
    "JAPAN", "GERMANY", "PERU", "KENYA", "EGYPT", "SPAIN", "RUSSIA",
    "MOROCCO", "IRAN", "IRAQ", "JORDAN", "VIETNAM", "ROMANIA", "ALGERIA",
    "ARGENTINA", "ETHIOPIA", "MOZAMBIQUE", "UNITED STATES", "UNITED KINGDOM",
    "INDONESIA")
  val Priorities = Vector("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  val Segments = Vector("AUTOMOBILE", "BUILDING", "FURNITURE",
    "MACHINERY", "HOUSEHOLD")
  val EventTypes = Vector("click", "error", "purchase", "signup", "view")
  /** The request vocabulary's date pool (RelFuzzBattery draws windows
    * from these) — the generator over-weights EXACTLY these endpoints
    * so boundary inclusivity is populated, not vacuous. */
  val BoundaryDates = Vector("1992-06-01", "1993-03-15", "1994-01-01",
    "1995-01-01", "1995-08-20", "1996-06-30", "1997-02-01", "1998-05-01")
  val Zones = Vector("UTC", "America/Los_Angeles", "Asia/Kolkata",
    "Europe/Berlin")

  /** Per-seed adversarial profile. */
  final case class Profile(seed: Int) {
    private val r = new Random(seed * 2654435761L + 13)
    val emptyRegion: Boolean = seed % 5 == 1
    val singleNation: Boolean = seed % 5 == 1
    val emptyOrders: Boolean = seed % 5 == 2
    val emptyLineitem: Boolean = seed % 5 == 3
    val dupNationNames: Boolean = seed % 5 == 4 || seed % 5 == 0
    /** NULL probability (percent) for nullable columns. */
    val nullPct: Int = if (seed % 5 == 4) 30 else if (seed % 2 == 0) 8 else 2
    val nOrders: Int = if (emptyOrders) 0 else 600 + r.nextInt(1400)
    val nCustomers: Int = 150 + r.nextInt(750)
    val nLineitem: Int = if (emptyLineitem) 0 else 800 + r.nextInt(2200)
    val nEvents: Int = 1200 + r.nextInt(1200)
    override def toString: String =
      s"seed=$seed nulls=$nullPct% orders=$nOrders cust=$nCustomers " +
        s"line=$nLineitem events=$nEvents" +
        (if (emptyRegion) " EMPTY-REGION/1-NATION" else "") +
        (if (emptyOrders) " EMPTY-ORDERS" else "") +
        (if (emptyLineitem) " EMPTY-LINEITEM" else "") +
        (if (dupNationNames) " DUP-NATION-NAMES" else "")
  }

  // column-level draw helpers -------------------------------------

  private def orNull[T >: Null](r: Random, pct: Int, v: => T): T =
    if (r.nextInt(100) < pct) null else v

  /** Zipf-ish custkey over 1..1500 (the battery's filter domain):
    * 15% on key 1, 5% on key 2, 3% on key 3, rest uniform — uniform
    * tail keys may DANGLE past the generated customer count. */
  private def zipfCustkey(r: Random): Long = {
    val x = r.nextInt(100)
    if (x < 15) 1L else if (x < 20) 2L else if (x < 23) 3L
    else 1L + r.nextInt(1500)
  }

  private def price(r: Random): java.lang.Double = r.nextInt(20) match {
    case 0 => 0.0
    case 1 => -0.0
    case 2 => 0.01
    case 3 => 9999999999.99
    case 4 => -9999999999.99
    case 5 => -(r.nextInt(100000000) / 100.0)
    case 6 => 1e-2 * r.nextInt(3) // 0, 0.01, 0.02
    case _ => r.nextInt(60000000) / 100.0
  }

  private def orderDate(r: Random): java.sql.Timestamp = {
    val base = r.nextInt(10) match {
      case x if x < 6 => // exact request-window endpoints
        java.time.LocalDate.parse(
          BoundaryDates(r.nextInt(BoundaryDates.length))).atStartOfDay()
      case x if x < 8 => // random midnight 1992-1998
        java.time.LocalDate.of(1992 + r.nextInt(7), 1 + r.nextInt(12),
          1 + r.nextInt(28)).atStartOfDay()
      case _ => // INTRA-DAY time on an endpoint day: the planner and
        // the dual must agree the day-grain Between is midnight-
        // inclusive at both ends (a <= endpoint render keeps 00:00
        // and drops 10:30 of the 'to' day, identically)
        java.time.LocalDate.parse(
          BoundaryDates(r.nextInt(BoundaryDates.length)))
          .atTime(1 + r.nextInt(23), r.nextInt(60), r.nextInt(60))
    }
    java.sql.Timestamp.valueOf(base)
  }

  private def status(r: Random, nullPct: Int): String =
    orNull(r, nullPct,
      r.nextInt(10) match {
        case x if x < 7 => Vector("O", "F", "P")(r.nextInt(3))
        case 8 => "X" // unmapped → display default 'Unknown'
        case _ => ""
      })

  private def priority(r: Random, nullPct: Int): String =
    orNull(r, nullPct,
      if (r.nextInt(10) < 8) Priorities(r.nextInt(Priorities.length))
      else "9-GARBAGE")

  // tables ---------------------------------------------------------

  /** (r_regionkey, r_name) */
  def region(p: Profile): Seq[(Int, String)] =
    if (p.emptyRegion) Seq.empty
    else Regions.zipWithIndex.map { case (n, i) => (i, n) }

  /** (n_nationkey, n_name, n_regionkey nullable) */
  def nation(p: Profile): Seq[(Int, String, Integer)] = {
    val r = new Random(p.seed * 7901 + 3)
    if (p.singleNation) Seq((0, Nations(r.nextInt(8)), Integer.valueOf(0)))
    else {
      val base = Nations.zipWithIndex.map { case (n, i) =>
        (i, n,
          orNull(r, p.nullPct / 2, Integer.valueOf(r.nextInt(5))))
      }
      if (p.dupNationNames)
        // duplicate NON-KEY attribute: a second nation named like an
        // existing one (IN ('CHINA') now matches two keys)
        base ++ Seq((25, base.head._2, Integer.valueOf(r.nextInt(5))),
          (26, base(1)._2, null: Integer))
      else base
    }
  }

  /** (c_custkey, c_name UNIQUE, c_nationkey nullable, c_acctbal,
    * c_mktsegment nullable) */
  def customer(p: Profile): Seq[(Long, String, Integer, Double, String)] = {
    val r = new Random(p.seed * 104003 + 7)
    val nationKeys = nation(p).map(_._1)
    (1 to p.nCustomers).map { i =>
      val nk: Integer = orNull(r, p.nullPct,
        if (r.nextInt(20) == 0) Integer.valueOf(999) // dangling
        else Integer.valueOf(nationKeys(r.nextInt(nationKeys.length))))
      (i.toLong, f"Customer#$i%09d", nk,
        (r.nextInt(2000000) - 1000000) / 100.0,
        orNull(r, p.nullPct, Segments(r.nextInt(Segments.length))))
    }
  }

  /** (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    * o_orderpriority) — custkey Zipf + dangling, dates on window
    * boundaries, prices at decimal edges. */
  def orders(p: Profile)
      : Seq[(Long, java.lang.Long, String, java.lang.Double,
        java.sql.Timestamp, String)] = {
    val r = new Random(p.seed * 15485863L + 11)
    (1 to p.nOrders).map { i =>
      (i.toLong,
        orNull(r, p.nullPct / 2, java.lang.Long.valueOf(zipfCustkey(r))),
        status(r, p.nullPct),
        orNull(r, p.nullPct, java.lang.Double.valueOf(price(r))),
        orNull(r, p.nullPct, orderDate(r)),
        priority(r, p.nullPct))
    }
  }

  /** (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    * l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    * l_shipdate) */
  def lineitem(p: Profile)
      : Seq[(Long, Long, Long, Int, java.lang.Double, java.lang.Double,
        Double, Double, String, String, java.sql.Timestamp)] = {
    val r = new Random(p.seed * 32452843L + 17)
    (1 to p.nLineitem).map { i =>
      val ok = if (r.nextInt(10) == 0) 1L else 1L + r.nextInt(math.max(1, p.nOrders + 50))
      (ok, 1L + r.nextInt(2000), 1L + r.nextInt(100),
        // line-role mapping: 1→Primary, 2→Secondary, else Additional —
        // include 0 and high values so the DEFAULT branch is populated
        r.nextInt(12) match {
          case 0 => 0
          case 1 => 9
          case x => 1 + (x % 4)
        },
        orNull(r, p.nullPct, java.lang.Double.valueOf(
          if (r.nextInt(15) == 0) 0.0 else (1 + r.nextInt(5000)) / 100.0)),
        orNull(r, p.nullPct / 2, java.lang.Double.valueOf(price(r))),
        r.nextInt(11) / 100.0, r.nextInt(9) / 100.0,
        orNull(r, p.nullPct,
          if (r.nextInt(12) == 0) "Z" else Vector("A", "N", "R")(r.nextInt(3))),
        Vector("O", "F")(r.nextInt(2)),
        java.sql.Timestamp.valueOf(java.time.LocalDate
          .of(1992 + r.nextInt(7), 1 + r.nextInt(12), 1 + r.nextInt(28))
          .atStartOfDay()))
    }
  }

  /** (event_id, ts, user_id, event_type, value, props) — ts planted
    * at exact local-midnight/hour/minute boundaries for each request
    * timezone, ±1s and ±1min around them, over Jan 1-17 2024 (the
    * grain battery's draw range). */
  def events(p: Profile)
      : Seq[(Long, java.sql.Timestamp, java.lang.Long, String,
        java.lang.Double, String)] = {
    val r = new Random(p.seed * 49979687L + 23)
    val rows = ArrayBuffer.empty[(java.sql.Timestamp, String, java.lang.Double)]
    def instant(ldt: java.time.LocalDateTime, zone: String): java.sql.Timestamp =
      java.sql.Timestamp.from(
        ldt.atZone(java.time.ZoneId.of(zone)).toInstant)
    def etype(): String = orNull(r, p.nullPct,
      if (r.nextInt(12) == 0) "hover"
      else EventTypes(r.nextInt(EventTypes.length)))
    def value(): java.lang.Double = orNull(r, p.nullPct,
      java.lang.Double.valueOf(r.nextInt(12) match {
        case 0 => 0.0
        case 1 => -0.0
        case 2 => 1e8 + r.nextInt(1000)
        case 3 => 1e-6 * r.nextInt(1000)
        case _ => r.nextInt(100000) / 1000.0
      }))
    // boundary plants: local midnight of each day in each zone, ±1s,
    // ±1min — straddles every Day window edge and, via the ±1min rows,
    // Minute-grain edges; Kolkata's +05:30 lands them mid-hour in UTC
    for (day <- 1 to 17; zone <- Zones) {
      val mid = java.time.LocalDate.of(2024, 1, day).atStartOfDay()
      for (off <- Seq(0L, -1L, 1L, -60L, 60L))
        if (r.nextInt(3) == 0)
          rows += ((instant(mid.plusSeconds(off), zone), etype(), value()))
    }
    // hour/minute boundary plants within the battery's window span
    for (_ <- 1 to p.nEvents / 6) {
      val ldt = java.time.LocalDateTime.of(2024, 1, 2 + r.nextInt(14),
        r.nextInt(24), r.nextInt(60), 0)
      rows += ((instant(ldt, Zones(r.nextInt(Zones.length))), etype(), value()))
    }
    // random fill with second-level times
    while (rows.length < p.nEvents) {
      val ldt = java.time.LocalDateTime.of(2024, 1, 1 + r.nextInt(17),
        r.nextInt(24), r.nextInt(60), r.nextInt(60))
      rows += ((instant(ldt, "UTC"), etype(), value()))
    }
    val janRows = rows.take(p.nEvents)
    // DST-TRANSITION plants (r18 verdict ranked task #2 — the
    // grain×tz machinery had never crossed a transition): events
    // straddling each 2024 switch of the DST battery's zones, as UTC
    // INSTANTS (local→UTC of a skipped/repeated wall time is
    // engine-policy; UTC→local is total and engines agree). ±1s/±30m/
    // ±1h around the transition instant populate the 23-hour day's
    // missing hour edge and BOTH UTC hours that fold into the
    // repeated local hour, plus local midnights ±1s of the
    // transition day and its neighbors (window edges). Appended
    // AFTER the Jan draws so every existing seed's first nEvents
    // (ts, type, value) triples keep their pre-r19 values — but NOT
    // the whole rows: this loop consumes draws from the shared `r`
    // BEFORE the final .map below draws user_id/null/props per row,
    // so those columns differ from pre-r19 corpora for every seed
    // (r19 ADVICE). All committed corpora/relduck artifacts were
    // (re)generated with the current stream and re-verify as such;
    // do not treat pre-r19 recorded results as comparable.
    for ((utcTransition, zone) <- DstTransitions) {
      val t = java.time.LocalDateTime.parse(utcTransition)
      for (off <- Seq(-3600L, -1800L, -1L, 0L, 1L, 1800L, 3599L, 3600L))
        if (r.nextInt(3) > 0)
          rows += ((instant(t.plusSeconds(off), "UTC"), etype(), value()))
      val day = t.atZone(java.time.ZoneId.of("UTC"))
        .withZoneSameInstant(java.time.ZoneId.of(zone)).toLocalDate
      for (d <- -1 to 2; off <- Seq(0L, -1L, 1L))
        if (r.nextInt(3) == 0)
          rows += ((instant(day.plusDays(d).atStartOfDay.plusSeconds(off),
            zone), etype(), value()))
    }
    (janRows ++ rows.drop(p.nEvents)).zipWithIndex.map { case ((ts, t, v), i) =>
      ((i + 1).toLong, ts,
        orNull(r, p.nullPct / 2, java.lang.Long.valueOf(
          if (r.nextInt(100) < 15) 1L else 1L + r.nextInt(500))),
        t, v,
        orNull(r, 50, s"""{"k":${r.nextInt(10)}}"""))
    }.toSeq
  }

  /** 2024 DST transition instants (UTC) of the DST-battery zones:
    * America/New_York Mar 10 07:00Z (spring fwd, 23-hour local day)
    * and Nov 3 06:00Z (fall back, 25-hour day); Australia/Sydney
    * Apr 6 16:00Z (fall back) and Oct 5 16:00Z (spring fwd) —
    * southern hemisphere, opposite season. */
  val DstTransitions: Seq[(String, String)] = Seq(
    ("2024-03-10T07:00:00", "America/New_York"),
    ("2024-11-03T06:00:00", "America/New_York"),
    ("2024-04-06T16:00:00", "Australia/Sydney"),
    ("2024-10-05T16:00:00", "Australia/Sydney"))

  // writer -----------------------------------------------------------

  /** Write the seed's corpus as single-file parquet tables under
    * `dir` (the driver's testdata layout). */
  def writeCorpus(spark: org.apache.spark.sql.SparkSession, seed: Int,
      dir: String): Profile = {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val p = Profile(seed)
    new java.io.File(dir).mkdirs()
    def write(name: String, schema: StructType, rows: Seq[R]): Unit = {
      val l = new java.util.ArrayList[R](rows.size)
      rows.foreach(l.add)
      spark.createDataFrame(l, schema).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    write("region", StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
      region(p).map { case (k, n) => R(k, n) })
    write("nation", StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
      nation(p).map { case (k, n, rk) => R(k, n, rk) })
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
      customer(p).map { case (k, n, nk, b, m) => R(k, n, nk, b, m) })
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))),
      orders(p).map { case (k, c, s, t, d, pr) => R(k, c, s, t, d, pr) })
    write("lineitem", StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
      lineitem(p).map { case (a, b, c, d, e, f, g, h, i, j, k) =>
        R(a, b, c, d, e, f, g, h, i, j, k) })
    write("events", StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
      events(p).map { case (a, b, c, d, e, f) => R(a, b, c, d, e, f) })
    p
  }
}
