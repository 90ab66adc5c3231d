package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.Assertions

/** The randomized request→SQL differential BATTERY, extracted from
  * RequestFuzzSpec (r16) and parameterized by the data directory so
  * it runs over GENERATED star-schema corpora (RelCorpusFuzzSpec,
  * r17 verdict ranked task #1) as well as the fixed sf0.001 corpus
  * (RequestFuzzSpec). Every generator draws a random VALID request
  * over the registered cubes and independently renders its ANSI-SQL
  * dual over the RAW tables; both run in the same Spark session and
  * must agree as row multisets with identical column sets. The dual
  * rendering is deliberately data-independent — which is exactly what
  * lets the same battery pressure-test NULL-dense, Zipf-skewed,
  * empty-table, duplicate-attribute corpora without re-deriving a
  * single oracle. */
object RelFuzzBattery extends Assertions {

  // ---------------------------------------------------------------
  // vocabulary: the order_stats / line_stats public surface with each
  // alias's independent SQL rendering over the raw tables
  // ---------------------------------------------------------------

  case class Fld(alias: String, sql: String,
      dim: Option[String]) // owning dimension, None = fact-level

  private val statusCase =
    "CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled' " +
      "WHEN 'P' THEN 'Pending' ELSE 'Unknown' END"

  val factDims = Seq(
    Fld("Order Priority", "o_orderpriority", None),
    Fld("Order Status", statusCase, None),
    Fld("Customer Key", "o_custkey", None),
    Fld("Order Date", "date_format(o_orderdate, 'yyyy-MM-dd')", None))

  val dimAttrs = Seq(
    Fld("Customer Name", "c_name", Some("customer")),
    Fld("Market Segment", "c_mktsegment", Some("customer")),
    Fld("Nation Key", "c_nationkey", Some("customer")),
    Fld("Nation Name", "n_name", Some("nation")),
    Fld("Region Name", "r_name", Some("region")))

  private val spendSql =
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)"
  val metrics = Seq(
    Fld("Order Count", "COUNT(*)", None),
    Fld("Total Spend", spendSql, None),
    Fld("Max Price",
      "CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)", None),
    Fld("Avg Price", s"$spendSql / COUNT(o_totalprice)", None),
    Fld("Distinct Customers", "COUNT(DISTINCT o_custkey)", None),
    Fld("Avg Order Value", s"$spendSql / COUNT(*)", None))

  /** One filter leaf/tree: its request-JSON fragment, its SQL
    * predicate, and where it applies. */
  case class Filt(json: String, sql: String,
      fields: Seq[String], hasDimAttr: Boolean, isMetric: Boolean)

  val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "MACHINERY", "HOUSEHOLD")
  val regions = Seq("ASIA", "AMERICA", "EUROPE", "AFRICA",
    "MIDDLE EAST")
  val nations = Seq("CHINA", "INDIA", "FRANCE", "BRAZIL",
    "CANADA", "JAPAN", "GERMANY", "PERU")
  val dates = Seq("1992-06-01", "1993-03-15", "1994-01-01",
    "1995-01-01", "1995-08-20", "1996-06-30", "1997-02-01", "1998-05-01")

  def jIn(field: String, vs: Seq[String]): String =
    s"""{"field":"$field","operator":"in","values":[${
      vs.map(v => "\"" + v + "\"").mkString(",")}]}"""
  def jEq(field: String, v: String): String =
    s"""{"field":"$field","operator":"=","value":"$v"}"""

  /** Order Status display values → storage predicate, replicating the
    * engine's reverse mapping incl. the default ('Unknown' = any
    * storage value outside the map). */
  private def statusPred(vs: Seq[String]): String = {
    val stor = Map("Open" -> "'O'", "Fulfilled" -> "'F'", "Pending" -> "'P'")
    val named = vs.distinct.filter(_ != "Unknown").map(stor)
    val branches =
      (if (named.nonEmpty)
        Seq(s"o_orderstatus IN (${named.mkString(",")})") else Nil) ++
        (if (vs.contains("Unknown"))
          Seq("NOT o_orderstatus IN ('F','O','P')") else Nil)
    "(" + branches.mkString(" OR ") + ")"
  }

  def pick[T](rnd: scala.util.Random, xs: Seq[T]): T =
    xs(rnd.nextInt(xs.size))
  def subset[T](rnd: scala.util.Random, xs: Seq[T],
      lo: Int, hi: Int): Seq[T] =
    rnd.shuffle(xs).take(lo + rnd.nextInt(hi - lo + 1))

  /** A random DIMENSION-side filter leaf (fact-level or dim-attr). */
  private def dimLeaf(rnd: scala.util.Random): Filt =
    rnd.nextInt(9) match {
      case 0 =>
        val Seq(a, b) = subset(rnd, dates, 2, 2).sorted
        Filt(s"""{"field":"Order Date","operator":"between","from":"$a","to":"$b"}""",
          s"(o_orderdate >= '$a' AND o_orderdate <= '$b')",
          Seq("Order Date"), hasDimAttr = false, isMetric = false)
      case 1 =>
        val vs = subset(rnd, Seq("Open", "Fulfilled", "Pending", "Unknown"), 1, 3)
        Filt(jIn("Order Status", vs), statusPred(vs),
          Seq("Order Status"), hasDimAttr = false, isMetric = false)
      case 2 =>
        val v = pick(rnd, Seq("Open", "Fulfilled", "Pending"))
        if (rnd.nextBoolean())
          Filt(jEq("Order Status", v), statusPred(Seq(v)),
            Seq("Order Status"), hasDimAttr = false, isMetric = false)
        else
          Filt(s"""{"field":"Order Status","operator":"<>","value":"$v"}""",
            s"(NOT ${statusPred(Seq(v))})",
            Seq("Order Status"), hasDimAttr = false, isMetric = false)
      case 3 =>
        val vs = subset(rnd, priorities, 1, 3)
        Filt(jIn("Order Priority", vs),
          s"o_orderpriority IN (${vs.map(v => s"'$v'").mkString(",")})",
          Seq("Order Priority"), hasDimAttr = false, isMetric = false)
      case 4 =>
        val p = pick(rnd, Seq("1%", "%URGENT%", "%H", "%MEDIUM%", "5%"))
        val neg = rnd.nextBoolean()
        Filt(s"""{"field":"Order Priority","operator":"${
            if (neg) "not like" else "like"}","value":"$p"}""",
          (if (neg) "NOT " else "") + s"o_orderpriority LIKE '$p'",
          Seq("Order Priority"), hasDimAttr = false, isMetric = false)
      case 5 =>
        val ks = Seq.fill(2 + rnd.nextInt(6))(1 + rnd.nextInt(1500))
          .distinct.map(_.toString)
        Filt(jIn("Customer Key", ks),
          s"o_custkey IN (${ks.mkString(",")})",
          Seq("Customer Key"), hasDimAttr = false, isMetric = false)
      case 6 =>
        val vs = subset(rnd, segments, 1, 2)
        Filt(jIn("Market Segment", vs),
          s"c_mktsegment IN (${vs.map(v => s"'$v'").mkString(",")})",
          Seq("Market Segment"), hasDimAttr = true, isMetric = false)
      case 7 =>
        val v = pick(rnd, regions)
        Filt(jEq("Region Name", v), s"r_name = '$v'",
          Seq("Region Name"), hasDimAttr = true, isMetric = false)
      case 8 =>
        val vs = subset(rnd, nations, 1, 3)
        Filt(jIn("Nation Name", vs),
          s"n_name IN (${vs.map(v => s"'$v'").mkString(",")})",
          Seq("Nation Name"), hasDimAttr = true, isMetric = false)
    }

  /** A random dimension filter TREE: a leaf, or an and/or node over
    * 2-3 leaves (mixing fact-level and dim-attr leaves is legal —
    * the sem09 shape; evaluated post-join on both sides). */
  private def dimTree(rnd: scala.util.Random): Filt =
    if (rnd.nextInt(100) < 65) dimLeaf(rnd)
    else {
      val kids = Seq.fill(2 + rnd.nextInt(2))(dimLeaf(rnd))
      val op = if (rnd.nextBoolean()) "or" else "and"
      Filt(s"""{"operator":"$op","filterExpressions":[${
          kids.map(_.json).mkString(",")}]}""",
        kids.map(_.sql).mkString("(", s" ${op.toUpperCase} ", ")"),
        kids.flatMap(_.fields), kids.exists(_.hasDimAttr),
        isMetric = false)
    }

  /** A non-date dimension leaf (TimeShift keys its window off the
    * FIRST day-grain Between, so extra filters must not collide). */
  def nonDateLeaf(rnd: scala.util.Random): Filt = {
    var f = dimLeaf(rnd)
    while (f.fields.contains("Order Date")) f = dimLeaf(rnd)
    f
  }

  /** A random metric HAVING leaf over one of the SELECTED metrics. */
  private def metricLeaf(rnd: scala.util.Random,
      selected: Seq[Fld]): Option[Filt] = {
    val eligible = selected.filter(m =>
      m.alias == "Order Count" || m.alias == "Total Spend")
    if (eligible.isEmpty) None
    else {
      val m = pick(rnd, eligible)
      val (v, sqlV) =
        if (m.alias == "Order Count") {
          val n = 1 + rnd.nextInt(5); (n.toString, n.toString)
        } else {
          val x = pick(rnd, Seq("50000", "120000", "250000")); (x, x)
        }
      val gt = rnd.nextBoolean()
      Some(Filt(
        s"""{"field":"${m.alias}","operator":"${if (gt) ">" else "<"}","value":"$v"}""",
        s"${m.sql} ${if (gt) ">" else "<"} $sqlV",
        Seq(m.alias), hasDimAttr = false, isMetric = true))
    }
  }

  /** Dims (in chain order) a field/filter set requires, with parents. */
  private def neededDims(fields: Seq[String]): Seq[String] = {
    val owned = dimAttrs.filter(d => fields.contains(d.alias))
      .flatMap(_.dim).toSet
    val withParents = owned ++
      (if (owned("region")) Set("nation", "customer") else Set.empty) ++
      (if (owned("nation")) Set("customer") else Set.empty[String])
    Seq("customer", "nation", "region").filter(withParents)
  }

  private def joinSql(dims: Seq[String], inner: Boolean): String = {
    val jt = if (inner) "JOIN" else "LEFT JOIN"
    dims.map {
      case "customer" => s" $jt customer ON o_custkey = c_custkey"
      case "nation" => s" $jt nation ON c_nationkey = n_nationkey"
      case "region" => s" $jt region ON n_regionkey = r_regionkey"
    }.mkString
  }

  def q(a: String): String = "`" + a + "`" // Spark-dialect identifier

  /** One random VALID request + its independently-rendered SQL. */
  private def genValid(rnd: scala.util.Random, shape: Int): (String, String) =
    shape match {
      // A: fact-driven aggregation over order_stats
      case 0 =>
        val dims = subset(rnd, factDims ++ dimAttrs.filter(_.alias != "Customer Name"), 0, 3)
        val mets = subset(rnd, metrics, 1, 3)
        val selected = rnd.shuffle(dims ++ mets)
        val dimFilts = Seq.fill(rnd.nextInt(3))(dimTree(rnd))
        val met = if (rnd.nextInt(100) < 30) metricLeaf(rnd, mets) else None
        // outer: an in/eq on a selected rendered dim column
        val outer = if (rnd.nextInt(100) < 20 && dims.nonEmpty) {
          val d = pick(rnd, dims)
          val vs = d.alias match {
            case "Order Priority" => subset(rnd, priorities, 1, 2)
            case "Order Status" => subset(rnd, Seq("Open", "Fulfilled", "Pending"), 1, 2)
            case "Market Segment" => subset(rnd, segments, 1, 2)
            case "Region Name" => Seq(pick(rnd, regions))
            case "Nation Name" => subset(rnd, nations, 1, 2)
            case "Nation Key" => Seq.fill(2)(rnd.nextInt(25)).distinct.map(_.toString)
            case "Customer Key" => Seq.fill(2)(1 + rnd.nextInt(1500)).distinct.map(_.toString)
            case "Order Date" => Seq(pick(rnd, dates))
          }
          val quoted = d.alias == "Order Priority" || d.alias == "Order Status" ||
            d.alias == "Market Segment" || d.alias == "Region Name" ||
            d.alias == "Nation Name" || d.alias == "Order Date"
          val lits = vs.map(v => if (quoted) s"'$v'" else v).mkString(",")
          Some((s"""{"operator":"outer","filter":${jIn(d.alias, vs)}}""",
            s"${q(d.alias)} IN ($lits)"))
        } else None
        val sorts = subset(rnd, selected, 0, math.min(2, selected.size))
          .map(f => s"""{"field":"${f.alias}","order":"${
            if (rnd.nextBoolean()) "Desc" else "Asc"}"}""")
        val filterJson = (dimFilts.map(_.json) ++ met.map(_.json) ++
          outer.map(_._1)).mkString(",")
        val json =
          s"""{"cube":"order_stats","selectFields":[${
            selected.map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]""" +
            (if (filterJson.nonEmpty) s""","filterExpressions":[$filterJson]""" else "") +
            (if (sorts.nonEmpty) s""","sortBy":[${sorts.mkString(",")}]""" else "") +
            "}"
        val inner = dimFilts.exists(_.hasDimAttr)
        val joins = joinSql(neededDims(
          dims.map(_.alias) ++ dimFilts.flatMap(_.fields)), inner)
        val selectList = selected.map(f => s"${f.sql} AS ${q(f.alias)}")
          .mkString(", ")
        val groupIdx = selected.zipWithIndex
          .filter { case (f, _) => dims.contains(f) }
          .map(_._2 + 1)
        val core =
          s"SELECT $selectList FROM orders$joins" +
            (if (dimFilts.nonEmpty)
              dimFilts.map(_.sql).mkString(" WHERE ", " AND ", "") else "") +
            (if (groupIdx.nonEmpty)
              s" GROUP BY ${groupIdx.mkString(", ")}" else "") +
            met.map(f => s" HAVING ${f.sql}").getOrElse("")
        val sql = outer match {
          case Some((_, osql)) => s"SELECT * FROM ($core) t WHERE $osql"
          case None => core
        }
        (json, sql)
      // B: grand total (metrics only, no grouping)
      case 1 =>
        val mets = subset(rnd, metrics, 1, 3)
        val dimFilts = Seq.fill(rnd.nextInt(2))(dimTree(rnd))
        val met = if (rnd.nextInt(100) < 30) metricLeaf(rnd, mets) else None
        val json =
          s"""{"cube":"order_stats","selectFields":[${
            mets.map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]""" +
            (if (dimFilts.nonEmpty || met.nonEmpty)
              s""","filterExpressions":[${
                (dimFilts.map(_.json) ++ met.map(_.json)).mkString(",")}]"""
            else "") + "}"
        val inner = dimFilts.exists(_.hasDimAttr)
        val joins = joinSql(neededDims(dimFilts.flatMap(_.fields)), inner)
        val sql =
          s"SELECT ${mets.map(f => s"${f.sql} AS ${q(f.alias)}").mkString(", ")} " +
            s"FROM orders$joins" +
            (if (dimFilts.nonEmpty)
              dimFilts.map(_.sql).mkString(" WHERE ", " AND ", "") else "") +
            met.map(f => s" HAVING ${f.sql}").getOrElse("")
        (json, sql)
      // C: factless dimension listing (DISTINCT over the dim chain,
      // starting at the most granular requested/filtered dim)
      case 2 =>
        val sel = subset(rnd, dimAttrs, 1, 2)
        val filt =
          if (rnd.nextBoolean()) {
            val v = pick(rnd, segments)
            Some((jEq("Market Segment", v), s"c_mktsegment = '$v'", "customer"))
          } else if (rnd.nextBoolean()) {
            val v = pick(rnd, regions)
            Some((jEq("Region Name", v), s"r_name = '$v'", "region"))
          } else None
        val json =
          s"""{"cube":"order_stats","selectFields":[${
            sel.map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]""" +
            filt.map(f => s""","filterExpressions":[${f._1}]""").getOrElse("") +
            "}"
        val needed = neededDims(sel.map(_.alias) ++
          filt.map(_ => if (filt.get._3 == "customer") "Market Segment"
            else "Region Name").toSeq)
        // chain trimmed to start at the most granular involved dim
        val start = needed.head
        val rest = needed.tail
        val joins = rest.map {
          case "nation" => " JOIN nation ON c_nationkey = n_nationkey"
          case "region" =>
            if (start == "region") ""
            else if (needed.contains("nation") || start == "nation")
              " JOIN region ON n_regionkey = r_regionkey"
            else ""
        }.mkString
        val sql =
          s"SELECT DISTINCT ${sel.map(f => s"${f.sql} AS ${q(f.alias)}").mkString(", ")} " +
            s"FROM $start$joins" +
            filt.map(f => s" WHERE ${f._2}").getOrElse("")
        (json, sql)
      // D: dim-driven ROJ with pagination (the sem04 shape)
      case _ =>
        val mets = subset(rnd, metrics.take(3), 1, 2)
        val page = pick(rnd, Seq(20, 50, 100))
        val dateF = if (rnd.nextBoolean()) {
          val Seq(a, b) = subset(rnd, dates, 2, 2).sorted
          Some((s"""{"field":"Order Date","operator":"between","from":"$a","to":"$b"}""",
            s"WHERE o_orderdate >= '$a' AND o_orderdate <= '$b'"))
        } else None
        val json =
          s"""{"cube":"order_stats","selectFields":[{"field":"Customer Name"},${
            mets.map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]""" +
            dateF.map(f => s""","filterExpressions":[${f._1}]""").getOrElse("") +
            s""","dimensionDriven":true,"rowsPerPage":$page}"""
        val aggs = mets.map(f =>
          s"${f.sql} AS m_${
            f.alias.toLowerCase.replace(' ', '_')}").mkString(", ")
        val outs = mets.map(f =>
          s"f.m_${f.alias.toLowerCase.replace(' ', '_')} AS ${q(f.alias)}")
          .mkString(", ")
        val sql =
          s"""SELECT c_name AS ${q("Customer Name")}, $outs
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, $aggs FROM orders ${dateF.map(_._2).getOrElse("")}
             |  GROUP BY 1) f ON c_custkey = o_custkey
             |ORDER BY ${q("Customer Name")} LIMIT $page""".stripMargin
        (json, sql)
    }

  /** line_stats shape (int-keyed static mapping incl. the default). */
  private def genLine(rnd: scala.util.Random): (String, String) = {
    val roleCase = "CASE l_linenumber WHEN 1 THEN 'Primary' WHEN 2 THEN " +
      "'Secondary' ELSE 'Additional' END"
    val lineDims = Seq(Fld("Line Role", roleCase, None),
      Fld("Return Flag", "l_returnflag", None))
    val lineMets = Seq(Fld("Line Count", "COUNT(*)", None),
      Fld("Total Qty",
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)", None))
    val dims = subset(rnd, lineDims, 0, 2)
    val mets = subset(rnd, lineMets, 1, 2)
    val selected = rnd.shuffle(dims ++ mets)
    def rolePred(vs: Seq[String]): String = {
      val stor = Map("Primary" -> "1", "Secondary" -> "2")
      val named = vs.distinct.filter(_ != "Additional").map(stor)
      val branches =
        (if (named.nonEmpty)
          Seq(s"l_linenumber IN (${named.mkString(",")})") else Nil) ++
          (if (vs.contains("Additional"))
            Seq("NOT l_linenumber IN (1,2)") else Nil)
      "(" + branches.mkString(" OR ") + ")"
    }
    val filt = rnd.nextInt(3) match {
      case 0 =>
        val vs = subset(rnd, Seq("Primary", "Secondary", "Additional"), 1, 2)
        Some((jIn("Line Role", vs), rolePred(vs)))
      case 1 =>
        val vs = subset(rnd, Seq("A", "N", "R"), 1, 2)
        Some((jIn("Return Flag", vs),
          s"l_returnflag IN (${vs.map(v => s"'$v'").mkString(",")})"))
      case _ => None
    }
    val json =
      s"""{"cube":"line_stats","selectFields":[${
        selected.map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]""" +
        filt.map(f => s""","filterExpressions":[${f._1}]""").getOrElse("") + "}"
    val groupIdx = selected.zipWithIndex
      .filter { case (f, _) => dims.contains(f) }.map(_._2 + 1)
    val sql =
      s"SELECT ${selected.map(f => s"${f.sql} AS ${q(f.alias)}").mkString(", ")} " +
        "FROM lineitem" +
        filt.map(f => s" WHERE ${f._2}").getOrElse("") +
        (if (groupIdx.nonEmpty) s" GROUP BY ${groupIdx.mkString(", ")}" else "")
    (json, sql)
  }

  /** No generated request may plan an all-pairs join: the fuzzer
    * audits every plan it executes, not just the fixed battery
    * (PlanAuditSpec). Single-partition exchanges are NOT gated here —
    * grand totals and final orderings legitimately use them on
    * 1-row / paged results. */
  def auditPlan(df: DataFrame, clue: => String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"generated plan contains CartesianProduct — $clue")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"generated plan contains BroadcastNestedLoopJoin — $clue")
  }

  def rowsOf(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "∅"
      case v => v.toString
    }.mkString("|"))

  /** Register the raw-table views the duals read, from `sf`. */
  def registerViews(spark: SparkSession, sf: String): Unit = {
    graft.core.Tables.orders(spark, sf).createOrReplaceTempView("orders")
    graft.core.Tables.customer(spark, sf).createOrReplaceTempView("customer")
    graft.core.Tables.nation(spark, sf).createOrReplaceTempView("nation")
    graft.core.Tables.region(spark, sf).createOrReplaceTempView("region")
    graft.core.Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
  }

  private def comparePlanned(planned: DataFrame, dual: String,
      spark: SparkSession, clue: => String): Unit = {
    val oracle = spark.sql(dual)
    assert(planned.columns.toSeq.sorted == oracle.columns.toSeq.sorted,
      s"column mismatch — $clue")
    val got = rowsOf(planned.select(oracle.columns.map(col): _*)).sorted
    val want = rowsOf(oracle).sorted
    assert(got == want,
      s"DIVERGENCE — $clue\nplanned(${got.size}): ${got.take(5)}\n" +
        s"sql(${want.size}): ${want.take(5)}")
  }

  // ---------------------------------------------------------------
  // batteries as DATA (r19): each family draws `FuzzCase`s — a
  // stable name, the engine-side closure, and the independently
  // rendered ANSI dual — so ONE draw stream serves BOTH legs of the
  // differential program: the in-session run (runCases: execute,
  // audit, compare vs spark.sql(dual)) and the offline cross-engine
  // leg (RelDuckFuzzMain: execute, dump parquet, re-render the dual
  // in DuckDB dialect via RelDuckDual, compare in tools/relcheck.py).
  // Only generation consumes the Random, so the draws are identical
  // whichever leg consumes the cases.
  // ---------------------------------------------------------------

  final case class FuzzCase(name: String, clue: String,
      exec: (SparkSession, String) => DataFrame, dual: String,
      audit: Boolean = true)

  private def runCases(spark: SparkSession, sf: String,
      cases: Seq[FuzzCase]): Unit =
    cases.foreach { c =>
      val planned =
        try c.exec(spark, sf)
        catch { case e: org.scalatest.exceptions.TestFailedException => throw e
          case e: Throwable =>
          fail(s"engine refused a generated VALID case — ${c.clue} " +
            s"[sf=$sf]\nerror: ${e.getMessage}")
        }
      if (c.audit) auditPlan(planned, s"${c.clue} [sf=$sf]")
      comparePlanned(planned, c.dual, spark, s"${c.clue} [sf=$sf]")
    }

  /** shapes: 0-3 = order_stats A-D, 4 = line_stats. */
  def casesValid(rnd: scala.util.Random, plan: Seq[Int]): Seq[FuzzCase] =
    plan.zipWithIndex.map { case (shape, i) =>
      val (json, sql) =
        if (shape == 4) genLine(rnd) else genValid(rnd, shape)
      FuzzCase(f"valid_$i%03d",
        s"request #$i (shape $shape)\nJSON: $json\nSQL: $sql",
        (s, sf) => operators.SemanticQueries.run(json)(s, sf), sql)
    }

  def runValid(spark: SparkSession, sf: String, rnd: scala.util.Random,
      plan: Seq[Int]): Int = {
    val cases = casesValid(rnd, plan)
    runCases(spark, sf, cases)
    cases.size
  }

  // ---------------------------------------------------------------
  // SQL front door battery
  // ---------------------------------------------------------------

  private def sqlRun(sql: String, spark: SparkSession, sf: String): DataFrame =
    graft.analyzer.SqlFrontDoor.run(sql,
      operators.SemanticQueries.registry)(spark, sf)

  /** One random cube-SQL WHERE conjunct with its raw dual: Seq of
    * cube-side predicates (so the >=/<= pair-merge path is generated
    * too) + the shared Filt dual. */
  private def sqlLeaf(rnd: scala.util.Random): (Seq[String], Filt) =
    rnd.nextInt(10) match {
      case 0 =>
        val Seq(a, b) = subset(rnd, dates, 2, 2).sorted
        (Seq(s"`Order Date` BETWEEN '$a' AND '$b'"),
          Filt("", s"(o_orderdate >= '$a' AND o_orderdate <= '$b')",
            Seq("Order Date"), hasDimAttr = false, isMetric = false))
      case 1 => // the parser-lowered pair: must merge back to Between
        val Seq(a, b) = subset(rnd, dates, 2, 2).sorted
        (Seq(s"`Order Date` >= '$a'", s"`Order Date` <= '$b'"),
          Filt("", s"(o_orderdate >= '$a' AND o_orderdate <= '$b')",
            Seq("Order Date"), hasDimAttr = false, isMetric = false))
      case 2 =>
        val vs = subset(rnd, Seq("Open", "Fulfilled", "Pending", "Unknown"), 1, 3)
        (Seq(s"`Order Status` IN (${vs.map(v => s"'$v'").mkString(", ")})"),
          Filt("", statusPred(vs), Seq("Order Status"),
            hasDimAttr = false, isMetric = false))
      case 3 =>
        val v = pick(rnd, Seq("Open", "Fulfilled", "Pending"))
        val neg = rnd.nextBoolean()
        (Seq(s"`Order Status` ${if (neg) "<>" else "="} '$v'"),
          Filt("", (if (neg) s"(NOT ${statusPred(Seq(v))})"
            else statusPred(Seq(v))),
            Seq("Order Status"), hasDimAttr = false, isMetric = false))
      case 4 =>
        val vs = subset(rnd, priorities, 1, 3)
        (Seq(s"`Order Priority` IN (${vs.map(v => s"'$v'").mkString(", ")})"),
          Filt("", s"o_orderpriority IN (${vs.map(v => s"'$v'").mkString(",")})",
            Seq("Order Priority"), hasDimAttr = false, isMetric = false))
      case 5 =>
        val p = pick(rnd, Seq("1%", "%URGENT%", "%H", "%MEDIUM%", "5%"))
        val neg = rnd.nextBoolean()
        (Seq(s"`Order Priority` ${if (neg) "NOT LIKE" else "LIKE"} '$p'"),
          Filt("", (if (neg) "NOT " else "") + s"o_orderpriority LIKE '$p'",
            Seq("Order Priority"), hasDimAttr = false, isMetric = false))
      case 6 =>
        val ks = Seq.fill(2 + rnd.nextInt(5))(1 + rnd.nextInt(1500))
          .distinct
        val neg = rnd.nextBoolean()
        (Seq(s"`Customer Key` ${if (neg) "NOT IN" else "IN"} (${ks.mkString(", ")})"),
          Filt("", (if (neg) "NOT " else "") + s"o_custkey IN (${ks.mkString(",")})",
            Seq("Customer Key"), hasDimAttr = false, isMetric = false))
      case 7 =>
        val vs = subset(rnd, segments, 1, 2)
        (Seq(s"`Market Segment` IN (${vs.map(v => s"'$v'").mkString(", ")})"),
          Filt("", s"c_mktsegment IN (${vs.map(v => s"'$v'").mkString(",")})",
            Seq("Market Segment"), hasDimAttr = true, isMetric = false))
      case 8 =>
        val v = pick(rnd, regions)
        (Seq(s"`Region Name` = '$v'"),
          Filt("", s"r_name = '$v'", Seq("Region Name"),
            hasDimAttr = true, isMetric = false))
      case _ => // OR tree over two fact-level leaves
        val v1 = pick(rnd, priorities)
        val v2 = pick(rnd, Seq("Open", "Fulfilled", "Pending"))
        (Seq(s"(`Order Priority` = '$v1' OR `Order Status` = '$v2')"),
          Filt("", s"(o_orderpriority = '$v1' OR ${statusPred(Seq(v2))})",
            Seq("Order Priority", "Order Status"),
            hasDimAttr = false, isMetric = false))
    }

  /** One random valid cube-SQL statement + its raw dual. */
  private def genSqlValid(rnd: scala.util.Random): (String, String) = {
    val dims = subset(rnd,
      factDims ++ dimAttrs.filter(_.alias != "Customer Name"), 0, 3)
    val mets = subset(rnd, metrics, 1, 3)
    val selected = rnd.shuffle(dims ++ mets)
    // at most ONE range conjunct per field: the grammar refuses a
    // second BETWEEN/bound pair on the same field by design
    val leaves = {
      val drawn = Seq.fill(rnd.nextInt(3))(sqlLeaf(rnd))
      val (ranges, rest) = drawn.partition(
        _._2.sql.contains("o_orderdate >="))
      ranges.take(1) ++ rest
    }
    val met = if (rnd.nextInt(100) < 30) metricLeaf(rnd, mets) else None
    // ORDER BY + LIMIT only when the ordering is TOTAL (all selected
    // dims listed) — grouped rows are unique on the dim tuple, so the
    // kept page is deterministic on both sides
    val paged = rnd.nextInt(100) < 30
    val sortCols =
      if (paged) rnd.shuffle(dims)
      else subset(rnd, selected, 0, math.min(2, selected.size))
    val dirs = sortCols.map(_ => rnd.nextBoolean())
    val orderSql = sortCols.zip(dirs).map { case (f, d) =>
      s"`${f.alias}`${if (d) " DESC" else ""}" }
    val limit = if (paged) Some(5 + rnd.nextInt(20)) else None
    // metric filter rides WHERE in the cube grammar (the request
    // layer classifies it as HAVING, exactly like the JSON door)
    val wherePreds = leaves.flatMap(_._1) ++ met.map { m =>
      val gt = m.sql.contains(">")
      s"`${m.fields.head}` ${if (gt) ">" else "<"} ${m.sql.split(' ').last}"
    }
    val cube =
      s"SELECT ${selected.map(f => s"`${f.alias}`").mkString(", ")} " +
        "FROM order_stats" +
        (if (wherePreds.nonEmpty) s" WHERE ${wherePreds.mkString(" AND ")}"
          else "") +
        (if (orderSql.nonEmpty) s" ORDER BY ${orderSql.mkString(", ")}"
          else "") +
        limit.map(n => s" LIMIT $n").getOrElse("")
    val inner = leaves.exists(_._2.hasDimAttr)
    val joins = joinSql(neededDims(
      dims.map(_.alias) ++ leaves.flatMap(_._2.fields)), inner)
    val groupIdx = selected.zipWithIndex
      .filter { case (f, _) => dims.contains(f) }.map(_._2 + 1)
    val core =
      s"SELECT ${selected.map(f => s"${f.sql} AS ${q(f.alias)}").mkString(", ")} " +
        s"FROM orders$joins" +
        (if (leaves.nonEmpty)
          leaves.map(_._2.sql).mkString(" WHERE ", " AND ", "") else "") +
        (if (groupIdx.nonEmpty) s" GROUP BY ${groupIdx.mkString(", ")}"
          else "") +
        met.map(f => s" HAVING ${f.sql}").getOrElse("")
    val dual =
      if (orderSql.isEmpty && limit.isEmpty) core
      else s"SELECT * FROM ($core) t" +
        (if (orderSql.nonEmpty) s" ORDER BY ${orderSql.mkString(", ")}"
          else "") + limit.map(n => s" LIMIT $n").getOrElse("")
    (cube, dual)
  }

  def casesCubeSql(rnd: scala.util.Random, n: Int): Seq[FuzzCase] =
    (1 to n).map { i =>
      val (cube, dual) = genSqlValid(rnd)
      FuzzCase(f"sql_$i%03d", s"sql #$i\nCUBE: $cube\nDUAL: $dual",
        (s, sf) => sqlRun(cube, s, sf), dual)
    }

  def runCubeSql(spark: SparkSession, sf: String, rnd: scala.util.Random,
      n: Int): Int = {
    runCases(spark, sf, casesCubeSql(rnd, n))
    n
  }

  def casesPagination(rnd: scala.util.Random, n: Int): Seq[FuzzCase] =
    (1 to n).map { i =>
      val dims = subset(rnd,
        factDims ++ dimAttrs.filter(_.alias != "Customer Name"), 1, 2)
      val mets = subset(rnd, metrics.take(3), 1, 2)
      val selected = dims ++ mets
      val filt = if (rnd.nextBoolean()) Some(nonDateLeaf(rnd)) else None
      // a TOTAL ordering (all dims, random directions) makes every
      // page boundary deterministic on both sides
      val dirs = dims.map(_ => rnd.nextBoolean())
      val sorts = dims.zip(dirs).map { case (d, desc) =>
        s"""{"field":"${d.alias}","order":"${if (desc) "Desc" else "Asc"}"}""" }
      // adversarial boundaries: page 1, offset 0, offsets straddling
      // and past the result end
      val start = pick(rnd, Seq(0, 1, 2, 5, 10, 50, 500, 5000))
      val page = pick(rnd, Seq(1, 2, 3, 7, 20, 100))
      val json =
        s"""{"cube":"order_stats","selectFields":[${
          selected.map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]${
          filt.map(f => s""","filterExpressions":[${f.json}]""").getOrElse("")},
           |"sortBy":[${sorts.mkString(",")}],
           |"paginationStartIndex":$start,"rowsPerPage":$page}"""
          .stripMargin.replace("\n", "")
      val inner = filt.exists(_.hasDimAttr)
      val joins = joinSql(neededDims(
        dims.map(_.alias) ++ filt.toSeq.flatMap(_.fields)), inner)
      val orderBy = dims.zip(dirs).map { case (d, desc) =>
        s"${q(d.alias)}${if (desc) " DESC" else ""}" }.mkString(", ")
      val dual =
        s"""SELECT * FROM (
           |  SELECT ${selected.map(f => s"${f.sql} AS ${q(f.alias)}").mkString(", ")}
           |  FROM orders$joins${filt.map(f => s" WHERE ${f.sql}").getOrElse("")}
           |  GROUP BY ${dims.indices.map(_ + 1).mkString(", ")}) t
           |ORDER BY $orderBy LIMIT $page OFFSET $start"""
          .stripMargin.replace("\n", " ")
      FuzzCase(f"page_$i%03d",
        s"page #$i start=$start page=$page\nJSON: $json\nDUAL: $dual",
        (s, sf) => operators.SemanticQueries.run(json)(s, sf), dual)
    }

  def runPagination(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    runCases(spark, sf, casesPagination(rnd, n))
    n
  }

  def casesUnionView(rnd: scala.util.Random, n: Int): Seq[FuzzCase] = {
    val stagePool = Seq(
      Fld("Source Stage", "__stage", None),
      Fld("Order Priority", "o_orderpriority", None),
      Fld("Order Date", "date_format(o_orderdate, 'yyyy-MM-dd')", None))
    (1 to n).map { i =>
      val dims = Fld("Source Stage", "__stage", None) +:
        subset(rnd, stagePool.tail, 0, 2)
      val mets = subset(rnd, metrics.take(2), 1, 2)
      val filt = rnd.nextInt(3) match {
        case 0 =>
          val Seq(a, b) = subset(rnd, dates, 2, 2).sorted
          Some((s"""{"field":"Order Date","operator":"between","from":"$a","to":"$b"}""",
            s"o_orderdate >= '$a' AND o_orderdate <= '$b'"))
        case 1 =>
          val vs = subset(rnd, priorities, 1, 2)
          Some((jIn("Order Priority", vs),
            s"o_orderpriority IN (${vs.map(v => s"'$v'").mkString(",")})"))
        case _ => None
      }
      val json =
        s"""{"cube":"order_stats","selectFields":[${
          (dims ++ mets).map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]${
          filt.map(f => s""","filterExpressions":[${f._1}]""").getOrElse("")}}"""
      val union =
        "SELECT 'open' AS __stage, o_orderdate, o_orderpriority, " +
          "o_totalprice FROM orders WHERE o_orderstatus = 'O' " +
          "UNION ALL SELECT 'closed', o_orderdate, o_orderpriority, " +
          "o_totalprice FROM orders WHERE o_orderstatus = 'F'"
      val dual =
        s"SELECT ${(dims ++ mets).map(f => s"${f.sql} AS ${q(f.alias)}").mkString(", ")} " +
          s"FROM ($union)" +
          filt.map(f => s" WHERE ${f._2}").getOrElse("") +
          s" GROUP BY ${dims.indices.map(_ + 1).mkString(", ")}"
      FuzzCase(f"union_$i%03d", s"union-view #$i\nJSON: $json\nDUAL: $dual",
        (s, sf) => operators.SemanticQueries.run(json)(s, sf), dual)
    }
  }

  def runUnionView(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    runCases(spark, sf, casesUnionView(rnd, n))
    n
  }

  // ---------------------------------------------------------------
  // Time grains × timezones over the events cube
  // ---------------------------------------------------------------

  def casesGrainTz(rnd: scala.util.Random, n: Int): Seq[FuzzCase] = {
    val zones = Seq("UTC", "America/Los_Angeles", "Asia/Kolkata",
      "Europe/Berlin")
    val types = Seq("click", "error", "purchase", "signup", "view")
    case class Grain(alias: String, unit: String, fmt: String,
        reqFmt: java.time.format.DateTimeFormatter, step: java.time.Duration,
        maxSteps: Int)
    val grains = Seq(
      Grain("Day", "day", "yyyy-MM-dd",
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd"),
        java.time.Duration.ofDays(1), 12),
      Grain("Hour", "hour", "yyyy-MM-dd HH",
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH"),
        java.time.Duration.ofHours(1), 96),
      Grain("Minute", "minute", "yyyy-MM-dd HH:mm",
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"),
        java.time.Duration.ofMinutes(1), 60 * 30))
    val full = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    (1 to n).map { i =>
      val g = pick(rnd, grains)
      val tz = pick(rnd, zones)
      val start = java.time.LocalDateTime.of(2024, 1,
        2 + rnd.nextInt(14), rnd.nextInt(24), rnd.nextInt(60), 0)
        .truncatedTo(g.unit match {
          case "day" => java.time.temporal.ChronoUnit.DAYS
          case "hour" => java.time.temporal.ChronoUnit.HOURS
          case _ => java.time.temporal.ChronoUnit.MINUTES
        })
      val steps = 1 + rnd.nextInt(g.maxSteps)
      val endIncl = start.plus(g.step.multipliedBy(steps - 1))
      val withType = rnd.nextBoolean()
      val typeF = if (rnd.nextInt(3) == 0)
        Some(subset(rnd, types, 1, 2)) else None
      val mets = subset(rnd,
        Seq("Event Count", "Total Value"), 1, 2)
      val sel = (Seq(g.alias) ++ (if (withType) Seq("Event Type") else Nil)
        ++ mets)
      val json =
        s"""{"cube":"user_events","selectFields":[${
          sel.map(f => s"""{"field":"$f"}""").mkString(",")}],
           |"filterExpressions":[{"field":"${g.alias}","operator":"between",
           |"from":"${g.reqFmt.format(start)}","to":"${g.reqFmt.format(endIncl)}"}${
          typeF.map(ts => "," + jIn("Event Type", ts)).getOrElse("")}],
           |"timezone":"$tz"}""".stripMargin.replace("\n", "")
      val metSql = Map(
        "Event Count" -> s"COUNT(*) AS ${q("Event Count")}",
        "Total Value" ->
          s"CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ${q("Total Value")}")
      val dimSel = Seq(
        s"date_format(date_trunc('${g.unit}', from_utc_timestamp(ts, '$tz')), " +
          s"'${g.fmt}') AS ${q(g.alias)}") ++
        (if (withType) Seq(s"event_type AS ${q("Event Type")}") else Nil)
      val groups = dimSel.indices.map(_ + 1)
      val dual =
        s"SELECT ${(dimSel ++ mets.map(metSql)).mkString(", ")} FROM events " +
          s"WHERE ts >= to_utc_timestamp('${full.format(start)}', '$tz') " +
          s"AND ts < to_utc_timestamp('${full.format(endIncl.plus(g.step))}', '$tz')" +
          typeF.map(ts =>
            s" AND event_type IN (${ts.map(t => s"'$t'").mkString(",")})")
            .getOrElse("") +
          s" GROUP BY ${groups.mkString(", ")}"
      // r19 variant routing: whole-hour-offset zones at Day/Hour grain
      // are served by the hourly pre-aggregation; Kolkata's +05:30 and
      // Minute grain must fall back to the raw stream (storageGrain
      // gate) — asserted on EVERY grain draw, and the shared dual then
      // proves the chosen variant answer-transparent
      val expectVariant =
        if (tz == "Asia/Kolkata" || g.alias == "Minute") "events_base"
        else "events_by_hour_rollup"
      FuzzCase(f"grain_$i%03d",
        s"grain #$i ${g.alias} tz=$tz steps=$steps\nJSON: $json\nDUAL: $dual",
        (s, sf) => {
          val p = operators.SemanticQueries.planFor(json, s, sf)
            .fold(e => throw new IllegalArgumentException(e), identity)
          assert(p.factName == expectVariant,
            s"variant routing: got ${p.factName}, want $expectVariant " +
              s"(tz=$tz grain=${g.alias})")
          operators.SemanticQueries.run(json)(s, sf)
        }, dual,
        audit = false)
    }
  }

  def runGrainTz(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    graft.core.Tables.events(spark, sf).createOrReplaceTempView("events")
    runCases(spark, sf, casesGrainTz(rnd, n))
    n
  }

  // ---------------------------------------------------------------
  // DST transitions (r18 verdict ranked task #2): grain×tz windows
  // that STRADDLE a daylight-saving switch — the 23/25-hour local
  // day. Semantics the battery pins (the COVERAGE row):
  //  - a Day window is local-midnight to local-midnight, so the
  //    spring-forward day aggregates 23 hours of instants and the
  //    fall-back day 25 — never a fixed +24h;
  //  - the repeated local hour (fall back) is ONE Hour bucket fed by
  //    TWO UTC hours; the skipped hour (spring forward) is a bucket
  //    that can never receive events;
  //  - window ENDPOINTS must be existing, unambiguous local times.
  //    Skipped/repeated wall times are DATA (planted as UTC instants
  //    by RelCorpusGen — UTC→local is total and engines agree), not
  //    endpoints: local→UTC of an ambiguous time is engine policy
  //    (java.time resolves to the EARLIER offset, DuckDB's ICU to
  //    the LATER — measured on 2024-11-03 01:30 America/New_York),
  //    so the generator draws around them (`avoidFrom`; `avoidToPlus`
  //    keeps the dual's half-open to+1-step edge off them too).
  // ---------------------------------------------------------------

  private case class Transition(zone: String, day: java.time.LocalDate,
      avoidFrom: Set[Int], avoidToPlus: Set[Int])

  private val transitions = Seq(
    // spring forward: 02:xx skipped (23-hour day)
    Transition("America/New_York", java.time.LocalDate.of(2024, 3, 10),
      Set(2), Set(2)),
    // fall back: 01:xx repeated (25-hour day); to+1 landing on 01
    // would make the window edge ambiguous → avoid to=00 as well
    Transition("America/New_York", java.time.LocalDate.of(2024, 11, 3),
      Set(1), Set(0, 1)),
    // southern hemisphere: fall back Apr 7 (02:xx repeated)
    Transition("Australia/Sydney", java.time.LocalDate.of(2024, 4, 7),
      Set(2), Set(1, 2)),
    // spring forward Oct 6 (02:xx skipped)
    Transition("Australia/Sydney", java.time.LocalDate.of(2024, 10, 6),
      Set(2), Set(2)))

  private val eventMetSql = Map(
    "Event Count" -> s"COUNT(*) AS ${q("Event Count")}",
    "Total Value" ->
      s"CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ${q("Total Value")}")

  def casesDstGrain(rnd: scala.util.Random, n: Int): Seq[FuzzCase] = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val full = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    (1 to n).map { i =>
      val t = pick(rnd, transitions)
      val hourGrain = rnd.nextBoolean()
      val (alias, unit, fmt, reqFmt, start, endIncl) =
        if (hourGrain) {
          // start on the PREVIOUS day (always valid), span past the
          // switch (04:00 local of the transition day), end clear of
          // the skipped/repeated hours and their +1h edge
          val s = t.day.minusDays(1).atTime(12 + rnd.nextInt(12), 0)
          val minSteps = java.time.temporal.ChronoUnit.HOURS
            .between(s, t.day.atTime(4, 0)) + 1
          var e = s.plusHours(minSteps - 1 + rnd.nextInt(20))
          while (e.toLocalDate == t.day &&
              (t.avoidFrom(e.getHour) || t.avoidToPlus(e.getHour)))
            e = e.plusHours(1)
          ("Hour", "hour", "yyyy-MM-dd HH",
            java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH"),
            s, e)
        } else {
          // local-midnight day window containing the transition day
          val s = t.day.minusDays(rnd.nextInt(4)).atStartOfDay()
          val e = t.day.plusDays(rnd.nextInt(4)).atStartOfDay()
          ("Day", "day", "yyyy-MM-dd",
            java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd"),
            s, e)
        }
      val afterEnd =
        if (hourGrain) endIncl.plusHours(1) else endIncl.plusDays(1)
      val withType = rnd.nextBoolean()
      val typeF = if (rnd.nextInt(3) == 0)
        Some(subset(rnd, types, 1, 2)) else None
      val mets = subset(rnd, Seq("Event Count", "Total Value"), 1, 2)
      val sel = (Seq(alias) ++ (if (withType) Seq("Event Type") else Nil)
        ++ mets)
      val json =
        s"""{"cube":"user_events","selectFields":[${
          sel.map(f => s"""{"field":"$f"}""").mkString(",")}],
           |"filterExpressions":[{"field":"$alias","operator":"between",
           |"from":"${reqFmt.format(start)}","to":"${reqFmt.format(endIncl)}"}${
          typeF.map(ts => "," + jIn("Event Type", ts)).getOrElse("")}],
           |"timezone":"${t.zone}"}""".stripMargin.replace("\n", "")
      val dimSel = Seq(
        s"date_format(date_trunc('$unit', from_utc_timestamp(ts, '${t.zone}')), " +
          s"'$fmt') AS ${q(alias)}") ++
        (if (withType) Seq(s"event_type AS ${q("Event Type")}") else Nil)
      val dual =
        s"SELECT ${(dimSel ++ mets.map(eventMetSql)).mkString(", ")} FROM events " +
          s"WHERE ts >= to_utc_timestamp('${full.format(start)}', '${t.zone}') " +
          s"AND ts < to_utc_timestamp('${full.format(afterEnd)}', '${t.zone}')" +
          typeF.map(ts =>
            s" AND event_type IN (${ts.map(x => s"'$x'").mkString(",")})")
            .getOrElse("") +
          s" GROUP BY ${dimSel.indices.map(_ + 1).mkString(", ")}"
      FuzzCase(f"dstgrain_$i%03d",
        s"dst-grain #$i $alias zone=${t.zone} switch=${t.day} " +
          s"window=${reqFmt.format(start)}..${reqFmt.format(endIncl)}\n" +
          s"JSON: $json\nDUAL: $dual",
        (s, sf) => {
          // NY/Sydney use whole-hour offsets on BOTH sides of every
          // switch → the hourly rollup must keep serving through DST
          val p = operators.SemanticQueries.planFor(json, s, sf)
            .fold(e => throw new IllegalArgumentException(e), identity)
          assert(p.factName == "events_by_hour_rollup",
            s"variant routing under DST: got ${p.factName}")
          operators.SemanticQueries.run(json)(s, sf)
        }, dual,
        audit = false)
    }
  }

  /** TimeShift whose PREVIOUS window spans the DST transition (the
    * classic killer: the prev window's day count is the same, its
    * instant length is ±1 h). */
  def casesDstTimeShift(rnd: scala.util.Random, n: Int): Seq[FuzzCase] =
    (1 to n).map { i =>
      val t = pick(rnd, transitions)
      val len = 2 + rnd.nextInt(4)
      val off = rnd.nextInt(3)
      // from ∈ [day+1+off, day+len+off] puts the transition day inside
      // prev = [from-len-off, from-1-off]; a third of draws instead
      // put it inside the CURRENT window
      val curSpans = rnd.nextInt(3) == 0
      val from =
        if (curSpans) t.day.minusDays(rnd.nextInt(len))
        else t.day.plusDays(1 + off + rnd.nextInt(len))
      val to = from.plusDays(len - 1)
      val mets = subset(rnd, Seq("Event Count", "Total Value"), 1, 2)
      val json =
        s"""{"cube":"user_events","selectFields":[{"field":"Day"},${
          mets.map(f => s"""{"field":"$f"}""").mkString(",")}],
           |"filterExpressions":[{"field":"Day","operator":"between",
           |"from":"$from","to":"$to"}],"timezone":"${t.zone}"}"""
          .stripMargin.replace("\n", "")
      val cfg = graft.curators.TimeShiftConfig(daysOffset = off)
      val shift = len + off
      val pa = from.minusDays(shift)
      val pb = from.minusDays(1 + off)
      def core(lo: java.time.LocalDate, hi: java.time.LocalDate,
          prev: Boolean): String = {
        val daySel =
          if (prev)
            s"date_format(date_add(date_trunc('day', " +
              s"from_utc_timestamp(ts, '${t.zone}')), $shift), " +
              s"'yyyy-MM-dd') AS ${q("Day")}"
          else
            s"date_format(date_trunc('day', from_utc_timestamp(ts, " +
              s"'${t.zone}')), 'yyyy-MM-dd') AS ${q("Day")}"
        val metSel = mets.map(m => eventMetSql(m).replace(
          s"AS ${q(m)}", s"AS ${q(if (prev) s"$m Prev" else m)}"))
        s"SELECT $daySel, ${metSel.mkString(", ")} FROM events " +
          s"WHERE ts >= to_utc_timestamp('$lo 00:00:00', '${t.zone}') " +
          s"AND ts < to_utc_timestamp('${hi.plusDays(1)} 00:00:00', " +
          s"'${t.zone}') GROUP BY 1"
      }
      val pct = mets.map(m =>
        s"CASE WHEN ${q(s"$m Prev")} IS NOT NULL AND " +
          s"${q(s"$m Prev")} <> 0 THEN " +
          s"ROUND((${q(m)} - ${q(s"$m Prev")}) / " +
          s"${q(s"$m Prev")} * 100, 4) END AS " +
          q(s"$m Pct Change"))
      val dual =
        s"""SELECT ${(Seq(q("Day")) ++ mets.map(q) ++
          mets.map(m => q(s"$m Prev")) ++ pct).mkString(", ")}
           |FROM (${core(from, to, prev = false)}) cur
           |LEFT JOIN (${core(pa, pb, prev = true)}) prev
           |USING (${q("Day")})""".stripMargin.replace("\n", " ")
      FuzzCase(f"dsttshift_$i%03d",
        s"dst-timeshift #$i zone=${t.zone} switch=${t.day} off=$off " +
          s"window=$from..$to prev=$pa..$pb\nJSON: $json\nDUAL: $dual",
        (s, sf) => curators.Curators.timeShift(json,
          operators.SemanticQueries.registry, cfg)(s, sf), dual,
        audit = false)
    }

  // ---------------------------------------------------------------
  // Variant selection on the orders cube (r18 verdict ranked task
  // #6): requests inside the (priority, day)-rollup's vocabulary —
  // including the FILTERED rollup metric `Urgent Spend`, whose
  // pre-aggregated partial `__uspend` must re-aggregate to the raw
  // CASE-filtered sum — must be SERVED BY the rollup (routing
  // asserted) and answer-match the raw dual on adversarial corpora
  // (NULL priorities, empty facts, boundary dates); a third of draws
  // add an out-of-vocabulary field as the negative control (base
  // fact chosen, same dual discipline).
  // ---------------------------------------------------------------

  private val urgentSpendSql =
    "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN " +
      "CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)"

  def casesVariantRollup(rnd: scala.util.Random, n: Int): Seq[FuzzCase] = {
    val rollupDims = Seq(
      Fld("Order Priority", "o_orderpriority", None),
      Fld("Order Date", "date_format(o_orderdate, 'yyyy-MM-dd')", None))
    val rollupMets = Seq(
      Fld("Total Spend", spendSql, None),
      Fld("Order Count", "COUNT(*)", None),
      Fld("Urgent Spend", urgentSpendSql, None))
    (1 to n).map { i =>
      val dims0 = subset(rnd, rollupDims, 0, 2)
      val mets = subset(rnd, rollupMets, 1, 3)
      // negative control: a dim outside the rollup's vocabulary must
      // route to the base fact — with the SAME dual discipline
      val negative = rnd.nextInt(3) == 0
      val dims = if (negative)
        dims0 :+ Fld("Order Status", statusCase, None) else dims0
      val selected = rnd.shuffle(dims ++ mets)
      val filts = Seq.newBuilder[(String, String)]
      if (rnd.nextBoolean()) {
        val Seq(a, b) = subset(rnd, dates, 2, 2).sorted
        filts += ((s"""{"field":"Order Date","operator":"between","from":"$a","to":"$b"}""",
          s"(o_orderdate >= '$a' AND o_orderdate <= '$b')"))
      }
      if (rnd.nextInt(3) == 0) {
        val vs = subset(rnd, priorities, 1, 3)
        filts += ((jIn("Order Priority", vs),
          s"o_orderpriority IN (${vs.map(v => s"'$v'").mkString(",")})"))
      }
      val fs = filts.result()
      val json =
        s"""{"cube":"order_stats","selectFields":[${
          selected.map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]""" +
          (if (fs.nonEmpty)
            s""","filterExpressions":[${fs.map(_._1).mkString(",")}]"""
          else "") + "}"
      val groupIdx = selected.zipWithIndex
        .filter { case (f, _) => dims.contains(f) }.map(_._2 + 1)
      val dual =
        s"SELECT ${selected.map(f => s"${f.sql} AS ${q(f.alias)}").mkString(", ")} " +
          "FROM orders" +
          (if (fs.nonEmpty) fs.map(_._2).mkString(" WHERE ", " AND ", "")
          else "") +
          (if (groupIdx.nonEmpty) s" GROUP BY ${groupIdx.mkString(", ")}"
          else "")
      val expect =
        if (negative) "orders_base" else "orders_by_priority_day_rollup"
      FuzzCase(f"vrollup_$i%03d",
        s"variant-rollup #$i expect=$expect\nJSON: $json\nDUAL: $dual",
        (s, sf) => {
          val p = operators.SemanticQueries.planFor(json, s, sf)
            .fold(e => throw new IllegalArgumentException(e), identity)
          assert(p.factName == expect,
            s"variant routing: got ${p.factName}, want $expect")
          operators.SemanticQueries.run(json)(s, sf)
        }, dual)
    }
  }

  def runVariantRollup(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    runCases(spark, sf, casesVariantRollup(rnd, n))
    n
  }

  def runDstGrain(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    graft.core.Tables.events(spark, sf).createOrReplaceTempView("events")
    runCases(spark, sf, casesDstGrain(rnd, n))
    n
  }

  def runDstTimeShift(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    graft.core.Tables.events(spark, sf).createOrReplaceTempView("events")
    runCases(spark, sf, casesDstTimeShift(rnd, n))
    n
  }

  // ---------------------------------------------------------------
  // Curators under differential pressure
  // ---------------------------------------------------------------

  def casesTimeShift(rnd: scala.util.Random, n: Int): Seq[FuzzCase] =
    (1 to n).map { i =>
      val dims = subset(rnd,
        factDims ++ dimAttrs.filter(_.alias != "Customer Name"), 1, 2)
      val mets = subset(rnd, metrics.take(3), 1, 2)
      val Seq(a, b) = subset(rnd, dates, 2, 2).sorted
      val extra = if (rnd.nextBoolean()) Some(nonDateLeaf(rnd)) else None
      val off = rnd.nextInt(4)
      val json =
        s"""{"cube":"order_stats","selectFields":[${
          (dims ++ mets).map(f => s"""{"field":"${f.alias}"}""").mkString(",")}],
           |"filterExpressions":[{"field":"Order Date","operator":"between","from":"$a","to":"$b"}${
          extra.map("," + _.json).getOrElse("")}]}""".stripMargin.replace("\n", "")
      val cfg = graft.curators.TimeShiftConfig(daysOffset = off)
      // the dual: both windows rendered independently over the raw
      // tables; the previous window's day column shifted FORWARD by
      // the same length so the two align on the dim tuple
      val from = java.time.LocalDate.parse(a)
      val to = java.time.LocalDate.parse(b)
      val len = java.time.temporal.ChronoUnit.DAYS.between(from, to) + 1
      val shift = len + off
      val pa = from.minusDays(shift).toString
      val pb = from.minusDays(1 + off).toString
      val inner = extra.exists(_.hasDimAttr)
      val joins = joinSql(neededDims(
        dims.map(_.alias) ++ extra.toSeq.flatMap(_.fields)), inner)
      def core(lo: String, hi: String, prev: Boolean): String = {
        val dimSel = dims.map { d =>
          if (prev && d.alias == "Order Date")
            s"date_format(date_add(o_orderdate, $shift), 'yyyy-MM-dd') AS ${q(d.alias)}"
          else s"${d.sql} AS ${q(d.alias)}"
        }
        val metSel = mets.map(m =>
          s"${m.sql} AS ${q(if (prev) s"${m.alias} Prev" else m.alias)}")
        s"SELECT ${(dimSel ++ metSel).mkString(", ")} FROM orders$joins " +
          s"WHERE o_orderdate >= '$lo' AND o_orderdate <= '$hi'" +
          extra.map(e => s" AND ${e.sql}").getOrElse("") +
          s" GROUP BY ${dims.indices.map(_ + 1).mkString(", ")}"
      }
      val pct = mets.map(m =>
        s"CASE WHEN ${q(s"${m.alias} Prev")} IS NOT NULL AND " +
          s"${q(s"${m.alias} Prev")} <> 0 THEN " +
          s"ROUND((${q(m.alias)} - ${q(s"${m.alias} Prev")}) / " +
          s"${q(s"${m.alias} Prev")} * 100, 4) END AS " +
          q(s"${m.alias} Pct Change"))
      val dual =
        s"""SELECT ${(dims.map(d => q(d.alias)) ++ mets.map(m => q(m.alias)) ++
          mets.map(m => q(s"${m.alias} Prev")) ++ pct).mkString(", ")}
           |FROM (${core(a, b, prev = false)}) cur
           |LEFT JOIN (${core(pa, pb, prev = true)}) prev
           |USING (${dims.map(d => q(d.alias)).mkString(", ")})"""
          .stripMargin.replace("\n", " ")
      FuzzCase(f"tshift_$i%03d",
        s"timeshift #$i off=$off\nJSON: $json\nDUAL: $dual",
        (s, sf) => curators.Curators.timeShift(json,
          operators.SemanticQueries.registry, cfg)(s, sf), dual,
        audit = false)
    }

  def runTimeShift(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    runCases(spark, sf, casesTimeShift(rnd, n))
    n
  }

  def casesTotalsRowCount(rnd: scala.util.Random, n: Int): Seq[FuzzCase] =
    (1 to n).flatMap { i =>
      val dims = subset(rnd,
        factDims ++ dimAttrs.filter(_.alias != "Customer Name"), 1, 2)
      val mets = subset(rnd, metrics, 1, 3)
      val leaves = Seq.fill(rnd.nextInt(2))(dimTree(rnd))
      val json =
        s"""{"cube":"order_stats","selectFields":[${
          (dims ++ mets).map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]${
          if (leaves.nonEmpty)
            s""","filterExpressions":[${leaves.map(_.json).mkString(",")}]"""
          else ""}}"""
      val inner = leaves.exists(_.hasDimAttr)
      val joins = joinSql(neededDims(
        dims.map(_.alias) ++ leaves.flatMap(_.fields)), inner)
      val where = if (leaves.nonEmpty)
        leaves.map(_.sql).mkString(" WHERE ", " AND ", "") else ""
      // TotalMetrics: the same FILTERS, dims dropped — one total row.
      // The dual's join set is FILTER fields only: the curator (like
      // the reference's TotalMetricsCurator) re-issues metrics+filters,
      // so a dim join that is not row-preserving (dangling/NULL FK
      // under the inner-escalated chain) must NOT shape the totals —
      // they can legitimately exceed the grid sum on such corpora
      // (r18 wide-sweep finding, seed 105: a selected-but-unfiltered
      // Nation Name dropped NULL-nationkey customers from the dual)
      val totalsJoins = joinSql(neededDims(leaves.flatMap(_.fields)), inner)
      val totalsDual =
        s"SELECT ${mets.map(m => s"${m.sql} AS ${q(m.alias)}").mkString(", ")} " +
          s"FROM orders$totalsJoins$where"
      // RowCount: the unpaginated grain row count
      val rcDual =
        s"SELECT COUNT(*) AS totalrows FROM (SELECT ${
          dims.map(_.sql).mkString(", ")} " +
          s"FROM orders$joins$where GROUP BY ${
            dims.indices.map(_ + 1).mkString(", ")})"
      Seq(
        FuzzCase(f"totals_$i%03d", s"TotalMetrics #$i\nJSON: $json",
          (s, sf) => curators.Curators.totalMetrics(json,
            operators.SemanticQueries.registry)(s, sf), totalsDual,
          audit = false),
        FuzzCase(f"rowcount_$i%03d", s"RowCount #$i\nJSON: $json",
          (s, sf) => curators.Curators.rowCount(json,
            operators.SemanticQueries.registry)(s, sf), rcDual,
          audit = false))
    }

  def runTotalsRowCount(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    runCases(spark, sf, casesTotalsRowCount(rnd, n))
    n
  }

  def casesDrilldown(rnd: scala.util.Random, n: Int): Seq[FuzzCase] =
    (1 to n).map { i =>
      val pool = factDims ++ dimAttrs.filter(_.alias != "Customer Name")
      val parentDims = subset(rnd, pool, 1, 2)
      val drillDim = pick(rnd,
        pool.filterNot(parentDims.contains).filterNot(_.alias == "Customer Key"))
      val mets = subset(rnd, metrics.take(3), 1, 2)
      val leaves = Seq.fill(rnd.nextInt(2))(nonDateLeaf(rnd))
      val topN = 2 + rnd.nextInt(6)
      // a TOTAL base ordering (all parent dims) makes the page — and
      // therefore the drill — deterministic on both sides
      val sortDirs = parentDims.map(_ => rnd.nextBoolean())
      val sorts = parentDims.zip(sortDirs).map { case (d, desc) =>
        s"""{"field":"${d.alias}","order":"${if (desc) "Desc" else "Asc"}"}""" }
      val json =
        s"""{"cube":"order_stats","selectFields":[${
          (parentDims ++ mets).map(f => s"""{"field":"${f.alias}"}""").mkString(",")}]${
          if (leaves.nonEmpty)
            s""","filterExpressions":[${leaves.map(_.json).mkString(",")}]"""
          else ""},"sortBy":[${sorts.mkString(",")}]}"""
      val inner = leaves.exists(_.hasDimAttr)
      // the DRILL side may pull in more dims than the base (the drill
      // dim's chain); join set covers both
      val joins = joinSql(neededDims(
        (parentDims :+ drillDim).map(_.alias) ++ leaves.flatMap(_.fields)),
        inner)
      val where = if (leaves.nonEmpty)
        leaves.map(_.sql).mkString(" WHERE ", " AND ", "") else ""
      val baseJoins = joinSql(neededDims(
        parentDims.map(_.alias) ++ leaves.flatMap(_.fields)), inner)
      val orderBy = parentDims.zip(sortDirs).map { case (d, desc) =>
        s"${q(d.alias)}${if (desc) " DESC" else ""}" }.mkString(", ")
      val dual =
        s"""WITH parents AS (
           |  SELECT ${parentDims.map(d => s"${d.sql} AS ${q(d.alias)}").mkString(", ")}
           |  FROM orders$baseJoins$where
           |  GROUP BY ${parentDims.indices.map(_ + 1).mkString(", ")}
           |  ORDER BY $orderBy LIMIT $topN),
           |drill AS (
           |  SELECT ${((parentDims :+ drillDim).map(d =>
              s"${d.sql} AS ${q(d.alias)}") ++
              mets.map(m => s"${m.sql} AS ${q(m.alias)}")).mkString(", ")}
           |  FROM orders$joins$where
           |  GROUP BY ${(parentDims :+ drillDim).indices.map(_ + 1).mkString(", ")})
           |SELECT drill.* FROM drill LEFT SEMI JOIN parents
           |ON ${parentDims.map(d =>
              s"drill.${q(d.alias)} = parents.${q(d.alias)}").mkString(" AND ")}"""
          .stripMargin.replace("\n", " ")
      FuzzCase(f"drill_$i%03d",
        s"drilldown #$i topN=$topN drill=${drillDim.alias}\n" +
          s"JSON: $json\nDUAL: $dual",
        (s, sf) => curators.Curators.drillDown(json, drillDim.alias, topN,
          operators.SemanticQueries.registry)(s, sf), dual,
        audit = false)
    }

  def runDrilldown(spark: SparkSession, sf: String,
      rnd: scala.util.Random, n: Int): Int = {
    runCases(spark, sf, casesDrilldown(rnd, n))
    n
  }
}
