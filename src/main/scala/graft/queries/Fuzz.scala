package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Randomized differential fuzzing of the relational surface: a seeded
  * generator produces small filter/join/aggregate plans over the TPC-H
  * tables as an AST rendered BOTH as a DataFrame-API plan and as ANSI
  * SQL — the two executions must agree row-for-row. FuzzRelationalSpec
  * runs ≥1000 generated plans DataFrame-vs-`spark.sql`; three fixed
  * seeds are exported as `q_fuzz_*` query entries whose SQL rendering IS
  * the DuckDB oracle, so the driver cross-checks the same generator
  * against a second engine every round. This is the cheapest route to
  * correctness bugs the fixed 91-query inventory can't reach: the
  * generator explores predicate/join/aggregate combinations nobody
  * hand-wrote.
  *
  * Determinism rules (so both engines agree exactly):
  *  - numeric literals are .0/.5 halves (exact doubles in both parsers);
  *  - double aggregation only via min/max (order-independent) or the
  *    DECIMAL(18,2) exact-sum pattern shared with the TPC-H entries
  *    ([[Sql.dsum]]); integer sums surface as BIGINT;
  *  - no floating sums/avgs, no timestamps, no nondeterministic limits.
  */
object Fuzz {

  // ---- catalog ----

  private sealed trait Kind
  private case object IntK extends Kind
  private case object DblK extends Kind
  private final case class StrK(values: Seq[String]) extends Kind

  /** lowCard marks a column usable as a GROUP BY key. */
  private final case class FCol(name: String, kind: Kind,
      lo: Double = 0, hi: Double = 0, lowCard: Boolean = false)

  private final case class FTable(name: String, cols: Seq[FCol])

  /** base-table key = dim-table key equi-join. */
  private final case class FJoin(dim: FTable, leftKey: String, rightKey: String)

  private val region = FTable("region", Seq(
    FCol("r_regionkey", IntK, 0, 4, lowCard = true),
    FCol("r_name", StrK(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")),
      lowCard = true)))

  private val nation = FTable("nation", Seq(
    FCol("n_nationkey", IntK, 0, 24),
    FCol("n_regionkey", IntK, 0, 4, lowCard = true)))

  private val customer = FTable("customer", Seq(
    FCol("c_custkey", IntK, 1, 1000),
    FCol("c_nationkey", IntK, 0, 24, lowCard = true),
    FCol("c_acctbal", DblK, -999, 9999),
    FCol("c_mktsegment", StrK(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")), lowCard = true)))

  private val supplier = FTable("supplier", Seq(
    FCol("s_suppkey", IntK, 1, 100),
    FCol("s_nationkey", IntK, 0, 24, lowCard = true),
    FCol("s_acctbal", DblK, -999, 9999)))

  private val orders = FTable("orders", Seq(
    FCol("o_orderkey", IntK, 1, 60000),
    FCol("o_custkey", IntK, 1, 1000),
    FCol("o_orderstatus", StrK(Seq("F", "O", "P")), lowCard = true),
    FCol("o_totalprice", DblK, 900, 400000),
    FCol("o_orderpriority", StrK(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")), lowCard = true)))

  private val part = FTable("part", Seq(
    FCol("p_partkey", IntK, 1, 2000),
    FCol("p_size", IntK, 1, 50, lowCard = true),
    FCol("p_retailprice", DblK, 900, 2000),
    FCol("p_brand", StrK((1 to 5).flatMap(i => (1 to 5).map(j => s"Brand#$i$j"))),
      lowCard = true)))

  private val lineitem = FTable("lineitem", Seq(
    FCol("l_orderkey", IntK, 1, 60000),
    FCol("l_partkey", IntK, 1, 2000),
    FCol("l_linenumber", IntK, 1, 7, lowCard = true),
    FCol("l_quantity", DblK, 1, 50),
    FCol("l_extendedprice", DblK, 900, 100000),
    FCol("l_discount", DblK, 0, 0.1),
    FCol("l_returnflag", StrK(Seq("A", "N", "R")), lowCard = true),
    FCol("l_linestatus", StrK(Seq("F", "O")), lowCard = true)))

  /** (base, possible join) choices. */
  private val bases: Seq[(FTable, Seq[FJoin])] = Seq(
    (nation, Seq(FJoin(region, "n_regionkey", "r_regionkey"))),
    (customer, Seq(FJoin(nation, "c_nationkey", "n_nationkey"))),
    (supplier, Seq(FJoin(nation, "s_nationkey", "n_nationkey"))),
    (orders, Seq(FJoin(customer, "o_custkey", "c_custkey"))),
    (part, Seq.empty),
    (lineitem, Seq(FJoin(part, "l_partkey", "p_partkey"),
      FJoin(orders, "l_orderkey", "o_orderkey"))))

  // ---- AST ----

  private sealed trait Pred { def sql: String; def df: Column }

  private final case class NumCmp(c: FCol, op: String, v: Double) extends Pred {
    private def litStr =
      if (v == v.floor) v.toLong.toString else v.toString
    def sql = s"${c.name} $op $litStr"
    def df = {
      val l = lit(v)
      op match {
        case "<" => col(c.name) < l
        case "<=" => col(c.name) <= l
        case ">" => col(c.name) > l
        case ">=" => col(c.name) >= l
        case _ => col(c.name) === l
      }
    }
  }

  private final case class StrEq(c: FCol, v: String, neg: Boolean) extends Pred {
    def sql = s"${c.name} ${if (neg) "<>" else "="} '$v'"
    def df = if (neg) col(c.name) =!= lit(v) else col(c.name) === lit(v)
  }

  private final case class StrIn(c: FCol, vs: Seq[String]) extends Pred {
    def sql = s"${c.name} IN (${vs.map(v => s"'$v'").mkString(", ")})"
    def df = col(c.name).isin(vs: _*)
  }

  private final case class Bin(a: Pred, b: Pred, and: Boolean) extends Pred {
    def sql = s"(${a.sql}) ${if (and) "AND" else "OR"} (${b.sql})"
    def df = if (and) a.df && b.df else a.df || b.df
  }

  private sealed trait Agg { def alias: String; def sql: String; def df: Column }

  private case object CountStar extends Agg {
    val alias = "cnt_all"
    def sql = s"count(*) AS $alias"
    def df = count(lit(1)).as(alias)
  }
  private final case class MinMax(c: FCol, isMin: Boolean) extends Agg {
    val alias = s"${if (isMin) "min" else "max"}_${c.name}"
    def sql = s"${if (isMin) "min" else "max"}(${c.name}) AS $alias"
    def df = (if (isMin) min(col(c.name)) else max(col(c.name))).as(alias)
  }
  private final case class SumInt(c: FCol) extends Agg {
    val alias = s"sum_${c.name}"
    def sql = s"CAST(sum(${c.name}) AS BIGINT) AS $alias"
    def df = sum(col(c.name)).cast("long").as(alias)
  }
  private final case class SumDec(c: FCol) extends Agg {
    val alias = s"sum_${c.name}"
    def sql = s"CAST(sum(CAST(${c.name} AS DECIMAL(18,2))) AS DOUBLE) AS $alias"
    def df = sum(col(c.name).cast("decimal(18,2)")).cast("double").as(alias)
  }
  private final case class CountCol(c: FCol) extends Agg {
    val alias = s"cnt_${c.name}"
    def sql = s"count(${c.name}) AS $alias"
    def df = count(col(c.name)).as(alias)
  }

  /** A generated plan: both renderings plus a human-readable signature. */
  final case class Plan(seed: Long, sql: String,
      run: (SparkSession, String) => DataFrame)

  // ---- generator ----

  private def pick[A](rnd: scala.util.Random, xs: Seq[A]): A =
    xs(rnd.nextInt(xs.size))

  /** .0/.5 halves inside [lo, hi] — exact in both SQL parsers. */
  private def halfLit(rnd: scala.util.Random, c: FCol): Double = {
    val steps = math.max(1, ((c.hi - c.lo) * 2).toInt)
    c.lo + rnd.nextInt(steps) / 2.0
  }

  private def genPred(rnd: scala.util.Random, cols: Seq[FCol]): Pred = {
    def leaf(): Pred = {
      val c = pick(rnd, cols)
      c.kind match {
        case StrK(vs) =>
          if (rnd.nextInt(3) == 0)
            StrIn(c, rnd.shuffle(vs).take(1 + rnd.nextInt(math.min(3, vs.size))).sorted)
          else StrEq(c, pick(rnd, vs), neg = rnd.nextInt(4) == 0)
        case _ =>
          NumCmp(c, pick(rnd, Seq("<", "<=", ">", ">=")), halfLit(rnd, c))
      }
    }
    rnd.nextInt(3) match {
      case 0 => leaf()
      case 1 => Bin(leaf(), leaf(), and = true)
      case _ => Bin(leaf(), leaf(), and = false)
    }
  }

  private def genAggs(rnd: scala.util.Random, cols: Seq[FCol]): Seq[Agg] = {
    def one(): Agg = rnd.nextInt(5) match {
      case 0 => CountStar
      case 1 => val c = pick(rnd, cols); MinMax(c, isMin = rnd.nextBoolean())
      case 2 =>
        pick(rnd, cols.filter(_.kind == IntK)) match { case c => SumInt(c) }
      case 3 =>
        val dbls = cols.filter(_.kind == DblK)
        if (dbls.isEmpty) CountStar else SumDec(pick(rnd, dbls))
      case _ => CountCol(pick(rnd, cols))
    }
    val aggs = Seq.fill(1 + rnd.nextInt(3))(one())
    // unique aliases (duplicate aggregates collapse to one)
    aggs.groupBy(_.alias).values.map(_.head).toSeq.sortBy(_.alias)
  }

  /** Generate the plan for a seed. `forceAgg` restricts to the
    * aggregate shape (bounded output — used for the driver entries). */
  def plan(seed: Long, forceAgg: Boolean = false): Plan = {
    val rnd = new scala.util.Random(seed)
    val (base, joinable) = pick(rnd, bases)
    val join = if (joinable.nonEmpty && rnd.nextBoolean()) Some(pick(rnd, joinable)) else None
    val cols = base.cols ++ join.map(_.dim.cols).getOrElse(Seq.empty)
    val pred = if (forceAgg || rnd.nextInt(4) > 0) Some(genPred(rnd, cols)) else None

    val fromSql = base.name + join.map(j =>
      s" JOIN ${j.dim.name} ON ${j.leftKey} = ${j.rightKey}").getOrElse("")
    val whereSql = pred.map(p => s" WHERE ${p.sql}").getOrElse("")

    def src(s: SparkSession, dir: String): DataFrame = {
      val b = Tables(s, dir, base.name)
      val joined = join match {
        case Some(j) =>
          b.join(Tables(s, dir, j.dim.name), col(j.leftKey) === col(j.rightKey))
        case None => b
      }
      pred match { case Some(p) => joined.filter(p.df); case None => joined }
    }

    if (forceAgg || rnd.nextInt(3) > 0) {
      // aggregate shape (grouped or global)
      val groupable = cols.filter(_.lowCard)
      val gcols =
        if (groupable.nonEmpty && (forceAgg || rnd.nextBoolean()))
          rnd.shuffle(groupable).take(1 + rnd.nextInt(math.min(2, groupable.size)))
            .map(_.name).sorted
        else Seq.empty
      val aggs = genAggs(rnd, cols)
      val selSql = (gcols ++ aggs.map(_.sql)).mkString(", ")
      val gSql = if (gcols.nonEmpty) s" GROUP BY ${gcols.mkString(", ")}" else ""
      val sql = s"SELECT $selSql FROM $fromSql$whereSql$gSql"
      Plan(seed, sql, (s, dir) => {
        val g = src(s, dir)
        val agged =
          if (gcols.nonEmpty)
            g.groupBy(gcols.map(col): _*).agg(aggs.head.df, aggs.tail.map(_.df): _*)
          else g.agg(aggs.head.df, aggs.tail.map(_.df): _*)
        agged.select((gcols ++ aggs.map(_.alias)).map(col): _*)
      })
    } else {
      // projection shape: a few concrete columns, always filtered
      val p = pred.getOrElse(genPred(rnd, cols))
      val proj = rnd.shuffle(cols).take(2 + rnd.nextInt(3)).map(_.name).sorted
      val sql = s"SELECT ${proj.mkString(", ")} FROM $fromSql WHERE ${p.sql}"
      Plan(seed, sql, (s, dir) => {
        val b = Tables(s, dir, base.name)
        val joined = join match {
          case Some(j) =>
            b.join(Tables(s, dir, j.dim.name), col(j.leftKey) === col(j.rightKey))
          case None => b
        }
        joined.filter(p.df).select(proj.map(col): _*)
      })
    }
  }

  /** Three fixed-seed aggregate plans exported to the driver's oracle
    * gate: the SQL rendering runs in DuckDB, the DataFrame rendering in
    * Spark — a per-round cross-engine differential check of the same
    * generator FuzzRelationalSpec exercises Spark-vs-Spark. */
  val driverSeeds = Seq(101L, 202L, 303L)

  val all: Seq[Q] = driverSeeds.map { s =>
    val p = plan(s, forceAgg = true)
    Q(s"q_fuzz_$s", p.run, Some(p.sql))
  }
}
