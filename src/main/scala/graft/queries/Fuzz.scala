package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Randomized differential fuzzing of the relational surface: a seeded
  * generator produces small relational plans over the TPC-H tables —
  * filters, inner/semi/anti joins (EXISTS / NOT EXISTS decorrelation),
  * LEFT and FULL OUTER joins against filtered dims (NULL-extension on
  * one or both sides, three-valued predicate logic, NULL grouping,
  * NULL-heavy decimal aggregates), grouped/global aggregates with
  * HAVING, grouping analytics (ROLLUP / CUBE / GROUPING SETS),
  * correlated scalar subqueries (SQL renders the correlated form, the
  * DataFrame side is its hand-decorrelated rewrite), DISTINCT
  * projections, total-order ORDER BY + LIMIT,
  * UNION ALL / INTERSECT [ALL] / EXCEPT [ALL] (set AND bag semantics),
  * IS [NOT] NULL and BETWEEN predicate leaves, conditional counts
  * (sum CASE WHEN), decimal product-sums (DECIMAL×DECIMAL through the
  * widened exact product type), LATERAL correlated aggregate subqueries
  * in FROM (SQL renders the lateral form, the DataFrame side its
  * decorrelated group+left-join rewrite), row_number/running-sum
  * windows, tie-preserving rank() windows over non-unique orderings
  * (also over joined inputs), RANGE-frame running sums over non-unique
  * orderings (peer-inclusive frames — round 11), explicit NULLS
  * FIRST/LAST ordering on both renderings (the engines' ASC defaults
  * differ, so each seed exercises one engine's non-default path —
  * round 11), GROUPING SETS with DUPLICATED sets (the SQL-standard
  * multiplicity edge both engines must honor — round 11), correlated
  * EXISTS/IN *inside OR* (disjunctive decorrelation — the DataFrame
  * side splits the disjunction into bag-disjoint pred-IS-TRUE ∪
  * pred-NOT-TRUE ∧ semi branches; round 12, seed bit 3), ROWS and
  * RANGE frames MIXED in one plan (two window specs, different frame
  * types — round 12, seed bit 4 on the RANGE variant), and NOT IN
  * anti-subqueries on even seeds (Spark's null-aware anti join — a
  * physically different operator from NOT EXISTS's plain anti join;
  * round 12), the SQL-standard aggregate FILTER clause
  * (`count(*) FILTER (WHERE p)` vs the DataFrame count-over-
  * NULL-unless-p twin — round 12, seed bit 5), DISTINCT aggregates
  * (`count(DISTINCT c)`, planned through Spark's Expand two-phase
  * aggregate — round 12, seed bit 6), and HAVING on an UNPROJECTED
  * aggregate (`HAVING count(*) >= m` with no count(*) in the SELECT
  * list — a different resolution path in both engines; the DataFrame
  * twin computes a hidden count, filters, and prunes it — round 12,
  * seed bit 7), and GROUP BY a computed EXPRESSION (`c % 5` /
  * `substr(c, 1, 1)` repeated in projection and GROUP BY — expression
  * group keys bind through a different path than bare columns in both
  * engines — round 12, seed bit 8) —
  * as an AST rendered BOTH as a DataFrame-API plan and as ANSI
  * SQL — the two executions must agree row-for-row. FuzzRelationalSpec
  * runs ≥1000 generated plans DataFrame-vs-`spark.sql` (soak knob
  * SPARK_GRAFT_FUZZ_PLANS; round-12 soak: 5000 green); fourteen fixed
  * seeds are exported as `q_fuzz_*` query entries whose SQL rendering IS
  * the DuckDB oracle, so the driver cross-checks the same generator
  * against a second engine every round. This is the cheapest route to
  * correctness bugs the fixed query inventory can't reach: the
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

  /** uniqueKey: a single-column primary key that stays unique under every
    * declared (many-to-one) dim join — the deterministic ORDER BY for the
    * window shapes. None (lineitem) excludes the table from them. */
  private final case class FTable(name: String, cols: Seq[FCol],
      uniqueKey: Option[String] = None)

  /** base-table key = dim-table key equi-join. */
  private final case class FJoin(dim: FTable, leftKey: String, rightKey: String)

  private val region = FTable("region", Seq(
    FCol("r_regionkey", IntK, 0, 4, lowCard = true),
    FCol("r_name", StrK(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")),
      lowCard = true)))

  private val nation = FTable("nation", Seq(
    FCol("n_nationkey", IntK, 0, 24),
    FCol("n_regionkey", IntK, 0, 4, lowCard = true)),
    uniqueKey = Some("n_nationkey"))

  private val customer = FTable("customer", Seq(
    FCol("c_custkey", IntK, 1, 1000),
    FCol("c_nationkey", IntK, 0, 24, lowCard = true),
    FCol("c_acctbal", DblK, -999, 9999),
    FCol("c_mktsegment", StrK(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")), lowCard = true)),
    uniqueKey = Some("c_custkey"))

  private val supplier = FTable("supplier", Seq(
    FCol("s_suppkey", IntK, 1, 100),
    FCol("s_nationkey", IntK, 0, 24, lowCard = true),
    FCol("s_acctbal", DblK, -999, 9999)),
    uniqueKey = Some("s_suppkey"))

  private val orders = FTable("orders", Seq(
    FCol("o_orderkey", IntK, 1, 60000),
    FCol("o_custkey", IntK, 1, 1000),
    FCol("o_orderstatus", StrK(Seq("F", "O", "P")), lowCard = true),
    FCol("o_totalprice", DblK, 900, 400000),
    FCol("o_orderpriority", StrK(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")), lowCard = true)),
    uniqueKey = Some("o_orderkey"))

  private val part = FTable("part", Seq(
    FCol("p_partkey", IntK, 1, 2000),
    FCol("p_size", IntK, 1, 50, lowCard = true),
    FCol("p_retailprice", DblK, 900, 2000),
    FCol("p_brand", StrK((1 to 5).flatMap(i => (1 to 5).map(j => s"Brand#$i$j"))),
      lowCard = true)),
    uniqueKey = Some("p_partkey"))

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

  private final case class Between(c: FCol, lo: Double, hi: Double) extends Pred {
    private def l(v: Double) =
      if (v == v.floor) v.toLong.toString else v.toString
    def sql = s"${c.name} BETWEEN ${l(lo)} AND ${l(hi)}"
    def df = col(c.name).between(lit(lo), lit(hi))
  }

  /** NULL test — only ever true downstream of a LEFT OUTER join's
    * NULL-extension, but valid (constant-false) anywhere. */
  private final case class IsNull(c: FCol, neg: Boolean) extends Pred {
    def sql = s"${c.name} IS ${if (neg) "NOT " else ""}NULL"
    def df = if (neg) col(c.name).isNotNull else col(c.name).isNull
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
  /** `distinct` (round 12, keyed off seed bit 6): count(DISTINCT c) —
    * Spark plans it through an Expand + two-phase aggregate, a
    * physically different operator from plain count, and NULLs are
    * excluded identically in both engines. */
  private final case class CountCol(c: FCol, distinct: Boolean = false) extends Agg {
    val alias = s"cnt_${c.name}"
    def sql = s"count(${if (distinct) "DISTINCT " else ""}${c.name}) AS $alias"
    def df = (if (distinct) count_distinct(col(c.name))
      else count(col(c.name))).as(alias)
  }
  /** Conditional count — sum(CASE WHEN p). DuckDB's integer sum is
    * HUGEINT, so the explicit BIGINT cast is load-bearing.
    *
    * `filterSyntax` (round 12, keyed off seed bit 5) renders the same
    * semantics as the SQL-standard aggregate FILTER clause —
    * `count(*) FILTER (WHERE p)` — which both Spark SQL and DuckDB
    * support but plan differently from the CASE form (Spark folds the
    * filter into the aggregate expression, not a CASE projection); the
    * DataFrame twin is count over a NULL-unless-p literal, since
    * count() skips NULLs. */
  private final case class CondCount(p: Pred,
      filterSyntax: Boolean = false) extends Agg {
    val alias = "cnt_cond"
    def sql =
      if (filterSyntax) s"count(*) FILTER (WHERE ${p.sql}) AS $alias"
      else s"CAST(sum(CASE WHEN ${p.sql} THEN 1 ELSE 0 END) AS BIGINT) AS $alias"
    def df =
      if (filterSyntax) count(when(p.df, lit(1))).as(alias)
      else sum(when(p.df, 1).otherwise(0)).cast("long").as(alias)
  }
  /** Decimal product-sum (the q01 revenue pattern as a fuzz surface):
    * DECIMAL(18,2) × DECIMAL(18,2) stays exact through the widened
    * product type on both engines (Spark 37,4 / DuckDB 36,4 — both
    * inside the 38-digit ceiling). The sum is rounded to DECIMAL(38,0)
    * BEFORE the double cast — a measured cross-engine edge found by this
    * very aggregate: casting a scale-4 decimal whose scaled magnitude
    * exceeds 2⁵³ to DOUBLE double-rounds in DuckDB (int128→double, then
    * ÷10⁴) but single-rounds in Spark (BigDecimal.doubleValue), so the
    * two engines can disagree by an ulp at ~10¹³ sums. The integer-
    * rounded value stays below 2⁵³ for every catalog range, where the
    * int→double conversion is exact on both sides. The rounding itself
    * must be an explicit `round(x, 0)` — a second measured edge: the
    * decimal→DECIMAL(38,0) CAST truncates in DuckDB but HALF_UP-rounds
    * in Spark; round() is half-away-from-zero in both. */
  private final case class SumProd(a: FCol, b: FCol) extends Agg {
    val alias = s"prod_${a.name}_${b.name}"
    def sql = s"CAST(CAST(round(sum(CAST(${a.name} AS DECIMAL(18,2)) * " +
      s"CAST(${b.name} AS DECIMAL(18,2))), 0) AS DECIMAL(38,0)) AS DOUBLE) AS $alias"
    def df = round(sum(col(a.name).cast("decimal(18,2)") *
      col(b.name).cast("decimal(18,2)")), 0).cast("decimal(38,0)")
      .cast("double").as(alias)
  }

  /** A generated plan: both renderings plus a human-readable signature. */
  final case class Plan(seed: Long, sql: String,
      run: (SparkSession, String) => DataFrame)

  // ---- generator ----

  private def pick[A](rnd: scala.util.Random, xs: Seq[A]): A =
    xs(rnd.nextInt(xs.size))

  /** .0/.25/.5/.75 quarters inside [lo, hi] — exact binary fractions, so
    * both SQL parsers produce the identical double (the round-10
    * literal-edge widening; .1-style literals would round differently
    * through decimal-vs-binary parse paths and are deliberately never
    * generated). */
  private def halfLit(rnd: scala.util.Random, c: FCol): Double = {
    val steps = math.max(1, ((c.hi - c.lo) * 4).toInt)
    c.lo + rnd.nextInt(steps) / 4.0
  }

  private def genPred(rnd: scala.util.Random, cols: Seq[FCol]): Pred = {
    def leaf(): Pred = {
      val c = pick(rnd, cols)
      if (rnd.nextInt(8) == 0) IsNull(c, neg = rnd.nextBoolean())
      else c.kind match {
        case StrK(vs) =>
          if (rnd.nextInt(3) == 0)
            StrIn(c, rnd.shuffle(vs).take(1 + rnd.nextInt(math.min(3, vs.size))).sorted)
          else StrEq(c, pick(rnd, vs), neg = rnd.nextInt(4) == 0)
        case _ if rnd.nextInt(4) == 0 =>
          val a = halfLit(rnd, c); val b = halfLit(rnd, c)
          Between(c, math.min(a, b), math.max(a, b))
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

  /** `filterSyntax` / `distinctCount` are render-only edges keyed off
    * seed bits in plan() — they change NO draw, so every pre-existing
    * seed keeps its plan and the bit flips only the SQL/DF surface. */
  private def genAggs(rnd: scala.util.Random, cols: Seq[FCol],
      filterSyntax: Boolean = false, distinctCount: Boolean = false): Seq[Agg] = {
    def one(): Agg = rnd.nextInt(7) match {
      case 0 => CountStar
      case 1 => val c = pick(rnd, cols); MinMax(c, isMin = rnd.nextBoolean())
      case 2 =>
        pick(rnd, cols.filter(_.kind == IntK)) match { case c => SumInt(c) }
      case 3 =>
        val dbls = cols.filter(_.kind == DblK)
        if (dbls.isEmpty) CountStar else SumDec(pick(rnd, dbls))
      case 4 => CondCount(genPred(rnd, cols), filterSyntax)
      case 5 =>
        val nums = cols.filter(c => c.kind == DblK || c.kind == IntK)
        if (nums.size < 2) CountStar
        else {
          val a = pick(rnd, nums); val b = pick(rnd, nums.filterNot(_ == a))
          SumProd(a, b)
        }
      case _ => CountCol(pick(rnd, cols), distinctCount)
    }
    val aggs = Seq.fill(1 + rnd.nextInt(3))(one())
    // unique aliases (duplicate aggregates collapse to one)
    aggs.groupBy(_.alias).values.map(_.head).toSeq.sortBy(_.alias)
  }

  /** Generate the plan for a seed. `forceAgg` restricts to the
    * aggregate shape (bounded output — used for the driver entries).
    *
    * Join forms: none / inner dim join / EXISTS semi / NOT EXISTS anti
    * (the semi/anti subquery optionally carries its own dim predicate —
    * the decorrelation path nobody hand-writes twice the same way).
    * Output shapes: aggregate (grouped/global, optional HAVING on
    * count(*)), projection (optional DISTINCT, optional total-order
    * ORDER BY + LIMIT — ordering by EVERY projected column NULLS FIRST
    * makes the kept multiset deterministic even with duplicate tuples),
    * and window (row_number + optional running integer sum partitioned
    * by a low-cardinality key, ordered by the base table's primary key,
    * top-j filtered). Every numeric surface keeps the determinism rules
    * from the header (explicit BIGINT casts for row_number/sums, no
    * double accumulation).
    */
  def plan(seed: Long, forceAgg: Boolean = false): Plan = {
    val rnd = new scala.util.Random(seed)
    val (base, joinable) = pick(rnd, bases)
    // 0 = no join, 1 = inner dim join, 2 = EXISTS semi, 3 = NOT EXISTS anti,
    // 4 = LEFT OUTER against a FILTERED dim (the filter is what produces
    // NULL-extended rows — the FK is complete, so an unfiltered outer join
    // would degenerate to inner), 5 = FULL OUTER against a FILTERED dim
    // (NULL-extension on BOTH sides: filtered-out dims null the dim cols,
    // unreferenced dims null the base cols). forceAgg (driver oracle
    // entries) remaps 4/5 → 1: outer-join aggregates can emit NULL cells,
    // whose pandas/duckdb dtype coercion is engine-dependent; the NULL
    // paths stay covered by the Spark-vs-Spark spec.
    val joinKind0 = if (joinable.isEmpty) 0 else rnd.nextInt(6)
    val joinKind = if (forceAgg && joinKind0 >= 4) 1 else joinKind0
    val join = if (joinKind >= 1) Some(pick(rnd, joinable)) else None
    // dim columns are only visible downstream of an INNER/OUTER join
    val cols = base.cols ++
      (if (joinKind == 1 || joinKind >= 4) join.map(_.dim.cols).getOrElse(Seq.empty)
       else Seq.empty)
    val dimPred =
      if (joinKind >= 2 && (joinKind0 >= 4 || rnd.nextBoolean()))
        Some(genPred(rnd, join.get.dim.cols))
      else None
    val pred = if (forceAgg || rnd.nextInt(4) > 0) Some(genPred(rnd, cols)) else None

    // Render-only NULL-dtype shield (round 14 — the hold-out that kept
    // outer-join window plans off the cross-engine oracle): under an
    // OUTER join (joinKind 4/5) a projected int column can be
    // NULL-extended, and a nulled int coerces engine-dependently in the
    // driver's pandas/duckdb compare path (int32 vs float64). Casting
    // the projection to BIGINT on BOTH renderings makes the dtype
    // symmetric — int64 when the result happens null-free, float64 with
    // NaN when nulled — without touching the draw stream (keyed off the
    // plan's own join kind, never an rnd draw). Inner/semi/anti plans
    // render exactly as before.
    def shieldSql(name: String): String =
      if (joinKind >= 4 && cols.exists(c => c.name == name && c.kind == IntK))
        s"CAST($name AS BIGINT) AS $name"
      else name
    def shieldDf(name: String): Column =
      if (joinKind >= 4 && cols.exists(c => c.name == name && c.kind == IntK))
        col(name).cast("long").as(name)
      else col(name)

    val fromSql = base.name + (joinKind match {
      case 1 => join.map(j =>
        s" JOIN ${j.dim.name} ON ${j.leftKey} = ${j.rightKey}").getOrElse("")
      case 4 | 5 => join.map(j =>
        s" ${if (joinKind == 5) "FULL" else "LEFT"} JOIN (SELECT * FROM ${j.dim.name}" +
          dimPred.map(p => s" WHERE ${p.sql}").getOrElse("") +
          s") AS dimf ON ${j.leftKey} = ${j.rightKey}").getOrElse("")
      case _ => ""
    })
    val existsSql = join.flatMap { j =>
      if (joinKind < 2 || joinKind >= 4) None
      else if (joinKind == 2 && (seed & 1) == 0) {
        // IN-subquery rendering of the same semi join on even seeds —
        // a second decorrelation surface (IN vs EXISTS) for free; keyed
        // off the seed's parity, NOT an rnd draw, so the generator's
        // draw stream (and with it every fixed driver seed's structure)
        // is unchanged. Keys are non-null, so IN ≡ EXISTS here.
        Some(s"${base.name}.${j.leftKey} IN (SELECT ${j.rightKey} FROM " +
          s"${j.dim.name}" +
          dimPred.map(p => s" WHERE (${p.sql})").getOrElse("") + ")")
      } else if (joinKind == 3 && (seed & 1) == 0) {
        // NOT IN rendering of the anti join on even seeds (round 12):
        // same seed-parity key as the IN edge, so the draw stream is
        // untouched. NOT IN plans as Spark's null-aware anti join
        // (BroadcastHashJoin LeftAnti, isNullAwareAntiJoin=true) — a
        // physically DIFFERENT operator from NOT EXISTS's plain anti
        // join, with runtime null-probe semantics the differential
        // would never reach through EXISTS. Keys are non-null FKs, so
        // NOT IN ≡ NOT EXISTS here and the DataFrame side stays
        // left_anti; an all-filtered (empty) subquery keeps every row
        // on both engines.
        Some(s"${base.name}.${j.leftKey} NOT IN (SELECT ${j.rightKey} FROM " +
          s"${j.dim.name}" +
          dimPred.map(p => s" WHERE (${p.sql})").getOrElse("") + ")")
      } else {
        val not = if (joinKind == 3) "NOT " else ""
        val extra = dimPred.map(p => s" AND (${p.sql})").getOrElse("")
        Some(s"${not}EXISTS (SELECT 1 FROM ${j.dim.name} WHERE " +
          s"${j.dim.name}.${j.rightKey} = ${base.name}.${j.leftKey}$extra)")
      }
    }
    // disjunctive-EXISTS edge (round 12, keyed off seed bit 3 so the
    // draw stream is unchanged): WHERE (pred) OR EXISTS(...) — the
    // decorrelation a plain semi join CANNOT express (it would drop
    // pred-true rows without a dim match). The DataFrame side splits
    // the disjunction into two bag-disjoint branches: pred IS TRUE,
    // plus (pred NOT TRUE) ∧ semi — disjoint because a row's pred is
    // exactly one of TRUE / FALSE / NULL, so the union never
    // duplicates. Covers both the EXISTS and the even-seed IN
    // renderings of the subquery.
    val orExists = joinKind == 2 && pred.isDefined && existsSql.isDefined &&
      (seed & 8L) != 0L

    def whereSql(extraPred: Option[Pred]): String = {
      if (orExists && extraPred.isDefined)
        return s" WHERE (${extraPred.get.sql}) OR (${existsSql.get})"
      val terms = extraPred.map(p => s"(${p.sql})").toSeq ++ existsSql
      if (terms.isEmpty) "" else terms.mkString(" WHERE ", " AND ", "")
    }

    def src(s: SparkSession, dir: String, extraPred: Option[Pred]): DataFrame = {
      val b = Tables(s, dir, base.name)
      if (orExists && extraPred.isDefined) {
        val j = join.get
        val d0 = Tables(s, dir, j.dim.name)
        val d = dimPred.map(p => d0.filter(p.df)).getOrElse(d0)
        val p = extraPred.get.df
        return b.filter(p).union(
          b.join(d, col(j.leftKey) === col(j.rightKey), "left_semi")
            .filter(!coalesce(p, lit(false))))
      }
      val joined = join match {
        case Some(j) if joinKind == 1 =>
          b.join(Tables(s, dir, j.dim.name), col(j.leftKey) === col(j.rightKey))
        case Some(j) => // semi (2) / anti (3) / outer (4/5) vs the filtered dim
          val d0 = Tables(s, dir, j.dim.name)
          val d = dimPred.map(p => d0.filter(p.df)).getOrElse(d0)
          b.join(d, col(j.leftKey) === col(j.rightKey), joinKind match {
            case 2 => "left_semi"
            case 3 => "left_anti"
            case 5 => "full_outer"
            case _ => "left_outer"
          })
        case None => b
      }
      extraPred match { case Some(p) => joined.filter(p.df); case None => joined }
    }

    val groupable = cols.filter(_.lowCard)
    // 0-2 aggregate, 3-4 projection, 5 window (falls back to projection
    // when the base has no stable unique key or nothing to partition by),
    // 6 set operation (base table only — UNION ALL keeps bag semantics,
    // INTERSECT/EXCEPT are set-distinct in BOTH engines' defaults),
    // 7 grouping analytics (ROLLUP / CUBE / GROUPING SETS),
    // 8 correlated scalar subquery (SQL renders the correlated form,
    // the DataFrame side is its hand-decorrelated group+join rewrite —
    // a differential of exactly the decorrelation Catalyst performs).
    // forceAgg (driver oracle entries) draws bounded-output aggregate
    // shapes only: plain aggregates, STRING-grouped grouping analytics
    // (string group cells stay object-dtype under NULL subtotals on both
    // engines, where a nulled int64 group column would coerce to
    // engine-dependent dtypes), and correlated-subquery aggregates.
    // 9 = LATERAL correlated aggregate subquery in FROM (round 10): the
    // SQL renders Spark/DuckDB's shared `, LATERAL (SELECT agg ...)`
    // form, the DataFrame side its decorrelated group+left-join rewrite;
    // the aggregate subquery always yields one row (NULL on no match),
    // so the lateral column NULL-extends like an outer join — kept out
    // of forceAgg for the same dtype-coercion reason as shapes 4/5.
    val strGroupable = groupable.filter(_.kind.isInstanceOf[StrK])
    val gaCols = if (forceAgg) strGroupable else groupable
    val shape0 =
      if (forceAgg) Seq(0, 0, 7, 8)(rnd.nextInt(4)) else rnd.nextInt(10)
    val shape = shape0 match {
      case 7 if gaCols.isEmpty => 0
      case 8 if joinable.isEmpty => 0
      case 9 if joinable.isEmpty => 0
      case s => s
    }
    // window-shape sub-variant, drawn once inside the first shape-5
    // guard (keeps the draw stream identical to the pre-r11 generator,
    // where the same single draw chose rank-vs-row_number)
    var windowVariant = -1

    if (shape <= 2) {
      // aggregate shape (grouped or global, optional HAVING)
      val gcols =
        if (groupable.nonEmpty && (forceAgg || rnd.nextBoolean()))
          rnd.shuffle(groupable).take(1 + rnd.nextInt(math.min(2, groupable.size)))
            .map(_.name).sorted
        else Seq.empty
      val aggs0 = genAggs(rnd, cols,
        filterSyntax = (seed & 32L) != 0L, distinctCount = (seed & 64L) != 0L)
      val havingMin =
        if (gcols.nonEmpty && rnd.nextInt(3) == 0) Some(1 + rnd.nextInt(4)) else None
      // unprojected-HAVING edge (round 12, keyed off seed bit 7 so the
      // draw stream is unchanged): HAVING count(*) >= m WITHOUT count(*)
      // in the SELECT list. SQL resolvers handle this through a
      // different path than projected aggregates (Spark rewrites the
      // filter against a hidden aggregate then prunes it; DuckDB binds
      // the HAVING aggregate independently of the projection) — the
      // DataFrame twin computes the count under an internal alias,
      // filters, and drops it. Without the bit the pre-existing
      // rendering (count(*) appended to the SELECT) is unchanged.
      val havingHidden =
        havingMin.isDefined && (seed & 128L) != 0L && !aggs0.contains(CountStar)
      // HAVING count(*) needs count(*) in the aggregate list (unless the
      // hidden edge deliberately leaves it unprojected)
      val aggs =
        if (havingMin.isDefined && !havingHidden && !aggs0.contains(CountStar))
          (aggs0 :+ CountStar).sortBy(_.alias)
        else aggs0
      // group-by-EXPRESSION edge (round 12, keyed off seed bit 8 so the
      // draw stream is unchanged): the grouping key becomes a COMPUTED
      // expression over the first drawn group column — `c % 5` for an
      // integer key, `substr(c, 1, 1)` for a string key — projected
      // under an alias and repeated verbatim in GROUP BY. Both engines
      // bind expression group keys through a different path than bare
      // columns (Spark must match the projection expression against the
      // grouping expression; DuckDB binds by recomputation), and NULLs
      // propagate through the expression into a NULL group identically.
      val exprGroupKey: Option[(String, Column)] =
        if (gcols.nonEmpty && (seed & 256L) != 0L)
          cols.find(_.name == gcols.head).map { c =>
            c.kind match {
              case StrK(_) =>
                (s"substr(${c.name}, 1, 1)", substring(col(c.name), 1, 1))
              case _ => (s"(${c.name} % 5)", col(c.name) % 5)
            }
          }
        else None
      val (groupSelSql, groupOutCols) = exprGroupKey match {
        case Some((kSql, _)) => (Seq(s"$kSql AS gk"), Seq("gk"))
        case None => (gcols, gcols)
      }
      val selSql = (groupSelSql ++ aggs.map(_.sql)).mkString(", ")
      val gSql = exprGroupKey match {
        case Some((kSql, _)) => s" GROUP BY $kSql"
        case None =>
          if (gcols.nonEmpty) s" GROUP BY ${gcols.mkString(", ")}" else ""
      }
      val hSql = havingMin.map(m => s" HAVING count(*) >= $m").getOrElse("")
      val sql = s"SELECT $selSql FROM $fromSql${whereSql(pred)}$gSql$hSql"
      Plan(seed, sql, (s, dir) => {
        val g = src(s, dir, pred)
        val aggExprs =
          if (havingHidden) aggs.map(_.df) :+ count(lit(1)).as("_hcnt")
          else aggs.map(_.df)
        val agged = exprGroupKey match {
          case Some((_, kDf)) =>
            g.groupBy(kDf.as("gk")).agg(aggExprs.head, aggExprs.tail: _*)
          case None if gcols.nonEmpty =>
            g.groupBy(gcols.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)
          case None => g.agg(aggExprs.head, aggExprs.tail: _*)
        }
        if (havingHidden)
          agged.filter(col("_hcnt") >= havingMin.get)
            .select((groupOutCols ++ aggs.map(_.alias)).map(col): _*)
        else {
          val out = agged.select((groupOutCols ++ aggs.map(_.alias)).map(col): _*)
          havingMin match {
            case Some(m) => out.filter(col(CountStar.alias) >= m)
            case None => out
          }
        }
      })
    } else if (shape == 7) {
      // grouping-analytics shape: the same aggregate surface under
      // ROLLUP / CUBE / GROUPING SETS — subtotal rows null the grouping
      // cells identically in both engines, so sorted-row comparison holds
      val gcols = rnd.shuffle(gaCols)
        .take(1 + rnd.nextInt(math.min(2, gaCols.size))).map(_.name).sorted
      val aggs = genAggs(rnd, cols,
        filterSyntax = (seed & 32L) != 0L, distinctCount = (seed & 64L) != 0L)
      val mode = rnd.nextInt(3)
      val subsets: Seq[Seq[String]] =
        (0 to gcols.size).flatMap(k => gcols.combinations(k)).toSeq
      // the FULL set is always a member: every selected grouping column
      // must appear in at least one grouping set, or the projection of
      // the missing column is invalid in both engines
      val sets: Seq[Seq[String]] =
        if (mode == 2) {
          val others = rnd.shuffle(subsets.filterNot(_ == gcols))
          val base = gcols +: others.take(rnd.nextInt(others.size + 1))
          // duplicate-set edge (round 11, keyed off a seed bit so the
          // draw stream is unchanged): the SQL standard says GROUPING
          // SETS ((a), (a)) emits the group TWICE — both engines honor
          // the multiplicity, and the sorted-multiset compare would
          // catch either engine deduplicating
          if ((seed & 4L) != 0L) base :+ base.last else base
        } else Seq.empty
      val gSql = mode match {
        case 0 => s" GROUP BY ROLLUP(${gcols.mkString(", ")})"
        case 1 => s" GROUP BY CUBE(${gcols.mkString(", ")})"
        case _ => s" GROUP BY GROUPING SETS (${
          sets.map(ss => s"(${ss.mkString(", ")})").mkString(", ")})"
      }
      val selSql = (gcols ++ aggs.map(_.sql)).mkString(", ")
      val sql = s"SELECT $selSql FROM $fromSql${whereSql(pred)}$gSql"
      Plan(seed, sql, (s, dir) => {
        val g = src(s, dir, pred)
        val grouped = mode match {
          case 0 => g.rollup(gcols.map(col): _*)
          case 1 => g.cube(gcols.map(col): _*)
          case _ => g.groupingSets(sets.map(_.map(col)), gcols.map(col): _*)
        }
        grouped.agg(aggs.head.df, aggs.tail.map(_.df): _*)
          .select((gcols ++ aggs.map(_.alias)).map(col): _*)
      })
    } else if (shape == 8) {
      // correlated-scalar-subquery shape: SQL filters the base on
      // `basecol op (SELECT min/max(dim.x) WHERE dim.pk = base.fk [AND p])`;
      // the DataFrame side runs the DECORRELATED rewrite by hand —
      // group the (filtered) dim per key, left-join, compare (an empty
      // subquery yields NULL, the comparison is NULL, the row drops —
      // identically on both paths). forceAgg aggregates the survivors.
      val j = pick(rnd, joinable)
      val x = pick(rnd, j.dim.cols.filter(c => c.kind == IntK || c.kind == DblK))
      val isMin = rnd.nextBoolean()
      val subPred = if (rnd.nextInt(3) > 0) Some(genPred(rnd, j.dim.cols)) else None
      val op = pick(rnd, Seq("<", "<=", ">", ">="))
      val bc = pick(rnd, base.cols.filter(c => c.kind == IntK || c.kind == DblK))
      val basePred = if (rnd.nextBoolean()) Some(genPred(rnd, base.cols)) else None
      val fn = if (isMin) "min" else "max"
      val subSql = s"SELECT $fn(${x.name}) FROM ${j.dim.name} WHERE " +
        s"${j.dim.name}.${j.rightKey} = ${base.name}.${j.leftKey}" +
        subPred.map(p => s" AND (${p.sql})").getOrElse("")
      val whereCorr = basePred.map(p => s"(${p.sql}) AND ").getOrElse("") +
        s"${bc.name} $op ($subSql)"
      def survivors(s: SparkSession, dir: String): DataFrame = {
        val d0 = Tables(s, dir, j.dim.name)
        val d = subPred.map(p => d0.filter(p.df)).getOrElse(d0)
        val sub = d.groupBy(col(j.rightKey))
          .agg((if (isMin) min(col(x.name)) else max(col(x.name))).as("_sub"))
        val b0 = Tables(s, dir, base.name)
        val b = basePred.map(p => b0.filter(p.df)).getOrElse(b0)
        val cmp = op match {
          case "<" => col(bc.name) < col("_sub")
          case "<=" => col(bc.name) <= col("_sub")
          case ">" => col(bc.name) > col("_sub")
          case _ => col(bc.name) >= col("_sub")
        }
        b.join(sub, col(j.leftKey) === col(j.rightKey), "left").filter(cmp)
      }
      if (forceAgg || rnd.nextBoolean()) {
        val bg = base.cols.filter(c =>
          c.lowCard && (!forceAgg || c.kind.isInstanceOf[StrK]))
        val gcols =
          if (bg.nonEmpty && (forceAgg || rnd.nextBoolean()))
            rnd.shuffle(bg).take(1 + rnd.nextInt(math.min(2, bg.size)))
              .map(_.name).sorted
          else Seq.empty
        val aggs = genAggs(rnd, base.cols,
          filterSyntax = (seed & 32L) != 0L, distinctCount = (seed & 64L) != 0L)
        val selSql = (gcols ++ aggs.map(_.sql)).mkString(", ")
        val gSql = if (gcols.nonEmpty) s" GROUP BY ${gcols.mkString(", ")}" else ""
        val sql = s"SELECT $selSql FROM ${base.name} WHERE $whereCorr$gSql"
        Plan(seed, sql, (s, dir) => {
          val g = survivors(s, dir)
          val agged =
            if (gcols.nonEmpty)
              g.groupBy(gcols.map(col): _*).agg(aggs.head.df, aggs.tail.map(_.df): _*)
            else g.agg(aggs.head.df, aggs.tail.map(_.df): _*)
          agged.select((gcols ++ aggs.map(_.alias)).map(col): _*)
        })
      } else {
        val proj = rnd.shuffle(base.cols).take(2 + rnd.nextInt(3)).map(_.name).sorted
        val sql = s"SELECT ${proj.mkString(", ")} FROM ${base.name} WHERE $whereCorr"
        Plan(seed, sql, (s, dir) =>
          survivors(s, dir).select(proj.map(col): _*))
      }
    } else if (shape == 6) {
      // set-operation shape: two differently-filtered projections of the
      // SAME base (same schema by construction), combined with
      // UNION ALL / INTERSECT / EXCEPT — the join draw is ignored
      val p1 = genPred(rnd, base.cols)
      val p2 = genPred(rnd, base.cols)
      val proj = rnd.shuffle(base.cols).take(2 + rnd.nextInt(2)).map(_.name).sorted
      // the ALL variants (round 10) exercise bag-semantics set ops —
      // multiplicity arithmetic instead of set-distinct
      val opSql = pick(rnd, Seq("UNION ALL", "INTERSECT", "EXCEPT",
        "INTERSECT ALL", "EXCEPT ALL"))
      val sql =
        s"SELECT ${proj.mkString(", ")} FROM ${base.name} WHERE ${p1.sql} " +
          s"$opSql SELECT ${proj.mkString(", ")} FROM ${base.name} WHERE ${p2.sql}"
      Plan(seed, sql, (s, dir) => {
        val b = Tables(s, dir, base.name)
        val l = b.filter(p1.df).select(proj.map(col): _*)
        val r = b.filter(p2.df).select(proj.map(col): _*)
        opSql match {
          case "UNION ALL" => l.union(r)
          case "INTERSECT" => l.intersect(r)
          case "INTERSECT ALL" => l.intersectAll(r)
          case "EXCEPT ALL" => l.exceptAll(r)
          case _ => l.except(r)
        }
      })
    } else if (shape == 5 && base.uniqueKey.nonEmpty && groupable.nonEmpty
        && { windowVariant = rnd.nextInt(3); windowVariant == 1 }) {
      // rank-window variant (round 10): rank() ordered by a NON-unique
      // numeric column — ties share a rank, and the rank<=j cut keeps
      // every tied row, so the emitted SET is deterministic without a
      // tiebreak (row_number there would be nondeterministic; rank is
      // the shape that exercises tie arithmetic in both engines)
      val g = pick(rnd, groupable).name
      val nums = base.cols.filter(c =>
        (c.kind == IntK || c.kind == DblK) && !c.lowCard && c.name != g)
      val oc = pick(rnd, if (nums.isEmpty) base.cols.filterNot(_.name == g) else nums).name
      val topJ = 1 + rnd.nextInt(5)
      val sql =
        s"SELECT ${shieldSql(g)}, ${shieldSql(oc)}, rk FROM (" +
          s"SELECT $g, $oc, CAST(rank() OVER (PARTITION BY $g ORDER BY $oc " +
          s"NULLS FIRST) " +
          s"AS BIGINT) AS rk FROM $fromSql${whereSql(pred)}) AS w WHERE rk <= $topJ"
      // NULLS FIRST is explicit on BOTH sides: oc can be NULL-extended
      // under the generator's FULL OUTER join, Spark's ASC default is
      // nulls-first but DuckDB's is nulls-LAST — implicit ordering would
      // silently diverge if a window seed were ever promoted to a
      // cross-engine oracle (round-12 ADVICE).
      Plan(seed, sql, (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(g)).orderBy(col(oc).asc_nulls_first)
        src(s, dir, pred)
          .withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= topJ)
          .select(shieldDf(g), shieldDf(oc), col("rk"))
      })
    } else if (shape == 5 && base.uniqueKey.nonEmpty && groupable.nonEmpty
        && windowVariant == 2) {
      // RANGE-frame variant (round 11): a running integer sum over
      // RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW ordered by a
      // NON-unique column — the frame includes ALL peers of the current
      // row, so tied rows share one sum and the output multiset is
      // deterministic without a tiebreak (a ROWS frame there would be
      // order-nondeterministic; RANGE is the shape that exercises peer
      // arithmetic in both engines). Integer sums only → exact.
      val g = pick(rnd, groupable).name
      val ints = base.cols.filter(c =>
        c.kind == IntK && !c.lowCard && c.name != g)
      val oc = pick(rnd,
        if (ints.isEmpty) base.cols.filter(c => c.kind == IntK && c.name != g)
        else ints).name
      val scPool = base.cols.filter(c => c.kind == IntK && c.name != oc)
      val sc = pick(rnd, if (scPool.isEmpty) Seq(base.cols.find(_.kind == IntK).get)
        else scPool).name
      // mixed-frame edge (round 12, keyed off seed bit 4 so the draw
      // stream is unchanged): the SAME plan also carries a ROWS-frame
      // running sum ordered by the primary key — two window specs with
      // DIFFERENT frame types must coexist (separate Window nodes in
      // Spark, one pass in DuckDB); deterministic because the ROWS
      // order is the unique key
      val uk = base.uniqueKey.get
      val mixed = (seed & 16L) != 0L
      // NULLS FIRST is explicit on the uk ordering too (round 14): uk is
      // the base's unique key, NULL-extended only under a FULL outer
      // join — explicit placement keeps the two engines' ASC defaults
      // from diverging there, and is a no-op for every other join kind.
      val csumSql = if (mixed)
        s", CAST(sum($sc) OVER (PARTITION BY $g ORDER BY $uk NULLS FIRST " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          s"AS csum"
      else ""
      val sql =
        s"SELECT ${shieldSql(g)}, ${shieldSql(oc)}, CAST(sum($sc) OVER (PARTITION BY $g ORDER BY $oc " +
          s"NULLS FIRST " +
          s"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          s"AS rsum$csumSql FROM $fromSql${whereSql(pred)}"
      // explicit NULLS FIRST both sides — same cross-engine ASC-default
      // split as the rank variant above (round-12 ADVICE)
      Plan(seed, sql, (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(g)).orderBy(col(oc).asc_nulls_first)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val withR = src(s, dir, pred)
          .withColumn("rsum", sum(col(sc)).over(w).cast("long"))
        val out =
          if (mixed) withR.withColumn("csum", sum(col(sc)).over(
            Window.partitionBy(col(g)).orderBy(col(uk).asc_nulls_first)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
          else withR
        out.select((Seq(shieldDf(g), shieldDf(oc), col("rsum")) ++
          (if (mixed) Seq(col("csum")) else Nil)): _*)
      })
    } else if (shape == 5 && base.uniqueKey.nonEmpty && groupable.nonEmpty) {
      // window shape: row_number (+ optional running int sum) per group,
      // ordered by the primary key — deterministic in both engines
      val g = pick(rnd, groupable).name
      val uk = base.uniqueKey.get
      val topJ = 1 + rnd.nextInt(5)
      val csumCol =
        if (rnd.nextBoolean())
          Some(pick(rnd, base.cols.filter(c => c.kind == IntK && c.name != uk)
            match { case Seq() => base.cols.filter(_.kind == IntK); case xs => xs }).name)
        else None
      // uk ordering carries explicit NULLS FIRST (round 14) — same
      // cross-engine ASC-default reasoning as the mixed-frame csum above
      val over = s"OVER (PARTITION BY $g ORDER BY $uk NULLS FIRST)"
      val csumSel = csumCol.map(c =>
        s", CAST(sum($c) OVER (PARTITION BY $g ORDER BY $uk NULLS FIRST " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS csum")
        .getOrElse("")
      val outCols = Seq(g, uk, "rn") ++ csumCol.map(_ => "csum")
      val sql =
        s"SELECT ${(outCols.map(shieldSql)).mkString(", ")} FROM (" +
          s"SELECT $g, $uk, CAST(row_number() $over AS BIGINT) AS rn$csumSel " +
          s"FROM $fromSql${whereSql(pred)}) AS w WHERE rn <= $topJ"
      Plan(seed, sql, (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(g)).orderBy(col(uk).asc_nulls_first)
        val in = src(s, dir, pred)
          .withColumn("rn", row_number().over(w).cast("long"))
        val withSum = csumCol match {
          case Some(c) => in.withColumn("csum",
            sum(col(c)).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).cast("long"))
          case None => in
        }
        withSum.filter(col("rn") <= topJ).select(outCols.map(shieldDf): _*)
      })
    } else if (shape == 9) {
      // LATERAL shape: a correlated aggregate subquery in FROM — the
      // subquery is a global aggregate, so it yields exactly ONE row per
      // base row (NULL value when the filtered dim has no match: the
      // lateral column NULL-extends like an outer join). SQL is the
      // shared `, LATERAL (...)` form; the DataFrame side is the
      // decorrelated per-key aggregate + left join Catalyst itself
      // produces for it.
      val j = pick(rnd, joinable)
      val x = pick(rnd, j.dim.cols.filter(c => c.kind == IntK || c.kind == DblK))
      val isMin = rnd.nextBoolean()
      val subPred = if (rnd.nextInt(3) > 0) Some(genPred(rnd, j.dim.cols)) else None
      val basePred = if (rnd.nextBoolean()) Some(genPred(rnd, base.cols)) else None
      val proj = rnd.shuffle(base.cols).take(2 + rnd.nextInt(2)).map(_.name).sorted
      // LATERAL × aggregate-FILTER edge (round 13, seed bit 9, drawn
      // LAST so the draw stream of every other seed is unchanged): the
      // correlated aggregate carries FILTER (WHERE p) — correlation and
      // the filter clause must compose (DuckDB evaluates the filter
      // inside the lateral; Spark's decorrelated rewrite must apply it
      // to the group side BEFORE aggregation, which the conditional
      // aggregate encodes); an all-filtered group NULLs lval exactly
      // like an empty lateral match.
      val aggFilter =
        if ((seed & 512L) != 0L) Some(genPred(rnd, j.dim.cols)) else None
      val fn = if (isMin) "min" else "max"
      val filterSql =
        aggFilter.map(p => s" FILTER (WHERE ${p.sql})").getOrElse("")
      val sql = s"SELECT ${proj.mkString(", ")}, lval FROM ${base.name}, LATERAL (" +
        s"SELECT $fn(${x.name})$filterSql AS lval FROM ${j.dim.name} WHERE " +
        s"${j.dim.name}.${j.rightKey} = ${base.name}.${j.leftKey}" +
        subPred.map(p => s" AND (${p.sql})").getOrElse("") + ") AS lsub" +
        basePred.map(p => s" WHERE ${p.sql}").getOrElse("")
      Plan(seed, sql, (s, dir) => {
        val d0 = Tables(s, dir, j.dim.name)
        val d = subPred.map(p => d0.filter(p.df)).getOrElse(d0)
        val xv = aggFilter match {
          case Some(p) => when(p.df, col(x.name))
          case None => col(x.name)
        }
        val sub = d.groupBy(col(j.rightKey)).agg(
          (if (isMin) min(xv) else max(xv)).as("lval"))
        val b0 = Tables(s, dir, base.name)
        val b = basePred.map(p => b0.filter(p.df)).getOrElse(b0)
        b.join(sub, col(j.leftKey) === col(j.rightKey), "left")
          .select((proj :+ "lval").map(col): _*)
      })
    } else {
      // projection shape: a few concrete columns, always filtered;
      // optional DISTINCT; optional total-order ORDER BY + LIMIT
      val p = pred.getOrElse(genPred(rnd, cols))
      val proj = rnd.shuffle(cols).take(2 + rnd.nextInt(3)).map(_.name).sorted
      val distinct = rnd.nextInt(3) == 0
      val limitN =
        if (rnd.nextInt(3) == 0) Some(1 + rnd.nextInt(50)) else None
      val distSql = if (distinct) "DISTINCT " else ""
      // NULLS FIRST/LAST edge (round 11): keyed off a seed bit, NOT an
      // rnd draw, so the generator's draw stream is unchanged. Both
      // engines default differently (Spark ASC = NULLS FIRST, DuckDB
      // ASC = NULLS LAST), so the placement is always EXPLICIT on both
      // renderings — this exercises the non-default path in each.
      val nullsLast = (seed & 2L) != 0L
      val np = if (nullsLast) "NULLS LAST" else "NULLS FIRST"
      val orderSql = limitN.map(n =>
        s" ORDER BY ${proj.map(c => s"$c $np").mkString(", ")} LIMIT $n")
        .getOrElse("")
      val sql =
        s"SELECT $distSql${proj.mkString(", ")} FROM $fromSql${whereSql(Some(p))}$orderSql"
      Plan(seed, sql, (s, dir) => {
        val base0 = src(s, dir, Some(p)).select(proj.map(col): _*)
        val d = if (distinct) base0.distinct() else base0
        limitN match {
          case Some(n) => d.orderBy(proj.map(c =>
            if (nullsLast) col(c).asc_nulls_last else col(c).asc_nulls_first): _*)
            .limit(n)
          case None => d
        }
      })
    }
  }

  /** Fixed-seed aggregate plans exported to the driver's oracle gate:
    * the SQL rendering runs in DuckDB, the DataFrame rendering in
    * Spark — a per-round cross-engine differential check of the same
    * generator FuzzRelationalSpec exercises Spark-vs-Spark.
    *
    * Seeds chosen (FuzzSeedScan at sf0.001) for non-trivial rows and
    * feature diversity across the round-10 widened grammar (quarter
    * literals + decimal product-sums re-roll every seed's plan):
    * 5 = correlated scalar subquery + grouped aggregate, 9 = inner
    * join + ROLLUP + decimal product-sum, 14 = HAVING + grouped
    * aggregate, 23 = EXISTS semi join + GROUPING SETS (+ round-11
    * duplicate set — seed bit 4), 25 = correlated scalar subquery +
    * decimal product-sum, 32 = inner join + GROUPING SETS, 33 =
    * correlated scalar subquery + two-key grouped aggregate, 57 =
    * ROLLUP + decimal product-sum, 86 = NOT EXISTS anti join + CUBE,
    * 92 = inner join + ROLLUP; round-11 promotions: 76 = inner join +
    * GROUPING SETS with a DUPLICATED set (the multiplicity edge, 120
    * rows), 132 = inner join + two-key GROUPING SETS with a duplicated
    * set; round-12 promotions (the disjunctive-EXISTS edge, seed
    * bit 3): 139 = (pred) OR EXISTS(...) semi over supplier→nation
    * with a grouped min, 408 = (pred) OR key IN (SELECT ...) — the IN
    * rendering of the same disjunction — over nation→region with a
    * filtered subquery (the round-12 group-by-expression edge, seed
    * bit 8, converts 408 in place: it now groups by (n_regionkey % 5)
    * AS gk); round-12 promotions (the NOT IN anti-subquery
    * edge — null-aware anti join on even seeds; 86 picked it up in
    * place): 146 = orders NOT IN filtered customer keys under a
    * conditional-count aggregate + HAVING (which the round-12
    * unprojected-HAVING edge, seed bit 7, converts in place: its
    * HAVING count(*) now filters WITHOUT count(*) in the SELECT),
    * 242 = supplier NOT IN
    * filtered nation keys with a plain grouped count. */
  val driverSeeds =
    Seq(5L, 9L, 14L, 23L, 25L, 32L, 33L, 57L, 76L, 86L, 92L, 132L,
      139L, 146L, 242L, 408L)

  /** Window-bearing driver seeds (round 13 — the family the round-12
    * NULLS-placement fix unlocked): NON-forceAgg plans whose natural
    * draw lands the shape-5 window variants, hand-picked via
    * FuzzSeedScan --window at sf0.001. The round-13 picks avoided outer
    * joins (a NULL-extended int column coerced engine-dependently in
    * the pandas/duckdb compare path); round 14's BIGINT shield removed
    * that hold-out and promoted four outer-join seeds below. 347 = EXISTS semi + rank()
    * top-j (tie arithmetic through a decorrelated semi join), 397 =
    * inner dim join + RANGE-frame running sum (peer-inclusive frames
    * over joined rows), 404 = mixed RANGE + ROWS frames in one plan
    * (two Window nodes in Spark, one pass in DuckDB — the round-12
    * mixed-frame edge, now cross-engine-checked).
    *
    * Round-14 promotions — the OUTER-JOIN window family, unlocked by
    * the render-only BIGINT shield on NULL-extendable int projections
    * (see `shieldSql` in [[plan]]) plus explicit NULLS FIRST on the uk
    * orderings. Each is tie-DETERMINISTIC despite NULL order keys
    * because every tied row projects identical cells (NULL-extended
    * rows in one partition are indistinguishable in the emitted
    * columns, and running sums over their NULL contributions stay
    * NULL): 87 = FULL outer + rank() where unmatched dims tie at rank 1
    * on a NULL order key, 128 = LEFT outer + rank() with a
    * NULL-propagating OR predicate over a nullable dim column, 574 =
    * FULL outer + the mixed RANGE/ROWS frame pair over NULL-first
    * order-key ties, 599 = LEFT outer sliced to ONLY the NULL-extended
    * rows (r_name IS NULL) — window arithmetic over an all-NULL
    * partition key. */
  val windowDriverSeeds = Seq(347L, 397L, 404L, 87L, 128L, 574L, 599L)

  /** Set-operation driver seeds (round 14): shape 6 never draws under
    * forceAgg, so the INTERSECT/EXCEPT family was soak-only until now.
    * Non-forceAgg plans, FuzzSeedScan --setop picked: 35 = EXCEPT ALL
    * (bag difference — multiplicity arithmetic) on supplier, 115 =
    * INTERSECT (set-distinct) on part, 158 = EXCEPT on part, 251 =
    * INTERSECT ALL on part with an IS-NOT-NULL disjunct. Projection
    * output is join-free, so no NULL extension and the int dtypes stay
    * symmetric without the shield. */
  val setOpDriverSeeds = Seq(35L, 115L, 158L, 251L)

  val all: Seq[Q] = driverSeeds.map { s =>
    val p = plan(s, forceAgg = true)
    Q(s"q_fuzz_$s", p.run, Some(p.sql))
  } ++ windowDriverSeeds.map { s =>
    val p = plan(s)
    Q(s"q_fuzzw_$s", p.run, Some(p.sql))
  } ++ setOpDriverSeeds.map { s =>
    val p = plan(s)
    Q(s"q_fuzzs_$s", p.run, Some(p.sql))
  }
}
