package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational query inventory over the TPC-H-ish star schema.
  *
  * Scale notes (these shapes must survive 100 TB):
  *  - dimension joins (`region`, `nation`, `customer`, `supplier`, `part`)
  *    are explicitly `broadcast()` — no shuffle of the fact table on a
  *    dimension key;
  *  - aggregates run as partial (map-side) + final HashAggregate, Catalyst
  *    default — no `collect`-side reduction anywhere;
  *  - top-k is `ORDER BY ... LIMIT k` → TakeOrderedAndProject (per-partition
  *    bounded heap + driver merge of k·P rows, same algorithm as
  *    gann.c:498-574's bounded max-heap);
  *  - money sums are exact DECIMAL(18,2) sums surfaced as doubles, so the
  *    result is independent of partition/merge order (a raw double sum is
  *    not associative and would diverge from the oracle at scale).
  */
object Relational {
  private def dec2(c: Column) = c.cast(DecimalType(18, 2))
  private def dec2s(c: Column) = c.cast(DecimalType(4, 2))
  private def dsum(c: Column) = sum(dec2(c)).cast("double")
  private def discPrice =
    dec2(col("l_extendedprice")) * dec2s(lit(1.0) - col("l_discount"))
  private def ts(s: String) = lit(s).cast("timestamp")

  val q01_pricing_summary = Q(
    "q01_pricing_summary",
    (s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2000-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(discPrice * dec2s(lit(1.0) + col("l_tax"))).cast("double").as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      |SELECT l_returnflag, l_linestatus,
      |  ${Sql.dsum("l_quantity")} AS sum_qty,
      |  ${Sql.dsum("l_extendedprice")} AS sum_base_price,
      |  ${Sql.dsumExpr(Sql.discPrice)} AS sum_disc_price,
      |  ${Sql.dsumExpr(s"${Sql.discPrice} * CAST(1.0 + l_tax AS DECIMAL(4,2))")} AS sum_charge,
      |  ${Sql.dsum("l_quantity")} / count(*) AS avg_qty,
      |  ${Sql.dsum("l_extendedprice")} / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus
      |""".stripMargin))

  val q03_shipping_priority = Q(
    "q03_shipping_priority",
    (s, dir) => {
      val cust = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    },
    Some(s"""
      |SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  ${Sql.dsumExpr(Sql.discPrice)} AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10
      |""".stripMargin))

  val q05_local_supplier = Q(
    "q05_local_supplier",
    (s, dir) => {
      val region = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = Tables(s, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey")
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },
    Some(s"""
      |SELECT n_name, ${Sql.dsumExpr(Sql.discPrice)} AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name
      |""".stripMargin))

  val q06_forecast_revenue = Q(
    "q06_forecast_revenue",
    (s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec2s(col("l_discount")))
          .cast("double").as("revenue"))
    },
    Some(s"""
      |SELECT ${Sql.dsumExpr("CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))")} AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24
      |""".stripMargin))

  val q10_returned_items = Q(
    "q10_returned_items",
    (s, dir) => {
      val nation = Tables(s, dir, "nation").select("n_nationkey", "n_name")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey")
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },
    Some(s"""
      |SELECT c_custkey, c_name, c_acctbal, n_name,
      |  ${Sql.dsumExpr(Sql.discPrice)} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20
      |""".stripMargin))

  val q_top_parts_per_brand = Q(
    "q_top_parts_per_brand",
    (s, dir) => {
      val part = Tables(s, dir, "part").select("p_partkey", "p_brand")
      val li = Tables(s, dir, "lineitem").select("l_partkey", "l_extendedprice")
      val pr = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(dsum(col("l_extendedprice")).as("revenue"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(desc("revenue"), col("p_partkey"))
      pr.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy(col("p_brand"), col("rnk"))
    },
    Some(s"""
      |SELECT p_brand, p_partkey, revenue, rnk FROM (
      |  SELECT p_brand, p_partkey, revenue,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
      |  FROM (
      |    SELECT p_brand, p_partkey, ${Sql.dsum("l_extendedprice")} AS revenue
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_brand, p_partkey))
      |WHERE rnk <= 3
      |ORDER BY p_brand, rnk
      |""".stripMargin))

  val q_customer_running_spend = Q(
    "q_customer_running_spend",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""
      |SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderdate, o_orderkey
      |""".stripMargin))

  val q_events_hourly = Q(
    "q_events_hourly",
    (s, dir) => {
      Tables(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("ts_hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("ts_hour"), col("event_type"))
    },
    Some(s"""
      |SELECT date_trunc('hour', ts) AS ts_hour, event_type,
      |  count(*) AS n, ${Sql.dsum("value")} AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2
      |""".stripMargin))

  val q_events_sessionize = Q(
    "q_events_sessionize",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""
      |WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id
      |""".stripMargin))

  val all: Seq[Q] = Seq(
    q01_pricing_summary, q03_shipping_priority, q05_local_supplier,
    q06_forecast_revenue, q10_returned_items, q_top_parts_per_brand,
    q_customer_running_spend, q_events_hourly, q_events_sessionize)
}
