package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Relational oracle queries Q1-Q11 (SURVEY §2.10) as idiomatic DataFrame
  * programs with DuckDB-equivalent SQL oracles.
  *
  * Determinism rules (FIXTURES.md): UTC session, total ORDER BY everywhere,
  * floats rounded before comparison. Monetary sums go through
  * DECIMAL(18,2) so they are exact and association-order-independent — a
  * plain double sum differs between engines (and between partitionings!)
  * in the last bits, which can flip a rounded 4th decimal.
  *
  * Scale notes: nation/region joins are broadcast explicitly; everything
  * else relies on hash aggregation with map-side partial aggregation.
  */
object Relational {
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1: scan + project + filter — predicate and both columns push to parquet.
    "q01_filter" -> ((s, d) => Tables.lineitem(s, d)
      .where(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")),

    // Q2: 3-way equi join + agg; nation broadcast.
    "q02_join_agg" -> ((s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")),

    // Q3: TPC-H Q1 shape — multi-function grouped aggregation.
    "q03_tpch_q1" -> ((s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,10)")).cast("double").as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        r4(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        r4(sum(dec(col("l_discount"))).cast("double") / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .withColumn("sum_disc_price", r4(col("sum_disc_price")))
      .orderBy("l_returnflag", "l_linestatus")),

    // Q4: left-semi join via broadcast of the tiny dim side.
    "q04_semi_join" -> ((s, d) => {
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      Tables.supplier(s, d)
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"),
          "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // Q5: anti join — customers with no orders.
    "q05_anti_join" -> ((s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")),

    // Q6: window ranking — top-3 orders per customer.
    "q06_window_rank" -> ((s, d) => Tables.orders(s, d)
      .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")),

    // Q7: running-sum analytic frame. DECIMAL inside the frame: DuckDB's
    // segment-tree window aggregation associates differently than Spark's
    // running accumulation, so double sums would drift.
    "q07_window_frame" -> ((s, d) => Tables.orders(s, d)
      .withColumn("running_rev",
        sum(dec(col("o_totalprice"))).over(Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select("o_custkey", "o_orderkey", "running_rev")
      .orderBy("o_custkey", "o_orderkey")),

    // Q8: global top-k by computed expression.
    "q08_topk" -> ((s, d) => Tables.lineitem(s, d)
      .withColumn("revenue",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .orderBy(desc("revenue"), col("l_orderkey"), col("l_linenumber"))
      .limit(10)
      .select(col("l_orderkey"), col("l_linenumber"),
        r4(col("revenue")).as("revenue"))),

    // Q9: EXCEPT — customer nations with no supplier.
    "q09_except" -> ((s, d) => Tables.customer(s, d)
      .select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")),

    // Q9b: INTERSECT — nations with both customers and suppliers.
    "q09b_intersect" -> ((s, d) => Tables.customer(s, d)
      .select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")),

    // Q10: ROLLUP grouping sets + distinct aggregate.
    "q10_rollup" -> ((s, d) => Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        countDistinct("l_suppkey").as("supp_cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"), col("supp_cnt"))
      .orderBy("rf", "ls")),

    // Q11: date bucketing + string functions.
    "q11_datefn" -> ((s, d) => Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("month")),

    "q11b_stringfn" -> ((s, d) => Tables.part(s, d)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 10)).as("name10"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy("p_partkey")),

    // Q10b: CUBE grouping sets.
    "q10b_cube" -> ((s, d) => Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"))
      .orderBy("rf", "ls")),

    // Q33: left outer join — nations with zero suppliers keep a 0 count.
    "q33_outer_join" -> ((s, d) => Tables.nation(s, d)
      .join(Tables.supplier(s, d),
        col("n_nationkey") === col("s_nationkey"), "left")
      .groupBy("n_name")
      .agg(count(col("s_suppkey")).as("n_suppliers"))
      .orderBy("n_name")),

    // Q34: JSON extraction from the events props column.
    "q34_json" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .where(col("event_id") < 200)
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_join_agg" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q03_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  ${r4sql("CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,10))) AS DOUBLE)")} AS sum_disc_price,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  ${r4sql("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)")} AS avg_price,
        |  ${r4sql("CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)")} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q04_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM nation JOIN region ON n_regionkey = r_regionkey
        |              WHERE r_name = 'ASIA' AND n_nationkey = s_nationkey)
        |ORDER BY s_suppkey""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q07_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q08_topk" ->
      s"""SELECT l_orderkey, l_linenumber,
        |  ${r4sql("l_extendedprice * (1.0 - l_discount)")} AS revenue
        |FROM lineitem
        |ORDER BY l_extendedprice * (1.0 - l_discount) DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin,

    "q09_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q09b_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS cnt, count(DISTINCT l_suppkey) AS supp_cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q11_datefn" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "q11b_stringfn" ->
      """SELECT p_partkey, upper(substr(p_name, 1, 10)) AS name10,
        |  concat(p_brand, '#', p_type) AS brand_type,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q10b_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q33_outer_join" ->
      """SELECT n_name, count(s_suppkey) AS n_suppliers
        |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q34_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin
  )
}
