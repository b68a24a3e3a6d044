package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The general relational surface (SURVEY.md §2.3-§2.6, §2.11): aggregation,
  * multi-way joins, top-k, windows, rollup, set ops, semi/anti joins, JSON and
  * date functions — the Spark SQL capabilities the reference gets "for free"
  * in this rebuild, expressed over the driver's TPC-H-ish tables.
  *
  * Determinism/oracle contract: every floating aggregate goes through an exact
  * DECIMAL intermediate and back to DOUBLE, timestamps are projected as epoch
  * milliseconds (both engines truncate identically), and every query has a
  * total deterministic ORDER BY.
  *
  * Scale notes (100 TB): fact-fact joins (lineitem⋈orders) shuffle on the join
  * key and are AQE-managed; all dimension joins are explicit broadcasts; sorts
  * feeding LIMIT lower to TakeOrderedAndProject (no global sort shuffle).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** SUM(x) via exact decimal, emitted as DOUBLE — engine-independent. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  private def tsMs(c: Column): Column = unix_millis(c)

  val defs: Map[String, Q] = Map(

    // A-family: grouped aggregation with exact decimal sums (TPC-H Q1 shape).
    "q01_pricing_summary" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            // exact decimal(18,6) sum, re-rounded to (18,2) so the scaled
            // integer stays inside 2^53: the decimal→double cast is then
            // bit-identical across engines (19-digit decimals convert with
            // an extra rounding in some engines)
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
              .cast("decimal(18,2)").cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    // Join + agg + top-k (TPC-H Q3 shape); dims broadcast, fact join shuffles.
    "q02_top_revenue_orders" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        // aggregate-then-join: revenue is a function of lineitem alone, so
        // the fact-fact join shrinks to (top-10 keys) ⋈ orders instead of
        // shipping every lineitem row through the join — the plan that
        // survives a 100× scale-up
        val top = li.groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
        // the 10-row side is the broadcast side; orders is only probed
        broadcast(top)
          .join(o.select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate")),
            Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_orderdate"), col("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
        ORDER BY revenue DESC, o.o_orderkey LIMIT 10"""),
      headline = true),

    // Six-way join (TPC-H Q5 shape): local-supplier revenue per nation.
    "q03_revenue_by_nation" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
            .cast("decimal(18,2)").cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("r_name"), col("n_name"))
      },
      oracle = Some("""
        SELECT r_name, n_name,
               CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY revenue DESC, r_name, n_name"""),
      headline = true),

    // Predicate-pushdown scalar aggregate (TPC-H Q6 shape).
    "q04_filtered_revenue" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 25)
          .agg(
            sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,6)"))
              .cast("decimal(18,2)").cast("double").as("revenue"),
            count(lit(1)).as("n_rows")),
      oracle = Some("""
        SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 25""")),

    "q05_order_priority" -> Q(
      fn = (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
          .orderBy(col("o_orderpriority"), col("o_orderstatus")),
      oracle = Some("""
        SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders GROUP BY o_orderpriority, o_orderstatus
        ORDER BY o_orderpriority, o_orderstatus""")),

    // Window: top-3 orders per customer (k-NN-join shape on relational data).
    "q06_top_orders_per_customer" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          FROM orders) WHERE rn <= 3
        ORDER BY o_custkey, rn""")),

    // Window: running sum per tenant over the event stream.
    "q07_running_total" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), tsMs(col("ts")).as("ts_ms"), col("value"))
          .withColumn("running_value",
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
          .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
      },
      oracle = Some("""
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                 PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        FROM events ORDER BY user_id, ts_ms, event_id"""),
      headline = true),

    // J5: graph-node derivation — DISTINCT ∪ DISTINCT.
    "q08_union_distinct_nodes" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.select(col("l_partkey").as("node_id"))
          .union(li.select(col("l_suppkey").as("node_id")))
          .distinct()
          .orderBy(col("node_id"))
      },
      oracle = Some("""
        SELECT l_partkey AS node_id FROM lineitem
        UNION SELECT l_suppkey FROM lineitem
        ORDER BY node_id""")),

    // Semi join (EXISTS): customers having orders.
    "q09_customers_with_orders" -> Q(
      fn = (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // Anti join (NOT EXISTS): customers without URGENT orders. The orders
    // side is filtered (every fixture customer has SOME order, which made
    // the unfiltered anti-join vacuously empty) so the difference set has
    // genuine survivors at every scale factor (203 at sf0.01).
    "q10_customers_without_orders" -> Q(
      fn = (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // Rollup (grouping sets surface, §2.11).
    "q11_rollup_lineitem" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
            col("n_rows"), col("sum_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      oracle = Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus""")),

    // A5: exact distinct counts.
    "q12_distinct_counts" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        o.agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
      },
      oracle = Some("""
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders""")),

    // Date functions (§2.6): per-month order stats.
    "q13_monthly_orders" -> Q(
      fn = (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
          .orderBy(col("order_month")),
      oracle = Some("""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
        ORDER BY order_month""")),

    // JSON extraction (§2.6 to_json/from_json surface) over event props.
    "q14_json_props" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type")),
      oracle = Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // T3: recent-events timeline (sort desc + limit).
    "q15_timeline_recent" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"), tsMs(col("ts")).as("ts_ms"), col("user_id"),
            col("event_type"), col("value"))
          .orderBy(col("ts_ms").desc, col("event_id").desc)
          .limit(100),
      oracle = Some("""
        SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        FROM events ORDER BY ts_ms DESC, event_id DESC LIMIT 100""")),

    // T4: filtered audit tail (action filter + sort desc + limit).
    "q16_audit_errors" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .filter(col("event_type") === "error")
          .select(col("event_id"), tsMs(col("ts")).as("ts_ms"), col("user_id"), col("value"))
          .orderBy(col("ts_ms").desc, col("event_id").desc)
          .limit(50),
      oracle = Some("""
        SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, value
        FROM events WHERE event_type = 'error'
        ORDER BY ts_ms DESC, event_id DESC LIMIT 50""")),

    // A3: per-key ordered accumulation (doc-chunk concat shape) — the
    // deterministic version of the reference's arrival-order concat
    // (hive_service.go:194): explicit (ts, id) ordering inside the group.
    "q17_session_concat" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            concat_ws("|",
              transform(
                array_sort(collect_list(struct(tsMs(col("ts")).as("ts_ms"),
                  col("event_id"), col("event_type")))),
                x => x.getField("event_type"))).as("event_seq"))
          .orderBy(col("user_id")),
      oracle = Some("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               string_agg(event_type, '|' ORDER BY epoch_ms(ts), event_id) AS event_seq
        FROM events GROUP BY user_id ORDER BY user_id"""),
      headline = true),

    // Set ops (§2.11): nations present in BOTH supplier and customer bases.
    "q50_intersect_nations" -> Q(
      fn = (s, dir) =>
        t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
          .intersect(t(s, dir, "customer").select(col("c_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      oracle = Some("""
        SELECT s_nationkey AS nationkey FROM supplier
        INTERSECT SELECT c_nationkey FROM customer
        ORDER BY nationkey""")),

    // Set ops: customer nations with no TOP-BALANCE supplier presence. The
    // supplier side is filtered (every fixture nation has some supplier,
    // which made the unfiltered EXCEPT vacuously empty) so the difference
    // set survives at every scale factor (24 at sf0.01, 12 at sf0.1).
    "q51_except_nations" -> Q(
      fn = (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .except(t(s, dir, "supplier")
            .filter(col("s_acctbal") > 9800)
            .select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM supplier
               WHERE s_acctbal > CAST(9800 AS DOUBLE)
        ORDER BY nationkey""")),

    // Pivot as conditional aggregation (the shape that scales — one pass,
    // map-side partials, no per-value shuffle).
    "q52_status_pivot" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        def n(st: String) = count(when(col("o_orderstatus") === st, 1)).as(s"n_${st.toLowerCase}")
        def sm(st: String) =
          sum(when(col("o_orderstatus") === st, col("o_totalprice")).cast("decimal(18,2)"))
            .cast("double").as(s"sum_${st.toLowerCase}")
        o.groupBy(col("o_orderpriority"))
          .agg(n("F"), n("O"), n("P"), sm("F"), sm("O"), sm("P"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some("""
        SELECT o_orderpriority,
               CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
               CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
               CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS sum_f,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS sum_o,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS sum_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Correlated scalar subquery (Catalyst decorrelation), via the SQL
    // front door: cheapest part per brand.
    "q53_min_price_per_brand" -> Q(
      fn = (s, dir) => {
        Tables(s, dir, "part").createOrReplaceTempView("part")
        s.sql("""
          SELECT p_brand, p_partkey, p_name, p_retailprice
          FROM part p
          WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
                                 FROM part p2 WHERE p2.p_brand = p.p_brand)
          ORDER BY p_brand, p_partkey""")
      },
      oracle = Some("""
        SELECT p_brand, p_partkey, p_name, p_retailprice
        FROM part p
        WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
                               FROM part p2 WHERE p2.p_brand = p.p_brand)
        ORDER BY p_brand, p_partkey""")),

    // Correlated EXISTS (decorrelated to semi join): orders containing any
    // high-quantity line.
    "q54_orders_with_bulk_lines" -> Q(
      fn = (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT o_orderkey, o_orderstatus
          FROM orders o
          WHERE EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
          ORDER BY o_orderkey""")
      },
      oracle = Some("""
        SELECT o_orderkey, o_orderstatus
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        ORDER BY o_orderkey""")),

    // Z-order layout audit, hash-exact: Morton address of (l_partkey,
    // l_suppkey), coarse 256-way binning (z >> 24), per-bin row counts and
    // min/max of BOTH dimensions — the per-file statistics a z-ordered
    // parquet layout would expose for data skipping (every bin covers a
    // tight range of each dimension; ZOrderSpec quantifies the pruning win
    // vs a single-column sort). Pure bit arithmetic, identical in both
    // engines via ZOrder.interleave / interleaveSql.
    "q3k_zorder_bins" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .withColumn("z", graft.functions.ZOrder.interleave(
            Seq(col("l_partkey"), col("l_suppkey")), bitsPerDim = 16))
          .withColumn("zbin", shiftright(col("z"), 24))
          .groupBy(col("zbin"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
            min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
          .orderBy(col("zbin")),
      oracle = Some(s"""
        WITH z AS (SELECT l_partkey, l_suppkey,
          ${graft.functions.ZOrder.interleaveSql(Seq("l_partkey", "l_suppkey"), 16)} AS zval
          FROM lineitem)
        SELECT zval >> 24 AS zbin, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
               MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
        FROM z GROUP BY zbin ORDER BY zbin""")),

    // Link-graph PageRank (3 power iterations, damping 0.85) over a
    // directed graph derived deterministically from orders on BOTH sides
    // (custkey mod 80 → orderkey mod 97: nodes 80-96 are dst-only, so the
    // dangling-mass redistribution path is genuinely exercised). The
    // iterative twin of q37's connected components: Spark runs the
    // Pregel-style localCheckpoint loop, DuckDB unrolls the three
    // iterations as chained materialized CTEs; per-edge contributions sum
    // through exact DECIMAL(28,12) and ranks snap to 9 decimals per round,
    // so both engines walk identical doubles.
    "q4b_pagerank" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        graft.operators.GraphOps.pageRank(edges, iterations = 3, damping = 0.85)
          .select(col("node"), round(col("pr"), 6).as("pagerank"))
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 80 AS BIGINT) AS src,
                          CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders
          WHERE o_custkey % 80 <> o_orderkey % 97),
        nodes AS MATERIALIZED (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        odeg AS MATERIALIZED (
          SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        pr0 AS MATERIALIZED (
          SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes),
        d1 AS MATERIALIZED (
          SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(28,12))) AS DOUBLE),
                          CAST(0 AS DOUBLE)) AS dm
          FROM pr0 p LEFT JOIN odeg o ON o.src = p.node WHERE o.src IS NULL),
        c1 AS MATERIALIZED (
          SELECT e.dst,
                 SUM(CAST(p.pr / CAST(o.outdeg AS DOUBLE) AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN pr0 p ON p.node = e.src JOIN odeg o ON o.src = e.src
          GROUP BY e.dst),
        pr1 AS MATERIALIZED (
          SELECT n.node,
                 ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn.n FROM nn)
                   + CAST(0.85 AS DOUBLE) *
                     (COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE))
                      + (SELECT dm FROM d1) / (SELECT nn.n FROM nn)), 9) AS pr
          FROM nodes n LEFT JOIN c1 c ON c.dst = n.node),
        d2 AS MATERIALIZED (
          SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(28,12))) AS DOUBLE),
                          CAST(0 AS DOUBLE)) AS dm
          FROM pr1 p LEFT JOIN odeg o ON o.src = p.node WHERE o.src IS NULL),
        c2 AS MATERIALIZED (
          SELECT e.dst,
                 SUM(CAST(p.pr / CAST(o.outdeg AS DOUBLE) AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN pr1 p ON p.node = e.src JOIN odeg o ON o.src = e.src
          GROUP BY e.dst),
        pr2 AS MATERIALIZED (
          SELECT n.node,
                 ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn.n FROM nn)
                   + CAST(0.85 AS DOUBLE) *
                     (COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE))
                      + (SELECT dm FROM d2) / (SELECT nn.n FROM nn)), 9) AS pr
          FROM nodes n LEFT JOIN c2 c ON c.dst = n.node),
        d3 AS MATERIALIZED (
          SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(28,12))) AS DOUBLE),
                          CAST(0 AS DOUBLE)) AS dm
          FROM pr2 p LEFT JOIN odeg o ON o.src = p.node WHERE o.src IS NULL),
        c3 AS MATERIALIZED (
          SELECT e.dst,
                 SUM(CAST(p.pr / CAST(o.outdeg AS DOUBLE) AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN pr2 p ON p.node = e.src JOIN odeg o ON o.src = e.src
          GROUP BY e.dst),
        pr3 AS MATERIALIZED (
          SELECT n.node,
                 ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn.n FROM nn)
                   + CAST(0.85 AS DOUBLE) *
                     (COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE))
                      + (SELECT dm FROM d3) / (SELECT nn.n FROM nn)), 9) AS pr
          FROM nodes n LEFT JOIN c3 c ON c.dst = n.node)
        SELECT node, ROUND(pr, 6) AS pagerank FROM pr3 ORDER BY node"""),
      headline = true),

    // Personalized PageRank (q4b's graph, restart mass uniform over the
    // seed nodes 0-9): graph-proximity-to-the-seed-set relevance. The
    // restart, initial mass AND dangling redistribution all follow the
    // restart vector; same DECIMAL-sum / 9-decimal-grid parity recipe.
    "q4f_personalized_pagerank" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        val seeds = s.range(0, 10).select(col("id").as("node"))
        graft.operators.GraphOps.personalizedPageRank(edges, seeds,
          iterations = 3, damping = 0.85)
          .select(col("node"), round(col("pr"), 6).as("pagerank"))
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 80 AS BIGINT) AS src,
                          CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders
          WHERE o_custkey % 80 <> o_orderkey % 97),
        nodes AS MATERIALIZED (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
          UNION SELECT * FROM range(0, 10)),
        ns AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS DOUBLE) AS s FROM nodes WHERE node < 10),
        odeg AS MATERIALIZED (
          SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        nr AS MATERIALIZED (
          SELECT node,
                 CASE WHEN node < 10 THEN CAST(1.0 AS DOUBLE) / (SELECT ns.s FROM ns)
                      ELSE CAST(0 AS DOUBLE) END AS rv
          FROM nodes),
        pr0 AS MATERIALIZED (SELECT node, rv, rv AS pr FROM nr),
        d1 AS MATERIALIZED (
          SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(28,12))) AS DOUBLE),
                          CAST(0 AS DOUBLE)) AS dm
          FROM pr0 p LEFT JOIN odeg o ON o.src = p.node WHERE o.src IS NULL),
        c1 AS MATERIALIZED (
          SELECT e.dst,
                 SUM(CAST(p.pr / CAST(o.outdeg AS DOUBLE) AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN pr0 p ON p.node = e.src JOIN odeg o ON o.src = e.src
          GROUP BY e.dst),
        pr1 AS MATERIALIZED (
          SELECT n.node, n.rv,
                 ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.rv
                   + CAST(0.85 AS DOUBLE) *
                     (COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE))
                      + (SELECT dm FROM d1) * n.rv), 9) AS pr
          FROM nr n LEFT JOIN c1 c ON c.dst = n.node),
        d2 AS MATERIALIZED (
          SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(28,12))) AS DOUBLE),
                          CAST(0 AS DOUBLE)) AS dm
          FROM pr1 p LEFT JOIN odeg o ON o.src = p.node WHERE o.src IS NULL),
        c2 AS MATERIALIZED (
          SELECT e.dst,
                 SUM(CAST(p.pr / CAST(o.outdeg AS DOUBLE) AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN pr1 p ON p.node = e.src JOIN odeg o ON o.src = e.src
          GROUP BY e.dst),
        pr2 AS MATERIALIZED (
          SELECT n.node, n.rv,
                 ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.rv
                   + CAST(0.85 AS DOUBLE) *
                     (COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE))
                      + (SELECT dm FROM d2) * n.rv), 9) AS pr
          FROM nr n LEFT JOIN c2 c ON c.dst = n.node),
        d3 AS MATERIALIZED (
          SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(28,12))) AS DOUBLE),
                          CAST(0 AS DOUBLE)) AS dm
          FROM pr2 p LEFT JOIN odeg o ON o.src = p.node WHERE o.src IS NULL),
        c3 AS MATERIALIZED (
          SELECT e.dst,
                 SUM(CAST(p.pr / CAST(o.outdeg AS DOUBLE) AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN pr2 p ON p.node = e.src JOIN odeg o ON o.src = e.src
          GROUP BY e.dst),
        pr3 AS MATERIALIZED (
          SELECT n.node, n.rv,
                 ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.rv
                   + CAST(0.85 AS DOUBLE) *
                     (COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE))
                      + (SELECT dm FROM d3) * n.rv), 9) AS pr
          FROM nr n LEFT JOIN c3 c ON c.dst = n.node)
        SELECT node, ROUND(pr, 6) AS pagerank FROM pr3 ORDER BY node"""),
      headline = false),

    // Per-node triangle counts over q4b's link graph viewed undirected —
    // local density / community structure (spam-farm signal in crawl
    // curation). Spark runs the degree-ordered node-iterator (each
    // triangle found once at its min-rank apex, O(m^1.5) wedge bound);
    // DuckDB counts the same triangles as a three-way self-join on the
    // canonical (u < v) edge set with a < b < c. Exact integers — no
    // float parity concerns.
    "q4g_triangle_counts" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        graft.operators.GraphOps.triangleCounts(edges)
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 80 AS BIGINT) AS src,
                 CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw WHERE src <> dst),
        tri AS MATERIALIZED (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY node ORDER BY node"""),
      headline = true),

    // Local clustering coefficient over the same undirected graph:
    // cc(v) = 2·T(v)/(d(v)·(d(v)−1)), every node emitted (0 when no
    // triangle or degree < 2). The double expression is one fixed shape
    // over exact integers — 2·T first, a single divide — so both engines
    // produce bit-identical IEEE results; ROUND(...,6) on both sides.
    "q4h_clustering_coefficient" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        graft.operators.GraphOps.clusteringCoefficients(edges)
          .withColumn("clustering", round(col("clustering"), 6))
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 80 AS BIGINT) AS src,
                 CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw WHERE src <> dst),
        deg AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
          GROUP BY node),
        tri AS MATERIALIZED (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        tcount AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
          FROM (SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
          GROUP BY node)
        SELECT d.node, d.degree,
               COALESCE(t.triangles, CAST(0 AS BIGINT)) AS triangles,
               ROUND(CASE WHEN d.degree >= 2
                 THEN CAST(2 AS DOUBLE) *
                      CAST(COALESCE(t.triangles, 0) AS DOUBLE) /
                      (CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE)
                        - CAST(1 AS DOUBLE)))
                 ELSE CAST(0 AS DOUBLE) END, 6) AS clustering
        FROM deg d LEFT JOIN tcount t ON t.node = d.node
        ORDER BY d.node""")),

    // HITS hubs-and-authorities (2 iterations) over q4b's directed graph:
    // auth(v) = Σ hub(in-neighbors), hub(u) = Σ auth(out-neighbors), each
    // half-step L1-normalized. Same iterative-oracle recipe as q4b/q4f —
    // hub₀ = 1 exactly, DECIMAL(28,12) contribution + total sums, one
    // double divide per half-step, scores snapped to the 9-decimal grid.
    "q4i_hits" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        graft.operators.GraphOps.hits(edges, iterations = 2)
          .select(col("node"),
            round(col("hub"), 6).as("hub"), round(col("auth"), 6).as("auth"))
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 80 AS BIGINT) AS src,
                          CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders
          WHERE o_custkey % 80 <> o_orderkey % 97),
        nodes AS MATERIALIZED (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        h0 AS MATERIALIZED (
          SELECT node, CAST(1 AS DOUBLE) AS s FROM nodes),
        a1r AS MATERIALIZED (
          SELECT e.dst, SUM(CAST(h.s AS DECIMAL(28,12))) AS s
          FROM edges e JOIN h0 h ON h.node = e.src GROUP BY e.dst),
        a1 AS MATERIALIZED (
          SELECT n.node,
                 ROUND(COALESCE(CAST(r.s AS DOUBLE), CAST(0 AS DOUBLE))
                   / (SELECT CAST(SUM(s) AS DOUBLE) FROM a1r), 9) AS s
          FROM nodes n LEFT JOIN a1r r ON r.dst = n.node),
        h1r AS MATERIALIZED (
          SELECT e.src, SUM(CAST(a.s AS DECIMAL(28,12))) AS s
          FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY e.src),
        h1 AS MATERIALIZED (
          SELECT n.node,
                 ROUND(COALESCE(CAST(r.s AS DOUBLE), CAST(0 AS DOUBLE))
                   / (SELECT CAST(SUM(s) AS DOUBLE) FROM h1r), 9) AS s
          FROM nodes n LEFT JOIN h1r r ON r.src = n.node),
        a2r AS MATERIALIZED (
          SELECT e.dst, SUM(CAST(h.s AS DECIMAL(28,12))) AS s
          FROM edges e JOIN h1 h ON h.node = e.src GROUP BY e.dst),
        a2 AS MATERIALIZED (
          SELECT n.node,
                 ROUND(COALESCE(CAST(r.s AS DOUBLE), CAST(0 AS DOUBLE))
                   / (SELECT CAST(SUM(s) AS DOUBLE) FROM a2r), 9) AS s
          FROM nodes n LEFT JOIN a2r r ON r.dst = n.node),
        h2r AS MATERIALIZED (
          SELECT e.src, SUM(CAST(a.s AS DECIMAL(28,12))) AS s
          FROM edges e JOIN a2 a ON a.node = e.dst GROUP BY e.src),
        h2 AS MATERIALIZED (
          SELECT n.node,
                 ROUND(COALESCE(CAST(r.s AS DOUBLE), CAST(0 AS DOUBLE))
                   / (SELECT CAST(SUM(s) AS DOUBLE) FROM h2r), 9) AS s
          FROM nodes n LEFT JOIN h2r r ON r.src = n.node)
        SELECT n.node, ROUND(h2.s, 6) AS hub, ROUND(a2.s, 6) AS auth
        FROM nodes n JOIN h2 ON h2.node = n.node JOIN a2 ON a2.node = n.node
        ORDER BY n.node""")),

    // Label-propagation communities (3 synchronous rounds, min-label
    // tie-break) over a block-structured graph: both endpoints derive from
    // the same 40-node block (node c pairs with block_base + orderkey%40),
    // so the graph is a disjoint union of blocks and LPA finds real
    // community structure instead of one giant label. Exact integers;
    // DuckDB unrolls the three vote/argmax rounds.
    "q4j_label_propagation" -> Q(
      fn = (s, dir) => {
        val c = (col("o_custkey") % 1200).cast("long")
        val edges = t(s, dir, "orders").select(
          c.as("src"),
          (c - (c % 40) + (col("o_orderkey") % 40).cast("long")).as("dst"))
        graft.operators.GraphOps.labelPropagation(edges, iterations = 3)
          .select(col("node"), col("label").as("community"))
          .orderBy(col("node"))
      },
      headline = true,
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 1200 AS BIGINT) AS c,
                 CAST(o_orderkey % 40 AS BIGINT) AS o
          FROM orders),
        e0 AS (SELECT c AS src, c - (c % 40) + o AS dst FROM raw),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM e0 WHERE src <> dst),
        adj AS MATERIALIZED (
          SELECT u AS node, v AS nbr FROM und
          UNION ALL SELECT v AS node, u AS nbr FROM und),
        l0 AS MATERIALIZED (
          SELECT DISTINCT node, node AS label FROM adj),
        v1 AS MATERIALIZED (
          SELECT a.node, l.label, COUNT(*) AS n
          FROM adj a JOIN l0 l ON l.node = a.nbr GROUP BY a.node, l.label),
        l1 AS MATERIALIZED (
          SELECT node, MIN(label) AS label
          FROM (SELECT node, label, n, MAX(n) OVER (PARTITION BY node) AS mx
                FROM v1) t
          WHERE n = mx GROUP BY node),
        v2 AS MATERIALIZED (
          SELECT a.node, l.label, COUNT(*) AS n
          FROM adj a JOIN l1 l ON l.node = a.nbr GROUP BY a.node, l.label),
        l2 AS MATERIALIZED (
          SELECT node, MIN(label) AS label
          FROM (SELECT node, label, n, MAX(n) OVER (PARTITION BY node) AS mx
                FROM v2) t
          WHERE n = mx GROUP BY node),
        v3 AS MATERIALIZED (
          SELECT a.node, l.label, COUNT(*) AS n
          FROM adj a JOIN l2 l ON l.node = a.nbr GROUP BY a.node, l.label),
        l3 AS MATERIALIZED (
          SELECT node, MIN(label) AS label
          FROM (SELECT node, label, n, MAX(n) OVER (PARTITION BY node) AS mx
                FROM v3) t
          WHERE n = mx GROUP BY node)
        SELECT node, label AS community FROM l3 ORDER BY node""")),

    // k-core decomposition (k=3, 4 peel rounds) over the q4j block graph:
    // iteratively drop nodes with degree < 3, degree recomputed inside the
    // survivors. Peeling is confluent (Matula-Beck), so extra rounds after
    // the fixed point are identities — the operator early-stops while
    // DuckDB unrolls a constant 4 rounds; equal results either way. Exact
    // integers end to end.
    "q4s_kcore" -> Q(
      fn = (s, dir) => {
        val c = (col("o_custkey") % 1200).cast("long")
        val edges = t(s, dir, "orders").select(
          c.as("src"),
          (c - (c % 40) + (col("o_orderkey") % 40).cast("long")).as("dst"))
        graft.operators.GraphOps.kCore(edges, k = 3, maxRounds = 4)
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 1200 AS BIGINT) AS c,
                 CAST(o_orderkey % 40 AS BIGINT) AS o
          FROM orders),
        e0 AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM (SELECT c AS src, c - (c % 40) + o AS dst FROM raw)
          WHERE src <> dst),
        d0 AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
          GROUP BY node),
        e1 AS MATERIALIZED (
          SELECT u, v FROM e0
          WHERE u IN (SELECT node FROM d0 WHERE degree >= 3)
            AND v IN (SELECT node FROM d0 WHERE degree >= 3)),
        d1 AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
          GROUP BY node),
        e2 AS MATERIALIZED (
          SELECT u, v FROM e1
          WHERE u IN (SELECT node FROM d1 WHERE degree >= 3)
            AND v IN (SELECT node FROM d1 WHERE degree >= 3)),
        d2 AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
          GROUP BY node),
        e3 AS MATERIALIZED (
          SELECT u, v FROM e2
          WHERE u IN (SELECT node FROM d2 WHERE degree >= 3)
            AND v IN (SELECT node FROM d2 WHERE degree >= 3)),
        d3 AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
          GROUP BY node),
        e4 AS MATERIALIZED (
          SELECT u, v FROM e3
          WHERE u IN (SELECT node FROM d3 WHERE degree >= 3)
            AND v IN (SELECT node FROM d3 WHERE degree >= 3)),
        d4 AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS node FROM e4 UNION ALL SELECT v FROM e4)
          GROUP BY node)
        SELECT node, degree FROM d4 WHERE degree >= 3 ORDER BY node""")),

    // BFS crawl depth: directed hop distance from seed nodes 0-4, capped
    // at 4 hops, over a %400 link graph (only custkey-derived nodes have
    // out-edges, so real multi-hop frontiers exist at every SF). Exact
    // integers; DuckDB walks the same frontier as a depth-bounded
    // recursive CTE with UNION dedup on (node, dist) states.
    "q4k_seed_distances" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 400).cast("long").as("src"),
          (col("o_orderkey") % 400).cast("long").as("dst"))
        val seeds = s.range(0, 5).select(col("id").as("node"))
        graft.operators.GraphOps.seedDistances(edges, seeds, maxHops = 4)
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH RECURSIVE edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 400 AS BIGINT) AS src,
                          CAST(o_orderkey % 400 AS BIGINT) AS dst
          FROM orders
          WHERE o_custkey % 400 <> o_orderkey % 400),
        walk(node, dist) AS (
          SELECT CAST(range AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
          FROM range(0, 5)
          UNION
          SELECT e.dst, w.dist + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.dist < 4)
        SELECT node, MIN(dist) AS dist FROM walk
        GROUP BY node ORDER BY node""")),

    // Weighted shortest paths (q4k's weighted upgrade): 4 Bellman-Ford
    // relaxation rounds over the %400 graph with deterministic integer
    // weights — exactly "min total weight over ≤4-edge walks from the
    // seeds". Integer arithmetic end to end.
    "q6p_weighted_paths" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 400).cast("long").as("src"),
          (col("o_orderkey") % 400).cast("long").as("dst"),
          ((col("o_custkey") % 400 + col("o_orderkey") % 400) % 7 + 1)
            .cast("long").as("w"))
        val seeds = s.range(0, 5).select(col("id").as("node"))
        graft.operators.GraphOps.weightedSeedDistances(edges, seeds, maxHops = 4)
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH RECURSIVE edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 400 AS BIGINT) AS src,
                          CAST(o_orderkey % 400 AS BIGINT) AS dst,
                          CAST((o_custkey % 400 + o_orderkey % 400) % 7 + 1
                            AS BIGINT) AS w
          FROM orders
          WHERE o_custkey % 400 <> o_orderkey % 400),
        walk(node, dist, hops) AS (
          SELECT CAST(range AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist,
                 0 AS hops
          FROM range(0, 5)
          UNION
          SELECT e.dst, w.dist + e.w, w.hops + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.hops < 4)
        SELECT node, MIN(dist) AS dist FROM walk
        GROUP BY node ORDER BY node""")),

    // Bloom semi-join pushdown: the fact side pruned map-side against the
    // dimension slice's bloom BEFORE the shuffle; false positives are
    // discarded by the join, so the result — and the oracle — is exactly
    // the plain join. The bloom is invisible to correctness by design.
    "q6v_bloom_join" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val sel = t(s, dir, "orders")
          .filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.operators.BloomFilter.prefilterJoin(li, sel, "l_orderkey")
          .groupBy(col("l_orderkey"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
          .orderBy(col("l_orderkey"))
      },
      oracle = Some("""
        SELECT l.l_orderkey, o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem l
        JOIN (SELECT o_orderkey, o_orderstatus FROM orders
              WHERE o_orderkey % 97 = 0) o
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2 ORDER BY l_orderkey""")),

    // Rank-movers report: part revenue ranks in the pre-/post-1998 halves
    // full-outer-joined, top movers by |rank delta| (new/vanished parts
    // carry null deltas and sort by the present rank). Rank windows run
    // over the aggregated per-part totals.
    "q6w_rank_movers" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_partkey"), col("l_extendedprice"))
        val o = t(s, dir, "orders").select(col("o_orderkey"),
          (unix_millis(col("o_orderdate").cast("timestamp")) >=
            lit(883612800000L)).as("is_late"))
        val rev = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_partkey"), col("is_late"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .as("__rev"))
        val w = Window.partitionBy("is_late")
          .orderBy(col("__rev").desc, col("l_partkey"))
        val ranked = rev.withColumn("rnk", row_number().over(w))
        val early = ranked.filter(!col("is_late"))
          .select(col("l_partkey"), col("rnk").as("rank_early"))
        val late = ranked.filter(col("is_late"))
          .select(col("l_partkey"), col("rnk").as("rank_late"))
        early.join(late, Seq("l_partkey"), "full_outer")
          .withColumn("rank_delta", col("rank_early") - col("rank_late"))
          .orderBy(abs(col("rank_delta")).desc_nulls_last,
            col("l_partkey"))
          .limit(25)
      },
      oracle = Some("""
        WITH rev AS (
          SELECT l.l_partkey,
                 (epoch_ms(o.o_orderdate) >= 883612800000) AS is_late,
                 SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2),
        rk AS (
          SELECT l_partkey, is_late,
                 CAST(ROW_NUMBER() OVER (PARTITION BY is_late
                   ORDER BY rev DESC, l_partkey) AS INT) AS rnk
          FROM rev),
        e AS (SELECT l_partkey, rnk AS rank_early FROM rk WHERE NOT is_late),
        l AS (SELECT l_partkey, rnk AS rank_late FROM rk WHERE is_late)
        SELECT COALESCE(e.l_partkey, l.l_partkey) AS l_partkey,
               e.rank_early, l.rank_late,
               e.rank_early - l.rank_late AS rank_delta
        FROM e FULL OUTER JOIN l ON e.l_partkey = l.l_partkey
        ORDER BY abs(e.rank_early - l.rank_late) DESC NULLS LAST,
                 COALESCE(e.l_partkey, l.l_partkey)
        LIMIT 25""")),

    // Count-min sketch (depth 4 × width 1024) over lineitem part keys:
    // probes 1-50 answered from the sketch (min over depths, upward-biased)
    // next to their exact counts. The sketch shuffle is bounded by
    // depth·width cells per partition, never by key cardinality; DuckDB
    // replays the splitmix64 bucket chain per depth via OracleSql.cmsBucket
    // and takes the same LEAST over depth cells — exact integers.
    // AMS join-size estimation: the sketch inner product Σ_w a·b per
    // depth, min over depths — the number a cost-based planner consults
    // before running a join. Reported next to the exact Σ_k a_k·b_k so
    // the upward bias is visible; all-integer until the final ratio.
    "q6x_join_size_estimate" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        val a = li.select(col("l_partkey").cast("long").as("k"))
        val b = li.filter(col("l_orderkey") % 3 === 0)
          .select(col("l_partkey").cast("long").as("k"))
        val est = graft.operators.CmSketch.innerProductEstimate(
          graft.operators.CmSketch.sketch(a, "k", depth = 4, width = 1024),
          graft.operators.CmSketch.sketch(b, "k", depth = 4, width = 1024))
        val exact = a.groupBy("k").agg(count(lit(1)).as("ca"))
          .join(b.groupBy("k").agg(count(lit(1)).as("cb")), Seq("k"))
          .agg(sum(col("ca") * col("cb")).as("exact_join_size"))
        exact.crossJoin(est)
          .select(col("exact_join_size"), col("est_join_size"),
            round(col("est_join_size").cast("double") /
              col("exact_join_size"), 6).as("overestimate_ratio"))
      },
      oracle = Some {
        val sds = graft.operators.CmSketch.seeds(4)
        val cellCtes = sds.zipWithIndex.map { case (seed, d) =>
          val ba = OracleSql.cmsBucket("SELECT k FROM ka", "k", seed, 1024, s"xa$d")
          val bb = OracleSql.cmsBucket("SELECT k FROM kb", "k", seed, 1024, s"xb$d")
          s"""ca$d AS MATERIALIZED (
          SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM ($ba) GROUP BY bucket),
        cb$d AS MATERIALIZED (
          SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM ($bb) GROUP BY bucket),
        ip$d AS (
          SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS ip
          FROM ca$d a JOIN cb$d b USING (bucket))"""
        }.mkString(",\n        ")
        s"""
        WITH ka AS MATERIALIZED (
          SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem),
        kb AS MATERIALIZED (
          SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem
          WHERE l_orderkey % 3 = 0),
        $cellCtes,
        est AS (
          SELECT LEAST(ip0.ip, ip1.ip, ip2.ip, ip3.ip) AS est_join_size
          FROM ip0, ip1, ip2, ip3),
        exact AS (
          SELECT CAST(SUM(a.ca * b.cb) AS BIGINT) AS exact_join_size
          FROM (SELECT k, CAST(COUNT(*) AS BIGINT) AS ca FROM ka GROUP BY k) a
          JOIN (SELECT k, CAST(COUNT(*) AS BIGINT) AS cb FROM kb GROUP BY k) b
            USING (k))
        SELECT exact.exact_join_size, est.est_join_size,
               ROUND(CAST(est.est_join_size AS DOUBLE)
                 / exact.exact_join_size, 6) AS overestimate_ratio
        FROM exact, est"""
      }),

    "q4l_cms_frequency" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_partkey").cast("long").as("k"))
        val sk = graft.operators.CmSketch.sketch(li, "k", depth = 4, width = 1024)
        val est = graft.operators.CmSketch.estimates(sk, 1L to 50L, depth = 4, width = 1024)
        val actual = li.filter(col("k").between(1, 50))
          .groupBy("k").agg(count(lit(1)).as("actual"))
        est.join(actual, Seq("k"), "left")
          .select(col("k"), col("est"),
            coalesce(col("actual"), lit(0L)).as("actual"))
          .orderBy(col("k"))
      },
      oracle = Some {
        val sds = graft.operators.CmSketch.seeds(4)
        val sketchCtes = sds.zipWithIndex.map { case (seed, d) =>
          val b = OracleSql.cmsBucket("SELECT k FROM keys", "k", seed, 1024, s"s$d")
          s"""b$d AS MATERIALIZED ($b),
        sk$d AS MATERIALIZED (
          SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b$d GROUP BY bucket)"""
        }.mkString(",\n        ")
        val probeCtes = sds.zipWithIndex.map { case (seed, d) =>
          val b = OracleSql.cmsBucket("SELECT k FROM probes", "k", seed, 1024, s"p$d")
          s"""pb$d AS ($b),
        e$d AS (
          SELECT p.k, COALESCE(s.cnt, CAST(0 AS BIGINT)) AS c
          FROM pb$d p LEFT JOIN sk$d s USING (bucket))"""
        }.mkString(",\n        ")
        s"""
        WITH keys AS MATERIALIZED (
          SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem),
        probes AS MATERIALIZED (
          SELECT CAST(range AS BIGINT) AS k FROM range(1, 51)),
        $sketchCtes,
        $probeCtes,
        est AS (
          SELECT e0.k, LEAST(e0.c, e1.c, e2.c, e3.c) AS est
          FROM e0 JOIN e1 USING (k) JOIN e2 USING (k) JOIN e3 USING (k)),
        actual AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS actual
          FROM keys WHERE k BETWEEN 1 AND 50 GROUP BY k)
        SELECT est.k, est.est, COALESCE(a.actual, CAST(0 AS BIGINT)) AS actual
        FROM est LEFT JOIN actual a ON a.k = est.k ORDER BY est.k"""
      }),

    // HyperLogLog distinct count of lineitem part keys (from-scratch HLL,
    // p=10): registers, the exact scaled-integer Z, the empty-register
    // count and the corrected estimate all replay in DuckDB — buckets via
    // the staged splitmix64 chain, rho as a binary-string length, Z as a
    // HUGEINT/DECIMAL(38,0) dyadic sum, the estimate literal-for-literal
    // (small-range ln branch active at sf0.001/0.01, raw branch at sf0.1).
    "q4m_hll_distinct" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_partkey").cast("long").as("k"))
        val est = graft.operators.HllSketch.estimate(
          graft.operators.HllSketch.registers(li, "k"))
        val actual = li.agg(count_distinct(col("k")).as("actual_distinct"))
        est.crossJoin(actual)
      },
      oracle = Some {
        val seedLit =
          s"CAST(${java.lang.Long.toUnsignedString(graft.operators.HllSketch.Seed)} AS HUGEINT)"
        val inner = s"SELECT k, ${OracleSql.xor64("CAST(k AS HUGEINT)", seedLit)} AS hx FROM keys"
        val (mixed, h) = OracleSql.mix64Nested(inner, "hx", "hh", keep = "k")
        val alpha = "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
          "CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE))) * " +
          "CAST(1024.0 AS DOUBLE) * CAST(1024.0 AS DOUBLE)"
        val raw = s"$alpha * CAST(36028797018963968 AS DOUBLE) / CAST(zs AS DOUBLE)"
        s"""
        WITH keys AS MATERIALIZED (
          SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem),
        hx AS ($mixed),
        br AS (
          SELECT CAST(($h) % 1024 AS INT) AS bucket,
                 CASE WHEN (($h) // 1024) = 0 THEN 55
                      ELSE 55 - LENGTH(format('{:b}', CAST(($h) // 1024 AS BIGINT)))
                 END AS rho
          FROM hx),
        regs AS MATERIALIZED (
          SELECT bucket, MAX(rho) AS rho FROM br GROUP BY bucket),
        aggr AS (
          SELECT SUM(CAST(CAST(1 AS BIGINT) << (55 - rho) AS HUGEINT)) AS zn,
                 COUNT(*) AS ne
          FROM regs),
        zv AS (
          SELECT COALESCE(zn, CAST(0 AS HUGEINT))
                   + (1024 - ne) * CAST(36028797018963968 AS HUGEINT) AS zs,
                 CAST(1024 - ne AS BIGINT) AS v
          FROM aggr),
        est AS (
          SELECT CAST(zs AS DOUBLE) AS z_scaled, v,
                 ROUND(CASE WHEN v > 0 AND $raw <= CAST(2560.0 AS DOUBLE)
                   THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / CAST(v AS DOUBLE))
                   ELSE $raw END, 6) AS est_distinct
          FROM zv)
        SELECT e.z_scaled, e.v, e.est_distinct, a.actual_distinct
        FROM est e CROSS JOIN (
          SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS actual_distinct FROM keys) a"""
      }),

    // HLL set algebra: |A|, |B|, |A∪B| from three sketches (the union via
    // the max-merge property q4m's spec proves) and |A∩B| by
    // inclusion-exclusion — union/intersection cardinality over two key
    // sets without a join between them. Keys are unique per line
    // (orderkey·8 + linenumber), split by supplier parity: A ≈ 1/2 of
    // keys, B ≈ 1/3, A∩B ≈ 1/6 — the textbook overlap shape, with exact
    // counts alongside.
    "q4n_hll_set_algebra" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          (col("l_orderkey").cast("long") * 8 +
            col("l_linenumber").cast("long")).as("k"),
          col("l_suppkey").cast("long").as("sk"))
        val a = li.filter(col("sk") % 2 === 0).select("k")
        val b = li.filter(col("sk") % 3 === 0).select("k")
        val ra = graft.operators.HllSketch.registers(a, "k")
        val rb = graft.operators.HllSketch.registers(b, "k")
        val ru = ra.unionByName(rb)
          .groupBy("bucket").agg(max(col("rho")).as("rho"))
        def e(r: org.apache.spark.sql.DataFrame, as: String) =
          graft.operators.HllSketch.estimate(r).select(col("est_distinct").as(as))
        val flags = li.groupBy("k").agg(
          max(when(col("sk") % 2 === 0, 1).otherwise(0)).as("fa"),
          max(when(col("sk") % 3 === 0, 1).otherwise(0)).as("fb"))
        val exact = flags.agg(
          sum(col("fa")).cast("long").as("actual_a"),
          sum(col("fb")).cast("long").as("actual_b"),
          sum(col("fa") * col("fb")).cast("long").as("actual_inter"))
        e(ra, "est_a").crossJoin(e(rb, "est_b")).crossJoin(e(ru, "est_union"))
          .select(col("est_a"), col("est_b"), col("est_union"),
            round(col("est_a") + col("est_b") - col("est_union"), 6)
              .as("est_inter"))
          .crossJoin(exact)
      },
      oracle = Some {
        val seed = graft.operators.HllSketch.Seed
        s"""
        WITH li2 AS MATERIALIZED (
          SELECT CAST(l_orderkey AS BIGINT) * 8 + CAST(l_linenumber AS BIGINT) AS k,
                 CAST(l_suppkey AS BIGINT) AS sk
          FROM lineitem),
        ka AS MATERIALIZED (SELECT k FROM li2 WHERE sk % 2 = 0),
        kb AS MATERIALIZED (SELECT k FROM li2 WHERE sk % 3 = 0),
        ku AS MATERIALIZED (SELECT k FROM li2 WHERE sk % 2 = 0 OR sk % 3 = 0),
        ${OracleSql.hllEstimate("ka", "a", seed)},
        ${OracleSql.hllEstimate("kb", "b", seed)},
        ${OracleSql.hllEstimate("ku", "u", seed)},
        flags AS (
          SELECT k, MAX(CASE WHEN sk % 2 = 0 THEN 1 ELSE 0 END) AS fa,
                 MAX(CASE WHEN sk % 3 = 0 THEN 1 ELSE 0 END) AS fb
          FROM li2 GROUP BY k),
        ex AS (
          SELECT CAST(SUM(fa) AS BIGINT) AS actual_a,
                 CAST(SUM(fb) AS BIGINT) AS actual_b,
                 CAST(SUM(fa * fb) AS BIGINT) AS actual_inter
          FROM flags)
        SELECT ea.est AS est_a, eb.est AS est_b, eu.est AS est_union,
               ROUND(ea.est + eb.est - eu.est, 6) AS est_inter,
               ex.actual_a, ex.actual_b, ex.actual_inter
        FROM est_a ea CROSS JOIN est_b eb CROSS JOIN est_u eu CROSS JOIN ex"""
      }),

    // Exact heavy hitters through the CMS pre-filter: part keys appearing
    // ≥ 45 times. The sketch's upward bias guarantees no false negatives,
    // so the result EQUALS the plain GROUP BY ... HAVING — which is the
    // whole oracle. The Spark side only exact-counts the candidate slice.
    "q4o_heavy_hitters" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_partkey").cast("long").as("k"))
        graft.operators.CmSketch.heavyHitters(li, "k", threshold = 45L)
          .orderBy(col("k"))
      },
      oracle = Some("""
        SELECT CAST(l_partkey AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY k HAVING COUNT(*) >= 45 ORDER BY k""")),

    // Weighted PageRank over the q4b graph with LINK MULTIPLICITY as the
    // edge weight (each raw (custkey,orderkey) pair contributes w = 1.0;
    // duplicates collapse by summing, so repeated links pull more rank).
    // Same unrolled-CTE recipe as q4b; contributions flow as
    // pr·(w/wsum) with weight sums through DECIMAL(28,12).
    "q4p_weighted_pagerank" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
          .withColumn("w", lit(1.0))
        graft.operators.GraphOps.weightedPageRank(edges, iterations = 3, damping = 0.85)
          .select(col("node"), round(col("pr"), 6).as("pagerank"))
          .orderBy(col("node"))
      },
      oracle = Some {
        def d(i: Int, prev: String) = s"""
        d$i AS MATERIALIZED (
          SELECT COALESCE(CAST(SUM(CAST(p.pr AS DECIMAL(28,12))) AS DOUBLE),
                          CAST(0 AS DOUBLE)) AS dm
          FROM $prev p LEFT JOIN wdeg o ON o.src = p.node WHERE o.src IS NULL)"""
        def c(i: Int, prev: String) = s"""
        c$i AS MATERIALIZED (
          SELECT e.dst,
                 SUM(CAST(p.pr * (e.w / o.wsum) AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN $prev p ON p.node = e.src JOIN wdeg o ON o.src = e.src
          GROUP BY e.dst)"""
        def pr(i: Int) = s"""
        pr$i AS MATERIALIZED (
          SELECT n.node,
                 ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn.n FROM nn)
                   + CAST(0.85 AS DOUBLE) *
                     (COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE))
                      + (SELECT dm FROM d$i) / (SELECT nn.n FROM nn)), 9) AS pr
          FROM nodes n LEFT JOIN c$i c ON c.dst = n.node)"""
        s"""
        WITH raw AS (
          SELECT CAST(o_custkey % 80 AS BIGINT) AS src,
                 CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders
          WHERE o_custkey % 80 <> o_orderkey % 97),
        edges AS MATERIALIZED (
          SELECT src, dst,
                 CAST(SUM(CAST(1.0 AS DECIMAL(28,12))) AS DOUBLE) AS w
          FROM raw GROUP BY src, dst),
        nodes AS MATERIALIZED (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        wdeg AS MATERIALIZED (
          SELECT src, CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS wsum
          FROM edges GROUP BY src),
        pr0 AS MATERIALIZED (
          SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes),
        ${d(1, "pr0")},
        ${c(1, "pr0")},
        ${pr(1)},
        ${d(2, "pr1")},
        ${c(2, "pr1")},
        ${pr(2)},
        ${d(3, "pr2")},
        ${c(3, "pr2")},
        ${pr(3)}
        SELECT node, ROUND(pr, 6) AS pagerank FROM pr3 ORDER BY node"""
      }),

    // Deterministic random walks (3 hops) over the q4k %400 graph: each
    // hop takes the out-neighbor with the maximal md5 draw over
    // (walker, step, neighbor); walkers at dangling nodes stop (NULL
    // tail). Reproducible walk corpus for embedding training; DuckDB
    // replays the draws via the proven CAST('0x'||md5-prefix) idiom and
    // the same ROW_NUMBER argmax.
    "q4q_deterministic_walks" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 400).cast("long").as("src"),
          (col("o_orderkey") % 400).cast("long").as("dst"))
        graft.operators.GraphOps.deterministicWalks(edges, steps = 3)
          .orderBy(col("walker"))
      },
      oracle = Some {
        def step(i: Int, prev: String) = s"""
        cand$i AS (
          SELECT w.walker, e.dst AS nxt,
                 CAST('0x' || SUBSTRING(md5(CAST(w.walker AS VARCHAR) || '|' ||
                   '$i' || '|' || CAST(e.dst AS VARCHAR)), 1, 15) AS BIGINT) AS draw
          FROM $prev w JOIN edges e ON e.src = w.cur),
        step$i AS (
          SELECT walker, nxt FROM (
            SELECT walker, nxt,
                   ROW_NUMBER() OVER (PARTITION BY walker
                     ORDER BY draw DESC, nxt) AS rn
            FROM cand$i) t
          WHERE rn = 1),
        w$i AS MATERIALIZED (
          SELECT p.*, s.nxt AS s$i, s.nxt AS cur$i
          FROM $prev p LEFT JOIN step$i s USING (walker))"""
        s"""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 400 AS BIGINT) AS src,
                          CAST(o_orderkey % 400 AS BIGINT) AS dst
          FROM orders
          WHERE o_custkey % 400 <> o_orderkey % 400),
        w0 AS MATERIALIZED (
          SELECT node AS walker, node AS cur
          FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
        ${step(1, "w0")},
        w1c AS (SELECT walker, s1, cur1 AS cur FROM w1),
        ${step(2, "w1c")},
        w2c AS (SELECT walker, s1, s2, cur2 AS cur FROM w2),
        ${step(3, "w2c")}
        SELECT walker, s1, s2, s3 FROM w3 ORDER BY walker"""
      }),

    // Grouped HLL: distinct customers PER NATION — the auditable
    // approx_count_distinct GROUP BY. Same register/Z/estimate replay as
    // q4m, carried through a group column; exact per-nation counts
    // alongside (small-range branch active in every group at these SFs).
    "q4r_hll_grouped" -> Q(
      fn = (s, dir) => {
        val c = t(s, dir, "customer").select(
          col("c_nationkey").cast("long").as("g"),
          col("c_custkey").cast("long").as("k"))
        val est = graft.operators.HllSketch.groupedEstimate(
          graft.operators.HllSketch.groupedRegisters(c, "g", "k"))
        val actual = c.groupBy("g").agg(count_distinct(col("k")).as("actual_distinct"))
        est.join(actual, Seq("g"), "inner")
          .select(col("g").as("nation"), col("est_distinct"), col("actual_distinct"))
          .orderBy(col("nation"))
      },
      oracle = Some {
        val seedLit =
          s"CAST(${java.lang.Long.toUnsignedString(graft.operators.HllSketch.Seed)} AS HUGEINT)"
        val inner = s"SELECT g, k, ${OracleSql.xor64("CAST(k AS HUGEINT)", seedLit)} AS hx FROM keys"
        val (mixed, h) = OracleSql.mix64Nested(inner, "hx", "hh", keep = "g, k")
        val alpha = "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
          "CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE))) * " +
          "CAST(1024.0 AS DOUBLE) * CAST(1024.0 AS DOUBLE)"
        val raw = s"$alpha * CAST(36028797018963968 AS DOUBLE) / CAST(zs AS DOUBLE)"
        s"""
        WITH keys AS MATERIALIZED (
          SELECT CAST(c_nationkey AS BIGINT) AS g, CAST(c_custkey AS BIGINT) AS k
          FROM customer),
        br AS (
          SELECT g, CAST(($h) % 1024 AS INT) AS bucket,
                 CASE WHEN (($h) // 1024) = 0 THEN 55
                      ELSE 55 - LENGTH(format('{:b}', CAST(($h) // 1024 AS BIGINT)))
                 END AS rho
          FROM ($mixed)),
        regs AS MATERIALIZED (
          SELECT g, bucket, MAX(rho) AS rho FROM br GROUP BY g, bucket),
        zv AS (
          SELECT g,
                 COALESCE(SUM(CAST(CAST(1 AS BIGINT) << (55 - rho) AS HUGEINT)),
                   CAST(0 AS HUGEINT))
                   + (1024 - COUNT(*)) * CAST(36028797018963968 AS HUGEINT) AS zs,
                 CAST(1024 - COUNT(*) AS BIGINT) AS v
          FROM regs GROUP BY g),
        est AS (
          SELECT g,
                 ROUND(CASE WHEN v > 0 AND $raw <= CAST(2560.0 AS DOUBLE)
                   THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / CAST(v AS DOUBLE))
                   ELSE $raw END, 6) AS est_distinct
          FROM zv),
        actual AS (
          SELECT g, CAST(COUNT(DISTINCT k) AS BIGINT) AS actual_distinct
          FROM keys GROUP BY g)
        SELECT e.g AS nation, e.est_distinct, a.actual_distinct
        FROM est e JOIN actual a ON a.g = e.g ORDER BY nation"""
      }),

    // Sketch-over-graph composition: the undirected degree DISTRIBUTION of
    // the q4j block graph through the fixed-grid histogram sketch (the
    // heavy-tail profile a crawl-health dashboard reads) plus its p50/p99
    // — same [0,64)x32 grid in both engines, width 2.0 exact. (The q4j
    // graph, not q4b's: block degrees spread across bins where the dense
    // 80x97 graph clamps everything into the top bin.)
    "q4v_degree_histogram" -> Q(
      fn = (s, dir) => {
        val c = (col("o_custkey") % 1200).cast("long")
        val edges = t(s, dir, "orders").select(
          c.as("src"),
          (c - (c % 40) + (col("o_orderkey") % 40).cast("long")).as("dst"))
        // degrees of the canonical undirected view = the 1-core degrees
        val degrees = graft.operators.GraphOps.kCore(edges, k = 1, maxRounds = 1)
          .withColumn("g", lit("graph"))
        val hist = graft.operators.HistogramSketch
          .histogram(degrees, "g", col("degree"), bins = 32, lo = 0L, hi = 64L)
        val qs = graft.operators.HistogramSketch
          .quantiles(hist, Seq(500, 990), bins = 32, lo = 0L, hi = 64L)
          .select(lit(-1L).as("bin"), (col("qpm") * -1).as("n"),
            col("est"))
        hist.select(col("bin"), col("n"), lit(null).cast("double").as("est"))
          .unionByName(qs)
          .orderBy(col("bin"), col("n"))
      },
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 1200 AS BIGINT) AS c,
                 CAST(o_orderkey % 40 AS BIGINT) AS o
          FROM orders),
        e0 AS (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM (SELECT c AS src, c - (c % 40) + o AS dst FROM raw)
          WHERE src <> dst),
        deg AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
          GROUP BY node),
        h AS MATERIALIZED (
          SELECT LEAST(LEAST(GREATEST(degree, 0), 64) * 32 // 64, 31) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM deg GROUP BY 1),
        c AS (
          SELECT bin, n,
                 SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(n) OVER () AS total
          FROM h),
        q AS (
          SELECT qs.qpm, MIN(c.bin) AS qbin
          FROM c CROSS JOIN (VALUES (500), (990)) qs(qpm)
          WHERE c.cum >= (c.total * qs.qpm + 999) // 1000
          GROUP BY qs.qpm)
        SELECT bin, n, CAST(NULL AS DOUBLE) AS est FROM h
        UNION ALL
        SELECT CAST(-1 AS BIGINT) AS bin, CAST(-qpm AS BIGINT) AS n,
               CAST(qbin * 2.0 AS DOUBLE) AS est
        FROM q
        ORDER BY bin, n""")),

    // Bloom-filter membership (the cross-snapshot dedup pre-filter): build
    // the bit image over 'F'-status orderkeys, probe EVERY distinct
    // orderkey, and tally the verdict classes. The no-false-negative
    // guarantee is IN the data (fn_violations must be 0); false positives
    // appear at the m/k-controlled rate. Bits ride the same splitmix64
    // chains as the CMS buckets, so DuckDB replays image and verdicts
    // bit-for-bit.
    "q4x_bloom_membership" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        val members = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey").cast("long").as("k")).distinct()
        val probes = o.select(col("o_orderkey").cast("long").as("k")).distinct()
        val image = graft.operators.BloomFilter.bits(members, "k", k = 4, m = 131072)
        val verdicts = graft.operators.BloomFilter
          .mightContain(probes, "k", image, k = 4, m = 131072)
        val flagged = verdicts.join(
          members.withColumn("is_member", lit(1)), Seq("k"), "left")
          .withColumn("is_member", coalesce(col("is_member"), lit(0)))
        flagged.agg(
          count(lit(1)).as("n_probes"),
          sum(col("is_member")).cast("bigint").as("n_members"),
          sum(col("might_contain")).cast("bigint").as("n_maybe"),
          sum(when(col("might_contain") === 1 && col("is_member") === 0, 1)
            .otherwise(0)).cast("bigint").as("n_false_pos"),
          sum(when(col("might_contain") === 0 && col("is_member") === 1, 1)
            .otherwise(0)).cast("bigint").as("fn_violations"))
      },
      oracle = Some {
        val sds = graft.operators.CmSketch.seeds(4)
        val bitCtes = sds.zipWithIndex.map { case (seed, d) =>
          val b = OracleSql.cmsBucket("SELECT k FROM members", "k", seed, 131072, s"m$d")
          s"mb$d AS ($b)"
        }.mkString(",\n        ")
        val probeCtes = sds.zipWithIndex.map { case (seed, d) =>
          val b = OracleSql.cmsBucket("SELECT k FROM probes", "k", seed, 131072, s"p$d")
          s"pb$d AS ($b)"
        }.mkString(",\n        ")
        s"""
        WITH members AS MATERIALIZED (
          SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k FROM orders
          WHERE o_orderstatus = 'F'),
        probes AS MATERIALIZED (
          SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k FROM orders),
        $bitCtes,
        image AS MATERIALIZED (
          SELECT DISTINCT bucket AS bit FROM (
            SELECT bucket FROM mb0 UNION ALL SELECT bucket FROM mb1
            UNION ALL SELECT bucket FROM mb2 UNION ALL SELECT bucket FROM mb3)),
        $probeCtes,
        positions AS MATERIALIZED (
          SELECT DISTINCT k, bucket AS bit FROM (
            SELECT k, bucket FROM pb0 UNION ALL SELECT k, bucket FROM pb1
            UNION ALL SELECT k, bucket FROM pb2 UNION ALL SELECT k, bucket FROM pb3)),
        verdicts AS (
          SELECT p.k,
                 CAST(COUNT(*) AS BIGINT) AS n_positions,
                 CAST(SUM(CASE WHEN i.bit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          FROM positions p LEFT JOIN image i ON i.bit = p.bit
          GROUP BY p.k),
        flagged AS (
          SELECT v.k,
                 CASE WHEN v.n_hit = v.n_positions THEN 1 ELSE 0 END AS might_contain,
                 CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS is_member
          FROM verdicts v LEFT JOIN members m ON m.k = v.k)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
               CAST(SUM(is_member) AS BIGINT) AS n_members,
               CAST(SUM(might_contain) AS BIGINT) AS n_maybe,
               CAST(SUM(CASE WHEN might_contain = 1 AND is_member = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN might_contain = 0 AND is_member = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn_violations
        FROM flagged"""
      }),

    // F4: tenant predicate (partition-prunable filter in every query).
    "q18_tenant_slice" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .filter(col("user_id") === 7)
          .select(col("event_id"), tsMs(col("ts")).as("ts_ms"), col("event_type"), col("value"))
          .orderBy(col("ts_ms"), col("event_id")),
      oracle = Some("""
        SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, value
        FROM events WHERE user_id = 7 ORDER BY ts_ms, event_id""")),

    // Per-column data-quality profile (the Deequ-style data card a pipeline
    // runs before trusting a new corpus snapshot), hash-exact: row/null/
    // exact-distinct counts + min/max per column in ONE aggregation pass.
    // Numeric extremes travel as the stored DOUBLE values (no formatting —
    // float→string rendering is not cross-engine replayable, the q36
    // lesson); string extremes as UTF-8/binary-collation min/max.
    "q5f_table_profile" -> Q(
      fn = (s, dir) =>
        graft.operators.Profile.tableProfile(
          t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_quantity", "l_extendedprice",
            "l_returnflag", "l_linestatus"))
          .orderBy(col("column")),
      oracle = Some {
        def num(c: String) = s"""
          SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                 CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
                 CAST(MIN($c) AS DOUBLE) AS min_num,
                 CAST(MAX($c) AS DOUBLE) AS max_num,
                 CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
          FROM lineitem"""
        def str(c: String) = s"""
          SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                 CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
                 CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
                 MIN($c) AS min_str, MAX($c) AS max_str
          FROM lineitem"""
        Seq(num("l_orderkey"), num("l_quantity"), num("l_extendedprice"),
          str("l_returnflag"), str("l_linestatus"))
          .mkString("", "\nUNION ALL", "\nORDER BY \"column\"")
      }),

    // Association rules over order baskets (parts bought together):
    // support / confidence / lift per co-occurring part pair, top-100 by
    // lift. Divisions and the lift product run in DOUBLE on both engines
    // (parity per q3y/q38), snapped to 6 decimals like the cosine scores;
    // counts land as BIGINT. The Spark side never does all-pairs — the
    // basket-keyed self-join bounds fan-out by basket size.
    "q5k_basket_rules" -> Q(
      fn = (s, dir) =>
        graft.operators.AssocRules.pairStats(
            t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
            minPairCount = 2L)
          .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
            col("n_b"), col("n_baskets"),
            round(col("support"), 6).as("support"),
            round(col("conf_a_b"), 6).as("conf_a_b"),
            round(col("conf_b_a"), 6).as("conf_b_a"),
            round(col("lift"), 6).as("lift"))
          .orderBy(col("lift").desc, col("item_a"), col("item_b"))
          .limit(100),
      oracle = Some("""
        WITH bi AS (
          SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
          FROM lineitem),
        nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM bi),
        ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
        pr AS (
          SELECT a.item AS item_a, b.item AS item_b,
                 CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
          GROUP BY 1, 2),
        j AS (
          SELECT p.item_a, p.item_b, p.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
                 nb.n AS n_baskets
          FROM pr p JOIN ic ia ON p.item_a = ia.item
                    JOIN ic ib ON p.item_b = ib.item, nb
          WHERE p.n_ab >= 2)
        SELECT item_a, item_b, n_ab, n_a, n_b, n_baskets,
               ROUND(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support,
               ROUND(CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS conf_a_b,
               ROUND(CAST(n_ab AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS conf_b_a,
               ROUND(CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE) /
                     (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS lift
        FROM j
        ORDER BY lift DESC, item_a, item_b LIMIT 100""")),

    // Wide→long reshaping via Spark's native unpivot (melt) operator —
    // the §2.11 relational surface's inverse of q52's pivot. Values are
    // raw parquet numerics cast to a common DOUBLE (no arithmetic, so no
    // float contract to negotiate); the oracle is the UNION ALL that
    // unpivot is defined as.
    "q5o_unpivot_charges" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("double").as("quantity"),
            col("l_extendedprice").cast("double").as("extendedprice"),
            col("l_discount").cast("double").as("discount"),
            col("l_tax").cast("double").as("tax"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("quantity"), col("extendedprice"),
              col("discount"), col("tax")),
            "metric", "amount")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
      oracle = Some("""
        WITH li AS (SELECT * FROM lineitem WHERE l_orderkey < 100)
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
               CAST(l_quantity AS DOUBLE) AS amount FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               CAST(l_discount AS DOUBLE) FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax',
               CAST(l_tax AS DOUBLE) FROM li
        ORDER BY l_orderkey, l_linenumber, metric""")),

    // Snapshot diff (CDC primitive): two deterministic versions of the
    // orders table — rows keyed out by modulo simulate deletes/inserts, a
    // rewritten priority simulates updates — diffed into
    // added/removed/changed rows with per-column change attribution. One
    // full-outer shuffle join; all comparisons codegen null-safe equality.
    "q5p_snapshot_diff" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_orderpriority"))
        val base = o.filter(col("o_orderkey") % 11 =!= 0)
        val next = o.filter(col("o_orderkey") % 13 =!= 0)
          .withColumn("o_orderpriority",
            when(col("o_orderkey") % 7 === 0, lit("9-SYNTH"))
              .otherwise(col("o_orderpriority")))
        graft.operators.TableDiff.diff(base, next,
            keys = Seq("o_orderkey"),
            compareCols = Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
          FROM orders),
        base AS (SELECT * FROM o WHERE o_orderkey % 11 <> 0),
        nxt AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 0 THEN '9-SYNTH'
                      ELSE o_orderpriority END AS o_orderpriority
          FROM o WHERE o_orderkey % 13 <> 0)
        SELECT COALESCE(b.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change,
               CASE WHEN b.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
                    ELSE concat_ws(',',
                      CASE WHEN b.o_custkey IS DISTINCT FROM n.o_custkey
                           THEN 'o_custkey' END,
                      CASE WHEN b.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                           THEN 'o_orderpriority' END,
                      CASE WHEN b.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                           THEN 'o_orderstatus' END)
               END AS changed_columns
        FROM base b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey
        WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR b.o_custkey IS DISTINCT FROM n.o_custkey
           OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus
           OR b.o_orderpriority IS DISTINCT FROM n.o_orderpriority
        ORDER BY o_orderkey"""),
      headline = true),

    // CDC merge (batch MERGE INTO): a base snapshot plus two deterministic
    // versioned changesets (v1 rewrites even keys, v2 rewrites %4 keys and
    // tombstones %10 keys) folded latest-wins. Union + one row_number
    // window (WindowGroupLimit pushes the rank-1 filter map-side).
    "q5r_merge_upsert" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        val base = o.filter(col("o_orderkey") % 3 =!= 0)
        val c1 = o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_orderstatus", lit("U1"))
          .withColumn("version", lit(1L))
          .withColumn("op", lit("upsert"))
        val c2 = o.filter(col("o_orderkey") % 4 === 0)
          .withColumn("o_orderstatus", lit("U2"))
          .withColumn("version", lit(2L))
          .withColumn("op",
            when(col("o_orderkey") % 10 === 0, lit("delete"))
              .otherwise(lit("upsert")))
        graft.operators.Merge.applyChanges(base, c1.unionByName(c2),
            keys = Seq("o_orderkey"), versionCol = "version", opCol = "op")
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
        u AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CAST(-1 AS BIGINT) AS version, 'upsert' AS op
          FROM o WHERE o_orderkey % 3 <> 0
          UNION ALL
          SELECT o_orderkey, o_custkey, 'U1', 1, 'upsert'
          FROM o WHERE o_orderkey % 2 = 0
          UNION ALL
          SELECT o_orderkey, o_custkey, 'U2', 2,
                 CASE WHEN o_orderkey % 10 = 0 THEN 'delete' ELSE 'upsert' END
          FROM o WHERE o_orderkey % 4 = 0),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                   ORDER BY version DESC, op ASC) AS rn
          FROM u)
        SELECT o_orderkey, o_custkey, o_orderstatus FROM r
        WHERE rn = 1 AND op = 'upsert' ORDER BY o_orderkey""")),

    // Classifier-score calibration: reliability table + expected
    // calibration error over a deterministic score (l_discount rescaled
    // to [0,1]) against a deterministic label (returnflag = 'R'). Per-bin
    // means are DECIMAL-sum / BIGINT-count in DOUBLE snapped to 6
    // decimals; the ECE weighted sum multiplies the 6-decimal gap as
    // DECIMAL(18,6) by the bin count exactly, so it is order-free.
    "q5s_calibration" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .withColumn("score", col("l_discount").cast("double") * 10.0)
          .withColumn("is_r", col("l_returnflag") === "R")
        graft.operators.Calibration.reliabilityTable(li, "score", "is_r", 10)
          .orderBy(col("bin"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT CAST(LEAST(CAST(FLOOR(CAST(l_discount AS DOUBLE) * 10.0 * 10) AS INT), 9) AS INT) AS bin,
                 CAST(l_discount AS DOUBLE) * 10.0 AS score,
                 (l_returnflag = 'R') AS is_r
          FROM lineitem
          WHERE l_discount IS NOT NULL
            AND CAST(l_discount AS DOUBLE) * 10.0 BETWEEN 0.0 AND 1.0),
        a AS (
          SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(score AS DECIMAL(28,12))) AS ssum,
                 CAST(SUM(CASE WHEN is_r THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
          FROM b GROUP BY bin),
        r AS (
          SELECT bin, n, n_pos,
                 ROUND(CAST(ssum AS DOUBLE) / n, 6) AS conf,
                 ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS acc
          FROM a),
        g AS (
          SELECT *, ROUND(ABS(acc - conf), 6) AS gap FROM r)
        SELECT bin, n, n_pos, conf, acc, gap,
               ROUND(CAST(SUM(CAST(gap AS DECIMAL(18,6)) * n) OVER () AS DOUBLE)
                     / SUM(n) OVER (), 6) AS ece
        FROM g ORDER BY bin""")),

    // Jaro–Winkler entity matching over the distinct part-name vocabulary
    // — the phonetic/typo tier where edit distance is too rigid. The
    // canonical-order arithmetic is bit-identical to DuckDB's
    // jaro_winkler_similarity (FuzzyJoin scaladoc), so raw-score
    // threshold and 6-decimal emission both hash-match.
    "q5y_jw_pairs" -> Q(
      fn = (s, dir) =>
        graft.operators.FuzzyJoin.jaroWinklerPairs(
            t(s, dir, "part"), "p_name", minSim = 0.85)
          .orderBy(col("sim").desc, col("str_a"), col("str_b")),
      oracle = Some("""
        WITH d AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        SELECT a.p_name AS str_a, b.p_name AS str_b,
               ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
        FROM d a JOIN d b ON a.p_name < b.p_name
        WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
        ORDER BY sim DESC, str_a, str_b""")),

    // End-to-end entity resolution (q5y composed with q37's machinery):
    // Jaro–Winkler similarity pairs fed into transitive connected
    // components — each name labeled with its cluster's min member. The
    // oracle replays CC as the recursive reachability CTE.
    "q6f_entity_clusters" -> Q(
      fn = (s, dir) => {
        val pairs = graft.operators.FuzzyJoin.jaroWinklerPairs(
            t(s, dir, "part"), "p_name", minSim = 0.85)
          .select(col("str_a").as("doc_a"), col("str_b").as("doc_b"))
        graft.operators.Dedup.connectedComponents(pairs)
          .select(col("doc_id").as("name"),
            col("component_id").as("cluster"))
          .orderBy(col("name"))
      },
      oracle = Some("""
        WITH RECURSIVE d AS (
          SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
        p AS (
          SELECT a.p_name AS a, b.p_name AS b
          FROM d a JOIN d b ON a.p_name < b.p_name
          WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85),
        edges AS (
          SELECT a AS src, b AS dst FROM p
          UNION SELECT b, a FROM p),
        reach(node, comp) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS name, MIN(comp) AS cluster
        FROM reach GROUP BY node ORDER BY name""")),

    // Binary-classifier evaluation (q5s's score/label pair): confusion
    // counts at threshold 0.5, precision/recall/F1/accuracy as single
    // integer divisions, and EXACT ROC AUC via the tie-aware Mann–Whitney
    // rank-sum — the numerator 2·p·cumNeg + p·n is all-integer per
    // distinct score, so the only float op is one final division.
    "q5z_classifier_eval" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .withColumn("score", col("l_discount").cast("double") * 10.0)
          .withColumn("is_r", col("l_returnflag") === "R")
        graft.operators.Calibration.binaryMetrics(li, "score", "is_r", 0.5)
      },
      oracle = Some("""
        WITH b AS (
          SELECT CAST(l_discount AS DOUBLE) * 10.0 AS s,
                 (l_returnflag = 'R') AS y
          FROM lineitem
          WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
        conf AS (
          SELECT CAST(SUM(CASE WHEN y AND s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                 CAST(SUM(CASE WHEN NOT y AND s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                 CAST(SUM(CASE WHEN NOT y AND s < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                 CAST(SUM(CASE WHEN y AND s < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn
          FROM b),
        bs AS (
          SELECT s, CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
                 CAST(SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n
          FROM b GROUP BY s),
        cn AS (
          SELECT *, COALESCE(CAST(SUM(n) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS cumneg
          FROM bs),
        a AS (
          SELECT CAST(SUM(2*p*cumneg + p*n) AS BIGINT) AS num,
                 CAST(SUM(p) AS BIGINT) AS pp, CAST(SUM(n) AS BIGINT) AS nn
          FROM cn)
        SELECT conf.tp, conf.fp, conf.tn, conf.fn,
               CASE WHEN tp + fp > 0
                    THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS "precision",
               CASE WHEN tp + fn > 0
                    THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
               CASE WHEN 2*tp + fp + fn > 0
                    THEN ROUND(CAST(2*tp AS DOUBLE) / (2*tp + fp + fn), 6) END AS f1,
               CASE WHEN tp + fp + tn + fn > 0
                    THEN ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + tn + fn), 6) END AS accuracy,
               CASE WHEN pp > 0 AND nn > 0
                    THEN ROUND(CAST(num AS DOUBLE) /
                           (CAST(2 AS DOUBLE) * pp * nn), 6) END AS auc
        FROM conf, a""")),

    // Winsorized robust stats per group: p05/p95 bounds via the proven
    // percentile-interpolation parity (q45), then a clipped mean whose
    // in-range mass sums in exact DECIMAL(18,2) and whose clipped tails
    // re-enter as count×bound in double — the interpolated bounds are
    // NEVER cast to DECIMAL (a 100k-scale double at scale 12 violates
    // the 2^53 agreement bound).
    "q6c_winsorized_stats" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_extendedprice").isNotNull)
          .select(col("l_returnflag"), col("l_extendedprice").as("v"))
        val bounds = li.groupBy("l_returnflag")
          .agg(expr("percentile(v, 0.05)").as("lo"),
            expr("percentile(v, 0.95)").as("hi"))
        li.join(broadcast(bounds), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
            sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
            sum(when(col("v") >= col("lo") && col("v") <= col("hi"),
              col("v").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)"))).as("__s"),
            max(col("lo")).as("__lo"), max(col("hi")).as("__hi"))
          .select(col("l_returnflag"), col("n"), col("n_lo"), col("n_hi"),
            round(col("__lo"), 6).as("lo"),
            round(col("__hi"), 6).as("hi"),
            round((col("__s").cast("double")
              + col("n_lo").cast("double") * col("__lo")
              + col("n_hi").cast("double") * col("__hi"))
              / col("n").cast("double"), 6).as("mean_winsorized"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_returnflag, l_extendedprice AS v FROM lineitem
          WHERE l_extendedprice IS NOT NULL),
        b AS (
          SELECT l_returnflag, quantile_cont(v, 0.05) AS lo,
                 quantile_cont(v, 0.95) AS hi
          FROM li GROUP BY 1),
        j AS (SELECT li.l_returnflag, li.v, b.lo, b.hi
              FROM li JOIN b USING (l_returnflag))
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
               CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
               ROUND(MAX(lo), 6) AS lo, ROUND(MAX(hi), 6) AS hi,
               ROUND((CAST(SUM(CASE WHEN v >= lo AND v <= hi
                        THEN CAST(v AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 + CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS DOUBLE) * MAX(lo)
                 + CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS DOUBLE) * MAX(hi))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_winsorized
        FROM j GROUP BY 1 ORDER BY 1""")),

    // Higher moments from exact decimal power sums (Spark's native
    // skewness/kurtosis stream order-dependent float accumulators; these
    // are bit-reproducible on any layout). Quantities are small integers,
    // so x^4 stays inside the double-decimal agreement bound.
    "q6l_moments" -> Q(
      fn = (s, dir) =>
        graft.operators.Stats.groupedMoments(
            t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
          .orderBy(col("l_returnflag")),
      oracle = Some("""
        WITH a AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS DECIMAL(38,6))) AS s1,
                 SUM(CAST(x*x AS DECIMAL(38,6))) AS s2,
                 SUM(CAST(x*x*x AS DECIMAL(38,6))) AS s3,
                 SUM(CAST(x*x*x*x AS DECIMAL(38,6))) AS s4
          FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x
                FROM lineitem WHERE l_quantity IS NOT NULL)
          GROUP BY 1),
        m AS (
          SELECT l_returnflag, n,
                 CAST(s1 AS DOUBLE)/n AS mean,
                 CAST(s2 AS DOUBLE)/n
                   - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n) AS m2,
                 CAST(s3 AS DOUBLE)/n
                   - CAST(3 AS DOUBLE)*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
                   + CAST(2 AS DOUBLE)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n) AS m3,
                 CAST(s4 AS DOUBLE)/n
                   - CAST(4 AS DOUBLE)*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
                   + CAST(6 AS DOUBLE)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
                   - CAST(3 AS DOUBLE)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n) AS m4
          FROM a)
        SELECT l_returnflag, n, ROUND(mean, 6) AS mean,
               ROUND(m2, 6) AS variance,
               CASE WHEN m2 > 0 THEN ROUND(m3 / (m2 * sqrt(m2)), 6) END AS skewness,
               CASE WHEN m2 > 0 THEN ROUND(m4 / (m2 * m2) - CAST(3 AS DOUBLE), 6) END AS kurtosis
        FROM m ORDER BY l_returnflag""")),

    // Benford first-digit law over prices: digits derive from the EXACT
    // cents integer (no log/formatting in the digit path); expectations
    // via ln ratios (parity-proven), chi-square via 9-grid terms in
    // DECIMAL(28,9) (order-free).
    "q6n_benford" -> Q(
      fn = (s, dir) =>
        graft.operators.Stats.benfordProfile(
            t(s, dir, "lineitem"), "l_extendedprice")
          .orderBy(col("digit")),
      oracle = Some("""
        WITH b AS (
          SELECT CAST(SUBSTR(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
        c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
        e AS (SELECT digit, n, SUM(n) OVER () AS total FROM c),
        x AS (
          SELECT digit, n,
                 CAST(total AS DOUBLE) *
                   (ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)
                    / ln(CAST(10 AS DOUBLE))) AS expected
          FROM e),
        t AS (
          SELECT *, ROUND((CAST(n AS DOUBLE) - expected)
                   * (CAST(n AS DOUBLE) - expected) / expected, 9) AS term
          FROM x)
        SELECT digit, n, ROUND(expected, 6) AS expected,
               ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) OVER ()
                 AS DOUBLE), 6) AS chi2
        FROM t ORDER BY digit""")),

    // Item-item collaborative filtering: parts' top-5 "bought together"
    // neighbors by basket-membership cosine (n_ab/sqrt(n_a*n_b)) over
    // order baskets — AssocRules counts + a rank-k window that rides
    // WindowGroupLimit. sqrt/division parity proven; ranks INT both sides.
    "q7e_item_neighbors" -> Q(
      fn = (s, dir) =>
        graft.operators.AssocRules.topNeighbors(
            t(s, dir, "lineitem")
              .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
            "basket", "item", k = 5, minPairCount = 2L)
          .orderBy(col("item"), col("rank")),
      oracle = Some("""
        WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
        p AS (
          SELECT a.i AS item_a, b.i AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        pj AS (
          SELECT p.item_a, p.item_b, p.n_ab, ia.n_i AS na, ib.n_i AS nb
          FROM p JOIN ic ia ON ia.i = p.item_a JOIN ic ib ON ib.i = p.item_b),
        sym AS (
          SELECT item_a AS item, item_b AS neighbor, n_ab, na AS ni, nb AS nn FROM pj
          UNION ALL
          SELECT item_b AS item, item_a AS neighbor, n_ab, nb AS ni, na AS nn FROM pj),
        c AS (
          SELECT item, neighbor, n_ab,
                 ROUND(CAST(n_ab AS DOUBLE)
                   / SQRT(CAST(ni AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS cosine
          FROM sym),
        r AS (
          SELECT item, neighbor, n_ab, cosine,
                 CAST(ROW_NUMBER() OVER (PARTITION BY item
                   ORDER BY cosine DESC, n_ab DESC, neighbor) AS INT) AS rank
          FROM c)
        SELECT item, neighbor, n_ab, cosine, rank
        FROM r WHERE rank <= 5 ORDER BY item, rank""")),

    // Degree assortativity of the q4j block graph: Pearson correlation of
    // endpoint degrees over both edge orientations — exact integer decimal
    // sums, one final double expression (the one-number structural
    // fingerprint: hubs-to-hubs vs hubs-to-leaves).
    "q7f_assortativity" -> Q(
      fn = (s, dir) => {
        val c = (col("o_custkey") % 1200).cast("long")
        val edges = t(s, dir, "orders").select(
          c.as("src"),
          (c - (c % 40) + (col("o_orderkey") % 40).cast("long")).as("dst"))
        graft.operators.GraphOps.degreeAssortativity(edges)
      },
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 1200 AS BIGINT) AS c,
                 CAST(o_orderkey % 40 AS BIGINT) AS o
          FROM orders),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM (SELECT c AS src, c - (c % 40) + o AS dst FROM raw)
          WHERE src <> dst),
        deg AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
          GROUP BY 1),
        j AS (
          SELECT du.deg AS x, dv.deg AS y
          FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v),
        p AS (SELECT x, y FROM j UNION ALL SELECT y AS x, x AS y FROM j),
        a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                 SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(x*y AS DECIMAL(38,0))) AS sxy,
                 SUM(CAST(x*x AS DECIMAL(38,0))) AS sxx
          FROM p)
        SELECT m2, ROUND(CAST(sx AS DOUBLE) / m2, 6) AS mean_degree,
               CASE WHEN (CAST(sxx AS DOUBLE)/m2
                   - (CAST(sx AS DOUBLE)/m2)*(CAST(sx AS DOUBLE)/m2)) > 0
                 THEN ROUND((CAST(sxy AS DOUBLE)/m2
                     - (CAST(sx AS DOUBLE)/m2)*(CAST(sx AS DOUBLE)/m2))
                   / (CAST(sxx AS DOUBLE)/m2
                     - (CAST(sx AS DOUBLE)/m2)*(CAST(sx AS DOUBLE)/m2)), 6)
                   + CAST(0 AS DOUBLE) END AS assortativity
        FROM a""")),

    // Newman-Girvan modularity of the q4j LPA communities: per-community
    // internal-edge and degree mass vs the random-wiring expectation,
    // Q summed from 9-snapped per-community terms through DECIMAL(28,9) —
    // the quality gate on community detection. Oracle extends the q4j
    // unrolled-LPA CTE chain with the modularity aggregation.
    "q7g_modularity" -> Q(
      fn = (s, dir) => {
        val c = (col("o_custkey") % 1200).cast("long")
        val edges = t(s, dir, "orders").select(
          c.as("src"),
          (c - (c % 40) + (col("o_orderkey") % 40).cast("long")).as("dst"))
        val labels = graft.operators.GraphOps.labelPropagation(edges, iterations = 3)
        graft.operators.GraphOps.modularity(edges, labels)
          .orderBy(col("community"))
      },
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 1200 AS BIGINT) AS c,
                 CAST(o_orderkey % 40 AS BIGINT) AS o
          FROM orders),
        e0 AS (SELECT c AS src, c - (c % 40) + o AS dst FROM raw),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM e0 WHERE src <> dst),
        adj AS MATERIALIZED (
          SELECT u AS node, v AS nbr FROM und
          UNION ALL SELECT v AS node, u AS nbr FROM und),
        l0 AS MATERIALIZED (
          SELECT DISTINCT node, node AS label FROM adj),
        v1 AS MATERIALIZED (
          SELECT a.node, l.label, COUNT(*) AS n
          FROM adj a JOIN l0 l ON l.node = a.nbr GROUP BY a.node, l.label),
        l1 AS MATERIALIZED (
          SELECT node, MIN(label) AS label
          FROM (SELECT node, label, n, MAX(n) OVER (PARTITION BY node) AS mx
                FROM v1) t
          WHERE n = mx GROUP BY node),
        v2 AS MATERIALIZED (
          SELECT a.node, l.label, COUNT(*) AS n
          FROM adj a JOIN l1 l ON l.node = a.nbr GROUP BY a.node, l.label),
        l2 AS MATERIALIZED (
          SELECT node, MIN(label) AS label
          FROM (SELECT node, label, n, MAX(n) OVER (PARTITION BY node) AS mx
                FROM v2) t
          WHERE n = mx GROUP BY node),
        v3 AS MATERIALIZED (
          SELECT a.node, l.label, COUNT(*) AS n
          FROM adj a JOIN l2 l ON l.node = a.nbr GROUP BY a.node, l.label),
        l3 AS MATERIALIZED (
          SELECT node, MIN(label) AS label
          FROM (SELECT node, label, n, MAX(n) OVER (PARTITION BY node) AS mx
                FROM v3) t
          WHERE n = mx GROUP BY node),
        deg AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
        mm AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
        intr AS (
          SELECT lu.label AS community, CAST(COUNT(*) AS BIGINT) AS internal_edges
          FROM und JOIN l3 lu ON lu.node = und.u JOIN l3 lv ON lv.node = und.v
          WHERE lu.label = lv.label GROUP BY 1),
        pc AS (
          SELECT l3.label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(SUM(deg.deg) AS BIGINT) AS degree_sum
          FROM l3 JOIN deg USING (node) GROUP BY 1),
        tt AS (
          SELECT pc.community, pc.n_nodes, pc.degree_sum,
                 CAST(COALESCE(intr.internal_edges, 0) AS BIGINT) AS internal_edges,
                 ROUND(CAST(COALESCE(intr.internal_edges, 0) AS DOUBLE)
                     / (SELECT m FROM mm)
                   - (CAST(pc.degree_sum AS DOUBLE)
                      / (CAST(2 AS DOUBLE) * (SELECT m FROM mm)))
                     * (CAST(pc.degree_sum AS DOUBLE)
                      / (CAST(2 AS DOUBLE) * (SELECT m FROM mm))), 9)
                   + CAST(0 AS DOUBLE) AS q_term
          FROM pc LEFT JOIN intr USING (community))
        SELECT community, n_nodes, degree_sum, internal_edges, q_term,
               ROUND(CAST(SUM(CAST(q_term AS DECIMAL(28,9))) OVER ()
                 AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS modularity
        FROM tt ORDER BY community""")),

    // Lorenz curve of customer order-value concentration: decile bins
    // over per-customer totals (exact DECIMAL sums), cumulative value
    // share per bin — q6m's Gini pointwise companion (WHERE the mass
    // concentrates, not just how much).
    "q7m_lorenz_curve" -> Q(
      fn = (s, dir) => {
        val per = t(s, dir, "orders").groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
        graft.operators.Stats.lorenzCurve(per, "o_custkey", "v", k = 10)
          .orderBy(col("bin"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT o_custkey AS k,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
          FROM orders GROUP BY 1),
        b AS (
          SELECT k, v, CAST(NTILE(10) OVER (ORDER BY v, k) AS INT) AS bin
          FROM per),
        g AS (
          SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_keys, SUM(v) AS bv
          FROM b GROUP BY 1),
        c AS (
          SELECT *, SUM(bv) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(bv) OVER () AS tot
          FROM g)
        SELECT bin, n_keys, CAST(bv AS DOUBLE) AS bin_value,
               ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                 AS cum_value_share
        FROM c ORDER BY bin""")),

    // Proportional stratified sample: exactly ceil(n_g/10) orders per
    // priority stratum, chosen by the salted md5 order — integer-exact
    // targets (no float boundary), every stratum represented.
    "q7h_stratified_sample" -> Q(
      fn = (s, dir) =>
        graft.operators.DataMix.stratifiedSample(
            t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
            stratumCol = "o_orderpriority", keyCol = "o_orderkey",
            num = 1, den = 10, salt = "strat1")
          .orderBy(col("o_orderkey")),
      oracle = Some("""
        WITH tgt AS (
          SELECT o_orderpriority AS strat,
                 (COUNT(*) * 1 + 9) // 10 AS target
          FROM orders GROUP BY 1),
        r AS (
          SELECT o_orderkey, o_orderpriority,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY
                   substring(md5(CAST(o_orderkey AS VARCHAR) || 'strat1'), 1, 8),
                   o_orderkey) AS rn
          FROM orders)
        SELECT o_orderkey, o_orderpriority
        FROM r JOIN tgt ON tgt.strat = r.o_orderpriority
        WHERE r.rn <= tgt.target ORDER BY o_orderkey"""))
  )
}
