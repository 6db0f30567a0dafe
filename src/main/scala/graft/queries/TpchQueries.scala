package graft.queries

import graft.Tables
import graft.fns.Fns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core over the TPC-H-ish tables — the bench headliners.
  * These exercise the engine shapes that dominate at 100 TB: wide scans
  * with pushed filters, partial (map-side) aggregation, broadcast of small
  * dimensions, and multi-way equi-joins re-planned by AQE.
  *
  * Money arithmetic goes through DECIMAL so results are independent of
  * partition count / accumulation order (see QDef contract).
  */
object TpchQueries {

  private val d2 = DecimalType(9, 2)

  val defs: Seq[QDef] = Seq(

    // TPC-H Q1 shape: scan-heavy partial aggregation; only 7 of 11 columns
    // read (check ReadSchema), filter pushed to parquet.
    QDef("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(9,2))) * (1 + CAST(l_tax AS DECIMAL(9,2)))) AS DOUBLE) AS sum_charge,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val qty = col("l_quantity").cast(d2)
      val price = col("l_extendedprice").cast(d2)
      val discPrice = price * (lit(1) - col("l_discount").cast(d2))
      val charge = discPrice * (lit(1) + col("l_tax").cast(d2))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          round(sum(qty).cast("double") / count(lit(1)), 6).as("avg_qty"),
          round(sum(price).cast("double") / count(lit(1)), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q3 shape: selective dimension filter → broadcast customer into
    // orders, shuffle join to lineitem, top-k on the aggregate.
    QDef("q3_shipping_priority",
      """SELECT l.l_orderkey AS l_orderkey,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
        |  CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp"))
      l.join(o.join(broadcast(c), col("c_custkey") === col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast(d2) * (lit(1) - col("l_discount").cast(d2)))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // TPC-H Q5 shape: star join — three broadcast dims (region→nation,
    // supplier) + two fact-side shuffle joins; revenue per nation.
    QDef("q5_local_supplier_volume",
      """SELECT n.n_name AS n_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o   ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier sp ON l.l_suppkey = sp.s_suppkey AND c.c_nationkey = sp.s_nationkey
        |JOIN nation n   ON sp.s_nationkey = n.n_nationkey
        |JOIN region r   ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
      val sp = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("c_custkey") === col("o_custkey"))
        .join(broadcast(sp),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast(d2) * (lit(1) - col("l_discount").cast(d2)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q6 shape: fully-pushed selective scan + single decimal agg —
    // the pure scan-throughput probe (no shuffle at all beyond the final
    // single-row reduce).
    QDef("q6_forecast_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(d2) * col("l_discount").cast(d2))
          .cast("double").as("revenue"))
    },

    // TPC-H Q18 shape: HAVING on a large aggregate drives a semi join back
    // into the fact tables (A8 + J6 at fact scale).
    QDef("q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(l_quantity) > 250)
        |SELECT o.o_orderkey AS o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        |FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
        .filter(col("q") > 250)
        .select(col("l_orderkey"))
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice").cast("double").as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
    },

    // TPC-H Q4 shape (priority-bucketed EXISTS): orders in one quarter with
    // at least one lineitem shipped after the order date (the testdata has
    // no commit/receipt dates, so "late-shipped" stands in for the
    // canonical commitdate<receiptdate predicate — same semi-join + group
    // shape). Semi-join keeps the orders side lean before the aggregate.
    QDef("q4_order_priority",
      """SELECT o.o_orderpriority AS o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o.o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q10 shape: revenue lost to returned items per customer over a
    // quarter — 3-way join with the dimension sides broadcast, decimal
    // revenue, bounded top-20.
    QDef("q10_returned_items",
      """SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
        |  CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, n.n_name AS n_name
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-10-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast(d2) *
          (lit(1) - col("l_discount").cast(d2))).cast("double").as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal").cast("double").as("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // TPC-H Q2 shape (correlated-min join-back): per-part minimum supply
    // cost, then only the (part, supplier) rows hitting that minimum,
    // enriched through supplier→nation→region. The testdata has no
    // partsupp table, so the (part, supplier) catalog with its cost is
    // derived from lineitem (min extendedprice per pair) — same
    // aggregate → min-per-key → join-back → multi-dim-broadcast shape.
    QDef("q2_min_cost_supplier",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         MIN(CAST(l_extendedprice AS DECIMAL(9,2))) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |mn AS (SELECT l_partkey, MIN(cost) AS min_cost FROM ps GROUP BY l_partkey)
        |SELECT CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, s.s_name AS s_name,
        |       n.n_name AS n_name, p.p_partkey AS p_partkey,
        |       p.p_type AS p_type, CAST(ps.cost AS DOUBLE) AS cost
        |FROM part p
        |JOIN ps ON ps.l_partkey = p.p_partkey
        |JOIN mn ON mn.l_partkey = ps.l_partkey AND ps.cost = mn.min_cost
        |JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE p.p_type = 'SMALL' AND p.p_size < 10 AND r.r_name = 'EUROPE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""".stripMargin) { (s, dir) =>
      // Scale shape: the selective part dim semi-filters the fact BEFORE
      // the (part, supplier) aggregate (the per-part min is unchanged —
      // the filter is on part attributes, so each surviving part keeps its
      // full supplier set), and the correlated min is a window over the
      // aggregated frame rather than a second aggregate joined back —
      // ONE fact scan total (the join-back form scans lineitem twice).
      val p = Tables.part(s, dir)
        .filter(col("p_type") === "SMALL" && col("p_size") < 10)
      val sp = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
      val ps = Tables.lineitem(s, dir)
        .join(broadcast(p.select(col("p_partkey"))), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice").cast(d2)).as("cost"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      ps.withColumn("min_cost", min(col("cost")).over(w))
        .filter(col("cost") === col("min_cost"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_acctbal").cast("double").as("s_acctbal"), col("s_name"),
          col("n_name"), col("p_partkey"), col("p_type"),
          col("cost").cast("double").as("cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey")).limit(20)
    },

    // TPC-H Q7 shape (bidirectional nation-pair volume): both nation dims
    // pre-filtered to the IN-list BEFORE broadcasting, disjunctive pair
    // predicate as the post-join residual, revenue per (supp_nation,
    // cust_nation, ship year).
    QDef("q7_nation_volume",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l.l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("l_extendedprice").cast(d2) *
          (lit(1) - col("l_discount").cast(d2))).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q9 shape (product-line profit by nation and year): LIKE filter
    // on the part dim broadcast into the fact, supplier→nation broadcast,
    // two-level group (nation, year).
    QDef("q9_product_profit",
      """SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir).filter(col("p_name").contains("red"))
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(sum(col("l_extendedprice").cast(d2) *
          (lit(1) - col("l_discount").cast(d2))).cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q12 shape (shipping-mode priority classes): fact join + CASE
    // conditional counts per group — the "two counters per bucket" pattern
    // over a join (the testdata has no l_shipmode/commitdate, so
    // l_linestatus buckets and the urgency classes come from
    // o_orderpriority — same join + conditional-agg shape).
    QDef("q12_priority_classes",
      """SELECT l.l_linestatus AS l_linestatus,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // TPC-H Q14 shape (promo revenue share): broadcast dim filter inside a
    // global conditional-ratio aggregate — two decimal sums, one division
    // at the end ('ECONOMY' stands in for the PROMO% type prefix).
    QDef("q14_promo_revenue",
      """SELECT round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
        |    THEN CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))
        |    ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE), 6)
        |  AS promo_revenue_pct
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { (s, dir) =>
      val rev = col("l_extendedprice").cast(d2) * (lit(1) - col("l_discount").cast(d2))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0).cast(d2)))
            .cast("double") /
          sum(rev).cast("double"), 6).as("promo_revenue_pct"))
    },

    // TPC-H Q19 shape (disjunctive multi-predicate join): OR of three
    // (brand, size-range, quantity-range) conjunction groups across the
    // join — the optimizer must extract the common equi-key and the
    // per-side CNF factors (brand/size push to the part scan, quantity
    // bounds to the fact scan) while the residual disjunction evaluates
    // post-join.
    QDef("q19_disjunctive_revenue",
      """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity >= 20 AND l.l_quantity <= 30)""".stripMargin) { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      def grp(brand: String, szHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand && col("p_size").between(1, szHi) &&
          col("l_quantity") >= qLo && col("l_quantity") <= qHi
      l.join(broadcast(p), col("p_partkey") === col("l_partkey") &&
          (grp("Brand#1", 5, 1, 11) || grp("Brand#2", 10, 10, 20) ||
            grp("Brand#3", 15, 20, 30)))
        .agg(sum(col("l_extendedprice").cast(d2) *
          (lit(1) - col("l_discount").cast(d2))).cast("double").as("revenue"))
    },

    // J3: equi LEFT JOIN enrich (Dashboard_Historical_Final.py:254-270
    // shape) — every order keeps a row even without a matching customer.
    QDef("j3_equi_left_join",
      """SELECT c.c_mktsegment AS mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY mktsegment NULLS FIRST""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          Fns.sumMoney(col("o_totalprice")).as("total_price"))
        .orderBy(col("mktsegment").asc_nulls_first)
    }
  )
}
