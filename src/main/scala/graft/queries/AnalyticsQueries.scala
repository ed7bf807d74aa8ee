package graft.queries

import org.apache.spark.sql.functions._

/** Headline analytical queries over the TPC-H-ish star schema (beyond
  * reference — the multi-join/aggregate shapes a warehouse engine lives on;
  * modeled on TPC-H Q1/Q3/Q5 against the driver tables).
  *
  * Money sums go through DECIMAL: double summation order differs between
  * engines (partial aggregation vs sequential), and at 1e9 magnitudes the
  * ulp drift can cross a round(…, 2) boundary. Casting each term to an
  * exact decimal FIRST (the per-row double products are bit-identical
  * cross-engine) makes every sum exact, then one final double round is
  * deterministic.
  */
object AnalyticsQueries {
  import Tables.t

  // Q1-style pricing summary: one scan, map-side partial aggregation.
  private val t1 = Q("t1_pricing_summary", Some(
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
      |  count(*) AS n_rows
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).as("sum_base"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 2).as("sum_disc"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).cast("decimal(18,6)")).cast("double"), 2).as("sum_charge"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // Q3-style shipping priority: dims broadcast into the fact scan, top-10
  // via TakeOrderedAndProject (rounded revenue + key tiebreak → stable).
  private val t2 = Q("t2_shipping_priority", Some(
    """SELECT l.l_orderkey,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
      |  o.o_orderdate
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin)) { (s, dir) =>
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // no broadcast hints: orders/customer are fact-sized at scale — AQE
    // converts to broadcast at runtime when the filtered side turns small
    l.join(o.join(c, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate")
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  // Q5-style local supplier volume: 6-way join, every dim broadcast; the
  // only shuffle is the final per-nation aggregate.
  private val t3 = Q("t3_local_volume", Some(
    """SELECT n.n_name,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)) { (s, dir) =>
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1999-01-01"))
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      .select("r_regionkey")
    // broadcast hints ONLY on the fixed-size dims (region 5, nation 25);
    // orders/customer/supplier scale with the data — AQE decides for them
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n.join(broadcast(r),
        col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .orderBy("n_name")
  }

  // Q6-style forecast revenue: single scan, every predicate pushed to the
  // parquet reader, one global decimal-exact aggregate.
  private val t4 = Q("t4_forecast_revenue", Some(
    """SELECT
      |  round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // Q10-style returned-item report: top-20 customers by returned revenue in
  // a quarter; nation dim broadcast, AQE picks the fact-join strategy.
  private val t5 = Q("t5_returned_items", Some(
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin)) { (s, dir) =>
    val c = t(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-10-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val n = t(s, dir, "nation").select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .select("c_custkey", "c_name", "n_name", "revenue")
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  // Q18-style large-volume orders: the HAVING aggregate runs ONCE and its
  // result (already carrying total_qty) joins back — no second pass over
  // lineitem. Quantities are integral doubles, so the BIGINT cast is exact.
  private val t6 = Q("t6_large_orders", Some(
    """WITH big AS (
      |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
      |  round(o.o_totalprice, 2) AS totalprice, b.total_qty
      |FROM big b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY totalprice DESC, o.o_orderkey""".stripMargin)) { (s, dir) =>
    val big = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("__q"))
      .filter(col("__q") > 250)
      .select(col("l_orderkey"), col("__q").cast("bigint").as("total_qty"))
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = t(s, dir, "customer").select("c_custkey", "c_name")
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("totalprice"),
        col("total_qty"))
      .orderBy(desc("totalprice"), col("o_orderkey"))
  }

  // Q22-style anti join: lapsed customers (no orders since 2001),
  // summarized per segment. Spark plans a HASH anti join — the orders side
  // is filtered AND reduced to its key column before the join, so the
  // build side is small regardless of history depth.
  private val t7 = Q("t7_cust_no_orders", Some(
    """SELECT c_mktsegment, count(*) AS n_custs,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)) { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2001-01-01")).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2)
          .as("total_bal"))
      .orderBy("c_mktsegment")
  }

  // Q13-style customer order-count distribution: LEFT join keeps the
  // zero-order customers, count(o_orderkey) skips their nulls, then the
  // tiny (c_count → custdist) histogram aggregates a second time.
  private val t8 = Q("t8_order_distribution", Some(
    """WITH co AS (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin)) { (s, dir) =>
    t(s, dir, "customer").select("c_custkey")
      .join(t(s, dir, "orders").select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  // Q4-style priority check: orders with at least one slow lineitem
  // (shipped >90 days after ordering). A LEFT SEMI hash join — the probe
  // side forwards each order at most once no matter how many lineitems
  // match, and the equi-key keeps it off the nested-loop path.
  private val t9 = Q("t9_late_orders", Some(
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)) { (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-07-01"))
      .join(t(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  // Q14-style promo revenue share: one fact pass, part joined on the key,
  // CASE folded into the same decimal aggregate (no second scan for the
  // denominator). The ratio divides two already-rounded doubles.
  private val t10 = Q("t10_promo_share", Some(
    """SELECT
      |  round(CAST(sum(CASE WHEN p.p_type = 'PROMO'
      |    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 2) AS promo_rev,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_rev,
      |  round(CAST(100 AS DOUBLE) *
      |    round(CAST(sum(CASE WHEN p.p_type = 'PROMO'
      |      THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 2) /
      |    round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2), 4) AS promo_pct
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin)) { (s, dir) =>
    val disc = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    val promoSum = round(sum(when(col("p_type") === "PROMO", disc)
      .otherwise(lit(0).cast("decimal(18,4)"))).cast("double"), 2)
    val totalSum = round(sum(disc).cast("double"), 2)
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01") &&
        col("l_shipdate") < lit("1997-10-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(t(s, dir, "part").select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(promoSum.as("promo_rev"), totalSum.as("total_rev"),
        round(lit(100.0) * promoSum / totalSum, 4).as("promo_pct"))
  }

  // Q17-style small-quantity revenue: the per-part avg-quantity aggregate
  // runs once and joins back (quantities are integral doubles, so the avg is
  // the same exact sum/count division in both engines — no fp-order risk on
  // the 0.2*avg comparison boundary).
  private val t11 = Q("t11_small_qty_revenue", Some(
    """WITH pa AS (
      |  SELECT l_partkey, avg(l_quantity) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT
      |  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(7 AS DOUBLE), 2) AS avg_yearly,
      |  count(*) AS n_rows
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN pa ON pa.l_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#1'
      |  AND l.l_quantity < CAST(0.2 AS DOUBLE) * pa.avg_qty""".stripMargin)) { (s, dir) =>
    val li = t(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val pa = li.groupBy(col("l_partkey").as("pa_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#1")
      .select("p_partkey")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(pa, col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((round(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / lit(7.0), 2)).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  // Q19-style disjunctive predicates: three (brand, size, quantity) branches
  // OR'd together. The part-side brand/size conjuncts still push to the
  // part scan as `brand IN (...)` ∧ size-range supersets; the join stays a
  // hash equi-join on partkey with the disjunction as a residual filter.
  private val t12 = Q("t12_branch_revenue", Some(
    """SELECT
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
      |       AND l.l_quantity BETWEEN 1 AND 15)
      |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
      |       AND l.l_quantity BETWEEN 10 AND 25)
      |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
      |       AND l.l_quantity BETWEEN 20 AND 35)""".stripMargin)) { (s, dir) =>
    val li = t(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    val branch = (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
        col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
        col("l_quantity").between(20, 35))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // Q15-style top supplier: quarterly revenue per supplier, then the
  // argmax. The per-supplier frame is persisted so the max() probe reuses
  // it instead of re-scanning lineitem, and the 1-row max broadcasts back —
  // no global window / SinglePartition exchange. Ties (possible on rounded
  // revenue) keep every argmax supplier, like the TPC-H spec.
  private val t13 = Q("t13_top_supplier", Some(
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-10-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.revenue
      |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
      |WHERE r.revenue = (SELECT max(revenue) FROM rev)
      |ORDER BY s.s_suppkey""".stripMargin)) { (s, dir) =>
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-10-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .groupBy("l_suppkey")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .persist()
    rev.join(broadcast(rev.agg(max(col("revenue")).as("__mx"))),
        col("revenue") === col("__mx"))
      .drop("__mx")
      .join(t(s, dir, "supplier").select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "revenue")
      .orderBy("s_suppkey")
  }

  // Q7-style nation-pair volume: customer nation × supplier nation revenue
  // per year for one pair (both directions). The two tiny nation dims
  // broadcast; the only shuffles are the fact-side equi-joins and the
  // final 4-row aggregate.
  private val t14 = Q("t14_nation_volume", Some(
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l.l_shipdate) AS INT) AS l_year,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |FROM lineitem l
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1999-01-01'
      |  AND ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
      |    OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2'))
      |GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)) { (s, dir) =>
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1999-01-01"))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount")
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_3") ||
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_2"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .select("supp_nation", "cust_nation", "l_year", "revenue")
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val qs: Seq[Q] = Seq(t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t11, t12,
    t13, t14)
}
