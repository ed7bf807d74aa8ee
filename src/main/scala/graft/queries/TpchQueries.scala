package graft.queries

import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (Q2/Q8/Q9/Q11/Q12/Q16/Q20/Q21), adapted
  * to the driver star schema — it has no partsupp/shipmode/commitdate, so the
  * supply relationship is derived from lineitem shipments and "late" is
  * ship-vs-order-date. With AnalyticsQueries (Q1/3/4/5/6/7/10/13/14/15/17/
  * 18/19/22 shapes) this completes all 22 TPC-H access patterns.
  *
  * Same parity rules as AnalyticsQueries: money sums via DECIMAL terms,
  * ratio comparisons cross-multiplied (never divided) so no engine ever
  * rounds at a boundary, deterministic ORDER BY with a unique key tiebreak.
  */
object TpchQueries {
  import Tables.t

  // Q2-style min-cost supplier: the "offer book" is derived per
  // (part, supplier) from shipments (min unit price ever shipped); the
  // correlated MIN subquery decorrelates into a per-part aggregate that
  // joins back. Unit price is one IEEE division per row — bit-identical
  // cross-engine, so the min and the equality join are exact.
  private val t15 = Q("t15_min_cost_supplier", Some(
    """WITH offer AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_price
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eu AS (
      |  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      |  FROM supplier s
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE'),
      |cand AS (
      |  SELECT o.l_partkey, o.l_suppkey, o.unit_price,
      |         eu.s_name, eu.s_acctbal, eu.n_name
      |  FROM offer o JOIN eu ON o.l_suppkey = eu.s_suppkey),
      |best AS (SELECT l_partkey, min(unit_price) AS best_price
      |         FROM cand GROUP BY l_partkey)
      |SELECT c.s_acctbal, c.s_name, c.n_name, c.l_partkey AS p_partkey,
      |  c.unit_price
      |FROM cand c
      |JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_price = b.best_price
      |JOIN part p ON p.p_partkey = c.l_partkey
      |WHERE p.p_type = 'SMALL' AND p.p_size <= 25
      |ORDER BY c.s_acctbal DESC, p_partkey, c.s_name""".stripMargin)) { (s, dir) =>
    val offer = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("__up"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("__up")).as("unit_price"))
    // supplier scales with the data (no hint); nation/region are fixed-size
    val eu = t(s, dir, "supplier")
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val cand = offer.join(eu, col("l_suppkey") === col("s_suppkey")).persist()
    val best = cand.groupBy(col("l_partkey").as("b_partkey"))
      .agg(min(col("unit_price")).as("best_price"))
    val p = t(s, dir, "part")
      .filter(col("p_type") === "SMALL" && col("p_size") <= 25)
      .select("p_partkey")
    cand
      .join(best, col("l_partkey") === col("b_partkey") &&
        col("unit_price") === col("best_price"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("unit_price"))
      .orderBy(desc("s_acctbal"), col("p_partkey"), col("s_name"))
  }

  // Q8-style market share: NATION_5 suppliers' share of ECONOMY-part revenue
  // sold to AMERICA customers, per year. Numerator folds into the same
  // decimal aggregate as the denominator (one fact pass); the share divides
  // two already-rounded doubles like t10.
  private val t16 = Q("t16_market_share", Some(
    """SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
      |  round(CAST(sum(CASE WHEN ns.n_name = 'NATION_5'
      |    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 2) AS nation_rev,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_rev,
      |  round(round(CAST(sum(CASE WHEN ns.n_name = 'NATION_5'
      |      THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 2) /
      |    round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2), 4) AS mkt_share
      |FROM lineitem l
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      |JOIN region r ON r.r_regionkey = nc.n_regionkey
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      |WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY CAST(year(o.o_orderdate) AS INT)
      |ORDER BY o_year""".stripMargin)) { (s, dir) =>
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1999-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val nc = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("nc_key"))
    val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ns = t(s, dir, "nation")
      .select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
    val disc = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    val natSum = round(sum(when(col("supp_nation") === "NATION_5", disc)
      .otherwise(lit(0).cast("decimal(18,4)"))).cast("double"), 2)
    val totSum = round(sum(disc).cast("double"), 2)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nc), col("c_nationkey") === col("nc_key"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("ns_key"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(natSum.as("nation_rev"), totSum.as("total_rev"),
        round(natSum / totSum, 4).as("mkt_share"))
      .orderBy("o_year")
  }

  // Q9-style product-type profit: per (supplier nation, year) for gear
  // parts. No supplycost column → cost proxy is 10% of retail value; the
  // two decimal sums subtract exactly before the single final round.
  private val t17 = Q("t17_product_profit", Some(
    """SELECT ns.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) -
      |             sum(CAST(p.p_retailprice * l.l_quantity * 0.1 AS DECIMAL(18,4))) AS DOUBLE), 2) AS profit
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |WHERE p.p_name LIKE '%gear%'
      |GROUP BY ns.n_name, CAST(year(o.o_orderdate) AS INT)
      |ORDER BY nation, o_year DESC""".stripMargin)) { (s, dir) =>
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val p = t(s, dir, "part").filter(col("p_name").like("%gear%"))
      .select("p_partkey", "p_retailprice")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ns = t(s, dir, "nation")
      .select(col("n_nationkey").as("ns_key"), col("n_name").as("nation"))
    val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("ns_key"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(round((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")) -
        sum((col("p_retailprice") * col("l_quantity") * lit(0.1))
          .cast("decimal(18,4)"))).cast("double"), 2).as("profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  // Q11-style important stock: per-part shipped value from a third of the
  // supplier nations (nationkey % 3 = 0 — present at every sf), kept when value exceeds 0.1% of the group total. The
  // global total is a broadcast 1-row aggregate over the PERSISTED per-part
  // frame (t13's pattern — no second fact pass, no SinglePartition window),
  // and the threshold compares decimals cross-multiplied: value*1000 > total.
  private val t18 = Q("t18_important_parts", Some(
    """WITH pv AS (
      |  SELECT l.l_partkey,
      |    sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value_d
      |  FROM lineitem l
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  WHERE s.s_nationkey % 3 = 0
      |  GROUP BY l.l_partkey)
      |SELECT l_partkey, round(CAST(value_d AS DOUBLE), 2) AS part_value
      |FROM pv
      |WHERE value_d * 1000 > (SELECT sum(value_d) FROM pv)
      |ORDER BY part_value DESC, l_partkey""".stripMargin)) { (s, dir) =>
    val sup = t(s, dir, "supplier")
      .filter(col("s_nationkey") % 3 === 0)
      .select("s_suppkey")
    val pv = t(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("value_d"))
      .persist()
    pv.join(broadcast(pv.agg(sum(col("value_d")).as("__total"))),
        col("value_d") * 1000 > col("__total"))
      .select(col("l_partkey"),
        round(col("value_d").cast("double"), 2).as("part_value"))
      .orderBy(desc("part_value"), col("l_partkey"))
  }

  // Q12-style late-shipment priority check: lines shipped >60 days after
  // ordering in 1997, bucketed by returnflag (the schema's shipmode stand-in)
  // with high/low order-priority conditional counts. All-integer aggregates —
  // nothing floats, nothing can drift.
  private val t19 = Q("t19_late_by_class", Some(
    """SELECT l.l_returnflag,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin)) { (s, dir) =>
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(t(s, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_returnflag")
      .agg(sum(when(isHigh, 1).otherwise(0)).cast("bigint")
          .as("high_line_count"),
        sum(when(isHigh, 0).otherwise(1)).cast("bigint")
          .as("low_line_count"))
      .orderBy("l_returnflag")
  }

  // Q16-style supplier counts per part profile: distinct shippers per
  // (brand, type, size), excluding negative-balance suppliers (the
  // "complaints" NOT IN, planned as a broadcast anti join on the tiny
  // excluded-key set). The (part, supplier) pairs dedupe BEFORE the count.
  private val t20 = Q("t20_supplier_part_cnt", Some(
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (5, 10, 15, 20, 25, 30)
      |  AND l.l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_type, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin)) { (s, dir) =>
    val excluded = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(5, 10, 15, 20, 25, 30))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
  }

  // Q20-style dominant suppliers: suppliers who shipped >30% of a small
  // part's 1997 volume. Quantities are integral doubles → BIGINT sums, and
  // the share threshold cross-multiplies (qty*10 > 3*total) so the gate is
  // pure integer arithmetic. The supplier list dedupes via a semi join.
  private val t21 = Q("t21_dominant_suppliers", Some(
    """WITH sq AS (
      |  SELECT l.l_partkey, l.l_suppkey,
      |    CAST(sum(l.l_quantity) AS BIGINT) AS supp_qty
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  WHERE p.p_name LIKE 'small%'
      |    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l.l_partkey, l.l_suppkey),
      |pq AS (SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
      |       FROM sq GROUP BY l_partkey)
      |SELECT s.s_suppkey, s.s_name, n.n_name
      |FROM supplier s
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE s.s_suppkey IN (
      |  SELECT sq.l_suppkey FROM sq JOIN pq ON sq.l_partkey = pq.l_partkey
      |  WHERE sq.supp_qty * 10 > 3 * pq.part_qty)
      |ORDER BY s.s_suppkey""".stripMargin)) { (s, dir) =>
    val smallParts = t(s, dir, "part").filter(col("p_name").like("small%"))
      .select("p_partkey")
    val sq = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity")).cast("bigint").as("supp_qty"))
      .persist()
    val pq = sq.groupBy(col("l_partkey").as("pq_partkey"))
      .agg(sum(col("supp_qty")).cast("bigint").as("part_qty"))
    val dominant = sq.join(pq, col("l_partkey") === col("pq_partkey"))
      .filter(col("supp_qty") * 10 > lit(3) * col("part_qty"))
      .select("l_suppkey")
    t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  // Q21-style suppliers who kept orders waiting: in finished multi-supplier
  // orders, the UNIQUE supplier whose lines shipped >90 days late. The
  // EXISTS/NOT-EXISTS pair collapses into one per-order aggregate (supplier
  // count vs late-supplier count) — no self-joins over lineitem, two
  // shuffles total, every metric an integer.
  private val t22 = Q("t22_waiting_suppliers", Some(
    """WITH ls AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      |        THEN 1 ELSE 0 END) AS is_late
      |  FROM lineitem l
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |  GROUP BY l.l_orderkey, l.l_suppkey),
      |po AS (
      |  SELECT l_orderkey, count(*) AS n_supps,
      |    CAST(sum(is_late) AS BIGINT) AS n_late,
      |    max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
      |  FROM ls GROUP BY l_orderkey)
      |SELECT s.s_name, count(*) AS numwait
      |FROM po JOIN supplier s ON s.s_suppkey = po.late_supp
      |WHERE po.n_supps >= 2 AND po.n_late = 1
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin)) { (s, dir) =>
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val ls = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1).otherwise(0))
        .as("is_late"))
    val po = ls.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supps"),
        sum(col("is_late")).cast("bigint").as("n_late"),
        max(when(col("is_late") === 1, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supps") >= 2 && col("n_late") === 1)
    po.join(t(s, dir, "supplier").select("s_suppkey", "s_name"),
        col("late_supp") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  val qs: Seq[Q] = Seq(t15, t16, t17, t18, t19, t20, t21, t22)
}
