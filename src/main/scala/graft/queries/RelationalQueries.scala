package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.Upsert

/** Relational operator coverage (SURVEY §2.2–§2.6) expressed over the
  * driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Scale notes are per query; the common rules:
  *  - filters/projections sit directly on the parquet scan (pushdown
  *    + pruning verified in PlanSpec),
  *  - small dimensions are broadcast,
  *  - exact-decimal sums make aggregates bit-reproducible without
  *    constraining Spark's parallel accumulation order.
  */
object RelationalQueries {

  /** sum of a double expr as exact decimal, emitted as double. */
  private def dsum(c: Column, scale: Int = 8): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  val qs: Seq[Q] = Seq(

    // ---- q01: pricing summary (A-family aggregates; TPC-H Q1 shape).
    // Map-side partial aggregation; 4 groups → tiny shuffle.
    Q("q01_pricing_summary", Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${Q.dsumSql("l_quantity", 2)} AS sum_qty,
             ${Q.dsumSql("l_extendedprice", 2)} AS sum_base_price,
             ${Q.dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${Q.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 10)} AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 10).as("sum_charge"),
          (sum(col("l_quantity").cast("decimal(28,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- q02: the reference's flagship query (P1 query_download_url,
    // crawler/utils.py:43-82): conjunctive null-safe substring filter +
    // projection. Plain `contains` (null → dropped) matches the
    // reference's na=False semantics for a non-empty needle AND
    // pushes into the parquet scan as StringContains — wrapping the
    // column in coalesce() blocks source pushdown entirely
    // (PushedFilters goes empty), which at 100 TB means scanning
    // every row group instead of skipping on statistics.
    Q("q02_filter_contains", Some("""
      SELECT p_partkey, p_name, p_brand, p_retailprice
      FROM part
      WHERE contains(coalesce(p_name, ''), 're')
        AND contains(coalesce(p_type, ''), 'ECONOMY')
      ORDER BY p_partkey""")) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").contains("re") && col("p_type").contains("ECONOMY"))
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    },

    // ---- q03: join + aggregate + top-k (J-family; TPC-H Q3 shape).
    // customer is the small side → broadcast; lineitem never leaves
    // its scan partitioning until the group-by shuffle.
    Q("q03_shipping_priority", Some(s"""
      SELECT l_orderkey,
             ${Q.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             o_orderdate, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'MACHINERY' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")) { (s, d) =>
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01 00:00:00"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01 00:00:00"))
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- q04: semi join (EXISTS; J-family / P9 shape).
    Q("q04_priority_semi_join", Some("""
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")) { (s, d) =>
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
                col("o_orderdate") < lit("1997-01-01 00:00:00"))
      val li = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // ---- q05: anti join (J7 outlier removal shape: NOT EXISTS).
    // Churned customers: no orders since 2000-01-01. The date slice
    // exists to make the gate NON-VACUOUS — every customer in the
    // synthetic data has at least one order overall, so the unsliced
    // anti join returned 0 rows at every SF and the oracle
    // hash-matched on empty results (round-7 verdict). With the
    // slice the gate carries 14/135/1355 rows at sf0.001/0.01/0.1,
    // and the filter still pushes into the orders scan.
    Q("q05_customers_no_orders", Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      ORDER BY c_custkey""")) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
                .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- q06: selective scan aggregate (TPC-H Q6 shape) — the whole
    // predicate pushes into the parquet scan; no shuffle at all
    // beyond the single-row final aggregate.
    Q("q06_revenue_delta", Some(s"""
      SELECT ${Q.dsumSql("l_extendedprice * l_discount")} AS revenue,
             COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.02 AND l_discount <= 0.06
        AND l_quantity < 24""")) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
                col("l_shipdate") < lit("1997-01-01 00:00:00") &&
                col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
                col("l_quantity") < 24)
        .agg(
          dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // ---- q07: star join through two broadcast dimensions (J8 shape).
    Q("q07_revenue_by_nation", Some(s"""
      SELECT n_name,
             ${Q.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
      FROM customer, orders, lineitem, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY n_name""")) { (s, d) =>
      val nr = Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.customer(s, d)
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
                col("o_orderdate") < lit("1997-01-01 00:00:00"))
      Tables.lineitem(s, d)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // ---- q08: MERGE-style upsert (J4, process_all.py:797-839):
    // full-outer join + column-wise coalesce, update wins.
    Q("q08_upsert_merge", Some("""
      SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
             coalesce(u.price, b.price) AS price,
             coalesce(u.status, b.status) AS status
      FROM (SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status
            FROM orders WHERE o_orderkey % 3 <> 0) b
      FULL OUTER JOIN
           (SELECT o_orderkey,
                   CAST(CAST(o_totalprice * 1.05 AS DECIMAL(28,4)) AS DOUBLE) AS price,
                   'U' AS status
            FROM orders WHERE o_orderkey % 2 = 0) u
      USING (o_orderkey)
      ORDER BY o_orderkey""")) { (s, d) =>
      val ord = Tables.orders(s, d)
      val base = ord.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
      val updates = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") * 1.05).cast("decimal(28,4)").cast("double").as("price"),
          lit("U").as("status"))
      Upsert(base, updates, Seq("o_orderkey")).orderBy("o_orderkey")
    },

    // ---- q09: per-group top-k window (W5 sampling shape).
    Q("q09_top3_per_nation", Some("""
      SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
      WHERE rn <= 3
      ORDER BY c_nationkey, rn""")) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
        .orderBy("c_nationkey", "rn")
    },

    // ---- q10: global sort + limit (W3 error-head shape).
    Q("q10_top5_orders", Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 5""")) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5)
    },

    // ---- q11: positional explode (W4 enumerate / J6 positional join
    // shape): token with its 0-based position.
    Q("q11_posexplode_tokens", Some("""
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents
      WHERE doc_id < 20
      ORDER BY doc_id, pos""")) { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "token")
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos")
    },

    // ---- q12: union + distinct (U1 shape).
    Q("q12_union_distinct", Some("""
      SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier)
      ORDER BY nationkey""")) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    },

    // ---- q13: group-by-derived-prefix (A1/A2 audiobook grouping shape).
    Q("q13_group_by_prefix", Some("""
      SELECT split_part(text, ' ', 1) AS first_tok,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY 1
      ORDER BY first_tok""")) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(split(col("text"), " ").getItem(0).as("first_tok"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy("first_tok")
    },

    // ---- q14: min-per-group + qualification predicate (P7/A5
    // sample-rate gate shape).
    Q("q14_qualify_min_per_group", Some("""
      SELECT l_orderkey,
             CAST(MIN(l_shipdate) AS DATE) AS min_ship,
             MIN(l_shipdate) >= TIMESTAMP '1995-06-01 00:00:00' AS qualified
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY l_orderkey""")) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(min(col("l_shipdate")).as("min_ts"))
        .select(
          col("l_orderkey"),
          col("min_ts").cast("date").as("min_ship"),
          (col("min_ts") >= lit("1995-06-01 00:00:00")).as("qualified"))
        .orderBy("l_orderkey")
    },

    // ---- q15: success/failure counters + rate (A6/A9 shape).
    Q("q15_status_counters", Some("""
      SELECT o_orderstatus AS status,
             COUNT(*) AS n,
             CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
             COUNT(*) FILTER (WHERE o_totalprice > 200000) / COUNT(*) AS big_rate
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
          (count(when(col("o_totalprice") > 200000, 1)) / count(lit(1))).as("big_rate"))
        .orderBy("status")
    },

    // ---- q16: slugify custom expression (F1) over part names —
    // with a DIACRITIC-BEARING suffix so the de-accent path itself
    // is hash-gated, not just spec-gated (p_name alone is ASCII and
    // the gate was vacuous on the Unicode branch). The suffix is
    // deliberately DECOMPOSED (base letters + combining circumflex/
    // dot-below as separate codepoints) plus the non-decomposable
    // Đ — the reference's own quirk (Đ has no NFD decomposition, so
    // slugify KEEPS it, lowercased to đ, `__init__.py:10-29`). The
    // oracle applies its ASCII chain to p_name and appends the
    // PREDICTED de-accented slug of the suffix as a constant (the
    // q45/q95 analytic-oracle pattern): any slip in NFD, mark
    // stripping, the (?U) word-char class, or hyphen collapsing
    // flips the hash.
    {
      // " Đêm Việt 123" with ê = e+U+0302 and ệ = e+U+0323+U+0302.
      val rawSuffix = " \u0110e\u0302m Vie\u0323\u0302t 123"
      val slugSuffix = "-\u0111em-viet-123"
      Q("q16_slugify", Some(s"""
      SELECT p_partkey,
             regexp_replace(trim(regexp_replace(lower(p_name), '[^a-z0-9_\\s-]', '', 'g')),
                            '\\s+', '-', 'g') || '$slugSuffix' AS slug
      FROM part
      ORDER BY p_partkey""")) { (s, d) =>
        Tables.part(s, d)
          .select(col("p_partkey"),
            GraftFunctions.deaccent_slug(concat(col("p_name"), lit(rawSuffix))).as("slug"))
          .orderBy("p_partkey")
      }
    },

    // ---- q17: duration parse custom expression (F2) — round-trips a
    // synthesized M:SS clock string; the oracle computes the expected
    // seconds arithmetically, independent of the parser. dur_str is
    // materialized by its own projection so the floor/cast/concat
    // subtree is built once per row and the parser reads the column
    // (CollapseProject keeps non-cheap multiply-referenced aliases
    // in their own Project, so this survives optimization).
    Q("q17_duration_parse", Some("""
      SELECT event_id,
             CAST(FLOOR(value / 60) AS BIGINT) || ':' || CAST(FLOOR(fmod(value, 60)) AS BIGINT) AS dur_str,
             FLOOR(value / 60) * 60 + FLOOR(fmod(value, 60)) AS seconds
      FROM events
      ORDER BY event_id""")) { (s, d) =>
      val durStr = concat(
        floor(col("value") / 60).cast("long").cast("string"), lit(":"),
        floor(col("value") % 60).cast("long").cast("string"))
      Tables.events(s, d)
        .select(col("event_id"), durStr.as("dur_str"))
        .select(
          col("event_id"),
          col("dur_str"),
          GraftFunctions.duration_seconds(col("dur_str")).as("seconds"))
        .orderBy("event_id")
    },

    // ---- q67: FULL OUTER join — the reconciliation shape (which
    // customers have orders, which orders have no known customer,
    // which customers are dormant). The probe side is restricted to
    // even customer keys so both unmatched directions actually
    // occur; null join keys surface as unmatched rows on both
    // engines by SQL semantics.
    Q("q67_full_outer", Some("""
      WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0),
      o AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1)
      SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
             c.c_name, o.n_orders
      FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
      ORDER BY custkey NULLS FIRST, c_name NULLS FIRST""")) { (s, d) =>
      val c = Tables.customer(s, d)
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"))
        .orderBy(col("custkey"), col("c_name").asc_nulls_first)
    },

    // ---- q68: ROLLUP subtotals — the OLAP grouping-sets family:
    // per (region, nation), per region, and grand total in one
    // aggregation pass. Subtotal rows carry nulls plus GROUPING()
    // flags so real null keys and subtotal nulls stay
    // distinguishable; sums ride the decimal-exact pattern.
    Q("q68_rollup", Some(s"""
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(GROUPING(r.r_name) AS BIGINT) AS g_region,
             CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
             CAST(COUNT(s.s_suppkey) AS BIGINT) AS n_suppliers,
             ${Q.dsumSql("s.s_acctbal", 2)} AS sum_acctbal
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP(r.r_name, n.n_name)
      ORDER BY g_region, g_nation, region NULLS FIRST, nation NULLS FIRST""")) { (s, d) =>
      Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region"), col("n_name").as("nation"),
          col("s_suppkey"), col("s_acctbal"))
        .rollup(col("region"), col("nation"))
        .agg(
          grouping(col("region")).cast("long").as("g_region"),
          grouping(col("nation")).cast("long").as("g_nation"),
          count(col("s_suppkey")).as("n_suppliers"),
          sum(col("s_acctbal").cast("decimal(28,2)")).cast("double").as("sum_acctbal"))
        .select(col("region"), col("nation"), col("g_region"), col("g_nation"),
          col("n_suppliers"), col("sum_acctbal"))
        .orderBy(col("g_region"), col("g_nation"),
          col("region").asc_nulls_first, col("nation").asc_nulls_first)
    },

    // ---- q69: pivot — event types to columns, one row per user
    // (the wide feature-table shape). The pivot value list is
    // explicit and fixed, so the output schema is deterministic;
    // the oracle is the portable CASE-aggregation form, which is
    // exactly what a pivot desugars to.
    Q("q69_pivot_events", Some(s"""
      SELECT user_id,
             ${Q.dsumSql("CASE WHEN event_type = 'click' THEN value END", 2)} AS click_value,
             ${Q.dsumSql("CASE WHEN event_type = 'view' THEN value END", 2)} AS view_value,
             ${Q.dsumSql("CASE WHEN event_type = 'purchase' THEN value END", 2)} AS purchase_value,
             CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_errors
      FROM events
      GROUP BY user_id
      ORDER BY user_id""")) { (s, d) =>
      val ev = Tables.events(s, d)
      val sums = ev
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(sum(col("value").cast("decimal(28,2)")).cast("double"))
        .select(col("user_id"), col("click").as("click_value"),
          col("view").as("view_value"), col("purchase").as("purchase_value"))
      val errs = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_errors"))
      sums.join(errs, Seq("user_id"), "left")
        .withColumn("n_errors", coalesce(col("n_errors"), lit(0L)))
        .orderBy("user_id")
    },

    // ---- q70: INTERSECT / EXCEPT — set semantics (distinct rows,
    // null-safe equality) over two derived key sets: customers who
    // both ordered AND have a positive balance, minus those who did
    // either but not both. Closes the set-operation row next to
    // q12's UNION; both ops tagged so one result table gates both.
    Q("q70_intersect_except", Some("""
      WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
      b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0),
      i AS (SELECT 'both' AS tag, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)),
      e AS (SELECT 'only_ordered' AS tag, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b))
      SELECT tag, k FROM i
      UNION ALL
      SELECT tag, k FROM e
      ORDER BY tag, k""")) { (s, d) =>
      val a = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
      val b = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
      a.intersect(b).withColumn("tag", lit("both"))
        .unionByName(a.except(b).withColumn("tag", lit("only_ordered")))
        .select(col("tag"), col("k"))
        .orderBy("tag", "k")
    },

    // ---- q133: snapshot diff — the read side of CDC next to q08's
    // MERGE: two deterministic versions of orders (v2 drops every
    // key ≡ 2 mod 7 and rewrites o_orderpriority on keys ≡ 0 mod 5;
    // v1 lacks keys ≡ 3 mod 10, so all three tags bind) reduced
    // in-scan to (key, md5 fingerprint) and full-outer-joined once.
    // The oracle replays the tag decision from first principles with
    // IS DISTINCT FROM over the compare columns — the gate proves
    // fingerprint-diff ≡ column-diff on this data.
    Q("q133_snapshot_diff", Some("""
      WITH v1 AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
                  FROM orders WHERE o_orderkey % 10 <> 3),
      v2 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                    CASE WHEN o_orderkey % 5 = 0 THEN 'X-DIFF'
                         ELSE o_orderpriority END AS o_orderpriority
             FROM orders WHERE o_orderkey % 7 <> 2)
      SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
             CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                  WHEN v2.o_orderkey IS NULL THEN 'removed'
                  WHEN (v1.o_custkey IS DISTINCT FROM v2.o_custkey)
                    OR (v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus)
                    OR (v1.o_orderpriority IS DISTINCT FROM v2.o_orderpriority)
                    THEN 'changed' END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
      WHERE status IS NOT NULL
      ORDER BY o_orderkey""")) { (s, d) =>
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      val v1 = o.filter(pmod(col("o_orderkey"), lit(10L)) =!= 3L)
      val v2 = o.filter(pmod(col("o_orderkey"), lit(7L)) =!= 2L)
        .withColumn("o_orderpriority",
          when(pmod(col("o_orderkey"), lit(5L)) === 0L, lit("X-DIFF"))
            .otherwise(col("o_orderpriority")))
      Upsert.snapshotDiff(v1, v2, Seq("o_orderkey"),
          Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("o_orderkey")
    },

    // ---- q141: declarative validation report — the Deequ-shape
    // data-quality gate an ingest runs before publishing a snapshot:
    // completeness, uniqueness, range, set-membership and
    // referential integrity, the scan checks compiled into ONE
    // aggregate pass (adding a check adds a COLUMN, never a scan)
    // plus one keys-projected anti-join for the FK. Status 'P' rows
    // violate the set check and top-tail prices the range check, so
    // failing AND passing branches both bind; every metric is a
    // count ratio (exact longs + one correctly-rounded division).
    // ---- q157: market-basket lift — association mining over the
    // order→part relation: per co-purchased part pair at support ≥ 2,
    // exact counts and lift = N·n_ab/(n_a·n_b) as one
    // correctly-rounded division. Pair work is quadratic per BASKET
    // only (guarded), the census map-side combines, marginals
    // re-attach by item-keyed joins.
    Q("q157_market_basket", Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      n AS (SELECT COUNT(DISTINCT o) AS n FROM b),
      c AS (SELECT p, COUNT(*) AS c FROM b GROUP BY 1),
      pr AS (SELECT a.p AS part_a, b2.p AS part_b, COUNT(*) AS n_ab
             FROM b a JOIN b b2 ON b2.o = a.o AND a.p < b2.p GROUP BY 1, 2),
      f AS (SELECT part_a, part_b, n_ab FROM pr WHERE n_ab >= 2)
      SELECT part_a, part_b, n_ab, ca.c AS n_a, cb.c AS n_b,
             CAST(n.n * n_ab AS DOUBLE) / (ca.c * cb.c) AS lift
      FROM f JOIN c ca ON ca.p = part_a JOIN c cb ON cb.p = part_b, n
      ORDER BY part_a, part_b""")) { (s, d) =>
      graft.operators.TextRank.marketBasket(
          Tables.lineitem(s, d).select("l_orderkey", "l_partkey"),
          basketCol = "l_orderkey", itemCol = "l_partkey", minSupport = 2L)
        .orderBy("part_a", "part_b")
    },

    // ---- q153: Fellegi-Sunter record linkage — the field-level
    // entity-resolution sibling of the text dedup tier: same-block
    // (nation, segment) customer pairs score Σ integer agreement
    // weights (name +40/−15, balance-within-1.00 +20/−10), split
    // match/possible at 50/25. Planted dirty twins: every 5th
    // customer re-keyed with balance +0.50 (full agreement → match);
    // every 10th instead +50.00 (name-only agreement → possible);
    // unrelated in-block pairs score ≤ 5 and drop. Blocking bounds
    // candidates quadratic-per-block with the census guard.
    Q("q153_record_linkage", Some("""
      WITH base AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
              CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
            FROM customer),
      tw AS (SELECT c_custkey + 10000000 AS c_custkey, c_name, c_nationkey,
               c_mktsegment,
               cents + CASE WHEN c_custkey % 10 = 0 THEN 5000 ELSE 50 END AS cents
             FROM base WHERE c_custkey % 5 = 0),
      r AS (SELECT * FROM base UNION ALL SELECT * FROM tw),
      p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
              (CASE WHEN a.c_name = b.c_name THEN 40 ELSE -15 END +
               CASE WHEN ABS(a.cents - b.cents) <= 100 THEN 20 ELSE -10 END) AS score
            FROM r a JOIN r b ON b.c_nationkey = a.c_nationkey
              AND b.c_mktsegment = a.c_mktsegment
              AND a.c_custkey < b.c_custkey)
      SELECT id_a, id_b, CAST(score AS BIGINT) AS score,
             CASE WHEN score >= 50 THEN 'match' ELSE 'possible' END AS cls
      FROM p WHERE score >= 25 ORDER BY id_a, id_b""")) { (s, d) =>
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") * 100d + 0.5d).cast("long").as("cents"))
      val twins = base.filter(pmod(col("c_custkey"), lit(5L)) === 0L)
        .select((col("c_custkey") + 10000000L).as("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_mktsegment"),
          (col("cents") + when(pmod(col("c_custkey"), lit(10L)) === 0L, 5000L)
            .otherwise(50L)).as("cents"))
      graft.operators.Linkage.blockedFieldMatch(
          base.unionByName(twins), Seq("c_nationkey", "c_mktsegment"),
          Seq(graft.operators.Linkage.exact("c_name", 40L, -15L),
            graft.operators.Linkage.withinLong("cents", 100L, 20L, -10L)),
          "c_custkey", minScore = 25L, matchScore = 50L)
        .orderBy("id_a", "id_b")
    },

    // ---- q182: Hill tail-index of the partkey posting-size
    // distribution — "is this degree sequence heavy-tailed": alpha
    // over the top-64 order statistics in flog2q integer logs, with
    // the explicit 1/ln2 fixed-point conversion to natural-log
    // units (the log base cancels inside each ratio but not in the
    // estimator scale); alpha <= 2 (alpha_e4 <= 20000) is the
    // infinite-variance regime where mean-based capacity planning
    // lies. One census + one bounded TakeOrdered(65); ties at the
    // cut resolve by (size DESC, key).
    Q("q182_tail_index", Some(s"""
      WITH s AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS x
                 FROM lineitem GROUP BY 1),
      t AS (SELECT l_partkey, x,
                   row_number() OVER (ORDER BY x DESC, l_partkey) AS rk
            FROM s),
      th AS (SELECT x AS xk FROM t WHERE rk = 65)
      SELECT CAST(COUNT(*) AS BIGINT) AS k_top,
             MIN(th.xk) AS x_threshold,
             CAST(SUM(${graft.operators.Curation.flog2qSql("t.x")} -
                      ${graft.operators.Curation.flog2qSql("th.xk")}) AS BIGINT) AS inv16,
             CASE WHEN SUM(${graft.operators.Curation.flog2qSql("t.x")} -
                          ${graft.operators.Curation.flog2qSql("th.xk")}) > 0
                  THEN CAST(COUNT(*) * 160000 * 14427 // (SUM(${graft.operators.Curation.flog2qSql("t.x")} -
                           ${graft.operators.Curation.flog2qSql("th.xk")}) * 10000) AS BIGINT)
             END AS alpha_e4
      FROM t CROSS JOIN th WHERE t.rk <= 64""")) { (s, d) =>
      val sizes = Tables.lineitem(s, d)
        .groupBy("l_partkey").agg(count(lit(1)).as("x"))
      graft.operators.Stats.hillTailIndex(sizes, col("l_partkey"), col("x"), k = 64)
    },

    // ---- q171: CMS join-size estimation audit — the optimizer
    // cardinality question ("how big is the lineitem self-join on
    // partkey") answered two ways: the count-min inner-product
    // estimate (depth×width-bounded state, never key-shaped
    // shuffle) against the exact Σ c², with the signed overestimate
    // — never negative by the CMS guarantee. How a planner decides
    // broadcast-vs-shuffle before paying for the join.
    Q("q171_join_size_estimate", Some("""
      WITH t AS (SELECT CAST(l_partkey AS VARCHAR) AS term FROM lineitem),
      cells AS (SELECT d, ('0x' || substr(md5(term), 1 + 8 * d, 8))::BIGINT % 512 AS bucket,
                       CAST(COUNT(*) AS BIGINT) AS cnt
                FROM t CROSS JOIN generate_series(0, 3) g(d)
                GROUP BY 1, 2),
      est AS (SELECT MIN(COALESCE(s, 0)) AS est_size
              FROM generate_series(0, 3) g(d)
              LEFT JOIN (SELECT d, SUM(cnt * cnt) AS s FROM cells GROUP BY d) x
                USING (d)),
      ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_size
             FROM (SELECT COUNT(*) AS c FROM t GROUP BY term))
      SELECT exact_size, CAST(est_size AS BIGINT) AS est_size,
             CAST((est_size - exact_size) * 10000 // GREATEST(exact_size, 1) AS BIGINT) AS over_e4
      FROM ex CROSS JOIN est""")) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_partkey")
      graft.operators.Sketches.cmsJoinSizeAudit(li, "l_partkey", li, "l_partkey")
    },

    // ---- q164: k-anonymity / l-diversity census — the privacy gate
    // before a dataset release: per quasi-identifier class (nation,
    // segment), size n (k=16 anonymity), distinct sensitive
    // acctbal-thousand buckets (l=3 diversity), and the exact 10⁴/n
    // worst-case re-identification risk. One groupBy shuffle;
    // per-class exact distinct. At the sf0.01 gate both k branches
    // bind (mean class size ≈ 12).
    Q("q164_k_anonymity", Some("""
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) // 100000) AS BIGINT) AS n_sensitive,
             COUNT(*) >= 16 AS k_anonymous,
             COUNT(DISTINCT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) // 100000) >= 3 AS l_diverse,
             CAST(10000 // COUNT(*) AS BIGINT) AS risk_e4
      FROM customer GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, d) =>
      graft.operators.Curation.kAnonymityReport(
          Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment"),
          expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) DIV 100000"),
          k = 16L, l = 3L)
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // ---- q161: golden-record survivorship — the fusion step after
    // q153's linkage: per c_name cluster elect the golden record by
    // (completeness DESC, recency DESC) and fuse each attribute
    // latest-non-null, all as ONE groupBy aggregate (each rule is a
    // max_by column — no window, no extra scan). Planted twins make
    // every branch bind: +10M twins null their segment (lose the
    // election on completeness but still donate the freshest cents),
    // +20M twins are complete and newest (win the election outright).
    // Every max_by score is null'd with its attribute because
    // DuckDB's arg_max skips null-ARG rows while Spark's max_by
    // keeps them — the one cross-engine null divergence here.
    Q("q161_survivorship", Some("""
      WITH base AS (SELECT c_custkey, c_name, c_nationkey,
              CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents, c_mktsegment
            FROM customer),
      ta AS (SELECT c_custkey + 10000000 AS c_custkey, c_name, c_nationkey,
               cents + 50 AS cents, CAST(NULL AS VARCHAR) AS c_mktsegment
             FROM base WHERE c_custkey % 5 = 0),
      tb AS (SELECT c_custkey + 20000000 AS c_custkey, c_name, c_nationkey,
               cents + 5000 AS cents, c_mktsegment
             FROM base WHERE c_custkey % 10 = 0),
      r AS (SELECT * FROM base UNION ALL SELECT * FROM ta UNION ALL SELECT * FROM tb),
      c AS (SELECT *, (CASE WHEN c_nationkey IS NULL THEN 0 ELSE 1 END +
                       CASE WHEN cents IS NULL THEN 0 ELSE 1 END +
                       CASE WHEN c_mktsegment IS NULL THEN 0 ELSE 1 END) AS comp FROM r)
      SELECT c_name,
             arg_max(c_custkey, CAST(comp AS BIGINT) * 1000000000 + c_custkey) AS golden_c_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(CASE WHEN comp = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_complete,
             arg_max(c_nationkey, CASE WHEN c_nationkey IS NOT NULL THEN c_custkey END) AS c_nationkey_fused,
             arg_max(cents, CASE WHEN cents IS NOT NULL THEN c_custkey END) AS cents_fused,
             arg_max(c_mktsegment, CASE WHEN c_mktsegment IS NOT NULL THEN c_custkey END) AS c_mktsegment_fused
      FROM c GROUP BY c_name ORDER BY c_name""")) { (s, d) =>
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
        col("c_nationkey"),
        floor(col("c_acctbal") * 100d + 0.5d).cast("long").as("cents"),
        col("c_mktsegment"))
      val ta = base.filter(pmod(col("c_custkey"), lit(5L)) === 0L)
        .select((col("c_custkey") + 10000000L).as("c_custkey"), col("c_name"),
          col("c_nationkey"), (col("cents") + 50L).as("cents"),
          lit(null).cast("string").as("c_mktsegment"))
      val tb = base.filter(pmod(col("c_custkey"), lit(10L)) === 0L)
        .select((col("c_custkey") + 20000000L).as("c_custkey"), col("c_name"),
          col("c_nationkey"), (col("cents") + 5000L).as("cents"),
          col("c_mktsegment"))
      graft.operators.Linkage.survivorship(
          base.unionByName(ta).unionByName(tb),
          Seq("c_name"), "c_custkey", Seq("c_nationkey", "cents", "c_mktsegment"))
        .orderBy("c_name")
    },

    Q("q141_validation_report", Some("""
      WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                        CAST(COUNT(o_orderpriority) AS BIGINT) AS nn_prio,
                        CAST(COUNT(o_orderkey) AS BIGINT) AS nn_key,
                        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
                        CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                                       AND (o_totalprice < 0 OR o_totalprice > 300000)
                                      THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
                        CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                                       AND o_orderstatus NOT IN ('O', 'F')
                                      THEN 1 ELSE 0 END) AS BIGINT) AS v_set
                 FROM orders),
      fk AS (SELECT CAST(COUNT(*) AS BIGINT) AS orphans FROM (
               SELECT o.o_custkey FROM orders o
               LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                 ON c.c_custkey = o.o_custkey
               WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)),
      fkn AS (SELECT CAST(COUNT(o_custkey) AS BIGINT) AS nn FROM orders)
      SELECT * FROM (
        SELECT 'orderpriority_complete' AS "check", 'o_orderpriority' AS "column",
               CAST(nn_prio AS DOUBLE) / CAST(total AS DOUBLE) AS metric,
               total - nn_prio AS violations,
               CAST(CAST(nn_prio AS DOUBLE) / CAST(total AS DOUBLE) >= 1.0 AS BIGINT) AS passed
        FROM t
        UNION ALL
        SELECT 'orderkey_unique', 'o_orderkey',
               CAST(nd_key AS DOUBLE) / CAST(nn_key AS DOUBLE),
               nn_key - nd_key,
               CAST(CAST(nd_key AS DOUBLE) / CAST(nn_key AS DOUBLE) >= 1.0 AS BIGINT)
        FROM t
        UNION ALL
        SELECT 'totalprice_range', 'o_totalprice',
               CAST(v_range AS DOUBLE) / CAST(total AS DOUBLE), v_range,
               CAST(v_range = 0 AS BIGINT)
        FROM t
        UNION ALL
        SELECT 'status_domain', 'o_orderstatus',
               CAST(v_set AS DOUBLE) / CAST(total AS DOUBLE), v_set,
               CAST(v_set = 0 AS BIGINT)
        FROM t
        UNION ALL
        SELECT 'custkey_fk', 'o_custkey',
               CAST(fk.orphans AS DOUBLE) / CAST(fkn.nn AS DOUBLE), fk.orphans,
               CAST(fk.orphans = 0 AS BIGINT)
        FROM fk CROSS JOIN fkn)
      ORDER BY "check"""")) { (s, d) =>
      import graft.operators.Validation
      import graft.operators.Validation._
      Validation.report(Tables.orders(s, d), Seq(
          Complete("orderpriority_complete", "o_orderpriority"),
          Unique("orderkey_unique", "o_orderkey"),
          InRange("totalprice_range", "o_totalprice", 0.0, 300000.0),
          InSet("status_domain", "o_orderstatus", Seq("O", "F")),
          RefIntegrity("custkey_fk", "o_custkey",
            Tables.customer(s, d), "c_custkey")))
        .orderBy("check")
    })
}
