package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2 parity operators, re-expressed over the driver's TPC-H-ish
  * testdata tables.
  *
  * The reference is a dbt+Snowflake ELT pipeline (reference:
  * models/marts/fct_orders.sql, models/staging/stg_*.sql, tests/,
  * dbt generic-test macros). Each operator below maps one row of the SURVEY §2
  * inventory to an idiomatic DataFrame plan; the oracle string is the ANSI-SQL
  * equivalent the driver runs in DuckDB.
  *
  * Numeric-determinism rule (r02, after the r01 hash-fail audit): money
  * aggregates are computed in the exact decimal domain — raw 2-decimal doubles
  * are cast to DECIMAL *inputs* (tie-free, the raw values are within 1e-9 of a
  * 2-decimal value so no rounding ambiguity exists), all arithmetic happens
  * decimal×decimal (exact, order-independent across any partitioning — at
  * 100 TB the same plan stays exact no matter how AQE re-splits the shuffle) —
  * and then *presented* as DOUBLE. Never cast a *computed* double to decimal
  * (Spark HALF_UP vs DuckDB tie-handling diverge on per-row ties — the r01
  * bug), and never ship DECIMAL output columns (all four r01 hash-fails were
  * exactly the DECIMAL-emitting queries; the final exact-decimal → double
  * conversion is correctly rounded and bit-identical in both engines because
  * every unscaled sum stays below 2^53 at verify scale).
  */
object Relational {

  private val dec = DecimalType(18, 2)
  private val dec92 = DecimalType(9, 2)

  val ops: Seq[Op] = Seq(

    // S2/P1: table scan + passthrough projection (reference:
    // models/staging/stg_*.sql:2 `select * from {{ ref(...) }}`).
    // Catalyst turns this into a bare columnar parquet scan; nothing to tune.
    Op("s2_scan_passthrough",
       "SELECT r_regionkey, r_name FROM region") { (s, d) =>
      Tables.region(s, d).select("r_regionkey", "r_name")
    },

    // P2: column projection + rename (reference: models/staging/stg_items.sql:5-10
    // narrows 7 cols to 5 and renames freight_value -> shipping_cost).
    // The select drives column pruning into the scan: ReadSchema carries only
    // 3 of orders' 6 columns.
    Op("p2_project_rename",
       """SELECT o_orderkey AS order_id, o_orderstatus AS status,
         |       o_orderpriority AS priority
         |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
    },

    // P4: comparison predicate in WHERE (reference:
    // tests/assert_revenue_is_positive.sql:7 `where total_order_value < 0`).
    // Filter is pushed into the parquet scan (PushedFilters: LessThan).
    Op("p4_filter_predicate",
       """SELECT l_orderkey, l_linenumber, l_quantity
         |FROM lineitem WHERE l_quantity < 3""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 3)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    },

    // P5 + J2: IS NULL after a left join (reference: the item-less-orders
    // case of models/marts/fct_orders.sql:30 — orders keeping NULL revenue).
    Op("p5_null_predicate",
       """SELECT o.o_orderkey AS order_id
         |FROM orders o
         |LEFT JOIN (SELECT l_orderkey, sum(l_quantity) AS q
         |           FROM lineitem GROUP BY l_orderkey) i
         |  ON o.o_orderkey = i.l_orderkey
         |WHERE i.q IS NULL""".stripMargin) { (s, d) =>
      val items = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum("l_quantity").as("q"))
      Tables.orders(s, d)
        .join(items, col("o_orderkey") === col("l_orderkey"), "left")
        .filter(col("q").isNull)
        .select(col("o_orderkey").as("order_id"))
    },

    // J1: left outer equi-join, 1:1 dim join (reference:
    // models/marts/fct_orders.sql:29 orders LEFT JOIN customers).
    // No broadcast hint: customer scales linearly with the fact table, so a
    // forced broadcast OOMs at cluster scale. AQE picks broadcast-hash while
    // the dim is small and sort-merge once it isn't — the only strategy that
    // is correct at every SF. (Forced broadcast is reserved for genuinely
    // constant-size dims: nation/region, see Analytics.f_distinct_agg.)
    Op("j1_left_join_dim",
       """SELECT o.o_orderkey AS order_id, o.o_orderstatus AS status,
         |       c.c_name AS customer_name, c.c_mktsegment AS segment
         |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(
          o("o_orderkey").as("order_id"),
          o("o_orderstatus").as("status"),
          c("c_name").as("customer_name"),
          c("c_mktsegment").as("segment"))
    },

    // J2 + A1 + E1: the flagship fct_orders shape (reference:
    // models/marts/fct_orders.sql:9-30) — per-order aggregation of items,
    // left-joined back to orders, plus a NULL-propagating derived total.
    // Orders with no lineitems keep NULL (not 0) money columns, exactly like
    // the reference's left join; decimal + decimal preserves 3VL.
    // Scale: both sides shuffle on the same key (orderkey); at 100 TB this is
    // one co-partitioned sort-merge join, and the aggregation is partial
    // (map-side) before the shuffle.
    Op("j2_fct_orders",
       """SELECT o.o_orderkey AS order_id, o.o_orderstatus AS order_status,
         |       i.total_item_revenue, i.total_shipping_revenue,
         |       i.total_item_revenue + i.total_shipping_revenue AS total_order_value
         |FROM orders o
         |LEFT JOIN (
         |  SELECT l_orderkey,
         |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |           AS total_item_revenue,
         |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE)
         |           AS total_shipping_revenue
         |  FROM lineitem GROUP BY l_orderkey) i
         |ON o.o_orderkey = i.l_orderkey""".stripMargin) { (s, d) =>
      val items = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(
          sum(col("l_extendedprice").cast(dec)).cast("double")
            .as("total_item_revenue"),
          sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec92))
            .cast("double").as("total_shipping_revenue"))
      val o = Tables.orders(s, d)
      o.join(items, o("o_orderkey") === items("l_orderkey"), "left")
        .select(
          o("o_orderkey").as("order_id"),
          o("o_orderstatus").as("order_status"),
          col("total_item_revenue"),
          col("total_shipping_revenue"),
          (col("total_item_revenue") + col("total_shipping_revenue"))
            .as("total_order_value"))
    },

    // J3: anti-join (reference: relationships generic test,
    // dbt/include/global_project/macros/generic_test_sql/relationships.sql:1-22
    // uses left-join + IS NULL; Spark has a first-class anti join that skips
    // materializing the null-padded rows).
    Op("j3_anti_join",
       """SELECT o_orderkey AS order_id FROM orders o
         |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).select("l_orderkey")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select(o("o_orderkey").as("order_id"))
    },

    // A1: hash aggregate, sum x2 by key (reference: models/marts/fct_orders.sql:9-16,
    // `group by 1` ordinal). TPC-H Q1 shape; partial aggregation happens
    // map-side so the shuffle carries one row per (flag,status) per partition.
    Op("a1_group_agg",
       """SELECT l_returnflag, l_linestatus,
         |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price,
         |       count(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_price"),
          sum(col("l_extendedprice").cast(dec) *
              (lit(1) - col("l_discount").cast(dec92)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
    },

    // A2: uniqueness check body (reference: generic_test_sql/unique.sql:1-12 —
    // group by key, having count > 1, null keys excluded).
    Op("a2_unique_check",
       """SELECT l_orderkey AS dup_key, count(*) AS n
         |FROM lineitem WHERE l_orderkey IS NOT NULL
         |GROUP BY l_orderkey HAVING count(*) > 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey").isNotNull)
        .groupBy(col("l_orderkey").as("dup_key"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
    },

    // A3 + E2: the dbt test harness wrapper (reference:
    // macros/materializations/tests/helpers.sql:5-14 — `select count(*) as
    // failures, count(*) != 0 as should_error from (<test query>)`).
    Op("a3_test_harness",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error
         |FROM (SELECT 1 FROM orders WHERE o_totalprice < 0)""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_totalprice") < 0)
        .agg(count(lit(1)).as("failures"))
        .select(col("failures"), (col("failures") =!= 0).as("should_error"))
    },

    // L1: limit (reference: tests/test.sql get_limit_subquery_sql). A bare
    // LIMIT is non-deterministic, so the engine's form is ORDER BY + LIMIT —
    // Spark plans it as TakeOrderedAndProject (a distributed top-k, no global
    // sort), which is the only shape that scales anyway.
    Op("l1_order_limit",
       """SELECT o_orderkey AS order_id, o_totalprice AS total
         |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey").as("order_id"), col("o_totalprice").as("total"))
    },

    // U1: UNION ALL with a discriminator label (reference:
    // tests/helpers.sql:23-44, dbt unit-test fixture compare).
    Op("u1_union_all",
       """SELECT 'urgent' AS which, o_orderkey AS order_id FROM orders
         |WHERE o_orderpriority = '1-URGENT'
         |UNION ALL
         |SELECT 'open' AS which, o_orderkey AS order_id FROM orders
         |WHERE o_orderstatus = 'O'""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(lit("urgent").as("which"), col("o_orderkey").as("order_id"))
      val open = o.filter(col("o_orderstatus") === "O")
        .select(lit("open").as("which"), col("o_orderkey").as("order_id"))
      urgent.unionByName(open)
    },

    // J5: FULL OUTER equi-join — the reconciliation shape (which
    // customers have no orders, which orders have no surviving customer
    // row). Null-extended on BOTH sides; the aggregate-by-join-status
    // census makes the null extension itself the thing hash-compared.
    // Scale: both sides shuffle on the key (SortMergeJoin — full outer
    // can never broadcast its null-producing side); AQE sizes the
    // exchange.
    Op("j5_full_outer",
       """SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
         |            WHEN o_orderkey IS NULL THEN 'customer_only'
         |            ELSE 'matched' END AS side,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(count(o_orderkey) AS BIGINT) AS n_orders
         |FROM (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0) c
         |FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders
         |                 WHERE o_orderpriority = '1-URGENT') o
         |  ON o_custkey = c_custkey
         |GROUP BY 1""".stripMargin) { (s, d) =>
      // a third of the customers are withheld and the order side is cut
      // to urgent priority so ALL THREE join outcomes actually occur in
      // the output (the unrestricted join matches every row on this
      // data — a vacuous full-outer)
      val c = Tables.customer(s, d).select(col("c_custkey"))
        .filter(col("c_custkey") % 3 =!= 0)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      c.join(o, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          when(col("c_custkey").isNull, lit("order_only"))
            .when(col("o_orderkey").isNull, lit("customer_only"))
            .otherwise(lit("matched")).as("side"),
          col("o_orderkey"))
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n"), count(col("o_orderkey")).as("n_orders"))
    },

    // J6: LEFT SEMI join — "customers WITH at least one urgent order",
    // the EXISTS(correlated subquery) plan shape. Semi joins carry no
    // right-side columns, so the probe side never duplicates rows no
    // matter how many orders match — the property that distinguishes it
    // from an inner-join-then-distinct (which shuffles the multiplied
    // rows first). Spark prunes the right side to the join key.
    Op("j6_semi_join",
       """SELECT c_custkey, c_mktsegment
         |FROM customer c
         |WHERE EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_orderpriority = '1-URGENT')""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
    },

    // P6: scalar subquery — filter facts against a single-row aggregate
    // computed from the same table ("orders above the mean"). Spark
    // plans the scalar as its own tiny job whose result is injected as
    // a literal into the predicate (ReusedSubquery under AQE) — the
    // filter still pushes to the scan, which is what makes the shape
    // viable at 100 TB: one 1-row aggregate pass, one filtered pass,
    // never a join.
    Op("p6_scalar_subquery",
       """SELECT o_orderkey AS order_id, o_totalprice AS total
         |FROM orders
         |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)"""
         .stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val mean = o.agg(avg(col("o_totalprice")).as("m"))
      o.join(broadcast(mean)) // 1-row scalar attachment
        .filter(col("o_totalprice") > lit(1.5) * col("m"))
        .select(col("o_orderkey").as("order_id"),
          col("o_totalprice").as("total"))
    },

    // U2: UNPIVOT (wide -> long) — the inverse of f_pivot: per-flag
    // lineitem aggregates melt into (flag, measure, value) rows. Spark's
    // unpivot/melt is a map-side transform (each input row emits its
    // measure rows locally, no shuffle beyond the feeding aggregate);
    // the oracle states the same thing as a stacked UNION ALL.
    Op("u2_unpivot",
       """WITH w AS (
         |  SELECT l_returnflag,
         |         CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
         |         CAST(count(*) AS DOUBLE) AS n_rows,
         |         CAST(max(l_extendedprice) AS DOUBLE) AS max_price
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
         |UNION ALL
         |SELECT l_returnflag, 'n_rows', n_rows FROM w
         |UNION ALL
         |SELECT l_returnflag, 'max_price', max_price FROM w""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
            count(lit(1)).cast("double").as("n_rows"),
            max(col("l_extendedprice")).cast("double").as("max_price"))
          .unpivot(Array(col("l_returnflag")),
            Array(col("sum_qty"), col("n_rows"), col("max_price")),
            "measure", "value")
    },

    // Skew-salted dimension join, driver-checked: Skew.saltedJoin
    // spreads each fact row over `buckets` shuffle partitions by a
    // deterministic row-identity salt and replicates the dim side
    // `buckets` times, so one hot supplier key can never pin a single
    // reducer — the manual fallback when AQE skew splitting can't reach
    // the join (cached/streamed subtrees, non-sort-merge joins). The
    // oracle is the PLAIN join: hash equality proves the salting is
    // row-invisible (SkewSpec additionally shows the salt spreading).
    Op("j4_skew_salted_join",
       """SELECT l_orderkey, l_linenumber, l_suppkey,
         |       s_name, s_acctbal
         |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey""".stripMargin) {
      (s, d) =>
        val fact = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
        val dim = Tables.supplier(s, d)
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"),
            col("s_acctbal"))
        Skew.saltedJoin(fact, dim, "l_suppkey", buckets = 8,
          saltBy = Seq("l_orderkey", "l_linenumber"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            col("s_name"), col("s_acctbal"))
    },

    // Incremental view maintenance for distributive aggregates: a stored
    // partial-state table (sum/count per key) absorbs a new batch by
    // unioning the batch's OWN partial states and re-summing — history is
    // never rescanned, which is the whole point at 100 TB (the nightly
    // delta is GB-scale; the stored aggregate is key-cardinality-scale).
    // Partial sums stay DECIMAL until the output cast, so merge order
    // can't perturb money math, and avg is DERIVED from (sum, count) —
    // averages are not mergeable, their sufficient statistics are. The
    // oracle is the full one-shot aggregate over everything: hash
    // equality PROVES merge(old-partials, delta-partials) == re-agg.
    Op("ivm_merge_agg",
       """SELECT o_orderpriority,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS total_price,
         |       count(*) AS n_orders,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         / count(*) AS avg_price
         |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_orderpriority"))
          .agg(sum(col("o_totalprice").cast(dec)).as("ps"),
            count(lit(1)).as("pc"))
      // "yesterday's" materialized state and "today's" batch
      val stored = partial(orders.filter(col("o_orderkey") % 3 =!= 0))
      val delta = partial(orders.filter(col("o_orderkey") % 3 === 0))
      mergeAggregate(stored, delta, Seq("o_orderpriority"))
        .select(col("o_orderpriority"),
          col("ps").cast("double").as("total_price"),
          col("pc").as("n_orders"),
          (col("ps").cast("double") / col("pc")).as("avg_price"))
    },

    // Incremental view maintenance for a per-group TOP-K: unlike sums,
    // a top-k of per-row values is a mergeable monoid — the k largest
    // of (k-largest(stored) ∪ k-largest(delta)) equal the k largest of
    // everything, because any row outside a side's own top-k is
    // dominated by k rows on that same side. (A top-k BY AGGREGATED
    // measure is deliberately NOT offered this way: a key outside the
    // stored top-k can rise into it on new data, so its sufficient
    // state is the full keyed aggregate, i.e. ivm_merge_agg feeding a
    // rank.) The nightly merge re-ranks <= 2k rows per group — state is
    // k rows per group forever, history never rescanned. Hash equality
    // with the one-shot oracle PROVES merge == re-rank, same contract
    // as ivm_merge_agg/ivm_merge_distinct. Full tiebreak on
    // (price DESC, orderkey, linenumber) keeps the cut deterministic.
    // Incremental view maintenance for per-group MIN/MAX (insert-only):
    // min and max are mergeable monoids, so "yesterday's" stored
    // extremes absorb today's batch by one keyed least/greatest merge —
    // state is two values per group forever, history never rescanned.
    // (Deletes are deliberately NOT offered this way: removing the
    // current extreme needs the full value multiset — that regime is
    // cdc_table_diff feeding a recompute.) Hash equality with the
    // one-shot oracle proves merge == re-aggregate, the
    // ivm_merge_agg/distinct/topk contract extended to the ordered
    // monoids. Money stays decimal through the merge; doubles only at
    // presentation.
    Op("ivm_merge_minmax",
       """SELECT o_orderpriority,
         |       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS min_price,
         |       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS max_price,
         |       count(*) AS n_orders
         |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_orderpriority"))
          .agg(min(col("o_totalprice").cast(dec)).as("mn"),
            max(col("o_totalprice").cast(dec)).as("mx"),
            count(lit(1)).as("pc"))
      val stored = partial(orders.filter(col("o_orderkey") % 3 =!= 0))
      val delta = partial(orders.filter(col("o_orderkey") % 3 === 0))
      stored.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"),
          sum(col("pc")).as("pc"))
        .select(col("o_orderpriority"),
          col("mn").cast("double").as("min_price"),
          col("mx").cast("double").as("max_price"),
          col("pc").as("n_orders"))
    },

    Op("ivm_merge_topk",
       """SELECT l_returnflag, rk, l_orderkey, l_linenumber,
         |       l_extendedprice AS price
         |FROM (
         |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         |         CAST(row_number() OVER (PARTITION BY l_returnflag
         |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
         |           AS INTEGER) AS rk
         |  FROM lineitem) WHERE rk <= 10""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      def topk(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
          .drop("rk")
      // "yesterday's" materialized top-k state and "today's" batch
      val stored = topk(li.filter(col("l_orderkey") % 3 =!= 0))
      val delta = topk(li.filter(col("l_orderkey") % 3 === 0))
      stored.unionByName(delta)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("l_returnflag"), col("rk"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("price"))
    },

    // Incremental view maintenance for a JOIN view — the delta-join
    // algebra (Blakeley, Larson & Tompa 1986 "Efficiently updating
    // materialized views"): with insert batches ΔA and ΔB on V = A ⋈ B,
    //   ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    // and every joined pair lands in EXACTLY one of the four terms
    // (old×old = the stored view, plus the three delta terms), so
    // V_new is a pure UNION ALL — no dedup pass. Hash equality with the
    // one-shot full join PROVES the partition is exact, the same
    // contract as ivm_merge_agg/topk.
    //
    // Scale shape: the nightly cost is the three delta terms; ΔA ⋈ ΔB
    // is delta-sized, and the two delta×history joins are what
    // bucketing the STORED tables on the join key exists for — with A
    // and B bucketed on orderkey (olist/Catalog's bucketed warehouse),
    // each is a co-located map-side join of a GB-scale delta against
    // pruned history buckets; history is never re-joined against itself.
    Op("ivm_merge_join",
       """SELECT o_orderkey, l_linenumber, o_custkey, l_suppkey,
         |       l_extendedprice AS price
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin) {
      (s, d) =>
        val a = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val b = Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_linenumber"), col("l_suppkey"), col("l_extendedprice"))
        // "yesterday's" tables and today's insert batches, split on
        // independent predicates so all three delta terms are non-empty
        val aOld = a.filter(col("o_orderkey") % 4 =!= 0)
        val aNew = a.filter(col("o_orderkey") % 4 === 0)
        val bOld = b.filter(col("l_suppkey") % 5 =!= 0)
        val bNew = b.filter(col("l_suppkey") % 5 === 0)
        def j(x: org.apache.spark.sql.DataFrame,
              y: org.apache.spark.sql.DataFrame) =
          x.join(y, x("o_orderkey") === y("l_orderkey"))
            .select(col("o_orderkey"), col("l_linenumber"),
              col("o_custkey"), col("l_suppkey"),
              col("l_extendedprice").as("price"))
        j(aOld, bOld) // the stored view
          .unionByName(j(aNew, bOld)) // ΔA ⋈ B_old
          .unionByName(j(aOld, bNew)) // A_old ⋈ ΔB
          .unionByName(j(aNew, bNew)) // ΔA ⋈ ΔB
    }
  )

  /** Merge partial-aggregate states: union the stored states with the
    * delta's states and re-sum every non-key column. All state columns
    * must be DISTRIBUTIVE partials (sums, counts; min/max would merge
    * with min/max — extend per column as needed). Associative and
    * commutative across any batch arrival order.
    */
  def mergeAggregate(stored: org.apache.spark.sql.DataFrame,
                     delta: org.apache.spark.sql.DataFrame,
                     keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val stateCols = stored.columns.filterNot(keys.contains)
    require(stateCols.nonEmpty, "no state columns to merge")
    stored.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(stateCols.head)).as(stateCols.head),
        stateCols.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
