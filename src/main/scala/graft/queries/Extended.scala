package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Engine.table
import graft.mr.MapReduce
import graft.ops.TemporalJoins

/** Extended operator coverage: temporal/non-equi joins, set operations,
  * grouping sets, and the MR-expressed reduce-side join (the tag-and-union
  * idiom SURVEY §2.6 names as the reference's only join shape).
  */
object Extended {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Referential-integrity audit: orphan counts per FK edge, with
    // planted violations in disjoint negative key spaces (every 50th
    // order re-keyed to a phantom customer; every 100th order's
    // lineitems re-keyed to a phantom order AND part). The supplier
    // edge stays clean by construction — a healthy edge must read 0.
    "q47_fk_orphans" -> ((s, dir) => {
      val orders = table(s, dir, "orders")
      val li = table(s, dir, "lineitem")
      val ordersP = orders.unionAll(
        orders.filter(pmod(col("o_orderkey"), lit(50)) === 0)
          .withColumn("o_orderkey", -col("o_orderkey") - 1)
          .withColumn("o_custkey", -col("o_custkey") - 1))
      val liP = li.unionAll(
        li.filter(pmod(col("l_orderkey"), lit(100)) === 0)
          .withColumn("l_orderkey", -col("l_orderkey") - 1)
          .withColumn("l_partkey", -col("l_partkey") - 1))
      graft.ops.Audit.fkOrphans(Seq(
        ("orders.o_custkey->customer", ordersP, "o_custkey",
          table(s, dir, "customer"), "c_custkey"),
        ("lineitem.l_orderkey->orders", liP, "l_orderkey",
          orders, "o_orderkey"),
        ("lineitem.l_partkey->part", liP, "l_partkey",
          table(s, dir, "part"), "p_partkey"),
        ("lineitem.l_suppkey->supplier", liP, "l_suppkey",
          table(s, dir, "supplier"), "s_suppkey")))
    }),
    // AS-OF join: each purchase matched to the user's most recent view at
    // or before the purchase time. Union + window, not a range-join
    // blowup — see TemporalJoins.asofJoin. Production runs the skew-
    // hardened per-(user, day) window variant: a single celebrity user at
    // 100× must spread across day buckets instead of serializing into one
    // task (TemporalJoinsSpec proves output identity with the plain path).
    "q13_asof_view_purchase" -> ((s, dir) => {
      val e = table(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("value"))
      TemporalJoins.asofJoin(purchases, views, "user_id", "ts", "ts",
        rightCols = Seq("value"), skewBucket = Some("day"))
    }),

    // Banded range join: lineitems priced within a multiplicative band of
    // each part's retail price — non-equi predicate rewritten to an
    // equi-join on integer bands (vs Catalyst's BroadcastNestedLoop).
    "q14_price_band_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_extendedprice"), col("l_quantity"))
      val p = table(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"))
      TemporalJoins.bandedRangeJoin(
        li, p, col("l_extendedprice"),
        col("p_retailprice") * 30, col("p_retailprice") * 30 + 60.0,
        // candidate checks per probe row scale with |parts|·(span+W)/domain:
        // W=20 ≈ half the comparisons of the former W=100 at a 60-unit
        // span (explode fan-out grows only to span/W+1 = 4 rows/part)
        bandWidth = 20.0)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_items"),
          // DECIMAL-exact sum, DOUBLE carrier for oracle hash parity
          dec38(sum(dec(col("l_quantity")))).cast("double").as("sum_qty"))
    }),

    // Set operations (reference has only implicit union via result
    // flattening, SURVEY §2.6): big-spender ∩ rich ∪ (all ∖ big-spender).
    "q15_setops" -> ((s, dir) => {
      val bigSpenders = table(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("k"))
      val rich = table(s, dir, "customer")
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("k"))
      val all = table(s, dir, "customer").select(col("c_custkey").as("k"))
      bigSpenders.intersect(rich)
        .unionAll(all.except(bigSpenders))
    }),

    // Grouping sets / rollup with GROUPING disambiguation (reference has
    // no grouping-set concept, SURVEY §2.6).
    "q16_rollup_revenue" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(
          grouping(col("n_name")).cast("long").as("g_nation"),
          grouping(col("c_mktsegment")).cast("long").as("g_segment"),
          count(lit(1)).as("n_customers"),
          dec38(sum(dec(col("c_acctbal")))).cast("double").as("sum_acctbal"))
        .select(col("n_name"), col("c_mktsegment"), col("g_nation"),
          col("g_segment"), col("n_customers"), col("sum_acctbal"))
    }),

    // CUBE grouping — q16's ROLLUP sibling completing the grouping-sets
    // family: all four (status, priority) marginal combinations in one
    // Expand-based pass (2^k replicated groups, one shuffle — never k
    // separate aggregations unioned).
    "q39_cube_orders" -> ((s, dir) =>
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"),
          count(lit(1)).as("n_orders"),
          dec38(sum(dec(col("o_totalprice")))).cast("double").as("sum_price"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("g_status"), col("g_priority"),
          col("n_orders"), col("sum_price"))),

    // Quartile bucketing via ntile — the distribution summary (per
    // event type, each value quartile's bounds and mass) that drives
    // outlier caps and binned features; completes the ranking-window
    // family (row_number q08, rank/dense_rank q08, ntile here).
    // Deterministic: the (value, event_id) order is total, and ntile's
    // larger-first-bucket remainder rule is shared SQL semantics.
    "q41_value_quartiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      table(s, dir, "events")
        .withColumn("q", ntile(4).over(w))
        .groupBy(col("event_type"), col("q"))
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("lo"),
          max(col("value")).as("hi"))
    }),

    // Explicit GROUPING SETS — the third grouping-sets member next to
    // ROLLUP (q16) and CUBE (q39): a hand-picked set list ((status),
    // (priority), ()) that neither shorthand expresses, written through
    // the spark.sql surface (registerAll makes every table a temp view,
    // so the SQL entry point is first-class too). Same one-Expand-pass
    // physical shape.
    "q40_grouping_sets" -> ((s, dir) => {
      graft.Engine.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
             count(1) AS n_orders
           FROM orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    }),

    // Reduce-side equi-join expressed through the MR-parity layer — the
    // tag-and-union idiom, the ONLY join shape the reference can run
    // (inside user closures; SURVEY §2.6). Deliberately the typed
    // mapGroups path: q06 is the declarative fast path.
    "q17_mr_join" -> ((s, dir) => {
      import s.implicits._
      val orders = table(s, dir, "orders")
        .select(col("o_custkey").cast("long"), col("o_totalprice"))
        .as[(Long, Double)]
        .map { case (k, price) => (k, ("O", "", price)) }
      val cust = table(s, dir, "customer")
        .select(col("c_custkey").cast("long"), col("c_name"))
        .as[(Long, String)]
        .map { case (k, name) => (k, ("C", name, 0.0)) }
      MapReduce.exec(orders.unionAll(cust)) { r => Iterator.single(r) } {
        (k, it) =>
          // single streaming pass: never materializes the value bag.
          // sawCustomer is tracked separately from the name value: a
          // customer with NULL c_name must survive (LEFT JOIN semantics),
          // only order-groups with no customer row at all are dropped.
          var name: String = null
          var sawCustomer = false
          var cnt = 0L
          var maxP: Option[Double] = None
          it.foreach {
            case ("C", n, _) => name = n; sawCustomer = true
            case (_, _, p) =>
              cnt += 1
              if (maxP.forall(_ < p)) maxP = Some(p)
          }
          (k, name, cnt, maxP, sawCustomer)
      }.filter(_._5)
        .map { case (k, n, c, m, _) => (k, n, c, m) }
        .toDF("c_custkey", "c_name", "n_orders", "max_price")
    }),

    // Sketch aggregates under a machine-checkable contract. The sketch
    // internals (HLL++/KLL) are engine-specific so the ESTIMATE can never
    // hash-match an external oracle — instead each query emits the exact
    // value plus a deterministic `within_bounds` verdict comparing the
    // internal estimate against the sketch's published error bound; the
    // oracle recomputes the exact columns and asserts TRUE. A sketch
    // regression flips the verdict and fails the driver hash.
    // HLL++ distinct: constant memory per group at any cardinality — the
    // 100 TB answer where exact countDistinct shuffles every key. Bound:
    // 3× the configured rsd (0.02 → 6%), same bar SketchSpec pins.
    "q18_sketch_distinct" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.02).as("__est"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__est").cast("double") /
            col("exact_users").cast("double") - 1.0) <= 0.06)
            .as("within_bounds"))),

    // KLL quantile sketch, rank-verified: exact discrete quantiles
    // (integer-arithmetic rank rule, bit-portable) + a verdict that the
    // sketch estimate's rank honors its n/accuracy guarantee. See
    // Sketches.verifiedQuantiles for the contract.
    "q19_sketch_quantiles" -> ((s, dir) =>
      graft.ops.Sketches.verifiedQuantiles(
        table(s, dir, "events"), valueCol = "value",
        groupCol = "event_type", accuracy = 10000)),

    // KMV distinct sketch: k-minimum-values over 52-bit md5 hashes — a
    // sketch whose every step is portable IEEE/integer arithmetic, so
    // unlike q18's HLL++ the ESTIMATE itself hash-matches the oracle.
    "q26_kmv_distinct" -> ((s, dir) =>
      graft.ops.Sketches.kmvDistinct(
        table(s, dir, "events"), keyCol = "user_id",
        groupCol = "event_type", k = 64)),

    // Sampled exact quantiles: q19's oracle-able counterpart — the
    // estimate's only error source is the deterministic md5-bucket
    // sample; the rank-based pick is bit-portable, so the oracle is a
    // full equality check.
    "q27_sampled_quantiles" -> ((s, dir) =>
      graft.ops.Sketches.sampledQuantiles(
        table(s, dir, "events"), valueCol = "value",
        keyCol = "event_id", groupCol = "event_type")),

    // Exact heavy hitters in two bounded-memory passes (Misra–Gries
    // candidates + exact recount): the hot-key detector — at billion-key
    // cardinality the shuffle carries only candidates, never the key
    // universe. Support 1/1500 of lineitem rows.
    "q28_heavy_hitters" -> ((s, dir) =>
      graft.ops.Sketches.exactHeavyHitters(
        table(s, dir, "lineitem"), keyCol = "l_partkey",
        supportDen = 1500)),

    // Bloom-pruned fact⋈dim join: urgent-order revenue by return flag.
    // The lineitem side is filtered by a bloom of the urgent orderkeys
    // BEFORE its shuffle (false positives re-verified by the join, so
    // the result is exactly the plain join — the oracle IS the plain
    // join). ~2^16-key filter ≈ 77 KB; prune kills ~80% of fact rows
    // pre-exchange at any scale.
    "q29_bloom_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val urgent = table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      graft.ops.BloomPrune.bloomPrunedJoin(
        li, urgent, probeKey = "l_orderkey", buildKey = "o_orderkey",
        expectedKeys = 1L << 16)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_items"),
          dec38(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 6)) - dec(col("l_discount")))))
            .cast("double").as("revenue"))
    }),

    // Time-series resample with gap fill: hourly event counts per type
    // over the corpus's FULL hour range, absent hours materialized as 0
    // (sequence+explode generates the dense grid; the grid is
    // types×hours — tiny next to the event stream — and joins the
    // partially-aggregated counts, so the event table pays only its
    // one aggregation shuffle).
    "q31_gap_fill" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      val counts = e.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n_events"))
      val range = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val grid = e.select(col("event_type")).distinct()
        .crossJoin(broadcast(range))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
            .as("h"))
      grid.join(counts, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
    }),

    // RANGE-frame rolling aggregate: per-user trailing-1-hour event
    // count/sum at every event — a VALUE-bounded frame (peers by
    // second), the semantics q25's ROWS frame cannot express. Seconds
    // come from integer floor-division of the timestamp on both engines
    // (epoch_ns // 1e9 in the oracle), never a float epoch.
    "q32_rolling_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-3599, 0)
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("sec"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          dec38(sum(dec(col("value"))).over(w)).cast("double"))
        .select(col("user_id"), col("event_id"), col("sec"),
          col("n_1h"), col("sum_1h"))
    }),

    // Conversion funnel over events: users progressing signup → view →
    // click → purchase under earliest-chain semantics. ONE shuffle via
    // the typed MR layer, where the SQL formulation needs four (see
    // ops.Funnel).
    "q34_funnel" -> ((s, dir) =>
      graft.ops.Funnel.funnelStages(
        table(s, dir, "events"),
        Seq("signup", "view", "click", "purchase"))),

    // Single-pass column profile over events + a derived nullable field
    // (the JSON '$.k' extraction, so the null-count column has real
    // work): per-column rows / nulls / exact distincts — the ingest-QA
    // checksum. ts is excluded: Spark reads it at micros, DuckDB at
    // nanos, so its distinct count is not a portable quantity.
    "q33_profile" -> ((s, dir) =>
      graft.ops.Profile.profile(
        table(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long")),
        Seq("event_id", "user_id", "event_type", "value", "props", "k"))),

    // MERGEABLE stats catalog (the incremental-ANALYZE shape): rows land
    // in 8 md5 ingest shards, each shard computes rows/nulls/min/max/KMV
    // candidates independently, the global row is assembled from shard
    // summaries alone — the q33 profile re-expressed so a 100 TB catalog
    // refresh after one new shard re-reads one shard. KMV merge is exact
    // set algebra, so the result is bucket-count-invariant (ProfileSpec
    // pins merge == direct).
    "q46_mergeable_stats" -> ((s, dir) =>
      graft.ops.Profile.mergeableStats(
        table(s, dir, "events"), bucketKeyCol = "event_id",
        columns = Seq("event_id", "user_id", "event_type"))),

    // Pivot (long→wide): order counts per customer segment × priority.
    // Explicit pivot values keep the plan a single pass (no distinct-scan
    // to discover columns) — required at scale anyway.
    "q20_pivot_priority" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("c_mktsegment"),
          // empty cells: Spark pivot yields null, SQL FILTER yields 0
          coalesce(col("1-URGENT"), lit(0L)).as("n_urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("n_high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("n_medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("n_notspec"),
          coalesce(col("5-LOW"), lit(0L)).as("n_low"))
    }),

    // Deterministic train/val/test split by content hash — stable under
    // repartitioning/appends/re-runs, unlike randomSplit.
    "q21_train_val_split" -> ((s, dir) =>
      graft.ops.Sampling.split(table(s, dir, "documents"), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"))),

    // Stratified deterministic sample: same rate per language stratum.
    "q22_stratified_sample" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedSample(
        table(s, dir, "documents").select(col("doc_id"), col("lang")),
        stratumCol = "lang", keyCol = "doc_id", num = 1, den = 10)),

    // FULL OUTER join — the one join type the q06/q11/q17 family does
    // not exercise: big-spender order counts ⟗ rich customers, where
    // BOTH sides contribute unmatched rows (flags are null-safe counts).
    "q24_full_outer" -> ((s, dir) => {
      val big = table(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_big_orders"))
      val rich = table(s, dir, "customer")
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      big.join(rich, Seq("k"), "full_outer")
        .select(col("k"), col("n_big_orders"), col("c_acctbal"))
    }),

    // Explicit-frame running aggregate: per-customer cumulative spend in
    // (date, key) order, rows UNBOUNDED PRECEDING..CURRENT. The running
    // sum accumulates DECIMAL in a deterministic order, so even the
    // double carrier is bit-identical across engines.
    "q25_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dec38(sum(dec(col("o_totalprice"))).over(w))
            .cast("double").as("running_spend"))
    }),

    // Batch sessionization: gap-based (30 min) session episodes per user
    // — the behavioral-data grouping step before sequence packing. All
    // arithmetic integer epoch seconds (the q32 contract); see
    // ops/Sessions.scala for the window shape and skew notes.
    "q42_sessionize" -> ((s, dir) =>
      graft.ops.Sessions.sessionize(
        table(s, dir, "events"), keyCol = "user_id", tsCol = "ts",
        tieCol = "event_id", gapSeconds = 1800L)),

    // Correlated scalar subqueries through the SQL surface — the shape
    // Catalyst DECORRELATES into aggregate + join (no per-row re-scan
    // ever executes; the q40 spark.sql + temp-view precedent). The
    // above-average test is expressed as price·n > sum over
    // DECIMAL-exact terms, so both engines compare identical exact
    // values (a decimal avg would round differently per engine).
    "q45_above_customer_avg" -> ((s, dir) => {
      graft.Engine.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders o
           WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
               (SELECT count(*) FROM orders i
                WHERE i.o_custkey = o.o_custkey)
             > (SELECT sum(CAST(i.o_totalprice AS DECIMAL(18,6)))
                FROM orders i WHERE i.o_custkey = o.o_custkey)""")
    }),

    // Per-type winsorization of the event metric to its discrete
    // [p1, p99] bounds — outlier taming for training signals; bounds are
    // actual data values under the integer rank rule, so the clip is
    // bit-portable (Sketches.winsorize).
    "q44_winsorize" -> ((s, dir) =>
      graft.ops.Sketches.winsorize(
        table(s, dir, "events"), valueCol = "value",
        groupCol = "event_type", idCol = "event_id")),

    // Semi-structured extraction: JSON path into a string column
    // (schema-on-read), then relational aggregation over the extracted
    // field — the log-analytics shape. All aggregates integer-exact
    // (count/min/max/sum over BIGINT), so parity is exact.
    "q23_json_extract" -> ((s, dir) =>
      table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"))),
  )

  /** One q46 branch per profiled column: global rows/nulls/min/max plus
    * the q26 KMV estimator over the column's distinct 52-bit md5 hashes.
    */
  private def q46OracleSql: String = {
    def branch(c: String) =
      s"""SELECT '$c' AS col_name, a.n_rows, a.n_nulls,
            round(CASE WHEN b.nc >= 64
              THEN 63.0 / ((CAST(b.hk AS DOUBLE) + 1.0) / 4503599627370496.0)
              ELSE CAST(b.nc AS DOUBLE) END, 6) AS ndv_est,
            a.min_val, a.max_val
          FROM (
            SELECT count(*) AS n_rows,
              CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
              CAST(min($c) AS VARCHAR) AS min_val,
              CAST(max($c) AS VARCHAR) AS max_val
            FROM events) a
          CROSS JOIN (
            SELECT count(*) AS nc, max(CASE WHEN rn = 64 THEN h END) AS hk
            FROM (
              SELECT h, row_number() OVER (ORDER BY h ASC) AS rn
              FROM (
                SELECT DISTINCT CAST(concat('0x',
                  substring(md5(CAST($c AS VARCHAR)), 1, 13)) AS BIGINT) AS h
                FROM events WHERE $c IS NOT NULL))) b"""
    Seq("event_id", "user_id", "event_type")
      .map(branch).mkString("\n UNION ALL \n")
  }


  val oracles: Map[String, String] = Map(
    // Mirrors q47: same planted phantom keys, one LEFT JOIN per edge,
    // orphan = NULL parent key. Sums CAST to BIGINT (the p08 lesson).
    "q47_fk_orphans" ->
      """WITH op AS (
           SELECT o_orderkey, o_custkey FROM orders
           UNION ALL SELECT -o_orderkey - 1, -o_custkey - 1 FROM orders
           WHERE o_orderkey % 50 = 0),
         lp AS (
           SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
           UNION ALL SELECT -l_orderkey - 1, -l_partkey - 1, l_suppkey
           FROM lineitem WHERE l_orderkey % 100 = 0)
         SELECT 'orders.o_custkey->customer' AS edge,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         FROM op LEFT JOIN customer c ON op.o_custkey = c.c_custkey
         UNION ALL
         SELECT 'lineitem.l_orderkey->orders',
           count(*),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         FROM lp LEFT JOIN orders o ON lp.l_orderkey = o.o_orderkey
         UNION ALL
         SELECT 'lineitem.l_partkey->part',
           count(*),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         FROM lp LEFT JOIN part p ON lp.l_partkey = p.p_partkey
         UNION ALL
         SELECT 'lineitem.l_suppkey->supplier',
           count(*),
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         FROM lp LEFT JOIN supplier s ON lp.l_suppkey = s.s_suppkey""",
    // The identical correlated-subquery SQL: both engines evaluate the
    // same DECIMAL-exact price·n > sum predicate, so the row sets match
    // regardless of how each engine decorrelates.
    "q45_above_customer_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
             (SELECT count(*) FROM orders i
              WHERE i.o_custkey = o.o_custkey)
           > (SELECT sum(CAST(i.o_totalprice AS DECIMAL(18,6)))
              FROM orders i WHERE i.o_custkey = o.o_custkey)""",

    // Replays winsorize: identical rank rule for the bounds, identical
    // CASE clip over the same data values.
    "q44_winsorize" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events
              WHERE value IS NOT NULL),
          s AS (SELECT *,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY value) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n FROM e),
          b AS (SELECT event_type,
                  max(CASE WHEN rn = 1 + ((n-1)*1)//100 THEN value END) AS lo,
                  max(CASE WHEN rn = 1 + ((n-1)*99)//100 THEN value END) AS hi
                FROM s GROUP BY event_type)
          SELECT e.event_id, e.event_type, e.value,
            CASE WHEN e.value < b.lo THEN b.lo
                 WHEN e.value > b.hi THEN b.hi
                 ELSE e.value END AS clipped_value,
            (e.value < b.lo OR e.value > b.hi) AS was_clipped
          FROM e JOIN b USING (event_type)""",

    "q42_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
              epoch_us(ts) // 1000000 AS es FROM events),
          l AS (SELECT user_id, event_id, es,
                  lag(es) OVER (PARTITION BY user_id
                    ORDER BY es, event_id) AS prev FROM e),
          s AS (SELECT user_id, event_id, es,
                  CASE WHEN prev IS NULL OR es - prev > 1800
                    THEN 1 ELSE 0 END AS brk FROM l),
          g AS (SELECT user_id, es,
                  CAST(sum(brk) OVER (PARTITION BY user_id
                    ORDER BY es, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM s)
          SELECT user_id, session_id, count(*) AS n_events,
            min(es) AS t_start_s, max(es) AS t_end_s,
            max(es) - min(es) AS duration_s
          FROM g GROUP BY user_id, session_id""",

    // Sketch-contract oracles: the oracle recomputes the EXACT columns
    // and asserts the verdict literally — if Spark's sketch ever breaks
    // its bound, its within_bounds flips to false and the hash fails.
    "q18_sketch_distinct" ->
      """SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bounds
         FROM events GROUP BY event_type""",
    // Discrete quantiles by the same integer rank rule as
    // Sketches.verifiedQuantiles: rank_p = 1 + ((n-1)*p) // 100. Ties
    // share the value, so the pick is order-independent.
    "q19_sketch_quantiles" ->
      """WITH s AS (SELECT event_type, value,
              row_number() OVER (PARTITION BY event_type ORDER BY value)
                AS rn,
              count(*) OVER (PARTITION BY event_type) AS n
            FROM events WHERE value IS NOT NULL)
         SELECT event_type,
           max(CASE WHEN rn = 1 + ((n-1)*50)//100 THEN value END) AS q50,
           max(CASE WHEN rn = 1 + ((n-1)*95)//100 THEN value END) AS q95,
           max(CASE WHEN rn = 1 + ((n-1)*99)//100 THEN value END) AS q99,
           TRUE AS within_bounds
         FROM s GROUP BY event_type""",
    // Chained-min funnel replayed as staged CTEs: tₖ₊₁ = min ts ≥ tₖ of
    // the next stage's type. events carry no sub-microsecond components
    // and no cross-type (user, ts) collisions, so the chain is engine-
    // portable despite Spark reading micros where DuckDB reads nanos.
    "q34_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                 JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
                 WHERE e.event_type = 'view' GROUP BY 1),
          s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                 JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
                 WHERE e.event_type = 'click' GROUP BY 1),
          s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                 JOIN s3 ON e.user_id = s3.user_id AND e.ts >= s3.t
                 WHERE e.event_type = 'purchase' GROUP BY 1)
          SELECT 1 AS stage, 'signup' AS stage_name, count(*) AS n_users FROM s1
          UNION ALL
          SELECT 2, 'view', count(*) FROM s2
          UNION ALL
          SELECT 3, 'click', count(*) FROM s3
          UNION ALL
          SELECT 4, 'purchase', count(*) FROM s4""",
    // Mirrors q46 directly at the GLOBAL level: the KMV merge is exact
    // (union's k smallest == global k smallest), so the oracle need not
    // replay the sharding — it computes each column's stats and KMV
    // estimate straight off the table with q26's hash/estimator idiom.
    "q46_mergeable_stats" -> q46OracleSql,
    // One UNION branch per profiled column; count(DISTINCT) skips nulls
    // on both engines, and the derived k mirrors q23's extraction.
    "q33_profile" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, props,
                      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                    FROM events)
         SELECT 'event_id' AS col_name, count(*) AS n_rows,
           CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
           count(DISTINCT event_id) AS n_distinct FROM e
         UNION ALL
         SELECT 'user_id', count(*),
           CAST(count(*) - count(user_id) AS BIGINT),
           count(DISTINCT user_id) FROM e
         UNION ALL
         SELECT 'event_type', count(*),
           CAST(count(*) - count(event_type) AS BIGINT),
           count(DISTINCT event_type) FROM e
         UNION ALL
         SELECT 'value', count(*),
           CAST(count(*) - count(value) AS BIGINT),
           count(DISTINCT value) FROM e
         UNION ALL
         SELECT 'props', count(*),
           CAST(count(*) - count(props) AS BIGINT),
           count(DISTINCT props) FROM e
         UNION ALL
         SELECT 'k', count(*),
           CAST(count(*) - count(k) AS BIGINT),
           count(DISTINCT k) FROM e""",
    // RANGE frame over integer seconds; peers (same user, same second)
    // share one frame value on both engines. DECIMAL sum: rolling-frame
    // aggregation order is engine-internal, so only an order-invariant
    // accumulator can hash-match.
    "q32_rolling_range" ->
      """WITH e AS (SELECT user_id, event_id,
                      epoch_ns(ts) // 1000000000 AS sec, value
                    FROM events)
         SELECT user_id, event_id, sec,
           count(*) OVER w AS n_1h,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                AS DECIMAL(38,6)) AS DOUBLE) AS sum_1h
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY sec
                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""",
    "q31_gap_fill" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h
                    FROM events),
         c AS (SELECT event_type, h, count(*) AS n_events
               FROM e GROUP BY 1, 2),
         r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         g AS (SELECT t.event_type, gs.h
               FROM (SELECT DISTINCT event_type FROM e) t,
                    (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                     FROM r) gs)
         SELECT g.event_type, g.h,
           CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
         FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h""",
    // Mirrors Sketches.kmvDistinct step for step: same 13-hex/52-bit md5
    // hash (the q21/p02 md5-rank idiom), same (k-1)/u_k estimator with
    // identical operation order, same <k exact fallback.
    "q26_kmv_distinct" ->
      """WITH h AS (
           SELECT DISTINCT event_type,
             CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h
           FROM events),
         r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
               FROM h),
         a AS (SELECT event_type, max(rn) AS nd,
                 max(CASE WHEN rn = 64 THEN h END) AS hk
               FROM r GROUP BY event_type)
         SELECT event_type,
           round(CASE WHEN nd >= 64
                 THEN 63.0 / ((CAST(hk AS DOUBLE) + 1.0) / 4503599627370496.0)
                 ELSE CAST(nd AS DOUBLE) END, 6) AS est_user_id,
           least(nd, 64) AS n_kmv
         FROM a""",
    // Mirrors Sketches.sampledQuantiles: same md5-bucket sample rule
    // (q21's split idiom), same (value, key) total order, same
    // rn == ceil(p*n) rank pick.
    "q27_sampled_quantiles" ->
      """WITH s AS (
           SELECT event_type, value, event_id
           FROM events
           WHERE CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                 % 100 < 20),
         r AS (SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY value ASC, event_id ASC) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
               FROM s)
         SELECT event_type,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS q50,
           max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN value END) AS q95,
           max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS q99
         FROM r GROUP BY event_type""",
    // The two-pass MG result is EXACT (candidate superset + exact
    // recount), so the oracle is the naive full-aggregation answer.
    "q28_heavy_hitters" ->
      """WITH c AS (SELECT l_partkey, count(*) AS n
                    FROM lineitem GROUP BY 1)
         SELECT l_partkey, n FROM c
         WHERE n * 1500 >= (SELECT count(*) FROM lineitem)""",
    // Bloom false positives are eliminated by the exact join that
    // follows the prune, so the oracle is the plain join.
    "q29_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY l_returnflag""",
    "q13_asof_view_purchase" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
                    WHERE event_type = 'purchase'),
            v AS (SELECT user_id, ts, max(value) AS value FROM events
                  WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.ts, p.value,
                v.ts AS asof_ts, v.value AS asof_value
         FROM p ASOF JOIN v
           ON p.user_id = v.user_id AND p.ts >= v.ts""",
    "q14_price_band_join" ->
      """SELECT p_partkey, count(*) AS n_items,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty
         FROM part JOIN lineitem
           ON l_extendedprice >= p_retailprice * 30
          AND l_extendedprice <= p_retailprice * 30 + 60
         GROUP BY p_partkey""",
    "q15_setops" ->
      """(SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000.0
          INTERSECT
          SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0)
         UNION ALL
         (SELECT c_custkey AS k FROM customer
          EXCEPT
          SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000.0)""",
    "q16_rollup_revenue" ->
      """SELECT n_name, c_mktsegment,
           CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_segment,
           count(*) AS n_customers,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, c_mktsegment)""",
    "q41_value_quartiles" ->
      """WITH t AS (
           SELECT event_type, value,
             ntile(4) OVER (PARTITION BY event_type
               ORDER BY value ASC, event_id ASC) AS q
           FROM events)
         SELECT event_type, q, count(*) AS n_events,
           min(value) AS lo, max(value) AS hi
         FROM t GROUP BY 1, 2""",
    "q40_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "q39_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q17_mr_join" ->
      """SELECT c_custkey, c_name, count(o_custkey) AS n_orders,
                max(o_totalprice) AS max_price
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name""",
    "q20_pivot_priority" ->
      """SELECT c_mktsegment,
           count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
           count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
           count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
           count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
           count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q21_train_val_split" ->
      """WITH b AS (
           SELECT CAST(CAST(concat('0x',
                    substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 100 AS INT) AS bucket
           FROM documents)
         SELECT CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val'
                     ELSE 'test' END AS split,
                count(*) AS n_docs
         FROM b GROUP BY 1""",
    "q22_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         WHERE (rn - 1) * 10 < n * 1""",
    "q24_full_outer" ->
      """WITH big AS (SELECT o_custkey AS k, count(*) AS n_big_orders
                      FROM orders WHERE o_totalprice > 300000.0 GROUP BY 1),
            rich AS (SELECT c_custkey AS k, c_acctbal
                     FROM customer WHERE c_acctbal > 5000.0)
         SELECT coalesce(big.k, rich.k) AS k, big.n_big_orders, rich.c_acctbal
         FROM big FULL OUTER JOIN rich ON big.k = rich.k""",
    "q25_running_total" ->
      """SELECT o_custkey, o_orderkey,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,6)) AS DOUBLE) AS running_spend
         FROM orders""",
    "q23_json_extract" ->
      """WITH e AS (SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events)
         SELECT event_type, count(*) AS n_events, count(k) AS n_with_k,
                min(k) AS min_k, max(k) AS max_k,
                CAST(sum(k) AS BIGINT) AS sum_k
         FROM e GROUP BY event_type""",
  )
}
