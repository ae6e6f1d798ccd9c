package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Engine.table

/** Business/event analytics queries: cohort retention, funnels-adjacent
  * conversion/latency readouts, RFM, market-basket, concentration
  * indices (Gini/HHI), share-of-parent, YoY growth, streaks, stickiness
  * and session-derived rates. Split out of Extended.scala (r8);
  * registry keys and plans unchanged.
  */
object AnalyticsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Market-basket co-occurrence (support / confidence / lift) over the
    // distinct (order, part) bipartite set — the association-rule readout.
    // Pair generation is a per-order self-join (bounded by max basket
    // size, ~7 items in this schema — NEVER corpus-quadratic), then one
    // partially-aggregated groupBy per pair; part frequencies ride a
    // key-join and the single corpus scalar (order count) rides a 1-row
    // broadcast (the t16 discipline, NLJ-allowlisted). All ratios are
    // integer-count divisions in an identical IEEE chain, round-6.
    "q54_market_basket" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val n = lp.select(countDistinct(col("l_orderkey")).as("__n"))
      val freq = lp.groupBy(col("l_partkey")).agg(count(lit(1)).as("__c"))
      val pairs = lp.as("a").join(lp.as("b"), "l_orderkey")
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .groupBy("part_a", "part_b").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 2)
      pairs
        .join(freq.select(col("l_partkey").as("part_a"),
          col("__c").as("c_a")), "part_a")
        .join(freq.select(col("l_partkey").as("part_b"),
          col("__c").as("c_b")), "part_b")
        .crossJoin(broadcast(n))
        .select(col("part_a"), col("part_b"), col("c_ab"), col("c_a"),
          col("c_b"),
          round(col("c_ab").cast("double") / col("__n").cast("double"), 6)
            .as("support"),
          round(col("c_ab").cast("double") / col("c_a").cast("double"), 6)
            .as("confidence"),
          round((col("c_ab") * col("__n")).cast("double") /
            (col("c_a") * col("c_b")).cast("double"), 6).as("lift"))
    }),

    // Daily peak concurrency by sweep line: each event opens a 600 s
    // interval (clipped to its day), interval edges become ±1 deltas, and
    // the DAY-PARTITIONED running sum's maximum is the peak — the classic
    // max-overlap algorithm as one union + one partitioned window + two
    // key-grouped aggregations, all integer (epoch seconds), no global
    // sort at any scale. Tie order (ends before starts at the same
    // second) is pinned by the (t, delta) sort key; intra-tie row order
    // is free but every output quantity is tie-group-deterministic.
    "q55_peak_concurrency" -> ((s, dir) => {
      val iv = table(s, dir, "events")
        .select(unix_timestamp(col("ts")).as("__t"))
        .withColumn("__day", expr("__t div 86400"))
        .withColumn("__te",
          least(col("__t") + 600L, (col("__day") + 1L) * 86400L))
      val sweep = iv.select(col("__day"), col("__t").as("__e"),
          lit(1).as("__d"))
        .unionAll(iv.select(col("__day"), col("__te").as("__e"),
          lit(-1).as("__d")))
      val w = Window.partitionBy(col("__day"))
        .orderBy(col("__e").asc, col("__d").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val run = sweep.withColumn("__run", sum(col("__d")).over(w))
      val peaks = run.groupBy(col("__day")).agg(max(col("__run")).as("peak"))
      run.join(peaks, "__day")
        .filter(col("__run") === col("peak"))
        .groupBy(col("__day"), col("peak"))
        .agg(min(col("__e")).as("first_peak_t"))
        .select(col("__day").as("day"), col("peak"), col("first_peak_t"))
    }),

    // Order-fill latency histogram: days from order date to the LAST
    // line shipment, bucketed by week — the fulfillment-SLA readout.
    // One key join + per-order max + histogram groupBy. The synthetic
    // dates run NEGATIVE, where integer division semantics diverge
    // (Spark div truncates, DuckDB // floors) — so the week bucket is
    // floor(days / 7.0): IEEE-exact at these magnitudes and identical
    // on both engines for either sign.
    "q59_fill_latency" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(max(col("l_shipdate")).as("__last"))
        .select(floor(datediff(col("__last"), col("o_orderdate"))
          .cast("double") / lit(7.0)).cast("long").as("weeks_to_fill"))
        .groupBy(col("weeks_to_fill"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Top brand per quarter by ARGMAX (one-pass max-of-struct — no
    // rank window, no self-join): quarterly brand revenue in exact
    // DECIMAL, then max(struct(rev, brand)) per quarter; revenue ties
    // break to the lexicographically larger brand in BOTH engines.
    // Two partially-aggregated groupBys; the argmax is a pure agg.
    "q60_top_brand_quarter" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("__p"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        date_trunc("quarter", col("o_orderdate")).as("qtr"))
      val p = table(s, dir, "part").select(col("p_partkey"),
        col("p_brand"))
      val br = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("qtr"), col("p_brand"))
        .agg(sum(col("__p")).as("__rev"))
      br.groupBy(col("qtr"))
        .agg(max(struct(col("__rev"), col("p_brand"))).as("__top"))
        .select(col("qtr"), col("__top.p_brand").as("brand"),
          col("__top.__rev").cast("double").as("revenue"))
    }),

    // Share-of-parent contribution analysis: each nation's exact-DECIMAL
    // revenue as a fraction of its region, and each region's as a
    // fraction of the total — the ratio-to-parent readout a rollup (q16)
    // doesn't give. The q06 join chain feeds one (region, nation)
    // partial agg; both share windows run over the ≤|nations| aggregate
    // (dimension-sized, never data-sized). Exact decimal sums → the
    // identical decimal→double cast + IEEE division on both engines.
    "q61_share_of_parent" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
      val rev = table(s, dir, "lineitem")
        .join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 6)) - dec(col("l_discount"))))
          .as("__rev"))
      val wR = Window.partitionBy(col("r_name"))
      val wT = Window.partitionBy(lit(1))
      rev
        .withColumn("__rtot", sum(col("__rev")).over(wR))
        .withColumn("__gtot", sum(col("__rev")).over(wT))
        .select(col("r_name"), col("n_name"),
          col("__rev").cast("double").as("revenue"),
          round(col("__rev").cast("double") /
            col("__rtot").cast("double"), 6).as("share_of_region"),
          round(col("__rtot").cast("double") /
            col("__gtot").cast("double"), 6).as("region_share"))
    }),

    // ABC (Pareto) classification: parts ranked by exact DECIMAL revenue,
    // cumulative-share classes A (≤ 50% of total), B (≤ 80%), C. The
    // ranked cumsum runs over the PART-LEVEL AGGREGATE — three orders of
    // magnitude below the fact table; a single post-agg sort is the
    // standard ABC shape (the dimension, not the data, is what's
    // ordered). Revenue sums are exact DECIMAL; shares and class
    // boundaries go through the identical exact-decimal→double cast and
    // IEEE division on both engines.
    "q58_abc_classes" -> ((s, dir) => {
      val pr = table(s, dir, "lineitem")
        .select(col("l_partkey"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("__p"))
        .groupBy(col("l_partkey")).agg(sum(col("__p")).as("__rev"))
      // TWO-LEVEL distributed prefix sum (guide §2): the former
      // unpartitioned `Window.orderBy(...)` ran the ranked cumsum as a
      // SINGLE-partition sort of the whole part dimension — a frame that
      // GROWS with SF (the one global window in the registry whose input
      // isn't bounded by a calendar/bucket dimension). Here the rows are
      // range-partitioned by the same total order, each partition prefix-
      // sums locally, and the exact-DECIMAL totals of the preceding
      // partitions (bounded by the partition count — a driver-safe
      // collect, the PageRank stats idiom) are added back per partition.
      // Every sum stays exact DECIMAL, so cum/tot — and the doubles and
      // class cuts derived from them — are bit-identical to the global
      // window's.
      val p = math.max(s.sparkContext.defaultParallelism, 16)
      // checkpoint pins the physical layout: the per-partition offsets
      // below must describe the exact partitions the window pass reads
      val ranged = pr
        .repartitionByRange(p, col("__rev").desc, col("l_partkey").asc)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint()
      // exact-DECIMAL offset of each range partition = the revenue sum of
      // the partitions BEFORE it (q77's distributed-order-statistics
      // shape: the prefix window runs over the partition-count-sized sum
      // table and rides a broadcast, never a data-sized window)
      val psums = ranged.groupBy(col("__pid"))
        .agg(sum(col("__rev")).cast(DecimalType(38, 2)).as("__s"))
      val byPid = Window.orderBy(col("__pid").asc)
      val offs = psums.select(col("__pid"),
        (coalesce(sum(col("__s")).over(
            byPid.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast(DecimalType(38, 2)))).as("__off"),
        sum(col("__s")).over(byPid.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))
          .cast(DecimalType(38, 2)).as("__tot"))
      val wLocal = Window.partitionBy(col("__pid"))
        .orderBy(col("__rev").desc, col("l_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val share = col("__cum").cast("double") / col("__tot").cast("double")
      ranged.join(broadcast(offs), Seq("__pid"))
        .withColumn("__cum",
          (col("__off") + sum(col("__rev")).over(wLocal))
            .cast(DecimalType(38, 2)))
        .select(col("l_partkey"),
          col("__rev").cast("double").as("revenue"),
          round(share, 6).as("cum_share"),
          when(share <= 0.5, "A").when(share <= 0.8, "B")
            .otherwise("C").as("abc"))
    }),

    // Year-over-year growth: each nation's exact-DECIMAL annual revenue
    // next to the prior year's, with the growth ratio — the lag-window
    // trend readout beside q61's share-of-parent. One q06-chain partial
    // agg to a (nation, year) table, then a dimension-sized lag window;
    // first year's growth is NULL by contract on both engines.
    "q62_yoy_growth" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
      val rev = table(s, dir, "lineitem")
        .join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 6)) - dec(col("l_discount"))))
          .as("__rev"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("yr").asc)
      rev
        .withColumn("__prev", lag(col("__rev"), 1).over(w))
        .select(col("n_name"), col("yr"),
          col("__rev").cast("double").as("revenue"),
          round((col("__rev") - col("__prev")).cast("double") /
            col("__prev").cast("double"), 6).as("yoy_growth"))
    }),

    // Gini coefficient of customer lifetime spend per nation — the
    // inequality readout over the q06 dimension chain. Per-customer
    // spend sums are exact DECIMAL; the rank-weighted form
    // G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) (xᵢ ascending, i = 1-based
    // rank) keeps every sum exact-decimal until the single final IEEE
    // division. The sort runs over the CUSTOMER aggregate (dimension-
    // sized), partitioned by nation — never the fact table.
    "q63_gini_spend" -> ((s, dir) => {
      val spend = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 6)).as("__x"))
      val j = spend
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_custkey").as("__ck"), col("__x"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("__x").asc, col("__ck").asc)
      j.withColumn("__i", row_number().over(w).cast("long"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("__x")).cast(DecimalType(38, 6)).as("__s0"),
          sum(col("__i") * col("__x")).cast(DecimalType(38, 6)).as("__s1"))
        .select(col("n_name"), col("n_customers"),
          col("__s0").cast("double").as("total_spend"),
          round((lit(2) * col("__s1") -
            (col("n_customers") + lit(1)) * col("__s0")).cast("double") /
            (col("n_customers") * col("__s0")).cast("double"), 6)
            .as("gini"))
    }),

    // Longest rising-revenue streaks (gaps-and-islands): maximal runs of
    // consecutive order days with strictly increasing daily revenue,
    // reported when >= 3 days long. Daily revenue is an exact-DECIMAL
    // aggregate (so the strict > compare is exact on both engines); the
    // break-flag cumsum assigns island ids over the DAY-LEVEL aggregate
    // — the q58 single-post-agg-sort shape, never a data-sized window.
    "q64_revenue_streaks" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("__day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 2)).as("__rev"))
      val byDay = Window.orderBy(col("__day").asc)
      daily
        .withColumn("__brk",
          when(col("__rev") > lag(col("__rev"), 1).over(byDay), lit(0))
            .otherwise(lit(1)))
        .withColumn("__grp", sum(col("__brk")).over(
          byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("__grp"))
        .agg(min(col("__day")).as("streak_start"),
          max(col("__day")).as("streak_end"),
          count(lit(1)).as("n_days"),
          (max_by(col("__rev"), col("__day")) -
            min_by(col("__rev"), col("__day"))).cast("double").as("gain"))
        .filter(col("n_days") >= 3)
        .select(col("streak_start"), col("streak_end"), col("n_days"),
          col("gain"))
    }),

    // Exact inter-event latency percentiles per event type (p50/p90/p99
    // of the seconds since the user's previous action), via the
    // integer-HISTOGRAM form: counts partially aggregate on (type, gap),
    // then the cumulative pick runs over that bounded aggregate — the
    // scale-correct exact-percentile shape (no per-type sort of the
    // event stream, no interpolation doubles; the p-th percentile is the
    // smallest gap with 100·cum ≥ p·n, pure BIGINT ⇔ ceil-rank pick).
    "q73_latency_percentiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("__t").asc, col("event_id").asc)
      val gaps = table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("__t"))
        .withColumn("__prev", lag(col("__t"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("event_type"), (col("__t") - col("__prev")).as("__g"))
      val h = gaps.groupBy(col("event_type"), col("__g"))
        .agg(count(lit(1)).as("__c"))
      val wCum = Window.partitionBy(col("event_type"))
        .orderBy(col("__g").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      def pick(k: Int) =
        min(when(col("__cum") * 100 >= col("__n") * k, col("__g")))
      h.withColumn("__cum", sum(col("__c")).over(wCum))
        .withColumn("__n", sum(col("__c")).over(wAll))
        .groupBy(col("event_type"))
        .agg(sum(col("__c")).as("n_gaps"), pick(50).as("p50_s"),
          pick(90).as("p90_s"), pick(99).as("p99_s"))
    }),

    // Last-touch attribution: each purchase credited to the user's most
    // recent preceding non-purchase event type ('direct' when none) —
    // the marketing-attribution readout beside q34's funnel counts. One
    // user-partitioned ignore-nulls running last_value with an
    // (ts, event_id) deterministic order, then a tiny histogram groupBy.
    "q72_last_touch" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("__touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("__touch"), lit("direct")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"))
    }),

    // RFM segmentation: per-nation recency/frequency/monetary terciles
    // of the customer base, with segment populations — the classic
    // marketing cut (3×3×3 cells per nation). All three ntiles run over
    // the CUSTOMER aggregate partitioned by nation (never global, never
    // the fact table), ordered with a custkey tiebreak so bucket edges
    // are deterministic; recency is integer epoch-day, spend exact
    // DECIMAL — ntile never touches a double.
    "q71_rfm_segments" -> ((s, dir) => {
      val cust = table(s, dir, "orders")
        .select(col("o_custkey"),
          unix_timestamp(col("o_orderdate")).as("__t"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("__p"))
        .select(col("o_custkey"), expr("__t div 86400").as("__d"),
          col("__p"))
        .groupBy(col("o_custkey"))
        .agg(max(col("__d")).as("__last"), count(lit(1)).as("__n"),
          sum(col("__p")).cast(DecimalType(38, 2)).as("__spend"))
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_custkey").as("__ck"),
          col("__last"), col("__n"), col("__spend"))
      def tercile(order: Seq[org.apache.spark.sql.Column]) =
        ntile(3).over(Window.partitionBy(col("n_name"))
          .orderBy(order: _*))
      cust
        .withColumn("r_tercile",
          tercile(Seq(col("__last").desc, col("__ck").asc)))
        .withColumn("f_tercile",
          tercile(Seq(col("__n").desc, col("__ck").asc)))
        .withColumn("m_tercile",
          tercile(Seq(col("__spend").desc, col("__ck").asc)))
        .groupBy(col("n_name"), col("r_tercile"), col("f_tercile"),
          col("m_tercile"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // Order inter-arrival histogram: calendar-day gaps between each
    // customer's consecutive orders, bucketed — the repeat-purchase
    // cadence readout (and the Poisson-ness check for the generator).
    // Integer epoch-day arithmetic end to end; the lag window is
    // partitioned by customer (never global), then one partial-agg
    // histogram groupBy.
    "q70_interarrival" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("__d").asc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("__t"))
        .select(col("o_custkey"), col("o_orderkey"),
          expr("__t div 86400").as("__d"))
        .withColumn("__gap", col("__d") - lag(col("__d"), 1).over(w))
        .filter(col("__gap").isNotNull)
        .groupBy(col("__gap").as("gap_days"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // Herfindahl–Hirschman concentration index per region: Σ(share²) of
    // nation revenue within its region, plus the top nation's share —
    // the market-concentration readout beside q61's share-of-parent.
    // Algebra keeps it exact: HHI = Σrevᵢ²/(Σrevᵢ)², so every sum and
    // square stays DECIMAL (revᵢ ≤ 16 digits at scale 6 ⇒ squares fit
    // DECIMAL(38,12)) and only the final ratio is one IEEE division —
    // no cross-row double sums. Aggregation is nation-level (≤25 rows).
    "q69_hhi_concentration" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
      val nrev = table(s, dir, "lineitem")
        .join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 6)) - dec(col("l_discount"))))
          .cast(DecimalType(18, 6)).as("__rev"))
      nrev.groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"),
          sum(col("__rev") * col("__rev")).cast(DecimalType(38, 12))
            .as("__sq"),
          sum(col("__rev")).cast(DecimalType(38, 6)).as("__tot"),
          max(col("__rev")).cast(DecimalType(38, 6)).as("__top"))
        .select(col("r_name"), col("n_nations"),
          round(col("__sq").cast("double") /
            (col("__tot").cast("double") * col("__tot").cast("double")), 6)
            .as("hhi"),
          round(col("__top").cast("double") / col("__tot").cast("double"),
            6).as("top_share"))
    }),

    // Time-to-convert histogram: hours between a user's FIRST signup and
    // their first purchase at-or-after it, bucketed to whole hours — the
    // latency readout next to q34's stage counts. Two key-grouped
    // aggregations + one user-keyed join; all integer epoch-second
    // arithmetic.
    "q56_conversion_latency" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("__t"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("__t")).as("__s"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("__t"))
      su.join(pu, "user_id")
        .filter(col("__t") >= col("__s"))
        .groupBy(col("user_id"), col("__s")).agg(min(col("__t")).as("__p"))
        .select(expr("(__p - __s) div 3600").as("hours_to_convert"))
        .groupBy(col("hours_to_convert"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Distribution-position window suite: lead / first_value /
    // percent_rank / cume_dist over the per-customer order history —
    // the remaining ANSI window family members (q08 covers rank, q25
    // running frames, q32 RANGE frames, q41 ntile). The unique
    // o_orderkey tie-break makes every rank deterministic, so
    // percent_rank/cume_dist are exact integer ratios (round-6 of the
    // same IEEE division on both engines). Single-order customers are
    // dropped (percent_rank's n−1 denominator is degenerate there).
    "q48_order_momentum" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val cnt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
      table(s, dir, "orders")
        .withColumn("__n", count(lit(1)).over(cnt))
        .filter(col("__n") >= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
    }),

    // Hourly volume anomaly flags — the pipeline-monitoring readout
    // (ingest spikes/droughts per event type). Robust statistic in ALL
    // integer arithmetic: the per-type DISCRETE median of hourly counts
    // (lower-middle pick at rank (n+1) div 2 under the (count, hour)
    // total order — no float interpolation, so the flag is bit-portable)
    // and a 6·n > 5·med spike test (count > 1.2x median without
    // fractions). Two aggregations + a per-type broadcast join-back;
    // hours are the parallel unit.
    "q38_hourly_anomaly" -> ((s, dir) => {
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n_events").asc, col("h").asc)
      val med = hourly
        .withColumn("__rn", row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .filter(col("__rn") === expr("(__cnt + 1) div 2"))
        .select(col("event_type"), col("n_events").as("type_median"))
      hourly.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), col("h"), col("n_events"),
          col("type_median"),
          (col("n_events") * 6 > col("type_median") * 5).as("is_spike"))
    }),

    // Per-group least-squares trend (drift detection): slope/intercept
    // of quantized value (micros, the v10 floor-quantization idiom)
    // against hour-resolution time, one partially-aggregated groupBy
    // carrying five EXACT int64 sums (n, Σx, Σy, Σxy, Σx²) — the
    // mergeable-statistics shape (q46) applied to regression, so the
    // same five numbers combine across shards/days at any scale. The
    // closed-form assembly runs in doubles over the exact sums in an
    // identical IEEE chain on both engines; outputs round-6.
    "q53_value_trend" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("(CAST(ts AS BIGINT) - 1704067200) div 3600").as("__x"),
          floor(col("value") * lit(1000000.0)).cast("long").as("__y"))
      val g = e.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      val den = g("n").cast("double") * col("__sxx").cast("double") -
        col("__sx").cast("double") * col("__sx").cast("double")
      val withSlope = g.withColumn("__den", den)
        .withColumn("__slope",
          when(col("__den") === 0.0, lit(0.0))
            .otherwise((col("n").cast("double") * col("__sxy").cast("double")
              - col("__sx").cast("double") * col("__sy").cast("double"))
              / col("__den")))
      withSlope.select(col("event_type"), col("n"),
        round(col("__slope"), 6).as("slope"),
        round((col("__sy").cast("double")
          - col("__slope") * col("__sx").cast("double"))
          / col("n").cast("double"), 6).as("intercept"))
    }),

    // Per-quarter Pareto skyline on (price ↓, date ↓): orders no other
    // same-quarter order beats on both price and date (ties on both
    // dims survive — no strict dimension). Not expressible as a
    // groupBy/topk — dominance needs the 2-D frontier. Shape: one
    // partial-agg groupBy to (qtr, price, min_date), one PARTITIONED
    // window over that pre-aggregate for the strictly-cheaper prefix
    // min (group-bounded — never a global sort; distinct prices per
    // quarter, not rows, bound the task), one key-join back. Dominance
    // tests are exact timestamp/double comparisons on both engines.
    "q52_price_date_skyline" -> ((s, dir) => {
      val o = table(s, dir, "orders").select(
        col("o_orderkey"),
        date_trunc("quarter", col("o_orderdate")).as("qtr"),
        col("o_totalprice"), col("o_orderdate"))
      val pp = o.groupBy(col("qtr"), col("o_totalprice"))
        .agg(min(col("o_orderdate")).as("__grp_min_date"))
      val wq = Window.partitionBy(col("qtr"))
        .orderBy(col("o_totalprice").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val pm = pp.withColumn("__cheaper_min_date",
        min(col("__grp_min_date")).over(wq))
      o.join(pm, Seq("qtr", "o_totalprice"))
        .filter((col("__cheaper_min_date").isNull ||
          col("__cheaper_min_date") > col("o_orderdate")) &&
          col("__grp_min_date") === col("o_orderdate"))
        .select(col("qtr"), col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate"))
    }),

    // Weekly cohort retention: users bucketed by the calendar week of
    // their first event; n_users active per (cohort_week, week_offset).
    // ALL-integer week arithmetic (epoch-microsecond division), so the
    // matrix is bit-portable. One aggregation shuffle for first-seen
    // (reused by the join), one distinct, one count — all on keys.
    "q36_cohort_retention" -> ((s, dir) => {
      val wk = floor(floor(unix_timestamp(col("ts")) / lit(86400L)) / lit(7L))
        .cast("long")
      val ev = table(s, dir, "events").select(col("user_id"), wk.as("week"))
      val first = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      ev.join(first, "user_id")
        .select(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"), col("user_id"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
    }),

    // Top event-type TRIGRAMS: the 20 most common 3-event behavioral
    // sequences across users — sequence mining's first readout (s11's
    // Markov matrix sees only pairwise steps; paths like
    // view→view→purchase need the third order). One user-keyed sort
    // window producing both lags in a single pass, one partially-
    // aggregated triple groupBy, TakeOrderedAndProject for the top-20
    // (n DESC, then lexicographic — fully deterministic).
    "q84_event_trigrams" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("__p1", lag(col("event_type"), 1).over(w))
        .withColumn("__p2", lag(col("event_type"), 2).over(w))
        .filter(col("__p2").isNotNull)
        .groupBy(col("__p2").as("e1"), col("__p1").as("e2"),
          col("event_type").as("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1").asc, col("e2").asc,
          col("e3").asc)
        .limit(20)
    }),

    // KMV SET-OPERATION estimates: pairwise audience overlap (Jaccard)
    // between event-type user sets from mergeable bottom-k sketches —
    // the intersection capability HLL lacks — with the exact Jaccard
    // alongside as the error audit. Integer-exact end to end, so the
    // estimate itself hash-matches (Sketches.kmvOverlap; the q26
    // estimator lineage).
    "q99_kmv_overlap" -> ((s, dir) =>
      graft.ops.Sketches.kmvOverlap(
        table(s, dir, "events"), keyCol = "user_id",
        groupCol = "event_type", k = 64)),

    // DAU/WAU STICKINESS: per day, distinct actives that day over
    // distinct actives in the trailing 7 days — the engagement-depth
    // KPI. The sliding-window DISTINCT never runs as a window: each
    // (user, active day) covers days [d, d+6] via a bounded ×7 explode,
    // then one distinct + one partial-agg'd count — linear in user-days
    // at any scale, the standard trailing-distinct decomposition.
    "q103_stickiness" -> ((s, dir) => {
      val ud = table(s, dir, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("day"),
          col("user_id"))
        .distinct()
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .withColumn("__cd", explode(sequence(col("day"), col("day") + 6)))
        .select(col("__cd").as("day"), col("user_id")).distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau7"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau7"),
          round(col("dau").cast("double") / col("wau7").cast("double"), 6)
            .as("stickiness"))
    }),

    // NEW vs RETURNING daily actives — the acquisition/retention split
    // of every growth dashboard: per day, users whose FIRST-ever
    // activity is that day vs users seen before. First-activity day is
    // one user-keyed min (partial-agg'd); the daily split is one more
    // bounded groupBy — no window ever touches the event stream.
    "q106_new_vs_returning" -> ((s, dir) => {
      val ud = table(s, dir, "events")
        .select(expr("unix_timestamp(ts) div 86400").as("day"),
          col("user_id"))
        .distinct()
      val first = ud.groupBy(col("user_id"))
        .agg(min(col("day")).as("__first"))
      ud.join(first, Seq("user_id"))
        .groupBy(col("day"))
        .agg(
          sum(when(col("day") === col("__first"), 1L).otherwise(0L))
            .as("n_new"),
          sum(when(col("day") =!= col("__first"), 1L).otherwise(0L))
            .as("n_returning"))
        .withColumn("returning_share",
          round(col("n_returning").cast("double") /
            (col("n_new") + col("n_returning")).cast("double"), 6))
    }),

    // UNPIVOT (melt): the q20 segment×priority matrix stacked back to
    // tidy (segment, bucket, count) rows — the wide→long reshape every
    // downstream groupBy wants, exercising Spark's native Unpivot node
    // (the EXPAND-style dual of PIVOT's aggregate).
    "q101_unpivot_priority" -> ((s, dir) =>
      Extended.queries("q20_pivot_priority")(s, dir)
        .unpivot(
          Array(col("c_mktsegment")),
          Array(col("n_urgent"), col("n_high"), col("n_medium"),
            col("n_notspec"), col("n_low")),
          "priority_bucket", "n_orders")),

    // Daily bounce rate: sessions opened per calendar day, how many
    // were single-event bounces, and the bounce fraction — the q42
    // session table rolled to the engagement KPI. Integer epoch-day
    // bucketing over the SESSION aggregate (already user-keyed and
    // bounded), one histogram groupBy, one closing division.
    "q74_bounce_rate" -> ((s, dir) =>
      graft.ops.Sessions.sessionize(
        table(s, dir, "events"), keyCol = "user_id", tsCol = "ts",
        tieCol = "event_id", gapSeconds = 1800L)
        .select(expr("t_start_s div 86400").as("day"),
          col("n_events"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .as("n_bounces"),
          sum(col("n_events")).as("total_events"))
        .withColumn("bounce_rate",
          round(col("n_bounces").cast("double") /
            col("n_sessions").cast("double"), 6))),

  )

  val oracles: Map[String, String] = Map(
    // Mirrors q84: the same (ts, event_id) user order, two lags, triple
    // groupBy, identical (n DESC, lexicographic) top-20.
    "q84_event_trigrams" ->
      """WITH p AS (SELECT user_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS p2
           FROM events)
       SELECT p2 AS e1, p1 AS e2, event_type AS e3,
         CAST(count(*) AS BIGINT) AS n
       FROM p WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
       ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC LIMIT 20""",
    // Mirrors q99: same 52-bit md5 hash (the q26 idiom), bottom-64 per
    // type via row_number, k smallest of the pair's hash-set union, the
    // same membership count and two round-6 divisions.
    "q99_kmv_overlap" ->
      """WITH du AS (SELECT DISTINCT event_type AS g, user_id AS u
               FROM events),
         h AS (SELECT g, CAST(concat('0x',
                 substring(md5(CAST(u AS VARCHAR)), 1, 13)) AS BIGINT) AS h
               FROM du),
         r AS (SELECT g, h,
                 row_number() OVER (PARTITION BY g ORDER BY h ASC) AS rn
               FROM h),
         sk AS (SELECT g, h FROM r WHERE rn <= 64),
         gs AS (SELECT DISTINCT g FROM du),
         pr AS (SELECT a.g AS ga, b.g AS gb
                FROM gs a JOIN gs b ON a.g < b.g),
         uni AS (SELECT pr.ga, pr.gb, sk.h FROM pr
                 JOIN sk ON sk.g = pr.ga
                 UNION
                 SELECT pr.ga, pr.gb, sk.h FROM pr
                 JOIN sk ON sk.g = pr.gb),
         ur AS (SELECT ga, gb, h,
                  row_number() OVER (PARTITION BY ga, gb
                    ORDER BY h ASC) AS rn
                FROM uni),
         mk AS (SELECT ga, gb, h FROM ur WHERE rn <= 64),
         msz AS (SELECT ga, gb, CAST(count(*) AS BIGINT) AS m
                 FROM mk GROUP BY 1, 2),
         x AS (SELECT mk.ga, mk.gb, CAST(count(*) AS BIGINT) AS nc
               FROM mk
               JOIN sk sa ON sa.g = mk.ga AND sa.h = mk.h
               JOIN sk sb ON sb.g = mk.gb AND sb.h = mk.h
               GROUP BY 1, 2),
         ex AS (SELECT a.g AS ga, b.g AS gb,
                  CAST(count(*) AS BIGINT) AS i
                FROM du a JOIN du b ON a.u = b.u AND a.g < b.g
                GROUP BY 1, 2),
         n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
               FROM du GROUP BY 1)
       SELECT pr.ga AS type_a, pr.gb AS type_b,
         coalesce(x.nc, 0) AS n_common_minima,
         round(CAST(coalesce(x.nc, 0) AS DOUBLE)
           / CAST(msz.m AS DOUBLE), 6) AS jaccard_est,
         round(CAST(coalesce(ex.i, 0) AS DOUBLE)
           / CAST(na.n + nb.n - coalesce(ex.i, 0) AS DOUBLE), 6)
           AS jaccard_exact
       FROM pr
       JOIN msz ON msz.ga = pr.ga AND msz.gb = pr.gb
       LEFT JOIN x ON x.ga = pr.ga AND x.gb = pr.gb
       LEFT JOIN ex ON ex.ga = pr.ga AND ex.gb = pr.gb
       JOIN n na ON na.g = pr.ga
       JOIN n nb ON nb.g = pr.gb""",
    // Mirrors q106: same epoch-day floor, user-keyed min first day,
    // BIGINT split counts, one round-6 share.
    "q106_new_vs_returning" ->
      """WITH ud AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
               user_id
             FROM events),
         f AS (SELECT user_id, min(day) AS fd FROM ud GROUP BY 1),
         g AS (SELECT day,
                 CAST(sum(CASE WHEN day = fd THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_new,
                 CAST(sum(CASE WHEN day <> fd THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_returning
               FROM ud JOIN f USING (user_id) GROUP BY 1)
       SELECT day, n_new, n_returning,
         round(CAST(n_returning AS DOUBLE)
           / CAST(n_new + n_returning AS DOUBLE), 6) AS returning_share
       FROM g""",
    // Mirrors q103: same integer epoch-day floor, the same ×7 coverage
    // explode + distinct, BIGINT counts, one round-6 division.
    "q103_stickiness" ->
      """WITH ud AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
               user_id
             FROM events),
         dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                 FROM ud GROUP BY 1),
         cov AS (SELECT DISTINCT ud.day + g.i AS day, user_id
                 FROM ud, generate_series(0, 6) g(i)),
         wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau7
                 FROM cov GROUP BY 1)
       SELECT dau.day, dau.dau, wau.wau7,
         round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau7 AS DOUBLE), 6)
           AS stickiness
       FROM dau JOIN wau ON dau.day = wau.day""",
    // Mirrors q101: the q20 wide matrix re-stacked — five UNION ALL
    // legs over the same grouped base, bucket labels = the wide
    // column names.
    "q101_unpivot_priority" ->
      """WITH w AS (SELECT c_mktsegment,
             count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
             count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
             count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
             count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
               AS n_notspec,
             count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment)
       SELECT c_mktsegment, 'n_urgent' AS priority_bucket,
         CAST(n_urgent AS BIGINT) AS n_orders FROM w
       UNION ALL SELECT c_mktsegment, 'n_high', CAST(n_high AS BIGINT)
         FROM w
       UNION ALL SELECT c_mktsegment, 'n_medium', CAST(n_medium AS BIGINT)
         FROM w
       UNION ALL SELECT c_mktsegment, 'n_notspec',
         CAST(n_notspec AS BIGINT) FROM w
       UNION ALL SELECT c_mktsegment, 'n_low', CAST(n_low AS BIGINT)
         FROM w""",
    // Mirrors q61: the q06 decimal discipline for the revenue sums, the
    // same region/total share windows over the aggregate, identical
    // decimal→double casts + IEEE divisions, round-6.
    "q61_share_of_parent" ->
      """WITH rev AS (SELECT r_name, n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
               * (CAST(1 AS DECIMAL(18,6))
                  - CAST(l_discount AS DECIMAL(18,6))))
               AS DECIMAL(38,6)) AS rv
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
           GROUP BY r_name, n_name),
         w AS (SELECT r_name, n_name, rv,
                 CAST(sum(rv) OVER (PARTITION BY r_name)
                   AS DECIMAL(38,6)) AS rtot,
                 CAST(sum(rv) OVER () AS DECIMAL(38,6)) AS gtot
               FROM rev)
         SELECT r_name, n_name, CAST(rv AS DOUBLE) AS revenue,
           round(CAST(rv AS DOUBLE) / CAST(rtot AS DOUBLE), 6)
             AS share_of_region,
           round(CAST(rtot AS DOUBLE) / CAST(gtot AS DOUBLE), 6)
             AS region_share
         FROM w""",
    // Mirrors q59: same per-order last-ship max, calendar-day diff, and
    // the sign-safe floor(days / 7.0) week bucket (CAST to DOUBLE — the
    // decimal-literal lesson).
    "q59_fill_latency" ->
      """WITH f AS (SELECT o.o_orderkey, o.o_orderdate,
             max(l.l_shipdate) AS lastd
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2)
         SELECT CAST(floor(CAST(date_diff('day', o_orderdate, lastd)
             AS DOUBLE) / CAST(7 AS DOUBLE)) AS BIGINT) AS weeks_to_fill,
           CAST(count(*) AS BIGINT) AS n_orders
         FROM f GROUP BY 1""",
    // Mirrors q60: same three-way join and DECIMAL brand revenue; the
    // argmax's (rev, brand) struct order replays as (rev DESC, brand
    // DESC) row_number — ties to the lexicographically larger brand on
    // both engines (binary collation).
    "q60_top_brand_quarter" ->
      """WITH br AS (SELECT
             CAST(date_trunc('quarter', o.o_orderdate) AS TIMESTAMP) AS qtr,
             p.p_brand,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS rev
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2),
         r AS (SELECT qtr, p_brand, rev,
                 row_number() OVER (PARTITION BY qtr
                   ORDER BY rev DESC, p_brand DESC) AS rn
               FROM br)
         SELECT qtr, p_brand AS brand, CAST(rev AS DOUBLE) AS revenue
         FROM r WHERE rn = 1""",
    // Mirrors q58: exact DECIMAL revenue sums, same (rev DESC, partkey)
    // ranked cumsum over the part aggregate, identical decimal→double
    // casts, IEEE division, and double class-boundary compares.
    "q58_abc_classes" ->
      """WITH pr AS (SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS rev
           FROM lineitem GROUP BY 1),
         w AS (SELECT l_partkey, rev,
                 CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DECIMAL(38,2)) AS cum,
                 CAST(sum(rev) OVER () AS DECIMAL(38,2)) AS tot
               FROM pr)
         SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue,
           round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share,
           CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.5
                  THEN 'A'
                WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8
                  THEN 'B'
                ELSE 'C' END AS abc
         FROM w""",
    // Mirrors q62: q61's decimal revenue discipline at (nation, year),
    // the same nation-partitioned lag, decimal subtraction before the
    // single double division, round-6; first year NULL on both engines.
    "q62_yoy_growth" ->
      """WITH rev AS (SELECT n_name,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
               * (CAST(1 AS DECIMAL(18,6))
                  - CAST(l_discount AS DECIMAL(18,6))))
               AS DECIMAL(38,6)) AS rv
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           GROUP BY 1, 2),
         w AS (SELECT n_name, yr, rv,
                 lag(rv) OVER (PARTITION BY n_name ORDER BY yr) AS pv
               FROM rev)
         SELECT n_name, yr, CAST(rv AS DOUBLE) AS revenue,
           round(CAST(rv - pv AS DOUBLE) / CAST(pv AS DOUBLE), 6)
             AS yoy_growth
         FROM w""",
    // Mirrors q63: exact-decimal per-customer spend, identical
    // (x ASC, custkey ASC) 1-based rank, the same rank-weighted Gini
    // form with every sum exact decimal and one final IEEE division.
    "q63_gini_spend" ->
      """WITH sp AS (SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,6)) AS x
           FROM orders GROUP BY 1),
         j AS (SELECT n_name, o_custkey AS ck, x FROM sp
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey),
         rk AS (SELECT n_name, x,
                  CAST(row_number() OVER (PARTITION BY n_name
                    ORDER BY x ASC, ck ASC) AS BIGINT) AS i
                FROM j),
         g AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS DECIMAL(38,6)) AS s0,
                 CAST(sum(i * x) AS DECIMAL(38,6)) AS s1
               FROM rk GROUP BY 1)
         SELECT n_name, n AS n_customers, CAST(s0 AS DOUBLE) AS total_spend,
           round(CAST(2*s1 - (n+1)*s0 AS DOUBLE)
             / CAST(n*s0 AS DOUBLE), 6) AS gini
         FROM g""",
    // Mirrors q64: exact-decimal daily revenue (strict > compare is
    // exact), the same break-flag cumsum island ids over the day-level
    // aggregate, min_by/max_by endpoints, decimal gain cast double.
    "q64_revenue_streaks" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS rv
           FROM orders GROUP BY 1),
         f AS (SELECT day, rv,
                 CASE WHEN rv > lag(rv) OVER (ORDER BY day)
                   THEN 0 ELSE 1 END AS brk
               FROM d),
         g AS (SELECT day, rv,
                 sum(brk) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS grp
               FROM f),
         s AS (SELECT grp, min(day) AS streak_start,
                 max(day) AS streak_end,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(max_by(rv, day) - min_by(rv, day) AS DOUBLE) AS gain
               FROM g GROUP BY grp)
         SELECT streak_start, streak_end, n_days, gain
         FROM s WHERE n_days >= 3""",
    // Mirrors q73: the same integer epoch-second lag gaps, the same
    // (type, gap) histogram, and the identical 100·cum ≥ p·n pick —
    // BIGINT casts around every windowed sum (the p08 lesson).
    "q73_latency_percentiles" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) // 1000000 AS t FROM events),
         g AS (SELECT event_type,
                 t - lag(t) OVER (PARTITION BY user_id
                   ORDER BY t, event_id) AS gap
               FROM ev),
         h AS (SELECT event_type, gap, CAST(count(*) AS BIGINT) AS c
               FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
         cw AS (SELECT event_type, gap, c,
                  CAST(sum(c) OVER (PARTITION BY event_type ORDER BY gap
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
                  CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
                    AS n
                FROM h)
         SELECT event_type, CAST(sum(c) AS BIGINT) AS n_gaps,
           min(CASE WHEN cum * 100 >= n * 50 THEN gap END) AS p50_s,
           min(CASE WHEN cum * 100 >= n * 90 THEN gap END) AS p90_s,
           min(CASE WHEN cum * 100 >= n * 99 THEN gap END) AS p99_s
         FROM cw GROUP BY 1""",
    // Mirrors q72: the identical user-partitioned ignore-nulls running
    // last_value with the (ts, event_id) order, 'direct' fallback,
    // BIGINT counts.
    "q72_last_touch" ->
      """WITH t AS (SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
           FROM events)
         SELECT coalesce(touch, 'direct') AS touch_type,
           CAST(count(*) AS BIGINT) AS n_purchases
         FROM t WHERE event_type = 'purchase' GROUP BY 1""",
    // Mirrors q71: the same integer epoch-day recency, BIGINT order
    // counts, exact-DECIMAL spend, and ntile(3) with identical
    // (metric DESC, custkey ASC) deterministic orderings — ntile's
    // equal-fill remainder rule is standard SQL on both engines.
    "q71_rfm_segments" ->
      """WITH c AS (SELECT o_custkey,
             max(epoch_us(o_orderdate) // 1000000 // 86400) AS last_day,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS spend
           FROM orders GROUP BY 1),
         j AS (SELECT n_name, o_custkey AS ck, last_day, n_orders, spend
               FROM c
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey),
         t AS (SELECT n_name,
                 ntile(3) OVER (PARTITION BY n_name
                   ORDER BY last_day DESC, ck ASC) AS r_tercile,
                 ntile(3) OVER (PARTITION BY n_name
                   ORDER BY n_orders DESC, ck ASC) AS f_tercile,
                 ntile(3) OVER (PARTITION BY n_name
                   ORDER BY spend DESC, ck ASC) AS m_tercile
               FROM j)
         SELECT n_name, r_tercile, f_tercile, m_tercile,
           CAST(count(*) AS BIGINT) AS n_customers
         FROM t GROUP BY 1, 2, 3, 4""",
    // Mirrors q70: the q56 integer epoch-day idiom (// floors, div
    // truncates — identical on these positive epochs), the same
    // (day, orderkey) lag tiebreak, BIGINT counts.
    "q70_interarrival" ->
      """WITH d AS (SELECT o_custkey, o_orderkey,
             epoch_us(o_orderdate) // 1000000 // 86400 AS day
           FROM orders),
         g AS (SELECT day - lag(day) OVER (PARTITION BY o_custkey
                 ORDER BY day, o_orderkey) AS gap
               FROM d)
         SELECT gap AS gap_days, CAST(count(*) AS BIGINT) AS n_pairs
         FROM g WHERE gap IS NOT NULL GROUP BY 1""",
    // Mirrors q69: exact-DECIMAL nation revenue (the q62 discipline),
    // decimal squares/sums at the same precisions, and the identical
    // double ratios — sq/(tot·tot) and top/tot — rounded 6.
    "q69_hhi_concentration" ->
      """WITH nrev AS (SELECT r_name, n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
               * (CAST(1 AS DECIMAL(18,6))
                  - CAST(l_discount AS DECIMAL(18,6))))
               AS DECIMAL(18,6)) AS rev
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
           GROUP BY 1, 2),
         g AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
                 -- DECIMAL(19) operands force DuckDB's int128 multiply
                 -- (18×18 stays int64 and overflows); 19+19=38 ≤ max
                 CAST(sum(CAST(rev AS DECIMAL(19,6))
                   * CAST(rev AS DECIMAL(19,6))) AS DECIMAL(38,12)) AS sq,
                 CAST(sum(rev) AS DECIMAL(38,6)) AS tot,
                 CAST(max(rev) AS DECIMAL(38,6)) AS top
               FROM nrev GROUP BY 1)
         SELECT r_name, n_nations,
           round(CAST(sq AS DOUBLE)
             / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi,
           round(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             AS top_share
         FROM g""",
    // Mirrors q56: same first-signup / first-purchase-after derivation,
    // integer epoch-second hours, BIGINT counts.
    "q56_conversion_latency" ->
      """WITH ev AS (SELECT user_id, event_type,
             epoch_us(ts) // 1000000 AS t FROM events),
         su AS (SELECT user_id, min(t) AS s FROM ev
                WHERE event_type = 'signup' GROUP BY user_id),
         fp AS (SELECT ev.user_id, su.s, min(ev.t) AS p
                FROM ev JOIN su ON ev.user_id = su.user_id
                WHERE ev.event_type = 'purchase' AND ev.t >= su.s
                GROUP BY ev.user_id, su.s)
         SELECT (p - s) // 3600 AS hours_to_convert,
           CAST(count(*) AS BIGINT) AS n_users
         FROM fp GROUP BY 1""",
    // Mirrors q54: distinct bipartite set, per-order pair self-join with
    // HAVING >= 2, BIGINT counts everywhere (the p08 HUGEINT lesson),
    // and the identical cast-then-divide IEEE chain rounded 6.
    "q54_market_basket" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
               FROM lp),
         f AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
               FROM lp GROUP BY 1),
         p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(count(*) AS BIGINT) AS c_ab
               FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT part_a, part_b, c_ab, fa.c AS c_a, fb.c AS c_b,
           round(CAST(c_ab AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS support,
           round(CAST(c_ab AS DOUBLE) / CAST(fa.c AS DOUBLE), 6)
             AS confidence,
           round(CAST(c_ab * n.n AS DOUBLE) / CAST(fa.c * fb.c AS DOUBLE), 6)
             AS lift
         FROM p
         JOIN f fa ON part_a = fa.l_partkey
         JOIN f fb ON part_b = fb.l_partkey
         CROSS JOIN n""",
    // Mirrors q55: same epoch-second intervals, day clip, ±1 sweep with
    // the (e, d) tie order, BIGINT running sum (HUGEINT lesson), and the
    // same peak / first-time aggregation.
    "q55_peak_concurrency" ->
      """WITH ev AS (SELECT epoch_us(ts) // 1000000 AS t FROM events),
         iv AS (SELECT t, t // 86400 AS day,
                  least(t + 600, (t // 86400 + 1) * 86400) AS te
                FROM ev),
         sw AS (SELECT day, t AS e, 1 AS d FROM iv
                UNION ALL SELECT day, te AS e, -1 AS d FROM iv),
         r AS (SELECT day, e,
                 CAST(sum(d) OVER (PARTITION BY day
                   ORDER BY e ASC, d ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS run
               FROM sw),
         p AS (SELECT day, max(run) AS peak FROM r GROUP BY day)
         SELECT r.day AS day, p.peak AS peak, min(r.e) AS first_peak_t
         FROM r JOIN p ON r.day = p.day AND r.run = p.peak
         GROUP BY 1, 2""",
    // Mirrors q53: same hour x / floor-micro y quantization, the five
    // sums CAST to BIGINT (the p08 HUGEINT lesson), and the identical
    // double assembly chain (n·Σxy − Σx·Σy)/(n·Σx² − Σx·Σx) with the
    // den=0 guard; round-6 outputs.
    "q53_value_trend" ->
      """WITH e AS (SELECT event_type,
             (epoch_us(ts) // 1000000 - 1704067200) // 3600 AS x,
             CAST(floor(value * 1000000.0) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL),
         g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy,
             CAST(sum(x*x) AS BIGINT) AS sxx
           FROM e GROUP BY event_type),
         s AS (SELECT event_type, n,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
             sx, sy, sxy FROM g),
         sl AS (SELECT event_type, n, sx, sy,
             CASE WHEN den = 0.0 THEN 0.0
               ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / den
             END AS slope
           FROM s)
         SELECT event_type, n, round(slope, 6) AS slope,
           round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
         FROM sl""",
    // Mirrors q52: same pre-aggregate + strictly-cheaper prefix-min
    // window + join-back; survival = not beaten by a cheaper-or-equal
    // earlier order (exact timestamp comparisons).
    "q52_price_date_skyline" ->
      """WITH o AS (SELECT o_orderkey,
             CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
             o_totalprice, o_orderdate FROM orders),
         pp AS (SELECT qtr, o_totalprice,
             min(o_orderdate) AS grp_min_date
           FROM o GROUP BY qtr, o_totalprice),
         pm AS (SELECT qtr, o_totalprice, grp_min_date,
             min(grp_min_date) OVER (PARTITION BY qtr
               ORDER BY o_totalprice ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cheaper_min_date
           FROM pp)
         SELECT o.qtr, o.o_orderkey, o.o_totalprice, o.o_orderdate
         FROM o JOIN pm ON o.qtr = pm.qtr
           AND o.o_totalprice = pm.o_totalprice
         WHERE (pm.cheaper_min_date IS NULL
             OR pm.cheaper_min_date > o.o_orderdate)
           AND pm.grp_min_date = o.o_orderdate""",
    // Mirrors q48: same window spec (unique tie-break), same >= 2
    // partition filter; lead/first_value copy doubles bit-exact and the
    // two position ratios are exact int divisions rounded 6.
    "q48_order_momentum" ->
      """WITH o AS (SELECT *, count(*) OVER (PARTITION BY o_custkey) AS n
                    FROM orders)
         SELECT o_custkey, o_orderkey, o_totalprice,
           lead(o_totalprice, 1) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
         FROM o WHERE n >= 2
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    // Mirrors q74: the q42 session chain verbatim, then the identical
    // epoch-day rollup (// floors == div truncates on positive epochs),
    // BIGINT counts, one closing double division.
    "q74_bounce_rate" ->
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
                FROM s),
          sess AS (SELECT user_id, session_id,
                     CAST(count(*) AS BIGINT) AS n_events,
                     min(es) AS t_start_s
                   FROM g GROUP BY 1, 2),
          d AS (SELECT t_start_s // 86400 AS day, n_events FROM sess)
          SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
            CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_bounces,
            CAST(sum(n_events) AS BIGINT) AS total_events,
            round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
          FROM d GROUP BY 1""",
    // Integer week arithmetic: epoch_us // 86400000000 // 7 equals
    // Spark's floor(floor(unix_timestamp/86400)/7) for the positive
    // epochs in events.
    "q36_cohort_retention" ->
      """WITH w AS (SELECT user_id,
                      epoch_us(ts) // 86400000000 // 7 AS week
                    FROM events),
          f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1),
          a AS (SELECT DISTINCT f.cohort_week,
                  w.week - f.cohort_week AS week_offset, w.user_id
                FROM w JOIN f USING (user_id))
          SELECT cohort_week, week_offset, count(*) AS n_users
          FROM a GROUP BY 1, 2""",
    // Mirrors q38: the same (n_events, h)-ordered row_number pick at
    // rank (cnt+1)//2 — a DISCRETE lower-middle median, never a float
    // interpolation — and the fraction-free 6n > 5m spike test.
    "q38_hourly_anomaly" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n_events
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type, n_events AS type_median
           FROM (SELECT event_type, n_events,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY n_events ASC, h ASC) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
                 FROM hourly)
           WHERE rn = (cnt + 1) // 2)
         SELECT hourly.event_type, hourly.h, hourly.n_events,
           m.type_median,
           (hourly.n_events * 6 > m.type_median * 5) AS is_spike
         FROM hourly JOIN m USING (event_type)""",
  )
}
