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
      val ord = Window.orderBy(col("__rev").desc, col("l_partkey").asc)
      val share = col("__cum").cast("double") / col("__tot").cast("double")
      pr.withColumn("__cum", sum(col("__rev")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__tot", sum(col("__rev")).over(
          ord.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
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

    // k-core of the co-order part graph (the q57 edge set): the unique
    // maximal subgraph of minimum degree >= k, by decremental parallel
    // peeling (ops/KCore.scala). Peeling is confluent — batch removal,
    // sequential removal, and the oracle's full-recompute rounds all
    // reach the same fixpoint — which is what lets an iterative
    // algorithm hash-match a 12-round unrolled SQL oracle exactly.
    "q65_kcore" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") =!= col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.ops.KCore.kCore(e, k = 60, maxRounds = 32)
    }),

    // Chi-square independence cells: observed vs expected counts of
    // order priority × line return flag, with each cell's (O−E)²/E
    // contribution — the categorical-drift significance readout (sums of
    // chi2_term against a χ² table answer "did the mix shift?"). One
    // fact-table partial-agg count; the row/col/total sums are windows
    // over the ≤|priorities|·|flags| aggregate (the q58 post-agg window
    // discipline — 'No Partition Defined' over ~15 rows is by design).
    // Integer observed everywhere; expected and the term are single
    // per-row IEEE expressions ((O−E)·(O−E), not pow — pow(x,2) is not
    // guaranteed bit-equal to x·x across engines).
    "q66_chi_square" -> ((s, dir) => {
      val obs = table(s, dir, "lineitem")
        .join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(count(lit(1)).as("observed"))
      val expected =
        (sum(col("observed")).over(Window.partitionBy(col("o_orderpriority")))
          .cast("double") *
          sum(col("observed")).over(Window.partitionBy(col("l_returnflag")))
            .cast("double")) /
          sum(col("observed")).over(Window.partitionBy()).cast("double")
      val diff = col("observed").cast("double") - col("__e")
      obs.withColumn("__e", expected)
        .select(col("o_orderpriority"), col("l_returnflag"), col("observed"),
          round(col("__e"), 6).as("expected"),
          round(diff * diff / col("__e"), 6).as("chi2_term"))
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

    // Benford first-digit audit: observed vs theoretical log10(1+1/d)
    // share of order-total leading digits — the classic fabricated-data
    // / generator-sanity screen. The digit comes from the BIGINT floor's
    // string head (integer formatting is engine-identical; float log10
    // at exact powers of ten is not), observed counts are integers, and
    // the share window runs over the 9-row digit aggregate.
    "q67_benford" -> ((s, dir) => {
      val obs = table(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val total = sum(col("n_obs")).over(Window.partitionBy())
      obs.select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / total.cast("double"), 6)
          .as("obs_share"),
        round(log(10.0, lit(1.0) + lit(1.0) /
          col("digit").cast("double")), 6).as("benford_share"))
    }),

    // Spearman rank correlation between daily shipped quantity and
    // daily revenue — the monotone-association readout (Pearson on
    // ranks, robust to the revenue distribution's tail). Daily sums are
    // exact DECIMAL; ranks are row_number permutations with a (value,
    // day) tiebreak, so Σd² is an exact integer and the whole statistic
    // is integer arithmetic until the single 1 − 6Σd²/(n(n²−1))
    // division. All windows run over the day-level aggregate.
    "q68_spearman_qty_rev" -> ((s, dir) => {
      val daily = table(s, dir, "lineitem")
        .groupBy(date_trunc("day", col("l_shipdate")).as("__day"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 2)).as("__q"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).as("__r"))
      val rq = row_number().over(
        Window.orderBy(col("__q").asc, col("__day").asc)).cast("long")
      val rr = row_number().over(
        Window.orderBy(col("__r").asc, col("__day").asc)).cast("long")
      val n = col("n_days")
      daily.select((rq - rr).as("__d"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("__d") * col("__d")).as("sum_d2"))
        .select(n, col("sum_d2"),
          round(lit(1.0) - (lit(6.0) * col("sum_d2").cast("double")) /
            (n.cast("double") *
              (n.cast("double") * n.cast("double") - lit(1.0))), 6)
            .as("spearman_rho"))
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

    // Degree distribution of the co-order part graph (the q30/q35/q51
    // graph family's structural readout): distinct-neighbor degree per
    // node, then degree → node-count histogram. Two partially-aggregated
    // key groupBys over the distinct edge set — no iteration.
    "q57_degree_histogram" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") =!= col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .distinct()
        .groupBy(col("src")).agg(count(lit(1)).as("__deg"))
        .groupBy(col("__deg")).agg(count(lit(1)).as("n_nodes"))
        .select(col("__deg").as("degree"), col("n_nodes"))
    }),

    // Exact interpolated quantiles (the percentile_cont family — q27 is
    // the sampled path, q19 the sketch path; this is the exact one).
    // Instead of trusting two engines' percentile_cont internals to
    // agree at the last ulp, both sides compute the SAME explicit
    // formula: integer-rank bracket rows lo = 1 + (n−1)·p div 100,
    // hi = lo + (1 iff (n−1)·p mod 100 > 0), then
    // lo + (hi − lo)·(rem/100.0) — every step either integer-exact or
    // the identical IEEE operation chain, so the doubles hash-match
    // without rounding. One sort-shuffle per group; at 100 TB the
    // rank-pick is the exact-quantile floor and q19's KLL is the sketch
    // alternative.
    "q49_quantiles_interp" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").asc)
      val wn = Window.partitionBy(col("event_type"))
      val r = table(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
      def lo(p: Int) = max(when(
        col("rn") === lit(1) + expr(s"((n - 1) * $p) div 100"),
        col("value"))).as(s"__lo$p")
      def hi(p: Int) = max(when(
        col("rn") === lit(1) + expr(s"((n - 1) * $p) div 100")
          + when(expr(s"((n - 1) * $p) % 100") > 0, 1).otherwise(0),
        col("value"))).as(s"__hi$p")
      val agged = r.groupBy(col("event_type")).agg(
        max(col("n")).as("n"),
        lo(25), hi(25), lo(50), hi(50), lo(75), hi(75), lo(90), hi(90))
      def interp(p: Int) = col(s"__lo$p") +
        (col(s"__hi$p") - col(s"__lo$p")) *
          (expr(s"((n - 1) * $p) % 100").cast("double") / lit(100.0))
      agged.select(col("event_type"), col("n"),
        interp(25).as("p25"), interp(50).as("p50"),
        interp(75).as("p75"), interp(90).as("p90"))
    }),

    // Robust outlier detection: median / MAD (median absolute deviation)
    // per group, flagging |x − med| > 3·MAD. Both medians use the q19
    // discrete integer-rank rule (rank 1 + (n−1)·50 div 100 of the
    // ascending sort), so med and MAD are VALUES PICKED FROM THE DATA —
    // bit-identical across engines — and the threshold comparison is the
    // same IEEE |x−med| vs 3.0·mad chain on both sides: exact parity, no
    // rounding anywhere. Two windowed sorts + two tiny broadcast
    // join-backs (one row per group); the group-local sort is the exact-
    // median floor at any scale.
    "q50_mad_outliers" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      def discMedian(df: DataFrame, vcol: String, outCol: String) = {
        val w = Window.partitionBy(col("event_type")).orderBy(col(vcol).asc)
        val wn = Window.partitionBy(col("event_type"))
        df.withColumn("__rn", row_number().over(w))
          .withColumn("__n", count(lit(1)).over(wn))
          .filter(col("__rn") === lit(1) + expr("((__n - 1) * 50) div 100"))
          .select(col("event_type"), col(vcol).as(outCol))
      }
      val med = discMedian(e, "value", "med")
      val dev = e.join(broadcast(med), Seq("event_type"))
        .withColumn("__adev", abs(col("value") - col("med")))
      val mad = discMedian(
        dev.select(col("event_type"), col("__adev")), "__adev", "mad")
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          min(col("med")).as("med"),
          min(col("mad")).as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("__adev") > lit(3.0) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
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

    // PageRank (5 rounds) over the bipartite customer↔part purchase
    // graph, in fixed-point BIGINT arithmetic — float PageRank can never
    // hash-match an oracle (sum order), the integer recurrence is
    // bit-exact on both engines. Vertex ids: customer = 2k, part = 2k+1.
    "q30_pagerank" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("u"),
          (col("l_partkey") * 2 + 1).as("v"))
      val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
      graft.ops.PageRank.fixedPointPageRank(edges, iterations = 5)
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

    // Triangle counting over the co-ordered-parts graph (parts linked
    // when some order contains both): the third canonical graph/MR
    // workload after PageRank (q30) and components (d06). Degree-ordered
    // wedge-check — per-pivot out-degree bounded O(√|E|), see
    // ops.Triangles. The oracle is an INDEPENDENT formulation (a<b<c
    // three-way edge join), so the degree-direction machinery is
    // differentially checked, not replayed.
    "q35_triangles" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.ops.Triangles.triangleCount(edges)
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

    // Multi-source BFS levels (unweighted shortest paths, depth-capped):
    // distance from the part-key sources {p < 10} over the q35
    // co-order part graph, Pregel-style frontier expansion
    // (ShortestPaths.bfsLevels). The oracle is a DuckDB RECURSIVE CTE
    // whose UNION-dedup'd (node, level) walk min-aggregates to the same
    // BFS levels — two entirely different executions of the same
    // fixpoint.
    "q51_bfs_levels" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") =!= col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      val sources = table(s, dir, "lineitem")
        .filter(col("l_partkey") < 10)
        .select(col("l_partkey").as("node")).distinct()
      graft.ops.ShortestPaths.bfsLevels(edges, sources, maxDepth = 3)
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

    // WEIGHTED PageRank over the co-purchase part graph: edge weight =
    // co-order multiplicity, so a part's centrality reflects how OFTEN
    // it co-sells, not just with how many partners (q30's unweighted
    // recurrence can't distinguish a 100-order pairing from a 1-order
    // one). Contribution = (r·w) div wsum — still pure integer, still
    // bit-replayable; scale 10⁸ keeps r·w inside a long at any
    // multiplicity (the op's overflow require).
    "q75_weighted_pagerank" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pw = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") =!= col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      graft.ops.PageRank.fixedPointPageRank(pw, iterations = 5,
        scale = 100000000L)
    }),

    // Mann–Kendall trend test over daily revenue: S = Σ_{i<j}
    // sign(rvⱼ − rvᵢ) — the nonparametric "is revenue trending"
    // statistic (robust to the distribution's tail, no slope fit).
    // Daily sums are exact DECIMAL so every sign is exact; the pairwise
    // pass runs over the DAY aggregate (≈n²/2 of a few-thousand-row
    // frame — dimension-sized by contract, never the fact table).
    "q76_mann_kendall" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("__day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 2)).as("__rv"))
      daily.as("x").join(daily.as("y"),
          col("x.__day") < col("y.__day"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("y.__rv") > col("x.__rv"), 1L)
            .when(col("y.__rv") < col("x.__rv"), -1L)
            .otherwise(0L)).as("s_stat"),
          sum(when(col("y.__rv") === col("x.__rv"), 1L).otherwise(0L))
            .as("n_ties"))
    }),

    // Theil–Sen robust trend slope over daily revenue — the estimator
    // behind q76's Mann–Kendall verdict: the MEDIAN of all pairwise
    // slopes (rvⱼ−rvᵢ)/(dayⱼ−dayᵢ), immune to outlier days a
    // least-squares fit would chase. Slopes are exact-DECIMAL revenue
    // deltas over integer day gaps, one IEEE division each — bit-equal
    // across engines — and the median is pure ORDER STATISTICS (the two
    // middle ranks emitted separately, no averaging arithmetic), so the
    // result hash-matches exactly. The rank window is global but runs
    // over the day-PAIR aggregate (days², dimension-sized by contract —
    // the q76 pairing, never the fact table); the count rides a 1-row
    // broadcast (t16 discipline, NLJ-allowlisted).
    "q77_theil_sen" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("__day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 2)).as("__rv"))
      // explicit (AQE-exempt) width on the probe side: the day aggregate
      // is tiny in BYTES, so AQE would coalesce it to one task and run
      // the days² pairing single-threaded
      val p = math.max(s.sparkContext.defaultParallelism, 8)
      val slopes = daily.repartition(p).as("x").join(daily.as("y"),
          col("x.__day") < col("y.__day"))
        .select(((col("y.__rv") - col("x.__rv")).cast("double") /
          datediff(col("y.__day"), col("x.__day")).cast("double"))
          .as("slope"))
      // DISTRIBUTED order statistics — never a global sort window over
      // the days² pair table: range-partition by slope, rank locally,
      // add the broadcast partition-count prefix as the offset. The
      // picked VALUES are tie-invariant, so local tie order is free.
      val ranged = slopes.repartitionByRange(p, col("slope").asc)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint()
      val counts = ranged.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"))
      val offs = counts.withColumn("__off",
        sum(col("__c")).over(Window.orderBy(col("__pid").asc)) - col("__c"))
      val nS = counts.agg(sum(col("__c")).as("n_slopes"))
      ranged
        .join(broadcast(offs.select(col("__pid"), col("__off"))), Seq("__pid"))
        .withColumn("__rn",
          row_number().over(Window.partitionBy(col("__pid"))
            .orderBy(col("slope").asc)).cast("long") + col("__off"))
        .crossJoin(broadcast(nS))
        .filter(col("__rn") === expr("(n_slopes + 1) div 2") ||
          col("__rn") === expr("n_slopes div 2 + 1"))
        .agg(max(col("n_slopes")).as("n_slopes"),
          min(col("slope")).as("slope_lo"),
          max(col("slope")).as("slope_hi"))
    }),

    // Weighted single-source shortest paths (4 Bellman–Ford rounds) over
    // the co-purchase part graph: edge length 10⁶ div multiplicity, so
    // frequently-co-sold parts are "close" and the dist readout is a
    // part-affinity radius from the seed parts — the weighted complement
    // of q51's hop-count BFS. Pure long arithmetic end to end; the
    // oracle unrolls the identical four relax/min rounds.
    "q78_sssp" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") =!= col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        .agg(expr("1000000L div count(1)").as("len"))
      val sources = table(s, dir, "lineitem")
        .filter(col("l_partkey") < 10)
        .select(col("l_partkey").as("node")).distinct()
      graft.ops.ShortestPaths.bellmanFord(e, sources, rounds = 4)
    }),

    // Kolmogorov–Smirnov two-sample statistic: urgent vs non-urgent
    // order price distributions — the exact form of distribution-drift
    // detection. The price axis is integer CENTS and the ECDF compare is
    // cross-multiplied (|F₁−F₂| as |c₁·n₂ − c₂·n₁|), so every
    // intermediate is a long and the max is exact; only the final ks
    // readout divides (round-6). Cumulative counts run over the cents
    // HISTOGRAM in two levels — a $10k-bucket prefix (bucket-count-sized,
    // broadcast) plus a within-bucket window — so no data-sized
    // single-partition window exists (q73's histogram discipline made
    // global); the argmax is the q07 TakeOrderedAndProject shape.
    "q79_ks_two_sample" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("__v"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("__g"))
      val h = o.groupBy(col("__v"))
        .agg(sum(col("__g")).as("__c1"),
          sum(lit(1L) - col("__g")).as("__c2"))
        .withColumn("__b", expr("__v div 1000000"))
      val wIn = Window.partitionBy(col("__b")).orderBy(col("__v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPre = Window.orderBy(col("__b").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val pre = h.groupBy(col("__b"))
        .agg(sum(col("__c1")).as("__t1"), sum(col("__c2")).as("__t2"))
        .select(col("__b"),
          coalesce(sum(col("__t1")).over(wPre), lit(0L)).as("__p1"),
          coalesce(sum(col("__t2")).over(wPre), lit(0L)).as("__p2"))
      val n = h.agg(sum(col("__c1")).as("n1"), sum(col("__c2")).as("n2"))
      h.join(broadcast(pre), "__b")
        .select(col("__v"),
          (sum(col("__c1")).over(wIn) + col("__p1")).as("__f1"),
          (sum(col("__c2")).over(wIn) + col("__p2")).as("__f2"))
        .crossJoin(broadcast(n))
        .select(col("n1"), col("n2"),
          abs(col("__f1") * col("n2") - col("__f2") * col("n1"))
            .as("ks_num"),
          col("__v"))
        .orderBy(col("ks_num").desc, col("__v").asc)
        .limit(1)
        .select(col("n1"), col("n2"), col("ks_num"),
          col("__v").as("ks_at_cents"),
          round(col("ks_num").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double")), 6)
            .as("ks"))
    }),

    // Mann–Whitney U (Wilcoxon rank-sum) on the same urgent/non-urgent
    // price split — q79's KS asks "do the distributions differ anywhere";
    // this asks "is one stochastically larger". Tied ranks take the
    // midrank, kept integer by carrying 2·rank: for a tie group of size
    // c starting above cum_below items, 2·midrank = 2·cum_below + c + 1,
    // so 2R₁ = Σ c₁·(2·cum≤ − c + 1) — all longs, no halves. Same
    // two-level histogram cumsum as q79 (bucket prefix broadcast +
    // within-bucket window); the effect-size readout (rank-biserial
    // r = u1_x2/(n₁·n₂) − 1) is the one double.
    "q80_mann_whitney" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("__v"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("__g"))
      val h = o.groupBy(col("__v"))
        .agg(sum(col("__g")).as("__c1"),
          sum(lit(1L) - col("__g")).as("__c2"))
        .withColumn("__c", col("__c1") + col("__c2"))
        .withColumn("__b", expr("__v div 1000000"))
      val wIn = Window.partitionBy(col("__b")).orderBy(col("__v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPre = Window.orderBy(col("__b").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val pre = h.groupBy(col("__b")).agg(sum(col("__c")).as("__t"))
        .select(col("__b"),
          coalesce(sum(col("__t")).over(wPre), lit(0L)).as("__p"))
      h.join(broadcast(pre), "__b")
        .select(col("__c1"), col("__c"),
          (sum(col("__c")).over(wIn) + col("__p")).as("__cum"))
        .agg(sum(col("__c1")).as("n1"),
          sum(col("__c") - col("__c1")).as("n2"),
          sum(col("__c1") * (lit(2L) * col("__cum") - col("__c") + 1L))
            .as("__r1x2"))
        .select(col("n1"), col("n2"),
          (col("__r1x2") - col("n1") * (col("n1") + 1L)).as("u1_x2"),
          round((col("__r1x2") - col("n1") * (col("n1") + 1L))
            .cast("double") /
            (col("n1").cast("double") * col("n2").cast("double")) -
            lit(1.0d), 6).as("rank_biserial"))
    }),

    // Autocorrelation function of daily revenue at lags 1..7 — the
    // weekly-seasonality readout beside q76/q77's trend tests: each lag
    // is the Pearson correlation of (dayₜ, dayₜ₊ₖ) revenue pairs.
    // Revenue is exact integer CENTS; per lag the five Pearson sums
    // (Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL(38,0) over
    // DECIMAL(18,0) products — exact at any day count — and the closing
    // r is a fixed double epilogue over those exact sums (each term cast
    // once, identical op order both engines, round-6; the q68
    // discipline). The lag join and windows run over the DAY aggregate
    // only (dimension-sized by contract, never the fact table).
    "q81_acf" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("__day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).cast(DecimalType(18, 0)).as("__x"))
      val byDay = Window.orderBy(col("__day").asc)
      val lagged = daily.select(
        col("__x"),
        array((1 to 7).map(k =>
          struct(lit(k).as("lag"),
            lag(col("__x"), k).over(byDay).as("y"))): _*).as("__ls"))
        .select(col("__x"), explode(col("__ls")).as("__l"))
        .select(col("__l.lag").as("lag"), col("__x"),
          col("__l.y").as("__y"))
        .filter(col("__y").isNotNull)
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      lagged.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("__x")).cast(DecimalType(38, 0)).as("__sx"),
          sum(col("__y")).cast(DecimalType(38, 0)).as("__sy"),
          sum(col("__x") * col("__y")).cast(DecimalType(38, 0)).as("__sxy"),
          sum(col("__x") * col("__x")).cast(DecimalType(38, 0)).as("__sxx"),
          sum(col("__y") * col("__y")).cast(DecimalType(38, 0)).as("__syy"))
        .select(col("lag"), col("n_pairs"),
          round((d(col("n_pairs")) * d(col("__sxy")) -
            d(col("__sx")) * d(col("__sy"))) /
            sqrt((d(col("n_pairs")) * d(col("__sxx")) -
              d(col("__sx")) * d(col("__sx"))) *
              (d(col("n_pairs")) * d(col("__syy")) -
                d(col("__sy")) * d(col("__sy")))), 6).as("acf"))
        .orderBy(col("lag").asc)
    }),

    // HITS hubs & authorities over the customer→part purchase bipartite
    // graph: a customer is a good HUB when they buy authoritative parts,
    // a part a good AUTHORITY when bought by good hubs — the two-sided
    // centrality PageRank's single score conflates (q30/q75's
    // complement). Fixed-point integer recurrence, max-normalized per
    // half-round; the oracle unrolls all four rounds with a max()
    // subquery each (see ops/Hits.scala for the bit-exactness contract).
    "q82_hits" -> ((s, dir) => {
      val e = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("hub"), col("l_partkey").as("auth"))
      graft.ops.Hits.fixedPointHits(e, iterations = 4)
    }),

    // CUSUM changepoint detection on daily revenue: the k maximizing
    // |n·cum_k − k·total| — the cross-multiplied form of the classic
    // max|cumsum − k·mean| statistic, so every intermediate is an exact
    // long (cents) and the argmax day is deterministic (ties break to
    // the earliest day; the q79 TakeOrderedAndProject pick). The cumsum
    // window runs over the DAY aggregate (dimension-sized by contract);
    // n and total ride a 1-row broadcast (t16 discipline).
    "q83_cusum" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("__day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("__x"))
      val byDay = Window.orderBy(col("__day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nt = daily.agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("total_cents"))
      daily
        .withColumn("__k",
          row_number().over(Window.orderBy(col("__day").asc)).cast("long"))
        .withColumn("__cum", sum(col("__x")).over(byDay))
        .crossJoin(broadcast(nt))
        .select(col("__day").as("change_day"), col("n_days"),
          col("total_cents"),
          abs(col("n_days") * col("__cum") - col("__k") * col("total_cents"))
            .as("s_num"))
        .orderBy(col("s_num").desc, col("change_day").asc)
        .limit(1)
        .select(col("change_day"), col("n_days"), col("total_cents"),
          col("s_num"),
          round(col("s_num").cast("double") /
            (col("n_days").cast("double") * col("total_cents").cast("double")),
            6).as("cusum_stat"))
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

    // Per-vertex local clustering structure over the q35 co-order part
    // graph: how many triangles each part participates in vs its wedge
    // capacity C(deg,2) — the standard "how clique-like is each
    // node's neighborhood" readout (coefficient = triangles/wedges,
    // left as integers for bit-portability). One degree-ordered
    // traversal credits all three corners of every triangle in a
    // single pass (Triangles.vertexTriangles).
    "q85_clustering" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.ops.Triangles.vertexTriangles(edges)
    }),

    // Kaplan–Meier risk table of customer engagement lifetimes —
    // survival analysis's standard input. Lifetime = days between a
    // customer's first and last order; the observation is an EVENT
    // (churn) when the last order predates the corpus horizon by >90
    // days, else right-CENSORED (still active at horizon). Output per
    // distinct lifetime t: the at-risk count (lifetime ≥ t, a reverse
    // cumsum), events at t, censored at t — all integers, so the
    // estimator Π(1 − dᵢ/nᵢ) is derivable bit-exactly downstream.
    // One customer-keyed partial agg, a 1-row horizon broadcast, and
    // a window over the ≤|distinct days| aggregate (the q58/q83
    // aggregate-sized global-window exception).
    "q86_survival" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val life = o.groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("__d0"),
          max(col("o_orderdate")).as("__d1"))
      val horizon = o.agg(max(col("o_orderdate")).as("__dmax"))
      val lab = life.crossJoin(broadcast(horizon))
        .select(datediff(col("__d1"), col("__d0")).cast("long").as("t_days"),
          when(col("__d1") < col("__dmax") - expr("INTERVAL 90 DAYS"), 1L)
            .otherwise(0L).as("__ev"))
      val byT = lab.groupBy(col("t_days"))
        .agg(count(lit(1)).as("__n"),
          sum(col("__ev")).as("n_events"),
          (count(lit(1)) - sum(col("__ev"))).as("n_censored"))
      val w = Window.orderBy(col("t_days").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("n_risk", sum(col("__n")).over(w))
        .select(col("t_days"), col("n_risk"), col("n_events"),
          col("n_censored"))
    }),

    // Pointwise mutual information between order priority and order
    // status —
    // the association readout q66's chi-square tests but localized per
    // cell (which (mode, flag) pairs co-occur MORE than independence
    // predicts, and by how many bits). Marginals and the total are
    // derived FROM the joint table (one fact-scan groupBy; everything
    // downstream is |X|·|Y|-bounded broadcast work). Counts stay
    // exact integers; pmi is the one closing log₂ over exact ratios,
    // round-6 (the t11 cross-engine double class).
    "q87_mutual_info" -> ((s, dir) => {
      val joint = table(s, dir, "orders")
        .select(col("o_orderpriority").as("x"), col("o_orderstatus").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
      val mx = joint.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
      val my = joint.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
      val nt = joint.agg(sum(col("n_xy")).as("n"))
      joint.join(broadcast(mx), Seq("x"))
        .join(broadcast(my), Seq("y"))
        .crossJoin(broadcast(nt))
        .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
          col("n"),
          round(log2((col("n_xy").cast("double") * col("n").cast("double")) /
            (col("n_x").cast("double") * col("n_y").cast("double"))), 6)
            .as("pmi"))
    }),

    // Day-of-week seasonal index of revenue — the multiplicative
    // seasonality readout that pairs with q81's ACF (ACF says "there
    // IS a weekly cycle"; this says which weekdays run hot/cold and by
    // how much). Integer-cents day aggregate (the q81/q83 idiom)
    // rolled to 7 dow rows; the index (dow mean / overall mean) is the
    // one closing double chain over exact sums, round-6.
    "q88_seasonality" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("__day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("__cents"))
      val byDow = daily
        .groupBy(dayofweek(col("__day")).cast("long").as("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("__cents")).as("total_cents"))
      val g = byDow.agg(sum(col("n_days")).as("__gd"),
        sum(col("total_cents")).as("__gt"))
      byDow.crossJoin(broadcast(g))
        .select(col("dow"), col("n_days"), col("total_cents"),
          round((col("total_cents").cast("double") * col("__gd").cast("double")) /
            (col("n_days").cast("double") * col("__gt").cast("double")), 6)
            .as("seasonal_index"))
    }),

    // Bootstrap 95% CI for MEAN DAILY REVENUE — distributed resampling
    // inference, fully deterministic: B=200 replicates each redraw the
    // N calendar days with replacement via the shared two-round LCG
    // (seed 42, the p07/q43 recurrence, engine-portable), replicate
    // sums stay exact integer cents, and the CI bounds are actual
    // replicate values under the q49 integer-rank rule (rank
    // 1+(B−1)·p‰ div 1000 of the (sum, b)-ordered replicates). Scale
    // shape: the day table is dimension-sized (calendar-bounded), so
    // the B·N draw fan-out is bounded too — the 200-row replicate axis
    // broadcasts, draws join back on the day index, one partially-
    // aggregated groupBy per replicate. Closing means are round-6
    // doubles over exact sums.
    "q89_bootstrap_ci" -> ((s, dir) => {
      val B = 200L
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("__day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("__cents"))
      val idx = daily.select(col("__cents"),
        row_number().over(Window.orderBy(col("__day").asc))
          .cast("long").as("__k"))
        .localCheckpoint() // calendar-bounded; reused for n/draws/join/point
      val n = idx.count()
      val draws = idx.select(col("__k"))
        .crossJoin(broadcast(s.range(B).select(col("id").as("__b"))))
        .select(col("__b"),
          (pmod(graft.ops.Sharding.lcgRank(
            col("__b") * lit(n) + col("__k") - 1), lit(n)) + 1).as("__kk"))
      val reps = draws
        .join(idx.select(col("__k").as("__kk"), col("__cents")), Seq("__kk"))
        .groupBy(col("__b")).agg(sum(col("__cents")).as("__rs"))
      val ranked = reps.select(col("__b"), col("__rs"),
        row_number().over(Window.orderBy(col("__rs").asc, col("__b").asc))
          .cast("long").as("__r"))
      val lo = ranked.filter(col("__r") === lit(1 + (B - 1) * 25 / 1000))
        .select(col("__rs").as("lo_sum"))
      val hi = ranked.filter(col("__r") === lit(1 + (B - 1) * 975 / 1000))
        .select(col("__rs").as("hi_sum"))
      idx.agg(sum(col("__cents")).as("point_sum"))
        .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
        .select(lit(n).as("n_days"), lit(B).as("b_reps"),
          col("point_sum"), col("lo_sum"), col("hi_sum"),
          round(col("point_sum").cast("double") / lit(n.toDouble), 6)
            .as("point_mean"),
          round(col("lo_sum").cast("double") / lit(n.toDouble), 6)
            .as("lo_mean"),
          round(col("hi_sum").cast("double") / lit(n.toDouble), 6)
            .as("hi_mean"))
    }),

    // Entropy RATE of the event-type Markov chain — how predictable is
    // the next user action given the current one, in bits (the
    // information-theoretic roll-up of s11's transition matrix; q84's
    // trigrams list WHICH paths dominate, this says how much room for
    // surprise remains). H = −Σ n_ft·log₂(n_ft/n_f) / N over exact
    // counts: one user-keyed lag window, a |types|²-bounded cell
    // table, per-cell round-6 terms summed as exact DECIMAL (the t30
    // order-independent class), one closing division.
    "q92_transition_entropy" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val cells = table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("__f", lag(col("event_type"), 1).over(w))
        .filter(col("__f").isNotNull)
        .groupBy(col("__f"), col("event_type"))
        .agg(count(lit(1)).as("__nft"))
      val marg = cells.groupBy(col("__f")).agg(sum(col("__nft")).as("__nf"))
      cells.join(broadcast(marg), Seq("__f"))
        .select(col("__f"), col("__nft"),
          round(col("__nft").cast("double") *
            log2(col("__nft").cast("double") / col("__nf").cast("double")),
            6)
            .cast(DecimalType(18, 6)).as("__term"))
        .agg(sum(col("__nft")).as("n_transitions"),
          countDistinct(col("__f")).as("n_states"),
          sum(col("__term")).cast(DecimalType(38, 6)).as("__s"))
        .select(col("n_transitions"), col("n_states"),
          round(-col("__s").cast("double") /
            col("n_transitions").cast("double"), 6)
            .as("entropy_rate_bits"))
    }),

    // Burstiness (Fano factor) per event type: variance/mean of hourly
    // counts over the corpus's FULL hour span (zero hours included via
    // the closed form — they never materialize as rows), the
    // overdispersion readout that separates Poisson-like traffic
    // (F≈1) from bursty types (F≫1). The q46 mergeable-sums shape:
    // per-type (n_events, Σx² over active hours) partially aggregate;
    // the span is a 1-row broadcast; F = (n·Σx² − Sx²)/(n·Sx) is one
    // round-6 double chain over exact int64 products.
    "q91_fano_burstiness" -> ((s, dir) => {
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 3600").as("__h"))
        .agg(count(lit(1)).as("__c"))
      val span = table(s, dir, "events")
        .agg((max(expr("unix_timestamp(ts) div 3600")) -
          min(expr("unix_timestamp(ts) div 3600")) + 1L).as("n_hours"))
      hourly.groupBy(col("event_type"))
        .agg(sum(col("__c")).as("n_events"),
          sum(col("__c") * col("__c")).as("sum_sq"))
        .crossJoin(broadcast(span))
        .select(col("event_type"), col("n_hours"), col("n_events"),
          col("sum_sq"),
          round((col("n_hours").cast("double") * col("sum_sq").cast("double") -
            col("n_events").cast("double") * col("n_events").cast("double")) /
            (col("n_hours").cast("double") * col("n_events").cast("double")),
            6).as("fano"))
    }),

    // Degree ASSORTATIVITY of the co-order part graph — do high-degree
    // parts co-occur with other hubs (r>0) or with the periphery
    // (r<0)? Pearson over endpoint degrees with every undirected edge
    // counted in both orientations, which makes the x/y marginals
    // identical — so only (m, Σd, Σdd', Σd²) are needed, all EXACT
    // int64 (the q46/q53 mergeable-sums shape: two vertex-keyed
    // degree joins, one partial agg, combinable across shards at any
    // scale). The closing r is one round-6 double chain.
    "q90_assortativity" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").cast("long").as("lo"),
          col("y.l_partkey").cast("long").as("hi"))
        .distinct()
      val deg = e.select(col("lo").as("v"))
        .unionAll(e.select(col("hi").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val both = e.select(col("lo").as("a"), col("hi").as("b"))
        .unionAll(e.select(col("hi").as("a"), col("lo").as("b")))
      both
        .join(deg.select(col("v").as("a"), col("d").as("__da")), Seq("a"))
        .join(deg.select(col("v").as("b"), col("d").as("__db")), Seq("b"))
        .agg(count(lit(1)).as("m_edges"),
          sum(col("__da")).as("sx"),
          sum(col("__da") * col("__db")).as("sxy"),
          sum(col("__da") * col("__da")).as("sxx"))
        .select(col("m_edges"), col("sx"), col("sxy"), col("sxx"),
          round((col("m_edges").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) /
            (col("m_edges").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("assortativity"))
    }),

    // Customer-revenue decile LIFT table per market segment — the
    // gain/Lorenz chart of every targeting deck: who are the top-10%
    // spenders and what share of segment revenue do they carry? Spend
    // is an exact-DECIMAL per-customer aggregate; the ntile ranking
    // runs over the CUSTOMER aggregate partitioned by segment (the q63
    // dimension-sized window discipline — the fact table never sorts),
    // and cumulative shares stay DECIMAL until the two closing round-6
    // divisions.
    "q93_decile_lift" -> ((s, dir) => {
      val spend = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 6)).as("__rev"))
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_custkey"),
          col("__rev"))
      val rankW = Window.partitionBy(col("segment"))
        .orderBy(col("__rev").desc, col("o_custkey").asc)
      val per = spend.withColumn("decile", ntile(10).over(rankW))
        .groupBy(col("segment"), col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("__rev")).cast(DecimalType(38, 6)).as("__drev"))
      val cumW = Window.partitionBy(col("segment"))
        .orderBy(col("decile").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("segment"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("__cum",
          sum(col("__drev")).over(cumW).cast(DecimalType(38, 6)))
        .withColumn("__tot",
          sum(col("__drev")).over(totW).cast(DecimalType(38, 6)))
        .select(col("segment"), col("decile"), col("n_customers"),
          col("__drev").cast("double").as("decile_revenue"),
          round(col("__drev").cast("double") /
            col("__tot").cast("double"), 6).as("revenue_share"),
          round(col("__cum").cast("double") /
            col("__tot").cast("double"), 6).as("cum_share"))
    }),

    // Newman MODULARITY of the brand partition over the co-order part
    // graph — does the catalog's own brand taxonomy explain the
    // co-purchase structure? Q = Σ_c [e_c/m − (d_c/2m)²] decomposed to
    // its per-community terms (inspectable: which brands are genuine
    // communities). Everything through the per-community (n_vertices,
    // degree_sum, intra_edges) triple is EXACT int64 via vertex-keyed
    // joins + partial aggs (the q90 mergeable-sums shape — the
    // endpoint-community join is on the part DIMENSION, broadcast-
    // sized); m rides a 1-row broadcast and each term is one round-6
    // double chain.
    "q94_modularity" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").cast("long").as("lo"),
          col("y.l_partkey").cast("long").as("hi"))
        .distinct()
      val brand = table(s, dir, "part")
        .select(col("p_partkey").cast("long").as("v"),
          col("p_brand").as("__comm"))
      val eb = e
        .join(broadcast(brand.select(col("v").as("lo"),
          col("__comm").as("__ca"))), Seq("lo"))
        .join(broadcast(brand.select(col("v").as("hi"),
          col("__comm").as("__cb"))), Seq("hi"))
      val m = eb.agg(count(lit(1)).as("__m"))
      val intra = eb.filter(col("__ca") === col("__cb"))
        .groupBy(col("__ca").as("community"))
        .agg(count(lit(1)).as("__intra"))
      val dsum = e.select(col("lo").as("v"))
        .unionAll(e.select(col("hi").as("v")))
        .groupBy("v").agg(count(lit(1)).as("__d"))
        .join(broadcast(brand), Seq("v"))
        .groupBy(col("__comm").as("community"))
        .agg(count(lit(1)).as("n_vertices"),
          sum(col("__d")).as("degree_sum"))
      dsum.join(intra, Seq("community"), "left")
        .select(col("community"), col("n_vertices"), col("degree_sum"),
          coalesce(col("__intra"), lit(0L)).as("intra_edges"))
        .crossJoin(broadcast(m))
        .select(col("community"), col("n_vertices"), col("degree_sum"),
          col("intra_edges"),
          round(col("intra_edges").cast("double") /
            col("__m").cast("double") -
            (col("degree_sum").cast("double") /
              (lit(2.0) * col("__m").cast("double"))) *
            (col("degree_sum").cast("double") /
              (lit(2.0) * col("__m").cast("double"))), 6)
            .as("modularity_term"))
    }),

    // Hill tail-index of the co-order part degree distribution — the
    // MLE power-law exponent α̂ = 1 + n/Σln(dᵢ/x_min) over the heavy
    // tail (d ≥ 8), the scale-free-or-not verdict on the q57
    // histogram. Degrees are exact int64; each ln ratio is a round-6
    // DECIMAL term so the cross-row sum is order-invariant (the q92
    // entropy-term discipline), and the closing α is one double chain.
    "q95_hill_tail" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").cast("long").as("lo"),
          col("y.l_partkey").cast("long").as("hi"))
        .distinct()
      e.select(col("lo").as("v"))
        .unionAll(e.select(col("hi").as("v")))
        .groupBy("v").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= 8L)
        .select(round(log(col("__d").cast("double") / lit(8.0)), 6)
          .cast(DecimalType(18, 6)).as("__t"))
        .agg(count(lit(1)).as("n_tail"),
          sum(col("__t")).cast(DecimalType(38, 6)).as("__s"))
        .select(col("n_tail"),
          col("__s").cast("double").as("sum_log_ratio"),
          round(lit(1.0) + col("n_tail").cast("double") /
            col("__s").cast("double"), 6).as("hill_alpha"))
    }),

    // LPA community DISCOVERY over the co-order part graph: 3
    // synchronous label-propagation rounds, ties pinned to min-label —
    // q94 scores the GIVEN brand taxonomy; this finds the data's own
    // partition. Integer labels + fixed rounds make the run a
    // deterministic function of the edge set, so the oracle replays
    // all three rounds unrolled (the q30 discipline; float-free —
    // ops/LabelProp.scala for the co-partitioned round shape).
    "q96_label_prop" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        .distinct()
      graft.ops.LabelProp.propagate(e, rounds = 3)
    }),

    // LINK PREDICTION over the co-order part graph: for part pairs that
    // are NOT yet co-purchased, the three classic neighborhood scores —
    // common-neighbor count, Jaccard, Adamic–Adar — over each pivot's
    // first-32 neighbors by id (deterministic adjacency truncation: the
    // neighbor-sampling move that keeps Σdeg² wedge cost linear in |V|
    // on a dense graph, replayed exactly by the oracle's row_number
    // cut). AA weights use full pivot degree; each term is round-6 of
    // one libm ln summed as exact DECIMAL (the t11 discipline); jaccard
    // is one integer-ratio round-6 division (ops/LinkPrediction.scala).
    "q97_link_prediction" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").cast("long").as("lo"),
          col("y.l_partkey").cast("long").as("hi"))
        .distinct()
      graft.ops.LinkPrediction.neighborScores(
        e, maxFanout = 32, minCommon = 12)
    }),

    // Random-walk CORPUS over the co-order part graph: 3 deterministic
    // 4-step walks from every vertex — the DeepWalk/node2vec skip-gram
    // training sentences. Step choice = shared glibc LCG keyed on
    // (vertex, step, walk) mod degree against the id-ranked adjacency
    // list; a pure function of (edge set, seed), so the oracle replays
    // all four steps unrolled (ops/RandomWalks.scala for the
    // two-co-partitioned-joins-per-step scale shape).
    "q98_random_walks" -> ((s, dir) => {
      val lp = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = lp.as("x").join(lp.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").cast("long").as("lo"),
          col("y.l_partkey").cast("long").as("hi"))
        .distinct()
      graft.ops.RandomWalks.walkCorpus(
        e, steps = 4, walksPerVertex = 3, seed = 11L)
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

    // Per-brand DISCOUNT ELASTICITY: grouped OLS of quantity on
    // discount — does discounting move volume, and for which brands?
    // The q90 normal-equation discipline grouped: all five sums are
    // DECIMAL-exact (discount ≤ 6dp, products ≤ 12dp), one fixed
    // double epilogue per brand, dimension joined by broadcast.
    "q107_discount_elasticity" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_partkey"),
          col("l_discount").cast(DecimalType(18, 6)).as("__x"),
          col("l_quantity").cast("long").as("__y"))
      val p = table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val g = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("__x")).cast(DecimalType(38, 6)).as("__sx"),
          sum(col("__y")).as("__sy"),
          sum(col("__x") * col("__y")).cast(DecimalType(38, 6)).as("__sxy"),
          sum(col("__x") * col("__x")).cast(DecimalType(38, 12)).as("__sxx"))
      val nD = col("n").cast("double")
      val slope = (nD * col("__sxy").cast("double") -
        col("__sx").cast("double") * col("__sy").cast("double")) /
        (nD * col("__sxx").cast("double") -
          col("__sx").cast("double") * col("__sx").cast("double"))
      g.select(col("p_brand"), col("n"),
        round(slope, 6).as("slope_qty_per_discount"),
        round((col("__sy").cast("double") - slope *
          col("__sx").cast("double")) / nD, 6).as("intercept_qty"))
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

    // STL-lite seasonal DECOMPOSITION of daily revenue: additive
    // trend (centered 7-day moving average over exact integer cents) +
    // day-of-week seasonal (mean of the detrended series per dow) +
    // residual — the classical decomposition behind every "is this dip
    // seasonal or real" question; q88 scores the seasonal axis alone,
    // this splits the whole series. Interior days only (full ±3-day
    // RANGE window). Integer cents ride the windows exactly; detrended
    // terms are round-6 then DECIMAL-summed (the t11 cross-row
    // discipline); the day-aggregate frame is dimension-sized by
    // contract (the q81/q83 family), so its global window is one
    // bounded task.
    "q100_stl_decompose" -> ((s, dir) => {
      val daily = table(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("__cents"))
        .withColumn("__ed", datediff(col("day").cast("date"),
          lit("1970-01-01").cast("date")).cast("long"))
      val wR = Window.orderBy(col("__ed")).rangeBetween(-3, 3)
      val t = daily
        .withColumn("__s7", sum(col("__cents")).over(wR))
        .withColumn("__n7", count(lit(1)).over(wR))
        .filter(col("__n7") === 7)
        .withColumn("trend",
          round(col("__s7").cast("double") / 7.0, 6))
        .withColumn("__detr",
          round(col("__cents").cast("double") - col("trend"), 6)
            .cast(DecimalType(18, 6)))
        .withColumn("dow", dayofweek(col("day")).cast("long"))
      val se = t.groupBy(col("dow"))
        .agg(round(
          sum(col("__detr")).cast(DecimalType(38, 6)).cast("double") /
            count(lit(1)).cast("double"), 6).as("seasonal"))
      t.join(se, Seq("dow"))
        .select(col("day"), col("dow"),
          col("__cents").as("revenue_cents"), col("trend"),
          col("seasonal"),
          round(col("__detr").cast("double") - col("seasonal"), 6)
            .as("residual"))
    }),

    // UNPIVOT (melt): the q20 segment×priority matrix stacked back to
    // tidy (segment, bucket, count) rows — the wide→long reshape every
    // downstream groupBy wants, exercising Spark's native Unpivot node
    // (the EXPAND-style dual of PIVOT's aggregate).
    "q101_unpivot_priority" -> ((s, dir) =>
      queries("q20_pivot_priority")(s, dir)
        .unpivot(
          Array(col("c_mktsegment")),
          Array(col("n_urgent"), col("n_high"), col("n_medium"),
            col("n_notspec"), col("n_low")),
          "priority_bucket", "n_orders")),

    // WEIGHTED median: per (returnflag, linestatus), the smallest price
    // whose cumulative QUANTITY reaches half the total — "the price at
    // which half the units moved", which a row-median can't answer. The
    // q73 histogram discipline: the window runs over DISTINCT prices
    // with pre-summed integer weights (never raw lineitems), and the
    // pick is the 2·cum ≥ W integer rule — division-free, bit-portable.
    "q102_weighted_median" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("__p"),
          col("l_quantity").cast("long").as("__q"))
      val h = li.groupBy(col("l_returnflag"), col("l_linestatus"),
          col("__p"))
        .agg(sum(col("__q")).as("__w"))
      val wCum = Window
        .partitionBy(col("l_returnflag"), col("l_linestatus"))
        .orderBy(col("__p").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window
        .partitionBy(col("l_returnflag"), col("l_linestatus"))
      h.withColumn("__cum", sum(col("__w")).over(wCum))
        .withColumn("__tw", sum(col("__w")).over(wAll))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("__w")).as("total_weight"),
          count(lit(1)).as("n_prices"),
          min(when(col("__cum") * 2 >= col("__tw"), col("__p")))
            .as("weighted_median_price"))
    }),

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

    // Negative-edge sampling over the q30 graph (customers ↔ parts):
    // per customer vertex, up to 4 deterministic LCG-drawn part vertices
    // it did NOT buy — link-prediction / graph-embedding training
    // negatives (Sampling.negativeEdges). The part-key domain bound is
    // one 1-row agg read at plan build (bounded driver action, the
    // centroid-training precedent); the draw itself is a pure column
    // function, so membership survives any repartitioning.
    "q43_negative_edges" -> ((s, dir) => {
      val lo = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val edges = lo.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      // dense TPC-H part keys: domain = [1, max]; 1-row bounded read
      val maxPk = table(s, dir, "part")
        .agg(max(col("p_partkey"))).head.getLong(0)
      graft.ops.Sampling.negativeEdges(
        edges, dstDomainMax = maxPk, dstOf = h => (h + 1) * 2 + 1,
        perSrc = 4, seed = 42L)
    }),

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
          sum(col("k")).as("sum_k")))
  )

  /** q30's oracle replays the fixed-point recurrence round for round:
    * DuckDB `//` (floor div) == Spark `div` (trunc) on the all-positive
    * ranks, and the scaled-BIGINT sums are order-invariant, so the
    * 5-round unroll is bit-identical to the Spark iteration.
    */
  private val q30OracleSql: String = {
    val rounds = (1 to 5).map { i =>
      s"""r$i AS (SELECT d.dst AS vertex,
           CAST(150000000000 + (85 * sum(r${i - 1}.r // d.outdeg)) // 100 AS BIGINT) AS r
         FROM d JOIN r${i - 1} ON d.src = r${i - 1}.vertex GROUP BY d.dst)"""
    }.mkString(",\n         ")
    s"""WITH p AS (SELECT DISTINCT o_custkey * 2 AS u, l_partkey * 2 + 1 AS v
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT u AS src, v AS dst FROM p
               UNION ALL SELECT v AS src, u AS dst FROM p),
         d AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg
               FROM e),
         r0 AS (SELECT DISTINCT src AS vertex,
                  CAST(1000000000000 AS BIGINT) AS r FROM e),
         $rounds
       SELECT vertex, r FROM r5"""
  }

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

  /** q75's oracle: the q30 unroll generalized to weights — the same
    * floor-div parity argument, contribution (r·w) // wsum.
    */
  private val q75OracleSql: String = {
    val rounds = (1 to 5).map { i =>
      s"""r$i AS (SELECT d.dst AS vertex,
           CAST(15000000 + (85 * sum((r${i - 1}.r * d.w) // d.wsum)) // 100
             AS BIGINT) AS r
         FROM d JOIN r${i - 1} ON d.src = r${i - 1}.vertex GROUP BY d.dst)"""
    }.mkString(",\n         ")
    s"""WITH lp AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(count(*) AS BIGINT) AS w
           FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey <> b.l_partkey
           GROUP BY 1, 2),
         d AS (SELECT src, dst, w,
                 CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS wsum
               FROM e),
         r0 AS (SELECT DISTINCT src AS vertex,
                  CAST(100000000 AS BIGINT) AS r FROM e),
         $rounds
       SELECT vertex, r FROM r5"""
  }

  /** q82's oracle: four unrolled HITS rounds — per half-round the same
    * partner-score sum and (r·scale) // max(r) normalization, the max a
    * scalar subquery over that half-round's CTE.
    */
  private val q82OracleSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""hr$i AS (SELECT hub, CAST(sum(s) AS BIGINT) AS r
           FROM e JOIN a${i - 1} ON e.auth = a${i - 1}.v GROUP BY hub),
         h$i AS (SELECT hub AS v,
             CAST((r * 1000000) // (SELECT max(r) FROM hr$i) AS BIGINT) AS s
           FROM hr$i),
         ar$i AS (SELECT auth, CAST(sum(s) AS BIGINT) AS r
           FROM e JOIN h$i ON e.hub = h$i.v GROUP BY auth),
         a$i AS (SELECT auth AS v,
             CAST((r * 1000000) // (SELECT max(r) FROM ar$i) AS BIGINT) AS s
           FROM ar$i)"""
    }.mkString(",\n         ")
    s"""WITH e AS MATERIALIZED (
           SELECT DISTINCT o_custkey AS hub, l_partkey AS auth
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         a0 AS (SELECT DISTINCT auth AS v,
                  CAST(1000000 AS BIGINT) AS s FROM e),
         $rounds
       SELECT v AS vertex, s AS score, false AS hub_side FROM a4
       UNION ALL
       SELECT v AS vertex, s AS score, true AS hub_side FROM h4"""
  }

  /** q78's oracle: four unrolled Bellman–Ford rounds — the same
    * relax-then-min fold, pure integer, over the same min-collapsed
    * co-purchase edge list.
    */
  private val q78OracleSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d${i - 1}
           UNION ALL
           SELECT e.dst, d${i - 1}.dist + e.len
           FROM d${i - 1} JOIN e ON e.src = d${i - 1}.node) GROUP BY node)"""
    }.mkString(",\n         ")
    s"""WITH lp AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(1000000 // count(*) AS BIGINT) AS len
           FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey <> b.l_partkey
           GROUP BY 1, 2),
         d0 AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS node,
                  CAST(0 AS BIGINT) AS dist
                FROM lineitem WHERE l_partkey < 10),
         $rounds
       SELECT node, dist FROM d4"""
  }

  val oracles: Map[String, String] = Map(
    "q75_weighted_pagerank" -> q75OracleSql,
    "q78_sssp" -> q78OracleSql,
    "q82_hits" -> q82OracleSql,
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
    // Independent formulation of q85: triangles as ordered a<b<c edge
    // triples (the q35 oracle form), each credited to its three
    // corners by UNION ALL — no degree direction, no adjacency
    // arrays.
    "q85_clustering" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS lo,
                 CAST(b.l_partkey AS BIGINT) AS hi
               FROM lp a JOIN lp b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
         tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
                 FROM e e1
                 JOIN e e2 ON e2.lo = e1.hi
                 JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
         tv AS (SELECT a AS vertex FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri),
         t AS (SELECT vertex, CAST(count(*) AS BIGINT) AS triangles
               FROM tv GROUP BY 1),
         deg AS (SELECT vertex, CAST(count(*) AS BIGINT) AS degree
                 FROM (SELECT lo AS vertex FROM e
                       UNION ALL SELECT hi FROM e)
                 GROUP BY 1)
       SELECT d.vertex, d.degree,
         COALESCE(t.triangles, CAST(0 AS BIGINT)) AS triangles,
         CAST(d.degree * (d.degree - 1) // 2 AS BIGINT) AS wedges
       FROM deg d LEFT JOIN t USING (vertex)""",
    // Mirrors q86: date_diff('day', …) on the midnight-UTC order
    // timestamps is Spark's datediff (the q59 idiom); the 90-day
    // horizon label, per-lifetime counts, and reverse cumsum are pure
    // integer arithmetic.
    "q86_survival" ->
      """WITH l AS (SELECT o_custkey, min(o_orderdate) AS d0,
                 max(o_orderdate) AS d1
               FROM orders GROUP BY 1),
         g AS (SELECT max(o_orderdate) AS dmax FROM orders),
         lab AS (SELECT CAST(date_diff('day', d0, d1) AS BIGINT) AS t_days,
                   CASE WHEN d1 < dmax - INTERVAL 90 DAY THEN 1 ELSE 0
                     END AS ev
                 FROM l, g),
         byt AS (SELECT t_days, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(ev) AS BIGINT) AS n_events,
                   CAST(count(*) - sum(ev) AS BIGINT) AS n_censored
                 FROM lab GROUP BY 1)
       SELECT t_days,
         CAST(sum(n) OVER (ORDER BY t_days DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk,
         n_events, n_censored
       FROM byt""",
    // Mirrors q87: marginals/total recomputed from the joint counts,
    // identical (n_xy·n)/(n_x·n_y) double chain under log2, round-6.
    "q87_mutual_info" ->
      """WITH j AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
                 CAST(count(*) AS BIGINT) AS n_xy
               FROM orders GROUP BY 1, 2),
         mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM j GROUP BY 1),
         my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM j GROUP BY 1),
         nt AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM j)
       SELECT j.x, j.y, j.n_xy, mx.n_x, my.n_y, nt.n,
         round(log2((CAST(j.n_xy AS DOUBLE) * CAST(nt.n AS DOUBLE)) /
           (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE))), 6) AS pmi
       FROM j JOIN mx USING (x) JOIN my USING (y), nt""",
    // Mirrors q88: identical integer-cents day sums; DuckDB dayofweek
    // is 0=Sunday where Spark's is 1=Sunday, hence the +1.
    "q88_seasonality" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         w AS (SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(cents) AS BIGINT) AS total_cents
               FROM d GROUP BY 1),
         g AS (SELECT CAST(sum(n_days) AS BIGINT) AS gd,
                 CAST(sum(total_cents) AS BIGINT) AS gt FROM w)
       SELECT dow, n_days, total_cents,
         round((CAST(total_cents AS DOUBLE) * CAST(gd AS DOUBLE)) /
           (CAST(n_days AS DOUBLE) * CAST(gt AS DOUBLE)), 6)
           AS seasonal_index
       FROM w, g""",
    // Mirrors q89: identical integer-cents day sums and day-index
    // order, the SAME two-round LCG recurrence (seed 42 → +12387, the
    // q43 constants) over id = b·n + k − 1, the same (sum, b)-ordered
    // integer-rank CI picks, the same round-6 closing divisions.
    "q89_bootstrap_ci" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         i AS (SELECT cents,
                 CAST(row_number() OVER (ORDER BY day ASC) AS BIGINT) AS k
               FROM d),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         dr AS (SELECT b.range AS b,
                  ((((b.range * nn.n + i.k - 1) % 2147483648)
                    * 1103515245 + 12387)
                    % 2147483648 * 1103515245 + 12345)
                    % 2147483648 % nn.n + 1 AS kk
                FROM range(200) b, i, nn),
         reps AS (SELECT dr.b, CAST(sum(i2.cents) AS BIGINT) AS rs
                  FROM dr JOIN i i2 ON i2.k = dr.kk GROUP BY 1),
         rk AS (SELECT rs,
                  CAST(row_number() OVER (ORDER BY rs ASC, b ASC)
                    AS BIGINT) AS r
                FROM reps),
         lo AS (SELECT rs AS lo_sum FROM rk WHERE r = 1 + (199 * 25) // 1000),
         hi AS (SELECT rs AS hi_sum FROM rk WHERE r = 1 + (199 * 975) // 1000),
         pt AS (SELECT CAST(sum(cents) AS BIGINT) AS point_sum FROM d)
       SELECT nn.n AS n_days, CAST(200 AS BIGINT) AS b_reps,
         point_sum, lo_sum, hi_sum,
         round(CAST(point_sum AS DOUBLE) / CAST(nn.n AS DOUBLE), 6)
           AS point_mean,
         round(CAST(lo_sum AS DOUBLE) / CAST(nn.n AS DOUBLE), 6)
           AS lo_mean,
         round(CAST(hi_sum AS DOUBLE) / CAST(nn.n AS DOUBLE), 6)
           AS hi_mean
       FROM pt, lo, hi, nn""",
    // Mirrors q92: same (ts, event_id) lag cells, identical
    // n·log₂(n/m) double chain per cell, round-6 terms summed as
    // exact DECIMAL, one closing division.
    "q92_transition_entropy" ->
      """WITH p AS (SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS f
           FROM events),
         c AS (SELECT f, event_type AS t2, CAST(count(*) AS BIGINT) AS n_ft
               FROM p WHERE f IS NOT NULL GROUP BY 1, 2),
         m AS (SELECT f, CAST(sum(n_ft) AS BIGINT) AS n_f
               FROM c GROUP BY 1),
         t AS (SELECT c.n_ft,
                 CAST(round(CAST(c.n_ft AS DOUBLE) *
                   log2(CAST(c.n_ft AS DOUBLE) / CAST(m.n_f AS DOUBLE)),
                   6) AS DECIMAL(18,6)) AS term,
                 c.f
               FROM c JOIN m USING (f))
       SELECT CAST(sum(n_ft) AS BIGINT) AS n_transitions,
         CAST(count(DISTINCT f) AS BIGINT) AS n_states,
         round(-CAST(CAST(sum(term) AS DECIMAL(38,6)) AS DOUBLE) /
           CAST(sum(n_ft) AS DOUBLE), 6) AS entropy_rate_bits
       FROM t""",
    // Mirrors q91: epoch_us//3600000000 is Spark's unix_timestamp div
    // 3600 for positive epochs; identical exact sums and closing
    // double chain.
    "q91_fano_burstiness" ->
      """WITH h AS (SELECT event_type,
                 epoch_us(ts) // 3600000000 AS hh,
                 CAST(count(*) AS BIGINT) AS c
               FROM events GROUP BY 1, 2),
         sp AS (SELECT CAST(max(epoch_us(ts) // 3600000000) -
                   min(epoch_us(ts) // 3600000000) + 1 AS BIGINT)
                   AS n_hours
                FROM events),
         g AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
                 CAST(sum(c * c) AS BIGINT) AS sum_sq
               FROM h GROUP BY 1)
       SELECT event_type, n_hours, n_events, sum_sq,
         round((CAST(n_hours AS DOUBLE) * CAST(sum_sq AS DOUBLE) -
           CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)) /
           (CAST(n_hours AS DOUBLE) * CAST(n_events AS DOUBLE)), 6)
           AS fano
       FROM g, sp""",
    // Mirrors q90: same deduped edge set, same both-orientation degree
    // pairing, identical exact sums and closing double chain.
    "q90_assortativity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS lo,
                 CAST(b.l_partkey AS BIGINT) AS hi
               FROM lp a JOIN lp b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT lo AS v FROM e UNION ALL SELECT hi FROM e)
                 GROUP BY 1),
         de AS (SELECT lo AS a, hi AS b FROM e
                UNION ALL SELECT hi, lo FROM e),
         j AS (SELECT da.d AS da, db.d AS db
               FROM de JOIN deg da ON da.v = de.a
               JOIN deg db ON db.v = de.b),
         sums AS (SELECT CAST(count(*) AS BIGINT) AS m_edges,
                    CAST(sum(da) AS BIGINT) AS sx,
                    CAST(sum(da * db) AS BIGINT) AS sxy,
                    CAST(sum(da * da) AS BIGINT) AS sxx
                  FROM j)
       SELECT m_edges, sx, sxy, sxx,
         round((CAST(m_edges AS DOUBLE) * CAST(sxy AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
           (CAST(m_edges AS DOUBLE) * CAST(sxx AS DOUBLE) -
             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS assortativity
       FROM sums""",
    // Mirrors q97: same edge set, the same id-ranked first-32 adjacency
    // cut, AA terms round-6 of 1/ln(full deg z) DECIMAL-exact summed,
    // same cn≥12 gate, same anti-join against existing edges, one
    // round-6 jaccard.
    "q97_link_prediction" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT CAST(x.l_partkey AS BIGINT) AS lo,
                 CAST(y.l_partkey AS BIGINT) AS hi
               FROM lp x JOIN lp y
                 ON x.l_orderkey = y.l_orderkey
                AND x.l_partkey < y.l_partkey),
         b AS (SELECT lo AS z, hi AS n FROM e
               UNION ALL SELECT hi, lo FROM e),
         deg AS (SELECT z AS v, CAST(count(*) AS BIGINT) AS d
                 FROM b GROUP BY 1),
         piv AS (SELECT t.z, t.n, deg.d AS dz
                 FROM (SELECT z, n,
                         row_number() OVER (PARTITION BY z
                           ORDER BY n ASC) AS rn
                       FROM b) t
                 JOIN deg ON deg.v = t.z
                 WHERE t.rn <= 32),
         cand AS (SELECT p.n AS a, q.n AS b,
                    CAST(round(1.0 / ln(CAST(p.dz AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS aa
                  FROM piv p JOIN piv q
                    ON p.z = q.z AND p.n < q.n),
         sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
                  CAST(sum(aa) AS DECIMAL(38,6)) AS aas
                FROM cand GROUP BY a, b HAVING count(*) >= 12),
         ne AS (SELECT sc.* FROM sc
                ANTI JOIN e ON sc.a = e.lo AND sc.b = e.hi)
       SELECT ne.a AS part_a, ne.b AS part_b, cn,
         round(CAST(cn AS DOUBLE) /
           CAST(da.d + db.d - cn AS DOUBLE), 6) AS jaccard,
         CAST(aas AS DOUBLE) AS adamic_adar
       FROM ne JOIN deg da ON da.v = ne.a
       JOIN deg db ON db.v = ne.b""",
    // Mirrors q98: same edge set, same id-ranked adjacency, the exact
    // glibc two-round LCG (seed 11 → +12356 first-round increment) on
    // the same (vertex·64 + step·4 + walk) key, four steps unrolled.
    "q98_random_walks" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT CAST(x.l_partkey AS BIGINT) AS lo,
                 CAST(y.l_partkey AS BIGINT) AS hi
               FROM lp x JOIN lp y
                 ON x.l_orderkey = y.l_orderkey
                AND x.l_partkey < y.l_partkey),
         b AS (SELECT lo AS v, hi AS n FROM e
               UNION ALL SELECT hi, lo FROM e),
         adj AS (SELECT v, n,
                   row_number() OVER (PARTITION BY v ORDER BY n) AS rnk
                 FROM b),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM b GROUP BY 1),
         wid AS (SELECT * FROM (VALUES (0), (1), (2)) t(wid)),
         w0 AS (SELECT deg.v AS start, wid, deg.v AS cur
                FROM deg CROSS JOIN wid),
         w1 AS (SELECT start, wid, a.n AS cur FROM w0
                JOIN deg ON deg.v = w0.cur
                JOIN adj a ON a.v = w0.cur AND a.rnk = 1 +
                  ((((((w0.cur * 64 + 4 + wid) % 2147483648)
                    * 1103515245 + 12356) % 2147483648)
                    * 1103515245 + 12345) % 2147483648) % deg.d),
         w2 AS (SELECT start, wid, a.n AS cur FROM w1
                JOIN deg ON deg.v = w1.cur
                JOIN adj a ON a.v = w1.cur AND a.rnk = 1 +
                  ((((((w1.cur * 64 + 8 + wid) % 2147483648)
                    * 1103515245 + 12356) % 2147483648)
                    * 1103515245 + 12345) % 2147483648) % deg.d),
         w3 AS (SELECT start, wid, a.n AS cur FROM w2
                JOIN deg ON deg.v = w2.cur
                JOIN adj a ON a.v = w2.cur AND a.rnk = 1 +
                  ((((((w2.cur * 64 + 12 + wid) % 2147483648)
                    * 1103515245 + 12356) % 2147483648)
                    * 1103515245 + 12345) % 2147483648) % deg.d),
         w4 AS (SELECT start, wid, a.n AS cur FROM w3
                JOIN deg ON deg.v = w3.cur
                JOIN adj a ON a.v = w3.cur AND a.rnk = 1 +
                  ((((((w3.cur * 64 + 16 + wid) % 2147483648)
                    * 1103515245 + 12356) % 2147483648)
                    * 1103515245 + 12345) % 2147483648) % deg.d)
       SELECT start, wid, 0 AS step, cur AS vertex FROM w0
       UNION ALL SELECT start, wid, 1, cur FROM w1
       UNION ALL SELECT start, wid, 2, cur FROM w2
       UNION ALL SELECT start, wid, 3, cur FROM w3
       UNION ALL SELECT start, wid, 4, cur FROM w4""",
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
    // Mirrors q107: identical DECIMAL-exact sums, the identical
    // normal-equation double epilogue (q90's parenthesization).
    "q107_discount_elasticity" ->
      """WITH li AS (SELECT p_brand,
             CAST(l_discount AS DECIMAL(18,6)) AS x,
             CAST(l_quantity AS BIGINT) AS y
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS DECIMAL(38,6)) AS sxy,
                 CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx
               FROM li GROUP BY 1)
       SELECT p_brand, n,
         round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
           (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS slope_qty_per_discount,
         round((CAST(sy AS DOUBLE) -
             ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
           AS intercept_qty
       FROM g""",
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
    // Mirrors q100: same integer-cents day sums, the same ±3-day RANGE
    // window with the n=7 interior gate, dayofweek+1 (the q88 parity),
    // round-6 trend/detrended chains with DECIMAL-exact seasonal sums.
    "q100_stl_decompose" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         d2 AS (SELECT day, cents,
                  CAST(CAST(day AS DATE) - DATE '1970-01-01' AS BIGINT)
                    AS ed
                FROM d),
         t AS (SELECT day, cents,
                 CAST(sum(cents) OVER w AS BIGINT) AS s7,
                 CAST(count(*) OVER w AS BIGINT) AS n7
               FROM d2
               WINDOW w AS (ORDER BY ed
                 RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         f AS (SELECT day, cents,
                 round(CAST(s7 AS DOUBLE) / 7.0, 6) AS trend,
                 CAST(round(CAST(cents AS DOUBLE)
                   - round(CAST(s7 AS DOUBLE) / 7.0, 6), 6)
                   AS DECIMAL(18,6)) AS detr,
                 CAST(dayofweek(day) + 1 AS BIGINT) AS dow
               FROM t WHERE n7 = 7),
         se AS (SELECT dow,
                  round(CAST(CAST(sum(detr) AS DECIMAL(38,6)) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE), 6) AS seasonal
                FROM f GROUP BY 1)
       SELECT f.day, f.dow, f.cents AS revenue_cents, f.trend,
         se.seasonal,
         round(CAST(f.detr AS DOUBLE) - se.seasonal, 6) AS residual
       FROM f JOIN se USING (dow)""",
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
    // Mirrors q102: same DECIMAL(18,2) price buckets and BIGINT weight
    // sums, the same per-group cumulative window over distinct prices,
    // the identical division-free 2·cum ≥ W pick.
    "q102_weighted_median" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             CAST(l_quantity AS BIGINT) AS q
           FROM lineitem),
         h AS (SELECT l_returnflag, l_linestatus, p,
                 CAST(sum(q) AS BIGINT) AS w
               FROM li GROUP BY 1, 2, 3),
         c AS (SELECT l_returnflag, l_linestatus, p, w,
                 CAST(sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
                   ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
                 CAST(sum(w) OVER (PARTITION BY l_returnflag,
                   l_linestatus) AS BIGINT) AS tw
               FROM h)
       SELECT l_returnflag, l_linestatus,
         CAST(sum(w) AS BIGINT) AS total_weight,
         CAST(count(*) AS BIGINT) AS n_prices,
         min(CASE WHEN cum * 2 >= tw THEN p END) AS weighted_median_price
       FROM c GROUP BY 1, 2""",
    // Mirrors q93: same DECIMAL-exact spend sums, the same
    // (rev DESC, custkey ASC) tie-broken ntile (both engines hand the
    // remainder to the leading tiles), the same DECIMAL cumsum/total
    // windows, two closing round-6 divisions.
    "q93_decile_lift" ->
      """WITH spend AS (SELECT c_mktsegment AS segment, o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,6)) AS rev
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         b AS (SELECT segment, rev,
                 ntile(10) OVER (PARTITION BY segment
                   ORDER BY rev DESC, o_custkey ASC) AS decile
               FROM spend),
         per AS (SELECT segment, decile,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(rev) AS DECIMAL(38,6)) AS drev
                 FROM b GROUP BY 1, 2),
         w AS (SELECT segment, decile, n_customers, drev,
                 CAST(sum(drev) OVER (PARTITION BY segment ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DECIMAL(38,6)) AS cum,
                 CAST(sum(drev) OVER (PARTITION BY segment)
                   AS DECIMAL(38,6)) AS tot
               FROM per)
       SELECT segment, CAST(decile AS INTEGER) AS decile, n_customers,
         CAST(drev AS DOUBLE) AS decile_revenue,
         round(CAST(drev AS DOUBLE) / CAST(tot AS DOUBLE), 6)
           AS revenue_share,
         round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share
       FROM w""",
    // Mirrors q94: the q90 edge set, the same endpoint-community joins
    // and integer (n_vertices, degree_sum, intra_edges) triples, the
    // identical e/m − (d/2m)² double chain per community.
    "q94_modularity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS lo,
                 CAST(b.l_partkey AS BIGINT) AS hi
               FROM lp a JOIN lp b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
         br AS (SELECT CAST(p_partkey AS BIGINT) AS v, p_brand AS comm
                FROM part),
         eb AS (SELECT ba.comm AS ca, bb.comm AS cb
                FROM e JOIN br ba ON ba.v = e.lo
                JOIN br bb ON bb.v = e.hi),
         m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM eb),
         intra AS (SELECT ca AS community,
                     CAST(count(*) AS BIGINT) AS intra_edges
                   FROM eb WHERE ca = cb GROUP BY 1),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT lo AS v FROM e UNION ALL SELECT hi FROM e)
                 GROUP BY 1),
         ds AS (SELECT br.comm AS community,
                  CAST(count(*) AS BIGINT) AS n_vertices,
                  CAST(sum(deg.d) AS BIGINT) AS degree_sum
                FROM deg JOIN br ON br.v = deg.v GROUP BY 1)
       SELECT ds.community, ds.n_vertices, ds.degree_sum,
         coalesce(intra.intra_edges, CAST(0 AS BIGINT)) AS intra_edges,
         round(CAST(coalesce(intra.intra_edges, 0) AS DOUBLE) /
             CAST(m.m_edges AS DOUBLE) -
           (CAST(ds.degree_sum AS DOUBLE) /
             (2.0 * CAST(m.m_edges AS DOUBLE))) *
           (CAST(ds.degree_sum AS DOUBLE) /
             (2.0 * CAST(m.m_edges AS DOUBLE))), 6) AS modularity_term
       FROM ds LEFT JOIN intra USING (community), m""",
    // Mirrors q96: the q90 edge set both-oriented, labels seeded as
    // vertex ids, each round the identical neighbor-label frequency
    // argmax with the same (count DESC, label ASC) tie rule, three
    // rounds unrolled — all-integer, so equality is exact.
    "q96_label_prop" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS lo,
                 CAST(b.l_partkey AS BIGINT) AS hi
               FROM lp a JOIN lp b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
         adj AS (SELECT lo AS v, hi AS n FROM e
                 UNION ALL SELECT hi, lo FROM e),
         r0 AS (SELECT DISTINCT v, v AS label FROM adj),
         r1 AS (SELECT v, label FROM (
             SELECT v, label, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, label ASC) AS rn
             FROM (SELECT a.v AS v, l.label AS label,
                     CAST(count(*) AS BIGINT) AS c
                   FROM adj a JOIN r0 l ON l.v = a.n GROUP BY 1, 2))
           WHERE rn = 1),
         r2 AS (SELECT v, label FROM (
             SELECT v, label, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, label ASC) AS rn
             FROM (SELECT a.v AS v, l.label AS label,
                     CAST(count(*) AS BIGINT) AS c
                   FROM adj a JOIN r1 l ON l.v = a.n GROUP BY 1, 2))
           WHERE rn = 1),
         r3 AS (SELECT v, label FROM (
             SELECT v, label, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, label ASC) AS rn
             FROM (SELECT a.v AS v, l.label AS label,
                     CAST(count(*) AS BIGINT) AS c
                   FROM adj a JOIN r2 l ON l.v = a.n GROUP BY 1, 2))
           WHERE rn = 1)
       SELECT v AS node, label AS community FROM r3""",
    // Mirrors q95: the q90 degree table, the same d ≥ 8 tail, each
    // ln(d/8) a round-6 DECIMAL term (division by 8 is exact in IEEE,
    // so both engines hand ln the identical double), the same exact
    // DECIMAL term sum, one closing double chain.
    "q95_hill_tail" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS lo,
                 CAST(b.l_partkey AS BIGINT) AS hi
               FROM lp a JOIN lp b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT lo AS v FROM e UNION ALL SELECT hi FROM e)
                 GROUP BY 1),
         t AS (SELECT CAST(round(ln(CAST(d AS DOUBLE) / 8.0), 6)
                 AS DECIMAL(18,6)) AS t
               FROM deg WHERE d >= 8),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
                 CAST(sum(t) AS DECIMAL(38,6)) AS s FROM t)
       SELECT n_tail, CAST(s AS DOUBLE) AS sum_log_ratio,
         round(1.0 + CAST(n_tail AS DOUBLE) / CAST(s AS DOUBLE), 6)
           AS hill_alpha
       FROM a""",
    // Mirrors q83: identical integer-cents day sums, the same
    // cross-multiplied |n·cum − k·total| over the day cumsum, the same
    // (s DESC, day ASC) top-1 pick, one closing double division.
    "q83_cusum" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1),
         c AS (SELECT day,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
                 CAST(sum(x) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
               FROM d),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(x) AS BIGINT) AS total_cents FROM d)
       SELECT day AS change_day, n_days, total_cents,
         abs(n_days * cum - k * total_cents) AS s_num,
         round(CAST(abs(n_days * cum - k * total_cents) AS DOUBLE) /
           (CAST(n_days AS DOUBLE) * CAST(total_cents AS DOUBLE)), 6)
           AS cusum_stat
       FROM c, n ORDER BY s_num DESC, change_day ASC LIMIT 1""",
    // Mirrors q79: identical integer-cents histogram and cross-multiplied
    // ECDF delta (pure longs — structure-independent, so the oracle uses
    // one flat window where Spark runs the two-level form), the same
    // (ks_num DESC, v ASC) top-1 pick, one closing double division.
    "q79_ks_two_sample" ->
      """WITH o AS (SELECT
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
           FROM orders),
         h AS (SELECT v, CAST(sum(g) AS BIGINT) AS c1,
                 CAST(sum(1 - g) AS BIGINT) AS c2
               FROM o GROUP BY 1),
         c AS (SELECT v,
                 CAST(sum(c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS f1,
                 CAST(sum(c2) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS f2
               FROM h),
         n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2 FROM h)
       SELECT n1, n2, abs(f1 * n2 - f2 * n1) AS ks_num, v AS ks_at_cents,
         round(CAST(abs(f1 * n2 - f2 * n1) AS DOUBLE) /
           (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS ks
       FROM c, n ORDER BY ks_num DESC, v ASC LIMIT 1""",
    // Mirrors q80: the same histogram, the same 2·midrank identity
    // (2R₁ = Σ c₁·(2·cum≤ − c + 1), all integer), one double epilogue.
    "q80_mann_whitney" ->
      """WITH o AS (SELECT
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
           FROM orders),
         h AS (SELECT v, CAST(sum(g) AS BIGINT) AS c1,
                 CAST(count(*) AS BIGINT) AS c
               FROM o GROUP BY 1),
         c AS (SELECT c1, c,
                 CAST(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
               FROM h),
         a AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c - c1) AS BIGINT) AS n2,
                 CAST(sum(c1 * (2 * cum - c + 1)) AS BIGINT) AS r1x2
               FROM c)
       SELECT n1, n2, r1x2 - n1 * (n1 + 1) AS u1_x2,
         round(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) /
           (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) - 1.0, 6)
           AS rank_biserial
       FROM a""",
    // Mirrors q81: per-order integer cents summed as BIGINT then held as
    // DECIMAL(18,0) per day, the identical five exact Pearson sums
    // (DECIMAL(36→38,0) products), and the same fixed double epilogue —
    // each exact sum cast to double once, identical op order, round-6.
    "q81_acf" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS DECIMAL(18,0)) AS x
           FROM orders GROUP BY 1),
         r AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM d),
         l AS (SELECT k.lag AS lag, b.x AS x, a.x AS y
               FROM (SELECT unnest(range(1, 8)) AS lag) k
               JOIN r a ON true
               JOIN r b ON b.rn = a.rn + k.lag),
         p AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(x) AS DECIMAL(38,0)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                 CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
                 CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
                 CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
               FROM l WHERE y IS NOT NULL GROUP BY 1)
       SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
         round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
           sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) -
             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE) -
               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
       FROM p ORDER BY lag""",
    // Mirrors q77: identical day aggregate and DECIMAL-delta/IEEE-div
    // slope, then order statistics only — the two middle ranks of the
    // ascending slope order, no averaging — so every emitted double is
    // one of the exact pairwise quotients both engines computed
    // identically.
    "q77_theil_sen" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS rv
           FROM orders GROUP BY 1),
         sl AS (SELECT CAST(y.rv - x.rv AS DOUBLE)
                  / CAST(date_diff('day', x.day, y.day) AS DOUBLE) AS slope
                FROM d x JOIN d y ON x.day < y.day),
         r AS (SELECT slope, row_number() OVER (ORDER BY slope ASC) AS rn,
                 count(*) OVER () AS n FROM sl)
       SELECT CAST(max(n) AS BIGINT) AS n_slopes,
         min(slope) AS slope_lo, max(slope) AS slope_hi
       FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1""",
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
    // Mirrors q65: the q57 edge set, then 12 unrolled full-recompute
    // peeling rounds (fixpoint at sf0.001/sf0.01 is round 2 at
    // k=60, chosen so the core is non-empty at BOTH scales; peeling is
    // confluent, so the recompute schedule meets the Spark side's
    // decremental schedule at the same unique k-core). MATERIALIZED
    // CTEs: DuckDB re-expands plain CTEs per reference — 12 rounds of
    // double self-reference would re-plan the edge build 2^12 times.
    "q65_kcore" -> {
      val pre =
        """WITH lp AS MATERIALIZED (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           e AS MATERIALIZED (
             SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey <> b.l_partkey),
           s0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e)"""
      val rounds = (1 to 12).map { i =>
        s"""s$i AS MATERIALIZED (SELECT e.src AS node FROM e
           JOIN s${i - 1} a ON e.src = a.node
           JOIN s${i - 1} b ON e.dst = b.node
           GROUP BY 1 HAVING count(*) >= 60)"""
      }.mkString(",\n")
      s"""$pre,
         $rounds
         SELECT e.src AS node, CAST(count(*) AS BIGINT) AS core_degree
         FROM e JOIN s12 a ON e.src = a.node
         JOIN s12 b ON e.dst = b.node
         GROUP BY 1"""
    },
    // Mirrors q66: BIGINT observed counts, the same row/col/total window
    // sums over the cell aggregate (CAST BIGINT — DuckDB widens to
    // HUGEINT), expected as (rt·ct)/t in doubles, and (O−E)·(O−E)/E
    // written as explicit multiplication, never pow.
    "q66_chi_square" ->
      """WITH obs AS (SELECT o_orderpriority, l_returnflag,
             CAST(count(*) AS BIGINT) AS observed
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         w AS (SELECT o_orderpriority, l_returnflag, observed,
                 CAST(sum(observed) OVER (PARTITION BY o_orderpriority)
                   AS BIGINT) AS rt,
                 CAST(sum(observed) OVER (PARTITION BY l_returnflag)
                   AS BIGINT) AS ct,
                 CAST(sum(observed) OVER () AS BIGINT) AS t
               FROM obs),
         e AS (SELECT o_orderpriority, l_returnflag, observed,
                 (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                   / CAST(t AS DOUBLE) AS ex
               FROM w)
         SELECT o_orderpriority, l_returnflag, observed,
           round(ex, 6) AS expected,
           round((CAST(observed AS DOUBLE) - ex)
             * (CAST(observed AS DOUBLE) - ex) / ex, 6) AS chi2_term
         FROM e""",
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
    // Mirrors q67: the same BIGINT-floor string-head digit, BIGINT
    // counts, the 9-row share window (CAST BIGINT around the HUGEINT
    // widen), and log10 on the identical 1+1/d doubles.
    "q67_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
             AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
           FROM orders),
         obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
                 FROM d GROUP BY 1)
         SELECT digit, n_obs,
           round(CAST(n_obs AS DOUBLE)
             / CAST(CAST(sum(n_obs) OVER () AS BIGINT) AS DOUBLE), 6)
             AS obs_share,
           round(log10(CAST(1.0 AS DOUBLE)
             + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 6)
             AS benford_share
         FROM obs""",
    // Mirrors q68: exact-DECIMAL daily sums, identical (value, day)
    // row_number tiebreaks so Σd² is the same exact integer, and the
    // single 1 − 6Σd²/(n(n²−1)) double division written in the same
    // association order.
    "q68_spearman_qty_rev" ->
      """WITH daily AS (SELECT
             CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS q,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS r
           FROM lineitem GROUP BY 1),
         rk AS (SELECT
                 CAST(row_number() OVER (ORDER BY q ASC, day ASC)
                   AS BIGINT)
                 - CAST(row_number() OVER (ORDER BY r ASC, day ASC)
                   AS BIGINT) AS d
               FROM daily),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(d * d) AS BIGINT) AS sum_d2
               FROM rk)
         SELECT n_days, sum_d2,
           round(CAST(1.0 AS DOUBLE)
             - (CAST(6.0 AS DOUBLE) * CAST(sum_d2 AS DOUBLE))
             / (CAST(n_days AS DOUBLE)
                * (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                   - CAST(1.0 AS DOUBLE))), 6) AS spearman_rho
         FROM s""",
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
    // Mirrors q57: distinct edge set, per-src degree, degree histogram,
    // BIGINT counts everywhere.
    "q57_degree_histogram" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
               FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey <> b.l_partkey),
         d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
               FROM e GROUP BY src)
         SELECT deg AS degree, CAST(count(*) AS BIGINT) AS n_nodes
         FROM d GROUP BY deg""",
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
    // Mirrors q49: the identical explicit interpolation — integer-rank
    // bracket picks, then lo + (hi−lo)·(rem/100.0) in the same IEEE
    // operation order (100.0 CAST to DOUBLE; DuckDB parses bare
    // decimal literals as DECIMAL — the t16 lesson). No rounding: every
    // output double is either a picked data value or the same
    // arithmetic chain.
    "q49_quantiles_interp" ->
      """WITH r AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value ASC)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events WHERE value IS NOT NULL),
         a AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             max(CASE WHEN rn = 1 + ((n-1)*25)//100 THEN value END) AS lo25,
             max(CASE WHEN rn = 1 + ((n-1)*25)//100
               + (CASE WHEN ((n-1)*25) % 100 > 0 THEN 1 ELSE 0 END)
               THEN value END) AS hi25,
             max(CASE WHEN rn = 1 + ((n-1)*50)//100 THEN value END) AS lo50,
             max(CASE WHEN rn = 1 + ((n-1)*50)//100
               + (CASE WHEN ((n-1)*50) % 100 > 0 THEN 1 ELSE 0 END)
               THEN value END) AS hi50,
             max(CASE WHEN rn = 1 + ((n-1)*75)//100 THEN value END) AS lo75,
             max(CASE WHEN rn = 1 + ((n-1)*75)//100
               + (CASE WHEN ((n-1)*75) % 100 > 0 THEN 1 ELSE 0 END)
               THEN value END) AS hi75,
             max(CASE WHEN rn = 1 + ((n-1)*90)//100 THEN value END) AS lo90,
             max(CASE WHEN rn = 1 + ((n-1)*90)//100
               + (CASE WHEN ((n-1)*90) % 100 > 0 THEN 1 ELSE 0 END)
               THEN value END) AS hi90
           FROM r GROUP BY event_type)
         SELECT event_type, n,
           lo25 + (hi25 - lo25) * (CAST(((n-1)*25) % 100 AS DOUBLE)
             / CAST(100.0 AS DOUBLE)) AS p25,
           lo50 + (hi50 - lo50) * (CAST(((n-1)*50) % 100 AS DOUBLE)
             / CAST(100.0 AS DOUBLE)) AS p50,
           lo75 + (hi75 - lo75) * (CAST(((n-1)*75) % 100 AS DOUBLE)
             / CAST(100.0 AS DOUBLE)) AS p75,
           lo90 + (hi90 - lo90) * (CAST(((n-1)*90) % 100 AS DOUBLE)
             / CAST(100.0 AS DOUBLE)) AS p90
         FROM a""",
    // Mirrors q50: same discrete integer-rank medians (picked data
    // values — bit-identical), same |x−med| > 3.0·mad threshold chain.
    "q50_mad_outliers" ->
      """WITH e AS (SELECT event_type, value FROM events
                    WHERE value IS NOT NULL),
         m AS (SELECT event_type, value AS med FROM (
             SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY value ASC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM e)
           WHERE rn = 1 + ((n-1)*50)//100),
         d AS (SELECT e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS adev
               FROM e JOIN m USING (event_type)),
         md AS (SELECT event_type, adev AS mad FROM (
             SELECT event_type, adev,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY adev ASC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM d)
           WHERE rn = 1 + ((n-1)*50)//100)
         SELECT d.event_type, min(d.med) AS med, min(md.mad) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.adev > CAST(3.0 AS DOUBLE) * md.mad
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM d JOIN md USING (event_type)
         GROUP BY d.event_type""",
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
    // Mirrors q51: recursive-CTE BFS — the UNION (distinct) recursion
    // carries (node, level) rows, the level < 3 guard caps the walk,
    // and min(level) per node equals the frontier algorithm's
    // first-reached level. Level is INTEGER on both sides.
    "q51_bfs_levels" ->
      """WITH RECURSIVE
           lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                 FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey <> b.l_partkey),
           walk(node, level) AS (
             SELECT DISTINCT l_partkey, 0 FROM lineitem
             WHERE l_partkey < 10
             UNION
             SELECT e.dst, w.level + 1
             FROM walk w JOIN e ON w.node = e.src
             WHERE w.level < 3)
         SELECT node, CAST(min(level) AS INTEGER) AS level
         FROM walk GROUP BY node""",
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
    "q30_pagerank" -> q30OracleSql,
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

    // Replays negativeEdges: identical LCG recurrence (seed 42 → +12387
    // first-round increment — the p07 constants), same dense-domain
    // mapping h → 2*(h % max + 1) + 1, same NOT EXISTS edge exclusion
    // and min-j dedup. All integer.
    "q43_negative_edges" ->
      """WITH mx AS (SELECT max(p_partkey) AS p FROM part),
          e AS (SELECT DISTINCT o_custkey * 2 AS src,
                  l_partkey * 2 + 1 AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          s AS (SELECT DISTINCT src FROM e),
          c AS (SELECT src, gs.j,
                  2 * (((((src * 4 + gs.j) % 2147483648) * 1103515245
                    + 12387) % 2147483648 * 1103515245 + 12345)
                    % 2147483648 % mx.p + 1) + 1 AS dst
                FROM s, generate_series(0, 3) gs(j), mx),
          a AS (SELECT c.* FROM c WHERE NOT EXISTS
                 (SELECT 1 FROM e WHERE e.src = c.src AND e.dst = c.dst)),
          d AS (SELECT *, row_number() OVER (PARTITION BY src, dst
                  ORDER BY j) AS rn FROM a)
          SELECT src, dst, j FROM d WHERE rn = 1""",

    // Replays Sessions.sessionize step for step: same integer epoch
    // seconds, same (es, event_id) total order, same lag/running-sum
    // break chain — every step integer, so equality is exact.
    // Mirrors q76: exact-DECIMAL daily sums, the same i<j pairing and
    // sign fold, BIGINT casts on the sums.
    "q76_mann_kendall" ->
      """WITH d AS (SELECT
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS rv
           FROM orders GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN y.rv > x.rv THEN 1
                         WHEN y.rv < x.rv THEN -1 ELSE 0 END)
             AS BIGINT) AS s_stat,
           CAST(sum(CASE WHEN y.rv = x.rv THEN 1 ELSE 0 END)
             AS BIGINT) AS n_ties
         FROM d x JOIN d y ON x.day < y.day""",
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
    // Independent formulation: triangles as ordered a<b<c edge triples
    // ((a,b),(b,c),(a,c)) — no degree direction, no wedges.
    "q35_triangles" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          e AS (SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
                FROM lp a JOIN lp b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey)
          SELECT count(*) AS n_triangles
          FROM e e1
          JOIN e e2 ON e2.lo = e1.hi
          JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi""",
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
         FROM e GROUP BY event_type"""
  )
}
