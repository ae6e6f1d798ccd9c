package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Engine.table

/** Statistical tests and estimators as distributed queries: rank/trend
  * tests (Mann-Kendall, Mann-Whitney, KS, Spearman), robust estimators
  * (Theil-Sen, MAD, winsorize-free quantile interpolation), time-series
  * diagnostics (ACF, CUSUM, STL, seasonality), information measures
  * (chi-square, mutual information, transition entropy), and sampling-
  * based inference (bootstrap CI). Split out of Extended.scala (r8);
  * registry keys and plans unchanged.
  */
object StatsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

  )

  val oracles: Map[String, String] = Map(
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
  )
}
