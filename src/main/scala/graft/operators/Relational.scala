package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator suite on the TPC-H-ish star schema — the
  * categories the reference lacks (SURVEY.md §2.5: "extension surface
  * adds representatives of each missing category"): multi-way joins,
  * semi/anti joins, window functions, set operations, rollup, distinct
  * aggregates.
  *
  * Scale design notes (100 TB):
  *  - Only *bounded* dimensions (`region` ≤5 rows, `nation` ≤25 rows,
  *    fixed query sets) carry explicit `broadcast()` hints. Sides that
  *    grow with the data — `customer`, `supplier`, filtered `orders` —
  *    never do: a hardcoded hint overrides AQE's size check and OOMs
  *    at 100× scale. AQE (enabled in every session) converts SMJ→BHJ
  *    from runtime stats whenever such a side actually fits.
  *  - Money arithmetic runs in exact integer cents (see [[cents]]):
  *    sums are exact and order-independent — identical across
  *    partitionings, engines (DuckDB oracle), and cluster sizes,
  *    where double summation would drift with partition count — and
  *    aggregate as primitive codegen longs, far faster than decimal.
  *  - Top-K uses orderBy+limit (TakeOrderedAndProject: per-partition
  *    heap, K-row driver merge), never a full sort.
  */
object Relational {

  /** Exact integer-cents representation of a 2-decimal money/ratio
    * column. Long sums are exact and order-independent like decimal
    * sums, but run as codegen primitive arithmetic (decimal aggregation
    * boxes every value). The final division back to double converts an
    * exact integer identically in any engine, so results stay
    * bit-for-bit reproducible across partitionings and vs the oracle.
    */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** TPC-H Q1-style pricing summary: scan-heavy partial/final hash
    * aggregate over 6 measures, grouping key cardinality 6.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / lit(100.0)).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          / lit(10000.0)).as("sum_disc_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
          * (lit(100L) + cents(col("l_tax")))) / lit(1000000.0)).as("sum_charge"),
        (sum(cents(col("l_quantity"))) / lit(100.0) / count(lit(1))).as("avg_qty"),
        (sum(cents(col("l_extendedprice"))) / lit(100.0) / count(lit(1))).as("avg_price"),
        (sum(cents(col("l_discount"))) / lit(100.0) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style shipping priority: dim-filtered customer joined
    * into orders, joined with lineitem on orderkey, top-10 by revenue
    * (deterministic tiebreak on orderkey). Join strategy is left to
    * AQE — both non-fact sides grow with sf.
    */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer and filtered-orders both grow linearly with the data —
    // no hardcoded broadcast (it would OOM at 100× scale); AQE converts
    // SMJ→BHJ from runtime stats whenever a side is actually small
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier volume: five-way join. Bounded dims
    * (region, nation) are broadcast; customer/supplier/orders joins are
    * AQE-decided.
    */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val asia = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, sfDir)
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    // orders/supplier/customer all grow with the data: no hardcoded
    // broadcast hints (OOM at scale) — AQE converts SMJ→BHJ from
    // runtime stats. Only the bounded dims (region via `nat`, nation)
    // keep explicit hints.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("revenue"))
  }

  /** Left-semi join (EXISTS): customers that have at least one
    * high-priority order. Semi joins ship only the key column of the
    * probe side and stop at first match.
    */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    // URGENT orders ≈ 20% of the fact table — never a safe broadcast;
    // the semi join ships only o_custkey, and AQE broadcasts when small
    Tables.customer(spark, sfDir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): orders that have no lineitems. */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val liKeys = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
    Tables.orders(spark, sfDir)
      .join(liKeys, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  /** Window ranking: top-3 customers per nation by account balance
    * (row_number with deterministic tiebreak). The shuffle is on the
    * partition key only; state per group is bounded by the frame.
    */
  def windowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= 3)
      .select("c_nationkey", "rank_in_nation", "c_custkey", "c_name", "c_acctbal")
  }

  /** Running-total window: cumulative shipped quantity per supplier in
    * ship order (unique ordering key ⇒ deterministic frame). Quantity
    * accumulates in exact integer cents so running values are exact.
    */
  def windowRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      .withColumn("running_qty", sum(cents(col("l_quantity"))).over(w) / lit(100.0))
      .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "running_qty")
  }

  /** Time-RANGE rolling window: per event, the same user's event count
    * and exact-cents value total over the trailing 10 minutes — the
    * sliding-window feature a fraud/abuse/feature-store pipeline
    * computes per entity. A RANGE frame (value bounds on event time),
    * not a ROWS frame: equal-timestamp peers are all in-frame, so the
    * result is deterministic without a unique ordering key. Spark
    * needs a numeric RANGE ordering column → `unix_micros(ts)` with
    * the bound in µs; the driver's event timestamps are µs-aligned so
    * the DuckDB `INTERVAL` frame draws identical boundaries. Same
    * scale shape as every window here: one exchange on the partition
    * key, per-group state bounded by the frame.
    */
  def windowRollingCount(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-10L * 60L * 1000000L, 0L)
    Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("rolling_events", count(lit(1)).over(w))
      .withColumn("rolling_value", sum(cents(col("value"))).over(w) / lit(100.0))
      .select("user_id", "ts", "event_id", "rolling_events", "rolling_value")
  }

  /** INTERSECT (distinct semantics): users who both clicked and
    * purchased.
    */
  def setopIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** EXCEPT (distinct semantics): users with a high-value click but no
    * high-value purchase. (Value filter keeps both sides selective so
    * the difference is non-empty at every scale factor.)
    */
  def setopExcept(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).filter(col("value") > 180)
    ev.filter(col("event_type") === "click").select("user_id")
      .except(ev.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** ROLLUP hierarchy totals: (flag, status), (flag), () — one pass,
    * grouping-set expansion handled by Catalyst's Expand node.
    */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame =
    // Expand triples every input row before the partial aggregate;
    // spread a single-row-group scan first so that 3x work is
    // parallel rather than inside one scan task (no-op on multi-file
    // input — see Tables.spread)
    Tables.spread(spark,
      Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_linestatus", "l_quantity"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        (sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** CUBE: all 2^k grouping-set combinations (rollup's lattice
    * superset), with explicit GROUPING flags so subtotal rows are
    * distinguishable from genuine-null group values — the disambiguator
    * any BI consumer of a cube needs. Same Expand-before-partial-agg
    * shape as [[aggRollup]] (4× row expansion map-side, one exchange of
    * group-count-bounded partials).
    */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.spread(spark,
      Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_linestatus", "l_quantity"))
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        (sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** NTILE quartiles of customers by account balance — the bucketing
    * window of the family ([[windowRank]] ranks, this segments).
    * Deterministic: the order key is (exact cents, custkey), so tile
    * boundaries never depend on float ordering or physical row order.
    * One |customers| window per nation partition — the same shape as
    * windowRank, bounded per-partition state.
    */
  def windowNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(cents(col("c_acctbal")).desc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        cents(col("c_acctbal")).as("bal_cents"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  /** Per-type OLS trend of event value over time — the fitted line
    * behind every "is spend drifting" dashboard: slope (cents/day) and
    * intercept from the five exact integer moments (x = day index from
    * the corpus's own min day, y = value cents; decimal(38) products),
    * divided once into rounded doubles. The [[statsCorr]] discipline
    * extended to the regression coefficients.
    */
  def statsLinreg(spark: SparkSession, sfDir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val ev = Tables.events(spark, sfDir)
    val scalars = ev.agg(min(col("ts").cast("date")).as("min_day"))
    ev.crossJoin(broadcast(scalars))
      .select(col("event_type"),
        datediff(col("ts").cast("date"), col("min_day")).cast(d38).as("x"),
        cents(col("value")).cast(d38).as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("n").cast("long").as("n_events"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope_cents_per_day"),
        round((col("sy").cast("double")
          - ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * col("sx").cast("double")) / col("n").cast("double"), 6)
          .as("intercept_cents"))
  }

  /** Explicit GROUPING SETS — the third of the multi-grain aggregate
    * family next to [[aggRollup]]/[[aggCube]]: exactly the grains the
    * report needs (per type, per weekday, grand total) without the
    * cube's unused cross-grain. One Expand + one aggregate pass;
    * grouping ids disambiguate the NULL placeholders.
    */
  def aggGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"),
        cents(col("value")).as("cent"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("dow")), Seq.empty),
        col("event_type"), col("dow"))
      .agg(
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("dow")).cast("long").as("g_dow"),
        (sum(col("cent")) / lit(100.0)).as("sum_value"),
        count(lit(1)).as("n_rows"))

  /** Exact distinct aggregation: distinct users per event type.
    * (Catalyst plans count(distinct) as a two-stage expand+aggregate.)
    */
  def distinctExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** Sketch-based distinct (HLL++): the 100 TB-scale form of
    * [[distinctExact]] — no expand, constant memory per group.
    *
    * Output contract (hash-verifiable): the raw HLL estimate is
    * engine-specific, so it cannot appear in the compared columns —
    * instead the query emits the EXACT distinct count alongside a
    * boolean asserting the estimate landed within the pinned error
    * band (±15% = 3σ at rsd 0.05, floored at ±5 absolute for tiny
    * groups). The boolean is computed from the real sketch, so a
    * broken HLL implementation flips it to false and the hash check
    * fails; the oracle pins `true` and the exact count. (The absolute
    * estimate remains available via [[distinctApproxRaw]].)
    */
  def distinctApproxRaw(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.05).as("approx_users"))

  def distinctApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.05).as("est"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(
        col("event_type"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <=
          greatest(lit(5L), ceil(col("n_exact") * 0.15).cast("long")))
          .as("within_band"))

  /** TPC-H Q14-style promo revenue: lineitem ⋈ part with a
    * conditional (CASE-guarded) aggregate — the fraction of revenue
    * from promotional parts per month. Demonstrates conditional
    * aggregation and a fact⋈dimension join on the part table. `part`
    * grows linearly with SF, so the join strategy is left to
    * stats/AQE (no hint): small SFs broadcast by size, a 100 TB run
    * degrades to a shuffle join instead of OOMing the executors.
    */
  def q14PromoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2001-01-01 00:00:00").cast("timestamp"))
      .join(Tables.part(spark, sfDir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))) / lit(10000.0))
          .as("promo_revenue"),
        (sum(rev) / lit(10000.0)).as("total_revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10 shape — returned-item revenue reporting: the top-20
    * customers by revenue lost to returns, the classic
    * fact⋈fact⋈dim + top-K reporting query. Ranking runs on the EXACT
    * integer basis-point-cents revenue (sums of products of exact
    * cents — order-independent under any partitioning, so the top-20
    * cut is deterministic; ranking on a float sum could flip ties
    * across engines), with doubles only in the final projection. The
    * limit plans as TakeOrderedAndProject; the customer join strategy
    * is stats/AQE-decided (customer grows with the data — never a
    * hardcoded broadcast hint, same policy as q5/q18).
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val revCbp = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(revCbp).as("rev_cbp"), count(lit(1)).as("n_items"))
      .join(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name", "c_acctbal"),
        col("o_custkey") === col("c_custkey"))
      .orderBy(col("rev_cbp").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        (col("rev_cbp") / lit(10000.0)).as("revenue"),
        col("n_items"), col("c_acctbal"))
  }

  /** Skew-safe exact distinct: the two-phase rewrite of
    * [[distinctExact]] — first aggregate on (group, value) to
    * deduplicate with a well-distributed composite key, then count per
    * group. With only 5 event types, a naive count(distinct) funnels
    * each type's rows through one reducer; the composite first phase
    * spreads them across the cluster — the same effect as salting the
    * hot key, with the dedup doubling as the salt. Identical results,
    * skew-proof shuffle.
    */
  def distinctExactSalted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("dummy"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))

  /** Statistical profile per group: mean, sample stddev, exact
    * interpolated median and p90. Exact percentiles need the group's
    * values together (sort-based), which is why the approx sketch
    * ([[distinctApprox]]-style) is the 100 TB default; this is the
    * exact reference form. Moments rounded to 6 (accumulation-order
    * ulps differ across engines).
    */
  def statsSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        round(avg(col("value")), 6).as("avg_value"),
        round(stddev_samp(col("value")), 6).as("stddev_value"),
        round(expr("percentile(value, 0.5)"), 6).as("median_value"),
        round(expr("percentile(value, 0.9)"), 6).as("p90_value"),
        count(lit(1)).as("n"))

  /** Exact per-group quantiles at 100 TB: the histogram-cumsum method.
    * A naive exact quantile sorts every row of a group on one reducer
    * (the skewed-window shape `sample_cap_source` was rebuilt to
    * avoid); instead the corpus collapses to (group, value) counts
    * first — the ONLY corpus-sized exchange — and the rank selection
    * then runs a window over the aggregated frame, whose size is
    * distinct VALUES per group, not rows. For doc lengths (int chars)
    * that's thousands of rows per source regardless of corpus size.
    * Rank k = ⌊q·(n−1)⌋+1 over the ascending cum-count — a discrete
    * order statistic, so the result is an actual data value and the
    * whole query is integer-exact (the q labels are literal doubles
    * both engines parse identically).
    *
    * CONTRACT — discrete measures only: the window frame is sized by
    * DISTINCT VALUES per group, so this is the exact method for
    * integer-ish columns (lengths, counts, codes) where that count is
    * bounded regardless of corpus size. Pointing it at a continuous
    * double column degenerates to distinct-values ≈ rows — the
    * one-reducer-sort shape this method exists to avoid. For
    * continuous measures use [[statsQuantileBinned]] (bounded bins,
    * same cumsum machinery, ±½-bin-width error) or the mergeable
    * [[quantileSketch]].
    */
  def statsQuantileExact(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source").agg(sum(col("c")).as("n"))
    val w = Window.partitionBy("source").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    val qs = spark.range(1).select(explode(typedLit(QuantileQs)).as("q"))
    cum.join(totals, "source")
      .crossJoin(broadcast(qs))
      .where(col("cum") >= floor(col("q") * (col("n") - 1)).cast("long") + 1)
      .groupBy("source", "q")
      .agg(min(col("n_chars")).as("value"), max(col("n")).as("n"))
  }

  private val QuantileQs = Seq(0.25, 0.5, 0.75, 0.9)

  /** Binned per-group quantiles for CONTINUOUS measures — the variant
    * [[statsQuantileExact]]'s contract points doubles at: values are
    * first discretized to fixed-width bins (width [[QuantileBinWidth]]
    * on the event `value` measure), then the identical histogram-cumsum
    * rank selection runs over the BIN histogram. The window frame is
    * bounded by the value range / bin width — a few hundred rows per
    * group independent of corpus size — and the answer is the selected
    * bin's lower edge: a deterministic value within one bin width of
    * the true quantile, which is the precision the bin width declares.
    * All arithmetic is integer (bin ids, counts, ranks) so the result
    * is bit-stable across engines and partitionings.
    */
  def statsQuantileBinned(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        floor(col("value") / QuantileBinWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("event_type").agg(sum(col("c")).as("n"))
    val w = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    val qs = spark.range(1).select(explode(typedLit(QuantileQs)).as("q"))
    cum.join(totals, "event_type")
      .crossJoin(broadcast(qs))
      .where(col("cum") >= floor(col("q") * (col("n") - 1)).cast("long") + 1)
      .groupBy("event_type", "q")
      .agg(min(col("bin")).as("bin"), max(col("n")).as("n"))
      .select(col("event_type"), col("q"),
        (col("bin") * QuantileBinWidth).cast("double").as("value_lo"), col("n"))
  }

  private val QuantileBinWidth = 5L

  /** Batch interval-attribution join — the batch twin of
    * [[graft.streaming.StreamJoin.attribution]]: every purchase paired
    * with the same user's clicks in the trailing 4-hour window.
    *
    * Scale shape: the USER equi-key drives the join — Catalyst plans a
    * hash/sort-merge join on `user_id` with the time bounds as a
    * residual filter, so both sides shuffle once on the key and each
    * of 1000 executors joins only its key range. A pure range join
    * (no equi key) would be a BroadcastNestedLoopJoin — quadratic —
    * which PlanShapeSpec asserts never appears here. Per-user click
    * volume bounds the per-row probe work; a skewed power-user key is
    * AQE's skew-join split case, not a plan change.
    */
  def intervalAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id"),
        col("ts").as("purchase_ts"))
    purchases.join(clicks,
        col("user_id") === col("p_user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL '4' HOUR"))
      .select(col("p_user_id").as("user_id"), col("event_id"),
        col("purchase_ts"), col("click_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** Pearson correlation (quantity vs extended price per return flag)
    * from EXACT integer moments. A distributed float `corr()` is
    * accumulation-order-dependent — different partitionings give
    * different last-ulp answers, which breaks backfill equality and
    * cross-engine checks. Here both measures convert to integer cents
    * and the sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    * accumulate as exact decimal(38) sums — bit-stable under ANY
    * partitioning — then ONE double-precision finish computes r.
    * Shuffle carries six numbers per group; the finish is a per-group
    * projection. The same pattern generalizes to covariance/regression
    * slopes at 100 TB.
    */
  def statsCorr(spark: SparkSession, sfDir: String): DataFrame = {
    // cents as decimal(19,0) so products are exact decimal(38,0) —
    // Σ(price²·10⁴) overflows BIGINT already at sf0.1
    val x = cents(col("l_quantity")).cast("decimal(19,0)")
    val y = cents(col("l_extendedprice")).cast("decimal(19,0)")
    def d(c: Column): Column = c.cast("double")
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round(
          (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
              sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))), 6)
          .as("corr_qty_price"))
  }

  /** Multi-way broadcast enrichment chain: orders → customer → nation
    * → region, aggregated per region. The fact table never shuffles —
    * every join is a broadcast hash join, then one shuffle for the
    * final 5-key aggregate.
    */
  def regionOrderVolume(spark: SparkSession, sfDir: String): DataFrame =
    // customer is a billion-row "dimension" at 100 TB — no hint; AQE
    // broadcasts it only while it actually fits
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))) / lit(100.0)).as("total_price"))

  /** Event-type values pivoted into columns. Pinned explicitly: an
    * implicit pivot first runs a distinct-scan JOB to discover the
    * values — an extra pass over the fact table that a 100 TB pipeline
    * never wants for a domain it already knows.
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: daily metrics with one (count, value-sum) column pair per
    * event type, as explicit filtered aggregates — each pivot cell is
    * `count/sum(when(event_type = t, …))`.
    *
    * Why not the relational `.pivot()` API: its executed plan runs TWO
    * aggregation chains — a (day, event_type) pre-aggregate, an
    * exchange, then a `pivotfirst` aggregate that is an
    * ImperativeAggregate (no whole-stage codegen) plus a second
    * exchange. The filtered-aggregate form is the same pivot semantics
    * in ONE codegen partial/final HashAggregate with ONE exchange on
    * the grouping key — same shuffle as a plain groupBy, output width
    * × |pivot values|, and at scale half the exchanges. Count cells
    * with no rows are 0 (filtered COUNT convention), sum cells NULL
    * (no-ELSE CASE), exactly as the oracle pins.
    */
  def pivotDailyType(spark: SparkSession, sfDir: String): DataFrame = {
    val aggs: Seq[Column] = EventTypes.flatMap(t => Seq(
      count(when(col("event_type") === t, 1)).as(s"${t}_n"),
      (sum(when(col("event_type") === t, cents(col("value")))) / lit(100.0))
        .as(s"${t}_val")))
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** UNPIVOT (melt): per-type aggregate metrics rotated from one wide
    * row per type to (type, metric, value) long form — the shape that
    * feeds metric stores and plotting layers. Unpivot is a zero-shuffle
    * Expand over the (tiny) aggregate output; all melted values share
    * one double type, as the operator requires.
    */
  def unpivotTypeMetrics(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).cast("double").as("n_events"),
        (sum(cents(col("value"))) / lit(100.0)).as("total_value"),
        countDistinct(col("user_id")).cast("double").as("n_users"))
      .unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("total_value"), col("n_users")),
        "metric", "metric_value")

  /** FULL OUTER join: high-value click counts vs high-value purchase
    * counts per user — users on either side only surface with NULLs on
    * the other (the conversion-funnel table). Both sides are aggregates
    * hash-partitioned on the join key, so the join itself adds no
    * exchange; the value filter keeps each side selective so exclusive
    * rows exist at every sf.
    */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).filter(col("value") > 180)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_uid"))
      .agg(count(lit(1)).as("n_hv_clicks"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_uid"))
      .agg(count(lit(1)).as("n_hv_purchases"))
    clicks.join(purchases, col("c_uid") === col("p_uid"), "full_outer")
      .select(
        coalesce(col("c_uid"), col("p_uid")).as("user_id"),
        col("n_hv_clicks"), col("n_hv_purchases"))
  }

  /** Sketch-based percentiles (KLL-style): the 100 TB form of
    * [[statsSummary]]'s exact sort-based percentiles — constant memory
    * per group, mergeable partials, one pass.
    *
    * Output contract (hash-verifiable, same shape as
    * [[distinctApprox]]): the sketch value itself is engine-specific,
    * so the compared columns are the group, its exact row count, and
    * booleans asserting each approximate percentile landed inside the
    * exact ±2-percentile band (p50 estimate within [p48, p52] etc.) —
    * a generous envelope for accuracy 10000 (rank error ≤ n/10⁴),
    * computed against the exact sort-based percentiles so a broken
    * sketch flips the boolean and fails the hash. The raw estimates
    * remain available via [[quantileSketchRaw]].
    */
  def quantileSketchRaw(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        approx_percentile(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
        approx_percentile(col("value"), lit(0.9), lit(10000)).as("p90_approx"),
        count(lit(1)).as("n"))

  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        approx_percentile(col("value"), lit(0.5), lit(10000)).as("p50e"),
        approx_percentile(col("value"), lit(0.9), lit(10000)).as("p90e"),
        expr("percentile(value, 0.48)").as("p48"),
        expr("percentile(value, 0.52)").as("p52"),
        expr("percentile(value, 0.88)").as("p88"),
        expr("percentile(value, 0.92)").as("p92"),
        count(lit(1)).as("n"))
      .select(
        col("event_type"), col("n"),
        (col("p50e") >= col("p48") && col("p50e") <= col("p52")).as("p50_in_band"),
        (col("p90e") >= col("p88") && col("p90e") <= col("p92")).as("p90_in_band"))

  /** Welch's t-test per event type between the two experiment arms —
    * the A/B significance readout every event pipeline ends in. The
    * variant comes from the props JSON (`k` parity: arm A = even, arm
    * B = odd — a deterministic hash-bucket assignment exactly like
    * production experiment bucketing), and the statistic is computed
    * the [[statsCorr]] way: per (type, arm) EXACT integer sufficient
    * statistics (n, Σcents, Σcents² in decimal(38)) — one bounded-key
    * exchange, bit-stable under any partitioning — then one
    * double-precision finish per row computes means, Welch variance,
    * and t. Both engines run the identical finish arithmetic on
    * identical exact integers, so the rounded output is cross-engine
    * exact; a naive double `avg`/`var_samp` would drift with partition
    * count and cluster size.
    */
  def statsAbTest(spark: SparkSession, sfDir: String): DataFrame = {
    val cts = cents(col("value")).cast("decimal(19,0)")
    def d(c: Column): Column = c.cast("double")
    val arms = Tables.events(spark, sfDir)
      .select(col("event_type"),
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(2)).as("arm"),
        cts.as("c"))
      .filter(col("arm").isNotNull)
      .groupBy("event_type", "arm")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
    val a = arms.filter(col("arm") === 0)
      .select(col("event_type"), col("n").as("n_a"), col("s").as("s_a"),
        col("ss").as("ss_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("event_type").as("et_b"), col("n").as("n_b"),
        col("s").as("s_b"), col("ss").as("ss_b"))
    def mean(s: Column, n: Column): Column = d(s) / d(n) / 100.0
    def varc(ss: Column, s: Column, n: Column): Column =
      (d(ss) - d(s) * d(s) / d(n)) / (d(n) - 1.0) / 10000.0
    a.join(b, col("event_type") === col("et_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(mean(col("s_a"), col("n_a")), 6).as("mean_a"),
        round(mean(col("s_b"), col("n_b")), 6).as("mean_b"),
        round(
          (mean(col("s_b"), col("n_b")) - mean(col("s_a"), col("n_a"))) /
            sqrt(varc(col("ss_a"), col("s_a"), col("n_a")) / d(col("n_a")) +
              varc(col("ss_b"), col("s_b"), col("n_b")) / d(col("n_b"))), 6)
          .as("t_welch"))
  }

  /** Join-key skew diagnostics over the canonical `user_id` key — the
    * pre-flight every large join runs before choosing between a plain
    * hash join, salting, or an AQE skew split: key cardinality, total
    * rows, the hottest key's count and per-mille share, and how many
    * keys hold more than 10× the mean.
    *
    * Exactness: the 10×-mean test is the integer inequality
    * `c·n_keys > 10·n_rows` in decimal(38) (counts × key cardinality
    * can overflow a long at 100 TB), and the top share is integer
    * per-mille — no float anywhere, bit-stable under any partitioning.
    *
    * Scale shape: one corpus-grain aggregate to per-key counts (the
    * only exchange that sees the corpus — and it is itself skew-FREE:
    * partial counts collapse each hot key map-side to one row per
    * partition), then a key-grain summary with the 1-row global stats
    * broadcast back. The diagnostic for skewed joins never suffers the
    * skew it measures.
    */
  def keySkew(spark: SparkSession, sfDir: String): DataFrame = {
    val d19 = "decimal(19,0)"
    val per = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val s = per.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
      max(col("c")).as("max_count"))
    per.crossJoin(broadcast(s))
      .agg(
        first(col("n_keys")).as("n_keys"),
        first(col("n_rows")).as("n_rows"),
        first(col("max_count")).as("max_count"),
        sum(when(
          col("c").cast(d19) * col("n_keys").cast(d19) >
            lit(10).cast(d19) * col("n_rows").cast(d19), 1L).otherwise(0L))
          .as("hot_keys"))
      .select(col("n_keys"), col("n_rows"), col("max_count"), col("hot_keys"),
        expr("max_count * 1000 div n_rows").as("top_share_pm"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per event type between the
    * two experiment arms (props `k` parity, the [[statsAbTest]]
    * bucketing) — the DISTRIBUTION-drift companion to the mean-level
    * Welch test: KS catches a variance or shape change the t-test
    * misses entirely.
    *
    * Exactness: the statistic `sup |F_a − F_b|` is computed as a PURE
    * INTEGER maximum — per distinct cent value, the cumulative counts
    * satisfy `|cum_a·n_b − cum_b·n_a|` in decimal(38), whose max over
    * values is exact under any partitioning; only the final division
    * by `n_a·n_b` (identical integers in both engines) produces the
    * reported double. No float CDFs, no interpolation.
    *
    * Scale shape — the histogram-cumsum discipline
    * ([[quantileExact]]): the corpus collapses to per-(type, cent,
    * arm) counts first (the only corpus-grain exchange, map-side
    * partials), the window cumsum runs over DISTINCT cent values per
    * type — thousands of rows, not the corpus — and the final max is
    * |types|-sized.
    */
  def ksTest(spark: SparkSession, sfDir: String): DataFrame = {
    val d19 = "decimal(19,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cent").asc)
    val counts = Tables.events(spark, sfDir)
      .select(col("event_type"),
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(2)).as("arm"),
        cents(col("value")).as("cent"))
      .filter(col("arm").isNotNull)
      .groupBy("event_type", "cent")
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
    // totals ride a whole-partition window over the SAME (type)
    // partitioning the cumsum uses — one corpus-grain aggregate total,
    // no second scan and no join (a counts-derived totals frame would
    // recompute the whole upstream per reference)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    counts
      .select(col("event_type"), col("cent"),
        sum(col("ca")).over(w).as("cum_a"),
        sum(col("cb")).over(w).as("cum_b"),
        sum(col("ca")).over(wAll).as("n_a"),
        sum(col("cb")).over(wAll).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        abs(col("cum_a").cast(d19) * col("n_b").cast(d19)
          - col("cum_b").cast(d19) * col("n_a").cast(d19)).as("num"))
      .groupBy("event_type", "n_a", "n_b")
      .agg(max(col("num")).as("ks_num"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("ks_num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("ks"))
  }

  /** Chi-squared independence test of event_type × experiment arm —
    * the categorical member of the A/B family ([[statsAbTest]] tests
    * mean shift, [[ksTest]] distribution shape; this asks whether the
    * event-type MIX itself differs between arms, the first thing that
    * breaks when a variant changes user behavior).
    *
    * Exactness: observed counts are exact integers; expected counts
    * and the statistic are one double-precision finish over the
    * |types|×2 contingency table, every margin riding a
    * whole-partition window over the tiny count table (no second
    * corpus scan, the [[keySkew]]/[[ksTest]] discipline). Rounded at
    * 1e-6 — cell sums are O(10) doubles with 1e-14 noise.
    */
  def chi2Test(spark: SparkSession, sfDir: String): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val wType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val wArm = org.apache.spark.sql.expressions.Window.partitionBy("arm")
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(2)).as("arm"))
      .filter(col("arm").isNotNull)
      .groupBy("event_type", "arm")
      .agg(count(lit(1)).as("o"))
      .select(col("event_type"), col("arm"), col("o"),
        sum(col("o")).over(wType).as("row_tot"),
        sum(col("o")).over(wArm).as("col_tot"),
        sum(col("o")).over(wAll).as("n"),
        count(lit(1)).over(wAll).as("n_cells"),
        size(collect_set(col("event_type")).over(wAll)).as("n_types"),
        size(collect_set(col("arm")).over(wAll)).as("n_arms"))
      .select(col("event_type"), col("arm"), col("o"),
        (d(col("row_tot")) * d(col("col_tot")) / d(col("n"))).as("e"),
        ((col("n_types") - 1) * (col("n_arms") - 1)).cast("long").as("dof"))
      .groupBy("dof")
      .agg(round(sum((d(col("o")) - col("e")) * (d(col("o")) - col("e")) / col("e")), 6)
        .as("chi2"))
      .select(col("chi2"), col("dof"))
  }

  /** TPC-H Q7 shape — volume shipping: revenue flowing between two
    * trading nations in both directions, per ship year. Supplier and
    * customer nations are resolved through their own join paths
    * (lineitem→supplier, lineitem→orders→customer); the nation pair
    * filter is a residual over both. Only the 25-row nation dim is
    * broadcast by hint; every grow-with-data side is AQE-decided
    * (the [[q5LocalSupplier]] discipline).
    */
  def q7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    li.join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q8 shape — national market share: of the PROMO-part revenue
    * sold to ASIA-region customers, the yearly share supplied by
    * NATION_2. Share is a ratio of two cent-exact integer sums
    * (conditional numerator via a when-guard inside the same
    * aggregate — one pass, no self-join), divided once into the
    * rounded double.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nk"))
    val promoParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("asia_nk"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("s_nationkey") === 2, rev).otherwise(0L)) / lit(10000.0))
          .as("nation_revenue"),
        (sum(rev) / lit(10000.0)).as("total_revenue"),
        round(sum(when(col("s_nationkey") === 2, rev).otherwise(0L)).cast("double")
          / sum(rev).cast("double"), 6).as("mkt_share"))
  }

  /** TPC-H Q9 shape — product-type profit by nation and year. This
    * schema has no partsupp, so unit cost proxies as `p_retailprice`:
    * profit = Σ(ep·(1−disc) − qty·retail), all in exact integer
    * cents·cents (one fused expression, one aggregation pass). The
    * part filter (name class) collapses the probe side first; joins
    * follow the [[q5LocalSupplier]] discipline.
    */
  def q9ProfitByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val greenParts = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    val profit = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) -
      cents(col("l_quantity")) * cents(col("p_retailprice"))
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(greenParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(profit) / lit(10000.0)).as("sum_profit"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q2 shape — minimum-balance supplier per part: for each
    * LARGE-type part, the EUROPE supplier that has actually supplied
    * it (via the lineitem link — no partsupp in this schema) with the
    * lowest account balance. The correlated-min is an argmin
    * AGGREGATE (`min_by` on the exact (cents, suppkey) pair — ties to
    * the smaller suppkey), not a window: one partial-combined
    * aggregate per part over the raw link rows (duplicates cannot
    * change an argmin, so there is no pair-dedup exchange) — no
    * per-part sort, no row_number shuffle of the full join.
    */
  def q2MinSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val largeParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "LARGE").select("p_partkey", "p_name")
    // no pair-dedup exchange: duplicate (part, supplier) rows cannot
    // change a min_by argmin, so the raw link rows feed the aggregate
    val eurSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pairs = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
    pairs
      .join(largeParts, col("l_partkey") === col("p_partkey"))
      .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(min(struct(cents(col("s_acctbal")).as("bal_cents"), col("s_suppkey"),
        col("s_name"), col("n_name"))).as("best"))
      .select(col("p_partkey"), col("p_name"),
        col("best.s_suppkey").as("s_suppkey"), col("best.s_name").as("s_name"),
        col("best.n_name").as("nation"),
        (col("best.bal_cents") / lit(100.0)).as("s_acctbal"))
  }

  /** TPC-H Q16 shape — part/supplier diversity: how many distinct
    * suppliers serve each (brand, type, size) class, for parts outside
    * an excluded brand/type and suppliers not on the complaint list
    * (negative balance here — no comment column). The supplier link
    * rides the raw lineitem (partkey, suppkey) link — no partsupp in
    * this schema, and no pair-level distinct (countDistinct dedups
    * itself); exclusion is a left-anti on the tiny bad list; the
    * distinct count is an exact two-level aggregate.
    */
  def q16PartSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    // countDistinct dedups suppliers itself — a pair-level distinct
    // here would just add a corpus-grain exchange
    val pairs = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    * aggregate-then-argmax-by-scalar-subquery pattern. Revenue per
    * supplier is one cent-exact aggregate; the max rides a 1-row
    * broadcast and the equality keeps ALL tied suppliers (exact
    * integers ⇒ ties are real, not float accidents).
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("rev_cbp"))
    val top = rev.agg(max(col("rev_cbp")).as("max_cbp"))
    rev.crossJoin(broadcast(top))
      .filter(col("rev_cbp") === col("max_cbp"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name", "s_acctbal"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cbp") / lit(10000.0)).as("total_revenue"))
  }

  /** Concentration threshold numerator for [[q11ValueConcentration]]:
    * parts worth > ConcentrationPpm/1e6 of total traded value.
    */
  private val ConcentrationPpm = 500L

  /** TPC-H Q11 shape — value concentration: parts whose traded value
    * (Σ qty·price cents, via the lineitem link — no partsupp here)
    * exceeds a fraction of the corpus total. The global total is a
    * 1-row broadcast; the cut compares pure integers
    * (value·1e6 > total·ppm in decimal(38)) — no float share.
    */
  def q11ValueConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val value = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_quantity")) * cents(col("l_extendedprice"))).as("val_c2"))
    val total = value.agg(sum(col("val_c2")).as("total_c2"))
    value.crossJoin(broadcast(total))
      .filter(col("val_c2").cast(d38) * lit(1000000L).cast(d38) >
        col("total_c2").cast(d38) * lit(ConcentrationPpm).cast(d38))
      .select(col("l_partkey").as("p_partkey"),
        (col("val_c2") / lit(10000.0)).as("part_value"))
  }

  /** TPC-H Q21 shape — the sole late supplier: suppliers who shipped
    * late (>60 days after order date) on multi-supplier orders where
    * EVERY OTHER supplier shipped on time — the classic
    * EXISTS/NOT-EXISTS pair over the same fact table, planned as one
    * left-semi plus one left-anti join on `l_orderkey` (each shipping
    * only key columns). Counted per supplier, top-20 deterministic.
    */
  def q21LateSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    // the EXISTS ("another supplier on the order") and NOT EXISTS
    // ("no OTHER late supplier") collapse algebraically to two counts
    // at the (order) grain: I'm late ∧ n_suppliers ≥ 2 ∧ n_late = 1 —
    // so the fact table is scanned ONCE into the (order, supplier)
    // grain (an exchange-free aggregate on the bucketed l_orderkey
    // layout), the order-grain counts are a second tiny aggregate on
    // the same key, and the correlated pair becomes one co-located
    // equi-join — where the literal semi+anti form re-derives the
    // joined fact three times (DataFrame plans share no CTEs)
    val wOrd = Window.partitionBy("l_orderkey")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        1L).otherwise(0L)).as("is_late"))
      // order-grain counts ride a whole-partition window over the SAME
      // (l_orderkey) key the aggregate just hashed on — one derivation
      // of the fact scan, no self-join (a grp-vs-grp join would plan
      // the scan twice: DataFrame plans share no CTEs)
      .select(col("l_suppkey"), col("is_late"),
        count(lit(1)).over(wOrd).as("n_supp"),
        sum(col("is_late")).over(wOrd).as("n_late"))
      .filter(col("is_late") === 1L && col("n_supp") >= 2 && col("n_late") === 1L)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(20)
  }

  /** Two-sample Mann-Whitney U (rank-sum) per event type between the
    * experiment arms (props `k` parity, the [[statsAbTest]] bucketing)
    * — the nonparametric companion to Welch's t ([[statsAbTest]]) and
    * KS ([[ksTest]]): robust to outliers and any distribution shape,
    * and its normalized form IS the AUC "P(a > b)" effect size.
    *
    * Exactness: ties get midranks. Over per-cent-value counts, each of
    * the `ca` arm-a items tied at a value with combined count
    * `ct = ca + cb` and `C` combined items strictly below contributes
    * midrank `C + (ct+1)/2` — a half-integer, so the DOUBLED rank sum
    * `2R_a = Σ ca·(2C + ct + 1)` stays a pure integer (decimal(38):
    * corpus-scale products overflow longs), as does
    * `u2_a = 2R_a − n_a(n_a+1) = 2·U_a`. Both engines compare
    * bit-identical integers; only the AUC ratio is a double, rounded
    * once.
    *
    * Scale shape — the histogram-cumsum discipline ([[ksTest]]): the
    * corpus collapses to per-(type, cent) arm counts first (the only
    * corpus-grain exchange, map-side partials); the cumsum window and
    * the rank fold run over distinct cent values per type.
    */
  /** Benjamini–Hochberg FDR control over the per-type A/B tests
    * (Benjamini & Hochberg, JRSS-B 1995) — the multiple-testing step a
    * metrics platform runs when every event type ships its own
    * experiment readout: naive per-test thresholds inflate false
    * positives with the test count; BH's step-up rule (reject the
    * largest k with p₍ᵢ₎ ≤ i·α/m, and everything ranked below it)
    * controls the expected false-discovery proportion at α = 1/4.
    *
    * p-values are the DISTRIBUTION-FREE Chebyshev bound
    * p = min(1, 1/t²) over [[statsAbTest]]'s Welch t — deliberately:
    * a normal CDF would drag an erf into both engines (a libm surface
    * with no exactness discipline), while 1/t² is one IEEE division on
    * the already-1e-6-rounded t, conservative by construction, and BH
    * remains valid under any valid p-values. The step-up comparison
    * runs as `p·α⁻¹·m ≤ i` with α⁻¹ = 4 exact.
    *
    * Scale shape: everything after [[statsAbTest]]'s sufficient-
    * statistics aggregation is window work over the |event types|-row
    * frame — bounded by the type vocabulary, never the corpus.
    */
  def fdrBh(spark: SparkSession, sfDir: String): DataFrame =
    bhStepUp(statsAbTest(spark, sfDir)
      .select(col("event_type"), col("t_welch"),
        round(least(lit(1.0), lit(1.0) / (col("t_welch") * col("t_welch"))), 9)
          .as("p_cheb")))

  /** The BH step-up rule over any (event_type, t_welch, p_cheb) frame
    * — factored so fixtures can pin the rule's defining behavior: a
    * rank that FAILS its own threshold is still rejected when a larger
    * rank passes (step-up, not step-down).
    */
  private[graft] def bhStepUp(scored: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wAll = W.partitionBy()
    val wRank = W.orderBy(col("p_cheb").asc, col("event_type").asc)
    scored
      .select(col("event_type"), col("t_welch"), col("p_cheb"),
        row_number().over(wRank).as("rnk"), count(lit(1)).over(wAll).as("m"))
      .withColumn("kk", coalesce(
        max(when(col("p_cheb") * 4.0 * col("m") <= col("rnk").cast("double"),
          col("rnk"))).over(wAll), lit(0)))
      .select(col("event_type"), col("t_welch"), col("p_cheb"),
        col("rnk").cast("long").as("bh_rank"),
        (col("rnk") <= col("kk")).as("is_rejected"))
  }

  def mannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cent").asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val counts = Tables.events(spark, sfDir)
      .select(col("event_type"),
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(2)).as("arm"),
        cents(col("value")).as("cent"))
      .filter(col("arm").isNotNull)
      .groupBy("event_type", "cent")
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
    counts
      .select(col("event_type"), col("ca"), col("cb"),
        (col("ca") + col("cb")).as("ct"),
        (sum(col("ca") + col("cb")).over(w) - (col("ca") + col("cb"))).as("cum_below"),
        sum(col("ca")).over(wAll).as("n_a"),
        sum(col("cb")).over(wAll).as("n_b"))
      .groupBy("event_type", "n_a", "n_b")
      .agg(sum(col("ca").cast(d38) *
        (lit(2).cast(d38) * col("cum_below").cast(d38)
          + col("ct").cast(d38) + lit(1).cast(d38))).as("r2a"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        (col("r2a") - col("n_a").cast(d38) * (col("n_a").cast(d38) + lit(1).cast(d38)))
          .cast("long").as("u2_a"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("u2_a"),
        round(col("u2_a").cast("double")
          / (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")),
          6).as("auc"))
  }

  /** SPRT hypotheses for [[sprtTest]]: success = value ≥ $50, tested
    * H0: p=0.35 vs H1: p=0.45 at α=β=0.05. The log-likelihood-ratio
    * increments and the Wald bound are FIXED DECIMAL LITERALS embedded
    * identically in the engine and the oracle — `ln` computed at query
    * time could differ between libm and `java.lang.Math` in the last
    * ulp, so neither engine computes a log at runtime.
    */
  private val SprtLlrPos = 0.251314428280906 // ln(0.45/0.35)
  private val SprtLlrNeg = -0.167054084663166 // ln(0.55/0.65)
  private val SprtBound = 2.944438979166440 // ln((1-β)/α) = ln(19)

  /** Sequential probability-ratio test (Wald) over the daily feed —
    * the "stop the experiment early" monitor a batch A/B report
    * ([[statsAbTest]]) can't give: per type and day, the cumulative
    * LLR of the success rate under H1 vs H0 and the resulting
    * decision. The LLR is `s·C₁ + f·C₀` over EXACT integer
    * success/failure cumsums with constant multipliers — the only
    * doubles are two literal constants, so the trajectory is
    * bit-stable under any partitioning.
    *
    * Scale shape: corpus → per-(type, day) counts (one map-side-
    * combined exchange); cumsums ride a |days|-row window per type.
    */
  def sprtTest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("day").asc)
    val llr = round(col("cs").cast("double") * lit(SprtLlrPos)
      + (col("cn") - col("cs")).cast("double") * lit(SprtLlrNeg), 6)
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(cents(col("value")) >= 5000L, 1L).otherwise(0L)).as("s"))
      .select(col("event_type"), col("day"), col("n"), col("s"),
        sum(col("s")).over(w).as("cs"), sum(col("n")).over(w).as("cn"))
      .select(col("event_type"), col("day"), col("n"), col("s"),
        llr.as("cum_llr"),
        when(llr >= SprtBound, "accept_h1")
          .when(llr <= -SprtBound, "accept_h0")
          .otherwise("continue").as("decision"))
  }

  /** Bootstrap replica count for [[bootstrapCi]]. */
  private val BootstrapReplicas = 32

  /** Poisson(1) CDF thresholds ×10⁴ (P(X≤k) for k = 0..6): the
    * multiplicity inverse-CDF of the Poissonized bootstrap.
    */
  private val PoissonCdf10k = Seq(3679L, 7358L, 9197L, 9810L, 9963L, 9994L, 9999L)

  /** Deterministic bootstrap confidence band for the per-type mean
    * value — the resampling-uncertainty companion to the closed-form
    * tests ([[statsAbTest]]): [[BootstrapReplicas]] Poissonized
    * resamples, each row's multiplicity in replica `b` drawn by
    * inverse-CDF over `md5(event_id‖b) mod 10⁴` ([[sampleStratified]]'s
    * keyed-hash idiom — reproducible across reruns, engines,
    * partitionings and backfills where `rand()` resampling is not),
    * reporting the 2nd-smallest/2nd-largest replica means (the
    * ~94% central band at B=32).
    *
    * Exactness: each replica mean is a ratio of exact integer sums
    * (Σm·cent / 100·Σm), rounded once; the order statistics sort those
    * identical doubles, so the band is bit-stable.
    *
    * Scale shape: the ×B row multiplication happens scan-side against
    * a broadcast 32-row replica frame and collapses IN THE SAME STAGE
    * to |types|·B partial sums (map-side combine) — the exchange
    * carries 160 rows, not B corpora; the band fold is |types|-sized
    * sorted 32-element arrays.
    */
  def bootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    val reps = spark.range(BootstrapReplicas).select(col("id").cast("int").as("b"))
    val h = conv(substring(md5(concat(col("event_id").cast("string"), lit("_"),
      col("b").cast("string"))), 1, 15), 16, 10).cast("long") % 10000
    val mult = PoissonCdf10k.zipWithIndex
      .foldLeft(when(h < PoissonCdf10k.head, 0L)) { case (acc, (t, k)) =>
        if (k == 0) acc else acc.when(h < t, k.toLong)
      }.otherwise(PoissonCdf10k.length.toLong)
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), cents(col("value")).as("cent"))
      .crossJoin(broadcast(reps))
      .select(col("event_type"), col("b"), mult.as("m"), col("cent"))
      .groupBy("event_type", "b")
      .agg(sum(col("m") * col("cent")).as("s"), sum(col("m")).as("n"))
      .select(col("event_type"),
        round(col("s").cast("double") / (lit(100.0) * col("n")), 6).as("mean"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_replicas"),
        sort_array(collect_list(col("mean"))).as("means"))
      .select(col("event_type"), col("n_replicas"),
        element_at(col("means"), 2).as("boot_lo"),
        element_at(col("means"), BootstrapReplicas - 1).as("boot_hi"))
  }

  /** Quantity floor for [[q18LargeOrders]]. */
  private val LargeOrderQty = 150L

  /** TPC-H Q18 shape — large-volume orders: orders whose total line
    * quantity exceeds a floor, with their customer and total price,
    * largest first. The aggregate-then-filter (HAVING) + join-back
    * pattern: the order-grain quantity aggregate rides the bucketed
    * `l_orderkey` layout exchange-free, the HAVING collapses the
    * result to the rare large orders BEFORE any join, and the
    * order/customer joins touch only survivors. All-integer quantity
    * and cent-exact price; top-50 cut deterministic by (qty desc,
    * orderkey asc).
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > LargeOrderQty)
    big
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      // customer grows with the data — no hardcoded broadcast hint (it
      // would OOM at 100× scale); AQE/parquet stats broadcast it
      // whenever it actually fits
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(50)
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), cents(col("o_totalprice")).as("total_price_cents"),
        col("total_qty"))
  }

  /** Minimum pair support for [[basketPairs]]. */
  private val BasketMinSupport = 2L

  /** Market-basket co-occurrence pairs — 1-level frequent-itemset
    * mining over order baskets: part pairs appearing together in at
    * least [[BasketMinSupport]] orders, the support counting behind
    * association rules and co-purchase recommenders.
    *
    * Scale shape: ONE grouped exchange folds lineitem into per-order
    * item SETS (collect_set dedups in the aggregation buffer — no
    * separate distinct pass), then the items² pair expansion happens
    * INSIDE the row as a sorted-array double-transform (bounded by the
    * order line limit — TPC-H: 7 — so pair output is linear in
    * orders), and one more exchange counts pair support. The previous
    * distinct + equi-self-join form planned three exchanges and a
    * join; this is two exchanges and none. The support filter
    * collapses the pair space before anything else sees it.
    */
  def basketPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
    val pairs = flatten(transform(col("ps"), (x, i) =>
      transform(slice(col("ps"), i + lit(2), size(col("ps"))),
        y => struct(x.as("part_a"), y.as("part_b")))))
    baskets.select(explode(pairs).as("p"))
      .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= BasketMinSupport)
  }

  /** TPC-H Q6 shape — forecasting-revenue change: scan-only aggregate
    * under three pushable predicates (date range, discount band,
    * quantity ceiling). The entire query is one parquet scan with all
    * filters pushed and a 2-column read schema, then a single partial→
    * final scalar aggregate — the cheapest possible shape at any
    * scale. Revenue is summed in exact integer cents×cents (ep·disc),
    * divided back once.
    */
  def q6RevenueChange(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
        / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q4 shape — order-priority checking: orders in a quarter
    * that had at least one late-shipping lineitem (shipped >60 days
    * after the order date; the reference's commit/receipt dates are
    * not in this schema), counted per priority. The EXISTS is a
    * left-semi join on the `l_orderkey` equi-key with the date
    * comparison as a residual — the semi join ships only the key +
    * shipdate of the probe side, stops at first match, and rides the
    * bucketed orderkey layout exchange-free.
    */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q13 shape — customer order-count distribution: left outer
    * join customer→(priority-filtered) orders, count orders per
    * customer (including zero), then histogram the counts. The
    * classic two-level re-aggregation: the first agg keys on
    * c_custkey (bucketed layout → exchange-free), the second on the
    * tiny count domain, so the wide exchange happens at customer
    * grain once and the histogram exchange carries ≤ a few dozen
    * rows.
    */
  def q13CustomerDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17 shape — small-quantity-order revenue: for SMALL-type
    * parts of one brand, the average yearly revenue lost if orders
    * below 20% of the part's average quantity were not taken. The
    * correlated subquery becomes an aggregate-then-self-join on
    * `l_partkey`; the "below 20% of avg" predicate is evaluated in
    * exact integers (qty·5·n < Σqty, all in cents) so the cut is
    * bit-identical across engines and partitionings. Both sides ride
    * the same partkey key; the part dim filter collapses the probe
    * side first.
    */
  def q17SmallQuantity(spark: SparkSession, sfDir: String): DataFrame = {
    val smallParts = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      .select("p_partkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(smallParts, col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
      .agg(sum(cents(col("l_quantity"))).as("qty_sum"),
        count(lit(1)).as("qty_n"))
    li.join(avgQty, col("l_partkey") === col("ap_key"))
      // l_quantity < 0.2 * avg  ⇔  qty_cents * 5 * n < Σqty_cents
      .filter(cents(col("l_quantity")) * 5 * col("qty_n") < col("qty_sum"))
      .agg((sum(cents(col("l_extendedprice"))) / lit(700.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q19 shape — discounted revenue over a disjunction of
    * (brand, size band, quantity band) triples: the OR-of-ANDs
    * predicate spans both join sides, so it evaluates as a residual
    * on the `l_partkey` equi-join — never a cartesian. The per-side
    * conjuncts that appear in every branch (size ≥ 1) still push to
    * the part scan.
    */
  def q19DisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val branch1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#15" &&
      col("p_size").between(1, 50) && col("l_quantity").between(20, 30)
    li.join(p, col("l_partkey") === col("p_partkey") &&
        (branch1 || branch2 || branch3))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q22 shape — global sales opportunity: per-nation count and
    * total balance of above-average-balance customers with no recent
    * order (every synthetic customer has SOME order, so the classic
    * "never ordered" form is vacuous; the recency cut keeps the
    * anti-join shape non-degenerate). The scalar subquery (average
    * positive balance) is a 1-row aggregate cross-joined in
    * (broadcast by construction); the "above average" cut compares in
    * exact integers (bal·n_pos > Σpos, cents); NOT EXISTS is a
    * left-anti join whose probe side is date-filtered BEFORE the
    * join, shipping only `o_custkey` of recent orders.
    */
  def q22SalesOpportunity(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val posAvg = cust.filter(col("c_acctbal") > 0)
      .agg(sum(cents(col("c_acctbal"))).as("pos_sum"),
        count(lit(1)).as("pos_n"))
    val ordKeys = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(posAvg))
      .filter(cents(col("c_acctbal")) * col("pos_n") > col("pos_sum"))
      .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        (sum(cents(col("c_acctbal"))) / lit(100.0)).as("totacctbal"))
  }

  /** TPC-H Q12 shape — shipping modes and order priority: for
    * late-shipped lineitems of a year (shipped >90 days after the
    * order date; this schema has no ship mode or commit/receipt
    * dates, so `l_returnflag` stands in as the mode-like low-
    * cardinality grouping and ship-vs-order lag as the lateness
    * test), count lines from critical-priority orders vs the rest.
    * The shape under test: fact⋈fact equi-join on `l_orderkey` with
    * a cross-side residual date predicate, then CASE-conditional
    * counts over a 3-value group domain. Rides the bucketed orderkey
    * layout; only (key, date, priority) columns cross the join.
    */
  def q12ShipmodePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 0L).otherwise(1L))
          .as("low_line_count"))
  }

  /** Dominance share numerator/denominator for [[q20PotentialPromotion]]:
    * a supplier "dominates" a part when it shipped strictly more than
    * `DomNum/DomDen` of the part's total 1997 quantity. Exact-integer
    * compare (`supp_qty·Den > part_qty·Num` in cents) so the cut is
    * bit-identical across engines.
    */
  private val DomNum = 1L
  private val DomDen = 2L

  /** TPC-H Q20 shape — potential part promotion: name suppliers who
    * dominated the 1997 supply of any PROMO part (this schema has no
    * partsupp/availqty, so "excess stock" becomes "shipped more than
    * half the part's total year volume" — the same nested-aggregate →
    * semi-join chain). Shape under test: two-level aggregation of the
    * same fact slice at (supp, part) and (part) grain, an exact-
    * integer dominance cut joining them on `l_partkey`, and a final
    * left-semi into the supplier dim. The fact slice aggregates ONCE
    * at the finer grain and the part totals re-aggregate those
    * partials, so the corpus is scanned and shuffled a single time.
    */
  def q20PotentialPromotion(spark: SparkSession, sfDir: String): DataFrame = {
    val promoParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val perSuppPart = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(cents(col("l_quantity"))).as("supp_qty"))
    val perPart = perSuppPart.groupBy(col("l_partkey").as("pp_key"))
      .agg(sum(col("supp_qty")).as("part_qty"))
    val dominant = perSuppPart.join(perPart, col("l_partkey") === col("pp_key"))
      .filter(col("supp_qty") * DomDen > col("part_qty") * DomNum)
      .select("l_suppkey")
    Tables.supplier(spark, sfDir)
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** The A/B-test oracle factored into CTEs + select so the BH-FDR
    * oracle can stack on the identical per-type statistics.
    */
  private val AbTestCtes =
    """arms AS (
         SELECT event_type,
                TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 AS arm,
                count(*) AS n,
                sum(CAST(CAST(round(value*100) AS BIGINT) AS HUGEINT)) AS s,
                sum(CAST(CAST(round(value*100) AS BIGINT) AS HUGEINT)
                    * CAST(round(value*100) AS BIGINT)) AS ss
         FROM events
         WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
         GROUP BY 1, 2),
       a AS (SELECT event_type, n AS n_a, s AS s_a, ss AS ss_a FROM arms WHERE arm = 0),
       b AS (SELECT event_type, n AS n_b, s AS s_b, ss AS ss_b FROM arms WHERE arm = 1)"""

  private val AbTestSelect =
    """SELECT a.event_type, n_a, n_b,
              round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0, 6) AS mean_a,
              round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0, 6) AS mean_b,
              round(
                (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0
                 - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0) /
                sqrt(((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) - 1.0) / 10000.0) / CAST(n_a AS DOUBLE)
                    + ((CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        / (CAST(n_b AS DOUBLE) - 1.0) / 10000.0) / CAST(n_b AS DOUBLE)), 6)
                AS t_welch
       FROM a JOIN b USING (event_type)"""

  val oracleSql: Map[String, String] = Map(
    "stats_bootstrap" -> {
      val multCase = PoissonCdf10k.zipWithIndex
        .map { case (t, k) => s"WHEN h < $t THEN $k" }
        .mkString("CASE ", " ", s" ELSE ${PoissonCdf10k.length} END")
      s"""WITH reps AS (SELECT unnest(range($BootstrapReplicas)) AS b),
         base AS (
           SELECT event_type, event_id,
                  CAST(round(value * 100) AS BIGINT) AS cent
           FROM events),
         mult AS (
           SELECT event_type, b, cent,
                  ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '_'
                     || CAST(b AS VARCHAR)), 1, 15))::BIGINT % 10000 AS h
           FROM base, reps),
         mm AS (SELECT event_type, b, cent, $multCase AS m FROM mult),
         means AS (
           SELECT event_type, b,
                  round(CAST(sum(m * cent) AS DOUBLE) / (100.0 * sum(m)), 6) AS mean
           FROM mm GROUP BY 1, 2),
         bands AS (
           SELECT event_type, count(*) AS n_replicas,
                  list(mean ORDER BY mean) AS ms
           FROM means GROUP BY 1)
         SELECT event_type, n_replicas,
                ms[2] AS boot_lo, ms[${BootstrapReplicas - 1}] AS boot_hi
         FROM bands"""
    },
    "window_ntile" ->
      """SELECT c_custkey,
                CAST(c_nationkey AS BIGINT) AS c_nationkey,
                CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
                CAST(ntile(4) OVER (PARTITION BY c_nationkey
                  ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                           c_custkey ASC) AS BIGINT) AS quartile
         FROM customer""",
    "stats_linreg" ->
      """WITH s0 AS (SELECT min(CAST(ts AS DATE)) AS min_day FROM events),
         base AS (
           SELECT event_type,
                  CAST(date_diff('day', s0.min_day, CAST(ts AS DATE)) AS HUGEINT) AS x,
                  CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS y
           FROM events, s0),
         m AS (
           SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                  sum(x) AS sx, sum(y) AS sy,
                  sum(x * x) AS sxx, sum(x * y) AS sxy
           FROM base GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n_events,
                round(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_day,
                round((CAST(sy AS DOUBLE)
                       - (CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE))
                         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                  AS intercept_cents
         FROM m""",
    "agg_grouping_sets" ->
      """SELECT event_type,
                CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                CAST(GROUPING(event_type) AS BIGINT) AS g_type,
                CAST(GROUPING(CAST(dayofweek(ts) + 1 AS BIGINT)) AS BIGINT) AS g_dow,
                sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
                count(*) AS n_rows
         FROM events
         GROUP BY GROUPING SETS ((event_type), (CAST(dayofweek(ts) + 1 AS BIGINT)), ())""",
    "stats_sprt" ->
      s"""WITH daily AS (
           SELECT event_type,
                  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  count(*) AS n,
                  sum(CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
                           THEN 1 ELSE 0 END) AS s
           FROM events GROUP BY 1, 2),
         cum AS (
           SELECT event_type, day,
                  CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
                  sum(s) OVER w AS cs, sum(n) OVER w AS cn
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
                        ROWS UNBOUNDED PRECEDING))
         SELECT event_type, day, n, s,
                round(CAST(cs AS DOUBLE) * $SprtLlrPos
                      + CAST(cn - cs AS DOUBLE) * ($SprtLlrNeg), 6) AS cum_llr,
                CASE WHEN round(CAST(cs AS DOUBLE) * $SprtLlrPos
                      + CAST(cn - cs AS DOUBLE) * ($SprtLlrNeg), 6) >= $SprtBound
                       THEN 'accept_h1'
                     WHEN round(CAST(cs AS DOUBLE) * $SprtLlrPos
                      + CAST(cn - cs AS DOUBLE) * ($SprtLlrNeg), 6) <= -$SprtBound
                       THEN 'accept_h0'
                     ELSE 'continue' END AS decision
         FROM cum""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_cbp
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate <  TIMESTAMP '1997-04-01'
           GROUP BY 1)
         SELECT s.s_suppkey, s.s_name,
                CAST(r.rev_cbp AS BIGINT) / 10000.0 AS total_revenue
         FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
         WHERE r.rev_cbp = (SELECT max(rev_cbp) FROM rev)""",
    "q11_value_concentration" ->
      s"""WITH v AS (
           SELECT l_partkey,
                  sum(CAST(round(l_quantity * 100) AS BIGINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS val_c2
           FROM lineitem GROUP BY 1),
         t AS (SELECT sum(val_c2) AS total_c2 FROM v)
         SELECT l_partkey AS p_partkey,
                CAST(val_c2 AS BIGINT) / 10000.0 AS part_value
         FROM v, t
         WHERE CAST(val_c2 AS HUGEINT) * 1000000
               > CAST(total_c2 AS HUGEINT) * $ConcentrationPpm""",
    "q21_late_supplier" ->
      """WITH li AS (
           SELECT l.l_orderkey, l.l_suppkey,
                  l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         late_lines AS (
           SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
         SELECT l_suppkey AS s_suppkey, count(*) AS numwait
         FROM late_lines x
         WHERE EXISTS (SELECT 1 FROM li y
                       WHERE y.l_orderkey = x.l_orderkey
                         AND y.l_suppkey <> x.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM li z
                           WHERE z.l_orderkey = x.l_orderkey
                             AND z.l_suppkey <> x.l_suppkey AND z.late)
         GROUP BY 1
         ORDER BY numwait DESC, s_suppkey ASC
         LIMIT 20""",
    "q16_part_supplier" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         SELECT p.p_brand, p.p_type, p.p_size,
                count(DISTINCT pr.l_suppkey) AS supplier_cnt
         FROM pairs pr
         JOIN part p ON pr.l_partkey = p.p_partkey
          AND p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
         WHERE NOT EXISTS (SELECT 1 FROM bad b WHERE b.s_suppkey = pr.l_suppkey)
         GROUP BY 1, 2, 3""",
    "q9_profit_by_nation" ->
      """SELECT n.n_name AS nation,
                CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                    - CAST(round(l.l_quantity * 100) AS BIGINT)
                      * CAST(round(p.p_retailprice * 100) AS BIGINT)) / 10000.0
                  AS sum_profit,
                count(*) AS n_lines
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2""",
    "q2_min_supplier" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eur AS (
           SELECT s.s_suppkey, s.s_name,
                  CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents,
                  n.n_name
           FROM supplier s
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'EUROPE'),
         ranked AS (
           SELECT p.p_partkey, p.p_name, e.s_suppkey, e.s_name, e.n_name,
                  e.bal_cents,
                  row_number() OVER (PARTITION BY p.p_partkey
                    ORDER BY e.bal_cents ASC, e.s_suppkey ASC) AS rn
           FROM pairs pr
           JOIN part p ON pr.l_partkey = p.p_partkey AND p.p_type = 'LARGE'
           JOIN eur e ON pr.l_suppkey = e.s_suppkey)
         SELECT p_partkey, p_name, s_suppkey, s_name, n_name AS nation,
                bal_cents / 100.0 AS s_acctbal
         FROM ranked WHERE rn = 1""",
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
                  AS revenue,
                count(*) AS n_lines
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         GROUP BY 1, 2, 3""",
    "q8_market_share" ->
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                sum(CASE WHEN s.s_nationkey = 2 THEN rev ELSE 0 END) / 10000.0
                  AS nation_revenue,
                sum(rev) / 10000.0 AS total_revenue,
                round(CAST(sum(CASE WHEN s.s_nationkey = 2 THEN rev ELSE 0 END)
                           AS DOUBLE) / sum(rev), 6) AS mkt_share
         FROM (SELECT l_orderkey, l_partkey, l_suppkey,
                      CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
               FROM lineitem) l
         JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY 1""",
    "stats_mannwhitney" ->
      """WITH base AS (
           SELECT event_type,
                  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 AS arm,
                  CAST(round(value * 100) AS BIGINT) AS cent
           FROM events
           WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
         counts AS (
           SELECT event_type, cent,
                  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
           FROM base GROUP BY 1, 2),
         ranked AS (
           SELECT event_type, ca, cb, ca + cb AS ct,
                  sum(ca + cb) OVER (PARTITION BY event_type ORDER BY cent ASC)
                    - (ca + cb) AS cum_below,
                  CAST(sum(ca) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
                  CAST(sum(cb) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
           FROM counts),
         folded AS (
           SELECT event_type, n_a, n_b,
                  sum(CAST(ca AS HUGEINT)
                      * (2 * CAST(cum_below AS HUGEINT) + ct + 1)) AS r2a
           FROM ranked GROUP BY 1, 2, 3)
         SELECT event_type, n_a, n_b,
                CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
                round(CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE)
                      / (2.0 * n_a * n_b), 6) AS auc
         FROM folded""",
    "q6_revenue_change" ->
      """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue,
                count(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate <  TIMESTAMP '1998-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "q12_shipmode_priority" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate <  TIMESTAMP '1998-01-01'
           AND l_shipdate > o_orderdate + INTERVAL 90 DAY
         GROUP BY 1""",
    "q20_potential_promotion" ->
      s"""WITH per_supp_part AS (
           SELECT l_partkey, l_suppkey,
                  sum(CAST(round(l_quantity * 100) AS BIGINT)) AS supp_qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_type = 'PROMO'
             AND l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate <  TIMESTAMP '1998-01-01'
           GROUP BY 1, 2),
         per_part AS (
           SELECT l_partkey, sum(supp_qty) AS part_qty
           FROM per_supp_part GROUP BY 1)
         SELECT s_suppkey, s_name
         FROM supplier
         WHERE EXISTS (
           SELECT 1 FROM per_supp_part sp JOIN per_part p USING (l_partkey)
           WHERE sp.l_suppkey = s_suppkey
             AND CAST(sp.supp_qty AS HUGEINT) * $DomDen
                 > CAST(p.part_qty AS HUGEINT) * $DomNum)""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate <  TIMESTAMP '1997-10-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1""",
    "q13_customer_distribution" ->
      """WITH per_cust AS (
           SELECT c.c_custkey, count(o.o_orderkey) AS c_count
           FROM customer c
           LEFT JOIN orders o
             ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '4-NOT SPECIFIED'
           GROUP BY 1)
         SELECT c_count, count(*) AS custdist
         FROM per_cust GROUP BY 1""",
    "q17_small_quantity" ->
      """WITH li AS (
           SELECT l.l_partkey,
                  CAST(round(l.l_quantity * 100) AS BIGINT) AS qty_c,
                  CAST(round(l.l_extendedprice * 100) AS BIGINT) AS ep_c
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'),
         avgq AS (
           SELECT l_partkey, sum(qty_c) AS qty_sum, count(*) AS qty_n
           FROM li GROUP BY 1)
         SELECT sum(li.ep_c) / 700.0 AS avg_yearly, count(*) AS n_lines
         FROM li JOIN avgq USING (l_partkey)
         WHERE CAST(li.qty_c AS HUGEINT) * 5 * avgq.qty_n < avgq.qty_sum""",
    "q19_disjunctive_revenue" ->
      """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
                  AS revenue,
                count(*) AS n_lines
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 1 AND 11)
            OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
                AND l.l_quantity BETWEEN 10 AND 20)
            OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 50
                AND l.l_quantity BETWEEN 20 AND 30)""",
    "q22_sales_opportunity" ->
      """WITH pos AS (
           SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS pos_sum,
                  count(*) AS pos_n
           FROM customer WHERE c_acctbal > 0)
         SELECT c.c_nationkey, count(*) AS numcust,
                sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
         FROM customer c, pos
         WHERE CAST(round(c.c_acctbal * 100) AS HUGEINT) * pos.pos_n > pos.pos_sum
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY 1""",
    "q18_large_orders" ->
      s"""WITH big AS (
            SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
            FROM lineitem GROUP BY 1
            HAVING sum(CAST(l_quantity AS BIGINT)) > $LargeOrderQty)
          SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
                 CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_price_cents,
                 b.total_qty
          FROM big b
          JOIN orders o ON b.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          ORDER BY b.total_qty DESC, o.o_orderkey ASC
          LIMIT 50""",
    "q10_returned_items" ->
      """WITH r AS (
           SELECT o.o_custkey,
                  sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_cbp,
                  count(*) AS n_items
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE l.l_returnflag = 'R'
           GROUP BY 1)
         SELECT c.c_custkey, c.c_name,
                CAST(r.rev_cbp AS BIGINT) / 10000.0 AS revenue,
                r.n_items, c.c_acctbal
         FROM r JOIN customer c ON r.o_custkey = c.c_custkey
         ORDER BY r.rev_cbp DESC, c.c_custkey ASC
         LIMIT 20""",
    "basket_pairs" ->
      """WITH items AS (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         HAVING count(*) >= 2""",
    "stats_chi2" ->
      """WITH o AS (
           SELECT event_type,
                  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 AS arm,
                  count(*) AS o
           FROM events
           WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
           GROUP BY 1, 2),
         m AS (
           SELECT event_type, arm, o,
                  sum(o) OVER (PARTITION BY event_type) AS row_tot,
                  sum(o) OVER (PARTITION BY arm) AS col_tot,
                  sum(o) OVER () AS n
           FROM o),
         dims AS (SELECT (count(DISTINCT event_type) - 1)
                         * (count(DISTINCT arm) - 1) AS dof FROM o)
         SELECT round(sum((CAST(o AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)
                          * (CAST(o AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)
                          / (CAST(row_tot AS DOUBLE) * col_tot / n)), 6) AS chi2,
                CAST(dims.dof AS BIGINT) AS dof
         FROM m, dims
         GROUP BY dims.dof""",
    "stats_ks_test" ->
      """WITH base AS (
           SELECT event_type,
                  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 AS arm,
                  CAST(round(value * 100) AS BIGINT) AS cent
           FROM events
           WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
         counts AS (
           SELECT event_type, cent,
                  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
           FROM base GROUP BY 1, 2),
         cum AS (
           SELECT event_type, cent,
                  sum(ca) OVER (PARTITION BY event_type ORDER BY cent ASC) AS cum_a,
                  sum(cb) OVER (PARTITION BY event_type ORDER BY cent ASC) AS cum_b
           FROM counts),
         tot AS (
           SELECT event_type, CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b
           FROM counts GROUP BY 1)
         SELECT c.event_type, t.n_a, t.n_b,
                round(CAST(max(abs(CAST(c.cum_a AS HUGEINT) * t.n_b
                                   - CAST(c.cum_b AS HUGEINT) * t.n_a)) AS DOUBLE)
                      / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)), 6) AS ks
         FROM cum c JOIN tot t USING (event_type)
         GROUP BY c.event_type, t.n_a, t.n_b""",
    "stats_key_skew" ->
      """WITH per AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
         s AS (SELECT count(*) AS n_keys, sum(c) AS n_rows, max(c) AS max_count
               FROM per)
         SELECT s.n_keys, CAST(s.n_rows AS BIGINT) AS n_rows, s.max_count,
                CAST(sum(CASE WHEN CAST(p.c AS HUGEINT) * s.n_keys
                                   > 10 * CAST(s.n_rows AS HUGEINT)
                              THEN 1 ELSE 0 END) AS BIGINT) AS hot_keys,
                CAST(s.max_count * 1000 // s.n_rows AS BIGINT) AS top_share_pm
         FROM per p, s
         GROUP BY s.n_keys, s.n_rows, s.max_count""",
    "stats_ab_test" -> s"WITH $AbTestCtes $AbTestSelect",
    "stats_fdr_bh" ->
      s"""WITH $AbTestCtes,
          ab AS ($AbTestSelect),
          p AS (
            SELECT event_type, t_welch,
                   round(least(1.0, 1.0 / (t_welch * t_welch)), 9) AS p_cheb
            FROM ab),
          r AS (
            SELECT event_type, t_welch, p_cheb,
                   row_number() OVER (ORDER BY p_cheb ASC, event_type ASC) AS rnk,
                   count(*) OVER () AS m
            FROM p),
          k AS (
            SELECT coalesce(max(CASE WHEN p_cheb * 4.0 * m <= CAST(rnk AS DOUBLE)
                                     THEN rnk END), 0) AS kk
            FROM r)
          SELECT event_type, t_welch, p_cheb, CAST(rnk AS BIGINT) AS bh_rank,
                 (rnk <= (SELECT kk FROM k)) AS is_rejected
          FROM r""",
    "q1_pricing_summary" ->
      """WITH c AS (
           SELECT l_returnflag, l_linestatus,
                  CAST(round(l_quantity*100) AS BIGINT) AS qty,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS price,
                  CAST(round(l_discount*100) AS BIGINT) AS disc,
                  CAST(round(l_tax*100) AS BIGINT) AS tax
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00')
         SELECT l_returnflag, l_linestatus,
                sum(qty) / CAST(100 AS DOUBLE) AS sum_qty,
                sum(price) / CAST(100 AS DOUBLE) AS sum_base_price,
                sum(price * (100 - disc)) / CAST(10000 AS DOUBLE) AS sum_disc_price,
                sum(price * (100 - disc) * (100 + tax)) / CAST(1000000 AS DOUBLE) AS sum_charge,
                sum(qty) / CAST(100 AS DOUBLE) / count(*) AS avg_qty,
                sum(price) / CAST(100 AS DOUBLE) / count(*) AS avg_price,
                sum(disc) / CAST(100 AS DOUBLE) / count(*) AS avg_disc,
                count(*) AS count_order
         FROM c GROUP BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
                sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) / CAST(10000 AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY o_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
                sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) / CAST(10000 AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY n_name""",
    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""",
    "join_anti" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""",
    "window_rank" ->
      """SELECT c_nationkey, rank_in_nation, c_custkey, c_name, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_name, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
           FROM customer)
         WHERE rank_in_nation <= 3""",
    "window_running_sum" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
                sum(CAST(round(l_quantity*100) AS BIGINT))
                     OVER (PARTITION BY l_suppkey
                           ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / CAST(100 AS DOUBLE) AS running_qty
         FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'""",
    "window_rolling_count" ->
      """SELECT user_id, ts, event_id,
                count(*) OVER w AS rolling_events,
                CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) / CAST(100 AS DOUBLE) AS rolling_value
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '10 minutes' PRECEDING AND CURRENT ROW)""",
    "setop_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'""",
    "setop_except" ->
      """SELECT user_id FROM events WHERE event_type = 'click' AND value > 180
         EXCEPT
         SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 180""",
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                sum(CAST(round(l_quantity*100) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                sum(CAST(round(l_quantity*100) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "distinct_exact" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type""",
    "distinct_exact_salted" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type""",
    "q14_promo_revenue" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
                sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
                    ELSE 0 END) / CAST(10000 AS DOUBLE) AS promo_revenue,
                sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)))
                  / CAST(10000 AS DOUBLE) AS total_revenue,
                count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
         GROUP BY CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)""",
    "stats_quantile_exact" ->
      s"""WITH counts AS (
            SELECT source, n_chars, count(*) AS c FROM documents
            GROUP BY source, n_chars),
          tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY source),
          cum AS (
            SELECT source, n_chars,
                   CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM counts),
          qs AS (SELECT unnest([${QuantileQs.map(q => s"CAST($q AS DOUBLE)").mkString(", ")}]) AS q)
          SELECT c.source, q, min(n_chars) AS value, max(t.n) AS n
          FROM cum c JOIN tot t USING (source) CROSS JOIN qs
          WHERE c.cum >= CAST(floor(q * (t.n - 1)) AS BIGINT) + 1
          GROUP BY c.source, q""",
    "stats_summary" ->
      """SELECT event_type,
                round(avg(value), 6) AS avg_value,
                round(stddev_samp(value), 6) AS stddev_value,
                round(quantile_cont(value, 0.5), 6) AS median_value,
                round(quantile_cont(value, 0.9), 6) AS p90_value,
                count(*) AS n
         FROM events GROUP BY event_type""",
    "join_interval" ->
      """SELECT p.pu AS user_id, p.event_id, p.pts AS purchase_ts, c.cts AS click_ts,
                epoch_us(p.pts) - epoch_us(c.cts) AS lag_us
         FROM (SELECT user_id AS pu, event_id, ts AS pts FROM events
               WHERE event_type = 'purchase') p
         JOIN (SELECT user_id, ts AS cts FROM events
               WHERE event_type = 'click') c
           ON c.user_id = p.pu
          AND c.cts <= p.pts
          AND c.cts >= p.pts - INTERVAL 4 HOUR""",
    "stats_corr" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
                  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                  sum(CAST(x AS HUGEINT)*y) AS sxy,
                  sum(CAST(x AS HUGEINT)*x) AS sxx,
                  sum(CAST(y AS HUGEINT)*y) AS syy
           FROM (SELECT l_returnflag,
                        CAST(round(l_quantity*100) AS BIGINT) AS x,
                        CAST(round(l_extendedprice*100) AS BIGINT) AS y
                 FROM lineitem)
           GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
                      (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
                       sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6)
                  AS corr_qty_price
         FROM m""",
    "region_order_volume" ->
      """SELECT r_name, count(*) AS n_orders,
                sum(CAST(round(o_totalprice*100) AS BIGINT)) / CAST(100 AS DOUBLE) AS total_price
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "pivot_daily_type" -> {
      val cells = EventTypes.map { t =>
        s"""count(CASE WHEN event_type = '$t' THEN 1 END) AS ${t}_n,
                sum(CASE WHEN event_type = '$t' THEN CAST(round(value*100) AS BIGINT) END) / CAST(100 AS DOUBLE) AS ${t}_val"""
      }.mkString(",\n                ")
      s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                $cells
         FROM events
         GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)"""
    },
    "unpivot_type_metrics" ->
      """WITH a AS (
           SELECT event_type,
                  CAST(count(*) AS DOUBLE) AS n_events,
                  sum(CAST(round(value*100) AS BIGINT)) / CAST(100 AS DOUBLE) AS total_value,
                  CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
           FROM events GROUP BY event_type)
         SELECT event_type, 'n_events' AS metric, n_events AS metric_value FROM a
         UNION ALL
         SELECT event_type, 'total_value' AS metric, total_value AS metric_value FROM a
         UNION ALL
         SELECT event_type, 'n_users' AS metric, n_users AS metric_value FROM a""",
    "join_full_outer" ->
      """WITH c AS (
           SELECT user_id, count(*) AS n_hv_clicks FROM events
           WHERE event_type = 'click' AND value > 180 GROUP BY user_id),
         p AS (
           SELECT user_id, count(*) AS n_hv_purchases FROM events
           WHERE event_type = 'purchase' AND value > 180 GROUP BY user_id)
         SELECT coalesce(c.user_id, p.user_id) AS user_id,
                n_hv_clicks, n_hv_purchases
         FROM c FULL JOIN p ON c.user_id = p.user_id""",
    // distinct_approx / stats_quantile_sketch: the raw sketch values
    // are engine-specific, so the hashed contract is (group, exact
    // value, estimate-within-pinned-band boolean) — the Spark side
    // computes the boolean from the real sketch, the oracle pins the
    // exact values and `true`.
    "distinct_approx" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
                true AS within_band
         FROM events GROUP BY event_type""",
    "stats_quantile_sketch" ->
      """SELECT event_type, count(*) AS n,
                true AS p50_in_band, true AS p90_in_band
         FROM events GROUP BY event_type""",
    "stats_quantile_binned" ->
      s"""WITH counts AS (
            SELECT event_type, CAST(floor(value / $QuantileBinWidth) AS BIGINT) AS bin,
                   count(*) AS c
            FROM events GROUP BY event_type, 2),
          tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY event_type),
          cum AS (
            SELECT event_type, bin,
                   CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM counts),
          qs AS (SELECT unnest([${QuantileQs.map(q => s"CAST($q AS DOUBLE)").mkString(", ")}]) AS q)
          SELECT c.event_type, q,
                 CAST(min(bin) * $QuantileBinWidth AS DOUBLE) AS value_lo,
                 max(t.n) AS n
          FROM cum c JOIN tot t USING (event_type) CROSS JOIN qs
          WHERE c.cum >= CAST(floor(q * (t.n - 1)) AS BIGINT) + 1
          GROUP BY c.event_type, q""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q5_local_supplier" -> q5LocalSupplier _,
    "join_semi" -> joinSemi _,
    "join_anti" -> joinAnti _,
    "window_rank" -> windowRank _,
    "window_running_sum" -> windowRunningSum _,
    "window_rolling_count" -> windowRollingCount _,
    "setop_intersect" -> setopIntersect _,
    "setop_except" -> setopExcept _,
    "agg_rollup" -> aggRollup _,
    "agg_cube" -> aggCube _,
    "distinct_exact" -> distinctExact _,
    "distinct_exact_salted" -> distinctExactSalted _,
    "stats_summary" -> statsSummary _,
    "stats_quantile_exact" -> statsQuantileExact _,
    "stats_corr" -> statsCorr _,
    "join_interval" -> intervalAttribution _,
    "q14_promo_revenue" -> q14PromoRevenue _,
    "distinct_approx" -> distinctApprox _,
    "region_order_volume" -> regionOrderVolume _,
    "pivot_daily_type" -> pivotDailyType _,
    "unpivot_type_metrics" -> unpivotTypeMetrics _,
    "join_full_outer" -> joinFullOuter _,
    "stats_quantile_sketch" -> quantileSketch _,
    "stats_quantile_binned" -> statsQuantileBinned _,
    "stats_ab_test" -> statsAbTest _,
    "stats_fdr_bh" -> fdrBh _,
    "stats_key_skew" -> keySkew _,
    "stats_ks_test" -> ksTest _,
    "stats_chi2" -> chi2Test _,
    "q10_returned_items" -> q10ReturnedItems _,
    "q18_large_orders" -> q18LargeOrders _,
    "basket_pairs" -> basketPairs _,
    "q6_revenue_change" -> q6RevenueChange _,
    "q4_order_priority" -> q4OrderPriority _,
    "q13_customer_distribution" -> q13CustomerDistribution _,
    "q17_small_quantity" -> q17SmallQuantity _,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue _,
    "q22_sales_opportunity" -> q22SalesOpportunity _,
    "stats_mannwhitney" -> mannWhitney _,
    "q7_volume_shipping" -> q7VolumeShipping _,
    "q8_market_share" -> q8MarketShare _,
    "stats_bootstrap" -> bootstrapCi _,
    "q9_profit_by_nation" -> q9ProfitByNation _,
    "q2_min_supplier" -> q2MinSupplier _,
    "q16_part_supplier" -> q16PartSupplier _,
    "q15_top_supplier" -> q15TopSupplier _,
    "stats_sprt" -> sprtTest _,
    "agg_grouping_sets" -> aggGroupingSets _,
    "window_ntile" -> windowNtile _,
    "stats_linreg" -> statsLinreg _,
    "q11_value_concentration" -> q11ValueConcentration _,
    "q21_late_supplier" -> q21LateSupplier _,
    "q12_shipmode_priority" -> q12ShipmodePriority _,
    "q20_potential_promotion" -> q20PotentialPromotion _,
  )
}
