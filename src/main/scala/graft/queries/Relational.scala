package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** First-class relational operators over the snapshot/test tables.
  *
  * The reference has NO built-in join/agg/window (SURVEY §2.5) — users write
  * them in Python inside methods (reference
  * examples/a_dsexample_aggandmergedata.py). Here they are surfaced as
  * Spark-native declarative plans so Catalyst handles pushdown, join
  * strategy, and whole-stage codegen.
  *
  * Float determinism: money-like columns are 2-decimal doubles; every
  * aggregate casts to DECIMAL(18,2) *before* summing so arithmetic is exact
  * and independent of partition/merge order (a double sum's value would
  * depend on reduction order and could not hash-match a DuckDB oracle).
  * Final results cast back to DOUBLE: identical decimal → identical IEEE754.
  *
  * Scale notes (100 TB target):
  *  - dimension tables (region/nation/customer/supplier/part at typical
  *    star-schema ratios) are broadcast — no shuffle of the fact table for
  *    those joins; only fact-fact joins (lineitem⋈orders) shuffle, on their
  *    join key, once.
  *  - aggregations are partial (map-side combine) by construction: groupBy
  *    over codegen'd exact decimal sums.
  *  - filters are pushed to the Parquet scan (PushedFilters in the
  *    formatted explain).
  */
object Relational {
  private val D = "decimal(18,2)"
  private def dec(c: org.apache.spark.sql.Column) = c.cast(D)

  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount")))
          * (lit(1).cast(D) + dec(col("l_tax")))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    // region ⋈ nation ⋈ supplier are tiny → broadcast; customer too at test
    // SF (at 100 TB customer would be shuffle-joined on custkey — Catalyst/
    // AQE flips strategy by size automatically since we don't force it).
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val cust = Tables.customer(s, dir)
    val supp = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  def forecastRevenue(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Returned-item reporting (TPC-H Q10 shape): top customers by revenue
    * lost to returns in a quarter. Fact-fact join shuffles once; nation
    * broadcasts; deterministic top-20 via (revenue, custkey) ordering.
    */
  def returnedItems(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  def windowTopOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wsum = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .withColumn("running_spend",
        sum(dec(col("o_totalprice"))).over(wsum).cast("double"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              col("rk"), col("running_spend"))
  }

  def semiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
    val withoutOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
    withOrders.agg(count(lit(1)).as("n"), lit("with_orders").as("kind"))
      .unionByName(withoutOrders.agg(count(lit(1)).as("n"), lit("without_orders").as("kind")))
  }

  def setOps(s: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(s, dir).select(col("o_custkey").as("k")).distinct()
    val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k")).distinct()
    val inter = buyers.intersect(rich)
    val exc = rich.except(buyers)
    val uni = buyers.union(rich).distinct()
    inter.agg(count(lit(1)).as("n"), lit("intersect").as("op"))
      .unionByName(exc.agg(count(lit(1)).as("n"), lit("except").as("op")))
      .unionByName(uni.agg(count(lit(1)).as("n"), lit("union").as("op")))
  }

  def rollupVolume(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("volume"),
           count(lit(1)).as("n"))
  }

  /** Full cube over (status, priority) with grouping_id, so consumers can
    * tell a super-aggregate NULL from a data NULL. gid bit order (leftmost
    * grouping column = most significant) matches DuckDB's GROUPING().
    */
  def cubeVolume(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
           sum(dec(col("o_totalprice"))).cast("double").as("volume"),
           count(lit(1)).as("n"))
  }

  /** Exact per-group percentiles (linear interpolation between order
    * statistics — the quantile_cont definition both engines share). Exact
    * percentile is the oracle-able BASELINE; at 100 TB the same plan shape
    * runs with approx_percentile (t-digest, one pass, no per-group value
    * buffer), which cannot be hash-verified cross-engine and so is not the
    * gated query. l_quantity is integer-valued, so the interpolation
    * arithmetic ((n-1)*p split + exact-binary fractions .25/.5/.75 over
    * exactly-representable doubles) is bit-deterministic in both engines.
    */
  def quantityPercentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           percentile(col("l_quantity"), lit(0.25)).as("p25"),
           percentile(col("l_quantity"), lit(0.5)).as("median"),
           percentile(col("l_quantity"), lit(0.75)).as("p75"))
  }

  /** Moment statistics (mean / variance / stddev / covariance /
    * correlation) from EXACT decimal power sums, with the double math on
    * top written once and replicated operation-for-operation in the
    * oracle. Spark's builtin var_samp/corr are single-pass Welford
    * aggregates whose float result depends on partition merge order — they
    * can never hash-match another engine; the decimal-sum formulation is
    * order-independent (decimal addition is exact), one map-side-combined
    * shuffle, and equally one-pass.
    */
  def momentStats(s: SparkSession, dir: String): DataFrame =
    momentStatsOn(Tables.lineitem(s, dir))

  private[graft] def momentStatsOn(li: DataFrame): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    val agg = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(x).cast("double").as("sx"),
      sum(x * x).cast("double").as("sxx"),
      sum(y).cast("double").as("sy"),
      sum(y * y).cast("double").as("syy"),
      sum(x * y).cast("double").as("sxy"))
    val nd = col("n").cast("double")
    // degenerate groups are GUARDED to null in both engines rather than
    // left to divisor semantics: Spark's Divide returns NULL on /0 while
    // DuckDB's IEEE float division returns NaN/Inf — without the explicit
    // CASE the two engines disagree on single-row or constant groups
    val vq0 = (col("sxx") - col("sx") * col("sx") / nd) / (nd - lit(1.0))
    val vp0 = (col("syy") - col("sy") * col("sy") / nd) / (nd - lit(1.0))
    val cv0 = (col("sxy") - col("sx") * col("sy") / nd) / (nd - lit(1.0))
    val multi = col("n") > 1
    val vq = when(multi, vq0)
    val vp = when(multi, vp0)
    val cv = when(multi, cv0)
    agg.select(col("l_returnflag"), col("n"),
      (col("sx") / nd).as("mean_qty"),
      vq.as("var_qty"),
      // nested whens, NOT `multi && vq0 >= 0`: conjunction operands are
      // not short-circuited, so the flat form would evaluate vq0's
      // /(n-1) for single-row groups — an ANSI-mode DIVIDE_BY_ZERO error.
      // (vq0 can also cancel to a tiny negative on a constant group;
      // sqrt of a negative is NaN in Spark but an error in DuckDB.)
      when(multi, when(vq0 >= 0.0, sqrt(vq0))).as("stddev_qty"),
      cv.as("covar_qty_price"),
      when(multi, when(vq0 > 0.0 && vp0 > 0.0, cv0 / sqrt(vq0 * vp0)))
        .as("corr_qty_price"))
  }

  /** Top-2 orders per customer via the bounded-heap reduce
    * (TopKPerGroup) rather than a rank window — map-side partial heaps
    * collapse each input partition to ≤k rows per key BEFORE the
    * exchange, so a customer with millions of orders never funnels raw
    * rows through one reducer, and the aggregation buffer itself is O(k)
    * per group. The verified tiebreak is (price desc, orderkey desc) —
    * the struct sort's lexicographic order.
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame =
    graft.ops.TopKPerGroup(
      Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"), col("o_orderkey")),
      Seq("o_custkey"), "o_totalprice", k = 2, payload = Seq("o_orderkey"))

  /** JSON property extraction + typed aggregation: the reference's `json`
    * dataset type holds arbitrary JSON text (SURVEY §1.2) — here the
    * parse/extract/aggregate shape over the events `props` column. Exact
    * long sums, so the aggregate hash-matches cross-engine.
    */
  def eventsJsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Click → purchase conversion funnel: for every click, the FIRST
    * purchase by the same user strictly after it, and whether it landed
    * within the 10-minute attribution window. Forward as-of = the
    * union-window AsOfJoin on NEGATED event times (nearest-after is
    * nearest-before under time reversal) — still one shuffle on user_id,
    * no candidate-pair explosion; the window bound is a post-filter on the
    * single matched row. Same-instant purchase ties collapse to the min
    * value so the match is deterministic.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts").as("click_ts"))
      .withColumn("__nct", -unix_micros(col("click_ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(min(col("value")).as("p_value"))
      .withColumn("__npt", -unix_micros(col("p_ts")))
    val j = graft.ops.AsOfJoin(clicks, purchases, Seq("user_id"),
      leftTime = "__nct", rightTime = "__npt",
      rightCols = Seq("p_ts", "p_value"), strict = true)
    val converted = col("asof_p_ts").isNotNull &&
      col("asof_p_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES")
    j.select(col("user_id"), col("event_id"), col("click_ts"),
      converted.as("converted"),
      when(converted, col("asof_p_ts")).as("purchase_ts"),
      when(converted, col("asof_p_value")).as("purchase_value"))
  }

  /** Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL / UNION ALL) —
    * duplicates carry multiplicity, unlike [[setOps]]' set semantics.
    * Spark plans intersectAll/exceptAll as count-aggregate + replicate
    * (one shuffle on the value), not a join per duplicate.
    */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(s, dir).select((col("l_orderkey") % 97).as("k"))
    val b = Tables.orders(s, dir).select((col("o_orderkey") % 97).as("k"))
    a.intersectAll(b).agg(count(lit(1)).as("n"), lit("intersect_all").as("op"))
      .unionByName(a.exceptAll(b).agg(count(lit(1)).as("n"), lit("except_all").as("op")))
      .unionByName(a.union(b).agg(count(lit(1)).as("n"), lit("union_all").as("op")))
  }

  /** Hourly event rollup — exercises the events table's TIMESTAMP(NANOS)
    * read path (exact integer ns→µs truncation; a double division here
    * would drift by 1µs near rounding boundaries and break the hash).
    */
  def eventsHourly(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("double").as("total_value"))
  }

  /** ns→µs truncation pinned through BOTH events read paths per row: the
    * raw TIMESTAMP(NANOS) long (eventsRaw) and the truncated µs timestamp
    * (events) must relate by exact integer division — `div`, not double
    * `/`, which drifts 1µs near rounding boundaries (round-1 ADVICE).
    */
  def eventsNsPrecision(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.eventsRaw(s, dir).select(col("event_id"), col("ts").as("ts_ns"))
    val trunc = Tables.events(s, dir).select(col("event_id"), col("ts").as("ts_trunc"))
    // the raw ns long is NOT emitted: DuckDB's parquet reader itself
    // truncates TIMESTAMP(NANOS) to µs, so the oracle can never see
    // sub-µs digits — the div-not-double invariant is checked Spark-side
    // and exported as a boolean the oracle expects to be uniformly true
    raw.join(trunc, "event_id")
      .select(col("event_id"),
        unix_micros(col("ts_trunc")).as("ts_us"), col("ts_trunc"),
        (expr("ts_ns div 1000") === unix_micros(col("ts_trunc"))).as("trunc_exact"))
  }

  /** The streaming pack's windowed aggregation run in BATCH mode over the
    * same code path (Streams.windowedCounts) — sliding 10-minute windows,
    * 5-minute slide: every event lands in exactly two windows. Verifying
    * this against the oracle pins the window-assignment semantics the
    * streaming queries rely on.
    */
  def eventsWindowed(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    graft.streaming.Streams.windowedCounts(ev)
      .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
      .withColumn("window_end", col("window_end").cast("timestamp_ntz"))
  }

  /** Batch sessionization (gaps-and-islands): a session breaks after 30
    * minutes of inactivity — the relational expression of the streaming
    * pack's stateful sessionize (same contract, two execution models).
    * Deterministic: ordering ties broken by event_id; all arithmetic on
    * integer microseconds.
    */
  def eventsSessions(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    ev.withColumn("new_sess",
        when(lag(col("t"), 1).over(w).isNull ||
             col("t") - lag(col("t"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
           ((max(col("t")) - min(col("t"))) / lit(1000L)).cast("long").as("duration_ms"))
  }

  /** Pivot: sum of quantity by linestatus × returnflag (explicit pivot
    * values — deterministic output schema).
    */
  def pivotReturns(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(dec(col("l_quantity"))).cast("double"))
      .withColumnRenamed("A", "qty_a")
      .withColumnRenamed("N", "qty_n")
      .withColumnRenamed("R", "qty_r")
  }

  /** As-of self-join on events: each (user, ts) event paired with the
    * user's previous event (strict — same-timestamp rows don't match) and
    * the gap between them. The union-window as-of formulation: one
    * shuffle, no candidate-pair explosion.
    */
  def asofPrevEvent(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"))
    val right = ev.select(col("user_id"), col("ts").as("pts"),
      col("event_id").as("pid"))
    val joined = graft.ops.AsOfJoin(ev, right, Seq("user_id"),
      leftTime = "ts", rightTime = "pts",
      rightCols = Seq("pid", "pts"), strict = true)
    joined.select(col("user_id"), col("ts"), col("event_id"),
      col("asof_pid").as("prev_event_id"),
      floor((unix_micros(col("ts").cast("timestamp")) -
             unix_micros(col("asof_pts").cast("timestamp"))) / 1000)
        .cast("long").as("gap_ms"))
  }

  /** Range join via interval binning: customers whose balance falls
    * within ±500 of each supplier's balance — a single equi-join shuffle
    * where the naive inequality join is a nested loop.
    */
  def rangeJoinBalance(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"),
      (col("s_acctbal") - 500).as("lo"), (col("s_acctbal") + 500).as("hi"))
    graft.ops.RangeJoin.pointInInterval(cust, supp,
        "c_acctbal", "lo", "hi", binWidth = 1000.0)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_customers"))
  }

  def aggDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
           countDistinct(col("l_partkey")).as("n_parts"),
           max(dec(col("l_extendedprice"))).cast("double").as("max_price"),
           min(dec(col("l_extendedprice"))).cast("double").as("min_price"))
  }

  /** Window-frame coverage beyond [[windowTopOrders]]'s rank/running-sum:
    * a bounded ROWS frame (3-order moving spend — exact decimal sum inside
    * the frame, cast to double at the end), and the rank-derived analytics
    * (percent_rank, cume_dist, ntile) whose values are integer-rank
    * ratios — the same division in both engines, so they hash-match. The
    * (date, orderkey) order is unique per customer, making every rank
    * deterministic. One shuffle on o_custkey serves all four functions
    * (same window spec).
    */
  def windowFrames(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(-2, Window.currentRow))
          .cast("double").as("moving_spend_3"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  /** TPC-H Q12's shape on the columns we have: fact-fact join + conditional
    * aggregation (CASE inside SUM) — counts of urgent-class vs other orders
    * per lineitem status in a shipdate year. The CASE evaluates scan-side
    * after the join; the aggregate is one map-side-combined shuffle on the
    * (small-domain) group key.
    */
  def priorityMix(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
    val ord = Tables.orders(s, dir)
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Argmax-per-group in ONE aggregation — the no-window way to answer
    * "the top X per Y" when k=1: max over a struct whose leading fields
    * are the ordering (spend desc via natural struct order, custkey asc
    * via negation) and whose trailing fields are the payload that rides
    * along. A rank-window formulation would shuffle every customer row
    * into one reducer per nation; this is a map-side-combined agg whose
    * state is ONE struct per nation per partition. Returns each nation's
    * top customer by total order spend.
    */
  def argmaxJoin(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend_d"))
    val perNation = spend
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(max(struct(col("spend_d"), (-col("c_custkey")).as("nck"),
        col("c_name").as("nm"))).as("m"))
      .select(col("c_nationkey"),
        (-col("m.nck")).cast("long").as("c_custkey"),
        col("m.nm").as("c_name"),
        col("m.spend_d").cast("double").as("spend"))
    perNation
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_name"), col("spend"))
  }

  /** Cohort retention — the classic event-analytics matrix: users grouped
    * by first-active week, counted at each later week they return. The
    * (user, week) activity set is deduped BEFORE the cohort join, so the
    * final count is a plain count(*) — no distinct-agg Expand; both
    * aggregations are map-side combined and the join key (user_id) is the
    * natural partitioning of both sides, so at scale the join shuffles
    * each side once on the same key.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val firstWeek = ev.groupBy("user_id").agg(min("wk").as("cohort"))
    val active = ev.distinct()
    active.join(firstWeek, "user_id")
      .withColumn("week_offset", expr("datediff(wk, cohort) div 7"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** The at-scale counterpart of [[quantityPercentiles]]: one-pass
    * Greenwald-Khanna sketch (`approx_percentile`) instead of exact order
    * statistics. The exact form buffers every group value for the final
    * percentile step; the sketch holds O(1/ε) entries per group no matter
    * how many rows flow through — the variant a 100 TB run actually uses.
    * NOT oracle-gated: GK picks a real element (no interpolation) and its
    * merge result is sketch-internal, so it cannot hash-match DuckDB's
    * t-digest `approx_quantile` (or the interpolated exact). RelationalSpec
    * asserts the plan is a single partial-agg pass (no per-group value
    * buffer, no sort) and the values land within GK's ε·N rank bound of
    * the exact percentiles.
    */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           approx_percentile(col("l_quantity"), lit(0.25), lit(10000)).as("p25"),
           approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("median"),
           approx_percentile(col("l_quantity"), lit(0.75), lit(10000)).as("p75"))
  }

  /** The at-scale counterpart of [[aggDistinct]]: HyperLogLog++
    * (`approx_count_distinct`, rsd 1%) instead of exact distinct counts.
    * Exact `count(DISTINCT x)` plans through an Expand (input ×(#distinct
    * aggs)) plus a second shuffle keyed on (group, value) — at 100 TB the
    * Expand alone doubles the shuffled bytes; the HLL sketch is one
    * map-side-combined pass with a constant-size buffer per group.
    * NOT oracle-gated (sketch estimates are engine-internal); the spec
    * asserts no Expand in the plan and estimates within the rsd bound of
    * the exact counts. The exact max/min ride along unchanged — mixing
    * exact and sketch aggregates stays a single pass, which is the point.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("n_orders"),
           approx_count_distinct(col("l_partkey"), rsd = 0.01).as("n_parts"),
           max(dec(col("l_extendedprice"))).cast("double").as("max_price"),
           min(dec(col("l_extendedprice"))).cast("double").as("min_price"))
  }

  /** Oracle-gated form of [[approxPercentiles]]: GK's sketch values are
    * engine-internal, but its GUARANTEE is an exact integer predicate —
    * the returned element's rank interval must lie within ε·N
    * (ε = 1/accuracy = 1/10000) of the target rank. The sketch runs
    * unchanged; each returned value is then rank-checked against the raw
    * column (one broadcast of ≤12 probe rows + one pass), and the gated
    * output is (group, pct, n, rank_ok) — n exact, rank_ok uniformly true,
    * both of which DuckDB replays exactly. A wrong sketch (rank drift
    * beyond εN) flips rank_ok and fails the hash gate.
    *
    * All rank arithmetic is in longs scaled ×4 (pct ∈ {25,50,75} so
    * 4·q·n = n·pct/25 is an exact integer); the +4 slop covers the ±1
    * rank-definition ambiguity between "no more than" conventions.
    */
  def approxPercentilesChecked(s: SparkSession, dir: String): DataFrame = {
    val sk = approxPercentiles(s, dir)
    val probes = sk.select(col("l_returnflag"), col("n"),
      explode(map(
        lit(25), col("p25"),
        lit(50), col("median"),
        lit(75), col("p75"))).as(Seq("pct", "v")))
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_quantity"))
    val counted = li.join(broadcast(probes), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("pct"), col("n"))
      .agg(sum(when(col("l_quantity") < col("v"), 1L).otherwise(0L)).as("lt"),
           sum(when(col("l_quantity") <= col("v"), 1L).otherwise(0L)).as("le"))
    // rank interval [lt+1, le] must intersect [q·n − tol, q·n + tol],
    // tol = ε·n + 1; everything ×4 to stay integer: tol4 = n div 2500 + 4.
    // `div`, not `/` — Column./ on longs is floating-point division
    // (exact at these magnitudes but not the integer semantics this doc
    // claims; ADVICE r19), and target4 = n·pct div 25 is exact because
    // pct ∈ {25,50,75} makes n·pct a multiple of 25.
    val target4 = expr("n * pct div 25L")
    val tol4 = expr("n div 2500L") + lit(4L)
    counted.select(col("l_returnflag"), col("pct"), col("n"),
      (lit(4L) * (col("lt") + lit(1L)) <= target4 + tol4 &&
       lit(4L) * col("le") >= target4 - tol4).as("rank_ok"))
  }

  /** Oracle-gated form of [[approxDistinct]]: the HLL++ estimates are
    * engine-internal, but the exact distinct counts they approximate are
    * DuckDB-replayable, and the basis-point error between the two is a
    * deterministic integer predicate (HLL++ is hash-based and
    * order-independent, so the estimate is a pure function of the input
    * set). The exact counts are one two-distinct aggregation — the
    * check's cost, not the sketch's; the gated plan still contains the
    * single-pass HLL subplan the spec asserts on (see the in-body note
    * for the r21 one-scan restructure). Bound: 500 bp = 5× the rsd, the
    * same headroom RelationalSpec uses — estimate quality, not luck.
    */
  def approxDistinctChecked(s: SparkSession, dir: String): DataFrame = {
    val est = approxDistinct(s, dir)
    val li = Tables.lineitem(s, dir)
    // Both exact counts in ONE aggregation (r21): Spark plans the
    // two-distinct agg as Expand(x3) + partial dedup on
    // (flag, gid, key) — one lineitem scan and one two-level shuffle
    // where the r20 two-step form (distinct() then count per key column)
    // paid two scans and four exchanges. The Expand's pre-shuffle row
    // triplication is absorbed by the map-side partial dedup (the
    // shuffle carries ~the same distinct pairs either way). Executed
    // plan: 3 -> 2 lineitem scans (plans/r21/q_approx_distinct_aqe_*);
    // sf0.1 walls overlap within the noise band both ways (1.9-2.5 s) —
    // the win is the removed scan + exchanges, which is what scales.
    // countDistinct is exact, so the values (and the oracle) are
    // unchanged. The HLL subplan stays its own single-pass subquery —
    // RelationalSpec's no-Expand law asserts on approxDistinct alone,
    // and the contrast (exact pays the Expand, the sketch does not) is
    // still the spec's point.
    val exact = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_orderkey")).as("orders_exact"),
      countDistinct(col("l_partkey")).as("parts_exact"))
    est.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("orders_exact"), col("parts_exact"),
        col("max_price"), col("min_price"),
        (abs(col("n_orders") - col("orders_exact")) * lit(10000L) <=
          col("orders_exact") * lit(500L)).as("orders_ok"),
        (abs(col("n_parts") - col("parts_exact")) * lit(10000L) <=
          col("parts_exact") * lit(500L)).as("parts_ok"))
  }

  /** lineitem ⋈ orders through the skew-salted join (ops/SaltedJoin) —
    * salting must be INVISIBLE in results, so the oracle is the plain
    * join (identical for EVERY salt value, which is what lets the salt
    * be data-derived).
    *
    * r21 (VERDICT r20 item 4): the salt is now SIZED TO THE MEASURED
    * SKEW (SaltedJoin.measuredSalt — guide §2.5's hot-key-rows /
    * healthy-partition-rows rule) instead of the r20 constant 8. On this
    * table the orderkey distribution is uniform (max 7 rows/key), the
    * measurement returns salt = 1, and the join degenerates to the plain
    * join — no ×8 explode of orders, no row-hash, one narrow keys-only
    * sizing pass instead. A genuinely hot key (measured share > 1/P of
    * the rows) brings the buckets back automatically, sized to the skew.
    * AQE's runtime skew splitting stays on as the safety net either way.
    */
  def saltedJoinVolume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salt = graft.ops.SaltedJoin.measuredSalt(li, Seq("l_orderkey"))
    graft.ops.SaltedJoin(li, o, Seq("l_orderkey"), salt)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> pricingSummary _,
    "q3_shipping_priority" -> shippingPriority _,
    "q5_local_supplier" -> localSupplierVolume _,
    "q6_forecast_revenue" -> forecastRevenue _,
    "q10_returned_items" -> returnedItems _,
    "q_window_top_orders" -> windowTopOrders _,
    "q_window_frames" -> windowFrames _,
    "q_priority_mix" -> priorityMix _,
    "q_semi_anti_join" -> semiAntiJoin _,
    "q_set_ops" -> setOps _,
    "q_rollup_volume" -> rollupVolume _,
    "q_cube_volume" -> cubeVolume _,
    "q_percentiles" -> quantityPercentiles _,
    "q_moment_stats" -> momentStats _,
    "q_set_ops_all" -> setOpsAll _,
    "q_agg_distinct" -> aggDistinct _,
    "q_events_hourly" -> eventsHourly _,
    "q_events_retention" -> cohortRetention _,
    "q_argmax_join" -> argmaxJoin _,
    "q_events_ns" -> eventsNsPrecision _,
    "q_events_windowed" -> eventsWindowed _,
    "q_events_sessions" -> eventsSessions _,
    "q_pivot_returns" -> pivotReturns _,
    "q_asof_prev_event" -> asofPrevEvent _,
    "q_range_join" -> rangeJoinBalance _,
    "q_events_json" -> eventsJsonProps _,
    "q_funnel" -> funnel _,
    "q_salted_join" -> saltedJoinVolume _,
    "q_topk_per_cust" -> topOrdersPerCustomer _,
    // at-scale sketch variants, gated through their GUARANTEES: the sketch
    // outputs are engine-internal, but the rank bound (GK) and bp error vs
    // exact (HLL++) are exact integer predicates the oracle replays — a
    // uniformly-true check column IS hash-gatable (plan-shape asserts on
    // the raw sketch forms stay in RelationalSpec)
    "q_approx_percentiles" -> approxPercentilesChecked _,
    "q_approx_distinct" -> approxDistinctChecked _,
  )

  private val DISC = "(1.00::DECIMAL(18,2) - l_discount::DECIMAL(18,2))"

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
         CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
         CAST(sum(l_extendedprice::DECIMAL(18,2) * $DISC) AS DOUBLE) AS sum_disc_price,
         CAST(sum(l_extendedprice::DECIMAL(18,2) * $DISC * (1.00::DECIMAL(18,2) + l_tax::DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
         CAST(sum(l_extendedprice::DECIMAL(18,2) * $DISC) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q5_local_supplier" ->
      s"""SELECT n_name,
         CAST(sum(l_extendedprice::DECIMAL(18,2) * $DISC) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1994-01-01'
           AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY n_name""",
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2)) AS DOUBLE) AS revenue,
         count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         CAST(sum(l_extendedprice::DECIMAL(18,2) * $DISC) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1995-04-01'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk, running_spend FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
           CAST(sum(o_totalprice::DECIMAL(18,2)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders) t WHERE rk <= 3""",
    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey,
           CAST(sum(o_totalprice::DECIMAL(18,2)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_spend_3,
           percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS pr,
           cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS cd,
           ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)::BIGINT AS quartile
         FROM orders""",
    "q_priority_mix" ->
      """SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
         GROUP BY l_linestatus""",
    "q_semi_anti_join" ->
      """SELECT count(*) AS n, 'with_orders' AS kind FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT count(*) AS n, 'without_orders' AS kind FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_set_ops" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
         SELECT count(*) AS n, 'intersect' AS op FROM (SELECT k FROM buyers INTERSECT SELECT k FROM rich) t
         UNION ALL
         SELECT count(*) AS n, 'except' AS op FROM (SELECT k FROM rich EXCEPT SELECT k FROM buyers) t
         UNION ALL
         SELECT count(*) AS n, 'union' AS op FROM (SELECT k FROM buyers UNION SELECT k FROM rich) t""",
    "q_rollup_volume" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS volume, count(*) AS n
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "q_cube_volume" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS volume, count(*) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
         quantile_cont(l_quantity, 0.25) AS p25,
         quantile_cont(l_quantity, 0.5) AS median,
         quantile_cont(l_quantity, 0.75) AS p75
         FROM lineitem GROUP BY 1""",
    "q_moment_stats" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
           CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sx,
           CAST(sum(l_quantity::DECIMAL(18,2) * l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sxx,
           CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sy,
           CAST(sum(l_extendedprice::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS syy,
           CAST(sum(l_quantity::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           sx / n::DOUBLE AS mean_qty,
           CASE WHEN n > 1
             THEN (sxx - sx * sx / n::DOUBLE) / (n::DOUBLE - 1.0) END AS var_qty,
           CASE WHEN n > 1
                 AND (sxx - sx * sx / n::DOUBLE) / (n::DOUBLE - 1.0) >= 0.0
             THEN sqrt((sxx - sx * sx / n::DOUBLE) / (n::DOUBLE - 1.0)) END AS stddev_qty,
           CASE WHEN n > 1
             THEN (sxy - sx * sy / n::DOUBLE) / (n::DOUBLE - 1.0) END AS covar_qty_price,
           CASE WHEN n > 1
                 AND (sxx - sx * sx / n::DOUBLE) / (n::DOUBLE - 1.0) > 0.0
                 AND (syy - sy * sy / n::DOUBLE) / (n::DOUBLE - 1.0) > 0.0
             THEN ((sxy - sx * sy / n::DOUBLE) / (n::DOUBLE - 1.0))
               / sqrt(((sxx - sx * sx / n::DOUBLE) / (n::DOUBLE - 1.0))
                    * ((syy - sy * sy / n::DOUBLE) / (n::DOUBLE - 1.0))) END AS corr_qty_price
         FROM a""",
    "q_set_ops_all" ->
      """WITH a AS (SELECT l_orderkey % 97 AS k FROM lineitem),
         b AS (SELECT o_orderkey % 97 AS k FROM orders)
         SELECT count(*) AS n, 'intersect_all' AS op
           FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
         UNION ALL SELECT count(*), 'except_all'
           FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
         UNION ALL SELECT count(*), 'union_all'
           FROM (SELECT * FROM a UNION ALL SELECT * FROM b)""",
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour, event_type,
         count(*) AS n,
         CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    "q_argmax_join" ->
      """SELECT n_name, c_custkey, c_name, spend FROM (
           SELECT c_nationkey, c_custkey, c_name, spend, row_number() OVER (
             PARTITION BY c_nationkey ORDER BY spend_d DESC, c_custkey ASC) AS rn
           FROM (SELECT c_custkey, c_name, c_nationkey,
                   sum(o_totalprice::DECIMAL(18,2)) AS spend_d,
                   CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS spend
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 GROUP BY 1, 2, 3)) t
         JOIN nation ON t.c_nationkey = n_nationkey WHERE rn = 1""",
    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts::TIMESTAMP) AS wk FROM events),
         fw AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1),
         act AS (SELECT DISTINCT user_id, wk FROM ev)
         SELECT cohort, (date_diff('day', cohort, wk) // 7)::BIGINT AS week_offset,
           count(*)::BIGINT AS users
         FROM act JOIN fw USING (user_id) GROUP BY 1, 2""",
    "q_events_ns" ->
      """SELECT event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         ts::TIMESTAMP AS ts_trunc, true AS trunc_exact
         FROM events""",
    "q_events_windowed" ->
      """WITH e AS (SELECT ts::TIMESTAMP t, event_type, value FROM events),
         w AS (SELECT unnest([
             make_timestamp((epoch_us(t)//300000000)*300000000),
             make_timestamp((epoch_us(t)//300000000)*300000000 - 300000000)]) ws,
           event_type, value FROM e)
         SELECT ws AS window_start, ws + INTERVAL 10 MINUTE AS window_end,
           event_type, count(*) AS n,
           CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS total_value
         FROM w GROUP BY 1, 2, 3""",
    "q_range_join" ->
      """SELECT s_suppkey, count(*) AS n_customers
         FROM supplier JOIN customer
           ON c_acctbal >= s_acctbal - 500 AND c_acctbal <= s_acctbal + 500
         GROUP BY s_suppkey""",
    "q_pivot_returns" ->
      """SELECT l_linestatus,
         CAST(sum(l_quantity::DECIMAL(18,2)) FILTER (l_returnflag = 'A') AS DOUBLE) AS qty_a,
         CAST(sum(l_quantity::DECIMAL(18,2)) FILTER (l_returnflag = 'N') AS DOUBLE) AS qty_n,
         CAST(sum(l_quantity::DECIMAL(18,2)) FILTER (l_returnflag = 'R') AS DOUBLE) AS qty_r
         FROM lineitem GROUP BY l_linestatus""",
    "q_asof_prev_event" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP t, max(event_id) event_id
           FROM events GROUP BY 1, 2)
         SELECT l.user_id, l.t AS ts, l.event_id,
           r.event_id AS prev_event_id,
           CASE WHEN r.t IS NULL THEN NULL
                ELSE (epoch_us(l.t) - epoch_us(r.t)) // 1000 END AS gap_ms
         FROM e l ASOF LEFT JOIN e r
           ON l.user_id = r.user_id AND r.t < l.t""",
    "q_topk_per_cust" ->
      """SELECT o_custkey, rank, o_totalprice, o_orderkey FROM (
           SELECT o_custkey, o_totalprice, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rank
           FROM orders) t
         WHERE rank <= 2""",
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
         min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
         max(json_extract_string(props, '$.k')::BIGINT) AS max_k
         FROM events GROUP BY 1""",
    "q_funnel" ->
      """WITH c AS (SELECT user_id, event_id, ts::TIMESTAMP ct FROM events
           WHERE event_type = 'click'),
         p AS (SELECT user_id, ts::TIMESTAMP pt, min(value) pv FROM events
           WHERE event_type = 'purchase' GROUP BY 1, 2),
         j AS (SELECT c.user_id, c.event_id, c.ct, p.pt, p.pv
           FROM c ASOF LEFT JOIN p
             ON c.user_id = p.user_id AND p.pt > c.ct)
         SELECT user_id, event_id, ct AS click_ts,
           (pt IS NOT NULL AND pt <= ct + INTERVAL 10 MINUTE) AS converted,
           CASE WHEN pt IS NOT NULL AND pt <= ct + INTERVAL 10 MINUTE
                THEN pt END AS purchase_ts,
           CASE WHEN pt IS NOT NULL AND pt <= ct + INTERVAL 10 MINUTE
                THEN pv END AS purchase_value
         FROM j""",
    "q_events_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) t FROM events),
         marked AS (SELECT user_id, event_id, t,
             CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                  THEN 1 ELSE 0 END new_sess
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         sess AS (SELECT user_id, t,
             (sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT sess_id
           FROM marked)
         SELECT user_id, sess_id, count(*) AS n_events,
           ((max(t) - min(t)) // 1000)::BIGINT AS duration_ms
         FROM sess GROUP BY user_id, sess_id""",
    "q_agg_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_partkey) AS n_parts,
         CAST(max(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS max_price,
         CAST(min(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS min_price
         FROM lineitem GROUP BY l_returnflag""",
    // sketch guarantees: the oracle replays the exact values (counts,
    // max/min) and expects the check columns uniformly true — see
    // approxPercentilesChecked / approxDistinctChecked
    "q_approx_percentiles" ->
      """WITH g AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1)
         SELECT l_returnflag, pct, n, true AS rank_ok
         FROM g CROSS JOIN (VALUES (25), (50), (75)) AS t(pct)""",
    "q_approx_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS orders_exact,
         count(DISTINCT l_partkey) AS parts_exact,
         CAST(max(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS max_price,
         CAST(min(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS min_price,
         true AS orders_ok, true AS parts_ok
         FROM lineitem GROUP BY 1""",
    // salting must be invisible: the oracle is the PLAIN join
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
         CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
  )
}
