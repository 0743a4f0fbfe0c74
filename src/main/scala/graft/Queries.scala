package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The oracle-checked query catalog: one entry per operator family of
  * SURVEY.md §2 (plus the large-scale training-data operators). Each query
  * has a DuckDB-equivalent SQL in [[Queries.oracle]] unless the operator is
  * not SQL-expressible (then the driver records a rows-only check).
  *
  * Determinism conventions (so Spark's partial/final agg order and DuckDB's
  * scan order hash identically):
  *  - money/value sums computed in DECIMAL (exact, order-independent), cast
  *    to DOUBLE at the end;
  *  - integer outputs cast to BIGINT on both sides (pandas dtype parity);
  *  - arg-min/arg-max tie-broken by a unique key via row_number;
  *  - limit/offset always under a total ORDER BY.
  */
object Queries {

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** decimal-exact money expression */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private val one = lit(1).cast("decimal(18,2)")

  /** events with the nano-precision `ts` converted exactly to a Spark
    * TimestampType (µs) via integer division — the session reads
    * TIMESTAMP(NANOS) parquet as epoch-nano longs (nanosAsLong). */
  def events(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))

  // =====================================================================
  // §2.5 aggregations
  // =====================================================================

  /** group_by_fold / group_by_sum family — TPC-H Q1 shaped (partial+final
    * HashAggregate; at scale: one shuffle of 6 rows per partition). */
  def q1_agg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  private val q1_sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** group_by_count (src/operator/mod.rs:1594). */
  def q_group_count(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  private val q_group_count_sql =
    "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority"

  /** group_by_avg (src/operator/mod.rs:1531) — avg as exact decimal sum /
    * count, both sides, for bit-identical doubles. */
  def q_group_avg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").groupBy(col("o_orderpriority"))
      .agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1)))
        .as("avg_price"))

  private val q_group_avg_sql =
    """SELECT o_orderpriority,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** min/max aggregations (exact on doubles, order-independent). */
  def q_group_minmax(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").groupBy(col("o_orderstatus"))
      .agg(min(col("o_totalprice")).as("min_price"),
           max(col("o_totalprice")).as("max_price"),
           min(col("o_orderdate")).as("first_date"))

  private val q_group_minmax_sql =
    """SELECT o_orderstatus, min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price, min(o_orderdate) AS first_date
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** group_by_max_element (arg-max, src/operator/mod.rs:1418): customer with
    * the max balance per segment, ties broken by smallest key — lowered to a
    * window top-1 (TakeOrdered per group; no full sort). */
  def q_max_element(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    tbl(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
  }

  private val q_max_element_sql =
    """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      |  FROM customer) WHERE rn = 1""".stripMargin

  /** fold (non-assoc → single global row; src/operator/mod.rs:725). */
  def q_fold_global(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").agg(
      sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"),
      count(lit(1)).as("n"))

  private val q_fold_global_sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n FROM lineitem""".stripMargin

  /** reduce (global max element; src/operator/mod.rs:1831): the single order
    * with the highest price, deterministic tie-break on key. */
  def q_reduce_max(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(1)
      .select(col("o_orderkey"), col("o_totalprice"))

  private val q_reduce_max_sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1""".stripMargin

  /** unique_assoc / distinct (src/operator/mod.rs:951). */
  def q_distinct(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()

  private val q_distinct_sql =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  /** fold_scan (two-pass global-aggregate-then-map, src/operator/mod.rs:856):
    * each lineitem's share of total revenue. Lowered to agg →
    * broadcast-cross-join → narrow map: the second pass never shuffles. */
  def q_fold_scan(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
    val total = li.agg(sum(dec(col("l_extendedprice"))).cast("double").as("total"))
    li.crossJoin(broadcast(total))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") / col("total")).as("price_share"))
  }

  private val q_fold_scan_sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER () AS DOUBLE) AS price_share
      |FROM lineitem""".stripMargin

  /** keyed fold_scan / reduce_scan (src/operator/mod.rs:2954): element vs its
    * key's max — agg + same-key join (AQE broadcasts the tiny agg side). */
  def q_reduce_scan_keyed(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
    val mx = li.groupBy(col("l_returnflag").as("rf"))
      .agg(max(col("l_extendedprice")).as("max_price"))
    li.join(broadcast(mx), col("l_returnflag") === col("rf"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") / col("max_price")).as("price_vs_key_max"))
  }

  private val q_reduce_scan_keyed_sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice / max(l_extendedprice) OVER (PARTITION BY l_returnflag) AS price_vs_key_max
      |FROM lineitem""".stripMargin

  // =====================================================================
  // §2.3 per-element transforms
  // =====================================================================

  /** map / projection (src/operator/mod.rs:551) — stays inside one codegen
    * stage, parquet scan prunes to 5 columns. */
  def q_map(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("disc_price"),
      (col("l_quantity") * col("l_tax")).as("qty_tax"))

  private val q_map_sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price,
      |  l_quantity * l_tax AS qty_tax
      |FROM lineitem""".stripMargin

  /** filter (src/operator/mod.rs:409) — predicate pushed to the parquet scan. */
  def q_filter(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1995-01-01").cast("timestamp")
        && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"))

  private val q_filter_sql =
    """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1995-01-01' AND l_discount > 0.05""".stripMargin

  /** filter_map (src/operator/mod.rs:384): Option-returning transform =
    * filter + project in one pass. */
  def q_filter_map(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "part")
      .filter(col("p_size") >= 30)
      .select(col("p_partkey"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        (dec(col("p_retailprice")) * lit(2).cast("decimal(18,2)")).cast("double").as("double_price"))

  private val q_filter_map_sql =
    """SELECT p_partkey, p_brand || '#' || p_type AS brand_type,
      |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(2 AS DECIMAL(18,2)) AS DOUBLE) AS double_price
      |FROM part WHERE p_size >= 30""".stripMargin

  /** flat_map / flatten (src/operator/mod.rs:1158, :1210): wordcount over
    * documents — explode stays map-side; the count is partial-aggregated. */
  def q_flat_map(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  private val q_flat_map_sql =
    """SELECT word, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> '' GROUP BY word""".stripMargin

  /** scalar-function surface (reference does this in plain closures; we lower
    * to codegen'd Column functions): string + date + json in one pass. */
  def q_scalar_funcs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"),
      month(col("o_orderdate")).cast("long").as("o_month"),
      lower(col("o_orderpriority")).as("prio_lower"),
      substring(col("o_orderstatus"), 1, 1).as("status1"),
      length(col("o_orderpriority")).cast("long").as("prio_len"))

  private val q_scalar_funcs_sql =
    """SELECT o_orderkey,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
      |  lower(o_orderpriority) AS prio_lower,
      |  substr(o_orderstatus, 1, 1) AS status1,
      |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len
      |FROM orders""".stripMargin

  /** JSON extraction over the events props column. */
  def q_json(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  private val q_json_sql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin

  // =====================================================================
  // §2.4 partitioning / merge / route
  // =====================================================================

  /** merge / union (src/operator/merge.rs:41). */
  def q_merge(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("side"))
    val su = tbl(s, dir, "supplier")
      .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("side"))
    c.union(su)
  }

  private val q_merge_sql =
    """SELECT c_custkey AS id, c_name AS name, 'customer' AS side FROM customer
      |UNION ALL
      |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS side FROM supplier""".stripMargin

  /** route (first-match-wins stream split, src/operator/route.rs:33-93):
    * events routed into tiers by value; emitted as one frame tagged by route
    * so the oracle can check the routing logic. */
  def q_route(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id"),
      when(col("value") >= 50, "high")
        .when(col("value") >= 10, "mid")
        .otherwise("low").as("tier"))

  private val q_route_sql =
    """SELECT event_id,
      |  CASE WHEN value >= 50 THEN 'high' WHEN value >= 10 THEN 'mid' ELSE 'low' END AS tier
      |FROM events""".stripMargin

  // =====================================================================
  // §2.7 sorts / limits / top-k
  // =====================================================================

  /** sorted_limit_by → TakeOrderedAndProject (no global sort at scale). */
  def q_top_k(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val q_top_k_sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin

  /** limit + offset under total order (src/operator/mod.rs:1276). */
  def q_limit_offset(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .orderBy(col("o_orderkey").asc)
      .offset(100).limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  private val q_limit_offset_sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey ASC LIMIT 10 OFFSET 100""".stripMargin

  /** full sort (src/operator/mod.rs:1243) — range-partitioned distributed
    * sort; rank via zipWithIndex on the sorted partitions (a global
    * `row_number() OVER (ORDER BY ...)` would funnel everything through one
    * partition — the classic scale trap). */
  def q_sort(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .as[(Long, Double)]
      .rdd.zipWithIndex()
      .map { case ((k, bal), i) => (i + 1, k, bal) }
      .toDF("rank", "c_custkey", "c_acctbal")
  }

  private val q_sort_sql =
    """SELECT CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rank,
      |  c_custkey, c_acctbal FROM customer""".stripMargin

  // =====================================================================
  // §2.6 joins
  // =====================================================================

  /** inner equi-join chain with broadcast dims (ship_broadcast_right,
    * join/ship.rs:45): revenue per nation. lineitem shuffles once on
    * orderkey; nation/region/customer broadcast. */
  def q_join_inner(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val c = tbl(s, dir, "customer")
    val n = tbl(s, dir, "nation")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total"),
           count(lit(1)).as("n_orders"))
  }

  private val q_join_inner_sql =
    """SELECT n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** left outer join (join/mod.rs:163): every customer with order count,
    * zero for customers without orders. */
  def q_join_left(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           coalesce(sum(dec(col("o_totalprice"))).cast("double"), lit(0.0)).as("total"))
  }

  private val q_join_left_sql =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  /** full outer join (join/mod.rs:212) between two disjoint-ish aggregates;
    * nulls normalized with coalesce so the hash compare is well-defined. */
  def q_join_outer(s: SparkSession, dir: String): DataFrame = {
    val perCust = tbl(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val bigCust = tbl(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    perCust.join(bigCust, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("c_acctbal"), lit(-1.0)).as("acctbal"))
  }

  private val q_join_outer_sql =
    """SELECT coalesce(o_custkey, c_custkey) AS custkey,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(c_acctbal, -1.0) AS acctbal
      |FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
      |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
      |ON o_custkey = c_custkey""".stripMargin

  /** left-semi join (additive beyond the reference, SURVEY §2.6 note):
    * customers that placed at least one high-value order. */
  def q_join_semi(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  private val q_join_semi_sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin

  /** left-anti join: customers with no orders at all. */
  def q_join_anti(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  private val q_join_anti_sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** explicit broadcast-right ship strategy (join/ship.rs:141): part (2k rows
    * — a classic broadcast dim) against lineitem. */
  def q_join_broadcast(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
    val p = tbl(s, dir, "part")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
  }

  private val q_join_broadcast_sql =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  // =====================================================================
  // §2.9 windows (Catalyst lowering — see graft.operators.WindowsDF)
  // =====================================================================

  /** event-time tumbling window (descr/event_time.rs tumbling): one shuffle
    * on (window, key); map-side partial agg carries one row per group. */
  def q_window_tumbling(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 day").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(unix_micros(col("ws")).as("w_start"), col("event_type"), col("n"), col("sum_value"))

  private val q_window_tumbling_sql =
    """SELECT epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** event-time sliding window (descr/event_time.rs sliding): Spark explodes
    * each row into size/slide windows map-side then partial-aggregates. */
  def q_window_sliding(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 day", "12 hours").getField("start").as("ws"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("ws")).as("w_start"), col("event_type"), col("n"))

  private val q_window_sliding_sql =
    """SELECT epoch_us(time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)) - k * INTERVAL '12 hours') AS w_start,
      |  event_type, count(*) AS n
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
      |GROUP BY 1, 2""".stripMargin

  /** event-time session window, gap 4h (Spark session_window; reference
    * SessionWindow is processing-time — documented divergence SURVEY §7.4). */
  def q_window_session(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      // group by the full session_window column — grouping by its .start
      // would bucket by each row's pre-merge [ts, ts+gap) and no sessions
      // would ever merge
      .groupBy(session_window(col("ts"), "4 hours").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("w_start"), col("n"), col("sum_value"))

  private val q_window_session_sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |m AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w >= INTERVAL '4 hours' THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      |SELECT user_id, epoch_us(min(ts)) AS w_start, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** count-based tumbling windows of 10 per user (descr/count.rs, exact=true):
    * row_number bucketing; the trailing partial window is dropped. */
  def q_window_count(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("w_id", ((row_number().over(w) - 1) / 10).cast("long"))
      .groupBy(col("user_id"), col("w_id"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("double").as("sum_value"),
           min(col("event_id")).as("first_event"))
      .filter(col("n") === 10)
  }

  private val q_window_count_sql =
    """SELECT user_id, CAST(floor((rn - 1) / 10) AS BIGINT) AS w_id, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  min(event_id) AS first_event
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |      FROM events)
      |GROUP BY user_id, w_id HAVING count(*) = 10""".stripMargin

  /** last-k window, k=5 (descr/last_k.rs): one emitted row per element with
    * the rolling frame aggregate — pure window frame, no extra shuffle. */
  def q_window_lastk(s: SparkSession, dir: String): DataFrame = {
    val spec = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, 0)
    events(s, dir).select(
      col("event_id"), col("user_id"),
      sum(dec(col("value"))).over(spec).cast("double").as("roll_sum"),
      count(lit(1)).over(spec).as("n_frame"))
  }

  private val q_window_lastk_sql =
    """SELECT event_id, user_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
      |  count(*) OVER w AS n_frame
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin

  /** window aggregator suite first/last/nth (aggr/first.rs,last.rs,nth.rs)
    * over per-(user, day) windows. */
  def q_window_first_last(s: SparkSession, dir: String): DataFrame = {
    val base = events(s, dir)
      .withColumn("db", date_trunc("day", col("ts")))
    val ordered = Window.partitionBy(col("user_id"), col("db"))
      .orderBy(col("ts"), col("event_id"))
    val full = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base.select(
        col("user_id"), unix_micros(col("db")).as("w_start"),
        first_value(col("value")).over(ordered).as("first_v"),
        last_value(col("value")).over(full).as("last_v"),
        coalesce(nth_value(col("value"), 2).over(full), lit(-1.0)).as("second_v"))
      .distinct()
  }

  private val q_window_first_last_sql =
    """SELECT DISTINCT user_id, epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
      |  first_value(value) OVER w1 AS first_v,
      |  last_value(value) OVER w2 AS last_v,
      |  coalesce(nth_value(value, 2) OVER w2, -1.0) AS second_v
      |FROM events
      |WINDOW
      |  w1 AS (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) ORDER BY ts, event_id),
      |  w2 AS (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  // =====================================================================
  // §2.6 interval join + window join
  // =====================================================================

  /** interval_join (src/operator/interval_join.rs:20-200): click joined to
    * purchases of the same user within ±2h. Equi on user + range on ts →
    * sort-merge join on the equi key with the range as residual; epoch-micro
    * arithmetic keeps bounds inclusive and exact. */
  def q_interval_join(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
    val a = e.filter(col("event_type") === "click")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("us").as("a_us"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("us").as("b_us"))
    a.join(b, col("a_user") === col("b_user")
        && col("b_us") >= col("a_us") - lit(7200000000L)
        && col("b_us") <= col("a_us") + lit(7200000000L))
      .select(col("a_id"), col("b_id"), (col("b_us") - col("a_us")).as("delta_us"))
  }

  private val q_interval_join_sql =
    """SELECT a.event_id AS a_id, b.event_id AS b_id,
      |  epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) AS delta_us
      |FROM events a JOIN events b
      |ON a.user_id = b.user_id AND a.event_type = 'click' AND b.event_type = 'purchase'
      |AND epoch_us(CAST(b.ts AS TIMESTAMP)) BETWEEN epoch_us(CAST(a.ts AS TIMESTAMP)) - 7200000000
      |                                          AND epoch_us(CAST(a.ts AS TIMESTAMP)) + 7200000000""".stripMargin

  /** window_join (src/operator/window/aggr/join.rs:79-99): per-(user, day
    * window) cartesian of clicks × purchases — equi-join on (key, window). */
  def q_window_join(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("w", date_trunc("day", col("ts")))
    val a = e.filter(col("event_type") === "click")
      .select(col("user_id").as("a_user"), col("w").as("a_w"), col("event_id").as("a_id"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("w").as("b_w"), col("event_id").as("b_id"))
    a.join(b, col("a_user") === col("b_user") && col("a_w") === col("b_w"))
      .select(col("a_user").as("user_id"), unix_micros(col("a_w")).as("w_start"),
        col("a_id"), col("b_id"))
  }

  private val q_window_join_sql =
    """SELECT a.user_id, epoch_us(date_trunc('day', CAST(a.ts AS TIMESTAMP))) AS w_start,
      |  a.event_id AS a_id, b.event_id AS b_id
      |FROM events a JOIN events b
      |ON a.user_id = b.user_id
      |AND date_trunc('day', CAST(a.ts AS TIMESTAMP)) = date_trunc('day', CAST(b.ts AS TIMESTAMP))
      |AND a.event_type = 'click' AND b.event_type = 'purchase'""".stripMargin

  // =====================================================================
  // §2.10 iteration (driver-loop fixpoints — graft.operators.Iteration)
  // =====================================================================

  /** nation chain edges: consecutive nations (by key) within each region —
    * the small deterministic graph driving TC and PageRank. */
  private def nationChain(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
    tbl(s, dir, "nation")
      .withColumn("next", lead(col("n_nationkey"), 1).over(w))
      .filter(col("next").isNotNull)
      .select(col("n_nationkey").cast("long").as("src"),
              col("next").cast("long").as("dst"))
  }

  /** connected components via min-label propagation (reference:
    * examples/connected_components.rs) on the bipartite customer–order graph.
    * Oracle: each star's min label is its customer key. */
  def q_connected_components(s: SparkSession, dir: String): DataFrame = {
    val edges = tbl(s, dir, "orders").select(
      col("o_custkey").as("src"),
      (col("o_orderkey") + 10000000L).as("dst"))
    // orderkey is unique → the edge list is duplicate-free by construction
    graft.algorithms.Graph.connectedComponents(edges, dedupeEdges = false)
  }

  private val q_connected_components_sql =
    """SELECT o_orderkey + 10000000 AS node, o_custkey AS component FROM orders
      |UNION ALL
      |SELECT DISTINCT o_custkey AS node, o_custkey AS component FROM orders""".stripMargin

  /** transitive closure (reference: examples/transitive_closure.rs) of the
    * nation chain: reachability = later nation in the same region. */
  def q_transitive_closure(s: SparkSession, dir: String): DataFrame =
    // 25-node graph: single partition avoids per-round task-scheduling cost
    graft.algorithms.Graph.transitiveClosure(nationChain(s, dir), parallelism = Some(1))

  private val q_transitive_closure_sql =
    """SELECT CAST(a.n_nationkey AS BIGINT) AS src, CAST(b.n_nationkey AS BIGINT) AS dst
      |FROM nation a JOIN nation b
      |ON a.n_regionkey = b.n_regionkey AND b.n_nationkey > a.n_nationkey""".stripMargin

  /** PageRank, 3 rounds, d=0.85, no dangling redistribution (reference:
    * examples/pagerank.rs). The chain graph has in-degree ≤ 1, so every FP
    * operation has a fixed order on both engines — ranks match bitwise. */
  def q_pagerank(s: SparkSession, dir: String): DataFrame =
    graft.algorithms.Graph.pageRank(nationChain(s, dir), iterations = 3,
      parallelism = Some(1))

  private val q_pagerank_sql =
    """WITH E AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS src,
      |         CAST(lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS BIGINT) AS dst
      |  FROM nation QUALIFY dst IS NOT NULL),
      |nodes AS (SELECT src AS node FROM E UNION SELECT dst FROM E),
      |params AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |od AS (SELECT src, count(*) AS outdeg FROM E GROUP BY src),
      |r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM params) AS rank FROM nodes),
      |r1 AS (SELECT nd.node,
      |         (1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM params) + CAST(0.85 AS DOUBLE) * coalesce(s.in_sum, CAST(0 AS DOUBLE)) AS rank
      |       FROM nodes nd LEFT JOIN (
      |         SELECT e.dst AS node, sum(r.rank / od.outdeg) AS in_sum
      |         FROM E e JOIN od ON e.src = od.src JOIN r0 r ON r.node = e.src
      |         GROUP BY e.dst) s ON nd.node = s.node),
      |r2 AS (SELECT nd.node,
      |         (1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM params) + CAST(0.85 AS DOUBLE) * coalesce(s.in_sum, CAST(0 AS DOUBLE)) AS rank
      |       FROM nodes nd LEFT JOIN (
      |         SELECT e.dst AS node, sum(r.rank / od.outdeg) AS in_sum
      |         FROM E e JOIN od ON e.src = od.src JOIN r1 r ON r.node = e.src
      |         GROUP BY e.dst) s ON nd.node = s.node),
      |r3 AS (SELECT nd.node,
      |         (1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM params) + CAST(0.85 AS DOUBLE) * coalesce(s.in_sum, CAST(0 AS DOUBLE)) AS rank
      |       FROM nodes nd LEFT JOIN (
      |         SELECT e.dst AS node, sum(r.rank / od.outdeg) AS in_sum
      |         FROM E e JOIN od ON e.src = od.src JOIN r2 r ON r.node = e.src
      |         GROUP BY e.dst) s ON nd.node = s.node)
      |SELECT node, rank FROM r3""".stripMargin

  /** k-means over the embeddings table (reference: examples/kmeans.rs via
    * `replay`): deterministic init (lowest ids), 5 Lloyd rounds. Not
    * SQL-expressible → rows-only driver check. */
  def q_kmeans(s: SparkSession, dir: String): DataFrame =
    graft.algorithms.KMeans.assign(
      tbl(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iterations = 5)

  // =====================================================================
  // NEXMark q1–q8 rebuilt over the events table (reference:
  // examples/nexmark.rs:92-494 — the reference's own query set; events
  // stand in for bids, user_id for auction/person keys, value for price).
  // =====================================================================

  /** q1 currency conversion — pure map, stays in one codegen stage. */
  def nx_q1(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("event_id"), col("user_id"),
      (col("value") * lit(0.908)).as("eur"))

  private val nx_q1_sql =
    "SELECT event_id, user_id, value * CAST(0.908 AS DOUBLE) AS eur FROM events"

  /** q2 selection — filter pushed to the scan. */
  def nx_q2(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("user_id") % 20 === 0)
      .select(col("event_id"), col("user_id"), col("value"))

  private val nx_q2_sql =
    "SELECT event_id, user_id, value FROM events WHERE user_id % 20 = 0"

  /** q3 local item suggestion — two filtered substreams equi-joined. */
  def nx_q3(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val signup = e.filter(col("event_type") === "signup" && col("value") > 30)
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"))
    val purchase = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"))
    signup.join(purchase, col("s_user") === col("p_user"))
      .select(col("s_user").as("user_id"), col("s_id"), col("p_id"))
  }

  private val nx_q3_sql =
    """SELECT s.user_id, s.event_id AS s_id, p.event_id AS p_id
      |FROM events s JOIN events p ON s.user_id = p.user_id
      |WHERE s.event_type = 'signup' AND s.value > 30 AND p.event_type = 'purchase'""".stripMargin

  /** q4 average final price per seller: max purchase per (user, day) —
    * the auction close — then per-user average of those maxima. */
  def nx_q4(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .agg(max(col("value")).as("final_price"))
      .groupBy(col("user_id"))
      .agg((sum(dec(col("final_price"))).cast("double") / count(lit(1))).as("avg_final"))

  private val nx_q4_sql =
    """SELECT user_id,
      |  CAST(sum(CAST(final_price AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_final
      |FROM (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
      |        max(value) AS final_price
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |GROUP BY user_id""".stripMargin

  /** q5 hot items: the user with the most clicks per sliding window
    * (1 day / 12 h), ties to the smaller user_id. */
  def nx_q5(s: SparkSession, dir: String): DataFrame = {
    val counts = events(s, dir).filter(col("event_type") === "click")
      .groupBy(window(col("ts"), "1 day", "12 hours").getField("start").as("ws"),
               col("user_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("ws")).orderBy(col("n").desc, col("user_id").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(unix_micros(col("ws")).as("w_start"), col("user_id"), col("n"))
  }

  private val nx_q5_sql =
    """SELECT epoch_us(ws) AS w_start, user_id, n FROM (
      |  SELECT ws, user_id, n, row_number() OVER (PARTITION BY ws ORDER BY n DESC, user_id) AS rn
      |  FROM (SELECT time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)) - k * INTERVAL '12 hours' AS ws,
      |               user_id, count(*) AS n
      |        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
      |        WHERE event_type = 'click' GROUP BY 1, 2))
      |WHERE rn = 1""".stripMargin

  /** q6 average of the last 10 purchases per user — frame aggregate, then
    * the latest row per user. */
  def nx_q6(s: SparkSession, dir: String): DataFrame = {
    val purchases = events(s, dir).filter(col("event_type") === "purchase")
    val frame = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
    val latest = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    purchases
      .withColumn("avg10",
        sum(dec(col("value"))).over(frame).cast("double") / count(lit(1)).over(frame))
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("avg10"))
  }

  private val nx_q6_sql =
    """SELECT user_id, avg10 FROM (
      |  SELECT user_id,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS avg10,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      |WHERE rn = 1""".stripMargin

  /** q7 highest bid per tumbling day — the event achieving the window max. */
  def nx_q7(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(date_trunc("day", col("ts")))
      .orderBy(col("value").desc, col("event_id").asc)
    events(s, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(unix_micros(date_trunc("day", col("ts"))).as("w_start"),
        col("event_id"), col("user_id"), col("value"))
  }

  private val nx_q7_sql =
    """SELECT epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
      |  event_id, user_id, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY date_trunc('day', CAST(ts AS TIMESTAMP))
      |    ORDER BY value DESC, event_id) AS rn FROM events)
      |WHERE rn = 1""".stripMargin

  /** q8 monitor new users: users with both a signup and a purchase in the
    * same tumbling day. */
  def nx_q8(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("d", date_trunc("day", col("ts")))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("d")).distinct()
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("d")).distinct()
    signups.join(purchases, Seq("user_id", "d"))
      .select(col("user_id"), unix_micros(col("d")).as("w_start"))
  }

  private val nx_q8_sql =
    """SELECT s.user_id, epoch_us(s.d) AS w_start
      |FROM (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
      |      FROM events WHERE event_type = 'signup') s
      |JOIN (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
      |      FROM events WHERE event_type = 'purchase') p
      |ON s.user_id = p.user_id AND s.d = p.d""".stripMargin

  // =====================================================================
  // Training-data pipeline operators (dedup / similarity / text / multimodal)
  // =====================================================================

  /** exact dedup via content digest (graft.functions.Dedup.exact). */
  def q_dedup_exact(s: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.exact(tbl(s, dir, "documents"), "doc_id", "text")

  private val q_dedup_exact_sql =
    """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** MinHash+LSH near-dup pairs (64 hashes, 16 bands) — banding/hashing is
    * engine-specific → rows-only driver check; NearDupSpec asserts recall
    * against the exact-jaccard pairs. */
  def q_dedup_minhash(s: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.minhashNearDups(tbl(s, dir, "documents"),
      "doc_id", "text", minEstSim = 0.5)

  /** SimHash near-dup pairs (Hamming ≤ 3 via 4×16-bit bands) — rows-only. */
  def q_dedup_simhash(s: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.simhashNearDups(tbl(s, dir, "documents"),
      "doc_id", "text", maxDist = 3)

  /** exact word-3-gram Jaccard ≥ 0.5 on same-language pairs — the verify
    * stage of the dedup pipeline, fully SQL-expressible. */
  def q_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.ngramJaccard(tbl(s, dir, "documents"),
      "doc_id", "text", "lang", n = 3, maxId = 2000, minJaccard = 0.5)

  private val q_ngram_jaccard_sql =
    """WITH g AS (
      |  SELECT DISTINCT doc_id, lang, array_to_string(w[i:i+2], ' ') AS g
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents WHERE doc_id < 2000),
      |       UNNEST(range(1, len(w) - 1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      |  FROM g a JOIN g b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= CAST(0.5 AS DOUBLE)""".stripMargin

  /** LSH candidates → exact verify, the end-to-end near-dup pipeline —
    * oracle-checkable because the verified output equals the full exact
    * pairwise jaccard at this threshold (miss probability ≈ 1e-12 for the
    * planted ≥0.95 dups). */
  def q_dedup_verified(s: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.nearDupPipeline(tbl(s, dir, "documents"),
      "doc_id", "text", minJaccard = 0.8)

  private val q_dedup_verified_sql =
    """WITH g AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |       UNNEST(range(1, len(w) - 1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      |  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= CAST(0.8 AS DOUBLE)""".stripMargin

  /** brute-force cosine top-3 for the first 50 vectors (exact ANN baseline). */
  def q_cosine_topk(s: SparkSession, dir: String): DataFrame =
    graft.functions.Similarity.bruteForceTopK(tbl(s, dir, "embeddings"),
      "vec_id", "embedding", maxQueryId = 50, k = 3)
      .select(col("q_id"), col("c_id"), col("sim"), col("rank"))

  private val q_cosine_topk_sql =
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |           FROM embeddings),
      |e AS (SELECT vec_id, unnest(vec) AS x, generate_subscripts(vec, 1) AS i FROM v),
      |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY vec_id),
      |d AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, sum(a.x * b.x) AS dp
      |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 50 AND a.vec_id <> b.vec_id
      |      GROUP BY 1, 2),
      |sc AS (SELECT q_id, c_id, round(dp / (na.nrm * nb.nrm), 6) AS sim
      |      FROM d JOIN n na ON na.vec_id = q_id JOIN n nb ON nb.vec_id = c_id)
      |SELECT q_id, c_id, sim, CAST(rn AS BIGINT) AS rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn FROM sc)
      |WHERE rn <= 3""".stripMargin

  /** LSH-bucketed ANN top-3 (the scale path) — bucket hashing is
    * engine-specific → rows-only; AnnSpec asserts agreement with brute force. */
  def q_ann_lsh(s: SparkSession, dir: String): DataFrame =
    graft.functions.Similarity.annTopK(tbl(s, dir, "embeddings"),
      "vec_id", "embedding", maxQueryId = 50, k = 3, bits = 8)
      .select(col("q_id"), col("c_id"), col("bucket"), col("sim"), col("rank"))

  /** IVF ANN top-3 (k-means coarse quantizer, nprobe lists searched) —
    * rows-only; AnnSpec asserts brute-force agreement. */
  def q_ann_ivf(s: SparkSession, dir: String): DataFrame =
    graft.functions.Similarity.ivfTopK(tbl(s, dir, "embeddings"),
      "vec_id", "embedding", maxQueryId = 50, k = 3, nlist = 8, nprobe = 3)

  /** embedding-cosine near-dup pairs over LSH buckets — rows-only. (This
    * corpus has near-random vectors — top-1 cosine ≈ 0.49 — so the "near
    * dup" threshold is relative to the distribution.) */
  def q_embedding_neardup(s: SparkSession, dir: String): DataFrame =
    graft.functions.Similarity.cosineNearDups(tbl(s, dir, "embeddings"),
      "vec_id", "embedding", minSim = 0.4, bits = 8)

  /** full text profile: token/subword counts, punct + stopword ratios, mean
    * word length, quality score, language ID, bag-of-words fingerprint. */
  def q_text_profile(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextAnalysis.profile(tbl(s, dir, "documents"), "doc_id", "text")

  private val stopEn = graft.functions.TextAnalysis.stopwordsEn
    .map(w => s"'$w'").mkString("[", ", ", "]")
  private val stopEs = graft.functions.TextAnalysis.stopwordsEs
    .map(w => s"'$w'").mkString("[", ", ", "]")
  private val stopDe = graft.functions.TextAnalysis.stopwordsDe
    .map(w => s"'$w'").mkString("[", ", ", "]")

  private val q_text_profile_sql =
    s"""WITH base AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, text, w, len(w) AS nw, list_distinct(w) AS dw,
      |    len(list_intersect(list_distinct(w), $stopEn)) AS s_en,
      |    len(list_intersect(list_distinct(w), $stopEs)) AS s_es,
      |    len(list_intersect(list_distinct(w), $stopDe)) AS s_de,
      |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
      |      / greatest(length(text), 1) AS punct_ratio,
      |    CAST(len(list_filter(w, x -> list_contains($stopEn, x))) AS DOUBLE)
      |      / greatest(len(w), 1) AS stopword_ratio
      |  FROM base)
      |SELECT doc_id,
      |  CAST(nw AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x <> ''))
      |    + len(regexp_extract_all(text, '[a-zA-Z][0-9]|[0-9][a-zA-Z]')) AS BIGINT) AS n_subwords,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  punct_ratio,
      |  stopword_ratio,
      |  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / greatest(nw, 1) AS mean_word_len,
      |  (CASE WHEN nw BETWEEN 20 AND 2000 THEN CAST(1 AS DOUBLE)
      |        WHEN nw BETWEEN 5 AND 5000 THEN CAST(0.5 AS DOUBLE)
      |        ELSE CAST(0 AS DOUBLE) END) * CAST(0.5 AS DOUBLE)
      |    + (CASE WHEN punct_ratio <= CAST(0.2 AS DOUBLE) THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) * CAST(0.25 AS DOUBLE)
      |    + (CASE WHEN stopword_ratio >= CAST(0.05 AS DOUBLE) THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) * CAST(0.25 AS DOUBLE)
      |    AS quality,
      |  CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 THEN 'unknown'
      |       WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |       WHEN s_es >= s_de THEN 'es'
      |       ELSE 'de' END AS lang_guess,
      |  md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS fingerprint
      |FROM d""".stripMargin

  /** multimodal: binary payload column + stub decode via mapPartitions
    * (graft.functions.Multimodal) — schema/plumbing real, codec stubbed. */
  def q_multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = tbl(s, dir, "documents").select(
        col("doc_id").as("media_id"), col("source").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[graft.functions.Multimodal.MediaRecord]
    graft.functions.Multimodal.decode(media).toDF()
  }

  private val q_multimodal_sql =
    """SELECT doc_id AS media_id, source AS kind,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
      |  sha256(text) AS digest,
      |  CAST(64 + octet_length(CAST(text AS BLOB)) % 577 AS INTEGER) AS width,
      |  CAST(64 + (octet_length(CAST(text AS BLOB)) // 7) % 431 AS INTEGER) AS height,
      |  CAST(1 + octet_length(CAST(text AS BLOB)) % 24 AS INTEGER) AS n_frames
      |FROM documents""".stripMargin

  /** wordcount-assoc over a TEXT FILE — the reference's hero benchmark
    * (README.md:62-96, benches/wordcount.rs): stream_file → flat_map →
    * group_by_count. The file is materialized once per (sf, content hash)
    * from the documents table so the oracle can check against the same rows. */
  def q_wordcount_file(s: SparkSession, dir: String): DataFrame = {
    val sfTag = dir.replaceAll("[^0-9a-zA-Z.]", "_")
    val path = s"/tmp/graft_wordcount_$sfTag.txt"
    // stale-safety without a full rewrite per run: a cheap content
    // fingerprint (count + char sum) gates regeneration, so regenerated
    // test data can never silently diverge from the oracle's parquet view
    val fpRow = tbl(s, dir, "documents")
      .agg(count(lit(1)), sum(col("n_chars"))).head()
    val fp = s"${fpRow.getLong(0)}_${fpRow.getLong(1)}"
    val fpPath = java.nio.file.Paths.get(path + ".fp")
    val stale = !java.nio.file.Files.exists(java.nio.file.Paths.get(path)) ||
      !java.nio.file.Files.exists(fpPath) ||
      java.nio.file.Files.readString(fpPath) != fp
    if (stale) {
      val tmp = path + ".tmpdir"
      tbl(s, dir, "documents").select(col("text"))
        .coalesce(1).write.mode("overwrite").text(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-"))
        .getOrElse(sys.error(s"text write produced no part file under $tmp"))
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.writeString(fpPath, fp)
    }
    s.read.textFile(path)
      .select(explode(split(col("value"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
  }

  private val q_wordcount_file_sql = q_flat_map_sql // identical content

  /** Flagship end-to-end training-data pipeline: profile → quality gate →
    * bag-of-words dedup (keep lowest id per fingerprint) → per-language
    * corpus stats. One narrow profiling stage, one dedup shuffle, one stats
    * shuffle — the minimal-shuffle shape of a production cleaning job. */
  def q_pipeline_clean(s: SparkSession, dir: String): DataFrame = {
    val profiled = graft.functions.TextAnalysis.profile(
      tbl(s, dir, "documents"), "doc_id", "text")
    val gated = profiled.filter(col("quality") >= 0.75)
    val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
    val deduped = gated.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    deduped.groupBy(col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"))
  }

  private val q_pipeline_clean_sql =
    s"""WITH profiled AS (${q_text_profile_sql.replace("FROM d", "FROM d")}),
      |gated AS (SELECT * FROM profiled WHERE quality >= CAST(0.75 AS DOUBLE)),
      |deduped AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      |                 FROM gated) WHERE rn = 1)
      |SELECT lang_guess, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
      |FROM deduped GROUP BY lang_guess""".stripMargin

  // ---------------------------------------------------------------------
  // registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _),
    "q_group_count" -> (q_group_count _),
    "q_group_avg" -> (q_group_avg _),
    "q_group_minmax" -> (q_group_minmax _),
    "q_max_element" -> (q_max_element _),
    "q_fold_global" -> (q_fold_global _),
    "q_reduce_max" -> (q_reduce_max _),
    "q_distinct" -> (q_distinct _),
    "q_fold_scan" -> (q_fold_scan _),
    "q_reduce_scan_keyed" -> (q_reduce_scan_keyed _),
    "q_map" -> (q_map _),
    "q_filter" -> (q_filter _),
    "q_filter_map" -> (q_filter_map _),
    "q_flat_map" -> (q_flat_map _),
    "q_scalar_funcs" -> (q_scalar_funcs _),
    "q_json" -> (q_json _),
    "q_merge" -> (q_merge _),
    "q_route" -> (q_route _),
    "q_top_k" -> (q_top_k _),
    "q_limit_offset" -> (q_limit_offset _),
    "q_sort" -> (q_sort _),
    "q_join_inner" -> (q_join_inner _),
    "q_join_left" -> (q_join_left _),
    "q_join_outer" -> (q_join_outer _),
    "q_join_semi" -> (q_join_semi _),
    "q_join_anti" -> (q_join_anti _),
    "q_join_broadcast" -> (q_join_broadcast _),
    "q_window_tumbling" -> (q_window_tumbling _),
    "q_window_sliding" -> (q_window_sliding _),
    "q_window_session" -> (q_window_session _),
    "q_window_count" -> (q_window_count _),
    "q_window_lastk" -> (q_window_lastk _),
    "q_window_first_last" -> (q_window_first_last _),
    "q_interval_join" -> (q_interval_join _),
    "q_window_join" -> (q_window_join _),
    "q_connected_components" -> (q_connected_components _),
    "q_transitive_closure" -> (q_transitive_closure _),
    "q_pagerank" -> (q_pagerank _),
    "q_kmeans" -> (q_kmeans _),
    "q_dedup_exact" -> (q_dedup_exact _),
    "q_dedup_minhash" -> (q_dedup_minhash _),
    "q_dedup_simhash" -> (q_dedup_simhash _),
    "q_ngram_jaccard" -> (q_ngram_jaccard _),
    "q_dedup_verified" -> (q_dedup_verified _),
    "q_cosine_topk" -> (q_cosine_topk _),
    "q_ann_lsh" -> (q_ann_lsh _),
    "q_ann_ivf" -> (q_ann_ivf _),
    "q_embedding_neardup" -> (q_embedding_neardup _),
    "q_text_profile" -> (q_text_profile _),
    "q_multimodal" -> (q_multimodal _),
    "nx_q1" -> (nx_q1 _),
    "nx_q2" -> (nx_q2 _),
    "nx_q3" -> (nx_q3 _),
    "nx_q4" -> (nx_q4 _),
    "nx_q5" -> (nx_q5 _),
    "nx_q6" -> (nx_q6 _),
    "nx_q7" -> (nx_q7 _),
    "nx_q8" -> (nx_q8 _),
    "q_pipeline_clean" -> (q_pipeline_clean _),
    "q_wordcount_file" -> (q_wordcount_file _)
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1_sql,
    "q_group_count" -> q_group_count_sql,
    "q_group_avg" -> q_group_avg_sql,
    "q_group_minmax" -> q_group_minmax_sql,
    "q_max_element" -> q_max_element_sql,
    "q_fold_global" -> q_fold_global_sql,
    "q_reduce_max" -> q_reduce_max_sql,
    "q_distinct" -> q_distinct_sql,
    "q_fold_scan" -> q_fold_scan_sql,
    "q_reduce_scan_keyed" -> q_reduce_scan_keyed_sql,
    "q_map" -> q_map_sql,
    "q_filter" -> q_filter_sql,
    "q_filter_map" -> q_filter_map_sql,
    "q_flat_map" -> q_flat_map_sql,
    "q_scalar_funcs" -> q_scalar_funcs_sql,
    "q_json" -> q_json_sql,
    "q_merge" -> q_merge_sql,
    "q_route" -> q_route_sql,
    "q_top_k" -> q_top_k_sql,
    "q_limit_offset" -> q_limit_offset_sql,
    "q_sort" -> q_sort_sql,
    "q_join_inner" -> q_join_inner_sql,
    "q_join_left" -> q_join_left_sql,
    "q_join_outer" -> q_join_outer_sql,
    "q_join_semi" -> q_join_semi_sql,
    "q_join_anti" -> q_join_anti_sql,
    "q_join_broadcast" -> q_join_broadcast_sql,
    "q_window_tumbling" -> q_window_tumbling_sql,
    "q_window_sliding" -> q_window_sliding_sql,
    "q_window_session" -> q_window_session_sql,
    "q_window_count" -> q_window_count_sql,
    "q_window_lastk" -> q_window_lastk_sql,
    "q_window_first_last" -> q_window_first_last_sql,
    "q_interval_join" -> q_interval_join_sql,
    "q_window_join" -> q_window_join_sql,
    "q_connected_components" -> q_connected_components_sql,
    "q_transitive_closure" -> q_transitive_closure_sql,
    "q_pagerank" -> q_pagerank_sql,
    // q_kmeans: driver loop, not SQL-expressible → rows-only check
    "q_dedup_exact" -> q_dedup_exact_sql,
    // q_dedup_minhash / q_dedup_simhash / q_ann_lsh / q_embedding_neardup:
    // engine-specific hashing → rows-only; Scala specs assert recall
    "q_ngram_jaccard" -> q_ngram_jaccard_sql,
    "q_dedup_verified" -> q_dedup_verified_sql,
    "q_cosine_topk" -> q_cosine_topk_sql,
    "q_text_profile" -> q_text_profile_sql,
    "q_multimodal" -> q_multimodal_sql,
    "nx_q1" -> nx_q1_sql,
    "nx_q2" -> nx_q2_sql,
    "nx_q3" -> nx_q3_sql,
    "nx_q4" -> nx_q4_sql,
    "nx_q5" -> nx_q5_sql,
    "nx_q6" -> nx_q6_sql,
    "nx_q7" -> nx_q7_sql,
    "nx_q8" -> nx_q8_sql,
    "q_pipeline_clean" -> q_pipeline_clean_sql,
    "q_wordcount_file" -> q_wordcount_file_sql
  )
}
