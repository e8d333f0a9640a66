package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Foundational relational queries over the testdata tables: scans,
  * projections, filters, joins, aggregations, windows, dedup, pivot,
  * set ops, top-k, sessionization (SURVEY §2.1/2.2/2.3/2.4/2.7 + §2.10
  * extensions). All aggregates are integer-exact so results hash-match
  * the DuckDB oracle bit-for-bit.
  */
object CoreQueries {
  import Registry.table

  /** The events table with an epoch-seconds `sec` column, adaptive to the
    * testdata's physical `ts` encoding. Regenerated testdata has flipped
    * between parquet TIMESTAMP(NANOS) — which Spark reads as a nano LONG
    * under spark.sql.legacy.parquet.nanosAsLong — and timestamp[us], which
    * resolves as TIMESTAMP/TIMESTAMP_NTZ; hard-coding either assumption
    * breaks all event-time queries the next time the encoding changes.
    * Both branches floor to whole seconds (integer `div`; to_unix_timestamp
    * floor-divides micros), matching the oracle's FLOOR(epoch(ts)) under
    * the UTC session timezone both entrypoints set.
    */
  private[queries] def eventsWithSec(s: SparkSession, dir: String): DataFrame = {
    val df = table(s, dir, "events")
    val sec = df.schema("ts").dataType match {
      case LongType => expr("ts div 1000000000")
      case _        => expr("to_unix_timestamp(ts)")
    }
    df.withColumn("sec", sec)
  }

  def defs: Seq[QueryDef] = Seq(
    // A-family hash aggregation with map-side partial aggregation.
    QueryDef(
      "q1_agg",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            sum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_rows
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // J-family shuffle join + aggregation; integral price sum stays exact.
    QueryDef(
      "q2_join_agg",
      (s, dir) =>
        table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice")).cast(LongType)).as("sum_price")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  CAST(sum(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)),

    // Predicate + projection pushdown to the parquet scan.
    QueryDef(
      "q3_filter_pushdown",
      (s, dir) =>
        table(s, dir, "lineitem")
          .filter(to_date(col("l_shipdate")) >= lit("1995-06-01").cast(DateType)
            && col("l_discount") > 0.05)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty")),
      Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) >= DATE '1995-06-01'
             |  AND l_discount > 0.05
             |GROUP BY 1""".stripMargin)),

    // Analytic window: per-customer running order count + price total.
    QueryDef(
      "q4_window_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        table(s, dir, "orders")
          .filter(col("o_custkey") % 100 === 0)
          .withColumn("fp", floor(col("o_totalprice")).cast(LongType))
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"),
            sum("fp").over(w).as("running_price"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  row_number() OVER w AS rn,
             |  CAST(sum(CAST(FLOOR(o_totalprice) AS BIGINT)) OVER w AS BIGINT)
             |    AS running_price
             |FROM orders WHERE o_custkey % 100 = 0
             |WINDOW w AS (PARTITION BY o_custkey
             |  ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // D1-style keep-first dedup via row_number window.
    QueryDef(
      "q5_dedup_keepfirst",
      (s, dir) => {
        // The synthetic lineitem carries duplicate (orderkey, linenumber)
        // pairs, so the keep-first ordering needs a total tie-break.
        val w = Window.partitionBy("l_orderkey")
          .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        table(s, dir, "lineitem")
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .select("l_orderkey", "l_partkey", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
             |QUALIFY row_number() OVER (PARTITION BY l_orderkey
             |  ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) = 1""".stripMargin)),

    // A9-style pivot with a fixed vocabulary (null-safe zero fill).
    QueryDef(
      "q6_pivot_month_flag",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .count()
          .na.fill(0L),
      Some("""SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_month,
             |  count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS "A",
             |  count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS "N",
             |  count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS "R"
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // A8-style crosstab in long form.
    QueryDef(
      "q7_crosstab",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
             |FROM lineitem GROUP BY 1, 2""".stripMargin)),

    // A5-style value_counts.
    QueryDef(
      "q8_value_counts",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n")),
      Some("SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1")),

    // A6-style date-lag histogram across a join.
    QueryDef(
      "q9_date_lag_hist",
      (s, dir) =>
        table(s, dir, "lineitem")
          .join(table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))).as("lag_days"))
          .groupBy("lag_days")
          .agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
             |    AS INTEGER) AS lag_days, count(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1""".stripMargin)),

    // Deterministic top-k (order + tie-break + limit).
    QueryDef(
      "q10_topk",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("o_custkey"))
          .limit(25),
      Some("""SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
             |ORDER BY n DESC, o_custkey LIMIT 25""".stripMargin)),

    // Set operation: INTERSECT of two key sets.
    QueryDef(
      "q11_setops",
      (s, dir) =>
        table(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("key")).distinct()
          .intersect(
            table(s, dir, "customer")
              .filter(col("c_acctbal") > 1000)
              .select(col("c_custkey").as("key"))),
      Some("""SELECT DISTINCT o_custkey AS key FROM orders
             |WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT c_custkey AS key FROM customer
             |WHERE c_acctbal > 1000""".stripMargin)),

    // Set operation: EXCEPT (customers with no 'F' orders).
    QueryDef(
      "q18_except",
      (s, dir) =>
        table(s, dir, "customer")
          .select(col("c_custkey").as("key")).distinct()
          .except(
            table(s, dir, "orders")
              .filter(col("o_orderstatus") === "F")
              .select(col("o_custkey").as("key"))),
      Some("""SELECT DISTINCT c_custkey AS key FROM customer
             |EXCEPT
             |SELECT o_custkey AS key FROM orders
             |WHERE o_orderstatus = 'F'""".stripMargin)),

    // Full cube over two dimensions (all grouping-set combinations).
    QueryDef(
      "q19_cube",
      (s, dir) =>
        table(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("o_orderstatus"), lit("<all>")).as("o_orderstatus"),
            coalesce(col("o_orderpriority"), lit("<all>")).as("o_orderpriority"),
            col("n")),
      Some("""SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
             |  coalesce(o_orderpriority, '<all>') AS o_orderpriority,
             |  count(*) AS n
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // Tumbling-window aggregation over the events table — the batch twin
    // of graft.streaming.EventsStream.windowedCounts.
    QueryDef(
      "q13_tumbling_window",
      (s, dir) =>
        eventsWithSec(s, dir)
          .select(expr("sec div 3600").as("hour_bucket"),
            col("event_type"),
            floor(col("value")).cast(LongType).as("v"))
          .groupBy("hour_bucket", "event_type")
          .agg(count(lit(1)).as("n_events"), sum("v").as("sum_v")),
      Some("""SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
             |  event_type, count(*) AS n_events,
             |  CAST(sum(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_v
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Hierarchical rollup (subtotals + grand total in one pass).
    QueryDef(
      "q16_rollup",
      (s, dir) =>
        table(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("<all>")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("<all>")).as("l_linestatus"),
            col("n"), col("sum_qty")),
      Some("""SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
             |  coalesce(l_linestatus, '<all>') AS l_linestatus,
             |  count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // Distinct aggregates (exact; the approximate HLL variant is not
    // oracle-matchable across engines by construction).
    QueryDef(
      "q17_distinct_agg",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // JSON extraction from the events props payload (get_json_object stays
    // in codegen; schema-on-read without a parsing pass).
    QueryDef(
      "q15_json_extract",
      (s, dir) =>
        table(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
            min("k").as("min_k"), max("k").as("max_k")),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS BIGINT) AS sum_k,
             |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY 1""".stripMargin)),

    // As-of join (nearest prior event per user) — Spark lacks the operator;
    // graft.operators.AsOfJoin composes it from one shuffle + an ordered
    // window. The oracle is DuckDB's native ASOF LEFT JOIN.
    QueryDef(
      "q14_asof_join",
      (s, dir) => {
        val e = eventsWithSec(s, dir)
          .select(col("user_id"), col("sec"), col("event_id"), col("value"))
        val l = e.filter(col("event_id") % 5 === 0)
          .select("user_id", "sec", "event_id")
        val rw = Window.partitionBy("user_id", "sec").orderBy(desc("event_id"))
        val r = e.filter(col("event_id") % 5 =!= 0)
          .withColumn("_rn", row_number().over(rw)).filter(col("_rn") === 1)
          .select("user_id", "sec", "event_id", "value")
        graft.operators.AsOfJoin.asOf(l, r, Seq("user_id"), "sec",
          Seq("event_id", "value"), "event_id")
      },
      Some("""WITH l AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
             |  FROM events WHERE event_id % 5 = 0),
             |r AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             |    event_id, value
             |  FROM events WHERE event_id % 5 <> 0
             |  QUALIFY row_number() OVER (PARTITION BY user_id,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) ORDER BY event_id DESC) = 1)
             |SELECT l.user_id, l.sec, l.event_id,
             |  r.event_id AS event_id_asof, r.value AS value_asof
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.sec >= r.sec""".stripMargin)),

    // Left-semi join (EXISTS): customers with at least one urgent order.
    // Semi joins shuffle only the join keys of the right side — no
    // payload — so the filter scales independently of order width.
    QueryDef(
      "q20_semi_join",
      (s, dir) =>
        table(s, dir, "customer")
          .join(
            table(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment", "c_acctbal"),
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey
             |    AND o_orderpriority = '1-URGENT')""".stripMargin)),

    // Left-anti join (NOT EXISTS): customers with no urgent orders.
    QueryDef(
      "q21_anti_join",
      (s, dir) =>
        table(s, dir, "customer")
          .join(
            table(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment", "c_acctbal"),
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey
             |    AND o_orderpriority = '1-URGENT')""".stripMargin)),

    // Ordered string aggregation (collect_set -> sort -> join keeps the
    // result deterministic; Spark's collect order alone is not).
    QueryDef(
      "q22_string_agg",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
              .as("statuses"),
            countDistinct(col("o_orderstatus")).as("n_statuses")),
      Some("""SELECT o_orderpriority,
             |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             |    AS statuses,
             |  count(DISTINCT o_orderstatus) AS n_statuses
             |FROM orders GROUP BY 1""".stripMargin)),

    // Exact nearest-rank percentiles (p50/p90/p99) via ordered windows.
    // Interpolating percentile_cont/quantile_cont is NOT cross-engine
    // hash-stable (the interpolation arithmetic differs in the last ulp);
    // nearest-rank picks an actual data value so the result is exact on
    // both engines. ceil(p*n) in integer arithmetic: (n*p + 99) div 100.
    QueryDef(
      "q23_percentile_rank",
      (s, dir) => {
        val w = Window.partitionBy("pri").orderBy("fp")
        val wn = Window.partitionBy("pri")
        def atRank(k: Column) = max(when(col("rn") === k, col("fp")))
        table(s, dir, "orders")
          .select(col("o_orderpriority").as("pri"),
            floor(col("o_totalprice")).cast(LongType).as("fp"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("pri")
          .agg(
            atRank(expr("(n * 50 + 99) div 100")).as("p50"),
            atRank(expr("(n * 90 + 99) div 100")).as("p90"),
            atRank(expr("(n * 99 + 99) div 100")).as("p99"),
            count(lit(1)).as("n_rows"))
      },
      Some("""WITH d AS (
             |  SELECT o_orderpriority AS pri,
             |    CAST(FLOOR(o_totalprice) AS BIGINT) AS fp
             |  FROM orders),
             |r AS (
             |  SELECT pri, fp, row_number() OVER (PARTITION BY pri ORDER BY fp)
             |      AS rn,
             |    count(*) OVER (PARTITION BY pri) AS n
             |  FROM d)
             |SELECT pri,
             |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN fp END) AS p50,
             |  max(CASE WHEN rn = (n * 90 + 99) // 100 THEN fp END) AS p90,
             |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN fp END) AS p99,
             |  CAST(count(*) AS BIGINT) AS n_rows
             |FROM r GROUP BY 1""".stripMargin)),

    // Band range-join: same-user event pairs within 300 s of each other.
    // graft.operators.RangeJoin turns the non-equi band predicate into a
    // bucketed equi-join (see its doc); the oracle runs the naive theta
    // join, proving the bucketed plan is lossless.
    QueryDef(
      "q24_range_join",
      (s, dir) => {
        val e = eventsWithSec(s, dir)
          .select(col("user_id"), col("sec"), col("event_id"))
        val a = e.select(col("user_id"), col("sec").as("sec_a"),
          col("event_id").as("id_a"))
        val b = e.select(col("user_id"), col("sec").as("sec_b"),
          col("event_id").as("id_b"))
        graft.operators.RangeJoin.bandJoin(a, b, Seq("user_id"),
            "sec_a", "sec_b", 300L)
          .filter(col("id_a") < col("id_b"))
          .select("user_id", "id_a", "id_b", "sec_a", "sec_b")
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
             |  FROM events)
             |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
             |  a.sec AS sec_a, b.sec AS sec_b
             |FROM e a JOIN e b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             |  AND abs(a.sec - b.sec) <= 300""".stripMargin)),

    // Lateral explode (flatten + re-aggregate): top-20 corpus tokens.
    QueryDef(
      "q25_explode_tokens",
      (s, dir) =>
        table(s, dir, "documents")
          .select(explode(expr(raw"filter(split(text, '\\s+'), x -> x != '')"))
            .as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("tok"))
          .limit(20),
      Some("""SELECT tok, count(*) AS n FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |    x -> x <> '')) AS tok
             |  FROM documents)
             |GROUP BY 1 ORDER BY n DESC, tok LIMIT 20""".stripMargin)),

    // RANGE-frame window: per-user rolling sum over a trailing 1-hour
    // event-time band (value-based frame, not row-based — peers at the
    // same timestamp are always included, so ties are deterministic).
    QueryDef(
      "q26_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("sec")
          .rangeBetween(-3600L, Window.currentRow)
        eventsWithSec(s, dir)
          .select(col("user_id"), col("sec"),
            col("event_id"), floor(col("value")).cast(LongType).as("v"))
          .select(col("user_id"), col("event_id"), col("sec"),
            sum("v").over(w).as("rolling_v"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             |    event_id, CAST(FLOOR(value) AS BIGINT) AS v
             |  FROM events)
             |SELECT user_id, event_id, sec,
             |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY sec
             |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS rolling_v
             |FROM e""".stripMargin)),

    // Navigation analytics: lag/lead/first_value + an inter-row delta over
    // a deterministic per-customer order sequence.
    QueryDef(
      "q27_analytics",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        table(s, dir, "orders")
          .filter(col("o_custkey") % 200 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_orderkey", 1).over(w).as("prev_order"),
            lead("o_orderkey", 1).over(w).as("next_order"),
            first_value(col("o_orderkey")).over(w).as("first_order"),
            (floor(col("o_totalprice")).cast(LongType)
              - floor(lag("o_totalprice", 1).over(w)).cast(LongType))
              .as("price_delta"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_orderkey) OVER w AS prev_order,
             |  lead(o_orderkey) OVER w AS next_order,
             |  first_value(o_orderkey) OVER w AS first_order,
             |  CAST(FLOOR(o_totalprice) AS BIGINT)
             |    - CAST(FLOOR(lag(o_totalprice) OVER w) AS BIGINT) AS price_delta
             |FROM orders
             |WHERE o_custkey % 200 = 0
             |WINDOW w AS (PARTITION BY o_custkey
             |  ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // Schema-evolution union: unionByName aligns by column NAME, not
    // position (the positional union of these two frames would scramble
    // columns); oracle is DuckDB's UNION ALL BY NAME.
    QueryDef(
      "q28_union_byname",
      (s, dir) => {
        val a = table(s, dir, "orders")
          .groupBy(col("o_orderstatus").as("key"))
          .agg(count(lit(1)).as("n"))
          .select(col("key"), lit("orders").as("src"), col("n"))
        val b = table(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("key"))
          .agg(count(lit(1)).as("n"))
          .select(col("n"), col("key"), lit("lineitem").as("src"))
        a.unionByName(b)
      },
      Some("""SELECT o_orderstatus AS key, 'orders' AS src, count(*) AS n
             |FROM orders GROUP BY 1
             |UNION ALL BY NAME
             |SELECT count(*) AS n, l_returnflag AS key, 'lineitem' AS src
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Date/time function battery: interval arithmetic, month boundaries,
    // day-of-week (normalized to DuckDB's Sunday=0 numbering; Spark's
    // dayofweek is Sunday=1), year extraction. Dates emitted as strings so
    // both engines hash identical scalars.
    QueryDef(
      "q29_datetime_funcs",
      (s, dir) => {
        val d = to_date(col("o_orderdate"))
        table(s, dir, "orders")
          .filter(col("o_orderkey") % 500 === 0)
          .select(col("o_orderkey"),
            date_format(date_add(d, 30), "yyyy-MM-dd").as("plus30"),
            date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
            date_format(trunc(d, "month"), "yyyy-MM-dd").as("month_start"),
            (dayofweek(d) - 1).as("dow"),
            year(d).cast(LongType).as("yr"))
      },
      Some("""SELECT o_orderkey,
             |  strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE),
             |    '%Y-%m-%d') AS plus30,
             |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             |  strftime(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE),
             |    '%Y-%m-%d') AS month_start,
             |  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER) AS dow,
             |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr
             |FROM orders WHERE o_orderkey % 500 = 0""".stripMargin)),

    // Gaps-and-islands sessionization over the events stream table
    // (30-minute inactivity gap), the batch twin of the streaming
    // session-window operator.
    QueryDef(
      "q12_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        eventsWithSec(s, dir)
          .select(col("user_id"), col("event_id"), col("sec"))
          .withColumn("prev_sec", lag("sec", 1).over(w))
          .withColumn("new_sess",
            when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum("new_sess").over(
            Window.partitionBy("user_id").orderBy("sec", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min("sec").as("start_sec"), max("sec").as("end_sec"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |flags AS (
             |  SELECT *,
             |    CASE WHEN lag(sec) OVER w IS NULL
             |      OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
             |sess AS (
             |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
             |    ORDER BY sec, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM flags)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(sec) AS start_sec, max(sec) AS end_sec
             |FROM sess GROUP BY 1, 2""".stripMargin)),

    // Correlated aggregate subquery: orders strictly above their
    // customer's average order value. Spark has no correlated-scalar
    // runtime — the idiomatic plan is a shuffle groupBy on the
    // correlation key joined back to the fact (Catalyst performs the
    // same de-correlation for SQL-written subqueries). The comparison is
    // division-free (price * n > sum) in exact DECIMAL arithmetic so
    // both engines agree bitwise; output is key columns only, keeping
    // the hashed schema integer-typed.
    QueryDef(
      "q30_correlated_agg",
      (s, dir) => {
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast(DecimalType(18, 2)).as("p"))
        val avgs = o.groupBy("o_custkey")
          .agg(sum("p").as("s"), count(lit(1)).as("n"))
        o.join(avgs, "o_custkey")
          .filter(col("p") * col("n") > col("s"))
          .select("o_orderkey", "o_custkey")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_custkey,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
             |  FROM orders)
             |SELECT o_orderkey, o_custkey FROM o a
             |WHERE a.p * (SELECT count(*) FROM o b
             |              WHERE b.o_custkey = a.o_custkey)
             |    > (SELECT sum(p) FROM o c
             |        WHERE c.o_custkey = a.o_custkey)""".stripMargin)),

    // Sliding (hopping) windows in batch: Spark's native window(ts, 1h,
    // 30m) — each event lands in w/s = 2 overlapping windows. The oracle
    // reproduces the window assignment arithmetically (an event at second
    // t belongs to windows starting at 1800*k for k in {t div 1800,
    // t div 1800 - 1}), which is exactly Spark's epoch-aligned origin.
    // Completes the window-family coverage next to tumbling (q13),
    // session (q12), and RANGE frames (q26); the streaming twin is the
    // same expression under a watermark.
    QueryDef(
      "q31_sliding_window",
      (s, dir) =>
        eventsWithSec(s, dir)
          .select(timestamp_seconds(col("sec")).as("t"),
            col("event_type"), col("user_id"))
          .groupBy(window(col("t"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .select(col("window.start").cast(LongType).as("window_start_sec"),
            col("event_type"), col("n_events"), col("n_users")),
      // TRUNC(epoch) mirrors eventsWithSec's whole-second truncation and
      // FLOOR(sec/1800.0) mirrors window()'s floored bucket assignment —
      // both also correct for pre-1970 timestamps, where `//` would
      // truncate toward zero; the IS NOT NULL guard mirrors window()
      // silently dropping null event times.
      Some("""WITH e AS (
             |  SELECT CAST(TRUNC(epoch(ts)) AS BIGINT) AS sec, event_type, user_id
             |  FROM events WHERE ts IS NOT NULL),
             |assigned AS (
             |  SELECT (CAST(FLOOR(sec / 1800.0) AS BIGINT) - k) * 1800
             |      AS window_start_sec,
             |    event_type, user_id
             |  FROM e, unnest([0, 1]) AS u(k))
             |SELECT window_start_sec, event_type,
             |  count(*) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM assigned GROUP BY 1, 2""".stripMargin)),

    // Two-phase SALTED aggregation (graft.operators.SkewJoin): the
    // skew device for hot group keys — partial aggregate on (key, salt)
    // spreads each hot key over 16 reducers, final aggregate on the key
    // re-combines. l_returnflag has 3 values over the whole corpus: the
    // canonical shape where a plain groupBy funnels everything through 3
    // reducers at 100 TB. The oracle is the PLAIN group-by — a correct
    // salting device must be invisible in the result. Salt is a pure
    // function of (l_orderkey, l_linenumber), so the plan is fully
    // deterministic and retry-safe.
    QueryDef(
      "q32_salted_agg",
      (s, dir) =>
        graft.operators.SkewJoin.saltedAggregate(
          table(s, dir, "lineitem")
            .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"),
          Seq("l_returnflag"),
          buckets = 16,
          partialAggs = Seq(sum("l_quantity").as("pq"), count(lit(1)).as("pn")),
          finalAggs = Seq(sum(col("pq")).as("sum_qty"),
            sum(col("pn")).as("n_rows")),
          saltBy = Some(col("l_orderkey") * 31 + col("l_linenumber"))),
      Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n_rows
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // Distribution-rank window battery: ntile quartiles + percent_rank +
    // cume_dist over a deterministic (value, key) order — completes the
    // ranking-function family next to row_number (q4/q5), lag/lead (q27)
    // and nearest-rank percentiles (q23). Both engines define ntile with
    // larger-buckets-first and percent_rank as (rank-1)/(n-1); the order
    // key is unique so no tie ambiguity exists.
    QueryDef(
      "q33_rank_distributions",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("fp"), col("o_orderkey"))
        table(s, dir, "orders")
          .filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            floor(col("o_totalprice")).cast(LongType).as("fp"))
          .withColumn("quartile", ntile(4).over(w).cast(LongType))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  CAST(FLOOR(o_totalprice) AS BIGINT) AS fp,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cume
             |FROM orders
             |WHERE o_orderkey % 100 = 0
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY CAST(FLOOR(o_totalprice) AS BIGINT), o_orderkey)""".stripMargin)),

    // Ordered conversion funnel view -> click -> purchase: each step's
    // first-occurrence time must be at or after the previous step's. All
    // three step times come from min(when(...)) windows over the SAME
    // user_id partitioning, so the whole per-user stage rides ONE
    // exchange (Spark reuses the hash partitioning across consecutive
    // window operators and the final per-user aggregate); the summary is
    // a 3-row stack off a 1-row conditional-count reduce. Conversions
    // are integer permille (n * 1000 div prev) so both engines floor
    // identically. At 100 TB this is the canonical one-shuffle funnel:
    // no self-joins, no per-step passes over the raw events.
    QueryDef(
      "q34_funnel",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        val perUser = eventsWithSec(s, dir)
          .select(col("user_id"), col("event_type"), col("sec"))
          .withColumn("v_sec",
            min(when(col("event_type") === "view", col("sec"))).over(w))
          .withColumn("c_sec",
            min(when(col("event_type") === "click" &&
              col("sec") >= col("v_sec"), col("sec"))).over(w))
          .withColumn("p_sec",
            min(when(col("event_type") === "purchase" &&
              col("sec") >= col("c_sec"), col("sec"))).over(w))
          .groupBy("user_id")
          .agg(min("v_sec").as("v"), min("c_sec").as("c"), min("p_sec").as("p"))
        perUser
          .agg(
            sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n1"),
            sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n2"),
            sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n3"))
          .select(expr(
            """stack(3,
              |  '1_view', n1, CAST(NULL AS BIGINT),
              |  '2_click', n2, n1,
              |  '3_purchase', n3, n2) AS (step, n_users, prev_users)"""
              .stripMargin))
          .withColumn("conv_permille",
            when(col("prev_users") > 0,
              expr("n_users * 1000 div prev_users")))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events),
             |v AS (SELECT user_id, min(sec) AS v_sec FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(sec) AS c_sec FROM e
             |  JOIN v USING (user_id)
             |  WHERE event_type = 'click' AND sec >= v.v_sec GROUP BY 1),
             |p AS (SELECT e.user_id, min(sec) AS p_sec FROM e
             |  JOIN c USING (user_id)
             |  WHERE event_type = 'purchase' AND sec >= c.c_sec GROUP BY 1),
             |n AS (SELECT (SELECT count(*) FROM v) AS n1,
             |  (SELECT count(*) FROM c) AS n2,
             |  (SELECT count(*) FROM p) AS n3)
             |SELECT '1_view' AS step, n1 AS n_users,
             |  CAST(NULL AS BIGINT) AS prev_users,
             |  CAST(NULL AS BIGINT) AS conv_permille FROM n
             |UNION ALL SELECT '2_click', n2, n1,
             |  CASE WHEN n1 > 0 THEN n2 * 1000 // n1 END FROM n
             |UNION ALL SELECT '3_purchase', n3, n2,
             |  CASE WHEN n2 > 0 THEN n3 * 1000 // n2 END FROM n""".stripMargin)),

    // Retention cohort matrix: cohort = each user's first-activity day,
    // cells = distinct active users at day offsets 0..7. The cohort day
    // is a min() window over user_id — again one exchange shared with
    // the event-side filter — and the matrix aggregate shuffles on
    // (cohort_day, day_offset), a key space bounded by days x 8, so the
    // final reduce is tiny no matter the corpus size.
    QueryDef(
      "q35_retention",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        eventsWithSec(s, dir)
          .select(col("user_id"), expr("sec div 86400").as("day"))
          .withColumn("cohort_day", min("day").over(w))
          .withColumn("day_offset", col("day") - col("cohort_day"))
          .filter(col("day_offset") <= 7)
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some("""WITH e AS (
             |  SELECT user_id,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
             |  FROM events),
             |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
             |SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
             |FROM e JOIN c USING (user_id)
             |WHERE e.day - c.cohort_day <= 7
             |GROUP BY 1, 2""".stripMargin)),

    // Snowflake star join: the fact table against a chain of three
    // GENUINELY broadcast-scale dimensions (supplier is SF·10k rows,
    // nation 25, region 5 — all dwarfed by the fact at ANY scale, unlike
    // part/customer which outgrow broadcast). The plan must be three
    // BroadcastHashJoins over ONE pruned scan of lineitem — zero
    // shuffles before the final aggregation (PlanSpec-asserted). This is
    // the canonical OLAP shape Catalyst should get right without hints
    // beyond the explicit broadcast on the dimension chain.
    QueryDef(
      "q34_star_join",
      (s, dir) => {
        // nation/region are FIXED-size dims (25/5 rows at any SF) — hint
        // them. supplier GROWS with the corpus, so its broadcast is left
        // to the planner's size statistics (BroadcastHashJoin at the SFs
        // where it fits, shuffled join when it doesn't — the same guard
        // AQE re-checks at runtime); an unconditional broadcast() hint
        // here would force a driver collect of a data-sized dim at
        // 100 TB (BroadcastLintSpec polices exactly this).
        val dims =
          table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
            .join(broadcast(table(s, dir, "nation")
              .select("n_nationkey", "n_regionkey", "n_name")),
              col("s_nationkey") === col("n_nationkey"))
            .join(broadcast(table(s, dir, "region")
              .select("r_regionkey", "r_name")),
              col("n_regionkey") === col("r_regionkey"))
            .select("s_suppkey", "n_name", "r_name")
        table(s, dir, "lineitem")
          .select("l_suppkey", "l_quantity")
          .join(dims, col("l_suppkey") === col("s_suppkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast(LongType)).as("sum_qty"))
      },
      Some("""SELECT r_name, n_name,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2""".stripMargin)),

    // The band join AGAIN, but through the whole-operator Catalyst
    // extension (graft.plans.NativeRangeJoin): a custom LogicalPlan
    // lowered by an injected SparkStrategy to BroadcastRangeJoinExec —
    // time-sorted broadcast of the small side, per-row binary search on
    // the big side, ZERO shuffle and zero replication (vs q24's 3x
    // bucket-replica equi-join rewrite of the same semantics). Identical
    // oracle to q24: two implementations, one truth.
    QueryDef(
      "q35_range_join_native",
      (s, dir) => {
        val e = eventsWithSec(s, dir)
          .select(col("user_id"), col("sec"), col("event_id"))
        val a = e.select(col("user_id"), col("sec").as("sec_a"),
          col("event_id").as("id_a"))
        val b = e.select(col("user_id").as("user_id_b"),
          col("sec").as("sec_b"), col("event_id").as("id_b"))
        graft.plans.NativeRangeJoin.bandJoin(a, b,
            "user_id", "sec_a", "user_id_b", "sec_b", 300L)
          .filter(col("id_a") < col("id_b"))
          .select("user_id", "id_a", "id_b", "sec_a", "sec_b")
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
             |  FROM events)
             |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
             |  a.sec AS sec_a, b.sec AS sec_b
             |FROM e a JOIN e b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             |  AND abs(a.sec - b.sec) <= 300""".stripMargin)),

    // q14's AS-OF semantics through the whole-operator extension: the
    // broadcast floor-probe physical node (one binary search per left
    // row, LEFT-join nulls on no match, loud duplicate-(key,time)
    // rejection) against DuckDB's native ASOF LEFT JOIN — the same
    // oracle as the union+window formulation, so all THREE
    // implementations (window rewrite, DuckDB native, graft native)
    // certify each other.
    QueryDef(
      "q36_asof_native",
      (s, dir) => {
        val e = eventsWithSec(s, dir)
          .select(col("user_id"), col("sec"), col("event_id"), col("value"))
        val l = e.filter(col("event_id") % 5 === 0)
          .select("user_id", "sec", "event_id")
        val rw = Window.partitionBy("user_id", "sec").orderBy(desc("event_id"))
        val r = e.filter(col("event_id") % 5 =!= 0)
          .withColumn("_rn", row_number().over(rw)).filter(col("_rn") === 1)
          .select(col("user_id").as("user_id_r"), col("sec").as("sec_r"),
            col("event_id").as("event_id_asof"), col("value").as("value_asof"))
        graft.plans.NativeRangeJoin.asOfJoin(l, r,
            "user_id", "sec", "user_id_r", "sec_r")
          .select("user_id", "sec", "event_id", "event_id_asof", "value_asof")
      },
      Some("""WITH l AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
             |  FROM events WHERE event_id % 5 = 0),
             |r AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             |    event_id, value
             |  FROM events WHERE event_id % 5 <> 0
             |  QUALIFY row_number() OVER (PARTITION BY user_id,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) ORDER BY event_id DESC) = 1)
             |SELECT l.user_id, l.sec, l.event_id,
             |  r.event_id AS event_id_asof, r.value AS value_asof
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.sec >= r.sec""".stripMargin)),

    // The band join a THIRD way: plain declarative join syntax — no
    // operator API at all — upgraded to the native broadcast range
    // operator by the RewriteRangeJoin optimizer rule (the same
    // users-write-idioms-and-get-kernels contract as RewriteDotProduct).
    // Same oracle as q24/q35: three spellings, one truth.
    QueryDef(
      "q37_range_join_auto",
      (s, dir) => {
        val e = eventsWithSec(s, dir)
          .select(col("user_id"), col("sec"), col("event_id"))
        val a = e.select(col("user_id"), col("sec").as("sec_a"),
          col("event_id").as("id_a"))
        val b = e.select(col("user_id").as("user_id_b"),
          col("sec").as("sec_b"), col("event_id").as("id_b"))
        a.join(b, col("user_id") === col("user_id_b") &&
            abs(col("sec_a") - col("sec_b")) <= lit(300L))
          .filter(col("id_a") < col("id_b"))
          .select(col("user_id"), col("id_a").as("id_a"),
            col("id_b").as("id_b"), col("sec_a"), col("sec_b"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
             |  FROM events)
             |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
             |  a.sec AS sec_a, b.sec AS sec_b
             |FROM e a JOIN e b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             |  AND abs(a.sec - b.sec) <= 300""".stripMargin)),

    // RECURSIVE CTE (Spark 4.x WITH RECURSIVE): the calendar-spine
    // gap-filling query every reporting layer needs — generate every
    // month between the corpus' min and max order date RECURSIVELY
    // (no month can be absent because no orders fell in it) and
    // left-join the monthly counts. Recursion depth = month span
    // (~80), bounded and explicit via the session recursion limit;
    // the spine is driver-tiny however large the fact table is. The
    // stop bound rides IN the recursion state — a recursive leg that
    // re-joins the `bounds` CTE re-scans and re-aggregates the fact
    // table on EVERY iteration (measured: 10.9 s at sf0.1 vs ~1 s with
    // the bound carried as state).
    QueryDef(
      "q38_recursive_spine",
      (s, dir) => {
        // Depth is the ~80-month span — inside Spark's default
        // cteRecursionLevelLimit of 100, so the session's runaway-
        // recursion guard stays untouched (raising it globally would
        // silently weaken the loud-failure bound for every other
        // recursive query on the shared session).
        table(s, dir, "orders").createOrReplaceTempView("q38_orders")
        s.sql("""
          WITH RECURSIVE bounds AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
            FROM q38_orders),
          spine(mon, hi) AS (
            SELECT lo, hi FROM bounds
            UNION ALL
            SELECT add_months(mon, 1), hi FROM spine WHERE mon < hi),
          monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
              count(*) AS n_orders
            FROM q38_orders GROUP BY 1)
          SELECT date_format(mon, 'yyyy-MM') AS month,
            CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
          FROM spine LEFT JOIN monthly USING (mon)""")
      },
      Some("""WITH RECURSIVE bounds AS (
             |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
             |         CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
             |  FROM orders),
             |spine(mon, hi) AS (
             |  SELECT lo, hi FROM bounds
             |  UNION ALL
             |  SELECT CAST(mon + INTERVAL 1 MONTH AS DATE), hi
             |  FROM spine WHERE mon < hi),
             |monthly AS (
             |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             |    CAST(count(*) AS BIGINT) AS n_orders
             |  FROM orders GROUP BY 1)
             |SELECT strftime(mon, '%Y-%m') AS month,
             |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
             |FROM spine LEFT JOIN monthly USING (mon)""".stripMargin)),

    // LATERAL correlated subquery with ORDER BY + LIMIT: top-2
    // customers per nation spelled as the SQL-standard lateral join —
    // the declarative twin of the graft_topn heap aggregate and the
    // row_number window (q10/q23 family), here exercising Spark's
    // lateral-subquery planner end to end against DuckDB's.
    QueryDef(
      "q39_lateral_topk",
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("q39_customer")
        s.sql("""
          SELECT n.c_nationkey, t.c_custkey, t.c_acctbal
          FROM (SELECT DISTINCT c_nationkey FROM q39_customer) n,
          LATERAL (SELECT c_custkey, c_acctbal FROM q39_customer c
                   WHERE c.c_nationkey = n.c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""")
      },
      Some("""SELECT n.c_nationkey, t.c_custkey, t.c_acctbal
             |FROM (SELECT DISTINCT c_nationkey FROM customer) n,
             |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
             |         WHERE c.c_nationkey = n.c_nationkey
             |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t"""
        .stripMargin)),

    // UNPIVOT — the inverse of the a9/q6 pivot family: widen order
    // counts to one column per status (zero-filled, fixed vocabulary:
    // nulls would silently vanish in engines whose UNPIVOT drops them),
    // then melt back to (priority, status, n) long form with the
    // Dataset.unpivot API; the oracle replays it with DuckDB's native
    // UNPIVOT syntax, so both engines' melt semantics certify each
    // other. Wide-to-long is a metadata-only Expand — no shuffle beyond
    // the pivot aggregation itself.
    QueryDef(
      "q40_unpivot",
      (s, dir) => {
        val wide = table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("O"), lit(0L)).as("O"),
            coalesce(col("F"), lit(0L)).as("F"),
            coalesce(col("P"), lit(0L)).as("P"))
        wide.unpivot(
          Array(col("o_orderpriority")),
          Array(col("O"), col("F"), col("P")),
          "status", "n")
      },
      Some("""WITH wide AS (
             |  SELECT o_orderpriority,
             |    CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O'
             |      THEN 1 END), 0) AS BIGINT) AS "O",
             |    CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
             |      THEN 1 END), 0) AS BIGINT) AS "F",
             |    CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P'
             |      THEN 1 END), 0) AS BIGINT) AS "P"
             |  FROM orders GROUP BY 1)
             |SELECT o_orderpriority, status, n
             |FROM wide UNPIVOT (n FOR status IN ("O", "F", "P"))"""
        .stripMargin)),

    // NULL-SEMANTICS BATTERY: the corner where engines disagree by
    // DEFAULT and only explicit spelling aligns them — null-safe
    // equality (Spark `<=>` vs SQL-standard IS NOT DISTINCT FROM),
    // explicit NULLS FIRST ordering (Spark's ASC default is NULLS
    // FIRST, DuckDB's is NULLS LAST — the unspelled query would
    // hash-mismatch), COALESCE chains and NULLIF. A dedup/reconcile
    // engine lives on these semantics (the reference's `_merge`
    // markers and null-keeps-row quirks), so they deserve their own
    // oracle row, not just incidental coverage. The global NULLS
    // FIRST rank is EXACT but never single-partition: the same
    // range-partition + P-row-offset device as tdp_quality_buckets
    // (range exchange carries the null ordering; each task ranks
    // ~n/P rows; the driver hop is P rows of counts, not data).
    QueryDef(
      "q41_null_semantics",
      (s, dir) => {
        RangeRank.rankedBy(s, dir, "q41_null_ranged",
          table(s, dir, "customer").select(col("c_custkey"),
            expr("CASE WHEN c_custkey % 3 = 0 THEN NULL" +
              " ELSE c_custkey % 7 END").as("a"),
            expr("CASE WHEN c_custkey % 5 = 0 THEN NULL" +
              " ELSE c_custkey % 7 END").as("b")),
          Nil, Seq(col("a").asc_nulls_first, col("c_custkey")),
          "rn_nulls_first").df
          .select(col("c_custkey"), col("a"), col("b"),
            expr("a <=> b").as("null_safe_eq"),
            coalesce(col("a"), col("b"), lit(-1L)).as("first_non_null"),
            expr("nullif(a, b)").as("null_if_equal"),
            col("rn_nulls_first"))
      },
      Some("""WITH d AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 3 = 0 THEN NULL
             |      ELSE c_custkey % 7 END AS a,
             |    CASE WHEN c_custkey % 5 = 0 THEN NULL
             |      ELSE c_custkey % 7 END AS b
             |  FROM customer)
             |SELECT c_custkey, a, b,
             |  (a IS NOT DISTINCT FROM b) AS null_safe_eq,
             |  coalesce(a, b, -1) AS first_non_null,
             |  nullif(a, b) AS null_if_equal,
             |  CAST(row_number() OVER (ORDER BY a ASC NULLS FIRST, c_custkey)
             |    AS BIGINT) AS rn_nulls_first
             |FROM d""".stripMargin)),

    // FIRST-ORDER MARKOV TRANSITION MATRIX over per-user event
    // sequences — the user-journey model behind funnel design and
    // next-action prediction. The sequence step is a lag window
    // PARTITIONED BY USER (parallel across users, 1 row of state;
    // ordering key (sec, event_id) is a total order, so the previous
    // event is engine-independent); transition counts and the
    // per-source normalization are narrow-key aggregates over the
    // event-type alphabet (|types|^2 = 25 cells here — alphabet-sized,
    // never data-sized). Probabilities ship as integer permille so the
    // one division per cell is exact in both engines.
    QueryDef(
      "q42_markov_chain",
      (s, dir) => {
        val wU = Window.partitionBy("user_id")
          .orderBy(col("sec"), col("event_id"))
        val tr = eventsWithSec(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("sec"))
          .withColumn("prev_type", lag("event_type", 1).over(wU))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        tr.withColumn("row_total",
          sum("n").over(Window.partitionBy("prev_type")))
          .select(col("prev_type"), col("next_type"), col("n"),
            expr("n * 1000 div row_total").as("permille"))
      },
      Some("""WITH mev AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |mtr AS (
             |  SELECT lag(event_type) OVER (
             |      PARTITION BY user_id ORDER BY sec, event_id)
             |      AS prev_type,
             |    event_type AS next_type
             |  FROM mev),
             |mct AS (
             |  SELECT prev_type, next_type, count(*) AS n
             |  FROM mtr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
             |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
             |  CAST(CAST(n AS BIGINT) * 1000
             |    // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
             |    AS BIGINT) AS permille
             |FROM mct""".stripMargin)),

    // GAPS-AND-ISLANDS activity profile: per user, contiguous active-day
    // streaks via the classic (day - row_number) island key — the
    // engagement/churn shape every retention team computes. Both windows
    // are PARTITIONED BY USER; the streak and span aggregates land on
    // the same user_id hash partitioning, so the final join moves no
    // data under AQE. Day ordinals come from the type-adaptive epoch
    // seconds (integer div), never a timezone-dependent date cast.
    QueryDef(
      "q43_gap_islands",
      (s, dir) => {
        val days = eventsWithSec(s, dir)
          .select(col("user_id"), expr("sec div 86400").as("day"))
          .distinct()
        val wU = Window.partitionBy("user_id").orderBy("day")
        val streaks = days
          .withColumn("island", col("day") - row_number().over(wU))
          .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
        val spans = days.groupBy("user_id")
          .agg((max("day") - min("day") + 1).as("span_days"))
        streaks.groupBy("user_id")
          .agg(sum("len").as("n_active_days"),
            count(lit(1)).as("n_streaks"),
            max("len").as("longest_streak"))
          .join(spans, Seq("user_id"))
          .select(col("user_id"), col("n_active_days"), col("span_days"),
            (col("span_days") - col("n_active_days")).as("n_gap_days"),
            col("n_streaks"), col("longest_streak"))
      },
      Some("""WITH gdy AS (
             |  SELECT DISTINCT user_id,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
             |  FROM events),
             |gis AS (
             |  SELECT user_id,
             |    day - row_number() OVER (
             |      PARTITION BY user_id ORDER BY day) AS island
             |  FROM gdy),
             |gst AS (
             |  SELECT user_id, island, count(*) AS len
             |  FROM gis GROUP BY 1, 2),
             |gsp AS (
             |  SELECT user_id, max(day) - min(day) + 1 AS span_days
             |  FROM gdy GROUP BY 1),
             |gag AS (
             |  SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
             |    CAST(count(*) AS BIGINT) AS n_streaks,
             |    CAST(max(len) AS BIGINT) AS longest_streak
             |  FROM gst GROUP BY 1)
             |SELECT g.user_id, g.n_active_days, p.span_days,
             |  p.span_days - g.n_active_days AS n_gap_days,
             |  g.n_streaks, g.longest_streak
             |FROM gag g JOIN gsp p USING (user_id)""".stripMargin)),

    // EWMA ANOMALY SCAN: exponentially-weighted moving average of each
    // user's daily event count with a 2x-spike flag — the sequential
    // recurrence (ewma' = 0.9*ewma + 0.1*x) that windows can't express.
    // The device: a user's (day, count) points pack into single BIGINTs
    // (day*2^36 + count), sort_array makes the collected list
    // ORDER-DETERMINISTIC (collect_list alone is not), and one
    // `aggregate` lambda folds the recurrence in integer milli-units
    // with the running anomaly count packed into the same accumulator
    // (acc = ewma_milli*8192 + n_anom) — so the whole scan is one
    // groupBy plus a bounded per-user fold. The list is CALENDAR-
    // bounded (<= days in the observation window, 30 here), not
    // data-sized: at 100 TB each user still folds <= |days| elements.
    // Packing bounds, ENFORCED not assumed: the per-user-per-day count
    // saturates at 2^36-1 (~6.9e10 — a single user exceeding that in
    // one day is past any real feed, and EWMA saturation is then the
    // right behavior) so cnt can never bleed into the day field of the
    // sort key, epoch-day*2^36 ~ 1.4e15 stays far under the Long
    // ceiling, worst-case acc = (2^36-1)*1000*8192 + 8191 ~ 5.6e17 <
    // 2^63, and the n_anom field holds < 8192 anomaly days (= 22 years
    // of daily anomalies; the calendar bound that sizes the list also
    // sizes this field). Both engines saturate identically, so the
    // cross-engine hash grades the saturating operator exactly.
    QueryDef(
      "q44_ewma_anomaly",
      (s, dir) => {
        val daily = eventsWithSec(s, dir)
          .select(col("user_id"), expr("sec div 86400").as("day"))
          .groupBy("user_id", "day").agg(count(lit(1)).as("cnt"))
        daily.groupBy("user_id")
          .agg(sort_array(collect_list(
            expr("day * 68719476736 + least(cnt, 68719476735)")))
            .as("arr"))
          .select(col("user_id"), size(col("arr")).cast(LongType)
            .as("n_days"),
            expr("""aggregate(
                   |  slice(arr, 2, size(arr) - 1),
                   |  (element_at(arr, 1) % 68719476736) * 8192000,
                   |  (acc, v) ->
                   |    ((9 * (acc div 8192) + (v % 68719476736) * 1000)
                   |        div 10)
                   |      * 8192
                   |    + acc % 8192
                   |    + (CASE WHEN (v % 68719476736) * 1000
                   |            > 2 * (acc div 8192)
                   |       THEN 1 ELSE 0 END))""".stripMargin)
              .as("packed"))
          .select(col("user_id"), col("n_days"),
            expr("packed div 8192").as("ewma_final_milli"),
            expr("packed % 8192").as("n_anomaly_days"))
      },
      Some("""WITH wdy AS (
             |  SELECT user_id,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |wag AS (
             |  SELECT user_id,
             |    list_sort(list(day * 68719476736
             |      + least(cnt, 68719476735))) AS arr
             |  FROM wdy GROUP BY 1),
             |wfd AS (
             |  SELECT user_id, CAST(len(arr) AS BIGINT) AS n_days,
             |    list_reduce(
             |      list_prepend((arr[1] % 68719476736) * 8192000,
             |        list_slice(arr, 2, len(arr))),
             |      (acc, v) ->
             |        ((9 * (acc // 8192) + (v % 68719476736) * 1000)
             |            // 10)
             |          * 8192
             |        + acc % 8192
             |        + (CASE WHEN (v % 68719476736) * 1000
             |               > 2 * (acc // 8192)
             |           THEN 1 ELSE 0 END)) AS packed
             |  FROM wag)
             |SELECT user_id, n_days,
             |  packed // 8192 AS ewma_final_milli,
             |  packed % 8192 AS n_anomaly_days
             |FROM wfd""".stripMargin)),

    // INTERVAL MERGE (overlapping-interval union): each event opens a
    // 300 s activity interval; per user, overlapping-or-touching
    // intervals coalesce and the query reports how many merged spans
    // remain, their total coverage and the longest — the sweep-line
    // shape (usage metering, session coverage, SLA downtime) that
    // gaps-and-islands (q43) does NOT cover because intervals have
    // EXTENT: two events 299 s apart chain into one span no matter how
    // many intervals bridge them. The sweep is one window pass per
    // user: running max of interval ends over PRECEDING rows marks a
    // new span exactly when the current start clears it, and a running
    // sum of those marks numbers the spans — no self-join, no
    // data-sized state beyond the per-user window Spark already
    // partitions by user_id (the same per-user frame q43/q12 ride; at
    // 100 TB the shuffle key is user_id and each task streams its
    // users' rows once, 1 running value of state). Ties sort by
    // (sec, event_id) in BOTH engines so every frame is deterministic.
    QueryDef(
      "q45_interval_merge",
      (s, dir) => {
        val ev = eventsWithSec(s, dir)
          .select(col("user_id"), col("event_id"), col("sec"))
        val wOrd = Window.partitionBy("user_id").orderBy("sec", "event_id")
        val isl = ev
          .withColumn("prev_end", max(col("sec") + 300).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("is_new",
            when(col("prev_end").isNull
              || col("sec") > col("prev_end"), 1L).otherwise(0L))
          .withColumn("island", sum("is_new").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        isl.groupBy("user_id", "island")
          .agg(min("sec").as("s0"), max(col("sec") + 300).as("e0"),
            count(lit(1)).as("ne"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("e0") - col("s0")).as("covered_sec"),
            max(col("e0") - col("s0")).as("longest_sec"),
            sum("ne").as("n_events"))
      },
      Some("""WITH imv AS (
             |  SELECT user_id, event_id,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |imp AS (
             |  SELECT user_id, event_id, sec,
             |    max(sec + 300) OVER (
             |      PARTITION BY user_id ORDER BY sec, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS prev_end
             |  FROM imv),
             |imi AS (
             |  SELECT user_id, sec,
             |    sum(CASE WHEN prev_end IS NULL OR sec > prev_end
             |        THEN 1 ELSE 0 END) OVER (
             |      PARTITION BY user_id ORDER BY sec, event_id
             |      ROWS UNBOUNDED PRECEDING) AS island
             |  FROM imp),
             |img AS (
             |  SELECT user_id, island, min(sec) AS s0,
             |    max(sec + 300) AS e0, CAST(count(*) AS BIGINT) AS ne
             |  FROM imi GROUP BY 1, 2)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
             |  CAST(sum(e0 - s0) AS BIGINT) AS covered_sec,
             |  CAST(max(e0 - s0) AS BIGINT) AS longest_sec,
             |  CAST(sum(ne) AS BIGINT) AS n_events
             |FROM img GROUP BY 1""".stripMargin)),

    // MANN-KENDALL TREND TEST per event type: S = sum over ordered day
    // pairs of sign(cnt_j - cnt_i), the nonparametric "is this metric
    // drifting?" monitor that needs no distribution assumption — the
    // drift-detection sibling of the EWMA spike scan (q44). Rides the
    // same device: daily counts pack into base-2^36 BIGINTs (count
    // saturated, so order and extraction survive any hot day),
    // sort_array fixes the fold order, and the O(days^2) pairwise sign
    // sum runs inside one codegen'd nested higher-order expression over
    // a CALENDAR-bounded list (<= |days|^2 comparisons per type — 435
    // for a 30-day window — regardless of corpus size; the only
    // data-sized stage is the map-side-combined daily count). Kendall
    // tau in micro units uses the sign-explicit truncated division both
    // engines agree on (S can be negative; Spark div truncates, DuckDB
    // // floors).
    QueryDef(
      "q46_trend_test",
      (s, dir) => {
        val daily = eventsWithSec(s, dir)
          .select(col("event_type"), expr("sec div 86400").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(
            expr("day * 68719476736 + least(cnt, 68719476735)")))
            .as("arr"))
          .select(col("event_type"),
            size(col("arr")).cast(LongType).as("n_days"),
            expr("""CASE WHEN size(arr) < 2 THEN 0L ELSE
                   |  aggregate(
                   |    transform(sequence(2, size(arr)), j ->
                   |      aggregate(slice(arr, 1, j - 1), 0L, (acc, v) ->
                   |        acc + (CASE
                   |          WHEN element_at(arr, j) % 68719476736
                   |             > v % 68719476736 THEN 1
                   |          WHEN element_at(arr, j) % 68719476736
                   |             < v % 68719476736 THEN -1
                   |          ELSE 0 END))),
                   |    0L, (a, x) -> a + x) END""".stripMargin)
              .as("s_stat"))
          .withColumn("n_pairs", expr("n_days * (n_days - 1) div 2"))
          .withColumn("tau_micro", expr(
            "CASE WHEN s_stat >= 0" +
              " THEN (s_stat * 1000000) div greatest(n_pairs, 1)" +
              " ELSE -((-s_stat * 1000000) div greatest(n_pairs, 1)) END"))
          .withColumn("trend",
            when(col("s_stat") > 0, "rising")
              .when(col("s_stat") < 0, "falling").otherwise("flat"))
      },
      Some("""WITH mkd AS (
             |  SELECT event_type,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |mka AS (
             |  SELECT event_type,
             |    list_sort(list(day * 68719476736
             |      + least(cnt, 68719476735))) AS arr
             |  FROM mkd GROUP BY 1),
             |mks AS (
             |  SELECT event_type, CAST(len(arr) AS BIGINT) AS n_days,
             |    CAST(CASE WHEN len(arr) < 2 THEN 0 ELSE
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(range(2, len(arr) + 1), jj ->
             |          list_reduce(list_prepend(CAST(0 AS BIGINT),
             |            list_transform(list_slice(arr, 1, jj - 1), vv ->
             |              CAST(CASE
             |                WHEN arr[jj] % 68719476736
             |                   > vv % 68719476736 THEN 1
             |                WHEN arr[jj] % 68719476736
             |                   < vv % 68719476736 THEN -1
             |                ELSE 0 END AS BIGINT))),
             |            (aa, xx) -> aa + xx))),
             |        (a2, x2) -> a2 + x2) END AS BIGINT) AS s_stat
             |  FROM mka)
             |SELECT event_type, n_days, s_stat,
             |  n_days * (n_days - 1) // 2 AS n_pairs,
             |  CAST(CASE WHEN s_stat >= 0
             |    THEN (s_stat * 1000000) // greatest(n_days * (n_days - 1)
             |      // 2, 1)
             |    ELSE -((-s_stat * 1000000) // greatest(n_days
             |      * (n_days - 1) // 2, 1)) END AS BIGINT) AS tau_micro,
             |  CASE WHEN s_stat > 0 THEN 'rising'
             |    WHEN s_stat < 0 THEN 'falling'
             |    ELSE 'flat' END AS trend
             |FROM mks""".stripMargin)),

    // THEIL-SEN SLOPE per event type: the robust trend ESTIMATOR paired
    // with q46's Mann-Kendall trend TEST — the lower median over all
    // ordered day pairs of (cnt_j - cnt_i) / (day_j - day_i), immune to
    // outlier days a least-squares fit would chase. Same scale device
    // as q46: daily counts pack into base-2^36 BIGINTs (count
    // saturated), the only data-sized stage is the map-side-combined
    // daily count, and the O(days^2) pairwise slopes materialize inside
    // one codegen'd higher-order expression over a CALENDAR-bounded
    // list (~435 slopes for a 30-day window; a decade of retention is
    // ~6.6M 8-byte slopes per type — beyond that, window the calendar
    // or pair-sample). Slopes are exact integer micro-units via the
    // sign-explicit truncated division both engines agree on; days are
    // distinct after the group-by so every denominator is >= 1, and
    // |dc|*1e6 < 2^36 * 1e6 < 2^56 cannot overflow. The median is the
    // ascending sort's element (n_pairs + 1) div 2 — the LOWER median,
    // deterministic in both engines with no float interpolation.
    QueryDef(
      "q47_theil_sen",
      (s, dir) => {
        val daily = eventsWithSec(s, dir)
          .select(col("event_type"), expr("sec div 86400").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(
            expr("day * 68719476736 + least(cnt, 68719476735)")))
            .as("arr"))
          .select(col("event_type"),
            size(col("arr")).cast(LongType).as("n_days"),
            expr("CAST(size(arr) AS BIGINT) * (size(arr) - 1) div 2")
              .as("n_pairs"),
            expr("""CASE WHEN size(arr) < 2 THEN 0L ELSE
                   |  element_at(
                   |    array_sort(flatten(
                   |      transform(sequence(2, size(arr)), j ->
                   |        transform(slice(arr, 1, j - 1), v -> CASE
                   |          WHEN element_at(arr, j) % 68719476736
                   |             >= v % 68719476736
                   |          THEN ((element_at(arr, j) % 68719476736
                   |                 - v % 68719476736) * 1000000)
                   |            div (element_at(arr, j) div 68719476736
                   |                 - v div 68719476736)
                   |          ELSE -(((v % 68719476736
                   |                 - element_at(arr, j) % 68719476736)
                   |                * 1000000)
                   |            div (element_at(arr, j) div 68719476736
                   |                 - v div 68719476736)) END)))),
                   |    CAST((size(arr) * (size(arr) - 1) div 2 + 1) div 2
                   |      AS INT)) END""".stripMargin)
              .as("slope_micro"))
      },
      Some("""WITH thd AS (
             |  SELECT event_type,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |tha AS (
             |  SELECT event_type,
             |    list_sort(list(day * 68719476736
             |      + least(cnt, 68719476735))) AS arr
             |  FROM thd GROUP BY 1)
             |SELECT event_type, CAST(len(arr) AS BIGINT) AS n_days,
             |  CAST(len(arr) AS BIGINT) * (len(arr) - 1) // 2 AS n_pairs,
             |  CAST(CASE WHEN len(arr) < 2 THEN 0 ELSE
             |    list_extract(list_sort(flatten(
             |      list_transform(range(2, len(arr) + 1), jj ->
             |        list_transform(list_slice(arr, 1, jj - 1), vv ->
             |          CAST(CASE
             |            WHEN arr[jj] % 68719476736 >= vv % 68719476736
             |            THEN ((arr[jj] % 68719476736
             |                   - vv % 68719476736) * 1000000)
             |              // (arr[jj] // 68719476736
             |                   - vv // 68719476736)
             |            ELSE -(((vv % 68719476736
             |                   - arr[jj] % 68719476736) * 1000000)
             |              // (arr[jj] // 68719476736
             |                   - vv // 68719476736)) END
             |            AS BIGINT))))),
             |      (len(arr) * (len(arr) - 1) // 2 + 1) // 2)
             |    END AS BIGINT) AS slope_micro
             |FROM tha""".stripMargin)),

    // CHANGE-POINT SCAN per event type: the split day k maximizing the
    // scaled cumulative deviation |N*S_k - k*T| (S_k = events through
    // day k, T = total, N = n_days) — the exact integer form of the
    // CUSUM / binary-segmentation first-split statistic, the "WHEN did
    // this metric shift?" companion to q46's "IS it drifting?". One
    // map-side-combined daily count, then three window passes over the
    // per-type day series (running sum + per-partition totals + the
    // argmax row_number), all partitioned by event_type — no self-join,
    // no data-sized driver state, and the window rows are
    // CALENDAR-bounded per type regardless of corpus size. N*S_k <=
    // n_days * total keeps BIGINT exact through ~10^14 events per type
    // on a decade calendar (beyond that, widen to DECIMAL(38,0) as
    // tdp_t_closeness does). Ties break (stat DESC, day ASC) via
    // row_number in BOTH engines; single-day types have no interior
    // split and are dropped by k <= N-1 in both engines. The split
    // means are exact micro-units (counts are non-negative, plain div).
    QueryDef(
      "q48_changepoint",
      (s, dir) => {
        val daily = eventsWithSec(s, dir)
          .select(col("event_type"), expr("sec div 86400").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        val wRun = Window.partitionBy("event_type").orderBy("day")
        val wAll = Window.partitionBy("event_type")
        val scanned = daily
          .withColumn("k", row_number().over(wRun).cast(LongType))
          .withColumn("s_k", sum("cnt").over(
            wRun.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n_days", count(lit(1)).over(wAll))
          .withColumn("total", sum("cnt").over(wAll))
          .filter(col("k") <= col("n_days") - 1)
          .withColumn("stat",
            abs(col("n_days") * col("s_k") - col("k") * col("total")))
        val wBest = Window.partitionBy("event_type")
          .orderBy(desc("stat"), col("day"))
        scanned.withColumn("rk", row_number().over(wBest))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("n_days"), col("total"),
            col("day").as("split_day"), col("stat").as("cusum_stat"),
            expr("s_k * 1000000 div k").as("left_mean_micro"),
            expr("(total - s_k) * 1000000 div (n_days - k)")
              .as("right_mean_micro"))
      },
      Some("""WITH cpd AS (
             |  SELECT event_type,
             |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |cps AS (
             |  SELECT event_type, day,
             |    CAST(row_number() OVER w AS BIGINT) AS k,
             |    sum(cnt) OVER (PARTITION BY event_type ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS s_k,
             |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
             |      AS n_days,
             |    sum(cnt) OVER (PARTITION BY event_type) AS total
             |  FROM cpd
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
             |cpt AS (
             |  SELECT event_type, day, k,
             |    CAST(s_k AS BIGINT) AS s_k, n_days,
             |    CAST(total AS BIGINT) AS total,
             |    abs(n_days * CAST(s_k AS BIGINT)
             |      - k * CAST(total AS BIGINT)) AS stat
             |  FROM cps WHERE k <= n_days - 1),
             |cpr AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type
             |    ORDER BY stat DESC, day) AS rk
             |  FROM cpt)
             |SELECT event_type, n_days, total, day AS split_day,
             |  stat AS cusum_stat,
             |  s_k * 1000000 // k AS left_mean_micro,
             |  (total - s_k) * 1000000 // (n_days - k)
             |    AS right_mean_micro
             |FROM cpr WHERE rk = 1""".stripMargin)),

    // IGNORE NULLS window navigation: first_value / last_value /
    // nth_value with null skipping — the gap-fill idiom behind
    // "carry the last known reading forward" analytics, and a
    // cross-engine semantics trap (frame defaults differ: last_value
    // needs the full-frame override or it degenerates to the current
    // row). Nulls are planted by the q41 modulus pattern; windows
    // partition by c_custkey div 20 — BOUNDED ≤20-row frames on a
    // high-cardinality key, so the operator scales as a plain keyed
    // window (no data-sized partition anywhere).
    QueryDef(
      "q49_ignore_nulls",
      (s, dir) => {
        val base = table(s, dir, "customer").select(col("c_custkey"),
          expr("c_custkey div 20").as("grp"),
          expr("CASE WHEN c_custkey % 3 = 0 THEN NULL" +
            " ELSE c_custkey % 7 END").as("a"))
        val wRun = Window.partitionBy("grp").orderBy("c_custkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("grp").orderBy("c_custkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        base
          .withColumn("fv_nn", first(col("a"), ignoreNulls = true).over(wRun))
          .withColumn("lv_nn", last(col("a"), ignoreNulls = true).over(wAll))
          .withColumn("nv2_nn",
            nth_value(col("a"), 2, ignoreNulls = true).over(wRun))
          .withColumn("carry", last(col("a"), ignoreNulls = true).over(wRun))
      },
      Some("""SELECT c_custkey, c_custkey // 20 AS grp,
             |  CASE WHEN c_custkey % 3 = 0 THEN NULL
             |    ELSE c_custkey % 7 END AS a,
             |  first_value(a IGNORE NULLS) OVER wr AS fv_nn,
             |  last_value(a IGNORE NULLS) OVER (
             |    PARTITION BY c_custkey // 20 ORDER BY c_custkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |    AS lv_nn,
             |  nth_value(a, 2 IGNORE NULLS) OVER wr AS nv2_nn,
             |  last_value(a IGNORE NULLS) OVER wr AS carry
             |FROM (SELECT c_custkey,
             |        CASE WHEN c_custkey % 3 = 0 THEN NULL
             |          ELSE c_custkey % 7 END AS a
             |      FROM customer)
             |WINDOW wr AS (PARTITION BY c_custkey // 20 ORDER BY c_custkey
             |  ROWS UNBOUNDED PRECEDING)""".stripMargin)),
  )
}
