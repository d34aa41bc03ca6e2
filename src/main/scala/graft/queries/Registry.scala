package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{AggFns, TextFns, TimeFns, VectorFns}
import graft.operators.{Dedup, Relational, Sessions, Similarity}

/** Every operator from SURVEY.md §2 plus the training-data extensions
  * (dedup, similarity search, text analysis, multimodal), each exposed as
  * a named query over the harness testdata with a DuckDB oracle.
  *
  * Determinism rules applied throughout (so Spark and DuckDB hash-match):
  *  - every query ends in a total ORDER BY;
  *  - double sums go through decimal(30,10) ([[AggFns.dsum]]);
  *  - element-wise double arithmetic is identical IEEE expressions on both
  *    sides; folds are explicitly left-to-right on both sides;
  *  - hashes are md5 hex strings, never engine-private hash functions;
  *  - integer-ish outputs are cast to long (DuckDB counts are BIGINT).
  */
object Registry {

  private def l(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def o(s: SparkSession, d: String) = Tables.orders(s, d)
  private def c(s: SparkSession, d: String) = Tables.customer(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  private val D = "DECIMAL(30,10)"
  private def dsumSql(x: String) =
    s"CAST(ROUND(SUM(CAST($x AS $D)), 4) AS DOUBLE)"
  /** Oracle mirror of [[AggFns.dsumTimes]] (decimal-first product sum). */
  private def dsumTimesSql(a: String, b: String) =
    s"CAST(ROUND(SUM(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4))), 4) AS DOUBLE)"

  // ---------------------------------------------------------------- core

  /** A1/A2 + O2 over the big fact table: TPC-H Q1-shaped pricing summary.
    * Partial (map-side) aggregation + single shuffle on a 2-value key. */
  val q01PricingAgg = Q("q01_pricing_agg",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base,
       |  ${dsumTimesSql("l_extendedprice", "1 - l_discount")} AS sum_disc,
       |  ${dsumSql("l_quantity")} / COUNT(l_quantity) AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    l(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        AggFns.dsum(col("l_quantity")).as("sum_qty"),
        AggFns.dsum(col("l_extendedprice")).as("sum_base"),
        AggFns.dsumTimes(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc"),
        AggFns.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** W-filter + O1 sort + L1 limit: TopK pushed into TakeOrderedAndProject
    * (no global sort of the fact table). */
  val q02FilterSortLimit = Q("q02_filter_sort_limit",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem WHERE l_quantity >= 48
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (s, d) =>
    l(s, d).filter(col("l_quantity") >= 48)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** Multi-way join + agg (customer ⨝ orders ⨝ lineitem), pre-aggregated:
    * lineitem collapses to per-order partial revenue BEFORE any join, so
    * (a) the fact table shrinks ~4:1 before it touches the shuffle join,
    * and (b) COUNT(DISTINCT o_orderkey) degenerates to COUNT(*) on the
    * now-unique order rows — no expand, one fewer full-width aggregation.
    * Decimal sums re-associate exactly, so the two-level sum equals the
    * oracle's flat one (~25% faster at sf0.1, much more at 100 TB where
    * the expand doubles the joined fact rows). */
  val q03JoinAgg = Q("q03_join_agg",
    s"""SELECT c_mktsegment,
       |  ${dsumTimesSql("l_extendedprice", "1 - l_discount")} AS revenue,
       |  COUNT(DISTINCT o_orderkey) AS n_orders
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val D4 = org.apache.spark.sql.types.DecimalType(18, 4)
    val perOrder = l(s, d).groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(D4) *
        (lit(1) - col("l_discount")).cast(D4)).as("rev"))
    // no broadcast() hint on customer: it scales WITH the data (unlike a
    // true dim table) — AQE picks broadcast when its runtime size allows
    perOrder.join(o(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(c(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum(col("rev")), 4).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** J1 municipio semantics on testdata: broadcast lookup with fallback to
    * the raw key when unmatched (dim deliberately filtered to force
    * unmatched rows through the COALESCE path). */
  val q04LookupEnrich = Q("q04_lookup_enrich",
    """SELECT COALESCE(p_name, CAST(l_partkey AS VARCHAR)) AS enriched,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |LEFT JOIN (SELECT p_partkey, p_name FROM part WHERE p_size > 25) p
      |  ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Relational.lookupEnrich(
      l(s, d), Tables.part(s, d).filter(col("p_size") > 25),
      col("l_partkey"), "p_partkey", "p_name",
      "enriched", col("l_partkey").cast("string"))
      .groupBy("enriched").agg(count(lit(1)).as("cnt"))
      .orderBy("enriched")
  }

  /** U1 union-by-name with missing columns (reference pd.concat). */
  val q05UnionByName = Q("q05_union_by_name",
    s"""SELECT tag, COUNT(*) AS cnt, ${dsumSql("o_totalprice")} AS sum_price,
       |  COUNT(o_orderpriority) AS n_pri
       |FROM (
       |  SELECT o_orderkey, o_totalprice, 'high' AS tag FROM orders
       |  WHERE o_totalprice > 300000
       |  UNION ALL BY NAME
       |  SELECT o_orderkey, o_totalprice, o_orderpriority, 'low' AS tag
       |  FROM orders WHERE o_totalprice < 10000
       |) GROUP BY tag ORDER BY tag""".stripMargin) { (s, d) =>
    val hi = o(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("tag"))
    val lo = o(s, d).filter(col("o_totalprice") < 10000)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"), lit("low").as("tag"))
    Relational.unionAll(Seq(hi, lo)).get
      .groupBy("tag")
      .agg(count(lit(1)).as("cnt"),
        AggFns.dsum(col("o_totalprice")).as("sum_price"),
        count(col("o_orderpriority")).as("n_pri"))
      .orderBy("tag")
  }

  /** W1 with an open upper bound: null ts passes, null bound = open side. */
  val q06WithinPeriod = Q("q06_within_period",
    """SELECT event_type, COUNT(*) AS cnt FROM events
      |WHERE ts IS NULL OR ts >= TIMESTAMP '2024-01-20 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d).filter(Relational.withinPeriod(
      col("ts"),
      to_timestamp(lit("2024-01-20 00:00:00")),
      lit(null).cast("timestamp")))
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** Flagship A1/F7/O2: filing-hour histogram in São Paulo wall-clock.
    * Oracle note: SP is UTC-3 with no DST since 2019 and the events table
    * is entirely 2024, so `ts - INTERVAL 3 HOUR` is exact there. */
  val q07HourHistogram = Q("q07_hour_histogram",
    """SELECT CAST(EXTRACT(hour FROM ts - INTERVAL 3 HOUR) AS BIGINT) AS hora,
      |  COUNT(*) AS cnt
      |FROM events WHERE ts IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    ev(s, d).filter(col("ts").isNotNull)
      .groupBy(TimeFns.hourSp(col("ts")).as("hora"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("hora")
  }

  /** Agg extensions: min/max/deterministic-avg/exact distinct. */
  val q08StatsDistinct = Q("q08_stats_distinct",
    s"""SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS users,
       |  MIN(value) AS min_v, MAX(value) AS max_v,
       |  ${dsumSql("value")} / COUNT(value) AS avg_v
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("users"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        AggFns.davg(col("value")).as("avg_v"))
      .orderBy("event_type")
  }

  /** Window functions: top-3 orders per customer by price. */
  val q09WindowRank = Q("q09_window_rank",
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    o(s, d).withColumn("rn",
      row_number().over(Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Global top-N (TakeOrderedAndProject — never a full sort at scale). */
  val q10TopN = Q("q10_topn",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    o(s, d).select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** P1-analog: semi-structured JSON column flattened + aggregated.
    * Oracle extracts with a regex to avoid the DuckDB JSON extension. */
  val q11JsonExtract = Q("q11_json_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS n_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    ev(s, d).select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy("event_type")
  }

  /** F8 date reformat dd/MM/yyyy → yyyy-MM-dd (legacy e-SAJ semantics). */
  val q12DateReformat = Q("q12_date_reformat",
    """SELECT strftime(ts, '%d/%m/%Y') AS br, strftime(ts, '%Y-%m-%d') AS iso,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY iso""".stripMargin) { (s, d) =>
    ev(s, d)
      .select(date_format(col("ts"), "dd/MM/yyyy").as("br"))
      .withColumn("iso", TimeFns.reformatBrDate(col("br")))
      .groupBy("br", "iso").agg(count(lit(1)).as("cnt"))
      .orderBy("iso")
  }

  /** F4/K4: reference-shaped JSON serialization ([[codigo,"nome","iso"]]
    * array-of-arrays built by string concat — byte-identical on both
    * engines, unlike engine-native to_json). */
  val q13JsonShape = Q("q13_json_shape",
    """SELECT o_orderkey,
      |  '[[' || CAST(o_orderkey AS VARCHAR) || ',"' || o_orderstatus ||
      |  '","' || strftime(o_orderdate, '%Y-%m-%d') || '"]]' AS mov_json
      |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    o(s, d).filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        concat(lit("[["), col("o_orderkey").cast("string"), lit(",\""),
          col("o_orderstatus"), lit("\",\""),
          date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("\"]]")).as("mov_json"))
      .orderBy("o_orderkey")
  }

  /** F2/F3/O3: higher-order array ops — split, distinct, sort, join. */
  val q14ArrayOps = Q("q14_array_ops",
    """SELECT doc_id,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS sorted_words,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = array_distinct(split(col("text"), " "))
    docs(s, d).select(col("doc_id"),
      array_join(array_sort(w), ",").as("sorted_words"),
      size(w).cast("long").as("n_distinct"))
      .orderBy("doc_id")
  }

  /** Sessionization via lag + running sum (one shuffle on the user key). */
  val q15Sessionize = Q("q15_sessionize",
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL THEN 0
      |         WHEN date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1
      |         ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), s AS (
      |  SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM g)
      |SELECT user_id, CAST(MAX(sid) + 1 AS BIGINT) AS n_sessions
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Sessions.countPerUser(ev(s, d), "user_id", "ts", 1800L)
      .withColumn("n_sessions", col("n_sessions").cast("long"))
      .orderBy("user_id")
  }

  /** Tumbling-window counts — the batch face of the streaming operator
    * ([[graft.streaming.StreamingOps.tumblingCounts]]); window().start ==
    * date_trunc('hour'). */
  val q16TumblingWindow = Q("q16_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
      |  event_type, COUNT(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    graft.streaming.StreamingOps.tumblingCounts(ev(s, d), "ts", "event_type")
      .select(TimeFns.tsString(col("ws")).as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")
  }

  /** Left-semi join (EXISTS): customers having at least one big order. */
  val q17SemiJoin = Q("q17_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    c(s, d).join(
      o(s, d).filter(col("o_totalprice") > 400000),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no large order. The
    * predicate keeps the result non-empty on the harness data (every
    * customer has some order), so the check exercises real row flow. */
  val q18AntiJoin = Q("q18_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    c(s, d).join(o(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** ROLLUP with explicit subtotal labeling (no grouping_id — the CASE is
    * portable because the grouped columns are never null in the data). */
  val q19Rollup = Q("q19_rollup",
    s"""SELECT
       |  CAST(CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END +
       |       CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
       |  COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
       |  COUNT(*) AS cnt, ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, rf, ls""".stripMargin) { (s, d) =>
    l(s, d).rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), AggFns.dsum(col("l_quantity")).as("sum_qty"))
      .select(
        (when(col("l_returnflag").isNull, 2).otherwise(0) +
          when(col("l_linestatus").isNull, 1).otherwise(0)).cast("long").as("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"), col("sum_qty"))
      .orderBy("gid", "rf", "ls")
  }

  /** Pivot (wide aggregation) with explicit value list — null cells
    * coalesced to 0 to match the oracle's FILTER-count formulation. */
  val q20Pivot = Q("q20_pivot",
    """SELECT o_orderstatus,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS notspec,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val vals = Seq("1-URGENT" -> "urgent", "2-HIGH" -> "high",
      "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "notspec", "5-LOW" -> "low")
    val pivoted = o(s, d).groupBy("o_orderstatus")
      .pivot("o_orderpriority", vals.map(_._1)).count()
    pivoted.select(col("o_orderstatus") +: vals.map { case (v, alias) =>
      coalesce(col(s"`$v`"), lit(0L)).as(alias)
    }: _*).orderBy("o_orderstatus")
  }

  /** Rolling-frame window aggregate (moving 4-row sum per user) with the
    * decimal-exact sum discipline so frame recomputation order can't
    * produce engine-dependent floats. */
  val q21RollingWindow = Q("q21_rolling_window",
    """SELECT user_id, event_id,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS roll_sum
      |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-3, 0)
    ev(s, d).select(col("user_id"), col("event_id"),
      round(sum(col("value").cast(DecimalType(30, 10))).over(w), 4)
        .cast("double").as("roll_sum"))
      .orderBy("user_id", "event_id")
  }

  /** Exact interpolated percentiles per group (rank p·(n-1), linear
    * interpolation — the same definition as DuckDB quantile_cont). */
  val q22Percentiles = Q("q22_percentiles",
    """SELECT event_type,
      |  quantile_cont(value, 0.25) AS p25,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d).groupBy("event_type").agg(
      percentile(col("value"), lit(0.25)).as("p25"),
      percentile(col("value"), lit(0.5)).as("p50"),
      percentile(col("value"), lit(0.9)).as("p90"))
      .orderBy("event_type")
  }

  /** Sketch aggregates (HyperLogLog++ distinct, KLL-style quantile) made
    * hash-checkable: the sketch values themselves are engine-private, so
    * the row carries the EXACT twins (countDistinct / interpolated
    * percentile, which DuckDB reproduces bit-for-bit) plus deterministic
    * `within_bounds` booleans asserting the sketch landed inside its
    * published error envelope — HLL++ rsd 0.02 gets 3σ = 6% (floor of ±2
    * for tiny groups where the sparse encoding discretizes), and the
    * rank-error quantile sketch must land between the exact quantiles at
    * p±0.05 (accuracy 1000 ⇒ rank error 1e-3, 50× slack). The oracle
    * emits literal TRUE, so any sketch excursion flips the hash red. At
    * 100 TB the sketches are the only affordable forms; the exact columns
    * here are the test harness, not the production plan.
    *
    * Plan shape: the distinct-user family (exact count + HLL) runs as its
    * own two-level aggregation over (event_type, user_id) — map-side
    * dedup, then a 5-row rollup (the HLL state over deduped ids is
    * IDENTICAL to one over raw rows; HLL is duplicate-insensitive) —
    * joined back to the value-column aggregation on the tiny group key.
    * Mixing distinct and non-distinct aggregates in ONE groupBy instead
    * plans an Expand that doubles every row through the exchange and
    * drags the quantile sketch state across the expanded rows: measured
    * 3.7× slower at sf0.1, and the Expand is corpus-sized at 100 TB. */
  val q23ApproxDistinct = Q("q23_approx_distinct",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS users_within,
      |  TRUE AS p50_within
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val users = e.groupBy("event_type", "user_id").agg(count(lit(1)).as("_n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("_au"))
    val vals = e.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("_ap50"),
        // wide-slack [min, max] envelope for the p50 sketch: constant
        // aggregation state, unlike an exact-percentile bound that
        // buffers the whole group. The TIGHT sketch-vs-exact envelope
        // test lives in q42, which buffers exact percentiles as its
        // oracle OUTPUT anyway — paying that buffer again here doubled
        // this query's cost to harden a bound q42 already asserts.
        min(col("value")).as("_lo"), max(col("value")).as("_hi"))
    vals.join(users, Seq("event_type"))
      .select(col("event_type"), col("cnt"), col("exact_users"),
        (abs(col("_au") - col("exact_users")) <=
          greatest(col("exact_users").cast("double") * 0.06, lit(2.0)))
          .as("users_within"),
        (col("_ap50").between(col("_lo"), col("_hi")))
          .as("p50_within"))
      .orderBy("event_type")
  }

  val core: Seq[Q] = Seq(q01PricingAgg, q02FilterSortLimit, q03JoinAgg,
    q04LookupEnrich, q05UnionByName, q06WithinPeriod, q07HourHistogram,
    q08StatsDistinct, q09WindowRank, q10TopN, q11JsonExtract,
    q12DateReformat, q13JsonShape, q14ArrayOps, q15Sessionize,
    q16TumblingWindow, q17SemiJoin, q18AntiJoin, q19Rollup, q20Pivot,
    q21RollingWindow, q22Percentiles, q23ApproxDistinct)
}
