package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{AggFns, HeavyHitters}
import graft.operators.{Similarity, Skew, Temporal}

/** Round-2 operator extensions: as-of join, binned range join, set
  * operations, cube, full-outer join, salted aggregation. Same
  * determinism rules as [[Registry]]. */
object Registry2 {

  private def o(s: SparkSession, d: String) = Tables.orders(s, d)
  private def c(s: SparkSession, d: String) = Tables.customer(s, d)
  private def n(s: SparkSession, d: String) = Tables.nation(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** As-of join (last-click attribution): each view event matched to the
    * latest click by the same user at or before it. One shuffle on the
    * user key (union + running last — [[Temporal.asofJoinBackward]]);
    * DuckDB's native ASOF JOIN is the oracle. Right side is deduped per
    * (user, ts) with MAX(event_id) — the ASOF tie contract. */
  val q24AsofJoin = Q("q24_asof_join",
    """WITH v AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view' AND ts IS NOT NULL),
      |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2)
      |SELECT v.event_id, v.user_id, c.click_id,
      |  date_diff('second', c.ts, v.ts) AS gap_s
      |FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ts >= c.ts
      |ORDER BY v.event_id""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val views = e.filter(col("event_type") === "view" && col("ts").isNotNull)
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click" && col("ts").isNotNull)
      .groupBy("user_id", "ts").agg(max(col("event_id")).as("click_id"))
      .withColumnRenamed("ts", "click_ts")
    Temporal.asofJoinBackward(views, clicks, on = "user_id",
      leftTs = "ts", rightTs = "click_ts",
      rightVals = Seq("click_id", "click_ts"))
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("ts").cast("long") - col("click_ts").cast("long")).as("gap_s"))
      .orderBy("event_id")
  }

  /** Binned range join: orders classified into overlapping price bands
    * (intervals derived from nation so both engines build the identical
    * relation). The bin equi-join replaces the unbounded theta join. */
  val q25RangeJoin = Q("q25_range_join",
    s"""WITH bands AS (SELECT n_nationkey AS band_id,
       |    CAST(n_nationkey AS DOUBLE) * 20000.0 AS lo,
       |    CAST(n_nationkey AS DOUBLE) * 20000.0 + 39999.0 AS hi
       |  FROM nation)
       |SELECT band_id, COUNT(*) AS cnt,
       |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 4) AS DOUBLE) AS sum_price
       |FROM orders JOIN bands
       |  ON o_totalprice >= lo AND o_totalprice <= hi
       |GROUP BY band_id ORDER BY band_id""".stripMargin) { (s, d) =>
    val bands = n(s, d).select(col("n_nationkey").as("band_id"),
      (col("n_nationkey").cast("double") * 20000.0).as("lo"),
      (col("n_nationkey").cast("double") * 20000.0 + 39999.0).as("hi"))
    Temporal.rangeJoinBinned(o(s, d), "o_totalprice", bands, "lo", "hi",
      binWidth = 20000.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("cnt"), AggFns.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("band_id")
  }

  /** INTERSECT (distinct set semantics): customers that do have orders. */
  val q26Intersect = Q("q26_intersect",
    """SELECT c_custkey FROM customer
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    c(s, d).select("c_custkey")
      .intersect(o(s, d).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
  }

  /** EXCEPT (distinct set semantics): customer keys minus big-order keys. */
  val q27Except = Q("q27_except",
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    c(s, d).select("c_custkey")
      .except(o(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
  }

  /** CUBE over (event_type, day) with explicit subtotal labels — the q19
    * discipline (grouped cols pre-coalesced so the null-detection CASE is
    * unambiguous; ts-null rows land in a 'none' day bucket). */
  val q28Cube = Q("q28_cube",
    """WITH t AS (SELECT COALESCE(event_type, 'none') AS event_type,
      |    COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'none') AS day,
      |    value
      |  FROM events)
      |SELECT
      |  CAST(CASE WHEN event_type IS NULL THEN 2 ELSE 0 END +
      |       CASE WHEN day IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
      |  COALESCE(event_type, 'ALL') AS et, COALESCE(day, 'ALL') AS d,
      |  COUNT(*) AS cnt,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE) AS sum_v
      |FROM t GROUP BY CUBE (event_type, day)
      |ORDER BY gid, et, d""".stripMargin) { (s, d) =>
    val t = ev(s, d).select(
      coalesce(col("event_type"), lit("none")).as("event_type"),
      coalesce(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"),
        lit("none")).as("day"),
      col("value"))
    t.cube("event_type", "day")
      .agg(count(lit(1)).as("cnt"), AggFns.dsum(col("value")).as("sum_v"))
      .select(
        (when(col("event_type").isNull, 2).otherwise(0) +
          when(col("day").isNull, 1).otherwise(0)).cast("long").as("gid"),
        coalesce(col("event_type"), lit("ALL")).as("et"),
        coalesce(col("day"), lit("ALL")).as("d"),
        col("cnt"), col("sum_v"))
      .orderBy("gid", "et", "d")
  }

  /** FULL OUTER join of two derived relations, null-completing both sides
    * (the only outer-join shape q04/q18 don't already cover). */
  val q29FullOuter = Q("q29_full_outer",
    """WITH a AS (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
      |  WHERE o_custkey < 600 GROUP BY 1),
      |b AS (SELECT c_custkey AS k, c_name FROM customer
      |  WHERE c_custkey BETWEEN 300 AND 900)
      |SELECT COALESCE(a.k, b.k) AS k, a.n_orders, b.c_name
      |FROM a FULL JOIN b ON a.k = b.k
      |ORDER BY k""".stripMargin) { (s, d) =>
    val a = o(s, d).filter(col("o_custkey") < 600)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_orders"))
    val b = c(s, d).filter(col("c_custkey").between(300, 900))
      .select(col("c_custkey").as("bk"), col("c_name"))
    a.join(b, a("k") === b("bk"), "full_outer")
      .select(coalesce(a("k"), col("bk")).as("k"), col("n_orders"), col("c_name"))
      .orderBy("k")
  }

  /** Salted two-stage aggregation ([[Skew.saltedSumCount]]): identical
    * result to the plain GROUP BY oracle — proof the salting recombines
    * exactly — while the skewed key (event_type has ~5 values over 100k
    * rows: maximal skew) spreads over 8× the reducers. */
  val q30SaltedAgg = Q("q30_salted_agg",
    """SELECT event_type, COUNT(*) AS cnt,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE) AS sum_v
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Skew.saltedSumCount(ev(s, d), Seq("event_type"), "value", buckets = 8)
      .orderBy("event_type")
  }

  /** Misra-Gries heavy hitters ([[HeavyHitters]], custom typed
    * Aggregator). k=8 exceeds the event_type cardinality, so the sketch
    * is provably exact here and the plain-GROUP-BY oracle applies; at
    * k < distinct it degrades gracefully to guaranteed lower bounds. */
  val q31HeavyHitters = Q("q31_heavy_hitters",
    """SELECT event_type AS item, COUNT(*) AS cnt FROM events
      |WHERE event_type IS NOT NULL
      |GROUP BY 1 ORDER BY cnt DESC, item""".stripMargin) { (s, d) =>
    val hh = udaf(new HeavyHitters(8))
    ev(s, d).agg(hh(col("event_type")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("item"), col("h.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** DuckDB left-fold cosine (same shape as RegistryExt's). */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin
  private def sqlCos(a: String, b: String): String =
    s"""(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"""

  /** IVF ANN ([[Similarity.ivfTopKWith]]): 16 cells, 4 probes, top-3 —
    * since round 9 the CORPUS assignment rides the two-level routed
    * argmax (4 coarse routes over the 16 fine cells,
    * [[Similarity.ivfAssignTwoLevel]]): the production path once
    * centroids grow ∝ corpus, n × 2√C instead of n × C dots. Query
    * probing stays flat over all fine cells (queries are the small
    * broadcast side — flat recall is free there). The oracle rebuilds
    * the identical two-level index: fine→coarse routing, corpus→coarse,
    * within-route fine argmax, each with the same cosine fold and
    * score-then-higher-cell tie-break. */
  val annIvf = Q("ann_ivf_topk",
    s"""WITH cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS f_vec
       |  FROM embeddings WHERE vec_id < 16),
       |coarse AS (SELECT CAST(vec_id AS INT) AS ccell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 4),
       |routed AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM cent f CROSS JOIN coarse c) WHERE rn = 1),
       |c1 AS (SELECT vec_id, ccell, embedding FROM (
       |  SELECT b.vec_id, c.ccell, b.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${sqlCos("b.embedding", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM embeddings b CROSS JOIN coarse c) WHERE rn = 1),
       |asg AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT a.vec_id AS n_id, f.cell, a.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${sqlCos("a.embedding", "f.f_vec")} DESC, f.cell DESC) AS rn
       |  FROM c1 a JOIN routed f ON a.ccell = f.ccell) WHERE rn = 1),
       |probes AS (SELECT q_id, cell, q_vec FROM (
       |  SELECT q.vec_id AS q_id, c.cell, q.embedding AS q_vec,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCos("q.embedding", "c.f_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5) WHERE rn <= 4),
       |sc AS (SELECT q_id, n_id, ${sqlCos("p.q_vec", "a.n_vec")} AS cos
       |  FROM probes p JOIN asg a USING (cell) WHERE q_id <> n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER
       |  (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rnk FROM sc)
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val fine = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    val coarse = e.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("ccell"), col("embedding").as("c_vec"))
    Similarity.ivfTopKWith(e.filter(col("vec_id") < 5), e, fine,
      "vec_id", "embedding", k = 3, nProbe = 4, coarse = Some(coarse))
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** UNPIVOT (wide → long, the inverse of q20's pivot), oracle as the
    * portable UNION ALL expansion. */
  val q33Unpivot = Q("q33_unpivot",
    """SELECT * FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
      |    l_quantity AS val FROM lineitem WHERE l_orderkey < 200
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      |  FROM lineitem WHERE l_orderkey < 200
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey < 200)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") < 200)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .orderBy("l_orderkey", "l_linenumber", "measure")
  }

  /** lead/lag window navigation: previous event type and gap to the next
    * event per user ((ts, event_id) is a unique, deterministic order). */
  val q34LeadLag = Q("q34_lead_lag",
    """SELECT event_id, user_id,
      |  lag(event_type) OVER w AS prev_type,
      |  date_diff('second', ts, lead(ts) OVER w) AS next_gap_s
      |FROM events WHERE ts IS NOT NULL
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, d).filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        (lead(col("ts"), 1).over(w).cast("long") - col("ts").cast("long"))
          .as("next_gap_s"))
      .orderBy("event_id")
  }

  /** Value-based (RANGE) window frame: per-user running sum over the
    * trailing hour — the time-window companion to q21's ROWS frame.
    * Ordering key is WHOLE epoch seconds on both sides: Spark's
    * cast(ts as long) truncates sub-second precision, and DuckDB's
    * epoch() is a fractional DOUBLE, so the oracle truncates via
    * date_trunc before epoch — otherwise frame membership differs on
    * rows exactly ±3600.xx s apart (caught at sf0.1). */
  val q35RangeFrame = Q("q35_range_frame",
    """SELECT event_id, user_id,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))) OVER (
      |    PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts))
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS hour_sum
      |FROM events WHERE ts IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    ev(s, d).filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        round(sum(col("value").cast(DecimalType(30, 10))).over(w), 4)
          .cast("double").as("hour_sum"))
      .orderBy("event_id")
  }

  /** Collect-to-array aggregation made deterministic: the distinct event
    * types per user as a sorted joined string (collect_set/list is
    * unordered in every engine — sort before it leaves the engine). */
  val q36CollectSorted = Q("q36_collect_sorted",
    """SELECT user_id,
      |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types
      |FROM events WHERE event_type IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    ev(s, d).filter(col("event_type").isNotNull)
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"))
      .orderBy("user_id")
  }

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * per-type totals, per-day totals, and the grand total — but NOT the
    * (type, day) cross — in ONE aggregation pass. Runs through the SQL
    * face (the DataFrame API exposes only rollup/cube). */
  val q37GroupingSets = Q("q37_grouping_sets",
    """WITH t AS (SELECT COALESCE(event_type, 'none') AS event_type,
      |    COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'none') AS day
      |  FROM events)
      |SELECT
      |  CAST(CASE WHEN event_type IS NULL THEN 2 ELSE 0 END +
      |       CASE WHEN day IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
      |  COALESCE(event_type, 'ALL') AS et, COALESCE(day, 'ALL') AS d,
      |  COUNT(*) AS cnt
      |FROM t GROUP BY GROUPING SETS ((event_type), (day), ())
      |ORDER BY gid, et, d""".stripMargin) { (s, d) =>
    ev(s, d).select(
      coalesce(col("event_type"), lit("none")).as("event_type"),
      coalesce(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"),
        lit("none")).as("day"))
      .createOrReplaceTempView("events_gs")
    s.sql(
      """SELECT
        |  CAST(CASE WHEN event_type IS NULL THEN 2 ELSE 0 END +
        |       CASE WHEN day IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
        |  COALESCE(event_type, 'ALL') AS et, COALESCE(day, 'ALL') AS d,
        |  COUNT(*) AS cnt
        |FROM events_gs GROUP BY GROUPING SETS ((event_type), (day), ())
        |ORDER BY gid, et, d""".stripMargin)
  }

  val more: Seq[Q] = Seq(q24AsofJoin, q25RangeJoin, q26Intersect,
    q27Except, q28Cube, q29FullOuter, q30SaltedAgg, q31HeavyHitters,
    annIvf, q33Unpivot, q34LeadLag, q35RangeFrame, q36CollectSorted,
    q37GroupingSets)
}
