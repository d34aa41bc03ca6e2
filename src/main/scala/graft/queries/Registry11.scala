package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Sampling, Similarity}

/** Round-12 additions: the mixing faces a pretraining corpus plan needs
  * on top of raw token budgets — temperature-scaled source shares and
  * epoch upsampling — plus the two production faces the composed IVF-PQ
  * index was still missing: metadata-filtered search and incremental
  * ledger maintenance. */
object Registry11 {

  private def docTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("source"),
      graft.functions.TextFns.wsTokenCount(col("text")).cast("long")
        .as("n_tokens"))

  /** Shared oracle CTE: (doc_id, source, n_tokens) over documents. */
  private val sqlT =
    """t AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)""".stripMargin

  /** Temperature-scaled source mixing
    * ([[Sampling.temperatureBudgets]] → [[Sampling.tokenBudgetPerSource]]):
    * a 5000-token corpus budget split across sources ∝ √T_i (α = 0.5,
    * the standard flattening exponent), then each source admitted in
    * the deterministic draw order until ITS budget fills. The oracle
    * replays the integer share arithmetic exactly — ⌊√T_i · 2²⁰⌉ as
    * HUGEINT, integer-sum denominator, `//` floor division (sqrt is
    * IEEE-correctly-rounded in both engines; ×2²⁰ is a power-of-two
    * scale, exact) — then the same exclusive running sum as
    * `sample_token_budget`. */
  val mixTemperature = Q("mix_temperature",
    s"""WITH $sqlT,
       |tot AS (SELECT source, SUM(n_tokens) AS tt FROM t GROUP BY source),
       |sc AS (SELECT source, CAST(CAST(round(sqrt(CAST(tt AS DOUBLE)) * 1048576)
       |    AS BIGINT) AS HUGEINT) AS s FROM tot),
       |b AS (SELECT source, CAST((CAST(5000 AS HUGEINT) * s)
       |    // (SELECT SUM(s) FROM sc) AS BIGINT) AS budget FROM sc),
       |c AS (SELECT t.doc_id, t.source, t.n_tokens, b.budget,
       |    COALESCE(SUM(t.n_tokens) OVER (PARTITION BY t.source
       |      ORDER BY md5('graft:' || CAST(t.doc_id AS VARCHAR)), t.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM t JOIN b USING (source))
       |SELECT doc_id, source, n_tokens FROM c WHERE prior < budget
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = docTokens(s, d)
    val budgets = Sampling.temperatureBudgets(
      t, col("source"), col("n_tokens"), totalBudget = 5000L)
    Sampling.tokenBudgetPerSource(
      t, col("source"), col("doc_id"), col("n_tokens"), budgets)
      .orderBy("doc_id")
  }

  /** Epoch upsampling ([[Sampling.epochUpsample]]): per-source token
    * targets 800 + 500·(src# mod 7) against a maxEpochs = 2 cap — at
    * sf0.01 the targets land all three regimes (cap-bound full epochs
    * with remainder forced 0, one full epoch + partial, partial-only),
    * and one (doc, epoch) row rides out per admitted copy. The oracle
    * replays the integer epoch plan (`//` ≡ `div`, LEAST ≡ least), the
    * per-row `range` fan-out, and the partial epoch's exclusive running
    * sum. */
  val mixEpochs = Q("mix_epochs",
    s"""WITH $sqlT,
       |tot AS (SELECT source, SUM(n_tokens) AS tt FROM t GROUP BY source),
       |tg AS (SELECT source,
       |    800 + 500 * (CAST(substr(source, 4) AS BIGINT) % 7) AS tgt
       |  FROM tot),
       |pl AS (SELECT o.source, o.tt, g.tgt,
       |    LEAST(g.tgt // o.tt, 2) AS efull,
       |    CASE WHEN LEAST(g.tgt // o.tt, 2) < 2
       |         THEN g.tgt - LEAST(g.tgt // o.tt, 2) * o.tt
       |         ELSE 0 END AS rem
       |  FROM tot o JOIN tg g USING (source) WHERE o.tt > 0),
       |f AS (SELECT t.doc_id, t.source, t.n_tokens,
       |    unnest(range(0, CAST(p.efull AS BIGINT))) AS epoch
       |  FROM t JOIN pl p USING (source)),
       |c AS (SELECT t.doc_id, t.source, t.n_tokens, p.efull, p.rem,
       |    COALESCE(SUM(t.n_tokens) OVER (PARTITION BY t.source
       |      ORDER BY md5('graft:' || CAST(t.doc_id AS VARCHAR)), t.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM t JOIN pl p USING (source)),
       |pt AS (SELECT doc_id, source, n_tokens,
       |    CAST(efull AS BIGINT) AS epoch FROM c
       |  WHERE prior < rem)
       |SELECT doc_id, source, n_tokens, epoch FROM
       |  (SELECT * FROM f UNION ALL SELECT * FROM pt)
       |ORDER BY doc_id, epoch""".stripMargin) { (s, d) =>
    val t = docTokens(s, d)
    val targets = t.select(col("source")).distinct()
      .withColumn("target_tokens",
        lit(800L) + lit(500L) * (substring(col("source"), 4, 10).cast("long") % 7))
    Sampling.epochUpsample(t, col("source"), col("doc_id"), col("n_tokens"),
      targets, maxEpochs = 2)
      .orderBy("doc_id", "epoch")
  }

  /** Metadata-FILTERED IVF-PQ search: the corpus is pre-filtered on a
    * metadata predicate (label < 5 — a tenant / category / language
    * restriction) and the routed ADC scan runs over the surviving
    * partition only — the standard filtered-ANN production shape, where
    * the predicate composes BELOW the index scan (per-row cell
    * assignment is independent of the filter, so pre-filtering the
    * corpus frame ≡ post-filtering candidates, with the filter pushed
    * to the parquet scan under the encode projection). The oracle keeps
    * the full assignment CTE and restricts candidates by the same
    * predicate. */
  val annFilteredTopK = Q("ann_filtered_topk",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd",
            "JOIN embeddings m ON m.vec_id = a.n_id AND m.label < 5")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    Similarity.ivfPqTopK(e.filter(col("vec_id") < 5),
      e.filter(col("label") < 5), cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Incremental IVF-PQ index maintenance ([[Similarity.pqIndexBuild]]
    * → [[Similarity.pqIndexAppend]]): a stored ledger over vec_id < 30
    * extended with an at-least-once batch (vec_id ≥ 20 — the 20..29
    * overlap replays already-indexed vectors, which the anti-join must
    * drop) against the FROZEN centroids + codebook; the appended index
    * must be indistinguishable from a from-scratch rebuild of the whole
    * corpus, which is exactly what the oracle computes (full assignment
    * + codes). Codes leave the engine comma-joined (the q14/q36 array
    * convention). */
  val annIndexAppend = Q("ann_index_append",
    s"""WITH ${Registry10.sqlPqCodes},
       |cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${Registry10.sqlCos("b.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent c) WHERE rn = 1)
       |SELECT a.n_id AS vec_id, a.cell,
       |  array_to_string(list(CAST(n.code AS INT) ORDER BY n.sub), ',') AS codes
       |FROM asg a JOIN codes n ON n.n_id = a.n_id
       |GROUP BY a.n_id, a.cell ORDER BY vec_id""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val ledger = Similarity.pqIndexBuild(
      e.filter(col("vec_id") < 30), cent, cb, "vec_id", "embedding")
    Similarity.pqIndexAppend(ledger, e.filter(col("vec_id") >= 20),
      cent, cb, "vec_id", "embedding")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  /** Shared oracle CTE: 32-bit sign-pack halves per embedding — the
    * fold replays [[Similarity.binarySign]]'s acc·2 + bit exactly (32
    * bits per word keeps every intermediate < 2⁶³ in BOTH engines;
    * Spark's non-ANSI 64-bit fold would wrap silently where DuckDB
    * errors). */
  private val sqlSig =
    """sig AS (SELECT vec_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
      |      range(1, 33), i -> CAST(CASE WHEN embedding[i] >= 0 THEN 1
      |        ELSE 0 END AS BIGINT))), (a, b) -> a * 2 + b) AS b0,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
      |      range(33, 65), i -> CAST(CASE WHEN embedding[i] >= 0 THEN 1
      |        ELSE 0 END AS BIGINT))), (a, b) -> a * 2 + b) AS b1
      |  FROM embeddings),
      |h AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |    CAST(bit_count(xor(q.b0, n.b0))
      |       + bit_count(xor(q.b1, n.b1)) AS BIGINT) AS hamming
      |  FROM sig q JOIN sig n ON q.vec_id < 5 AND q.vec_id <> n.vec_id),
      |r AS (SELECT q_id, n_id, hamming, CAST(ROW_NUMBER() OVER (
      |  PARTITION BY q_id ORDER BY hamming ASC, n_id ASC) AS BIGINT) AS rnk
      |  FROM h)""".stripMargin

  /** Sign-bit binary quantization + Hamming top-k
    * ([[Similarity.binarySign]] → [[Similarity.hammingTopK]]): the
    * codebook-FREE memory face — 64 sign bits per vector (32× smaller
    * than raw floats, like PQ, but with nothing to train, ship, or
    * version), each candidate scored by two XOR+popcount word ops. The
    * oracle replays the 32-bit packing fold and the two-word popcount
    * sum; ties break to the lower neighbor id. Approximate by
    * construction (sign bits preserve angular order in expectation —
    * the SRP-LSH family). */
  val annBinaryTopK = Q("ann_binary_topk",
    s"""WITH $sqlSig
       |SELECT q_id, n_id, rnk, hamming FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.hammingTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Binary retrieve with EXACT re-rank ([[Similarity.hammingTopK]]
    * rerank = 20): the top-20 Hamming survivors per query re-score
    * against RAW vectors by exact cosine and the final top-5 rank by
    * cosine — the standard two-stage shape ([[Registry10]]'s
    * `ann_ivf_pq_rerank`) on the cheapest first stage there is. */
  val annBinaryRerank = Q("ann_binary_rerank",
    s"""WITH $sqlSig,
       |surv AS (SELECT q_id, n_id FROM r WHERE rnk <= 20),
       |rr AS (SELECT s.q_id, s.n_id,
       |    ${Registry10.sqlCos("q.embedding", "b.embedding")} AS cos
       |  FROM surv s JOIN embeddings q ON q.vec_id = s.q_id
       |  JOIN embeddings b ON b.vec_id = s.n_id),
       |r2 AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM rr)
       |SELECT q_id, n_id, rnk, cos FROM r2 WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.hammingTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 5, rerank = 20)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** STREAMING index ingest: the production arrival path of
    * [[Similarity.pqIndexAppend]] — embedding pages arrive as file-source
    * micro-batches (one page per trigger), and each batch appends its
    * DELTA (the `deltaOnly` storage face) to a parquet-backed ledger
    * after anti-joining the ledger's ids. Pages OVERLAP by 10 ids (an
    * at-least-once source replaying tail rows), which the anti-join must
    * absorb — and because the quantizer is frozen, the final ledger is
    * ARRIVAL-ORDER-INDEPENDENT: whichever replica of an overlapped row
    * arrives first encodes to the same (cell, codes), so ingest order
    * cannot change the stored index. The gate asserts the strongest
    * form: after draining all pages, the ledger equals the from-scratch
    * rebuild of the whole corpus (the `ann_index_append` oracle).
    *
    * Stateless streaming (no watermark, no state store): the ledger IS
    * the state, exactly as a production vector-index ingest holds its
    * state in storage, not in the stream engine.
    *
    * O(touched) on BOTH sides: the write appends the batch's delta
    * (never rewrites the ledger), and the idempotency anti-join's read
    * leg is bucket-pruned — the ledger is partitioned on
    * pmod(vec_id, B) and [[graft.operators.Ledger.prunedToBatch]]
    * pre-filters the stored side to the batch's elected buckets (a
    * semantic no-op on the id anti-join, a literal `bkt IN` partition
    * filter in the executed plan), so a batch reads touched_buckets ×
    * (ledger/B) rows instead of the whole stored id column. */
  val streamingIndexIngest = Q("streaming_index_ingest",
    s"""WITH ${Registry10.sqlPqCodes},
       |cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${Registry10.sqlCos("b.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent c) WHERE rn = 1)
       |SELECT a.n_id AS vec_id, a.cell,
       |  array_to_string(list(CAST(n.code AS INT) ORDER BY n.sub), ',') AS codes
       |FROM asg a JOIN codes n ON n.n_id = a.n_id
       |GROUP BY a.n_id, a.cell ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val n = e.count()
    val fx = FixtureCache.cached(d, "sidx", 1, Seq("embeddings")) { tmp =>
      val pages = tmp.resolve("pages")
      java.nio.file.Files.createDirectories(pages)
      val base = System.currentTimeMillis() - 3600L * 1000
      val q = n / 4
      for (p <- 0 until 4) {
        val lo = math.max(0L, p * q - 10)
        val hi = if (p == 3) n else (p + 1) * q
        val tmpd = tmp.resolve(s"tmp$p")
        e.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .repartition(1).write.mode("overwrite").parquet(tmpd.toString)
        val parts = tmpd.toFile.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        parts.zipWithIndex.foreach { case (f, i) =>
          val dest = pages.resolve(s"page$p-$i.parquet")
          java.nio.file.Files.move(f.toPath, dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(base + p * 60000L))
        }
        FixtureCache.deleteRecursively(tmpd)
      }
    }
    val stage = StreamHarness.runDir("graft_sidx")
    val ledgerDir = stage.resolve("ledger").toString
    val (_, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    // the ledger is BUCKET-PARTITIONED on pmod(vec_id, B): the
    // anti-join read leg below prunes to the batch's buckets (the
    // empty partitioned seed writes no files, so reads carry the
    // explicit schema — partition column included)
    val nBkt = 16
    import org.apache.spark.sql.types._
    val ledgerSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cell", IntegerType),
      StructField("codes", ArrayType(IntegerType, containsNull = false)),
      StructField("bkt", IntegerType)))
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      ledgerSchema)
      .write.partitionBy("bkt").mode("overwrite").parquet(ledgerDir)
    val stream = s.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(fx.resolve("pages").toString)
    val appendBatch: (DataFrame, Long) => Unit = { (b, _) =>
      val stored = graft.operators.Ledger.prunedToBatch(
        s.read.schema(ledgerSchema).parquet(ledgerDir), b, "vec_id", nBkt)
      graft.operators.Ledger.withBucket(
        Similarity.pqIndexAppend(stored, b, cent, cb,
          "vec_id", "embedding", deltaOnly = true), "vec_id", nBkt)
        .write.partitionBy("bkt").mode("append").parquet(ledgerDir)
    }
    val run = stream.writeStream
      .foreachBatch(appendBatch)
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    run.awaitTermination()
    s.read.schema(ledgerSchema).parquet(ledgerDir).drop("bkt")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  /** Index TAKEDOWN under the gate ([[Similarity.pqIndexRemove]]): the
    * corpus ledger minus a removal batch (vec_id ≡ 0 mod 7, plus the
    * never-indexed id 9999 — takedown replay of an absent id must be a
    * no-op) equals the from-scratch rebuild of the surviving corpus —
    * deletion must be indistinguishable from never having ingested the
    * removed vectors (`dedup_clusters_remove`'s posture; here rows are
    * independent under the frozen quantizer, so one id-keyed anti-join
    * IS the whole repair). */
  val annIndexRemove = Q("ann_index_remove",
    s"""WITH ${Registry10.sqlPqCodes},
       |cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${Registry10.sqlCos("b.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent c) WHERE rn = 1)
       |SELECT a.n_id AS vec_id, a.cell,
       |  array_to_string(list(CAST(n.code AS INT) ORDER BY n.sub), ',') AS codes
       |FROM asg a JOIN codes n ON n.n_id = a.n_id
       |WHERE a.n_id % 7 <> 0
       |GROUP BY a.n_id, a.cell ORDER BY vec_id""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val ledger = Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
    val removals = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
      .unionByName(s.range(9999, 10000).select(col("id").as("vec_id")))
    Similarity.pqIndexRemove(ledger, removals, "vec_id")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  val round12b: Seq[Q] =
    Seq(mixTemperature, mixEpochs, annFilteredTopK, annIndexAppend,
      annBinaryTopK, annBinaryRerank, streamingIndexIngest, annIndexRemove)
}
