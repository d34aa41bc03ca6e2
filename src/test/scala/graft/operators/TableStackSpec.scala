package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TxTableStack]] — the general keyed table with transactional
  * add-column schema evolution. Load-bearing claims:
  * (1) upserts are after-images (replace wholesale, insert, ride
  *     through unnamed rows); deletes drop; both replay-exact;
  * (2) [[TxTableStack.evolveSchema]] is METADATA-ONLY — zero re-pins —
  *     and old rows read null in the new column until re-imaged;
  * (3) a pre-evolution snapshot serves the narrower schema it was
  *     written for, even read after the evolution;
  * (4) lagging writers null-fill; unknown columns refuse; duplicate
  *     evolution refuses;
  * (5) the change feed classifies across the evolution boundary
  *     (before projected onto the after schema) and an
  *     evolution-only window emits nothing;
  * (6) vacuum retires below the floor, the head keeps serving. */
class TableStackSpec extends SparkSpec {
  import spark.implicits._

  private val B = 4

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_tbl_spec").toString

  private def rows(root: String, version: Option[Long] = None)
      : Seq[(Long, String, Option[Double])] =
    TxTableStack.resolve(spark, root, version)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.length < 3 || r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq

  private def mk(): String = {
    val root = newRoot()
    TxTableStack.init(spark, root, "k LONG, lang STRING")
    assert(TxTableStack.commitBatch(spark, root,
      Seq((1L, "pt"), (2L, "en"), (3L, "es")).toDF("k", "lang"),
      0L, "k", B))
    root
  }

  test("after-image upsert, delete, ride-through, replay") {
    val root = mk()
    assert(TxTableStack.commitBatch(spark, root,
      Seq((2L, "de"), (4L, "fr")).toDF("k", "lang"), 1L, "k", B))
    assert(rows(root).map(t => (t._1, t._2)) ==
      Seq((1L, "pt"), (2L, "de"), (3L, "es"), (4L, "fr")))
    // replay absorbs whole
    assert(!TxTableStack.commitBatch(spark, root,
      Seq((9L, "xx")).toDF("k", "lang"), 1L, "k", B))
    assert(TxTableStack.commitDelete(spark, root,
      Seq(3L, 99L).toDF("k"), 2L, "k", B),
      "a delete with an absent key must still commit (no-op member)")
    assert(rows(root).map(_._1) == Seq(1L, 2L, 4L))
  }

  test("evolution is metadata-only; old rows read null; lagging writers null-fill") {
    val root = mk()
    val pins = Manifest.read(spark, root).get.statsV
    assert(TxTableStack.evolveSchema(spark, root, "quality DOUBLE"))
    val st = Manifest.read(spark, root).get
    assert(st.statsV == pins, "evolution must re-pin nothing")
    assert(st.schema == "k LONG, lang STRING,quality DOUBLE")
    assert(rows(root) == Seq((1L, "pt", None), (2L, "en", None),
      (3L, "es", None)), "stored rows must read null in the new column")
    // current writer populates; lagging writer null-fills by replacing
    assert(TxTableStack.commitBatch(spark, root,
      Seq((1L, "pt", 0.5), (2L, "en", 0.9)).toDF("k", "lang", "quality"),
      1L, "k", B))
    assert(TxTableStack.commitBatch(spark, root,
      Seq((2L, "en")).toDF("k", "lang"), 2L, "k", B))
    assert(rows(root) == Seq((1L, "pt", Some(0.5)), (2L, "en", None),
      (3L, "es", None)))
  }

  test("pre-evolution snapshot serves the narrower schema") {
    val root = mk()
    assert(TxTableStack.evolveSchema(spark, root, "quality DOUBLE"))
    assert(TxTableStack.commitBatch(spark, root,
      Seq((1L, "pt", 0.5)).toDF("k", "lang", "quality"), 1L, "k", B))
    assert(TxTableStack.schemaAt(spark, root, Some(1L)) ==
      "k LONG, lang STRING")
    assert(TxTableStack.resolve(spark, root, Some(1L)).columns.toSeq ==
      Seq("k", "lang"))
    assert(rows(root, Some(1L)) == Seq((1L, "pt", None), (2L, "en", None),
      (3L, "es", None)).map(t => (t._1, t._2, None)))
    assert(rows(root).head == ((1L, "pt", Some(0.5))))
  }

  test("unknown columns and duplicate evolution refuse") {
    val root = mk()
    intercept[IllegalArgumentException] {
      TxTableStack.commitBatch(spark, root,
        Seq((1L, "pt", 0.5)).toDF("k", "lang", "quality"), 1L, "k", B)
    }
    intercept[IllegalArgumentException] {
      TxTableStack.evolveSchema(spark, root, "lang STRING")
    }
    intercept[IllegalStateException] {
      TxTableStack.commitBatch(spark, newRoot(),
        Seq((1L, "pt")).toDF("k", "lang"), 0L, "k", B)
    }
    intercept[IllegalArgumentException] {
      TxTableStack.init(spark, root, "again LONG")
    }
  }

  test("change feed classifies across the evolution boundary") {
    val root = mk() // v1: {1 pt, 2 en, 3 es}
    assert(TxTableStack.evolveSchema(spark, root, "quality DOUBLE")) // v2
    assert(TxTableStack.commitBatch(spark, root,
      Seq((1L, "pt", 0.5), (4L, "fr", 0.7)).toDF("k", "lang", "quality"),
      1L, "k", B)) // v3: 1 updated (new column only), 4 inserted
    assert(TxTableStack.commitDelete(spark, root, Seq(2L).toDF("k"),
      2L, "k", B)) // v4
    val feed = TxTableStack.changes(spark, root, 1L, 4L, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(3),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(feed == Seq((1L, "update", Some(0.5)),
      (2L, "delete", None), (4L, "insert", Some(0.7))),
      s"got $feed") // row 3 rode through unchanged: no emission
    // an evolution-only window emits nothing
    assert(TxTableStack.changes(spark, root, 1L, 2L, "k").isEmpty)
  }

  test("type widening: old files read promoted, snapshots keep the narrow type, unsafe refuses") {
    val root = newRoot()
    TxTableStack.init(spark, root, "k LONG, views INT")
    assert(TxTableStack.commitBatch(spark, root,
      Seq((1L, 10), (2L, 20)).toDF("k", "views"), 0L, "k", B))
    assert(TxTableStack.evolveWiden(spark, root, "views", "BIGINT"))
    assert(TxTableStack.schemaAt(spark, root) == "k BIGINT,views BIGINT")
    // old int-typed files read as long under the promoted schema
    val head = TxTableStack.resolve(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(head == Seq((1L, 10L), (2L, 20L)))
    // a post-promotion writer lands past-int-range values
    assert(TxTableStack.commitBatch(spark, root,
      Seq((3L, 5000000000L)).toDF("k", "views"), 1L, "k", B))
    assert(TxTableStack.resolve(spark, root).filter(col("k") === 3L)
      .head().getLong(1) == 5000000000L)
    // the pre-widening snapshot serves the narrow type
    assert(TxTableStack.schemaAt(spark, root, Some(1L)) ==
      "k LONG, views INT")
    assert(TxTableStack.resolve(spark, root, Some(1L)).schema("views")
      .dataType == org.apache.spark.sql.types.IntegerType)
    // the change feed across the widening classifies in the after schema
    val feed = TxTableStack.changes(spark, root, 1L, 3L, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(feed == Seq((3L, "insert")))
    // refusals: narrowing, cross-kind, unknown column
    intercept[IllegalArgumentException] {
      TxTableStack.evolveWiden(spark, root, "views", "INT")
    }
    intercept[IllegalArgumentException] {
      TxTableStack.evolveWiden(spark, root, "views", "STRING")
    }
    intercept[IllegalArgumentException] {
      TxTableStack.evolveWiden(spark, root, "missing", "BIGINT")
    }
  }

  test("rebucket migrates the whole family; later commits use the new keyspace") {
    val root = mk()
    assert(TxTableStack.evolveSchema(spark, root, "quality DOUBLE"))
    val before = rows(root)
    assert(TxTableStack.rebucket(spark, root, "k", newBuckets = 16))
    assert(rows(root) == before, "content must ride the migration")
    assert(Manifest.read(spark, root).get.schema ==
      "k LONG, lang STRING,quality DOUBLE",
      "the schema must ride the migration")
    assert(TxTableStack.commitBatch(spark, root,
      Seq((2L, "de", 0.7)).toDF("k", "lang", "quality"), 1L, "k", 16))
    assert(rows(root) == Seq((1L, "pt", None), (2L, "de", Some(0.7)),
      (3L, "es", None)))
    // an empty table refuses the migration as a no-op
    val empty = newRoot()
    TxTableStack.init(spark, empty, "k LONG")
    assert(!TxTableStack.rebucket(spark, empty, "k", 16))
  }

  test("vacuum retires below the floor; the head keeps serving") {
    val root = mk()
    assert(TxTableStack.commitBatch(spark, root,
      Seq((1L, "xx")).toDF("k", "lang"), 1L, "k", B))
    val head = rows(root)
    val stats = TxTableStack.vacuum(spark, root, retainVersions = 0)
    assert(stats.deletedDirs > 0)
    assert(Manifest.readAt(spark, root, 1L).isEmpty)
    assert(rows(root) == head)
  }

  private def mkCounts(): String = {
    val root = newRoot()
    TxTableStack.init(spark, root, "k LONG, lang STRING, n BIGINT")
    assert(TxTableStack.commitBatch(spark, root,
      Seq((1L, "pt", 10L), (2L, "en", 20L), (3L, "es", 30L))
        .toDF("k", "lang", "n"), 0L, "k", B))
    root
  }

  private def countRows(root: String): Seq[(Long, String, Long)] =
    TxTableStack.resolve(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("merge: matched rules apply, unruled columns keep stored, " +
    "unmatched insert, unnamed ride through") {
    val root = mkCounts()
    // k=2 matched (n adds, lang unruled → keeps stored "en"),
    // k=4 inserts verbatim, k=1/3 ride through
    assert(TxTableStack.commitMerge(spark, root,
      Seq((2L, "de", 5L), (4L, "fr", 7L)).toDF("k", "lang", "n"),
      1L, "k", B, onMatched = Map("n" -> "s.n + b.n")))
    assert(countRows(root) == Seq((1L, "pt", 10L), (2L, "en", 25L),
      (3L, "es", 30L), (4L, "fr", 7L)))
  }

  test("merge replay absorbs — the additive rule never double-applies") {
    val root = mkCounts()
    val delta = Seq((2L, "de", 5L)).toDF("k", "lang", "n")
    val rules = Map("n" -> "s.n + b.n")
    assert(TxTableStack.commitMerge(spark, root, delta, 1L, "k", B,
      onMatched = rules))
    assert(!TxTableStack.commitMerge(spark, root, delta, 1L, "k", B,
      onMatched = rules))
    assert(countRows(root).find(_._1 == 2L).get._3 == 25L)
  }

  test("merge refuses rules on the key or on unknown columns; a " +
    "lagging merge batch null-fills") {
    val root = mkCounts()
    val delta = Seq((2L, "de", 5L)).toDF("k", "lang", "n")
    intercept[IllegalArgumentException] {
      TxTableStack.commitMerge(spark, root, delta, 1L, "k", B,
        onMatched = Map("k" -> "b.k"))
    }
    intercept[IllegalArgumentException] {
      TxTableStack.commitMerge(spark, root, delta, 1L, "k", B,
        onMatched = Map("bogus" -> "1"))
    }
    // lagging writer: batch without n — matched rule may still read
    // b.n (null) but a coalesce rule keeps the counter
    assert(TxTableStack.commitMerge(spark, root,
      Seq((2L, "de")).toDF("k", "lang"), 1L, "k", B,
      onMatched = Map("n" -> "s.n + coalesce(b.n, 0)",
        "lang" -> "b.lang")))
    assert(countRows(root).find(_._1 == 2L).get == ((2L, "de", 20L)))
  }
}
