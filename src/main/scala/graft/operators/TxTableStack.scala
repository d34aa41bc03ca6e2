package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** GENERAL KEYED TABLE under the [[Manifest]] protocol, with
  * TRANSACTIONAL SCHEMA EVOLUTION — the generic form of the
  * specialized ledger stacks (sketch profiles, split assignments,
  * view members are all "rows upserted by key in hash buckets"): one
  * per-bucket-MVCC asset family of after-image rows, upsert/delete/
  * merge/serve/feed/snapshot/compact/vacuum faces, and FULL column
  * evolution — add, type-widen, DROP, and RENAME — each a
  * METADATA-ONLY commit. The training-data use is the doc-metadata
  * sidecar table (language, source, quality, license flags) that
  * gains, renames, and retires columns every few months: rewriting
  * 100 TB of stored rows for any of those is exactly what a table
  * format exists to avoid.
  *
  * COLUMN RESOLUTION IS BY FIELD ID, not by name (the published
  * table formats' core schema-evolution idea — Iceberg assigns every
  * column a permanent id and resolves files through it;
  * independently implemented here). The manifest carries the current
  * [[TxTableStack.TableSchema]] — an ordered list of (id, name,
  * type) plus the next unallocated id — and every physical parquet
  * file stores its columns under the ID-DERIVED name `f<id>`, never
  * the user-facing name. Consequences, each a face of this stack:
  *
  *  - [[evolveSchema]] (ADD) allocates fresh ids and commits — ONE
  *    pointer swap, ZERO data files touched; stored rows read null
  *    in the new columns until re-imaged.
  *  - [[evolveWiden]] promotes a column's type in place (id and
  *    stored bytes untouched; readers cast narrow files up).
  *  - [[evolveDrop]] removes the field from the CURRENT schema only:
  *    stored `f<id>` bytes stay where they are, invisible to head
  *    reads, still served by every pre-drop snapshot (the cut's own
  *    schema renders them). A later [[evolveSchema]] re-adding the
  *    SAME NAME allocates a FRESH id — the old bytes can never
  *    resurrect under the new column, the classic by-name-resolution
  *    corruption field ids exist to prevent.
  *  - [[evolveRename]] changes the NAME on the field; the id — and
  *    therefore every stored file — is untouched: old files serve
  *    under the new name immediately, pre-rename snapshots keep the
  *    old name, and a lagging writer still addressing the old name
  *    refuses loudly (its column no longer resolves).
  *
  * Writers address the schema BY NAME at commit time (names are the
  * user API; ids are the storage contract): a batch carrying a
  * column subset null-fills the rest (the crawler fleet that has not
  * deployed the new field yet); a batch carrying a column the
  * manifest does not know REFUSES loudly (evolve first — silent
  * column drops are how data disappears). Name matching is
  * case-insensitive, matching Spark's default resolution — and so
  * are the duplicate/collision checks, so an evolution can never
  * commit a schema that Spark resolution would then find ambiguous.
  *
  * Everything else is the shared choreography: upserts land
  * after-images in exactly their keys' buckets (O(batch + touched
  * buckets), exactly-once by batch id), deletes drop rows, MERGE
  * applies conditional rules with an optional delete arm, the change
  * feed diffs re-pinned buckets between two cuts — ACROSS an
  * evolution boundary it resolves the before-cut BY ID onto the
  * after-cut's schema, so a consumer always sees feed rows in the
  * schema of the cut it is advancing to, renames and drops
  * included. An evolution commit alone re-pins nothing and correctly
  * emits an empty feed.
  *
  * No reference counterpart (jurimetria-etl fixes its 13-column frame
  * at parse time); schema evolution follows the published
  * table-format designs, independently implemented. */
object TxTableStack {

  /** One column of the table: a PERMANENT id (the storage name is
    * `f<id>`), the current user-facing name, and the current type. */
  final case class TField(id: Int, name: String, dataType: DataType) {
    def physName: String = s"f$id"
  }

  /** The table's current column list plus the next unallocated field
    * id (ids are never reused — the no-resurrection guarantee).
    * Persisted in [[Manifest.State.schema]] as ONE LINE:
    * `<nextId>|<id>:<name>:<typeSql>;...` — the codec normalizes
    * whatever DDL the caller wrote (multi-line stripMargin included)
    * into this canonical single-line form, so a torn manifest line
    * can never happen. */
  final case class TableSchema(nextId: Int, fields: Seq[TField]) {
    def ddl: String =
      fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
    def encode: String =
      s"$nextId|" + fields.map(f =>
        s"${f.id}:${f.name}:${f.dataType.sql}").mkString(";")
    def structType: StructType =
      StructType.fromDDL(if (fields.isEmpty) "" else ddl)
    /** Case-insensitive name lookup — Spark's default resolution. */
    def find(name: String): Option[TField] =
      fields.find(_.name.equalsIgnoreCase(name))
  }

  object TableSchema {
    private val namePat = "[A-Za-z_][A-Za-z0-9_]*".r.pattern

    private def requireName(n: String): Unit =
      require(namePat.matcher(n).matches(),
        s"column name '$n' is not a plain identifier " +
          "([A-Za-z_][A-Za-z0-9_]*) — the manifest codec and the " +
          "s./b. merge-rule aliases both require it")

    /** Parse caller DDL and allocate ids 1..n (or `from`..). Refuses
      * non-identifier names and case-insensitive duplicates. */
    def fromDdl(ddl: String, from: Int = 1): TableSchema = {
      val st = StructType.fromDDL(ddl)
      st.fieldNames.foreach(requireName)
      val dups = st.fieldNames.groupBy(_.toLowerCase)
        .filter(_._2.length > 1).keys
      require(dups.isEmpty,
        s"duplicate column names (case-insensitive): ${dups.mkString(", ")}")
      TableSchema(from + st.size,
        st.fields.toSeq.zipWithIndex.map { case (f, i) =>
          TField(from + i, f.name, f.dataType) })
    }

    def decode(s: String): TableSchema = {
      val i = s.indexOf('|')
      require(i > 0, s"not an encoded table schema: $s")
      val fs = s.drop(i + 1).split(";").filter(_.nonEmpty).toSeq.map { e =>
        val parts = e.split(":", 3)
        TField(parts(0).toInt, parts(1),
          StructType.fromDDL(s"x ${parts(2)}").head.dataType)
      }
      TableSchema(s.take(i).toInt, fs)
    }
  }

  private def bktOf(c: Column, buckets: Int): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  private def schemaOf(st: Manifest.State): TableSchema =
    TableSchema.decode(st.schema)

  /** Create the table at `root` with its initial row schema (Spark
    * DDL, e.g. `"doc_id LONG, lang STRING"` — normalized into the
    * canonical encoded form before storing, so multi-line DDL is
    * safe). The key column is passed per call like every stack's,
    * not stored. */
  def init(spark: SparkSession, root: String, schema: String): Unit =
    Manifest.withCommitLock(spark, root) {
      require(Manifest.read(spark, root).isEmpty,
        s"table already initialized at $root")
      Manifest.commit(spark, root,
        Manifest.State(0L, -1L, -1L, Map.empty,
          schema = TableSchema.fromDdl(schema).encode))
    }

  /** Rename logical columns to their `f<id>` storage names — the
    * write-side half of the id-resolution contract. */
  private def toPhysical(df: DataFrame, schema: TableSchema): DataFrame =
    df.select(schema.fields.map(f =>
      col(f.name).as(f.physName)) :+ col("bkt"): _*)

  /** Committed rows of a cut resolved BY FIELD ID onto `schema`
    * (+ bkt): pinned buckets read one version group at a time (a
    * version's files share the physical schema their commit wrote,
    * but ACROSS versions the id set and the physical types may
    * differ), then every schema field selected by its `f<id>` storage
    * name — present ids cast to the declared type, ids a file
    * predates (or that were dropped and re-added) null-filled. Passing
    * a DIFFERENT cut's schema is the change feed's cross-boundary
    * projection: renames follow the id, drops disappear, adds read
    * null. */
  private def readRows(spark: SparkSession, root: String,
                       st: Manifest.State, schema: TableSchema,
                       restrict: Option[Seq[Int]]): DataFrame = {
    val pinned = restrict match {
      case None => st.statsV
      case Some(bs) => st.statsV.filter { case (b, _) => bs.contains(b) }
    }
    if (pinned.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        schema.structType.add("bkt", IntegerType))
    else
      pinned.toSeq.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, bs) =>
        val raw = spark.read.option("basePath", s"$root/rows")
          .parquet(bs.map { case (b, _) =>
            s"$root/rows/v=$v/bkt=$b" }.sorted: _*)
        val have = raw.columns.toSet
        raw.select(schema.fields.map { f =>
          (if (have(f.physName)) col(f.physName).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        } :+ col("bkt"): _*)
      }.reduce(_.unionByName(_))
  }

  /** Align `batch` to the manifest schema BY NAME (case-insensitive,
    * Spark's resolution): columns it carries cast to their declared
    * types, columns it lags null-filled, columns the schema does not
    * know REFUSED. Output carries the schema's canonical names. */
  private def align(batch: DataFrame, schema: TableSchema): DataFrame = {
    val known = schema.fields.map(_.name.toLowerCase).toSet
    val extra = batch.columns.filterNot(c => known(c.toLowerCase))
    require(extra.isEmpty,
      s"batch carries columns the table schema does not know: " +
        s"${extra.mkString(", ")} — evolveSchema first")
    val have = batch.columns.map(_.toLowerCase).toSet
    batch.select(schema.fields.map { f =>
      (if (have(f.name.toLowerCase)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
  }

  /** The batch-shape REQUIREs every keyed write face shares: the key
    * column exists, no batch row has a null key (a null key has no
    * bucket), and the batch carries each key ONCE — a duplicated key
    * would persist duplicate rows in [[commitBatch]] and fan out the
    * full-outer join in [[commitMerge]], double-applying an additive
    * rule WITHIN one commit (the corruption the batch-id guard
    * prevents ACROSS commits). One aggregate pass over the
    * checkpointed batch. */
  /** The batch-shape guard FUSED with the bucket election: one agg
    * pass returns the touched `bkt` set (bounded by B) alongside the
    * null-key and duplicate-key counters, instead of a guard action
    * plus a separate election action (guide §2.4 — remove redundant
    * passes). Callers pass a LAZY-checkpointed `rows`: this single
    * drain is also what materializes the checkpoint. */
  private def requireKeyedBatchBuckets(rows: DataFrame,
                                       keyCol: String): Seq[Int] = {
    val c = rows.agg(count(lit(1)), count(col(keyCol)),
      countDistinct(col(keyCol)), collect_set(col("bkt"))).head()
    require(c.getLong(0) == c.getLong(1),
      s"${c.getLong(0) - c.getLong(1)} batch rows carry a NULL $keyCol " +
        "— a null key resolves to no bucket; filter or fix upstream")
    require(c.getLong(1) == c.getLong(2),
      s"batch carries ${c.getLong(1) - c.getLong(2)} duplicate " +
        s"$keyCol rows — an upsert batch is a set of after-images, " +
        "one per key; fold duplicates deterministically upstream")
    c.getSeq[Int](3)
  }

  /** TRANSACTIONAL UPSERT — the batch's rows are AFTER-IMAGES:
    * each replaces its key's stored row wholesale (or inserts), in
    * exactly the batch keys' buckets; rows the batch never named ride
    * through verbatim. The batch must carry each key exactly once
    * (REQUIREd). Lagging writers null-fill (see [[align]]).
    * Exactly-once by batch id. */
  def commitBatch(spark: SparkSession, root: String, batch: DataFrame,
                  batchId: Long, keyCol: String, buckets: Int,
                  publish: Boolean = true): Boolean =
    Manifest.commitGuard(spark, root, batchId, publish)(
      throw new IllegalStateException(
        s"table not initialized at $root — call init first")
    ) { (st, vNew) =>
      val schema = schemaOf(st)
      val key = schema.find(keyCol).getOrElse(throw
        new IllegalArgumentException(
          s"key column $keyCol is not in the table schema")).name
      val rows = align(batch, schema)
        .withColumn("bkt", bktOf(col(key), buckets))
        .localCheckpoint(eager = false) // materialized by the fused guard
      val touched = requireKeyedBatchBuckets(rows, key)
      if (touched.isEmpty) st.copy(version = vNew, batchId = batchId)
      else {
        val replaced = readRows(spark, root, st, schema, Some(touched))
          .join(rows.select(key), Seq(key), "left_anti")
          .unionByName(rows)
        st.copy(version = vNew, batchId = batchId,
          statsV = Manifest.writeRepin(toPhysical(replaced, schema),
            "rows", root, vNew, touched, st.statsV))
      }
    }

  /** TRANSACTIONAL DELETE — drop the keys' rows from their buckets;
    * absent keys are no-ops (replay- and double-delete-exact). */
  def commitDelete(spark: SparkSession, root: String, keys: DataFrame,
                   batchId: Long, keyCol: String, buckets: Int,
                   publish: Boolean = true): Boolean =
    Manifest.commitGuard(spark, root, batchId, publish)(
      throw new IllegalStateException(
        s"table not initialized at $root — call init first")
    ) { (st, vNew) =>
      val schema = schemaOf(st)
      val key = schema.find(keyCol).getOrElse(throw
        new IllegalArgumentException(
          s"key column $keyCol is not in the table schema")).name
      val ids = keys.select(col(keyCol).as(key))
        .filter(col(key).isNotNull).distinct()
        .withColumn("bkt", bktOf(col(key), buckets))
        // lazy: the election collect drains the frame and materializes
        // the checkpoint in the same action (guide §2.4)
        .localCheckpoint(eager = false)
      val touched = ids.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) st.copy(version = vNew, batchId = batchId)
      else {
        val replaced = readRows(spark, root, st, schema, Some(touched))
          .join(ids.select(key), Seq(key), "left_anti")
        st.copy(version = vNew, batchId = batchId,
          statsV = Manifest.writeRepin(toPhysical(replaced, schema),
            "rows", root, vNew, touched, st.statsV))
      }
    }

  /** Resolve each merge rule/predicate against the aliased s ⋈ b
    * frame and REQUIRE the declared outcome type — the refuse-loudly
    * closure of the rule surface: a rule whose resolved type cannot
    * LOSSLESSLY cast to its target column (e.g. a string expression
    * into BIGINT) would otherwise null silently under the plain cast
    * that writes it. Analysis-only, no job runs. */
  private def requireRuleType(joined: DataFrame, what: String,
                              sql: String, target: DataType): Unit = {
    val resolved = joined.select(expr(sql)).schema.head.dataType
    require(resolved == target ||
      org.apache.spark.sql.catalyst.expressions.Cast
        .canUpCast(resolved, target),
      s"$what resolves to ${resolved.sql}, which does not safely " +
        s"cast to the declared ${target.sql} — a plain cast would " +
        "null silently; fix the rule or widen the column first")
  }

  /** TRANSACTIONAL MERGE — the conditional-upsert face (MERGE INTO
    * semantics, the published formats' third write shape after upsert
    * and delete): the batch joins stored rows by key; a MATCHED row
    * for which `deleteWhen` holds (a SQL predicate over the aliases
    * `s` = stored and `b` = batch — `WHEN MATCHED AND <cond> THEN
    * DELETE`) is DROPPED; any other matched row is re-imaged by the
    * `onMatched` column rules (SQL expressions over the same aliases,
    * e.g. `"views" -> "s.views + b.views"`); matched columns WITHOUT
    * a rule keep their stored value (the standard `UPDATE SET <cols>`
    * contract — [[commitBatch]] is the replace-all `SET *` face);
    * unmatched batch rows INSERT as-is; stored rows the batch never
    * named ride through verbatim. One full-outer join on the key,
    * confined to the batch keys' buckets — O(batch + touched buckets'
    * occupancy), the upsert law. Every rule's resolved type is
    * validated against its column ([[requireRuleType]]) and
    * `deleteWhen` must resolve BOOLEAN. Additive rules and the delete
    * arm are both NON-idempotent, which is exactly why the guard's
    * batch-id high-water matters: a replayed trigger is absorbed
    * before the join and can never double-apply an update or
    * double-free a bucket's rows. */
  def commitMerge(spark: SparkSession, root: String, batch: DataFrame,
                  batchId: Long, keyCol: String, buckets: Int,
                  onMatched: Map[String, String],
                  deleteWhen: Option[String] = None,
                  publish: Boolean = true): Boolean =
    Manifest.commitGuard(spark, root, batchId, publish)(
      throw new IllegalStateException(
        s"table not initialized at $root — call init first")
    ) { (st, vNew) =>
      val schema = schemaOf(st)
      val key = schema.find(keyCol).getOrElse(throw
        new IllegalArgumentException(
          s"key column $keyCol is not in the table schema")).name
      require(!onMatched.keySet.exists(_.equalsIgnoreCase(key)),
        s"the key column $key cannot carry a matched rule — " +
          "re-keying a row is a delete + insert")
      val unknown = onMatched.keySet.filter(schema.find(_).isEmpty)
      require(unknown.isEmpty,
        s"matched rules name columns the table schema does not know: " +
          s"${unknown.mkString(", ")} — evolveSchema first")
      val rows = align(batch, schema)
        .withColumn("bkt", bktOf(col(key), buckets))
        .localCheckpoint(eager = false) // materialized by the fused guard
      val touched = requireKeyedBatchBuckets(rows, key)
      if (touched.isEmpty) st.copy(version = vNew, batchId = batchId)
      else {
        val sKey = col(s"s.$key")
        val bKey = col(s"b.$key")
        val joined = readRows(spark, root, st, schema, Some(touched))
          .alias("s").join(rows.alias("b"), sKey === bKey, "full_outer")
        onMatched.foreach { case (name, sql) =>
          requireRuleType(joined, s"matched rule for $name", sql,
            schema.find(name).get.dataType)
        }
        deleteWhen.foreach(sql => requireRuleType(joined,
          "the deleteWhen predicate", sql,
          org.apache.spark.sql.types.BooleanType))
        val matched = sKey.isNotNull && bKey.isNotNull
        val merged = joined
          .select(schema.fields.map { f =>
            val sC = col(s"s.${f.name}")
            val bC = col(s"b.${f.name}")
            (if (f.name == key) coalesce(sC, bC)
             else when(matched, onMatched.collectFirst {
                    case (n, sql) if n.equalsIgnoreCase(f.name) => expr(sql)
                  }.getOrElse(sC))
                  .when(sKey.isNull, bC)
                  .otherwise(sC))
              .cast(f.dataType).as(f.name)
          } ++ Seq(coalesce(col("s.bkt"), col("b.bkt")).as("bkt"),
            deleteWhen.map(sql => matched && coalesce(expr(sql),
              lit(false))).getOrElse(lit(false)).as("_del")): _*)
          .filter(!col("_del")).drop("_del")
        st.copy(version = vNew, batchId = batchId,
          statsV = Manifest.writeRepin(toPhysical(merged, schema),
            "rows", root, vNew, touched, st.statsV))
      }
    }

  /** The shared metadata-only evolution commit shell: derive the new
    * [[TableSchema]] from the head's, publish ONE pointer swap with
    * every pin riding through untouched. */
  private def evolve(spark: SparkSession, root: String, publish: Boolean)
                    (derive: TableSchema => TableSchema): Boolean =
    Manifest.withCommitLock(spark, root) {
      val st = Manifest.read(spark, root).getOrElse(
        throw new IllegalStateException(
          s"table not initialized at $root — call init first"))
      val next = derive(schemaOf(st))
      if (publish)
        Manifest.commit(spark, root, st.copy(version = st.version + 1,
          schema = next.encode))
      true
    }

  /** ADD-COLUMN SCHEMA EVOLUTION — a METADATA-ONLY commit: `addDdl`
    * (e.g. `"quality DOUBLE, license STRING"`) appends to the row
    * schema under FRESH field ids; every pin rides through untouched,
    * zero data files are read or written, and ONE pointer swap
    * publishes the new schema. New columns read as null on every
    * stored row until an upsert re-images it — including a column
    * whose NAME was dropped earlier: the fresh id guarantees the old
    * bytes never resurrect. */
  def evolveSchema(spark: SparkSession, root: String, addDdl: String,
                   publish: Boolean = true): Boolean =
    evolve(spark, root, publish) { cur =>
      val added = TableSchema.fromDdl(addDdl, from = cur.nextId)
      val dup = added.fields.map(_.name).filter(n => cur.find(n).isDefined)
      require(dup.isEmpty,
        s"columns already in the table schema (case-insensitive): " +
          s"${dup.mkString(", ")} — only fresh names can be added")
      TableSchema(added.nextId, cur.fields ++ added.fields)
    }

  /** DROP-COLUMN EVOLUTION — a METADATA-ONLY commit, the face
    * by-name resolution cannot offer and field ids make safe: the
    * field leaves the CURRENT schema; its stored `f<id>` bytes stay
    * in every pinned file, invisible to head reads, still served by
    * every pre-drop snapshot (each cut renders its own schema), and
    * reclaimed bucket-by-bucket as later upserts rewrite buckets
    * under the narrower schema. Re-adding the same NAME later gets a
    * fresh id — no resurrection. */
  def evolveDrop(spark: SparkSession, root: String, colName: String,
                 publish: Boolean = true): Boolean =
    evolve(spark, root, publish) { cur =>
      val f = cur.find(colName).getOrElse(throw
        new IllegalArgumentException(
          s"column $colName is not in the table schema"))
      require(cur.fields.length > 1,
        s"cannot drop $colName — it is the table's only column")
      cur.copy(fields = cur.fields.filterNot(_.id == f.id))
    }

  /** RENAME-COLUMN EVOLUTION — a METADATA-ONLY commit: the NAME
    * changes on the field, the id — and therefore every stored file —
    * is untouched, so old files serve under the new name immediately
    * and pre-rename snapshots keep the old name. Collisions are
    * checked case-insensitively; a writer still addressing the old
    * name refuses loudly at its next commit ([[align]]). */
  def evolveRename(spark: SparkSession, root: String, from: String,
                   to: String, publish: Boolean = true): Boolean =
    evolve(spark, root, publish) { cur =>
      val f = cur.find(from).getOrElse(throw
        new IllegalArgumentException(
          s"column $from is not in the table schema"))
      TableSchema.fromDdl(s"$to STRING") // validate the identifier
      require(cur.find(to).forall(_.id == f.id),
        s"column $to already exists (case-insensitive) — renaming " +
          s"$from onto it would make resolution ambiguous")
      cur.copy(fields = cur.fields.map(g =>
        if (g.id == f.id) g.copy(name = to) else g))
    }

  /** The information-preserving type promotions this stack accepts —
    * the published formats' type-promotion table (Iceberg v2: int →
    * long, float → double; plus the smaller integral widths). */
  private val widenings: Set[(String, String)] = {
    val ints = Seq("TINYINT", "SMALLINT", "INT", "BIGINT")
    (for {
      (from, i) <- ints.zipWithIndex
      to <- ints.drop(i + 1)
    } yield from -> to).toSet + ("FLOAT" -> "DOUBLE")
  }

  /** TYPE-WIDENING EVOLUTION — promote a column to a wider type as a
    * METADATA-ONLY commit: zero data files touched, one pointer swap,
    * the field id untouched. Readers already project every pinned
    * file onto the cut's schema BY ID WITH A CAST, so files written
    * under the narrower physical type read widened for free — which
    * is exactly why only information-preserving promotions are legal
    * (narrowing or re-typing would corrupt silently where this cast
    * succeeds and throw where it refuses; both are refused here
    * instead). Snapshots before the widening keep serving the
    * narrower type they were written for. */
  def evolveWiden(spark: SparkSession, root: String, colName: String,
                  newType: String, publish: Boolean = true): Boolean =
    evolve(spark, root, publish) { cur =>
      val field = cur.find(colName).getOrElse(throw
        new IllegalArgumentException(
          s"column $colName is not in the table schema"))
      val to = StructType.fromDDL(s"x $newType").head.dataType
      require(widenings((field.dataType.sql, to.sql)),
        s"${field.dataType.sql} -> ${to.sql} is not an " +
          "information-preserving promotion — only integral widening " +
          "and float -> double are supported")
      cur.copy(fields = cur.fields.map(g =>
        if (g.id == field.id) g.copy(dataType = to) else g))
    }

  /** The committed rows of a cut, in the cut's schema — a snapshot
    * BEFORE an evolution serves exactly the columns (names, types,
    * ids) it was committed under. */
  def resolve(spark: SparkSession, root: String,
              version: Option[Long] = None): DataFrame = {
    val st = Manifest.stateAt(spark, root, version)
    readRows(spark, root, st, schemaOf(st), None).drop("bkt")
  }

  /** The cut's schema as Spark DDL — what [[resolve]] serves. */
  def schemaAt(spark: SparkSession, root: String,
               version: Option[Long] = None): String =
    schemaOf(Manifest.stateAt(spark, root, version)).ddl

  /** CHANGE DATA FEED between two cuts, classified insert / delete /
    * update with the after-image riding along (null on delete), IN
    * THE `toVersion` CUT'S SCHEMA: across an evolution boundary the
    * before-cut resolves BY FIELD ID onto the after schema — added
    * columns read null, renamed columns follow their id, dropped
    * columns vanish from the diff — so a row whose only difference
    * is a newly-populated column classifies correctly and a
    * rename/drop alone changes nothing. The pin diff bounds the
    * read; an evolution-only window re-pins nothing and emits
    * nothing. */
  def changes(spark: SparkSession, root: String, fromVersion: Long,
              toVersion: Long, keyCol: String): DataFrame = {
    val stF = Manifest.stateAt(spark, root, Some(fromVersion))
    val stT = Manifest.stateAt(spark, root, Some(toVersion))
    require(stT.batchId >= stF.batchId,
      s"change window is inverted: batch ${stF.batchId} → ${stT.batchId}")
    val changed = Manifest.repinnedBuckets(stF.statsV, stT.statsV)
    val target = schemaOf(stT)
    val key = target.find(keyCol).getOrElse(throw
      new IllegalArgumentException(
        s"key column $keyCol is not in the toVersion schema")).name
    val payload = target.fields.map(_.name).filterNot(_ == key)
    // the before cut, resolved by id onto the AFTER schema
    val beforeRows = readRows(spark, root, stF, target, Some(changed))
    val before = beforeRows.select(col(key) +:
      payload.map(c => col(c).as(s"_b_$c")) :+ lit(true).as("_bp"): _*)
    val after = readRows(spark, root, stT, target, Some(changed))
      .drop("bkt").withColumn("_ap", lit(true))
    val bs = struct(payload.map(c => col(s"_b_$c")): _*)
    val as = struct(payload.map(col): _*)
    before.join(after, Seq(key), "full_outer")
      .select(col(key) +: payload.map(col) :+
        when(col("_bp").isNull, lit("insert"))
          .when(col("_ap").isNull, lit("delete"))
          .when(!(bs <=> as), lit("update")).as("change"): _*)
      .filter(col("change").isNotNull)
  }

  /** RE-BUCKET MIGRATION — the undersized-B cure every keyed family
    * carries: one commit moves the whole row family under `newBuckets`
    * (an O(ledger) rewrite by definition, amortized over the corpus
    * growth that forced it); later commits must pass the new bucket
    * count. The row schema rides through unchanged. */
  def rebucket(spark: SparkSession, root: String, keyCol: String,
               newBuckets: Int, publish: Boolean = true): Boolean =
    Manifest.withCommitLock(spark, root) {
      require(newBuckets > 0, "newBuckets must be positive")
      val st = Manifest.read(spark, root).getOrElse(
        throw new IllegalStateException(
          s"table not initialized at $root — call init first"))
      if (st.statsV.isEmpty) false
      else {
        val schema = schemaOf(st)
        val key = schema.find(keyCol).getOrElse(throw
          new IllegalArgumentException(
            s"key column $keyCol is not in the table schema")).name
        val vNew = st.version + 1
        val pins = Manifest.moveFamily(
          toPhysical(readRows(spark, root, st, schema, None)
            .withColumn("bkt", bktOf(col(key), newBuckets)), schema),
          "rows", root, vNew)
        if (publish)
          Manifest.commit(spark, root,
            st.copy(version = vNew, statsV = pins))
        true
      }
    }

  /** COMPACTION — the OPTIMIZE face ([[Ledger.compactBuckets]]'s
    * sibling under the manifest): every upsert/merge/delete drain
    * leaves each touched bucket's new pin with as many files as the
    * write had tasks, so a bucket's read cost fragments over time —
    * the exact law the text index's compactor already cures. Elect
    * fragmented buckets FROM METADATA ALONE (file count per pinned
    * bucket directory — no data read), rewrite exactly those buckets
    * content-identically to ONE file each through the normal
    * write-and-repin law, and publish one maintenance commit (the
    * batch high-water is untouched — compaction is not a batch).
    * Unelected buckets keep their pins: their bytes are untouched by
    * construction. Returns the elected bucket ids (empty → nothing
    * fragmented, nothing committed). */
  def compact(spark: SparkSession, root: String,
              maxFilesPerBucket: Int = 1,
              publish: Boolean = true): Seq[Int] =
    Manifest.withCommitLock(spark, root) {
      require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
      val st = Manifest.read(spark, root).getOrElse(
        throw new IllegalStateException(
          s"table not initialized at $root — call init first"))
      val conf = spark.sessionState.newHadoopConf()
      val fsys = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      val elected = st.statsV.toSeq.filter { case (b, v) =>
        val dir = new org.apache.hadoop.fs.Path(s"$root/rows/v=$v/bkt=$b")
        fsys.listStatus(dir).count(_.getPath.getName.endsWith(".parquet")) >
          maxFilesPerBucket
      }.map(_._1).sorted
      if (elected.nonEmpty && publish) {
        val schema = schemaOf(st)
        val vNew = st.version + 1
        // repartition on bkt puts each elected bucket in ONE task,
        // hence ONE file under its new pin — the compaction itself
        val rewritten = toPhysical(
          readRows(spark, root, st, schema, Some(elected)), schema)
          .repartition(col("bkt"))
        Manifest.commit(spark, root, st.copy(version = vNew,
          statsV = Manifest.writeRepin(rewritten, "rows", root, vNew,
            elected, st.statsV)))
      }
      elected
    }

  /** Garbage-collect unpinned row versions and retire history below
    * the retention floor. */
  def vacuum(spark: SparkSession, root: String,
             retainVersions: Int = 0): TxServeStack.VacuumStats =
    Manifest.withCommitLock(spark, root) {
      val (floor, retained) = Manifest.retainedStates(spark, root,
        retainVersions)
      val live = retained.flatMap(_.statsV.map { case (b, v) =>
        s"v=$v/bkt=$b" }).toSet
      val (deleted, retired, kept) = Manifest.sweepUnpinned(spark, root,
        floor, Seq(Manifest.SweepFamily("rows", 2, live)))
      TxServeStack.VacuumStats(deleted, retired, kept)
    }
}
