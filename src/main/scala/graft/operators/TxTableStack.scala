package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** GENERAL KEYED TABLE under the [[Manifest]] protocol, with
  * TRANSACTIONAL SCHEMA EVOLUTION — the generic form of the
  * specialized ledger stacks (sketch profiles, split assignments,
  * view members are all "rows upserted by key in hash buckets"): one
  * per-bucket-MVCC asset family of after-image rows, upsert/delete/
  * serve/feed/snapshot/vacuum faces, and the face none of the
  * specialized stacks needed until now — ADD-COLUMN evolution as a
  * METADATA-ONLY commit. The training-data use is the doc-metadata
  * sidecar table (language, source, quality, license flags) that
  * gains a column every few months: rewriting 100 TB of stored rows
  * to add a nullable column is exactly what a table format exists to
  * avoid.
  *
  * The manifest carries the CURRENT row schema (DDL in
  * [[Manifest.State.schema]]), versioned like every pin:
  *
  *  - [[evolveSchema]] appends nullable columns and commits — ONE
  *    pointer swap, ZERO data files touched; old buckets stay pinned
  *    at their old versions holding their old (narrower) physical
  *    schema.
  *  - Readers project every pinned file onto THE CUT'S schema —
  *    columns a file predates read as null (the add-column contract
  *    of the published table formats: Iceberg/Delta read missing
  *    fields as null by field resolution; independently implemented
  *    here by name). A snapshot BEFORE the evolution serves the OLD
  *    schema: the cut's manifest renders it, so an old eval replays
  *    against exactly the columns it was written for.
  *  - Writers may LAG the schema: a batch carrying a column subset
  *    null-fills the rest (the crawler fleet that has not deployed
  *    the new field yet); a batch carrying a column the manifest does
  *    not know REFUSES loudly (evolve first — silent column drops are
  *    how data disappears).
  *
  * Everything else is the shared choreography: upserts land
  * after-images in exactly their keys' buckets (O(batch + touched
  * buckets), exactly-once by batch id), deletes drop rows, the change
  * feed diffs re-pinned buckets between two cuts — ACROSS an
  * evolution boundary it projects the before-cut onto the after-cut's
  * schema, so a consumer always sees feed rows in the schema of the
  * cut it is advancing to. An evolution commit alone re-pins nothing
  * and correctly emits an empty feed.
  *
  * No reference counterpart (jurimetria-etl fixes its 13-column frame
  * at parse time); schema evolution follows the published
  * table-format designs, independently implemented. */
object TxTableStack {

  private def bktOf(c: Column, buckets: Int): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  /** Create the table at `root` with its initial row schema (Spark
    * DDL, e.g. `"doc_id LONG, lang STRING"`). The key column is
    * passed per call like every stack's, not stored. */
  def init(spark: SparkSession, root: String, schema: String): Unit =
    Manifest.withCommitLock(spark, root) {
      require(Manifest.read(spark, root).isEmpty,
        s"table already initialized at $root")
      StructType.fromDDL(schema) // validate: refuse unparseable DDL
      Manifest.commit(spark, root,
        Manifest.State(0L, -1L, -1L, Map.empty, schema = schema))
    }

  /** Committed rows of a cut, projected onto THE CUT'S schema
    * (+ bkt): pinned buckets read with footer merging (a bucket's
    * files may span several physical schemas), then every schema
    * column selected by NAME — present columns cast to the declared
    * type, columns the file predates null-filled. */
  private def readRows(spark: SparkSession, root: String,
                       st: Manifest.State,
                       restrict: Option[Seq[Int]]): DataFrame = {
    val target = StructType.fromDDL(st.schema)
    val pinned = restrict match {
      case None => st.statsV
      case Some(bs) => st.statsV.filter { case (b, _) => bs.contains(b) }
    }
    if (pinned.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        target.add("bkt", IntegerType))
    else
      // one read PER VERSION GROUP, each projected onto the cut's
      // schema: a version's files share the physical schema their
      // commit wrote, but ACROSS versions both the column set (added
      // columns) and the column types (widening promotions) may
      // differ — parquet footer merging refuses the latter, so the
      // projection (null-fill + cast) happens per group and the
      // groups union by name. Group count is bounded by the touched
      // buckets' distinct pins, the same order as the path list
      // itself.
      pinned.toSeq.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, bs) =>
        val raw = spark.read.option("basePath", s"$root/rows")
          .parquet(bs.map { case (b, _) =>
            s"$root/rows/v=$v/bkt=$b" }.sorted: _*)
        val have = raw.columns.toSet
        raw.select(target.fields.toSeq.map { f =>
          (if (have(f.name)) col(f.name).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        } :+ col("bkt"): _*)
      }.reduce(_.unionByName(_))
  }

  /** Align `batch` to the manifest schema: columns it carries cast to
    * their declared types, columns it lags null-filled, columns the
    * manifest does not know REFUSED. */
  private def align(batch: DataFrame, schema: StructType): DataFrame = {
    val known = schema.fieldNames.toSet
    val extra = batch.columns.filterNot(known)
    require(extra.isEmpty,
      s"batch carries columns the table schema does not know: " +
        s"${extra.mkString(", ")} — evolveSchema first")
    val have = batch.columns.toSet
    batch.select(schema.fields.toSeq.map { f =>
      (if (have(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
  }

  /** TRANSACTIONAL UPSERT — the batch's rows are AFTER-IMAGES:
    * each replaces its key's stored row wholesale (or inserts), in
    * exactly the batch keys' buckets; rows the batch never named ride
    * through verbatim. The batch must carry each key once. Lagging
    * writers null-fill (see [[align]]). Exactly-once by batch id. */
  def commitBatch(spark: SparkSession, root: String, batch: DataFrame,
                  batchId: Long, keyCol: String, buckets: Int,
                  publish: Boolean = true): Boolean =
    Manifest.commitGuard(spark, root, batchId, publish)(
      throw new IllegalStateException(
        s"table not initialized at $root — call init first")
    ) { (st, vNew) =>
      val target = StructType.fromDDL(st.schema)
      require(target.fieldNames.contains(keyCol),
        s"key column $keyCol is not in the table schema")
      val rows = align(batch, target)
        .withColumn("bkt", bktOf(col(keyCol), buckets))
        .localCheckpoint()
      val touched = rows.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) st.copy(version = vNew, batchId = batchId)
      else {
        val replaced = readRows(spark, root, st, Some(touched))
          .join(rows.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(rows)
        st.copy(version = vNew, batchId = batchId,
          statsV = Manifest.writeRepin(replaced, "rows", root, vNew,
            touched, st.statsV))
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
      val ids = keys.select(col(keyCol)).distinct()
        .withColumn("bkt", bktOf(col(keyCol), buckets))
        .localCheckpoint()
      val touched = ids.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) st.copy(version = vNew, batchId = batchId)
      else {
        val replaced = readRows(spark, root, st, Some(touched))
          .join(ids.select(keyCol), Seq(keyCol), "left_anti")
        st.copy(version = vNew, batchId = batchId,
          statsV = Manifest.writeRepin(replaced, "rows", root, vNew,
            touched, st.statsV))
      }
    }

  /** TRANSACTIONAL MERGE — the conditional-upsert face (MERGE INTO
    * semantics, the published formats' third write shape after upsert
    * and delete): the batch joins stored rows by key; a MATCHED row is
    * re-imaged by the `onMatched` column rules (SQL expressions over
    * the aliases `s` = stored and `b` = batch, e.g.
    * `"views" -> "s.views + b.views"`); matched columns WITHOUT a rule
    * keep their stored value (the standard `UPDATE SET <cols>`
    * contract — [[commitBatch]] is the replace-all `SET *` face);
    * unmatched batch rows INSERT as-is; stored rows the batch never
    * named ride through verbatim. One full-outer join on the key,
    * confined to the batch keys' buckets — O(batch + touched buckets'
    * occupancy), the upsert law. Additive rules like the running
    * `views` counter are NOT idempotent, which is exactly why the
    * guard's batch-id high-water matters: a replayed trigger is
    * absorbed before the join and can never double-apply. */
  def commitMerge(spark: SparkSession, root: String, batch: DataFrame,
                  batchId: Long, keyCol: String, buckets: Int,
                  onMatched: Map[String, String],
                  publish: Boolean = true): Boolean =
    Manifest.commitGuard(spark, root, batchId, publish)(
      throw new IllegalStateException(
        s"table not initialized at $root — call init first")
    ) { (st, vNew) =>
      val target = StructType.fromDDL(st.schema)
      require(target.fieldNames.contains(keyCol),
        s"key column $keyCol is not in the table schema")
      require(!onMatched.contains(keyCol),
        s"the key column $keyCol cannot carry a matched rule — " +
          "re-keying a row is a delete + insert")
      val unknown = onMatched.keySet -- target.fieldNames
      require(unknown.isEmpty,
        s"matched rules name columns the table schema does not know: " +
          s"${unknown.mkString(", ")} — evolveSchema first")
      val rows = align(batch, target)
        .withColumn("bkt", bktOf(col(keyCol), buckets))
        .localCheckpoint()
      val touched = rows.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) st.copy(version = vNew, batchId = batchId)
      else {
        val sKey = col(s"s.$keyCol")
        val bKey = col(s"b.$keyCol")
        val merged = readRows(spark, root, st, Some(touched)).alias("s")
          .join(rows.alias("b"), sKey === bKey, "full_outer")
          .select(target.fields.toSeq.map { f =>
            val sC = col(s"s.${f.name}")
            val bC = col(s"b.${f.name}")
            (if (f.name == keyCol) coalesce(sC, bC)
             else when(sKey.isNotNull && bKey.isNotNull,
                    onMatched.get(f.name).map(expr).getOrElse(sC))
                  .when(sKey.isNull, bC)
                  .otherwise(sC))
              .cast(f.dataType).as(f.name)
          } :+ coalesce(col("s.bkt"), col("b.bkt")).as("bkt"): _*)
        st.copy(version = vNew, batchId = batchId,
          statsV = Manifest.writeRepin(merged, "rows", root, vNew,
            touched, st.statsV))
      }
    }

  /** ADD-COLUMN SCHEMA EVOLUTION — a METADATA-ONLY commit: `addDdl`
    * (e.g. `"quality DOUBLE, license STRING"`) appends to the row
    * schema; every pin rides through untouched, zero data files are
    * read or written, and ONE pointer swap publishes the new schema.
    * New columns read as null on every stored row until an upsert
    * re-images it. Only ADDITION is supported: dropping, renaming, or
    * re-typing a column would change what stored bytes MEAN and is
    * refused — the published formats need field ids for those faces;
    * this stack resolves by name. */
  def evolveSchema(spark: SparkSession, root: String, addDdl: String,
                   publish: Boolean = true): Boolean =
    Manifest.withCommitLock(spark, root) {
      val st = Manifest.read(spark, root).getOrElse(
        throw new IllegalStateException(
          s"table not initialized at $root — call init first"))
      val added = StructType.fromDDL(addDdl)
      val existing = StructType.fromDDL(st.schema).fieldNames.toSet
      val dup = added.fieldNames.filter(existing)
      require(dup.isEmpty,
        s"columns already in the table schema: ${dup.mkString(", ")} — " +
          "only ADD-column evolution is supported")
      if (publish)
        Manifest.commit(spark, root, st.copy(version = st.version + 1,
          schema = s"${st.schema},$addDdl"))
      true
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
    * METADATA-ONLY commit, [[evolveSchema]]'s second face: zero data
    * files touched, one pointer swap. Readers already project every
    * pinned file onto the cut's schema BY NAME WITH A CAST, so files
    * written under the narrower physical type read widened for free —
    * which is exactly why only information-preserving promotions are
    * legal (narrowing or re-typing would corrupt silently where this
    * cast succeeds and throw where it refuses; both are refused here
    * instead). Snapshots before the widening keep serving the
    * narrower type they were written for. */
  def evolveWiden(spark: SparkSession, root: String, colName: String,
                  newType: String, publish: Boolean = true): Boolean =
    Manifest.withCommitLock(spark, root) {
      val st = Manifest.read(spark, root).getOrElse(
        throw new IllegalStateException(
          s"table not initialized at $root — call init first"))
      val cur = StructType.fromDDL(st.schema)
      val field = cur.find(_.name == colName).getOrElse(
        throw new IllegalArgumentException(
          s"column $colName is not in the table schema"))
      val to = StructType.fromDDL(s"x $newType").head.dataType
      require(widenings((field.dataType.sql, to.sql)),
        s"${field.dataType.sql} -> ${to.sql} is not an " +
          "information-preserving promotion — only integral widening " +
          "and float -> double are supported")
      val evolved = cur.fields.map { f =>
        if (f.name == colName) s"${f.name} ${to.sql}"
        else s"${f.name} ${f.dataType.sql}"
      }.mkString(",")
      if (publish)
        Manifest.commit(spark, root,
          st.copy(version = st.version + 1, schema = evolved))
      true
    }

  /** The committed rows of a cut, in the cut's schema — a snapshot
    * BEFORE an evolution serves the narrower schema it was written
    * for. */
  def resolve(spark: SparkSession, root: String,
              version: Option[Long] = None): DataFrame =
    readRows(spark, root, Manifest.stateAt(spark, root, version), None)
      .drop("bkt")

  /** The cut's schema as Spark DDL — what [[resolve]] serves. */
  def schemaAt(spark: SparkSession, root: String,
               version: Option[Long] = None): String =
    Manifest.stateAt(spark, root, version).schema

  /** CHANGE DATA FEED between two cuts, classified insert / delete /
    * update with the after-image riding along (null on delete), IN
    * THE `toVersion` CUT'S SCHEMA: across an evolution boundary the
    * before-cut projects onto the after schema (its new columns read
    * null), so an update whose only difference is a newly-populated
    * column classifies correctly. The pin diff bounds the read; an
    * evolution-only window re-pins nothing and emits nothing. */
  def changes(spark: SparkSession, root: String, fromVersion: Long,
              toVersion: Long, keyCol: String): DataFrame = {
    val stF = Manifest.stateAt(spark, root, Some(fromVersion))
    val stT = Manifest.stateAt(spark, root, Some(toVersion))
    require(stT.batchId >= stF.batchId,
      s"change window is inverted: batch ${stF.batchId} → ${stT.batchId}")
    val changed = Manifest.repinnedBuckets(stF.statsV, stT.statsV)
    val target = StructType.fromDDL(stT.schema)
    val payload = target.fieldNames.toSeq.filterNot(_ == keyCol)
    // the before cut, projected onto the AFTER schema
    val beforeRows = readRows(spark, root, stF.copy(schema = stT.schema),
      Some(changed))
    val before = beforeRows.select(col(keyCol) +:
      payload.map(c => col(c).as(s"_b_$c")) :+ lit(true).as("_bp"): _*)
    val after = readRows(spark, root, stT, Some(changed)).drop("bkt")
      .withColumn("_ap", lit(true))
    val bs = struct(payload.map(c => col(s"_b_$c")): _*)
    val as = struct(payload.map(col): _*)
    before.join(after, Seq(keyCol), "full_outer")
      .select(col(keyCol) +: payload.map(col) :+
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
        val vNew = st.version + 1
        val pins = Manifest.moveFamily(
          readRows(spark, root, st, None)
            .withColumn("bkt", bktOf(col(keyCol), newBuckets)),
          "rows", root, vNew)
        if (publish)
          Manifest.commit(spark, root,
            st.copy(version = vNew, statsV = pins))
        true
      }
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
