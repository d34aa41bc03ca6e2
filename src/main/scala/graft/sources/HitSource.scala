package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JsonToStructs, Literal}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.pipeline.Hits

/** DataSourceV2 for DataJud hit pages — the "live port" shape of the
  * reference's paginated per-court collector (SURVEY.md §2 S1,
  * /root/reference/src/jurimetria_pipeline.py:96-160), re-hosted over
  * JSON-lines page files in this zero-egress repo:
  *
  *  - **one InputPartition per tribunal** (the reference's sequential
  *    `for trib in tribunais` loop becomes partition parallelism);
  *  - **court pruning**: an `EqualTo("tribunal", …)` filter skips whole
  *    partitions — the engine-side analog of only issuing HTTP requests
  *    to the courts in scope;
  *  - **limit pushdown** (`SupportsPushDownLimit`): the reader stops
  *    consuming pages once it has `limit` rows, like `max_processos`
  *    breaking the pagination loop (:225-231);
  *  - **schema pruning** (`SupportsPushDownRequiredColumns`): the JSON
  *    parser only materializes requested fields, the file-source analog
  *    of ES `_source` filtering.
  *
  * A live HTTP variant would swap [[HitPartitionReader]]'s line iterator
  * for a `search_after` page loop and add `SupportsPushDownFilters`
  * compilation to an ES `term` query — the planner-facing surface stays
  * exactly this.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.HitSource")
  *   .option("path.TJSP", "/data/tjsp").option("path.TJCE", "/data/tjce")
  *   .load()
  * }}}
  */
class HitSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HitSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HitTable(HitSource.tribunalDirs(properties.asScala.toMap))
}

object HitSource {
  /** Raw hit schema + the per-partition tribunal constant (P2 at source). */
  val fullSchema: StructType =
    StructType(StructField("tribunal", StringType, nullable = false) +:
      Hits.hitSchema.fields)

  def tribunalDirs(props: Map[String, String]): Seq[(String, String)] =
    props.collect {
      case (k, v) if k.toLowerCase.startsWith("path.") => k.drop(5).toUpperCase -> v
    }.toSeq.sortBy(_._1)
}

final class HitTable(dirs: Seq[(String, String)]) extends Table with SupportsRead {
  override def name(): String = s"datajud_hits(${dirs.map(_._1).mkString(",")})"
  override def schema(): StructType = HitSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HitScanBuilder(dirs)
}

final class HitScanBuilder(dirs: Seq[(String, String)])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var requiredSchema: StructType = HitSource.fullSchema
  private var tribunalFilter: Option[String] = None
  private var pushedLimit: Int = -1
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("tribunal", _: String) => true
      case _ => false
    }
    accepted.foreach { case EqualTo(_, v: String) => tribunalFilter = Some(v) }
    pushed = accepted
    rejected // everything else evaluates post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = limit
    false // partial push: each partition stops early, Spark re-limits globally
  }

  override def build(): Scan = new HitScan(
    dirs.filter(d => tribunalFilter.forall(_ == d._1)),
    requiredSchema, pushedLimit)
}

final case class HitInputPartition(tribunal: String, dir: String) extends InputPartition

final class HitScan(dirs: Seq[(String, String)], required: StructType,
                    limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"HitScan(tribunals=${dirs.map(_._1).mkString(",")}, limit=$limit)"
  override def planInputPartitions(): Array[InputPartition] =
    dirs.map { case (t, d) => HitInputPartition(t, d) }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new HitReaderFactory(required, limit)
}

final class HitReaderFactory(required: StructType, limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HitPartitionReader(partition.asInstanceOf[HitInputPartition], required, limit)
}

/** Streams one court's page files line by line; a live variant would walk
  * the `search_after` cursor here instead. */
final class HitPartitionReader(part: HitInputPartition,
                               required: StructType, limit: Int)
    extends PartitionReader[InternalRow] {

  private val wantTribunal = required.fieldNames.contains("tribunal")
  // parse only the non-injected fields actually requested — schema pruning
  // reaches the JSON parser exactly like ES _source filtering
  private val parseSchema = StructType(required.fields.filterNot(_.name == "tribunal"))
  private val parser = JsonToStructs(parseSchema, Map.empty[String, String],
    Literal(null, StringType), Some("UTC"))

  private val files: Iterator[java.nio.file.Path] = {
    val d = java.nio.file.Paths.get(part.dir)
    if (java.nio.file.Files.isDirectory(d))
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString).iterator
    else Iterator.empty
  }
  // stream lines (constant memory per page file, like the reference's
  // hit-at-a-time generator) rather than materializing whole files
  private var reader: java.io.BufferedReader = _
  private var pending: String = _
  private var current: InternalRow = _
  private var served = 0

  private def nextLine(): String = {
    while (true) {
      if (reader == null) {
        if (!files.hasNext) return null
        reader = java.nio.file.Files.newBufferedReader(files.next())
      }
      val l = reader.readLine()
      if (l != null) return l
      reader.close()
      reader = null
    }
    null // unreachable
  }

  override def next(): Boolean = {
    if (limit >= 0 && served >= limit) return false // stop paging (L1)
    pending = nextLine()
    if (pending == null) return false
    val line = pending
    val parsed = parser.nullSafeEval(UTF8String.fromString(line))
      .asInstanceOf[InternalRow]
    val out = new GenericInternalRow(required.length)
    var i = 0
    var j = 0
    while (i < required.length) {
      if (required.fields(i).name == "tribunal") {
        out.update(i, UTF8String.fromString(part.tribunal))
      } else {
        out.update(i, if (parsed == null) null else parsed.get(j, parseSchema.fields(j).dataType))
        j += 1
      }
      i += 1
    }
    current = out
    served += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit =
    if (reader != null) { reader.close(); reader = null }
}
