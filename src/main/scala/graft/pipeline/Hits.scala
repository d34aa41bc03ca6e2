package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TimeFns

/** Raw DataJud hit ingestion: declared schema + flattening projection.
  *
  * The reference builds its 13-column record imperatively in `parse_hit`
  * (/root/reference/src/jurimetria_pipeline.py:163-179) with chained
  * `.get()` defaults; here the same contract is a declared nullable
  * `StructType` (SURVEY.md §1.2) and the flatten is a single `select` of
  * nested field paths — Catalyst `GetStructField`, so schema pruning
  * reaches the scan and missing fields are nulls for free.
  */
object Hits {

  /** Movimento element: typed array<struct>, not the reference's
    * heterogeneous list-of-lists (SURVEY.md §1.3). */
  val movimentoType: StructType = StructType(Seq(
    StructField("codigo", LongType),
    StructField("nome", StringType),
    StructField("dataHora", StringType)))

  /** Schema of one raw hit (FIXTURES.md §1; all fields nullable). */
  val hitSchema: StructType = StructType(Seq(
    StructField("_source", StructType(Seq(
      StructField("numeroProcesso", StringType),
      StructField("classe", StructType(Seq(
        StructField("codigo", LongType),
        StructField("nome", StringType)))),
      StructField("dataAjuizamento", StringType),
      StructField("dataHoraUltimaAtualizacao", StringType),
      StructField("formato", StructType(Seq(
        StructField("nome", StringType)))),
      StructField("orgaoJulgador", StructType(Seq(
        StructField("codigo", StringType),
        StructField("nome", StringType),
        StructField("codigoMunicipioIBGE", StringType)))),
      StructField("grau", StringType),
      StructField("assuntos", ArrayType(StructType(Seq(
        StructField("codigo", LongType),
        StructField("nome", StringType))))),
      StructField("movimentos", ArrayType(movimentoType))))),
    StructField("sort", ArrayType(LongType))))

  /** Epoch used by the reference to sort null movimento timestamps first
    * (/root/reference/src/jurimetria_pipeline.py:82). */
  private val epoch: Column = to_timestamp(lit("1970-01-01 00:00:00"))

  /** F3's ordering comparator, exposed for property tests: sorts an
    * array<struct<…, dataHora timestamp>> ascending with null timestamps
    * first (as epoch-1970). */
  def sortMovimentos(mov: Column): Column =
    array_sort(mov, (l, r) =>
      when(coalesce(l("dataHora"), epoch) < coalesce(r("dataHora"), epoch), -1)
        .when(coalesce(l("dataHora"), epoch) > coalesce(r("dataHora"), epoch), 1)
        .otherwise(0))

  /** P1-P3 + F1-F3: flatten raw hits into the 13-column `processos` frame.
    *
    * - F1: ISO strings parsed as UTC instants, exposed São Paulo semantics
    *   derive via [[TimeFns.utcToSp]] at point of use;
    * - F2: assunto names with null→"" (reference lista_assuntos :61-74);
    * - F3: movimentos mapped to typed structs and sorted by timestamp with
    *   nulls first-as-epoch (reference lista_movimentos :77-82);
    * - P2: constant `tribunal` injected per source partition;
    * - P3: ES cursor = first element of the sort array.
    */
  def parseHits(raw: DataFrame, tribunal: Column): DataFrame = {
    val src = col("_source")
    val movParsed = transform(src("movimentos"), m => struct(
      m("codigo").as("codigo"),
      m("nome").as("nome"),
      to_timestamp(m("dataHora")).as("dataHora")))
    raw.select(
      tribunal.as("tribunal"),
      src("numeroProcesso").as("numero_processo"),
      src("classe")("nome").as("classe"),
      to_timestamp(src("dataAjuizamento")).as("data_ajuizamento"),
      to_timestamp(src("dataHoraUltimaAtualizacao")).as("ultima_atualizacao"),
      src("formato")("nome").as("formato"),
      src("orgaoJulgador")("codigo").as("codigo_orgao"),
      src("orgaoJulgador")("nome").as("orgao_julgador"),
      src("orgaoJulgador")("codigoMunicipioIBGE").as("municipio"),
      src("grau").as("grau"),
      transform(src("assuntos"), a => coalesce(a("nome"), lit(""))).as("assuntos"),
      sortMovimentos(movParsed).as("movimentos"),
      element_at(col("sort"), 1).as("sort"))
  }

  /** F4: sink-side JSON serialization of the movimentos array. The
    * reference emits array-of-arrays `[[codigo,"nome","iso"], ...]` as an
    * Arrow workaround (:239-255); we keep the typed array internally and
    * emit `to_json` array-of-objects — declared deviation (SURVEY.md §7.3). */
  def movimentosJson(mov: Column): Column = to_json(mov)

  /** One movimento, typed (SURVEY.md §1.3). */
  final case class Movimento(codigo: Option[Long], nome: Option[String],
                             dataHora: Option[java.sql.Timestamp])

  /** The 13-column `processos` record, typed (SURVEY.md §1.6 "optional
    * polish": a case-class `Dataset[T]` face over the flattened frame for
    * callers who want compile-time columns; the DataFrame remains the
    * primary currency because the reference's schema is dynamic). */
  final case class Processo(
      tribunal: Option[String], numero_processo: Option[String],
      classe: Option[String], data_ajuizamento: Option[java.sql.Timestamp],
      ultima_atualizacao: Option[java.sql.Timestamp], formato: Option[String],
      codigo_orgao: Option[String], orgao_julgador: Option[String],
      municipio: Option[String], grau: Option[String],
      assuntos: Option[Seq[String]], movimentos: Option[Seq[Movimento]],
      sort: Option[Long])

  /** Typed view of [[parseHits]]' output (pre-JSON-serialization). */
  def typed(flat: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Processo] = {
    val spark = flat.sparkSession
    import spark.implicits._
    flat.as[Processo]
  }
}
