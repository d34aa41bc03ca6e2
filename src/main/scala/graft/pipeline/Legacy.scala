package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** The legacy connector's row-level semantics (SURVEY.md §2 S3/S4, P4/P5,
  * W5, F8/F9), re-expressed over a relation of already-extracted cell
  * arrays. The HTML fetch/parse itself is out of engine scope (screen
  * scrape, zero-egress repo); what the engine owns is everything after
  * the cells exist — malformed-row filtering, projection, trimming and
  * date reformatting (/root/reference/legacy/legacy_datajud_connector.py:53-75).
  */
object Legacy {

  /** P5 + W5 + F8 + F9: rows with <6 cells are dropped; first 5 cells
    * project to named columns (the 6th is ignored, like the reference);
    * every cell is trimmed; `data` reformats dd/MM/yyyy → yyyy-MM-dd with
    * unparseable → null. `cells` is an array<string> column. */
  def parseEsajRows(rows: DataFrame, cells: Column): DataFrame =
    rows
      .filter(size(cells) >= 6)
      .select(
        trim(element_at(cells, 1)).as("processo"),
        trim(element_at(cells, 2)).as("classe"),
        trim(element_at(cells, 3)).as("assunto"),
        trim(element_at(cells, 4)).as("orgao"),
        TimeFns.reformatBrDate(trim(element_at(cells, 5))).as("data"))

  /** P4: the DataJud stats record projection
    * (legacy_datajud_connector.py:128-146) — two metric fields plus the
    * request echo, nulls preserved. */
  def statsProjection(raw: DataFrame): DataFrame =
    raw.select(
      col("classe").cast("string").as("classe"),
      col("ano").cast("long").as("ano"),
      col("tempo_medio_dias").cast("double").as("tempo_medio_dias"),
      col("taxa_provimento_percent").cast("double").as("taxa_provimento_percent"))
}
