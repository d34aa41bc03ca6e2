package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LegacySpec extends SparkSpec {
  import spark.implicits._

  test("parseEsajRows: W5 drops short rows, F9 trims, F8 reformats, 6th cell ignored") {
    val rows = Seq(
      Seq(" 0001 ", "ANPP", "Assunto", " Vara X ", "05/03/2024", "extra"),
      Seq("0002", "ANPP", "A", "V", "not-a-date", "x"),
      Seq("too", "short")
    ).toDF("cells")
    val got = Legacy.parseEsajRows(rows, $"cells").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "0001")        // trimmed
    assert(got(0).getString(3) == "Vara X")
    assert(got(0).getString(4) == "2024-03-05")  // reformatted
    assert(got(1).isNullAt(4))                   // unparseable → null
  }

  test("statsProjection: typed 4-field projection with nulls preserved") {
    val raw = Seq(("12729", 2023, Some(120.5), None: Option[Double]))
      .toDF("classe", "ano", "tempo_medio_dias", "taxa_provimento_percent")
    val r = Legacy.statsProjection(raw).head()
    assert(r.getString(0) == "12729" && r.getLong(1) == 2023L)
    assert(r.getDouble(2) == 120.5 && r.isNullAt(3))
  }
}
