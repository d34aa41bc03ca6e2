package graft.pipeline

/** Drop-in CLI for the reference's main entry point (SURVEY.md §3 E1,
  * /root/reference/src/jurimetria_pipeline.py:299-364):
  *
  * {{{
  * runMain graft.pipeline.JurimetriaCli
  *   --hits-dir <root>            # <root>/<TRIB>/ holds that court's page files
  *   --tribunais TJSP TJCE ...
  *   [--classe <nome>] [--classe-codigo <n>]   # mutually exclusive, like argparse
  *   [--de yyyy-MM-dd] [--ate yyyy-MM-dd]
  *   [--max-processos N]
  *   [--municipios <csv>]         # CD_MUN,NM_MUN lookup (XLS converted;
  *                                # SURVEY §7.3); omitted → codes pass
  *                                # through unenriched (J1 fallback)
  *   --out <dir>
  * }}}
  *
  * Differences from the reference, all declared:
  *  - the paginated HTTP source is re-hosted as page files per court
  *    (zero-egress; the DSV2 [[graft.sources.HitSource]] is the live-port
  *    shape);
  *  - no API-key handling (no network);
  *  - the chart sink (K3) becomes the histogram RELATION written as CSV —
  *    the query feeding the chart is engine scope, the JPEG is not.
  */
object JurimetriaCli {

  final case class Args(
      hitsDir: String = "",
      tribunais: Seq[String] = Nil,
      classeNome: Option[String] = None,
      classeCodigo: Option[Long] = None,
      de: Option[String] = None,
      ate: Option[String] = None,
      maxProcessos: Option[Int] = None,
      municipiosCsv: Option[String] = None,
      out: String = "")

  /** argparse-equivalent: flags with values, --tribunais consuming
    * everything until the next flag; unknown flag or a flag token where a
    * value is expected → IllegalArgumentException (argparse rejects both). */
  def parseArgs(argv: Seq[String]): Args = {
    def value(flag: String, v: String): String = {
      if (v.startsWith("--")) throw new IllegalArgumentException(
        s"$flag expects a value, got flag '$v'")
      v
    }
    def go(rest: List[String], acc: Args): Args = rest match {
      case Nil => acc
      case (f @ "--hits-dir") :: v :: t => go(t, acc.copy(hitsDir = value(f, v)))
      case "--tribunais" :: t =>
        val (ts, t2) = t.span(!_.startsWith("--"))
        go(t2, acc.copy(tribunais = ts))
      case (f @ "--classe") :: v :: t => go(t, acc.copy(classeNome = Some(value(f, v))))
      case (f @ "--classe-codigo") :: v :: t => go(t, acc.copy(classeCodigo = Some(value(f, v).toLong)))
      case (f @ "--de") :: v :: t => go(t, acc.copy(de = Some(value(f, v))))
      case (f @ "--ate") :: v :: t => go(t, acc.copy(ate = Some(value(f, v))))
      case (f @ "--max-processos") :: v :: t => go(t, acc.copy(maxProcessos = Some(value(f, v).toInt)))
      case (f @ "--municipios") :: v :: t => go(t, acc.copy(municipiosCsv = Some(value(f, v))))
      case (f @ "--out") :: v :: t => go(t, acc.copy(out = value(f, v)))
      case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
    }
    val a = go(argv.toList, Args())
    require(a.hitsDir.nonEmpty && a.tribunais.nonEmpty && a.out.nonEmpty,
      "--hits-dir, --tribunais and --out are required")
    require(a.classeNome.isEmpty || a.classeCodigo.isEmpty,
      "--classe and --classe-codigo are mutually exclusive") // argparse :311-318
    a
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv.toSeq)
    val spark = graft.GraftSession.create()
    // classe-codigo filters pre-flatten on the raw nested field (W2 analog
    // of the ES term query on classe.codigo); classe nome filters the
    // flattened column inside transformTail
    val hitDirs = a.tribunais.map(t => t -> s"${a.hitsDir}/$t").toMap
    val municipios = a.municipiosCsv.map { csv =>
      spark.read.option("header", "true")
        .schema("CD_MUN LONG, NM_MUN STRING").csv(csv)
    }.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("CD_MUN LONG, NM_MUN STRING")))
    val conf = PipelineConfig(
      classeNome = a.classeNome, classeCodigo = a.classeCodigo,
      de = a.de, ate = a.ate, maxProcessos = a.maxProcessos)
    // cache: persist() (isEmpty + parquet + csv), count and the histogram
    // are four actions over the same frame — without this the JSON scan +
    // flatten + join would recompute per action
    val df = JurimetriaPipeline.run(spark, hitDirs, municipios, conf).cache()
    try {
      val persisted = JurimetriaPipeline.persist(df, a.out)
      println(s"processos=${df.count()} persisted=$persisted") // A2 (:362)
      if (persisted) {
        // K3's feeding query (A1/F7/O2): the histogram RELATION as CSV —
        // the reference re-derives the agg input from the persisted column
        // (:275), which run()'s frame already is
        JurimetriaPipeline.hourHistogram(df)
          .write.mode("overwrite").option("header", "true")
          .csv(s"${a.out}/horario.csv")
      }
    } finally df.unpersist()
    spark.stop()
  }
}
