package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd single-pass repetition statistics (Gopher-style quality
  * signals): one traversal of the document builds the token and bigram
  * frequency maps in row-local memory and emits
  *
  *   struct(n_tok, n_distinct, top_tok, top_c, top2_c)
  *
  * making per-document repetition a ZERO-SHUFFLE projection. The
  * distributed formulation (explode to (doc_id, token) → two-level
  * groupBy) answers the same question with a corpus-sized exchange — at
  * 100 TB that shuffle carries roughly the whole tokenized corpus to
  * compute a statistic that never leaves the row. Row-local state is
  * bounded by the document's own distinct-token count, the same memory a
  * single aggregation buffer for that document would hold on the reduce
  * side — without the network hop.
  *
  * Parity contract (bit-identical to the DuckDB oracle in
  * [[graft.queries.Registry4]]):
  *  - tokens = split on a single space, trailing empties kept
  *    (`string_split(text, ' ')`);
  *  - top token ties break to the lexicographically LARGEST token in
  *    UTF8 binary order (Spark `max(struct(c, tok))` == DuckDB
  *    `ROW_NUMBER() OVER (ORDER BY c DESC, tok DESC)`);
  *  - bigrams = adjacent token pairs joined by one space (`len-1` of
  *    them); a one-token document has none → top2_c is NULL;
  *  - counts are exact longs; any ratio is computed by the caller as a
  *    single IEEE divide.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_repetition_stats"

  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_tok", StringType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("top2_c", LongType, nullable = true)))

  /** Shared by interpreted and generated paths. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    val tokCounts = new java.util.HashMap[String, Long]()
    val bgCounts = new java.util.HashMap[String, Long]()
    var nTok = 0L
    var prev: String = null
    var start = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || s.charAt(pos) == ' ') {
        val w = s.substring(start, pos)
        nTok += 1
        tokCounts.merge(w, 1L, _ + _)
        if (prev != null) bgCounts.merge(prev + " " + w, 1L, _ + _)
        prev = w
        start = pos + 1
      }
      pos += 1
    }
    // top token: max count, ties to the UTF8-binary-largest token
    var topTok: String = null
    var topC = 0L
    val it = tokCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > topC || (c == topC && (topTok == null ||
          UTF8String.fromString(e.getKey).compareTo(
            UTF8String.fromString(topTok)) > 0))) {
        topTok = e.getKey
        topC = c
      }
    }
    // top bigram: max count only (no tie-break needed — count is the output)
    var top2: Any = null
    val bit = bgCounts.values().iterator()
    while (bit.hasNext) {
      val c = bit.next()
      if (top2 == null || c > top2.asInstanceOf[Long]) top2 = c
    }
    new GenericInternalRow(Array[Any](
      nTok, tokCounts.size().toLong, UTF8String.fromString(topTok), topC, top2))
  }
}
