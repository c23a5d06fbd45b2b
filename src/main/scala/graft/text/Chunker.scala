package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into overlapping
  * fixed-size token windows (size `window`, stride `stride`) — the
  * standard prep step that turns variable-length documents into
  * training sequences without losing the text that crosses a window
  * boundary.
  *
  * Chunk starts are 0, stride, 2·stride, …; the last chunk is the first
  * whose window reaches the end of the document
  * (count = 1 + ceil((n − window)/stride) for n > window, else 1), so no
  * redundant tail chunk that is fully contained in its predecessor is
  * emitted. All arithmetic is integer (DIV), exactly mirrorable in SQL.
  *
  * Scale shape: a pure per-row explode — no shuffle, no state; output
  * rows ≈ corpus tokens / stride. The chunk PLAN (doc_id, start, len) is
  * deliberately emitted instead of materialized token slices: at 100 TB
  * the plan is ~1% the size of the corpus and the slice is a later
  * `slice(tokens, tok_start+1, chunk_len)` against the co-partitioned
  * token column.
  */
object Chunker {

  def chunkPlan(df: DataFrame, textCol: String, idCol: String,
                window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride, s"need 0 < stride <= window")
    df.select(col(idCol).as("doc_id"),
        size(TextAnalysis.words(col(textCol))).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0L),
          expr(s"${stride}L * (CASE WHEN n > ${window}L THEN (n - ${window}L + ${stride - 1}L) DIV ${stride}L ELSE 0L END)"),
          lit(stride.toLong))).as("tok_start"))
      .select(col("doc_id"),
        expr(s"tok_start DIV ${stride}L").as("chunk_idx"),
        col("tok_start"),
        least(lit(window.toLong), col("n") - col("tok_start")).as("chunk_len"))
  }
}
