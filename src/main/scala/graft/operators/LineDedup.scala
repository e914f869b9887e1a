package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level dedup (the CCNet/RefinedWeb pass): a LINE that recurs
  * across many documents is boilerplate (headers, nav bars, license
  * blurbs) and is removed from every document while the documents
  * themselves survive — the complement of document-level dedup.
  *
  * The caller defines what a line is by passing an array column
  * (real corpora: split on newlines; the fixture corpus: fixed-width
  * word chunks via `TextFunctions.wordChunks`).
  *
  * Scale shape: posexplode → one hash shuffle on the line for the
  * document-frequency count → anti-join kept lines (same key, so the
  * exchange is reused) → per-document reassembly bounded by document
  * size. No step is corpus-quadratic; the frequent-line set is tiny by
  * definition (frequency > threshold).
  */
object LineDedup {

  /** @param maxDocs a line kept only if it occurs in <= maxDocs distinct
    *                documents
    * @return (idCol, clean_text, n_kept, n_dropped) — clean_text is the
    *         surviving lines rejoined in original position order
    */
  def dedupLines(docs: DataFrame, idCol: String, lines: Column,
                 maxDocs: Int): DataFrame = {
    // fanOut: the line split + posexplode runs at scan parallelism —
    // one task on a single-row-group corpus file (guide §2.5)
    val exploded = Par.fanOut(docs).select(col(idCol),
      posexplode(lines).as(Seq("pos", "line")))
    val common = exploded.groupBy("line")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select("line")
    val kept = exploded.join(common, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    // null line arrays: posexplode already dropped them, so report the
    // doc with zero lines rather than null arithmetic downstream
    docs.select(col(idCol), coalesce(size(lines), lit(0)).as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
