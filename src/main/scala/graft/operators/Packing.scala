package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: the final step before a training run,
  * where documents are laid end-to-end and split into fixed-length
  * training sequences. A document's `bin` is the sequence its first
  * token lands in (concatenate-then-chunk packing); `start_offset` is
  * its position in the group's token stream, so a loader can seek
  * straight to it.
  *
  * Scale shape: one window per packing group (shard/language/source) —
  * a single hash shuffle on the group key, then a linear running sum
  * inside each partition. The cumulative sum is inherently sequential
  * PER GROUP, which is why the group key matters: packing the whole
  * corpus as one group would serialize 100 TB through one task, while
  * per-shard groups (how loaders consume data anyway) keep every
  * partition independent.
  */
object Packing {

  /** @param tokens token-count expression per document (kept exact —
    *               integer arithmetic end to end)
    * @param budget tokens per training sequence (e.g. 2048/4096/8192)
    * @return (idCol, groupCol, n_tokens, start_offset, bin)
    */
  def packBins(docs: DataFrame, idCol: String, groupCol: String,
               tokens: Column, budget: Int): DataFrame =
    packBins(docs, idCol, groupCol, tokens, budget, Seq(col(idCol)))

  /** Packing in an explicit order — pass
    * `Sampling.shuffleKey(col(id), seed)` (plus the id as tie-break) to
    * lay documents out in reproducible pseudo-random training order
    * before chunking, the shuffle-then-pack shape training runs want.
    * The order columns must totally order each group or offsets are
    * nondeterministic.
    */
  def packBins(docs: DataFrame, idCol: String, groupCol: String,
               tokens: Column, budget: Int,
               order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(groupCol), tokens.as("n_tokens"))
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      // integer division keeps the promised exact arithmetic: offsets
      // are non-negative longs, so `div` equals mathematical floor and
      // never round-trips through a double
      .withColumn("bin", expr(s"start_offset div ${budget}L"))
  }
}
