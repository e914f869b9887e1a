package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Extensions

class PruningSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sf, "embeddings")

  // the fixed oracle centroids the query tier pins
  private val cents = Extensions.SemCents

  test("keeps exactly ceil(keepFrac*n) per cell, and the kept set is the " +
      "HARDEST (lowest proto_sim) slice of every cell") {
    val kept = Similarity.prototypesPruneWithCentroids(emb, "vec_id",
      "embedding", cents, keepFrac = 0.25)
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c.toArray) })
      .toDF("cell", "centroid")
    val all = Similarity.prototypesPruneWithCentroids(emb, "vec_id",
      "embedding", cents, keepFrac = 1.0)
    // keepFrac=1.0 keeps every row, with its cell assignment
    assert(all.count() == emb.count())
    val cellSizes = all.groupBy("cell").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val keptSizes = kept.groupBy("cell").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    cellSizes.foreach { case (cell, n) =>
      assert(keptSizes.getOrElse(cell, 0L) == math.ceil(n * 0.25).toLong,
        s"cell $cell: ${keptSizes.getOrElse(cell, 0L)} of $n kept")
    }
    // hardest-first: within each cell, every kept sim <= every dropped sim
    val maxKept = kept.groupBy("cell").agg(max($"proto_sim").as("mk"))
    val dropped = all.join(kept.select($"vec_id"), Seq("vec_id"),
      "left_anti")
    val minDropped = dropped.groupBy("cell").agg(min($"proto_sim").as("md"))
    val bad = maxKept.join(minDropped, Seq("cell"))
      .filter($"mk" > $"md").count()
    assert(bad == 0L, "a kept row is MORE prototypical than a dropped one")
  }

  test("keepEasy flips the policy: kept slice is the most prototypical") {
    val easy = Similarity.prototypesPruneWithCentroids(emb, "vec_id",
      "embedding", cents, keepFrac = 0.25, keepHardest = false)
    val hard = Similarity.prototypesPruneWithCentroids(emb, "vec_id",
      "embedding", cents, keepFrac = 0.25)
    val eAvg = easy.agg(avg($"proto_sim")).as[Double].head()
    val hAvg = hard.agg(avg($"proto_sim")).as[Double].head()
    assert(eAvg > hAvg,
      s"keep-easy mean sim $eAvg must exceed keep-hard $hAvg")
    // same per-cell budgets either way
    assert(easy.count() == hard.count())
  }

  test("trained form: deterministic for a fixed seed, global keep " +
      "fraction within one row per cell of keepFrac") {
    val a = Similarity.prototypesPrune(emb, "vec_id", "embedding",
      nlist = 8, keepFrac = 0.5, seed = 7L)
    val b = Similarity.prototypesPrune(emb, "vec_id", "embedding",
      nlist = 8, keepFrac = 0.5, seed = 7L)
    assert(a.select("vec_id").as[Long].collect().sorted.toSeq ==
      b.select("vec_id").as[Long].collect().sorted.toSeq)
    val n = emb.count().toDouble
    val k = a.count().toDouble
    // each of the 8 cells rounds up by at most one row
    assert(k >= 0.5 * n && k <= 0.5 * n + 8)
  }

  test("invalid keepFrac fails loudly") {
    intercept[IllegalArgumentException] {
      Similarity.prototypesPruneWithCentroids(emb, "vec_id", "embedding",
        cents, keepFrac = 0.0)
    }
    intercept[IllegalArgumentException] {
      Similarity.prototypesPruneWithCentroids(emb, "vec_id", "embedding",
        cents, keepFrac = 1.5)
    }
  }
}
