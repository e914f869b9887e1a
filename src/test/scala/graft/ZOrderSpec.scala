package graft

import org.apache.spark.sql.functions._

import graft.sources.IO

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Mean per-file (max-min) span of `c`, as a fraction of its global
    * span, across the part files under `path`.
    */
  private def meanFileSpan(path: String, c: String): Double = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
    assert(files.length > 1, s"expected several part files, got ${files.length}")
    val global = spark.read.parquet(path)
      .agg((max(col(c)) - min(col(c))).cast("double")).head().getDouble(0)
    val spans = files.map { f =>
      spark.read.parquet(f)
        .agg((max(col(c)) - min(col(c))).cast("double")).head().getDouble(0)
    }
    (spans.sum / spans.length) / global
  }

  test("z-order write narrows per-file spans on BOTH dimensions; a " +
      "linear sort narrows only its own") {
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "ts", "value")
    val zPath = tempDir("zorder")
    // 16 files over the 16×16 Morton grid: 16 aligned z-cells per file
    // = a 4×4 block, so BOTH dims should span ≈1/4 of their range per
    // file (plus quantile-bucket noise)
    IO.writeZOrdered(e, zPath, Seq("user_id", "value"), bits = 4,
      numFiles = 16)

    val zUser = meanFileSpan(zPath, "user_id")
    val zValue = meanFileSpan(zPath, "value")
    assert(zUser < 0.45, s"z-order user_id span fraction $zUser")
    assert(zValue < 0.45, s"z-order value span fraction $zValue")

    // reference layout: range-sorted on user_id alone — value files
    // stay (near) full-width, which is exactly what z-order fixes
    val sortPath = tempDir("sorted1d")
    e.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(sortPath)
    val sUser = meanFileSpan(sortPath, "user_id")
    val sValue = meanFileSpan(sortPath, "value")
    assert(sUser < 0.5, s"sanity: 1-D sort narrows its own key, $sUser")
    assert(sValue > 0.6, s"1-D sort should leave value wide, got $sValue")
    assert(zValue < sValue / 2,
      s"z-order ($zValue) must beat 1-D sort ($sValue) on the second dim")
  }

  test("z-order write is content-preserving") {
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "ts", "value")
    val path = tempDir("zorder_rt")
    IO.writeZOrdered(e, path, Seq("user_id", "value"), bits = 4,
      numFiles = 4)
    val back = spark.read.parquet(path)
    assert(back.columns.toSeq == e.columns.toSeq,
      "the internal z key must not leak into the written schema")
    assert(back.exceptAll(e).count() == 0 && e.exceptAll(back).count() == 0)
  }

  test("guards: one column or too many bits are rejected") {
    val e = Tables.load(spark, sf, "events").select("event_id", "user_id")
    intercept[IllegalArgumentException](
      IO.zOrderKey(e, Seq("user_id")))
    intercept[IllegalArgumentException](
      IO.zOrderKey(e, Seq("event_id", "user_id"), bits = 31))
  }
}
