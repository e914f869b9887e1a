package graft

/** The SparkSessionExtensions registration path: the same function
  * descriptions injected by `spark.sql.extensions=graft.GraftExtensions`
  * are installed on the live session and driven through pure SQL.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("cosine_sim and kmv_distinct are callable from SQL after install") {
    GraftExtensions.install(spark)
    val cos = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS c
        |""".stripMargin).head().getDouble(0)
    assert(math.abs(cos - 0.6) < 1e-6) // float32 inputs: ~1e-8 rounding
    val est = spark.sql(
      "SELECT kmv_distinct(id, 64) FROM range(0, 1000)").head().getLong(0)
    // KMV with k=64 over 1000 exact-distinct values: generous ±30% band
    assert(est > 700 && est < 1300, s"estimate $est out of band")
    // char_entropy: 'aabb' = 1 bit exactly; gibberish above prose
    val ent = spark.sql("SELECT char_entropy('aabb') AS e").head().getDouble(0)
    assert(ent == 1.0, s"2 symbols × equal counts must be exactly 1 bit: $ent")
    // install is idempotent (createOrReplace semantics)
    GraftExtensions.install(spark)
  }

  test("kmv_distinct rejects a non-constant k with the contract message") {
    GraftExtensions.install(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(id, id) FROM range(0, 10)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        messages(x.getCause))
    assert(messages(e).exists(_.contains("k must be a constant")),
      s"unexpected error: ${e.getMessage}")
  }

  test("class-based entry point wires the same builders") {
    // the (SparkSessionExtensions => Unit) contract the config path uses
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders shared
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("char_entropy", "cm_sketch", "cosine_sim", "dict_get",
        "dict_get_or_default", "kmv_distinct", "misra_gries",
        "misra_gries_w", "phrase_hits"))
  }

  test("cm_sketch and phrase_hits are callable from SQL after install") {
    GraftExtensions.install(spark)
    // 3 distinct keys on a wide grid: every point estimate is exact
    val cells = spark.sql(
      """SELECT cm_sketch(CAST(id % 3 AS STRING), 2, 1024) AS c
        |FROM range(0, 30)""".stripMargin)
      .head().getSeq[Long](0)
    assert(cells.sum == 30 * 2 && cells.count(_ > 0) <= 6)
    val hits = spark.sql(
      "SELECT phrase_hits('the quick brown fox', " +
        "array('quick brown', 'fox', 'cat')) AS h")
      .head().getSeq[String](0)
    assert(hits == Seq("quick brown", "fox"))
    // non-foldable phrase list fails with the contract message
    val e = intercept[Exception] {
      spark.sql("SELECT phrase_hits(CAST(id AS STRING), " +
        "array(CAST(id AS STRING))) FROM range(0, 3)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        messages(x.getCause))
    assert(messages(e).exists(_.contains("foldable")),
      s"unexpected error: ${e.getMessage}")
  }
}
