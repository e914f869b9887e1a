package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.operators.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression is bit-equal to the HOF formulation on fixture vectors") {
    val emb = Tables.load(spark, sf, "embeddings")
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < $"b.vec_id").limit(2000)
      .select(
        Similarity.cosine($"a.embedding", $"b.embedding", 12).as("hof"),
        graft.functions.Rounding.pround(
          CosineSimilarity.column(spark, $"a.embedding", $"b.embedding"), 12)
          .as("native"))
    assert(pairs.filter($"hof" =!= $"native").count() == 0)
  }

  test("native expression survives SQL registration") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .as[Double].head()
    assert(r == 1.0)
  }

  test("null array yields null") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS c")
      .select(isnull($"c")).as[Boolean].head()
    assert(r)
  }
}
