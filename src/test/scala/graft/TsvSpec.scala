package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Tsv

/** ClickHouse FORMAT TSVWithNamesAndTypes: the two-header text
  * dialect — escaping grammar, \N nulls, header verification, and the
  * lossless self-round-trip over every supported scalar lane.
  */
class TsvSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def allText(dir: String): String = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tsv")).sortBy(_.getName)
    files.map(f => new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).mkString
  }

  test("escape/unescape: CH grammar round-trips tab, newline, CR, " +
      "backslash, NUL; unknown escapes pass through") {
    val nasty = "a\tb\nc\rd\\e\u0000f"
    assert(Tsv.unescape(Tsv.escape(nasty)) == nasty)
    assert(Tsv.escape(nasty) == "a\\tb\\nc\\rd\\\\e\\0f")
    assert(Tsv.unescape("x\\qy") == "x\\qy") // unknown escape preserved
  }

  test("golden text: two header rows (names, CH types) then escaped " +
      "values with \\N for NULL") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "a\tb"), Row(2L, null)), schema).coalesce(1)
    val dir = tmp("graft_tsv_golden")
    Tsv.write(df, dir)
    assert(allText(dir) ==
      "id\ts\nInt64\tNullable(String)\n1\ta\\tb\n2\t\\N\n")
  }

  test("header verification: renamed column and re-typed column both " +
      "fail loudly; an empty string row survives (not dropped as a " +
      "blank line)") {
    val schema = StructType(Seq(
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row("x"), Row("")), schema).coalesce(1)
    val dir = tmp("graft_tsv_hdr")
    Tsv.write(df, dir)
    val back = Tsv.read(spark, dir, schema).collect().map(_.getString(0))
    assert(back.sorted.toSeq == Seq("", "x"))
    val renamed = StructType(Seq(StructField("t", StringType, true)))
    val e1 = intercept[org.apache.spark.SparkException] {
      Tsv.read(spark, dir, renamed).collect()
    }
    assert(e1.getMessage.contains("header names") ||
      Option(e1.getCause).exists(_.getMessage.contains("header names")))
    val retyped = StructType(Seq(StructField("s", IntegerType, true)))
    val e2 = intercept[org.apache.spark.SparkException] {
      Tsv.read(spark, dir, retyped).collect()
    }
    assert(e2.getMessage.contains("header types") ||
      Option(e2.getCause).exists(_.getMessage.contains("header types")))
  }

  test("full scalar round-trip: timestamps at µs, decimals at wire " +
      "scale, bools, doubles via shortest-repr, nulls everywhere, " +
      "multi-partition headers per file") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("d", DecimalType(18, 4), nullable = true),
      StructField("f", DoubleType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val rows = (1L to 20L).map { i =>
      Row(i,
        if (i % 5 == 0) null
        else java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(1700000000L + i, i * 1000L)),
        if (i % 4 == 0) null else new java.math.BigDecimal(s"$i.2500"),
        if (i % 3 == 0) null else i / 8.0,
        if (i % 6 == 0) null else i % 2 == 0,
        if (i % 7 == 0) null else s"v\t$i\n.")
    }
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      schema).repartition(3)
    val dir = tmp("graft_tsv_rt")
    Tsv.write(df, dir)
    val back = Tsv.read(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r)).toMap
    assert(back.size == 20)
    rows.foreach(r => assert(back(r.getLong(0)) == r,
      s"row ${r.getLong(0)}: ${back(r.getLong(0))} != $r"))
  }

  test("arrays are rejected up front with a pointer to the binary " +
      "dialects") {
    val schema = StructType(Seq(
      StructField("xs", ArrayType(IntegerType), nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq(1))), schema)
    val e = intercept[IllegalArgumentException] {
      Tsv.write(df, tmp("graft_tsv_arr"))
    }
    assert(e.getMessage.contains("scalar lanes only"))
  }
}
