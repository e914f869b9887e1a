package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Native

/** ClickHouse FORMAT Native interchange: block framing pinned against
  * the public spec (varint ncols/nrows, per-column name + type
  * strings, columnar values, null maps before values, cumulative
  * UInt64 array offsets), multi-block chunking, the self-describing
  * header check, and the Nullable(Array) prohibition.
  */
class NativeFormatSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def allBytes(dir: String): Array[Byte] = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".native")).sortBy(_.getName)
    files.flatMap(f => java.nio.file.Files.readAllBytes(f.toPath))
  }

  test("golden bytes: one block of (Int64, Nullable(String)) — varint " +
      "header, name/type strings, columnar lanes, null map first") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(258L, "ab"), Row(1L, null)), schema).coalesce(1)
    val dir = tmp("graft_native_golden")
    Native.write(df, dir)
    val expected: Seq[Byte] =
      Seq[Byte](2, 2) ++                                  // ncols, nrows
        Seq[Byte](2, 'i', 'd') ++                         // name "id"
        Seq[Byte](5, 'I', 'n', 't', '6', '4') ++          // type
        Seq[Byte](2, 1, 0, 0, 0, 0, 0, 0,                 // 258 LE
          1, 0, 0, 0, 0, 0, 0, 0) ++                      // 1 LE
        Seq[Byte](1, 's') ++                              // name "s"
        ("Nullable(String)".length.toByte +:              // type len 16
          "Nullable(String)".getBytes("UTF-8").toSeq.map(_.toByte)) ++
        Seq[Byte](0, 1) ++                                // null map
        Seq[Byte](2, 'a', 'b') ++                         // "ab"
        Seq[Byte](0)                                      // default ""
    assert(allBytes(dir).toSeq == expected)
  }

  test("array column: cumulative UInt64 offsets then flattened " +
      "elements; empty arrays round-trip; element nulls use the " +
      "flattened null map") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("xs", ArrayType(IntegerType, containsNull = true),
        nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Seq(10, 20)), Row(2L, Seq.empty[Int]),
        Row(3L, Seq(null, 30))),
      schema).coalesce(1)
    val dir = tmp("graft_native_arr")
    Native.write(df, dir)
    val back = Native.read(spark, dir, schema)
      .collect().sortBy(_.getLong(0))
    assert(back(0).getSeq[Any](1) == Seq(10, 20))
    assert(back(1).getSeq[Any](1) == Seq.empty)
    assert(back(2).getSeq[Any](1) == Seq(null, 30))
  }

  test("multi-block: blockRows smaller than the partition chunks the " +
      "stream and every block re-carries the verified header") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false)))
    val rows = (1L to 5L).map(Row(_))
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      schema).coalesce(1)
    val dir = tmp("graft_native_blocks")
    Native.write(df, dir, blockRows = 2)
    // 3 blocks → the (name, type) header appears 3 times in the bytes
    val bytes = allBytes(dir)
    val headerCount = bytes.sliding(2).count(w => w(0) == 2 && w(1) == 'i')
    assert(headerCount >= 3)
    val back = Native.read(spark, dir, schema).collect().map(_.getLong(0))
    assert(back.sorted.toSeq == (1L to 5L))
  }

  test("self-describing header is verified: a schema whose column name " +
      "or type differs from the block header fails loudly") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L)), schema).coalesce(1)
    val dir = tmp("graft_native_drift")
    Native.write(df, dir)
    val renamed = StructType(Seq(
      StructField("event_id", LongType, nullable = false)))
    val e1 = intercept[org.apache.spark.SparkException] {
      Native.read(spark, dir, renamed).collect()
    }
    assert(e1.getMessage.contains("schema expects") ||
      Option(e1.getCause).exists(_.getMessage.contains("schema expects")))
    val retyped = StructType(Seq(
      StructField("id", IntegerType, nullable = false)))
    val e2 = intercept[org.apache.spark.SparkException] {
      Native.read(spark, dir, retyped).collect()
    }
    assert(e2.getMessage.contains("schema expects") ||
      Option(e2.getCause).exists(_.getMessage.contains("schema expects")))
  }

  test("NULL in a non-nullable lane and NULL arrays fail loudly at " +
      "encode (CH forbids Nullable(Array))") {
    val schema = StructType(Seq(
      StructField("xs", ArrayType(IntegerType, containsNull = false),
        nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(null)), schema).coalesce(1)
    val dir = tmp("graft_native_nullarr")
    val e = intercept[org.apache.spark.SparkException] {
      Native.write(df, dir)
    }
    assert(e.getMessage.contains("Nullable(Array)") ||
      Option(e.getCause).exists(_.getMessage.contains("Nullable(Array)")))
  }

  test("full-type roundtrip incl. nullable timestamp/decimal lanes and " +
      "multi-partition files") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("d", DecimalType(18, 4), nullable = true),
      StructField("f", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val rows = (1L to 20L).map { i =>
      Row(i,
        if (i % 5 == 0) null
        else java.sql.Timestamp.valueOf(s"2024-01-0${(i % 9) + 1} 10:00:00"),
        if (i % 4 == 0) null else new java.math.BigDecimal(s"$i.25"),
        if (i % 3 == 0) null else i / 8.0,
        if (i % 7 == 0) null else s"v$i")
    }
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      schema).repartition(3)
    val dir = tmp("graft_native_rt")
    Native.write(df, dir, blockRows = 7)
    val back = Native.read(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r)).toMap
    assert(back.size == 20)
    rows.foreach { r =>
      val b = back(r.getLong(0))
      assert(b == r, s"row ${r.getLong(0)}: $b != $r")
    }
  }
}
