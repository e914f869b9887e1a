package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.RowBinary

/** ClickHouse FORMAT RowBinary interchange: byte-level layout pinned
  * against the public spec (LE numerics, LEB128 string lengths,
  * Nullable flag bytes, DateTime64(6) µs, Array counts), plus
  * roundtrips over every supported type and the loud-failure contract
  * for truncated streams and unsupported types.
  */
class RowBinarySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def allBytes(dir: String): Array[Byte] = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".rowbinary")).sortBy(_.getName)
    files.flatMap(f => java.nio.file.Files.readAllBytes(f.toPath))
  }

  test("golden bytes: non-nullable (Int64, String) row matches the " +
      "spec layout — 8 LE bytes then LEB128 length + UTF-8") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(258L, "ab")), schema).coalesce(1)
    val dir = tmp("graft_rb_golden")
    RowBinary.write(df, dir)
    val bytes = allBytes(dir)
    // 258 = 0x0102 → LE: 02 01 00*6; "ab" → len 02, 0x61 0x62
    assert(bytes.toSeq == Seq[Byte](2, 1, 0, 0, 0, 0, 0, 0, 2, 0x61, 0x62))
  }

  test("golden bytes: Nullable flag byte precedes the value (0x00 = " +
      "present, 0x01 = NULL with no payload)") {
    val schema = StructType(Seq(StructField("v", IntegerType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(7), Row(null)), schema).coalesce(1)
    val dir = tmp("graft_rb_null")
    RowBinary.write(df, dir)
    assert(allBytes(dir).toSeq == Seq[Byte](0, 7, 0, 0, 0, 1))
  }

  test("golden bytes: LEB128 length for a 200-char string is two bytes " +
      "(0xC8 0x01)") {
    val schema = StructType(Seq(StructField("s", StringType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(Row("x" * 200)), schema).coalesce(1)
    val dir = tmp("graft_rb_varint")
    RowBinary.write(df, dir)
    val b = allBytes(dir)
    assert((b(0) & 0xff) == 0xc8 && b(1) == 1 && b.length == 202)
  }

  test("golden bytes: Decimal lanes are the unscaled int, LE, sized by " +
      "precision alone — Decimal32/64/128 for P≤9/18/38") {
    val schema = StructType(Seq(
      StructField("d9", DecimalType(9, 2), nullable = false),
      StructField("d18", DecimalType(18, 4), nullable = false),
      StructField("d38", DecimalType(38, 10), nullable = false)))
    val df = spark.createDataFrame(java.util.List.of(Row(
      new java.math.BigDecimal("123.45"),     // unscaled 12345 = 0x3039
      new java.math.BigDecimal("-1.0001"),    // unscaled -10001
      new java.math.BigDecimal("-2.0000000001") // unscaled -20000000001
    )), schema).coalesce(1)
    val dir = tmp("graft_rb_dec")
    RowBinary.write(df, dir)
    val b = allBytes(dir)
    assert(b.length == 4 + 8 + 16)
    // Decimal32: 12345 = 0x00003039 → LE 39 30 00 00
    assert(b.take(4).map(_ & 0xff).toSeq == Seq(0x39, 0x30, 0x00, 0x00))
    // Decimal64: -10001 = 0x...FFFFD8EF → LE EF D8 FF FF FF FF FF FF
    assert(b.slice(4, 12).map(_ & 0xff).toSeq ==
      Seq(0xef, 0xd8, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff))
    // Decimal128: -20000000001 = -0x4A817C801 → two's complement
    // 0x...FFFB57E837FF → LE FF 37 E8 57 FB FF*11
    assert(b.slice(12, 28).map(_ & 0xff).toSeq ==
      Seq(0xff, 0x37, 0xe8, 0x57, 0xfb) ++ Seq.fill(11)(0xff))
  }

  test("decimal roundtrip: all three lane widths, negatives, nulls and " +
      "extreme unscaled values survive; scale mismatch fails loudly") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d9", DecimalType(9, 2)),
      StructField("d18", DecimalType(18, 0)),
      StructField("d38", DecimalType(38, 10))))
    val maxD18 = new java.math.BigDecimal(new java.math.BigInteger("9" * 18))
    val maxD38 = new java.math.BigDecimal(
      new java.math.BigInteger("9" * 38), 10)
    val rows = java.util.List.of(
      Row(1L, new java.math.BigDecimal("0.01"),
        maxD18,
        maxD38),
      Row(2L, new java.math.BigDecimal("-9999999.99"),
        maxD18.negate(),
        maxD38.negate()),
      Row(3L, null, null, null))
    val df = spark.createDataFrame(rows, schema).coalesce(1)
    val dir = tmp("graft_rb_dec_rt")
    RowBinary.write(df, dir)
    val back = RowBinary.read(spark, dir, schema).orderBy("id").collect()
    assert(back.map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
    assert(RowBinary.chType(DecimalType(9, 2)) == "Decimal(9, 2)")
    assert(RowBinary.chType(DecimalType(38, 10)) == "Decimal(38, 10)")
  }

  test("loud failure: a length prefix past the end of the buffer " +
      "reports truncation instead of attempting the allocation") {
    val schema = StructType(Seq(StructField("s", StringType, nullable = false)))
    val dir = tmp("graft_rb_len")
    new java.io.File(dir).mkdirs()
    // varint 0xC0 0x84 0x3D = 1000000 declared bytes, only 2 present
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.rowbinary"),
      Array[Byte](0xc0.toByte, 0x84.toByte, 0x3d, 0x61, 0x62))
    val err = intercept[Exception] {
      RowBinary.read(spark, dir, schema).collect()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
    assert(chain.exists(m => m.contains("truncated") && m.contains("exceeds")))
  }

  test("loud failure: a varint length past Int range (or sign-wrapped) " +
      "reports corruption, not a negative allocation") {
    val schema = StructType(Seq(StructField("s", StringType, nullable = false)))
    val dir = tmp("graft_rb_bigvarint")
    new java.io.File(dir).mkdirs()
    // varint 0x80 0x80 0x80 0x80 0x08 = 2^31: one past Int.MaxValue, so
    // an Int-narrowed length would wrap negative and slip past the
    // `n > remaining` truncation guard into new Array[Byte](negative)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.rowbinary"),
      Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte,
        0x08, 0x61, 0x62))
    val err = intercept[Exception] {
      RowBinary.read(spark, dir, schema).collect()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
    assert(chain.exists(m => m.contains("out of Int range")),
      "expected the loud varint-range diagnostic")
  }

  test("roundtrip: every supported type survives, including µs " +
      "timestamps, Date32, Bool, Binary, Array(Float32) and NULLs") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i32", IntegerType),
      StructField("i16", ShortType),
      StructField("i8", ByteType),
      StructField("f32", FloatType),
      StructField("f64", DoubleType),
      StructField("b", BooleanType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("d", DateType),
      StructField("arr", ArrayType(FloatType, containsNull = false))))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = java.util.List.of(
      Row(1L, 42, 7.toShort, 3.toByte, 1.5f, 2.25, true, "héllo",
        Array[Byte](1, 2, 3), ts, java.sql.Date.valueOf("2024-03-01"),
        Seq(0.5f, -1.0f)),
      Row(2L, null, null, null, null, null, null, null, null, null, null,
        Seq.empty[Float]))
    val df = spark.createDataFrame(rows, schema).repartition(2)
    val dir = tmp("graft_rb_rt")
    RowBinary.write(df, dir)
    val back = RowBinary.read(spark, dir, schema).orderBy("id").collect()
    assert(back.length == 2)
    val r = back(0)
    assert(r.getLong(0) == 1L && r.getInt(1) == 42 && r.getShort(2) == 7 &&
      r.getByte(3) == 3 && r.getFloat(4) == 1.5f && r.getDouble(5) == 2.25 &&
      r.getBoolean(6) && r.getString(7) == "héllo" &&
      r.getAs[Array[Byte]](8).toSeq == Seq[Byte](1, 2, 3) &&
      r.getTimestamp(9) == ts &&
      r.getDate(10) == java.sql.Date.valueOf("2024-03-01") &&
      r.getSeq[Float](11) == Seq(0.5f, -1.0f))
    val n = back(1)
    assert((1 to 10).forall(n.isNullAt) && n.getSeq[Float](11).isEmpty)
  }

  test("roundtrip: events fixture at sf with multiple partitions — " +
      "one file per non-empty partition, full row parity") {
    val e = Tables.load(spark, sf, "events").repartition(4)
    val dir = tmp("graft_rb_events")
    RowBinary.write(e, dir)
    val nFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".rowbinary"))
    assert(nFiles > 1, s"expected per-partition files, got $nFiles")
    val back = RowBinary.read(spark, dir, e.schema)
    assert(back.orderBy("event_id").collect().toSeq ==
      e.orderBy("event_id").collect().toSeq)
  }

  test("loud failure: truncated stream names the column and offset; " +
      "unsupported type rejected before any write") {
    val schema = StructType(Seq(StructField("s", StringType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(Row("hello world")), schema).coalesce(1)
    val dir = tmp("graft_rb_trunc")
    RowBinary.write(df, dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".rowbinary")).head
    val full = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, full.dropRight(3))
    // drop the local-FS checksum sidecar so the DECODER's truncation
    // detection is what fires, not Hadoop's CRC
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
    val err = intercept[Exception] {
      RowBinary.read(spark, dir, schema).collect()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
    assert(chain.exists(_.contains("truncated")))

    val bad = Seq((1L, Map("k" -> 1L))).toDF("id", "m")
    intercept[IllegalArgumentException] {
      RowBinary.write(bad, tmp("graft_rb_bad"))
    }
  }

  test("chType: documents the wire contract for the supported set") {
    assert(RowBinary.chType(TimestampType) == "DateTime64(6)")
    assert(RowBinary.chType(ArrayType(FloatType, containsNull = false)) ==
      "Array(Float32)")
    assert(RowBinary.chType(ArrayType(StringType, containsNull = true)) ==
      "Array(Nullable(String))")
  }
}
