package graft.sources

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.{SerializableWritable, TaskContext}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** ClickHouse `FORMAT RowBinary` interchange — the wire shape the
  * reference's native-protocol bulk path moves rows in
  * (from_superset_to_clickhouse hook:27-40 opens the native client;
  * hook:92-112 bulk-loads; RowBinary is the documented binary row
  * stream that path speaks, and the one transport dialect the engine's
  * CSVWithNames ([[IO.writeReferenceCsv]]) and JSONEachRow
  * ([[IO.writeJsonEachRow]]) coverage was missing).
  *
  * Format (public CH spec): rows concatenated with NO delimiter or
  * header; every value in the column's binary layout — fixed-width
  * numerics little-endian, String as unsigned-LEB128 length + UTF-8
  * bytes, Array as LEB128 count + elements, Nullable(T) as a 0x00/0x01
  * flag byte before the value, DateTime64(6) as Int64 epoch-µs, Date32
  * as Int32 epoch-days, Decimal(P,S) as the unscaled integer in a
  * fixed-width LE lane sized by precision (Decimal32/64/128). Because lengths are embedded, the format is NOT
  * line-splittable — a file is a unit of work. Parallelism therefore
  * comes from the FILE COUNT, exactly like CH's per-shard insert
  * streams: the writer emits one file per input partition (size files
  * upstream with `repartition`; at 100 TB you want O(100 MB) files),
  * and the reader maps whole files over the built-in `binaryFile`
  * source, decoding each on the executor that read it. Schema is
  * enforced on read (same contract as the JSON dialect): RowBinary
  * carries no names or types, so the caller's StructType IS the wire
  * contract, and a mismatch fails loudly mid-decode rather than
  * silently re-typing.
  */
object RowBinary {

  /** Spark → ClickHouse type name for the supported interchange set —
    * used for error text and to document the wire contract.
    */
  def chType(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case BooleanType => "Bool"
    case StringType => "String"
    case BinaryType => "String"
    case TimestampType => "DateTime64(6)"
    case DateType => "Date32"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(e, n) =>
      s"Array(${if (n) s"Nullable(${chType(e)})" else chType(e)})"
    case other =>
      throw new IllegalArgumentException(
        s"RowBinary: unsupported Spark type $other")
  }

  /** CH carries Decimal(P,S) as the UNSCALED integer in a fixed-width
    * little-endian two's-complement lane sized by precision alone:
    * Decimal32 (P≤9) = Int32, Decimal64 (P≤18) = Int64, Decimal128
    * (P≤38) = Int128. Spark's DecimalType caps at P=38, so Int256
    * never occurs.
    */
  private[sources] def decimalWidth(p: Int): Int =
    if (p <= 9) 4 else if (p <= 18) 8 else 16

  // --- write -----------------------------------------------------------

  /** Write `df` as one `part-NNNNN.rowbinary` file per partition under
    * `path` (overwrite semantics — the directory is cleared first, and
    * a task retry rewrites its own file, so the output is
    * retry-idempotent; a production multi-writer would sit behind a
    * commit protocol, but interchange dumps are single-job by
    * construction, same as the CSV/JSON dialects').
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    schema.fields.foreach(f => chType(f.dataType)) // validate up front
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val confB = spark.sparkContext.broadcast(new SerializableWritable(hconf))
    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val file = new Path(path, f"part-$pid%05d.rowbinary")
        val out = file.getFileSystem(confB.value.value).create(file, true)
        try {
          val buf = new ByteArrayOutputStream(1 << 16)
          rows.foreach { row =>
            encodeRow(buf, row, schema)
            if (buf.size() >= (1 << 16)) { buf.writeTo(out); buf.reset() }
          }
          buf.writeTo(out)
        } finally out.close()
      }
    }
  }

  /** One row, every field in schema order. */
  private def encodeRow(out: OutputStream, row: Row,
                        schema: StructType): Unit = {
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v = if (row.isNullAt(i)) null else row.get(i)
      encodeValue(out, v, f.dataType, f.nullable, f.name)
      i += 1
    }
  }

  private[sources] def encodeValue(out: OutputStream, v: Any, dt: DataType,
                          nullable: Boolean, name: String): Unit = {
    if (nullable) {
      if (v == null) { out.write(1); return }
      out.write(0)
    } else if (v == null) {
      throw new IllegalArgumentException(
        s"RowBinary: NULL in non-nullable column '$name'")
    }
    dt match {
      case ByteType => out.write(v.asInstanceOf[Byte].toInt)
      case ShortType => writeShortLE(out, v.asInstanceOf[Short])
      case IntegerType => writeIntLE(out, v.asInstanceOf[Int])
      case LongType => writeLongLE(out, v.asInstanceOf[Long])
      case FloatType =>
        writeIntLE(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case DoubleType =>
        writeLongLE(out,
          java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case StringType =>
        val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
        writeVarint(out, b.length.toLong); out.write(b)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        writeVarint(out, b.length.toLong); out.write(b)
      case TimestampType =>
        val inst = v.asInstanceOf[java.sql.Timestamp].toInstant
        writeLongLE(out, Math.addExact(
          Math.multiplyExact(inst.getEpochSecond, 1000000L),
          (inst.getNano / 1000).toLong))
      case DateType =>
        writeIntLE(out,
          Math.toIntExact(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay))
      case d: DecimalType =>
        // setScale with no rounding mode throws on a scale mismatch —
        // the wire scale is the schema's, a silent re-quantize would be
        // a data change
        val unscaled = v.asInstanceOf[java.math.BigDecimal]
          .setScale(d.scale).unscaledValue()
        decimalWidth(d.precision) match {
          case 4 => writeIntLE(out, unscaled.intValueExact())
          case 8 => writeLongLE(out, unscaled.longValueExact())
          case _ =>
            // two's-complement big-endian from BigInteger, sign-extended
            // to 16 bytes, emitted reversed (little-endian)
            if (unscaled.bitLength() > 127)
              throw new IllegalArgumentException(
                s"RowBinary: decimal overflow in column '$name': " +
                  s"$unscaled does not fit Decimal128")
            val be = unscaled.toByteArray
            val pad = if (unscaled.signum() < 0) 0xff else 0x00
            var i = 0
            while (i < 16) { // LE byte i = BE byte counted from the end
              val j = be.length - 1 - i
              out.write(if (j >= 0) be(j).toInt else pad)
              i += 1
            }
        }
      case ArrayType(elem, containsNull) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        writeVarint(out, xs.length.toLong)
        xs.foreach(x => encodeValue(out, x, elem, containsNull, name))
      case other =>
        throw new IllegalArgumentException(
          s"RowBinary: unsupported Spark type $other in column '$name'")
    }
  }

  private[sources] def writeShortLE(out: OutputStream, v: Short): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private[sources] def writeIntLE(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private[sources] def writeLongLE(out: OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xffL).toInt); i += 1 }
  }
  /** Unsigned LEB128 (CH's varint for String/Array lengths). */
  private[sources] def writeVarint(out: OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  // --- read ------------------------------------------------------------

  /** Read a RowBinary directory (or single file) under `path` against
    * the caller's `schema`. Each file decodes on one executor (the
    * format is unsplittable by construction); trailing garbage or a
    * short read fails loudly with the byte offset.
    */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    schema.fields.foreach(f => chType(f.dataType)) // validate up front
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.rowbinary")
      .load(path)
      .select(col("content"))
    files.as(Encoders.BINARY).flatMap(
      (bytes: Array[Byte]) => decodeFile(bytes, schema))(Encoders.row(schema))
  }

  private def decodeFile(bytes: Array[Byte],
                         schema: StructType): Iterator[Row] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[Row] {
      override def hasNext: Boolean = bb.hasRemaining
      override def next(): Row = {
        val vals = new Array[Any](schema.length)
        var i = 0
        try {
          while (i < schema.length) {
            val f = schema(i)
            vals(i) = decodeValue(bb, f.dataType, f.nullable)
            i += 1
          }
        } catch {
          case e: java.nio.BufferUnderflowException =>
            throw new IllegalStateException(
              s"RowBinary: truncated stream at byte ${bb.position()} " +
                s"decoding column '${schema(i).name}' — schema mismatch?", e)
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
  }

  private[sources] def decodeValue(bb: ByteBuffer, dt: DataType,
                          nullable: Boolean): Any = {
    if (nullable && bb.get() != 0) return null
    dt match {
      case ByteType => bb.get()
      case ShortType => bb.getShort()
      case IntegerType => bb.getInt()
      case LongType => bb.getLong()
      case FloatType => bb.getFloat()
      case DoubleType => bb.getDouble()
      case BooleanType => bb.get() != 0
      case StringType =>
        val b = readLengthPrefixed(bb)
        new String(b, StandardCharsets.UTF_8)
      case BinaryType => readLengthPrefixed(bb)
      case TimestampType =>
        val us = bb.getLong()
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(bb.getInt().toLong))
      case d: DecimalType =>
        val unscaled = decimalWidth(d.precision) match {
          case 4 => java.math.BigInteger.valueOf(bb.getInt().toLong)
          case 8 => java.math.BigInteger.valueOf(bb.getLong())
          case _ =>
            val le = new Array[Byte](16)
            bb.get(le)
            val be = new Array[Byte](16) // reverse LE → BE for BigInteger
            var i = 0
            while (i < 16) { be(i) = le(15 - i); i += 1 }
            new java.math.BigInteger(be)
        }
        new java.math.BigDecimal(unscaled, d.scale)
      case ArrayType(elem, containsNull) =>
        val n = readVarint(bb)
        val xs = new Array[Any](n)
        var i = 0
        while (i < n) { xs(i) = decodeValue(bb, elem, containsNull); i += 1 }
        xs.toIndexedSeq
      case other =>
        throw new IllegalArgumentException(
          s"RowBinary: unsupported Spark type $other")
    }
  }

  /** Varint length + payload bytes. The length is validated against the
    * REMAINING buffer before allocating: a corrupt stream or schema
    * mismatch must hit the documented loud truncation error, not a
    * multi-GB speculative allocation/OOM.
    */
  private[sources] def readLengthPrefixed(bb: ByteBuffer): Array[Byte] = {
    val n = readVarint(bb)
    if (n > bb.remaining())
      throw new IllegalStateException(
        s"RowBinary: truncated stream at byte ${bb.position()} — " +
          s"length $n exceeds the ${bb.remaining()} bytes remaining " +
          "(schema mismatch or corrupt file)")
    val b = new Array[Byte](n); bb.get(b); b
  }

  private[sources] def readVarint(bb: ByteBuffer): Int = {
    var v = 0L; var shift = 0
    var b = bb.get()
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift; shift += 7
      if (shift > 63) throw new IllegalStateException(
        "RowBinary: varint overflow — stream corrupt or schema mismatch")
      b = bb.get()
    }
    v |= (b & 0x7fL) << shift
    // A high-shift chunk can set the sign bit (v < 0) and a 5-chunk
    // varint can exceed Int.MaxValue — both mean a corrupt stream or
    // schema mismatch, and both must raise the same loud diagnostic as
    // the truncation guard, not wrap into a negative array size or
    // surface as a bare ArithmeticException.
    if (v < 0L || v > Int.MaxValue)
      throw new IllegalStateException(
        s"RowBinary: varint length $v out of Int range at byte " +
          s"${bb.position()} — stream corrupt or schema mismatch")
    v.toInt
  }
}
