package graft.sources

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.{SerializableWritable, TaskContext}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** ClickHouse `FORMAT Native` interchange — the COLUMNAR sibling of
  * [[RowBinary]] and the most efficient CH dump/load shape (what
  * `clickhouse-client --format Native` emits; the reference's bulk
  * path at from_superset_to_clickhouse hook:92-112 rides the native
  * protocol whose payload blocks are exactly this layout).
  *
  * Format (public CH spec, the classic file-dump framing): a stream of
  * BLOCKS until EOF. Each block:
  *   - num_columns: LEB128 varint
  *   - num_rows:    LEB128 varint
  *   - per column: name (varint-length string), CH type name
  *     (varint-length string), then the column's values
  *     COLUMN-ORIENTED in the binary layout RowBinary uses per value:
  *       - Nullable(T): a null map of num_rows flag bytes (1 = NULL)
  *         FIRST, then num_rows values of T (type default in NULL
  *         slots);
  *       - Array(T): num_rows cumulative flattened offsets as UInt64
  *         LE, then the flattened nested column bulk (for
  *         Array(Nullable(T)) the flattened null map precedes the
  *         flattened values — CH's stream order);
  *       - everything else: num_rows consecutive values.
  *
  * Unlike RowBinary the format is SELF-DESCRIBING: the reader checks
  * every block's embedded (name, type) header against the caller's
  * schema and fails loudly on drift — the wire contract is verified,
  * not assumed. Still unsplittable (block lengths are data-dependent),
  * so parallelism is per-file exactly like RowBinary: one file per
  * input partition, whole-file decode via `binaryFile`. Within a file
  * rows chunk into blocks of `blockRows` (CH's own 65 409-row default
  * rounded to 64 Ki) so a decoder never materializes an unbounded
  * column vector — the memory bound per (file, column) is
  * blockRows·width, independent of file size.
  *
  * CH forbids Nullable(Array): an ArrayType field writes as plain
  * `Array(T)` regardless of Spark-side nullability and a NULL array
  * value fails loudly at encode (same contract as RowBinary's
  * non-nullable lanes).
  */
object Native {

  private val DefaultBlockRows = 1 << 16

  /** Top-level CH type string for a field: wraps [[RowBinary.chType]]
    * in Nullable(…) for nullable non-array fields.
    */
  def chFieldType(f: StructField): String = f.dataType match {
    case _: ArrayType => RowBinary.chType(f.dataType)
    case dt if f.nullable => s"Nullable(${RowBinary.chType(dt)})"
    case dt => RowBinary.chType(dt)
  }

  // --- write -----------------------------------------------------------

  /** Write `df` as one `part-NNNNN.native` file per partition under
    * `path` (overwrite semantics, retry-idempotent per file — the
    * interchange-dump contract shared with the CSV/JSON/RowBinary
    * dialects). Rows chunk into blocks of `blockRows`.
    */
  def write(df: DataFrame, path: String,
            blockRows: Int = DefaultBlockRows): Unit = {
    require(blockRows > 0, s"blockRows must be positive: $blockRows")
    val schema = df.schema
    schema.fields.foreach(chFieldType) // validate the type set up front
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
        val file = new Path(path, f"part-$pid%05d.native")
        val out = file.getFileSystem(confB.value.value).create(file, true)
        try {
          val block = new Array[Row](blockRows)
          var n = 0
          rows.foreach { row =>
            block(n) = row; n += 1
            if (n == blockRows) { encodeBlock(out, block, n, schema); n = 0 }
          }
          if (n > 0) encodeBlock(out, block, n, schema)
        } finally out.close()
      }
    }
  }

  private def encodeBlock(out: OutputStream, block: Array[Row], n: Int,
                          schema: StructType): Unit = {
    val buf = new ByteArrayOutputStream(1 << 16)
    RowBinary.writeVarint(buf, schema.length.toLong)
    RowBinary.writeVarint(buf, n.toLong)
    var c = 0
    while (c < schema.length) {
      val f = schema(c)
      writeString(buf, f.name)
      writeString(buf, chFieldType(f))
      f.dataType match {
        case ArrayType(elem, containsNull) =>
          encodeArrayColumn(buf, block, n, c, f.name, elem, containsNull)
        case dt if f.nullable =>
          var i = 0
          while (i < n) { buf.write(if (block(i).isNullAt(c)) 1 else 0); i += 1 }
          i = 0
          while (i < n) {
            val v = if (block(i).isNullAt(c)) defaultOf(dt) else block(i).get(c)
            RowBinary.encodeValue(buf, v, dt, nullable = false, f.name)
            i += 1
          }
        case dt =>
          var i = 0
          while (i < n) {
            if (block(i).isNullAt(c))
              throw new IllegalArgumentException(
                s"Native: NULL in non-nullable column '${f.name}'")
            RowBinary.encodeValue(buf, block(i).get(c), dt,
              nullable = false, f.name)
            i += 1
          }
      }
      c += 1
    }
    buf.writeTo(out)
  }

  private def encodeArrayColumn(buf: OutputStream, block: Array[Row], n: Int,
                                c: Int, name: String, elem: DataType,
                                containsNull: Boolean): Unit = {
    val flat = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      if (block(i).isNullAt(c))
        throw new IllegalArgumentException(
          s"Native: NULL array in column '$name' — CH forbids " +
            "Nullable(Array); drop or coalesce the column first")
      val xs = block(i).getSeq[Any](c)
      xs.foreach(flat.add)
      RowBinary.writeLongLE(buf, flat.size.toLong) // cumulative offset
      i += 1
    }
    if (containsNull) {
      var j = 0
      while (j < flat.size) { buf.write(if (flat.get(j) == null) 1 else 0); j += 1 }
      j = 0
      while (j < flat.size) {
        val v = if (flat.get(j) == null) defaultOf(elem) else flat.get(j)
        RowBinary.encodeValue(buf, v, elem, nullable = false, name)
        j += 1
      }
    } else {
      var j = 0
      while (j < flat.size) {
        if (flat.get(j) == null)
          throw new IllegalArgumentException(
            s"Native: NULL element in non-nullable array column '$name'")
        RowBinary.encodeValue(buf, flat.get(j), elem, nullable = false, name)
        j += 1
      }
    }
  }

  /** CH's type default, written into NULL slots under the null map. */
  private def defaultOf(dt: DataType): Any = dt match {
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType => 0
    case LongType => 0L
    case FloatType => 0.0f
    case DoubleType => 0.0
    case BooleanType => false
    case StringType => ""
    case BinaryType => Array.emptyByteArray
    case TimestampType => java.sql.Timestamp.from(java.time.Instant.EPOCH)
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(0))
    case d: DecimalType => new java.math.BigDecimal(
      java.math.BigInteger.ZERO, d.scale)
    case other => throw new IllegalArgumentException(
      s"Native: unsupported Spark type $other")
  }

  private def writeString(out: OutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    RowBinary.writeVarint(out, b.length.toLong)
    out.write(b)
  }

  // --- read ------------------------------------------------------------

  /** Read a Native directory (or single file) under `path`. The
    * caller's `schema` remains the decode contract, but every block
    * header's (name, type) pair is VERIFIED against it — column drift
    * fails with the expected/found pair, not a garbled decode.
    */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    schema.fields.foreach(chFieldType)
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.native")
      .load(path)
      .select(col("content"))
    files.as(Encoders.BINARY).flatMap(
      (bytes: Array[Byte]) => decodeFile(bytes, schema))(Encoders.row(schema))
  }

  private def decodeFile(bytes: Array[Byte],
                         schema: StructType): Iterator[Row] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[Row] {
      private var pending: Iterator[Row] = Iterator.empty
      override def hasNext: Boolean = pending.hasNext || bb.hasRemaining
      override def next(): Row = {
        if (!pending.hasNext) pending = decodeBlock(bb, schema)
        pending.next()
      }
    }
  }

  private def decodeBlock(bb: ByteBuffer,
                          schema: StructType): Iterator[Row] = {
    try {
      val ncols = RowBinary.readVarint(bb)
      if (ncols != schema.length)
        throw new IllegalStateException(
          s"Native: block has $ncols columns, schema has ${schema.length}")
      val nrows = RowBinary.readVarint(bb)
      val cols = new Array[Array[Any]](ncols)
      var c = 0
      while (c < ncols) {
        val f = schema(c)
        val name = readString(bb)
        val tpe = readString(bb)
        if (name != f.name || tpe != chFieldType(f))
          throw new IllegalStateException(
            s"Native: column $c is ('$name', '$tpe'), schema expects " +
              s"('${f.name}', '${chFieldType(f)}')")
        cols(c) = decodeColumn(bb, f, nrows)
        c += 1
      }
      val rows = new Array[Row](nrows)
      var i = 0
      while (i < nrows) {
        val vals = new Array[Any](ncols)
        var j = 0
        while (j < ncols) { vals(j) = cols(j)(i); j += 1 }
        rows(i) = Row.fromSeq(vals.toIndexedSeq)
        i += 1
      }
      rows.iterator
    } catch {
      case e: java.nio.BufferUnderflowException =>
        throw new IllegalStateException(
          s"Native: truncated stream at byte ${bb.position()} — " +
            "corrupt file or schema mismatch", e)
    }
  }

  private def decodeColumn(bb: ByteBuffer, f: StructField,
                           nrows: Int): Array[Any] = {
    val out = new Array[Any](nrows)
    f.dataType match {
      case ArrayType(elem, containsNull) =>
        val offsets = new Array[Long](nrows)
        var i = 0
        while (i < nrows) { offsets(i) = bb.getLong(); i += 1 }
        val total = if (nrows == 0) 0L else offsets(nrows - 1)
        if (total < 0 || total > Int.MaxValue)
          throw new IllegalStateException(
            s"Native: array offsets corrupt (total $total) at byte " +
              s"${bb.position()}")
        val flat = new Array[Any](total.toInt)
        if (containsNull) {
          val mask = new Array[Byte](total.toInt)
          bb.get(mask)
          var j = 0
          while (j < total.toInt) {
            val v = RowBinary.decodeValue(bb, elem, nullable = false)
            flat(j) = if (mask(j) != 0) null else v
            j += 1
          }
        } else {
          var j = 0
          while (j < total.toInt) {
            flat(j) = RowBinary.decodeValue(bb, elem, nullable = false)
            j += 1
          }
        }
        var prev = 0L
        i = 0
        while (i < nrows) {
          if (offsets(i) < prev)
            throw new IllegalStateException(
              s"Native: non-monotone array offsets at row $i")
          out(i) = flat.slice(prev.toInt, offsets(i).toInt).toIndexedSeq
          prev = offsets(i)
          i += 1
        }
      case dt if f.nullable =>
        val mask = new Array[Byte](nrows)
        bb.get(mask)
        var i = 0
        while (i < nrows) {
          val v = RowBinary.decodeValue(bb, dt, nullable = false)
          out(i) = if (mask(i) != 0) null else v
          i += 1
        }
      case dt =>
        var i = 0
        while (i < nrows) {
          out(i) = RowBinary.decodeValue(bb, dt, nullable = false)
          i += 1
        }
    }
    out
  }

  private def readString(bb: ByteBuffer): String =
    new String(RowBinary.readLengthPrefixed(bb), StandardCharsets.UTF_8)
}
