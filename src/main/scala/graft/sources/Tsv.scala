package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.{SerializableWritable, TaskContext}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** ClickHouse `FORMAT TSVWithNamesAndTypes` interchange — the
  * text-dialect sibling of [[RowBinary]]/[[Native]] and the shape
  * `clickhouse-client` prints for piped tooling: two header rows
  * (column NAMES, then CH TYPE names), then one value row per line,
  * tab-separated, with CH's TSV escaping (`\\`, `\t`, `\n`, `\r`,
  * `\0`) and `\N` for NULL. Self-describing like Native: the reader
  * validates both header rows against the caller's schema and fails
  * loudly on drift.
  *
  * Supported lanes are the SCALAR interchange set (integers, floats,
  * Bool as true/false, String, Decimal as plain-scale text,
  * DateTime64(6) as `yyyy-MM-dd HH:mm:ss.SSSSSS` in UTC, Date32 as
  * `yyyy-MM-dd`); arrays are rejected up front — CH's TSV array
  * quoting grammar is a different contract, and the binary dialects
  * already carry nested data. Escaped newlines never produce physical
  * line breaks, so the format is line-splittable in principle; this
  * implementation keeps the per-file unit of work the other dialects
  * use (one file per input partition, whole-file decode) — headers
  * repeat per file, which is what makes per-file decode possible at
  * all. Floats round-trip through Java's shortest-representation
  * printing (re-parses to the identical bit pattern); CH prints a
  * different but equally lossless spelling — the contract here is
  * lossless self-round-trip plus CH-readable values.
  */
object Tsv {

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | StringType | TimestampType |
         DateType => true
    case _: DecimalType => true
    case _ => false
  }

  private def validate(schema: StructType): Unit =
    schema.fields.foreach { f =>
      if (!supported(f.dataType))
        throw new IllegalArgumentException(
          s"TSV: unsupported Spark type ${f.dataType} in column " +
            s"'${f.name}' — scalar lanes only (use Native/RowBinary " +
            "for nested data)")
    }

  // --- escaping --------------------------------------------------------

  private[graft] def escape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => b.append("\\\\")
        case '\t' => b.append("\\t")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\u0000' => b.append("\\0")
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  private[graft] def unescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 1
          case 't' => b.append('\t'); i += 1
          case 'n' => b.append('\n'); i += 1
          case 'r' => b.append('\r'); i += 1
          case '0' => b.append('\u0000'); i += 1
          case other => b.append('\\').append(other); i += 1
        }
      } else b.append(c)
      i += 1
    }
    b.toString
  }

  // --- write -----------------------------------------------------------

  /** One `part-NNNNN.tsv` per partition (overwrite semantics,
    * retry-idempotent per file — the shared interchange-dump
    * contract). Every file carries both header rows.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    validate(schema)
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val confB = spark.sparkContext.broadcast(new SerializableWritable(hconf))
    val header = schema.fields.map(f => escape(f.name)).mkString("\t") +
      "\n" +
      schema.fields.map(f => escape(Native.chFieldType(f))).mkString("\t") +
      "\n"
    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val file = new Path(path, f"part-$pid%05d.tsv")
        val out = file.getFileSystem(confB.value.value).create(file, true)
        try {
          out.write(header.getBytes(StandardCharsets.UTF_8))
          val sb = new java.lang.StringBuilder(1 << 16)
          rows.foreach { row =>
            var i = 0
            while (i < schema.length) {
              if (i > 0) sb.append('\t')
              sb.append(formatValue(row, i, schema(i)))
              i += 1
            }
            sb.append('\n')
            if (sb.length >= (1 << 16)) {
              out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
              sb.setLength(0)
            }
          }
          out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
        } finally out.close()
      }
    }
  }

  private def formatValue(row: Row, i: Int, f: StructField): String = {
    if (row.isNullAt(i)) {
      if (!f.nullable)
        throw new IllegalArgumentException(
          s"TSV: NULL in non-nullable column '${f.name}'")
      return "\\N"
    }
    f.dataType match {
      case StringType => escape(row.getString(i))
      case BooleanType => if (row.getBoolean(i)) "true" else "false"
      case TimestampType => TsFmt.format(row.getTimestamp(i).toInstant)
      case DateType => row.getDate(i).toLocalDate.toString
      case _: DecimalType => row.getDecimal(i).toPlainString
      case _ => row.get(i).toString
    }
  }

  // --- read ------------------------------------------------------------

  /** Read a TSV directory (or single file) against `schema`; every
    * file's two header rows are verified against it.
    */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    validate(schema)
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tsv")
      .load(path)
      .select(col("content"))
    files.as(Encoders.BINARY).flatMap(
      (bytes: Array[Byte]) => decodeFile(bytes, schema))(Encoders.row(schema))
  }

  private def decodeFile(bytes: Array[Byte],
                         schema: StructType): Iterator[Row] = {
    val text = new String(bytes, StandardCharsets.UTF_8)
    // every written line is \n-terminated, so the final split element
    // is the post-terminator leftover — drop exactly it (an empty
    // ELEMENT elsewhere is a real row, e.g. one nullable-string column
    // holding "")
    val all = text.split("\n", -1)
    val lines = all.iterator.take(all.length - 1)
    if (!lines.hasNext)
      throw new IllegalStateException("TSV: empty file (no header rows)")
    val names = lines.next().split("\t", -1).map(unescape)
    val expectNames = schema.fields.map(_.name)
    if (!names.sameElements(expectNames))
      throw new IllegalStateException(
        s"TSV: header names ${names.mkString(",")} != schema " +
          s"${expectNames.mkString(",")}")
    if (!lines.hasNext)
      throw new IllegalStateException("TSV: missing types header row")
    val types = lines.next().split("\t", -1).map(unescape)
    val expectTypes = schema.fields.map(Native.chFieldType)
    if (!types.sameElements(expectTypes))
      throw new IllegalStateException(
        s"TSV: header types ${types.mkString(",")} != schema " +
          s"${expectTypes.mkString(",")}")
    lines.map { line =>
      val parts = line.split("\t", -1)
      if (parts.length != schema.length)
        throw new IllegalStateException(
          s"TSV: row has ${parts.length} fields, schema has " +
            s"${schema.length}: $line")
      Row.fromSeq(schema.fields.zip(parts).map { case (f, raw) =>
        parseValue(raw, f)
      }.toIndexedSeq)
    }
  }

  private def parseValue(raw: String, f: StructField): Any = {
    if (raw == "\\N") {
      if (!f.nullable)
        throw new IllegalStateException(
          s"TSV: NULL in non-nullable column '${f.name}'")
      return null
    }
    f.dataType match {
      case StringType => unescape(raw)
      case ByteType => raw.toByte
      case ShortType => raw.toShort
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case FloatType => raw.toFloat
      case DoubleType => raw.toDouble
      case BooleanType => raw match {
        case "true" => true
        case "false" => false
        case other => throw new IllegalStateException(
          s"TSV: bad Bool '$other' in column '${f.name}'")
      }
      case TimestampType =>
        java.sql.Timestamp.from(
          java.time.Instant.from(TsFmt.parse(raw)))
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.parse(raw))
      case d: DecimalType =>
        // the wire scale is the schema's — a mismatch is data drift
        new java.math.BigDecimal(raw).setScale(d.scale)
      case other => throw new IllegalStateException(
        s"TSV: unsupported type $other")
    }
  }
}
