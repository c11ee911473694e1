package graft.pg.wire

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Instant, LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL V3 DataRow field writers: one per (Catalyst type, format).
  * Layout per field: int32 byte-length then the payload, length -1 for NULL
  * (reference converters.scala:131-151). Binary values are big-endian;
  * date/timestamp shift to the PG epoch (see [[PgTypes.PG_EPOCH_DAYS]]).
  */
object RowCodec {

  type FieldWriter = (InternalRow, ByteBuffer) => Unit

  private val NULL_LEN = -1

  /** Build per-column writers for a schema; `binary(i)` selects the wire
    * format of column i (reference converters.scala:107-126). `zone` renders
    * TimestampType text in the session time zone so values agree with the
    * TimeZone ParameterStatus announced at startup.
    */
  def rowWriter(schema: StructType, binary: Seq[Boolean],
      zone: ZoneId = ZoneOffset.UTC): (InternalRow, ByteBuffer) => Unit = {
    require(schema.length == binary.length, "format flags must match schema arity")
    val writers = schema.fields.zipWithIndex.map { case (f, i) =>
      fieldWriter(f.dataType, i, binary(i), zone)
    }
    (row, buf) => {
      var i = 0
      while (i < writers.length) {
        if (row.isNullAt(i)) buf.putInt(NULL_LEN) else writers(i)(row, buf)
        i += 1
      }
    }
  }

  private def putBytes(buf: ByteBuffer, b: Array[Byte]): Unit = {
    buf.putInt(b.length); buf.put(b)
  }
  private def putText(buf: ByteBuffer, s: String): Unit = putBytes(buf, s.getBytes(UTF_8))

  private val tsFmt = DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss")

  /** PG-style timestamp text: micros with trailing zeros trimmed, no
    * fractional dot when zero (PG timestamp_out behavior; the reference used
    * java.sql.Timestamp.toString which always emits ".0" — we match PG).
    * Instant micros are rendered as wall-clock time in `zone`.
    */
  def timestampText(micros: Long, zone: ZoneId = ZoneOffset.UTC): String = {
    val instant = Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    fracText(tsFmt.format(LocalDateTime.ofInstant(instant, zone)),
      Math.floorMod(micros, 1000000L))
  }

  /** TimestampNTZ text: the micros already encode a wall-clock local time,
    * so no zone shift is applied (PG timestamp-without-time-zone semantics).
    */
  def timestampNtzText(micros: Long): String =
    fracText(tsFmt.format(LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L).toInt * 1000,
      ZoneOffset.UTC)), Math.floorMod(micros, 1000000L))

  private def fracText(base: String, frac: Long): String =
    if (frac == 0) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse

  def dateText(days: Int): String = LocalDate.ofEpochDay(days.toLong).toString

  /** PG interval_out text for a day-time interval stored as total micros:
    * `1 day 02:03:04.5`, negative `-1 days -02:03:04` (PG prints plural
    * `days` for negative magnitudes).
    */
  def dayTimeIntervalText(micros: Long): String = {
    val neg = micros < 0
    // math.abs(Long.MinValue) == Long.MinValue, which would make every
    // component negative garbage; the unsigned bit pattern of -MinValue is
    // the true magnitude 2^63, so divide/mod unsigned (both results fit in
    // a signed long: max days ~1.07e11, rem < 8.64e10)
    val mag = if (neg) -micros else micros
    val days = java.lang.Long.divideUnsigned(mag, 86400000000L)
    val rem = java.lang.Long.remainderUnsigned(mag, 86400000000L)
    val h = rem / 3600000000L
    val m = (rem % 3600000000L) / 60000000L
    val s = (rem % 60000000L) / 1000000L
    val frac = rem % 1000000L
    val sb = new StringBuilder
    if (days > 0) {
      if (neg) sb.append('-')
      sb.append(days).append(if (days == 1 && !neg) " day" else " days")
    }
    if (rem > 0 || days == 0) {
      if (sb.nonEmpty) sb.append(' ')
      if (neg) sb.append('-')
      sb.append(f"$h%02d:$m%02d:$s%02d")
      if (frac > 0) sb.append(fracText("", frac))
    }
    sb.toString
  }

  /** PG interval_out text for a year-month interval stored as total months:
    * `1 year 2 mons`; zero renders as PG's `00:00:00`.
    */
  def yearMonthIntervalText(months: Int): String = {
    if (months == 0) return "00:00:00"
    val neg = months < 0
    val abs = math.abs(months)
    val y = abs / 12
    val m = abs % 12
    val parts = new ArrayBuffer[String](2)
    if (y > 0) parts += s"${if (neg) "-" else ""}$y ${if (y == 1 && !neg) "year" else "years"}"
    if (m > 0) parts += s"${if (neg) "-" else ""}$m ${if (m == 1 && !neg) "mon" else "mons"}"
    parts.mkString(" ")
  }

  def fieldWriter(dt: DataType, i: Int, binary: Boolean,
      zone: ZoneId = ZoneOffset.UTC): FieldWriter = (dt, binary) match {
    // ---- binary mode ----
    case (BooleanType, true) => (r, b) => { b.putInt(1); b.put(if (r.getBoolean(i)) 1.toByte else 0.toByte) }
    case (ByteType, true) => (r, b) => { b.putInt(1); b.put(r.getByte(i)) }
    case (ShortType, true) => (r, b) => { b.putInt(2); b.putShort(r.getShort(i)) }
    case (IntegerType, true) => (r, b) => { b.putInt(4); b.putInt(r.getInt(i)) }
    case (LongType, true) => (r, b) => { b.putInt(8); b.putLong(r.getLong(i)) }
    case (FloatType, true) => (r, b) => { b.putInt(4); b.putFloat(r.getFloat(i)) }
    case (DoubleType, true) => (r, b) => { b.putInt(8); b.putDouble(r.getDouble(i)) }
    case (DateType, true) => (r, b) => { b.putInt(4); b.putInt(r.getInt(i) - PgTypes.PG_EPOCH_DAYS) }
    case (TimestampType, true) => (r, b) => {
      // announced as OID 1114 (timestamp WITHOUT time zone), whose binary
      // value is wall-clock micros since the PG epoch — shift the UTC-based
      // instant into the session zone so binary and text formats agree
      // (pgjdbc silently switches to binary past its prepared-statement
      // threshold; the two formats must not differ by the zone offset)
      val micros = r.getLong(i)
      val offsetSec = zone.getRules.getOffset(Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
        .getTotalSeconds
      b.putInt(8); b.putLong(micros + offsetSec * 1000000L - PgTypes.PG_EPOCH_MICROS)
    }
    case (TimestampNTZType, true) => (r, b) => {
      // NTZ micros are already wall-clock — 1114's binary value needs only
      // the PG-epoch shift, no session-zone adjustment (contrast the LTZ
      // case above)
      b.putInt(8); b.putLong(r.getLong(i) - PgTypes.PG_EPOCH_MICROS)
    }
    case (d: DecimalType, true) => (r, b) =>
      PgNumeric.write(b, r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal)
    case (CalendarIntervalType, true) => (r, b) => {
      // PG interval_recv wire order: time-in-day micros (int64), days
      // (int32), months (int32) — not the struct's field order
      val iv = r.getInterval(i)
      b.putInt(16); b.putLong(iv.microseconds); b.putInt(iv.days); b.putInt(iv.months)
    }
    case (StringType, _) => (r, b) => {
      val s = r.getUTF8String(i)
      // UTF8String.writeTo copyMemory's into the backing array BEFORE any
      // bounds check — an oversized value corrupts the heap instead of
      // throwing. Pre-check so callers get the standard overflow signal.
      if (b.remaining() < 4 + s.numBytes()) throw new java.nio.BufferOverflowException
      b.putInt(s.numBytes()); s.writeTo(b)
    }
    case (BinaryType, _) => (r, b) => putBytes(b, r.getBinary(i))

    // ---- text mode ----
    case (BooleanType, false) => (r, b) => { b.putInt(1); b.put(if (r.getBoolean(i)) 't'.toByte else 'f'.toByte) }
    case (DateType, false) => (r, b) => putText(b, dateText(r.getInt(i)))
    case (TimestampType, false) => (r, b) => putText(b, timestampText(r.getLong(i), zone))
    case (TimestampNTZType, false) => (r, b) => putText(b, timestampNtzText(r.getLong(i)))
    case (_: DayTimeIntervalType, false) =>
      (r, b) => putText(b, dayTimeIntervalText(r.getLong(i)))
    case (_: YearMonthIntervalType, false) =>
      (r, b) => putText(b, yearMonthIntervalText(r.getInt(i)))
    case (d: DecimalType, false) => (r, b) => putText(b, r.getDecimal(i, d.precision, d.scale).toString)
    case (at: ArrayType, false) =>
      (r, b) => putText(b, pgArrayText(r.getArray(i), at.elementType, zone))
    case (mt: MapType, false) => (r, b) => putText(b, jsonValue(r.getMap(i), mt))
    case (st: StructType, false) => (r, b) => putText(b, jsonValue(r.getStruct(i, st.length), st))
    case (ByteType, false) => (r, b) => putText(b, r.getByte(i).toString)
    case (ShortType, false) => (r, b) => putText(b, r.getShort(i).toString)
    case (IntegerType, false) => (r, b) => putText(b, r.getInt(i).toString)
    case (LongType, false) => (r, b) => putText(b, r.getLong(i).toString)
    case (FloatType, false) => (r, b) => putText(b, r.getFloat(i).toString)
    case (DoubleType, false) => (r, b) => putText(b, r.getDouble(i).toString)
    case (CalendarIntervalType, false) => (r, b) => putText(b, r.getInterval(i).toString)
    case (other, false) => (r, b) => putText(b, String.valueOf(r.get(i, other)))
    case (other, true) =>
      throw new IllegalArgumentException(s"binary format unsupported for $other")
  }

  /** PG array literal: `{1,2,3}` / `{"a","b"}` (reference renders via JSON
    * then re-braces, converters.scala:370-388 — same output, built directly).
    */
  def pgArrayText(arr: ArrayData, elem: DataType, zone: ZoneId = ZoneOffset.UTC): String = {
    val sb = new StringBuilder("{")
    var k = 0
    while (k < arr.numElements()) {
      if (k > 0) sb.append(',')
      if (arr.isNullAt(k)) sb.append("null")
      else sb.append(scalarText(arr.get(k, elem), elem, zone))
      k += 1
    }
    sb.append('}').toString
  }

  private def scalarText(v: Any, dt: DataType, zone: ZoneId): String = dt match {
    case StringType => jsonString(v.asInstanceOf[UTF8String].toString)
    case TimestampType => jsonString(timestampText(v.asInstanceOf[Long], zone))
    case TimestampNTZType => jsonString(timestampNtzText(v.asInstanceOf[Long]))
    case DateType => jsonString(dateText(v.asInstanceOf[Int]))
    case BooleanType => v.toString
    case at: ArrayType => pgArrayText(v.asInstanceOf[ArrayData], at.elementType, zone)
    // map/struct elements render as JSON like the top-level writers — the
    // raw catalyst values have identity-hash toStrings (UnsafeMapData@...)
    case mt: MapType => jsonValue(v, mt)
    case st: StructType => jsonValue(v, st)
    case _ => v.toString
  }

  /** Minimal JSON rendering for map/struct text mode (reference uses
    * catalyst's JacksonGenerator; output shape matches).
    */
  def jsonValue(v: Any, dt: DataType): String = (v, dt) match {
    case (null, _) => "null"
    case (m: MapData, mt: MapType) =>
      val keys = m.keyArray(); val vals = m.valueArray()
      (0 until m.numElements()).map { k =>
        val key = keys.get(k, mt.keyType) match {
          case s: UTF8String => jsonString(s.toString)
          // JSON keys must be strings: render complex keys (arrays/structs
          // have identity-hash toStrings) through jsonValue, then quote
          case other => jsonString(jsonValue(other, mt.keyType))
        }
        val value =
          if (vals.isNullAt(k)) "null" else jsonValue(vals.get(k, mt.valueType), mt.valueType)
        s"$key:$value"
      }.mkString("{", ",", "}")
    case (row: InternalRow, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, k) =>
        val value = if (row.isNullAt(k)) "null" else jsonValue(row.get(k, f.dataType), f.dataType)
        s"${jsonString(f.name)}:$value"
      }.mkString("{", ",", "}")
    case (a: ArrayData, at: ArrayType) =>
      (0 until a.numElements()).map { k =>
        if (a.isNullAt(k)) "null" else jsonValue(a.get(k, at.elementType), at.elementType)
      }.mkString("[", ",", "]")
    case (s: UTF8String, _) => jsonString(s.toString)
    case (ts: Long, TimestampType) => jsonString(timestampText(ts))
    case (d: Int, DateType) => jsonString(dateText(d))
    case (other, _) => other.toString
  }

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
