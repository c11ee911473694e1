package graft.pg.wire

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Decode PG `Bind` parameter bytes into Catalyst Literals by (oid, format)
  * (reference converters.scala:39-102). Extends the reference with the
  * date/timestamp binds its TODO left out (converters.scala:95).
  */
object ParamCodec {

  /** format: 0 = text, 1 = binary */
  def decode(param: Array[Byte], oid: Int, format: Int): Literal = (oid, format) match {
    case (PgTypes.BOOL, 0) => param(0) match {
      case 49 | 84 | 116 => Literal(true, BooleanType) // '1' 'T' 't'
      case 48 | 70 | 102 => Literal(false, BooleanType) // '0' 'F' 'f'
      case b => throw new IllegalArgumentException(s"Unknown bool parameter: '$b'")
    }
    case (PgTypes.BOOL, 1) => Literal(param(0) == 1, BooleanType)
    case (PgTypes.INT2, 0) => Literal(text(param).toShort, ShortType)
    case (PgTypes.INT2, 1) => Literal(ByteBuffer.wrap(param).getShort, ShortType)
    case (PgTypes.INT4, 0) => Literal(text(param).toInt, IntegerType)
    case (PgTypes.INT4, 1) => Literal(ByteBuffer.wrap(param).getInt, IntegerType)
    case (PgTypes.INT8, 0) => Literal(text(param).toLong, LongType)
    case (PgTypes.INT8, 1) => Literal(ByteBuffer.wrap(param).getLong, LongType)
    case (PgTypes.FLOAT4, 0) => Literal(text(param).toFloat, FloatType)
    case (PgTypes.FLOAT4, 1) => Literal(ByteBuffer.wrap(param).getFloat, FloatType)
    case (PgTypes.FLOAT8, 0) => Literal(text(param).toDouble, DoubleType)
    case (PgTypes.FLOAT8, 1) => Literal(ByteBuffer.wrap(param).getDouble, DoubleType)
    case (PgTypes.NUMERIC, 0) =>
      val d = Decimal(BigDecimal(text(param)))
      Literal(d, DecimalType(Math.max(d.precision, d.scale), d.scale))
    case (PgTypes.NUMERIC, 1) =>
      val d = Decimal(BigDecimal(PgNumeric.fromBytes(param)))
      Literal(d, DecimalType(Math.max(d.precision, d.scale), d.scale))
    case (PgTypes.VARCHAR | 25 | 705 | 1042, _) => // varchar/text/unknown/bpchar
      Literal(UTF8String.fromBytes(param), StringType)
    case (PgTypes.DATE, 0) =>
      Literal(java.time.LocalDate.parse(text(param)).toEpochDay.toInt, DateType)
    case (PgTypes.DATE, 1) =>
      Literal(ByteBuffer.wrap(param).getInt + PgTypes.PG_EPOCH_DAYS, DateType)
    case (PgTypes.TIMESTAMP, 1) =>
      Literal(ByteBuffer.wrap(param).getLong + PgTypes.PG_EPOCH_MICROS, TimestampType)
    case (PgTypes.TIMESTAMP, 0) =>
      val ldt = java.time.LocalDateTime.parse(text(param).replace(' ', 'T'))
      Literal(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L, TimestampType)
    case (PgTypes.UNSPECIFIED, f) =>
      throw new IllegalArgumentException(s"Unspecified type unsupported: format=$f")
    case (o, f) =>
      throw new IllegalArgumentException(s"Cannot bind param: oid=$o, format=$f")
  }

  private def text(b: Array[Byte]): String = new String(b, UTF_8)
}
