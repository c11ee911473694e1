package graft.pg.wire

import org.apache.spark.sql.types._

/** Catalyst ⇄ PostgreSQL type bridge: oids, array oids, binary eligibility
  * (reference catalog.scala:122-209, protocol.scala:215-228). Spark 4's
  * DayTime/YearMonth intervals (absent in the Spark-3-era reference) map to
  * the PG interval oid.
  */
object PgTypes {
  val UNSPECIFIED = 0
  val BOOL = 16
  val BYTEA = 17
  val CHAR = 18
  val NAME = 19
  val INT8 = 20
  val INT2 = 21
  val INT4 = 23
  val TID = 27
  val FLOAT4 = 700
  val FLOAT8 = 701
  val BOOL_ARRAY = 1000
  val INT2_ARRAY = 1005
  val INT4_ARRAY = 1007
  val VARCHAR_ARRAY = 1015
  val INT8_ARRAY = 1016
  val FLOAT4_ARRAY = 1021
  val FLOAT8_ARRAY = 1022
  val VARCHAR = 1043
  val DATE = 1082
  val TIMESTAMP = 1114
  val TIMESTAMP_ARRAY = 1115
  val DATE_ARRAY = 1182
  val INTERVAL = 1186
  val INTERVAL_ARRAY = 1187
  val NUMERIC_ARRAY = 1231
  val NUMERIC = 1700
  // custom oids past the PG range, as the reference assigns (catalog.scala:150)
  val BYTE = 6200
  val MAP = 6201
  val STRUCT = 6202

  /** PG epoch (2000-01-01) offsets from the unix epoch. Spark 4 internal
    * values are proleptic-Gregorian days/micros since 1970-01-01, the same
    * calendar PG uses on the wire, so the conversion is a constant shift —
    * the reference's Julian/Gregorian cutoff dance (converters.scala:259-278)
    * existed only for Spark ≤2.x hybrid-calendar java.sql dates.
    */
  val PG_EPOCH_DAYS = 10957
  val PG_EPOCH_MICROS = 946684800000000L

  def oidOf(dt: DataType): Int = dt match {
    case BooleanType => BOOL
    case ByteType => BYTE
    case ShortType => INT2
    case IntegerType => INT4
    case LongType => INT8
    case FloatType => FLOAT4
    case DoubleType => FLOAT8
    case _: DecimalType => NUMERIC
    case StringType | _: CharType | _: VarcharType => VARCHAR
    case BinaryType => BYTEA
    case DateType => DATE
    case TimestampType | TimestampNTZType => TIMESTAMP
    case CalendarIntervalType | _: DayTimeIntervalType | _: YearMonthIntervalType => INTERVAL
    case ArrayType(elem, _) => arrayOidOf(elem)
    case _: MapType => MAP
    case _: StructType => STRUCT
    case NullType => VARCHAR
    case _ => VARCHAR // UDTs and anything else render as text
  }

  /** Nested arrays are flattened to varchar text, matching the reference's
    * punt (catalog.scala:206).
    */
  private def arrayOidOf(elem: DataType): Int = elem match {
    case BooleanType => BOOL_ARRAY
    case ShortType => INT2_ARRAY
    case IntegerType => INT4_ARRAY
    case LongType => INT8_ARRAY
    case FloatType => FLOAT4_ARRAY
    case DoubleType => FLOAT8_ARRAY
    case StringType => VARCHAR_ARRAY
    case DateType => DATE_ARRAY
    case TimestampType => TIMESTAMP_ARRAY
    case _: DecimalType => NUMERIC_ARRAY
    case _ => VARCHAR
  }

  /** typlen per oid for RowDescription (reference catalog.scala:122-153). */
  def typeLenOf(oid: Int): Int = oid match {
    case BOOL | BYTE | CHAR => 1
    case INT2 => 2
    case INT4 | FLOAT4 | DATE => 4
    case INT8 | FLOAT8 | TIMESTAMP => 8
    case TID => 6
    case NAME => 64
    case _ => -1
  }

  /** Types the server may emit in binary format; everything else must be
    * text (reference protocol.scala:215-217).
    */
  def binaryCapable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | BinaryType | DateType |
        TimestampType | TimestampNTZType | CalendarIntervalType => true
    case _: DecimalType => true // PgNumeric speaks numeric_send/recv
    case _ => false
  }
}
