package graft.pg.wire

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

/** PG `numeric` BINARY wire format (send/recv), shared by the DataRow
  * binary writer, binary parameter binds, and binary COPY. The reference
  * emits numerics as text only (converters.scala:107-126); real PG clients
  * (pgjdbc past its prepared-statement threshold, binary COPY) negotiate
  * the binary form, so the engine speaks it natively.
  *
  * Layout (PostgreSQL numeric_send):
  * {{{
  *   int16 ndigits   // base-10000 digit groups, most significant first
  *   int16 weight    // position of the first group relative to the
  *                   // decimal point: value = Σ d[i] · 10000^(weight−i)
  *   int16 sign      // 0x0000 positive, 0x4000 negative, 0xC000 NaN
  *   int16 dscale    // display scale (decimal fraction digits)
  *   int16 d[ndigits]
  * }}}
  * Groups are aligned to the decimal point: the fractional part occupies
  * whole base-10000 groups, so a scale-2 value like 1234.56 encodes as
  * [1234, 5600] with weight 0, NOT [123, 4560].
  */
object PgNumeric {

  private val SignPos = 0x0000
  private val SignNeg = 0x4000
  private val SignNaN = 0xC000
  private val TenThousand = BigInteger.valueOf(10000L)

  /** Encode to the wire bytes (without any length prefix). */
  def toBytes(bd0: JBigDecimal): Array[Byte] = {
    val bd = bd0.stripTrailingZeros match {
      // stripTrailingZeros can yield negative scale (1200 -> 12E+2); PG
      // dscale is unsigned, so re-pin integral values to scale 0
      case s if s.scale < 0 => s.setScale(0)
      case s => s
    }
    // dscale preserves the ORIGINAL display scale (PG keeps "1.10"'s two
    // fraction digits even though one digit suffices for the value)
    val dscale = Math.max(bd0.scale, 0)
    val neg = bd.signum < 0
    val abs = bd.abs
    if (abs.signum == 0) {
      val out = ByteBuffer.allocate(8)
      out.putShort(0); out.putShort(0)
      out.putShort(SignPos.toShort); out.putShort(dscale.toShort)
      return out.array()
    }
    // shift so the fraction occupies whole base-10000 groups
    val fracGroups = (abs.scale + 3) / 4
    val shifted = abs.movePointRight(fracGroups * 4).toBigIntegerExact
    // base-10000 digits, least significant first
    var rest = shifted
    val rev = scala.collection.mutable.ArrayBuffer.empty[Short]
    while (rest.signum != 0) {
      val Array(q, r) = rest.divideAndRemainder(TenThousand)
      rev += r.shortValueExact()
      rest = q
    }
    val digits = rev.reverse
    // weight of the most significant group; trim trailing zero groups
    // (they are implied by position, PG strips them too)
    var n = digits.length
    while (n > 0 && digits(n - 1) == 0) n -= 1
    val weight = digits.length - fracGroups - 1
    val out = ByteBuffer.allocate(8 + 2 * n)
    out.putShort(n.toShort)
    out.putShort(weight.toShort)
    out.putShort((if (neg) SignNeg else SignPos).toShort)
    out.putShort(dscale.toShort)
    var i = 0
    while (i < n) { out.putShort(digits(i)); i += 1 }
    out.array()
  }

  def write(buf: ByteBuffer, bd: JBigDecimal): Unit = {
    val b = toBytes(bd)
    buf.putInt(b.length)
    buf.put(b)
  }

  /** Decode wire bytes (without length prefix) to a BigDecimal at the
    * encoded dscale. NaN has no BigDecimal value — rejected loudly.
    */
  def fromBytes(bytes: Array[Byte]): JBigDecimal = {
    val in = ByteBuffer.wrap(bytes)
    val ndigits = in.getShort.toInt
    val weight = in.getShort.toInt
    val sign = in.getShort & 0xFFFF
    val dscale = in.getShort.toInt
    if (sign == SignNaN)
      throw new IllegalArgumentException("numeric NaN has no SQL DECIMAL value")
    if (sign != SignPos && sign != SignNeg)
      throw new IllegalArgumentException(f"invalid numeric sign 0x$sign%04x")
    var acc = BigInteger.ZERO
    var i = 0
    while (i < ndigits) {
      val d = in.getShort.toInt
      if (d < 0 || d > 9999)
        throw new IllegalArgumentException(s"numeric digit group $d out of range")
      acc = acc.multiply(TenThousand).add(BigInteger.valueOf(d.toLong))
      i += 1
    }
    // value = acc · 10000^(weight − ndigits + 1)
    val exp10 = (weight - ndigits + 1) * 4
    val unscaled = new JBigDecimal(if (sign == SignNeg) acc.negate else acc)
    unscaled.scaleByPowerOfTen(exp10).setScale(dscale, RoundingMode.UNNECESSARY)
  }
}
