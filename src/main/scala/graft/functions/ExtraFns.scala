package graft.functions

import java.math.{BigDecimal => JBigDecimal}
import java.net.InetAddress

import org.apache.spark.unsafe.types.UTF8String

/** Long-tail reference functions with no Spark native: FNV hashes,
  * IEEE-754 codecs, statistical CDFs (commons-math3, which ships with
  * Spark), IP/CIDR arithmetic, duration/data-size parsing
  * (reference: operator/scalar/VarbinaryFunctions.java,
  * MathFunctions.java, IpPrefixFunctions.java, DataSizeFunctions.java,
  * DateTimeFunctions.java parse_duration).
  */
object ExtraFns {

  // ── FNV (public Fowler–Noll–Vo spec) ─────────────────────────────────
  def fnv1_32(data: Array[Byte]): Long = {
    var h = 0x811c9dc5L
    data.foreach { b => h = (h * 0x01000193L) & 0xffffffffL; h ^= (b & 0xff) }
    h.toInt.toLong // presto returns the signed 32-bit value as bigint? keep unsigned-in-long
  }
  def fnv1_64(data: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    data.foreach { b => h *= 0x100000001b3L; h ^= (b & 0xff) }
    h
  }
  def fnv1a_32(data: Array[Byte]): Long = {
    var h = 0x811c9dc5L
    data.foreach { b => h ^= (b & 0xff); h = (h * 0x01000193L) & 0xffffffffL }
    h.toInt.toLong
  }
  def fnv1a_64(data: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    data.foreach { b => h ^= (b & 0xff); h *= 0x100000001b3L }
    h
  }

  // ── IEEE 754 big-endian codecs ───────────────────────────────────────
  def toIeee754_32(v: Float): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(java.lang.Float.floatToIntBits(v)).array()
  def fromIeee754_32(b: Array[Byte]): Float = {
    require(b.length == 4, "Input floating-point value must be exactly 4 bytes long")
    java.lang.Float.intBitsToFloat(java.nio.ByteBuffer.wrap(b).getInt)
  }
  def toIeee754_64(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(java.lang.Double.doubleToLongBits(v)).array()
  def fromIeee754_64(b: Array[Byte]): Double = {
    require(b.length == 8, "Input floating-point value must be exactly 8 bytes long")
    java.lang.Double.longBitsToDouble(java.nio.ByteBuffer.wrap(b).getLong)
  }

  // ── statistical CDFs (commons-math3, bundled with Spark) ─────────────
  def normalCdf(mean: Double, sd: Double, v: Double): Double = {
    require(sd > 0, "standardDeviation must be > 0")
    new org.apache.commons.math3.distribution.NormalDistribution(mean, sd)
      .cumulativeProbability(v)
  }
  def inverseNormalCdf(mean: Double, sd: Double, p: Double): Double = {
    require(p > 0 && p < 1, "p must be 0 > p > 1")
    require(sd > 0, "sd must be > 0")
    new org.apache.commons.math3.distribution.NormalDistribution(mean, sd)
      .inverseCumulativeProbability(p)
  }
  def betaCdf(a: Double, b: Double, v: Double): Double = {
    require(a > 0 && b > 0, "alpha and beta must be > 0")
    require(v >= 0 && v <= 1, "value must be in the interval [0, 1]")
    new org.apache.commons.math3.distribution.BetaDistribution(null, a, b)
      .cumulativeProbability(v)
  }
  def inverseBetaCdf(a: Double, b: Double, p: Double): Double = {
    require(a > 0 && b > 0, "alpha and beta must be > 0")
    require(p >= 0 && p <= 1, "p must be in the interval [0, 1]")
    new org.apache.commons.math3.distribution.BetaDistribution(null, a, b)
      .inverseCumulativeProbability(p)
  }

  // ── IP / CIDR (InetAddress covers v4 + v6) ───────────────────────────
  // literal guard: InetAddress.getByName resolves HOSTNAMES via DNS; the
  // reference uses Guava's InetAddresses.forString, which parses literals
  // only (IpAddressOperators.java:130). Require a ':' (v6) or a FULL
  // dotted-quad of decimal octets (v4) — a loose char-class would still
  // admit hex-only names ('cafe', 'dead.beef') and Java's legacy
  // inet_aton forms ('12345', '1.2.3'), triggering a DNS lookup from a
  // cast or accepting forms Guava rejects (ADVICE r14).
  private val V4Literal = raw"(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})".r
  private def isIpLiteral(ip: String): Boolean = ip match {
    case V4Literal(a, b, c, d) =>
      Seq(a, b, c, d).forall(_.toInt <= 255)
    case s =>
      s.indexOf(':') >= 0 && s.nonEmpty && s.forall(ch =>
        ch == ':' || ch == '.' || Character.digit(ch, 16) >= 0)
  }
  private def ipBytes(ip: String): Array[Byte] = {
    if (ip == null || !isIpLiteral(ip))
      throw new IllegalArgumentException(s"Cannot cast value to IPADDRESS: $ip")
    InetAddress.getByName(ip).getAddress
  }

  /** Canonical text form: dotted-quad for v4; RFC 5952 for v6 (lowercase
    * hex, no leading zeros, longest run of ≥2 zero groups compressed to
    * '::', leftmost on ties) — InetAddress.getHostAddress never
    * compresses, printing '2001:db8:0:0:0:0:0:0' where the reference
    * prints '2001:db8::'.
    */
  private def canonical(b: Array[Byte]): String =
    if (b.length == 4) InetAddress.getByAddress(b).getHostAddress
    // a 16-byte v4-MAPPED address renders as its dotted quad (the
    // reference's InetAddress.getByAddress returns an Inet4Address for
    // ::ffff:a.b.c.d — KAT value gate, CAST(x'..ffff..' AS IPADDRESS))
    else if ((0 until 10).forall(b(_) == 0) &&
        b(10) == 0xFF.toByte && b(11) == 0xFF.toByte)
      InetAddress.getByAddress(b.drop(12)).getHostAddress
    else {
      val groups = (0 until 8).map(i => ((b(2 * i) & 0xFF) << 8) | (b(2 * i + 1) & 0xFF))
      // longest run of zero groups, length ≥ 2, leftmost wins ties
      var bestStart = -1; var bestLen = 0
      var i = 0
      while (i < 8) {
        if (groups(i) == 0) {
          var j = i
          while (j < 8 && groups(j) == 0) j += 1
          if (j - i > bestLen) { bestStart = i; bestLen = j - i }
          i = j
        } else i += 1
      }
      if (bestLen < 2)
        groups.map(g => java.lang.Integer.toHexString(g)).mkString(":")
      else {
        val head = groups.take(bestStart).map(java.lang.Integer.toHexString(_)).mkString(":")
        val tail = groups.drop(bestStart + bestLen).map(java.lang.Integer.toHexString(_)).mkString(":")
        s"$head::$tail"
      }
    }

  private def maskedLow(b: Array[Byte], bits: Int): Array[Byte] = {
    val out = b.clone()
    var i = bits
    while (i < out.length * 8) { out(i / 8) = (out(i / 8) & ~(0x80 >> (i % 8))).toByte; i += 1 }
    out
  }
  private def maskedHigh(b: Array[Byte], bits: Int): Array[Byte] = {
    val out = b.clone()
    var i = bits
    while (i < out.length * 8) { out(i / 8) = (out(i / 8) | (0x80 >> (i % 8))).toByte; i += 1 }
    out
  }

  /** IPADDRESS literal semantics (IpAddressType canonical text): the
    * typed literal `IPADDRESS '::ffff:1.2.3.4'` reads as '1.2.3.4' in
    * the reference; the parser veneer rewrites it through this.
    */
  def ipCanonical(ip: String): String = canonical(ipBytes(ip))

  /** IPPREFIX literal semantics (IpPrefixType): canonical network
    * address (host bits zeroed) + '/bits'.
    */
  def ipPrefixCanonical(cidr: String): String = {
    val (b, bits) = parseCidr(cidr)
    s"${canonical(maskedLow(b, bits))}/$bits"
  }

  /** ip_prefix(ip, bits) → canonical 'network/bits'. */
  def ipPrefix(ip: String, bits: Int): String = {
    val b = ipBytes(ip)
    require(bits >= 0 && bits <= b.length * 8,
      s"prefixBits must be in [0, ${b.length * 8}]: $bits")
    s"${canonical(maskedLow(b, bits))}/$bits"
  }

  private def parseCidr(cidr: String): (Array[Byte], Int) = {
    val parts = cidr.split("/")
    require(parts.length == 2, s"Invalid CIDR: $cidr")
    val b = ipBytes(parts(0))
    val bits = parts(1).toInt
    require(bits >= 0 && bits <= b.length * 8, s"Invalid CIDR: $cidr")
    (b, bits)
  }

  def ipSubnetMin(cidr: String): String = {
    val (b, bits) = parseCidr(cidr)
    canonical(maskedLow(b, bits))
  }
  def ipSubnetMax(cidr: String): String = {
    val (b, bits) = parseCidr(cidr)
    canonical(maskedHigh(b, bits))
  }
  def ipSubnetRange(cidr: String): Array[String] =
    Array(ipSubnetMin(cidr), ipSubnetMax(cidr))

  // ── IPADDRESS / IPPREFIX cast + comparison surface (KAT wave 9;
  //    IpAddressOperators.java / IpPrefixOperators.java). The engine
  //    models both types as their canonical TEXT; these runtime statics
  //    supply the reference's cast family and the 16/17-byte comparison
  //    keys (the reference compares the fixed-width binary form —
  //    canonical-text order diverges for mixed-family or multi-digit
  //    operands, e.g. '::1' < '1.2.3.5' holds in bytes, not in text).
  private def bytes16(b: Array[Byte]): Array[Byte] =
    if (b.length == 16) b
    else {
      // v4 → v4-mapped ::ffff:a.b.c.d (IpAddressOperators.java:137-141)
      val out = new Array[Byte](16)
      out(10) = 0xFF.toByte; out(11) = 0xFF.toByte
      System.arraycopy(b, 0, out, 12, 4)
      out
    }

  /** CAST(varbinary AS IPADDRESS): 4 bytes read v4-mapped, 16 read as
    * v6; any other length errors (IpAddressOperators.java:167-183).
    */
  def ipFromVarbinary(b: Array[Byte]): String =
    if (b.length == 4 || b.length == 16) canonical(b)
    else throw new IllegalArgumentException(
      s"Invalid IP address binary length: ${b.length}")

  /** CAST(ipaddress AS VARBINARY): always the 16-byte form
    * (IpAddressOperators.java:187-190 — the stored slice IS 16 bytes).
    */
  def ipToVarbinary(ip: String): Array[Byte] = bytes16(ipBytes(ip))

  /** CAST(ipprefix-valued AS IPADDRESS): the network address
    * (IpPrefixOperators.java:199-202 — the first 16 bytes of the slice,
    * which hold the canonical/zeroed network address).
    */
  def ipPrefixToAddress(cidr: String): String = ipSubnetMin(cidr)

  /** CAST(ipaddress-valued AS IPPREFIX): full-length prefix — /32 for
    * v4, /128 for v6 (IpPrefixOperators.java:206-224).
    */
  def ipAddressToPrefix(ip: String): String = {
    val b = ipBytes(ip)
    s"${canonical(b)}/${b.length * 8}"
  }

  /** Order key: the reference compares IPADDRESS as its 16-byte slice
    * and IPPREFIX as its 17-byte slice (network bytes + length byte) —
    * both unsigned lexicographic, which is exactly Spark's BinaryType
    * ordering.
    */
  def ipOrderKey(v: String): Array[Byte] = {
    val slash = v.indexOf('/')
    if (slash < 0) bytes16(ipBytes(v))
    else {
      val net = bytes16(ipBytes(v.substring(0, slash)))
      val out = java.util.Arrays.copyOf(net, 17)
      out(16) = v.substring(slash + 1).toInt.toByte
      out
    }
  }

  // UTF8String adapters for the codegen'd StaticInvoke call sites
  // (StringType-valued StaticInvoke methods must speak UTF8String)
  def ipCastTextU(s: UTF8String): UTF8String =
    UTF8String.fromString(ipCanonical(s.toString))
  def ipPrefixCastTextU(s: UTF8String): UTF8String = {
    val t = s.toString
    // the reference's varchar→IPPREFIX requires the '/length' part
    // (IpPrefixOperators.java:139-141)
    if (!t.contains("/"))
      throw new IllegalArgumentException(s"Cannot cast value to IPPREFIX: $t")
    UTF8String.fromString(ipPrefixCanonical(t))
  }
  def ipFromVarbinaryU(b: Array[Byte]): UTF8String =
    UTF8String.fromString(ipFromVarbinary(b))
  def ipToVarbinaryU(s: UTF8String): Array[Byte] = ipToVarbinary(s.toString)
  def ipPrefixToAddressU(s: UTF8String): UTF8String =
    UTF8String.fromString(ipPrefixToAddress(s.toString))
  def ipAddressToPrefixU(s: UTF8String): UTF8String =
    UTF8String.fromString(ipAddressToPrefix(s.toString))
  def ipOrderKeyU(s: UTF8String): Array[Byte] = ipOrderKey(s.toString)

  /** is_subnet_of(cidr, ip) and is_subnet_of(cidr, cidr2). */
  def isSubnetOfIp(cidr: String, ip: String): Boolean = {
    val (b, bits) = parseCidr(cidr)
    val t = ipBytes(ip)
    b.length == t.length &&
      java.util.Arrays.equals(maskedLow(b, bits), maskedLow(t, bits))
  }
  def isSubnetOfCidr(cidr: String, sub: String): Boolean = {
    val (b, bits) = parseCidr(cidr)
    val (b2, bits2) = parseCidr(sub)
    b.length == b2.length && bits2 >= bits &&
      java.util.Arrays.equals(maskedLow(b, bits), maskedLow(maskedLow(b2, bits2), bits))
  }

  // ── parse_presto_data_size (DataSizeFunctions.java; 1024-based units) ─
  private val dataSizeUnits = Map("B" -> 0, "kB" -> 1, "MB" -> 2, "GB" -> 3,
    "TB" -> 4, "PB" -> 5, "EB" -> 6, "ZB" -> 7, "YB" -> 8)

  /** Typed seam for the registry: the reference returns decimal(38,0)
    * (DataSizeFunctions.java:39) — a plain BigDecimal UDF would map to
    * Spark's default DECIMAL(38,18) and overflow past ~1e20 ('7ZB').
    */
  def parseDataSizeDecimal(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(parseDataSize(s.toString), 38, 0)

  def parseDataSize(s: String): JBigDecimal = {
    val m = raw"^\s*(\d+(?:\.\d+)?)\s*([A-Za-z]+)\s*$$".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"Invalid data size: '$s'"))
    val exp = dataSizeUnits.getOrElse(m.group(2),
      throw new IllegalArgumentException(s"Invalid data size: '$s'"))
    new JBigDecimal(m.group(1))
      .multiply(new JBigDecimal(java.math.BigInteger.valueOf(1024).pow(exp)))
      .setScale(0, java.math.RoundingMode.DOWN)
  }

  // ── parse_duration (Duration syntax '3.2ms'; returns interval micros) ─
  private val durationUnits = Map("ns" -> 1e-3, "us" -> 1.0, "ms" -> 1e3,
    "s" -> 1e6, "m" -> 60e6, "h" -> 3600e6, "d" -> 86400e6)

  /** Returns MICROSECONDS — surfaced as a DAY-TO-SECOND interval by the
    * StaticInvoke builder (DayTimeIntervalType's physical type is Long
    * micros).
    */
  def parseDurationMicros(s: UTF8String): Long = {
    val m = raw"^\s*(\d+(?:\.\d+)?)\s*([a-z]+)\s*$$".r
      .findFirstMatchIn(s.toString)
      .getOrElse(throw new IllegalArgumentException(s"duration is not a valid data duration string: $s"))
    val unit = durationUnits.getOrElse(m.group(2),
      throw new IllegalArgumentException(s"Unknown duration unit: ${m.group(2)}"))
    math.round(m.group(1).toDouble * unit)
  }

  /** to_milliseconds(interval day-to-second) → bigint. */
  def intervalMillis(micros: Long): Long = micros / 1000L

  // ── split_to_multimap (StringFunctions.java) ─────────────────────────
  def splitToMultimap(s: String, entryDelim: String, kvDelim: String): Map[String, Seq[String]] = {
    require(entryDelim.nonEmpty && kvDelim.nonEmpty && entryDelim != kvDelim,
      "entryDelimiter and keyValueDelimiter must be non-empty and distinct")
    s.split(java.util.regex.Pattern.quote(entryDelim), -1).toSeq
      .map { entry =>
        val kv = entry.split(java.util.regex.Pattern.quote(kvDelim), -1)
        require(kv.length == 2, s"Key-value delimiter must appear exactly once in each entry: '$entry'")
        kv(0) -> kv(1)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
  }
}
