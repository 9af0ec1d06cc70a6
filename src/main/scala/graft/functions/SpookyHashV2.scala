package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** SpookyHash V2 (Bob Jenkins, public domain;
  * burtleburtle.net/bob/hash/spooky.html), implemented from the published
  * algorithm. The reference exposes it as spooky_hash_v2_32/64
  * (operator/scalar/VarbinaryFunctions.java:306,316) returning the 32/64
  * bit value as a big-endian varbinary with seed 0; its own test vectors
  * ('' → 6BF50919 / 232706FC6BF50919, 'hello' → D382E6CA /
  * 3768826AD382E6CA, TestVarbinaryFunctions.java:338-341) are pinned in
  * FnSpec and the fn_extra_scalars oracle.
  */
object SpookyHashV2 {

  private final val SC = 0xdeadbeefdeadbeefL // sc_const
  private final val BlockSize = 96           // sc_numVars (12) longs
  private final val BufSize = 2 * BlockSize  // short-hash cutoff

  @inline private def rot(x: Long, k: Int): Long = java.lang.Long.rotateLeft(x, k)

  /** 128-bit hash; returns (hash1, hash2). */
  def hash128(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) =
    if (data.length < BufSize) short(data, seed1, seed2)
    else long(data, seed1, seed2)

  def hash64(data: Array[Byte], seed: Long = 0L): Long =
    hash128(data, seed, seed)._1

  def hash32(data: Array[Byte], seed: Int = 0): Int =
    hash128(data, seed & 0xffffffffL, seed & 0xffffffffL)._1.toInt

  /** Reference varbinary forms: big-endian bytes of the 32/64-bit value. */
  def bytes32(data: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(4).putInt(hash32(data)).array()
  def bytes64(data: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(8).putLong(hash64(data)).array()

  // ── short hash (< 192 bytes) ─────────────────────────────────────────

  private def short(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val length = data.length
    var remainder = length % 32
    var a = seed1; var b = seed2; var c = SC; var d = SC
    var off = 0

    if (length > 15) {
      val end = (length / 32) * 32
      while (off < end) {
        c += bb.getLong(off); d += bb.getLong(off + 8)
        // ShortMix
        c = rot(c, 50); c += d; a ^= c
        d = rot(d, 52); d += a; b ^= d
        a = rot(a, 30); a += b; c ^= a
        b = rot(b, 41); b += c; d ^= b
        c = rot(c, 54); c += d; a ^= c
        d = rot(d, 48); d += a; b ^= d
        a = rot(a, 38); a += b; c ^= a
        b = rot(b, 37); b += c; d ^= b
        c = rot(c, 62); c += d; a ^= c
        d = rot(d, 34); d += a; b ^= d
        a = rot(a, 5);  a += b; c ^= a
        b = rot(b, 36); b += c; d ^= b
        a += bb.getLong(off + 16); b += bb.getLong(off + 24)
        off += 32
      }
      if (remainder >= 16) {
        c += bb.getLong(off); d += bb.getLong(off + 8)
        c = rot(c, 50); c += d; a ^= c
        d = rot(d, 52); d += a; b ^= d
        a = rot(a, 30); a += b; c ^= a
        b = rot(b, 41); b += c; d ^= b
        c = rot(c, 54); c += d; a ^= c
        d = rot(d, 48); d += a; b ^= d
        a = rot(a, 38); a += b; c ^= a
        b = rot(b, 37); b += c; d ^= b
        c = rot(c, 62); c += d; a ^= c
        d = rot(d, 34); d += a; b ^= d
        a = rot(a, 5);  a += b; c ^= a
        b = rot(b, 36); b += c; d ^= b
        off += 16
        remainder -= 16
      }
    }

    // last 0..15 bytes, plus the length (the reference C switch with
    // fall-through, expressed as cumulative adds per 4-byte band)
    @inline def u8(i: Int): Long = data(off + i) & 0xffL
    d += length.toLong << 56
    if (remainder >= 12) {
      if (remainder == 15) d += u8(14) << 48
      if (remainder >= 14) d += u8(13) << 40
      if (remainder >= 13) d += u8(12) << 32
      d += bb.getInt(off + 8) & 0xffffffffL
      c += bb.getLong(off)
    } else if (remainder >= 8) {
      if (remainder == 11) d += u8(10) << 16
      if (remainder >= 10) d += u8(9) << 8
      if (remainder >= 9) d += u8(8)
      c += bb.getLong(off)
    } else if (remainder >= 4) {
      if (remainder == 7) c += u8(6) << 48
      if (remainder >= 6) c += u8(5) << 40
      if (remainder >= 5) c += u8(4) << 32
      c += bb.getInt(off) & 0xffffffffL
    } else if (remainder >= 1) {
      if (remainder == 3) c += u8(2) << 16
      if (remainder >= 2) c += u8(1) << 8
      c += u8(0)
    } else {
      c += SC; d += SC
    }

    // ShortEnd
    d ^= c; c = rot(c, 15); d += c
    a ^= d; d = rot(d, 52); a += d
    b ^= a; a = rot(a, 26); b += a
    c ^= b; b = rot(b, 51); c += b
    d ^= c; c = rot(c, 28); d += c
    a ^= d; d = rot(d, 9);  a += d
    b ^= a; a = rot(a, 47); b += a
    c ^= b; b = rot(b, 54); c += b
    d ^= c; c = rot(c, 32); d += c
    a ^= d; d = rot(d, 25); a += d
    b ^= a; a = rot(a, 63); b += a
    (a, b)
  }

  // ── long hash (>= 192 bytes) ─────────────────────────────────────────

  private def mix(bb: ByteBuffer, off: Int, h: Array[Long]): Unit = {
    h(0) += bb.getLong(off);      h(2) ^= h(10); h(11) ^= h(0); h(0) = rot(h(0), 11);   h(11) += h(1)
    h(1) += bb.getLong(off + 8);  h(3) ^= h(11); h(0) ^= h(1);  h(1) = rot(h(1), 32);   h(0) += h(2)
    h(2) += bb.getLong(off + 16); h(4) ^= h(0);  h(1) ^= h(2);  h(2) = rot(h(2), 43);   h(1) += h(3)
    h(3) += bb.getLong(off + 24); h(5) ^= h(1);  h(2) ^= h(3);  h(3) = rot(h(3), 31);   h(2) += h(4)
    h(4) += bb.getLong(off + 32); h(6) ^= h(2);  h(3) ^= h(4);  h(4) = rot(h(4), 17);   h(3) += h(5)
    h(5) += bb.getLong(off + 40); h(7) ^= h(3);  h(4) ^= h(5);  h(5) = rot(h(5), 28);   h(4) += h(6)
    h(6) += bb.getLong(off + 48); h(8) ^= h(4);  h(5) ^= h(6);  h(6) = rot(h(6), 39);   h(5) += h(7)
    h(7) += bb.getLong(off + 56); h(9) ^= h(5);  h(6) ^= h(7);  h(7) = rot(h(7), 57);   h(6) += h(8)
    h(8) += bb.getLong(off + 64); h(10) ^= h(6); h(7) ^= h(8);  h(8) = rot(h(8), 55);   h(7) += h(9)
    h(9) += bb.getLong(off + 72); h(11) ^= h(7); h(8) ^= h(9);  h(9) = rot(h(9), 54);   h(8) += h(10)
    h(10) += bb.getLong(off + 80); h(0) ^= h(8); h(9) ^= h(10); h(10) = rot(h(10), 22); h(9) += h(11)
    h(11) += bb.getLong(off + 88); h(1) ^= h(9); h(10) ^= h(11); h(11) = rot(h(11), 46); h(10) += h(0)
  }

  private def endPartial(h: Array[Long]): Unit = {
    h(11) += h(1); h(2) ^= h(11); h(1) = rot(h(1), 44)
    h(0) += h(2);  h(3) ^= h(0);  h(2) = rot(h(2), 15)
    h(1) += h(3);  h(4) ^= h(1);  h(3) = rot(h(3), 34)
    h(2) += h(4);  h(5) ^= h(2);  h(4) = rot(h(4), 21)
    h(3) += h(5);  h(6) ^= h(3);  h(5) = rot(h(5), 38)
    h(4) += h(6);  h(7) ^= h(4);  h(6) = rot(h(6), 33)
    h(5) += h(7);  h(8) ^= h(5);  h(7) = rot(h(7), 10)
    h(6) += h(8);  h(9) ^= h(6);  h(8) = rot(h(8), 13)
    h(7) += h(9);  h(10) ^= h(7); h(9) = rot(h(9), 38)
    h(8) += h(10); h(11) ^= h(8); h(10) = rot(h(10), 53)
    h(9) += h(11); h(0) ^= h(9);  h(11) = rot(h(11), 42)
    h(10) += h(0); h(1) ^= h(10); h(0) = rot(h(0), 54)
  }

  private def long(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val h = new Array[Long](12)
    h(0) = seed1; h(3) = seed1; h(6) = seed1; h(9) = seed1
    h(1) = seed2; h(4) = seed2; h(7) = seed2; h(10) = seed2
    h(2) = SC; h(5) = SC; h(8) = SC; h(11) = SC

    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val blockEnd = (data.length / BlockSize) * BlockSize
    var off = 0
    while (off < blockEnd) { mix(bb, off, h); off += BlockSize }

    // pad the remainder (0..95 bytes) to a final block whose last byte
    // carries the remainder length (the V2 tail encoding)
    val remainder = data.length - blockEnd
    val buf = new Array[Byte](BlockSize)
    System.arraycopy(data, blockEnd, buf, 0, remainder)
    buf(BlockSize - 1) = remainder.toByte
    val tail = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < 12) { h(i) += tail.getLong(i * 8); i += 1 }
    endPartial(h); endPartial(h); endPartial(h)
    (h(0), h(1))
  }
}
