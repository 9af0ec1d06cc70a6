package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The reference's COLOR family (operator/scalar/ColorFunctions.java):
  * the COLOR type is a BIGINT here exactly as the reference encodes it —
  * rgb values ≥ 0 (0xRRGGBB), ANSI system colors as −(index+1) —
  * so `color`/`rgb` compose with `render`/`bar` through plain longs.
  * Interpolation runs in HSB space via java.awt.Color (the same calls
  * the reference makes); rendering emits the identical
  * ESC[38;5;<ansi>m … ESC[0m sequences with the same 6×6×6 cube
  * quantization (toAnsi, ColorFunctions.java:toAnsi).
  */
object ColorFns {

  private val SystemColors = Map(
    "BLACK" -> 0, "RED" -> 1, "GREEN" -> 2, "YELLOW" -> 3,
    "BLUE" -> 4, "MAGENTA" -> 5, "CYAN" -> 6, "WHITE" -> 7)

  private val AnsiReset = "\u001b[0m"

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  def rgb(red: Long, green: Long, blue: Long): Long = {
    if (red < 0 || red > 255) fail("red must be between 0 and 255")
    if (green < 0 || green > 255) fail("green must be between 0 and 255")
    if (blue < 0 || blue > 255) fail("blue must be between 0 and 255")
    (red << 16) | (green << 8) | blue
  }

  /** '#rgb' (css nibble replication) or a system color name. */
  def colorFromName(nameU: UTF8String): Long = {
    val s = nameU.toString
    if (s.length == 4 && s.charAt(0) == '#') {
      val r = Character.digit(s.charAt(1), 16)
      val g = Character.digit(s.charAt(2), 16)
      val b = Character.digit(s.charAt(3), 16)
      if (r != -1 && g != -1 && b != -1)
        return rgb((r << 4) | r, (g << 4) | g, (b << 4) | b)
    }
    SystemColors.get(s.toUpperCase(java.util.Locale.ENGLISH)) match {
      case Some(i) => -(i + 1).toLong
      case None => fail(s"Invalid color: '$s'")
    }
  }

  private def red(c: Long): Int = {
    if (c < 0) fail("color is not a valid rgb value"); ((c >>> 16) & 0xff).toInt
  }
  private def green(c: Long): Int = {
    if (c < 0) fail("color is not a valid rgb value"); ((c >>> 8) & 0xff).toInt
  }
  private def blue(c: Long): Int = {
    if (c < 0) fail("color is not a valid rgb value"); (c & 0xff).toInt
  }

  private def interpolate(fraction: Float, lowRgb: Long, highRgb: Long): Int = {
    val lo = java.awt.Color.RGBtoHSB(red(lowRgb), green(lowRgb), blue(lowRgb), null)
    val hi = java.awt.Color.RGBtoHSB(red(highRgb), green(highRgb), blue(highRgb), null)
    val h = fraction * (hi(0) - lo(0)) + lo(0)
    val s = fraction * (hi(1) - lo(1)) + lo(1)
    val v = fraction * (hi(2) - lo(2)) + lo(2)
    java.awt.Color.HSBtoRGB(h, s, v) & 0xFFFFFF
  }

  def colorInterpolate(fraction: Double, lowColor: Long, highColor: Long): Long = {
    if (lowColor < 0) fail("lowColor not a valid RGB color")
    if (highColor < 0) fail("highColor not a valid RGB color")
    val f = math.max(0.0, math.min(1.0, fraction))
    interpolate(f.toFloat, lowColor, highColor).toLong
  }

  def colorInterpolate5(value: Double, low: Double, high: Double,
      lowColor: Long, highColor: Long): Long =
    colorInterpolate((value - low) * 1.0 / (high - low), lowColor, highColor)

  /** 6×6×6 cube index for rgb; system colors map to their own index. */
  private def toAnsi(c: Long): Int =
    if (c >= 0) 16 + (red(c) * 6 / 256) * 36 + (green(c) * 6 / 256) * 6 + blue(c) * 6 / 256
    else (-c - 1).toInt

  private def escape(c: Long): String = "\u001b[38;5;" + toAnsi(c) + "m"

  def render(valueU: UTF8String, color: Long): UTF8String =
    UTF8String.fromString(escape(color) + valueU.toString + AnsiReset)

  def renderBool(value: Boolean): UTF8String =
    if (value) render(UTF8String.fromString("✓"), colorFromName(UTF8String.fromString("green")))
    else render(UTF8String.fromString("✗"), colorFromName(UTF8String.fromString("red")))

  def bar(percent: Double, width: Long, lowColor: Long, highColor: Long): UTF8String = {
    var count = (percent * width).toInt.toLong
    count = math.max(0L, math.min(width, count))
    val b = new StringBuilder
    var i = 0L
    while (i < count) {
      val fraction = (i * 1.0 / (width - 1)).toFloat
      b.append(escape(interpolate(fraction, lowColor, highColor).toLong)).append('█')
      i += 1
    }
    b.append(AnsiReset)
    i = count
    while (i < width) { b.append(' '); i += 1 }
    UTF8String.fromString(b.toString)
  }

  def bar2(percent: Double, width: Long): UTF8String =
    bar(percent, width, rgb(255, 0, 0), rgb(0, 255, 0))
}
