package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** IPADDRESS / IPPREFIX as first-class cast targets (reference
  * IpAddressOperators.java / IpPrefixOperators.java; KAT wave 9,
  * TestIpAddressOperators + TestIpPrefixOperators).
  *
  * The engine models both types as their canonical TEXT (IpAddressType /
  * IpPrefixType display forms — dotted-quad v4, RFC 5952 v6,
  * 'network/len' prefixes), which makes equality, grouping, DISTINCT
  * and joins correct for free (the canonical form is injective) and
  * keeps every ip_* function a plain string function. Two places need
  * more than text, both supplied here:
  *
  *  - **casts** dispatch on the SOURCE: varchar parses-and-canonicalizes
  *    (literals only — no hostname resolution, like Guava's
  *    `InetAddresses.forString` in the reference), varbinary reads 4
  *    bytes v4-mapped / 16 bytes v6 and errors otherwise, IPPREFIX →
  *    IPADDRESS takes the network address, IPADDRESS → IPPREFIX the
  *    full-length /32 / /128 prefix. [[IpCastExpr]] is the late-binding
  *    dispatch (the parser can't see the source type), and doubles as
  *    the TYPE TAG other rewrites recover the ip-ness from.
  *
  *  - **ordering comparisons** use the reference's fixed-width binary
  *    key (16 bytes for addresses, network-bytes + length for prefixes)
  *    — canonical-text order diverges for mixed-family or multi-digit
  *    operands ('::1' < '1.2.3.5' holds in bytes, not text;
  *    '2.0.0.0' < '10.0.0.0' likewise). PrestoComparisonRule rewrites
  *    `ip < ip` to an unsigned byte-array compare (Spark's BinaryType
  *    ordering IS unsigned lexicographic), which keeps filter pushdown
  *    on the produced key expressions and never touches plain-string
  *    comparisons. Equality stays textual (already correct).
  *
  * ORDER BY / window frames over raw ip text keep text order — a
  * documented approximation (sort the `ip_order_key` if byte order
  * matters); grouping and joins are unaffected (equality is exact).
  */
object IpOps {

  /** Is this string-typed expression an IPADDRESS value by construction?
    * Producers: `CAST(x AS IPADDRESS)` / `IPADDRESS 'x'` (both reach
    * analysis as [[IpCastExpr]] or the ip_canonical UDF) and the
    * address-returning ip functions. The registry's RETURN_NULL_ON_NULL
    * If-wrap and With-binding are looked through, same as
    * [[JsonTargets.isJsonExpr]].
    */
  def isIpAddressExpr(e: Expression): Boolean = strip(e) match {
    case IpCastExpr(_, false) => true
    case u: ScalaUDF => u.udfName.exists(addrFns)
    case _ => false
  }

  def isIpPrefixExpr(e: Expression): Boolean = strip(e) match {
    case IpCastExpr(_, true) => true
    case u: ScalaUDF => u.udfName.exists(prefixFns)
    case _ => false
  }

  /** Either ip type — the comparison key covers both widths. */
  def isIpExpr(e: Expression): Boolean =
    isIpAddressExpr(e) || isIpPrefixExpr(e)

  private val addrFns =
    Set("ip_canonical", "ip_subnet_min", "ip_subnet_max")
  private val prefixFns = Set("ip_prefix_canonical", "ip_prefix")

  @scala.annotation.tailrec
  private def strip(e: Expression): Expression = e match {
    case a: Alias => strip(a.child)
    case If(_, Literal(null, _), inner) => strip(inner)
    case w: With => strip(w.child)
    case _ => e
  }

  /** The reference's 16/17-byte comparison key. */
  def orderKey(e: Expression): Expression =
    StaticInvoke(ExtraFns.getClass, BinaryType, "ipOrderKeyU",
      Seq(e), inputTypes = Seq(StringType), propagateNull = true)
}

/** `CAST(e AS IPADDRESS)` / `CAST(e AS IPPREFIX)` (and the typed
  * literals, which the parser routes through the same builders) —
  * late-binding dispatch on the resolved source type, like
  * [[PrestoDivide]].
  */
case class IpCastExpr(child: Expression, toPrefix: Boolean)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String = if (toPrefix) "ip_prefix_cast" else "ip_cast"

  private def invoke(fn: String, inT: DataType = StringType,
      outT: DataType = StringType): Expression =
    StaticInvoke(ExtraFns.getClass, outT, fn, Seq(child),
      inputTypes = Seq(inT), propagateNull = true)

  override lazy val replacement: Expression = child.dataType match {
    case NullType => Literal.create(null, StringType)
    case BinaryType if !toPrefix => invoke("ipFromVarbinaryU", BinaryType)
    case _: StringType if toPrefix =>
      if (IpOps.isIpAddressExpr(child)) invoke("ipAddressToPrefixU")
      else invoke("ipPrefixCastTextU") // idempotent on prefix values
    case _: StringType =>
      if (IpOps.isIpPrefixExpr(child)) invoke("ipPrefixToAddressU")
      else invoke("ipCastTextU") // idempotent on address values
    case other =>
      throw new IllegalArgumentException(
        s"Cannot cast ${other.catalogString} to " +
          (if (toPrefix) "IPPREFIX" else "IPADDRESS"))
  }

  override protected def withNewChildInternal(newChild: Expression): IpCastExpr =
    copy(child = newChild)
}
