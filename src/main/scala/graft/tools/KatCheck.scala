package graft.tools

import graft.{GraftSession, Tables}

/** VALUE-assertion replay for the reference-KAT campaign (round 14):
  * `extract_kats.py --values out.tsv <Test*.java…>` keeps the vectors
  * whose expected value is a plain Java literal (string / number /
  * boolean / null); this main runs each statement and compares the
  * single result cell against it — the error-gating SqlProbe replay
  * can't see a wrong VALUE behind a clean run, this can.
  *
  * Usage: runMain graft.tools.KatCheck /path/vals.tsv [setStmt…]
  * Comparison: strings exact; integrals by long value; floating
  * numerically (ULP-exact is the bar — both engines compute IEEE;
  * NaN/±Infinity spelled out); booleans/null literally. Round 15 adds
  * the constant-folded COMPUTED expecteds: kind 'json' compares
  * recursively (arrays ordered, maps as unordered {"__kat_map__":
  * [[k,v],...]} pair sets, structs positionally, {"__kat_num__": ...}
  * for IEEE specials) and kind 'dec' compares scale-exact decimal
  * text. Prints each mismatch and a final summary.
  */
object KatCheck {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def numMatches(n: java.lang.Number, want: String): Boolean =
    want match {
      case "NaN" => n.doubleValue.isNaN
      case "Infinity" => n.doubleValue == Double.PositiveInfinity
      case "-Infinity" => n.doubleValue == Double.NegativeInfinity
      case _ =>
        n.doubleValue == want.toDouble || n.floatValue == want.toFloat
    }

  /** Recursive structural compare of a Spark result value against the
    * extractor's folded-JSON expected tree. */
  private def cmpJson(node: com.fasterxml.jackson.databind.JsonNode,
      got: Any): Boolean = {
    if (node.isNull) return got == null
    if (node.isObject && node.has("__kat_num__")) return got match {
      case n: java.lang.Number => numMatches(n, node.get("__kat_num__").asText)
      case _ => false
    }
    if (node.isObject && node.has("__kat_map__")) return got match {
      case m: scala.collection.Map[_, _] =>
        val pairs = node.get("__kat_map__")
        m.size == pairs.size && (0 until pairs.size).forall { i =>
          val kv = pairs.get(i)
          m.exists { case (k, v) => cmpJson(kv.get(0), k) && cmpJson(kv.get(1), v) }
        }
      case m: java.util.Map[_, _] =>
        cmpJson(node, scala.jdk.CollectionConverters.MapHasAsScala(m).asScala)
      case _ => false
    }
    if (node.isArray) return got match {
      case s: scala.collection.Seq[_] =>
        s.length == node.size && s.indices.forall(i => cmpJson(node.get(i), s(i)))
      case a: Array[_] => cmpJson(node, a.toSeq)
      case r: org.apache.spark.sql.Row => // struct: positional tuple
        r.length == node.size && (0 until r.length).forall(i => cmpJson(node.get(i), r.get(i)))
      case _ => false
    }
    if (node.isTextual) return got != null && got.toString == node.asText
    if (node.isBoolean) return got == node.asBoolean
    if (node.isNumber) return got match {
      case n: java.lang.Number =>
        if (node.isIntegralNumber) n match {
          case _: java.lang.Double | _: java.lang.Float =>
            n.doubleValue == node.asDouble
          case d: java.math.BigDecimal => d.doubleValue == node.asDouble
          case _ => n.longValue == node.asLong
        } else n.doubleValue == node.asDouble || n.floatValue == node.asDouble.toFloat
      case _ => false
    }
    false
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-kat-check")
    Tables.register(spark, "/root/testdata/sf0.001")
    args.drop(1).foreach(s => spark.sql(s).collect())
    def unesc(s: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 't' => b.append('\t'); i += 2
            case 'n' => b.append('\n'); i += 2
            case '\\' => b.append('\\'); i += 2
            case c => b.append(c); i += 2
          }
        } else { b.append(s.charAt(i)); i += 1 }
      }
      b.toString
    }
    var ok = 0; var bad = 0; var err = 0; var skip = 0
    scala.io.Source.fromFile(args(0), "UTF-8").getLines().foreach { line =>
      val cols = line.split("\t", -1)
      if (cols.length >= 2) {
        val sql = unesc(cols(0)); val kind = cols(1)
        val want = if (cols.length >= 3) unesc(cols(2)) else ""
        try {
          val rows = spark.sql(sql).collect()
          if (rows.length != 1 || rows(0).length != 1) skip += 1
          else {
            val got = rows(0).get(0)
            val matches = kind match {
              case "null" => got == null
              case "bool" => got != null && got.toString == want
              case "str" => got != null && got.toString == want
              case "int" =>
                got match {
                  case n: java.lang.Number => n.longValue == want.toLong
                  case _ => false
                }
              case "num" =>
                got match {
                  // ULP-exact for doubles; a float expected literal
                  // compares at float precision; IEEE specials by name
                  case n: java.lang.Number => numMatches(n, want)
                  case _ => false
                }
              case "json" =>
                cmpJson(mapper.readTree(want), got)
              case "dec" =>
                got match {
                  // scale-exact decimal text (the reference's SqlDecimal
                  // comparison is scale-sensitive)
                  case d: java.math.BigDecimal => d.toString == want
                  case _ => false
                }
              case "bin" =>
                got match {
                  // binary cells compare as lowercase hex (r15: the
                  // sqlVarbinary/sqlVarbinaryHex helper folds)
                  case b: Array[Byte] =>
                    b.map(x => f"$x%02x").mkString == want
                  case _ => false
                }
              case _ => false
            }
            if (matches) ok += 1
            else {
              bad += 1
              println(s"MISMATCH [$kind] $sql\n  got=${rows(0).get(0)} want=$want")
            }
          }
        } catch {
          case e: Throwable =>
            err += 1
            println(s"ERROR $sql :: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
      }
    }
    println(s"[katcheck] ok=$ok mismatch=$bad error=$err skipped=$skip")
    spark.stop()
  }
}
