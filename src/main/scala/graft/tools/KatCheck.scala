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
  * numerically (ULP-exact is the bar — both engines compute IEEE);
  * booleans/null literally. Prints each mismatch and a final summary.
  */
object KatCheck {
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
                  case n: java.lang.Number =>
                    // ULP-exact for doubles; a float expected literal
                    // compares at float precision
                    n.doubleValue == want.toDouble ||
                      n.floatValue == want.toFloat
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
