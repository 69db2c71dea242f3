package graft

import graft.pipeline.RedshiftScript

/** Scratch: verify statement splitting of a script with invisible
  * unicode between statements. No Spark session.
  */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val text = "CREATE OR REPLACE VIEW a.b AS SELECT 1\nWITH NO SCHEMA binding\n;\n​\nGRANT SELECT ON a.b TO x;\n"
    val stmts = RedshiftScript.splitStatements(text)
    stmts.zipWithIndex.foreach { case (s, i) =>
      println(s"stmt $i: <<" + s.trim.take(40).flatMap(c =>
        if (c < 128) c.toString else f"[U+${c.toInt}%04X]") + ">>")
    }
    val lat = RedshiftScript.inlineLateralAlias(
      """SELECT CASE WHEN store_label = 'DE' THEN 'G' END AS country,
        |  'B2B' || ' ' || country AS store,
        |  SUM(amount) AS v
        |FROM t WHERE x GROUP BY 1, 2, country""".stripMargin, "country")
    println("INLINED: " + lat.replaceAll("\\s+", " "))
    // inline-test mode: <file> <aliasName> → apply inlineLateralAlias
    // and print whether/where the text changed
    if (args.length == 2) {
      val sql = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args(0))), java.nio.charset.StandardCharsets.UTF_8)
      val out = RedshiftScript.inlineLateralAlias(sql, args(1))
      println(s"CHANGED=${out != sql}")
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/inlined.sql"),
        out.getBytes("UTF-8"))
      if (out != sql) {
        val a = sql.split("\n", -1); val b = out.split("\n", -1)
        var shown = 0
        var i = 0
        while (i < math.min(a.length, b.length) && shown < 8) {
          if (a(i) != b(i)) { println(f"line ${i + 1}%d: ${b(i).trim.take(120)}"); shown += 1 }
          i += 1
        }
      }
      return
    }
    args.headOption.foreach { p =>
      val real = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      RedshiftScript.splitStatements(real).zipWithIndex.foreach { case (s, i) =>
        println(f"real stmt $i%2d verb: <<" + s.trim.take(30).flatMap(c =>
          if (c < 128 && c != '\n') c.toString else f"[U+${c.toInt}%04X]") + ">>")
      }
    }
  }
}
