package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T6 — grok-lite `log_format` compiler (SURVEY.md §2.3).
  *
  * The reference compiles a header spec like
  * `"<Date> <Time> <Pid> <Level> <Component>: <Content>"` into a named-group
  * regex applied per line (Drain.py:319-334, log_to_dataframe :295-317).
  * Here the same spec is compiled once, config-time, into one anchored Java
  * regex and a set of `regexp_extract` '''columns''' — so the split runs
  * inside whole-stage codegen instead of a row UDF, and non-matching lines
  * are dropped by a codegen'd filter (reference drops them in the read loop,
  * Drain.py:309-312).
  */
object LogFormat {

  final case class Compiled(headers: Seq[String], regex: String)

  /** `"<A> <B>: <C>"` → headers [A,B,C], regex `^(.*?)\s+(.*?):\s+(.*?)$`. */
  def compile(logFormat: String): Compiled = {
    val parts   = logFormat.split("(?=<[^<>]+>)|(?<=>)").toSeq.filter(_.nonEmpty)
    val headers = Seq.newBuilder[String]
    val sb      = new StringBuilder("^")
    parts.foreach { p =>
      if (p.startsWith("<") && p.endsWith(">") && !p.contains(" ")) {
        headers += p.substring(1, p.length - 1)
        sb.append("(.*?)")
      } else {
        // regex-escape literals, runs of spaces → \s+ (Drain.py:326-327;
        // unlike the reference we also escape metacharacters like '.')
        sb.append(p.replaceAll("([^A-Za-z0-9 ])", "\\\\$1").replaceAll(" +", "\\\\s+"))
      }
    }
    sb.append("$")
    Compiled(headers.result(), sb.toString)
  }

  /** Apply a compiled format to a raw-line column: one projected column per
    * header; lines that don't match the format are dropped (S1 semantics).
    */
  def split(df: DataFrame, lineCol: String, fmt: Compiled): DataFrame = {
    val line = trim(col(lineCol))
    val cols: Seq[Column] = fmt.headers.zipWithIndex.map { case (h, i) =>
      regexp_extract(line, fmt.regex, i + 1).as(h)
    }
    df.filter(line.rlike(fmt.regex)).select(cols: _*)
  }
}
