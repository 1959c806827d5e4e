package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump every registered oracle SQL to a JSON file WITHOUT
  * running the queries — feeds static audits (e.g. the HUGEINT-output
  * scan in tools/audit_oracles.py) that must see the full registry fast. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracles.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    System.err.println(s"[dump] ${graft.SparkEntry.oracleSql.size} oracles -> $out")
  }
}
