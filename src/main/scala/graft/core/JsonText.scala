package graft.core

/** Minimal JSON string quoting shared by the contract mains (Verify's
  * oracle_sql.json dump, the CLI's --json output): escapes backslash,
  * quote, and ALL control chars (<0x20) — a tab or CR in builder-authored
  * SQL would otherwise make a driver-side json.load fail. */
object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
