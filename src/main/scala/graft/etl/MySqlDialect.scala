package graft.etl

/** MySQL-dialect compatibility shim for reference user programs.
  *
  * The reference runs user SQL against MySQL (reference README.md:29-32,
  * bootstrap.sh:8-18). Most of that dialect parses as Spark SQL unchanged:
  * backtick-quoted identifiers are NATIVE Spark quoting, double-quoted
  * strings are string literals in both (Spark's default
  * `doubleQuotedIdentifiers` is off, matching MySQL), and IFNULL / NOW() /
  * CONCAT exist in both engines. The one corner that does not parse is the
  * comma LIMIT form — `LIMIT offset, count` — which Spark rejects; this
  * shim rewrites it to the ANSI `LIMIT count OFFSET offset` every engine
  * understands.
  *
  * The scan is QUOTE-AWARE (single-quoted strings, double-quoted strings,
  * backtick identifiers, line comments and block comments are never
  * rewritten) and anchors `LIMIT` on word boundaries, so a column named
  * `limit_5` or the text 'limit 1, 2' inside a literal pass through
  * untouched. Applied
  * unconditionally by [[EtlProcess.extract]]: the comma form is not valid
  * Spark SQL, so the rewrite can only repair a query, never change the
  * meaning of one that already parses.
  */
object MySqlDialect {

  def rewrite(sql: String): String = {
    val out = new StringBuilder(sql.length + 16)
    val n = sql.length
    var i = 0
    while (i < n) {
      sql.charAt(i) match {
        case q @ ('\'' | '"' | '`') => // quoted region: copy verbatim
          val end = closeQuote(sql, i + 1, q)
          out.append(sql.substring(i, end)); i = end
        // MySQL line comments need "--" FOLLOWED BY whitespace (or EOL):
        // bare "--" is double negation (a - -b), not a comment
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' &&
            (i + 2 >= n || Character.isWhitespace(sql.charAt(i + 2))) =>
          val end = { val e = sql.indexOf('\n', i); if (e < 0) n else e + 1 }
          out.append(sql.substring(i, end)); i = end
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' => // block comment
          val end = { val e = sql.indexOf("*/", i + 2); if (e < 0) n else e + 2 }
          out.append(sql.substring(i, end)); i = end
        case c if (c == 'l' || c == 'L') && wordBoundary(sql, i) =>
          tryLimit(sql, i) match {
            case Some((count, offset, end)) =>
              out.append(s"LIMIT $count OFFSET $offset"); i = end
            case None => out.append(c); i += 1
          }
        case c => out.append(c); i += 1
      }
    }
    out.toString
  }

  /** End index PAST the closing quote, honoring doubled-quote escapes
    * ('' inside '...', `` inside `...`) and backslash escapes. */
  private def closeQuote(s: String, from: Int, q: Char): Int = {
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && q != '`') i += 2
      else if (c == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2 // doubled escape
        else return i + 1
      } else i += 1
    }
    s.length
  }

  private def wordBoundary(s: String, i: Int): Boolean =
    i == 0 || { val p = s.charAt(i - 1)
      !Character.isLetterOrDigit(p) && p != '_' }

  /** Match `LIMIT <digits> , <digits>` at `i`; return (count, offset,
    * endIndex). The comma form only — plain LIMIT stays untouched. */
  private def tryLimit(s: String, i: Int): Option[(String, String, Int)] = {
    val kw = "limit"
    if (i + kw.length > s.length ||
      !s.regionMatches(true, i, kw, 0, kw.length)) return None
    var j = i + kw.length
    if (j >= s.length || !Character.isWhitespace(s.charAt(j))) return None
    while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
    val o0 = j
    while (j < s.length && Character.isDigit(s.charAt(j))) j += 1
    if (j == o0) return None
    val offset = s.substring(o0, j)
    while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
    if (j >= s.length || s.charAt(j) != ',') return None
    j += 1
    while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
    val c0 = j
    while (j < s.length && Character.isDigit(s.charAt(j))) j += 1
    if (j == c0) return None
    Some((s.substring(c0, j), offset, j))
  }
}
