package graft.sql

import scala.collection.mutable.ArrayBuffer

/** The dfsql SQL dialect, lowered to Spark SQL.
  *
  * The reference parses SQL with mindsdb_sql and interprets the AST over
  * pandas; its dialect quirks (SURVEY.md §2.5, §7.4) are:
  *   - `LIKE 'pat'` is an *anchored Python regex* (`re.match`), not SQL
  *     `%`/`_` patterns (reference: dfsql/functions.py:278-288);
  *   - `^` is *power*, not XOR (reference: dfsql/functions.py:242-248);
  *   - CAST accepts pandas/numpy type names (`str`, `int`, `float64`, …)
  *     (reference: dfsql/data_sources/base_data_source.py:228-231).
  *
  * We lower these at the token level and hand the result to Catalyst —
  * no interpreter of our own. The tokenizer respects string literals,
  * double-quoted identifiers and backticks, so rewrites never fire inside
  * quoted content.
  */
object Dialect {

  sealed trait Tok { def text: String }
  final case class Word(text: String) extends Tok // identifiers/keywords
  final case class Num(text: String) extends Tok
  final case class Str(text: String) extends Tok // includes quotes
  final case class Tick(text: String) extends Tok // `backticked`
  final case class Sym(text: String) extends Tok

  private val multiSyms = Seq("<=>", "<=", ">=", "!=", "<>", "||")

  def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder().append(quote)
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql(i)
          sb.append(ch)
          // backslash escapes the next character (Spark's non-ANSI default
          // honors \' inside literals — without this, 'it\'s' would end the
          // literal early and later rewrites could fire inside its content)
          if (ch == '\\' && i + 1 < n) {
            sb.append(sql(i + 1)); i += 1
          } else if (ch == quote) {
            // doubled quote = escaped quote inside the literal
            if (i + 1 < n && sql(i + 1) == quote) { sb.append(quote); i += 1 }
            else done = true
          }
          i += 1
        }
        out += Str(sb.toString)
      } else if (c == '`') {
        val end = sql.indexOf('`', i + 1)
        val stop = if (end < 0) n - 1 else end
        out += Tick(sql.substring(i, stop + 1))
        i = stop + 1
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql(i + 1).isDigit)) {
        val start = i
        while (i < n && (sql(i).isDigit || sql(i) == '.' ||
          sql(i) == 'e' || sql(i) == 'E' ||
          ((sql(i) == '+' || sql(i) == '-') && i > start &&
            (sql(i - 1) == 'e' || sql(i - 1) == 'E')))) i += 1
        out += Num(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        out += Word(sql.substring(start, i))
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        // bracketed comment (incl. /*+ hints */) — keep verbatim
        val end = sql.indexOf("*/", i + 2)
        val stop = if (end < 0) n else end + 2
        out += Sym(sql.substring(i, stop))
        i = stop
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        i = sql.indexOf('\n', i) match { case -1 => n; case nl => nl }
      } else {
        multiSyms.find(ms => sql.startsWith(ms, i)) match {
          case Some(ms) => out += Sym(ms); i += ms.length
          case None => out += Sym(c.toString); i += 1
        }
      }
    }
    out.result()
  }

  def render(toks: Seq[Tok]): String = toks.map(_.text).mkString(" ")

  /** Full dialect lowering: dfsql SQL text → Spark SQL text. */
  def lower(sql: String): String =
    render(mapCastNames(rewritePower(rewriteLike(tokenize(sql)))))

  // --- LIKE 'pat' → RLIKE '^(?:pat)'  (anchored regex, functions.py:278-288)
  private[sql] def rewriteLike(toks: Vector[Tok]): Vector[Tok] =
    toks.zipWithIndex.map {
      case (w @ Word(t), i) if t.equalsIgnoreCase("like") &&
        i + 1 < toks.length && toks(i + 1).isInstanceOf[Str] => Word("RLIKE")
      case (s @ Str(t), i) if i > 0 && anchorable(toks(i - 1)) =>
        val inner = t.substring(1, t.length - 1)
        Str(s"'^(?:$inner)'")
      case (tok, _) => tok
    }
  private def anchorable(prev: Tok): Boolean = prev match {
    case Word(t) => t.equalsIgnoreCase("like")
    case _ => false
  }

  // --- a ^ b → POWER(a, b)  (dfsql ^ is exponent, functions.py:242-248)
  private[sql] def rewritePower(toks: Vector[Tok]): Vector[Tok] = {
    val buf = ArrayBuffer(toks: _*)
    var idx = buf.lastIndexWhere(_ == Sym("^"))
    while (idx >= 0) {
      val (rStart, rEnd) = operandRight(buf, idx + 1)
      val (lStart, lEnd) = operandLeft(buf, idx - 1)
      val left = buf.slice(lStart, lEnd + 1)
      val right = buf.slice(rStart, rEnd + 1)
      val repl = Vector(Word("POWER"), Sym("(")) ++ left ++
        Vector(Sym(",")) ++ right ++ Vector(Sym(")"))
      buf.remove(lStart, rEnd - lStart + 1)
      buf.insertAll(lStart, repl)
      idx = buf.lastIndexWhere(_ == Sym("^"))
    }
    buf.toVector
  }

  /** [start, end] token span of the operand beginning at `i` (rightward). */
  private def operandRight(toks: ArrayBuffer[Tok], i0: Int): (Int, Int) = {
    var i = i0
    if (i < toks.length && toks(i) == Sym("-")) i += 1 // unary minus
    toks(i) match {
      case Word(_) if i + 1 < toks.length && toks(i + 1) == Sym("(") =>
        (i0, matchParen(toks, i + 1, +1))
      case Sym("(") => (i0, matchParen(toks, i, +1))
      case _ => (i0, i)
    }
  }

  /** [start, end] token span of the operand ending at `i` (leftward). */
  private def operandLeft(toks: ArrayBuffer[Tok], i: Int): (Int, Int) = {
    toks(i) match {
      case Sym(")") =>
        val open = matchParen(toks, i, -1)
        // function call: a non-keyword name directly before the open paren
        toks.lift(open - 1) match {
          case Some(Word(w)) if !reserved(w.toLowerCase) => (open - 1, i)
          case _ => (open, i)
        }
      case _ => (i, i)
    }
  }

  private val reserved = Set(
    "select", "from", "where", "and", "or", "not", "on", "by", "having",
    "when", "then", "else", "in", "as", "join", "group", "order", "limit",
    "offset", "distinct", "union", "all", "between", "like", "rlike", "is",
    "case", "end", "inner", "left", "right", "full", "outer", "cross")

  private def matchParen(toks: ArrayBuffer[Tok], at: Int, dir: Int): Int = {
    var depth = 0
    var i = at
    while (i >= 0 && i < toks.length) {
      toks(i) match {
        case Sym("(") => depth += dir
        case Sym(")") => depth -= dir
        case _ =>
      }
      if (depth == 0) return i
      i += dir
    }
    throw new graft.QueryExecutionException("Unbalanced parentheses in expression")
  }

  // --- CAST(x AS <pandas-name>) → Spark SQL type names (§1.2)
  private val castNames: Map[String, String] = Map(
    "str" -> "STRING", "string" -> "STRING", "object" -> "STRING",
    "text" -> "STRING", "category" -> "STRING",
    "int" -> "BIGINT", "int64" -> "BIGINT", "integer" -> "BIGINT",
    "int32" -> "INT", "int16" -> "SMALLINT", "int8" -> "TINYINT",
    "float" -> "DOUBLE", "float64" -> "DOUBLE", "double" -> "DOUBLE",
    "float32" -> "FLOAT",
    "bool" -> "BOOLEAN", "boolean" -> "BOOLEAN",
    "datetime" -> "TIMESTAMP", "datetime64" -> "TIMESTAMP")

  /** Maps pandas type names only when the `AS <name>` sits directly inside
    * a CAST(...) call — a plain column alias that happens to be named like
    * a pandas type (SELECT trim(text) AS text) must stay untouched. The
    * reference maps type names only in TypeCast AST nodes
    * (base_data_source.py execute_type_cast), so this mirrors that scope.
    * Tracked with a per-paren stack: each '(' pushes whether it belongs to
    * a CAST; the mapping fires only when the innermost open paren is a
    * CAST's (type sub-parens like DECIMAL(4,2) close before the AS).
    */
  private[sql] def mapCastNames(toks: Vector[Tok]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var stack = List.empty[Boolean]
    var prev: Option[Tok] = None
    for (i <- toks.indices) {
      val tok = toks(i)
      tok match {
        case Sym("(") =>
          val isCast = prev.exists {
            case Word(w) => w.equalsIgnoreCase("cast") ||
              w.equalsIgnoreCase("try_cast")
            case _ => false
          }
          stack = isCast :: stack
          out += tok
        case Sym(")") =>
          if (stack.nonEmpty) stack = stack.tail
          out += tok
        case Word(t) if castNames.contains(t.toLowerCase) &&
          prev.exists(isAs) && stack.headOption.contains(true) =>
          out += Word(castNames(t.toLowerCase))
        case _ => out += tok
      }
      prev = Some(tok)
    }
    out.result()
  }
  private def isAs(t: Tok): Boolean = t match {
    case Word(w) => w.equalsIgnoreCase("as")
    case _ => false
  }

  /** Backtick-quote occurrences of known LITERAL dotted column names
    * (`t1.sex` produced by JoinNaming) so a chained query over a join
    * result can address them the way the reference does
    * (base_data_source.py:200-226 tries the joined label first). Operates
    * on the token stream: Word '.' Word triples matching a known name
    * collapse into one backticked identifier. */
  def backtickDottedColumns(sql: String, dottedNames: Set[String]): String = {
    if (dottedNames.isEmpty) return sql
    val toks = tokenize(sql)
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case Word(a) if i + 2 < toks.length && toks(i + 1) == Sym(".") =>
          toks(i + 2) match {
            case Word(b) if dottedNames.contains(s"$a.$b") =>
              out += Tick(s"`$a.$b`"); i += 3
            case _ => out += toks(i); i += 1
          }
        case t => out += t; i += 1
      }
    }
    render(out.result())
  }

  /** Splice ` from <table> ` into every SELECT that lacks a FROM — the
    * `df.sql("SELECT x WHERE …")` accessor semantics (reference:
    * dfsql/extensions.py:15-62). Same contract as the reference scanner:
    * normalize parens/commas/whitespace; for each SELECT, scan forward —
    * an existing `from` cancels the insert; the first of
    * where/group/having/order/limit/offset or an unbalanced `)` (or end of
    * string) is the insert point. (The reference matches 'select' as a raw
    * substring, which also fires inside words like 'selected'; we match
    * whole words only — the intended contract, not the bug.)
    */
  def addImplicitFrom(sql: String, tableName: String): String = {
    val normalized = sql
      .replace("(", " ( ").replace(")", " ) ")
      .replace("\n", " ").replace(",", " , ")
      .trim.split("\\s+").mkString(" ")
    val words = normalized.split(" ").toVector
    // char offset of each word in the normalized string
    val offsets = words.scanLeft(0)((acc, w) => acc + w.length + 1)
    val keywords = Set("where", "group", "having", "order", "limit", "offset")
    val inserts = ArrayBuffer[Int]()
    for (wi <- words.indices if words(wi).equalsIgnoreCase("select")) {
      var needFrom = true
      var insertAt = normalized.length
      var depth = 0
      var j = wi + 1
      var done = false
      while (j < words.length && !done) {
        val w = words(j).toLowerCase
        if (w == "from") { needFrom = false; done = true }
        else if (w == "(") depth += 1
        else if (w == ")") {
          if (depth == 0) { insertAt = offsets(j); done = true }
          else depth -= 1
        } else if (keywords(w)) { insertAt = offsets(j); done = true }
        j += 1
      }
      if (needFrom) inserts += insertAt
    }
    val sb = new StringBuilder
    var last = 0
    // positions are discovered in SELECT-occurrence order, which is NOT
    // ascending when an inner subquery's insert point (its closing paren)
    // precedes the outer query's (its WHERE) — stitch in text order
    for (pos <- inserts.sorted) {
      sb.append(normalized.substring(last, pos)).append(s" from $tableName ")
      last = pos
    }
    sb.append(normalized.substring(last))
    sb.toString.trim.split("\\s+").mkString(" ")
  }
}
