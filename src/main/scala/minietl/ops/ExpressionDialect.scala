package minietl.ops

/** Translator from the reference's `pd.eval` expression dialect to Spark SQL.
  *
  * The reference's `ExpressionTransformer` evaluates pandas-eval strings
  * (see /root/reference/mini_etl/components/transformers.py:288-323): column
  * arithmetic `+ - * / ** % //`, comparisons `== != < <= > >=`, boolean
  * `& | ~`, and an assignment form `"name = rhs"` that derives a column.
  *
  * Spark SQL is a superset of that language except for operators that
  * differ in spelling or semantics:
  *   - `**`  (power)            -> POWER(a, b)   (right-associative)
  *   - `//`  (floor division)   -> FLOOR(a / b)  (floor, not trunc, on negatives)
  *   - `%`   (python modulo)    -> ((a % b) + b) % b  (divisor's sign, not
  *                                 Spark/Java's dividend-sign remainder)
  *   - `&` / `|` / `~` (boolean)-> AND / OR / NOT
  *   - `==`                     -> =
  *   - chained comparisons      -> `a < b < c` means `(a < b) AND (b < c)`
  *                                 (python semantics; a naive precedence
  *                                 climb would emit the left-fold `(a<b)<c`)
  *
  * We tokenize and re-emit via precedence climbing rather than regex hacks so
  * nested expressions like `(a + b) ** 2 // c & d > 1` translate correctly.
  * ExpressionDialectSpec cross-checks the arithmetic corner cases against a
  * hand-rolled python-semantics evaluator over seeded random expression
  * trees.
  */
object ExpressionDialect {

  sealed trait Tok
  case class Ident(s: String) extends Tok
  case class Num(s: String) extends Tok
  case class Str(s: String) extends Tok
  case class Op(s: String) extends Tok
  case object LParen extends Tok
  case object RParen extends Tok
  case object Comma extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val j = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.' || s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
          ((s.charAt(i) == '+' || s.charAt(i) == '-') && i > j && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        out += Num(s.substring(j, i))
      } else if (c.isLetter || c == '_') {
        val j = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Ident(s.substring(j, i))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val j = i + 1
        i += 1
        val sb = new StringBuilder
        while (i < n && s.charAt(i) != quote) {
          if (s.charAt(i) == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        require(i < n, s"unterminated string literal at $j in: $s")
        i += 1
        out += Str(sb.toString)
      } else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') { out += RParen; i += 1 }
      else if (c == ',') { out += Comma; i += 1 }
      else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (two == "**" || two == "//" || two == "==" || two == "!=" || two == "<=" || two == ">=" || two == "&&" || two == "||") {
          out += Op(two); i += 2
        } else if ("+-*/%<>&|~^!=".indexOf(c) >= 0) { out += Op(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"unexpected char '$c' at $i in: $s")
      }
    }
    out.toList
  }

  // precedence: | < ^ < & < comparisons < +- < */ // % < unary < ** < atoms
  private final val Prec: Map[String, Int] = Map(
    "|" -> 1, "||" -> 1, "^" -> 2, "&" -> 3, "&&" -> 3,
    "==" -> 4, "!=" -> 4, "<" -> 4, "<=" -> 4, ">" -> 4, ">=" -> 4, "=" -> 4,
    "+" -> 5, "-" -> 5,
    "*" -> 6, "/" -> 6, "//" -> 6, "%" -> 6,
    "**" -> 8)

  private final val CmpOps = Set("==", "!=", "<", "<=", ">", ">=", "=")

  /** Spark SQL functions whose value changes per evaluation — a chained
    * comparison may not share one (its SQL is emitted into two conjuncts).
    */
  private val NonDeterministicFns: Set[String] =
    Set("rand", "randn", "random", "uuid", "shuffle",
      "monotonically_increasing_id")

  private class Parser(var toks: List[Tok]) {
    /** Names of functions called so far, in parse order — lets the chain
      * expansion check whether a shared operand called a nondeterministic
      * one (slice between two size marks = the calls inside that operand).
      */
    val calledFns = scala.collection.mutable.ListBuffer.empty[String]
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val h = toks.head; toks = toks.tail; h }

    // python-style word operators accepted alongside the symbol forms
    private def wordOp(t: Tok): Option[String] = t match {
      case Ident(w) => w.toLowerCase match {
        case "and" => Some("&")
        case "or" => Some("|")
        case _ => None
      }
      case _ => None
    }

    private def isWord(t: Tok, w: String): Boolean = t match {
      case Ident(s) => s.equalsIgnoreCase(w)
      case _ => false
    }

    /** `in (a, b, ...)` membership list after an `in` / `not in`. */
    private def parseInList(): String = {
      require(peek.contains(LParen), "expected ( after in")
      next()
      val items = scala.collection.mutable.ListBuffer(parseExpr(0))
      while (peek.contains(Comma)) { next(); items += parseExpr(0) }
      require(next() == RParen, "expected ) closing in-list")
      items.mkString("(", ", ", ")")
    }

    def parseExpr(minPrec: Int): String = {
      var lhs = parseUnary()
      var done = false
      while (!done) {
        peek match {
          // pandas-eval chained comparisons: `a < b < c` means
          // `(a < b) & (b < c)` (each middle operand shared), NOT the
          // left-fold `(a < b) < c` a naive precedence climb would emit.
          // The shared operand's SQL is re-emitted into both conjuncts, so
          // it must be DETERMINISTIC — python evaluates each chain operand
          // once, but a re-emitted rand() would draw twice and could make
          // the conjunction inconsistent; rejected at translation time.
          case Some(Op(op)) if CmpOps.contains(op) && Prec(op) >= minPrec =>
            next()
            var mark = calledFns.size
            var operand = parseExpr(Prec(op) + 1)
            var operandFns = calledFns.drop(mark).toList
            var parts = List(emit(op, lhs, operand))
            var chaining = true
            while (chaining) peek match {
              case Some(Op(o2)) if CmpOps.contains(o2) =>
                operandFns.find(NonDeterministicFns).foreach { f =>
                  throw new IllegalArgumentException(
                    s"chained comparison shares operand '$operand', which " +
                      s"calls nondeterministic $f() — each conjunct would " +
                      "re-evaluate it; derive it as a column first")
                }
                next()
                mark = calledFns.size
                val nxt = parseExpr(Prec(o2) + 1)
                parts = parts :+ emit(o2, operand, nxt)
                operand = nxt
                operandFns = calledFns.drop(mark).toList
              case _ => chaining = false
            }
            lhs = parts.reduce((a, b) => s"($a AND $b)")
          case Some(Op(op)) if Prec.contains(op) && Prec(op) >= minPrec =>
            next()
            val rightAssoc = op == "**"
            val rhs = parseExpr(if (rightAssoc) Prec(op) else Prec(op) + 1)
            lhs = emit(op, lhs, rhs)
          // membership tests at comparison precedence: `x in (...)`,
          // `x not in (...)` (pandas-eval operators)
          case Some(t) if isWord(t, "in") && Prec("==") >= minPrec =>
            next()
            lhs = s"($lhs IN ${parseInList()})"
          case Some(t) if isWord(t, "not") && toks.drop(1).headOption.exists(isWord(_, "in"))
              && Prec("==") >= minPrec =>
            next(); next()
            lhs = s"($lhs NOT IN ${parseInList()})"
          case Some(t) if wordOp(t).exists(op => Prec(op) >= minPrec) =>
            val op = wordOp(next()).get
            lhs = emit(op, lhs, parseExpr(Prec(op) + 1))
          case _ => done = true
        }
      }
      lhs
    }

    private def parseUnary(): String = peek match {
      case Some(Op("~")) | Some(Op("!")) => next(); s"(NOT ${parseExpr(7)})"
      case Some(Ident(w)) if w.toLowerCase == "not" =>
        // python precedence: `not` binds looser than comparisons (so
        // `not a > b` is NOT(a > b)) but tighter than and/or — unlike `~`,
        // which is tight like pandas' bitwise-not
        next(); s"(NOT ${parseExpr(4)})"
      case Some(Op("-")) => next(); s"(- ${parseExpr(7)})"
      case Some(Op("+")) => next(); parseExpr(7)
      case _ => parseAtom()
    }

    private def parseAtom(): String = next() match {
      case Num(v) => v
      case Str(v) => "'" + v.replace("'", "\\'") + "'"
      case Ident(name) =>
        peek match {
          case Some(LParen) => // function call, pass through
            calledFns += name.toLowerCase
            next()
            val args = scala.collection.mutable.ListBuffer.empty[String]
            if (peek != Some(RParen)) {
              args += parseExpr(0)
              while (peek == Some(Comma)) { next(); args += parseExpr(0) }
            }
            require(next() == RParen, "expected )")
            s"$name(${args.mkString(", ")})"
          case _ =>
            name.toLowerCase match {
              case "true" | "false" | "null" => name.toUpperCase
              case _ => s"`$name`" // and/or/not are operators, handled above
            }
        }
      case LParen =>
        val e = parseExpr(0)
        require(next() == RParen, "expected )")
        s"($e)"
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    private def emit(op: String, l: String, r: String): String = op match {
      case "**" => s"POWER($l, $r)"
      case "//" => s"FLOOR($l / $r)"
      // python modulo takes the DIVISOR's sign (a - floor(a/b)*b); Spark's
      // `%` takes the dividend's. ((a % b) + b) % b corrects the sign in
      // exact arithmetic for every sign combination (pmod does NOT — it
      // only clamps non-negative for positive divisors).
      case "%" => s"((($l % $r) + $r) % $r)"
      case "&" | "&&" => s"($l AND $r)"
      case "|" | "||" => s"($l OR $r)"
      case "^" => s"($l != $r)" // pandas boolean xor
      case "==" | "=" => s"($l = $r)"
      case o => s"($l $o $r)"
    }
  }

  /** Translate one pd.eval expression into a Spark SQL expression string. */
  def translate(expression: String): String = {
    val p = new Parser(tokenize(expression))
    val out = p.parseExpr(0)
    require(p.toks.isEmpty, s"trailing tokens ${p.toks.mkString(" ")} in: $expression")
    out
  }

  /** Split an assignment-form expression `"name = rhs"` into (name, rhsSql).
    * Returns None when the string is a bare (filter) expression. Mirrors the
    * reference's split on a single `=` that is not part of a comparison
    * (transformers.py:316-320).
    */
  def splitAssignment(expression: String): Option[(String, String)] = {
    var i = 0
    val s = expression
    var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == '\'' || c == '"') { // skip string literal
        val q = c; i += 1
        while (i < s.length && s.charAt(i) != q) { if (s.charAt(i) == '\\') i += 1; i += 1 }
      } else if (c == '=' && depth == 0) {
        val prev = if (i > 0) s.charAt(i - 1) else ' '
        val nxt = if (i + 1 < s.length) s.charAt(i + 1) else ' '
        if (prev != '=' && prev != '!' && prev != '<' && prev != '>' && nxt != '=') {
          val name = s.substring(0, i).trim
          val rhs = s.substring(i + 1).trim
          if (name.nonEmpty && name.forall(ch => ch.isLetterOrDigit || ch == '_') && !name.head.isDigit)
            return Some((name, translate(rhs)))
          else return None
        }
      }
      i += 1
    }
    None
  }
}
