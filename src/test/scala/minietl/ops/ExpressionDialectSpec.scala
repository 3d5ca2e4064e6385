package minietl.ops

import org.scalatest.funsuite.AnyFunSuite

class ExpressionDialectSpec extends AnyFunSuite {

  test("power, floor division, boolean operators translate") {
    assert(ExpressionDialect.translate("a ** 2") === "POWER(`a`, 2)")
    assert(ExpressionDialect.translate("a // b") === "FLOOR(`a` / `b`)")
    assert(ExpressionDialect.translate("a & b") === "(`a` AND `b`)")
    assert(ExpressionDialect.translate("a | ~b") === "(`a` OR (NOT `b`))")
    assert(ExpressionDialect.translate("a == 1") === "(`a` = 1)")
  }

  test("precedence: comparison binds tighter than boolean, arithmetic tighter than comparison") {
    assert(ExpressionDialect.translate("a + 1 > 2 & b < 3")
      === "(((`a` + 1) > 2) AND (`b` < 3))")
  }

  test("power is right-associative") {
    assert(ExpressionDialect.translate("a ** b ** c")
      === "POWER(`a`, POWER(`b`, `c`))")
  }

  test("string literals and escapes survive") {
    assert(ExpressionDialect.translate("name == 'O\\'Brien'") === raw"(`name` = 'O\'Brien')")
    assert(ExpressionDialect.translate("""category == "A"""") === "(`category` = 'A')")
    intercept[IllegalArgumentException](ExpressionDialect.translate("a == 1 1"))
  }

  test("function calls pass through") {
    assert(ExpressionDialect.translate("abs(a - b) > 2")
      === "(abs((`a` - `b`)) > 2)")
  }

  test("splitAssignment separates derive form from filter form") {
    assert(ExpressionDialect.splitAssignment("total = price * qty")
      === Some(("total", "(`price` * `qty`)")))
    assert(ExpressionDialect.splitAssignment("price == qty") === None)
    assert(ExpressionDialect.splitAssignment("price >= 10") === None)
    assert(ExpressionDialect.splitAssignment("a <= b") === None)
  }

  test("python-style word operators: and / or / not") {
    assert(ExpressionDialect.translate("a > 1 and b < 2")
      === "((`a` > 1) AND (`b` < 2))")
    assert(ExpressionDialect.translate("a or not b")
      === "(`a` OR (NOT `b`))")
    assert(ExpressionDialect.translate("not a and b")
      === "((NOT `a`) AND `b`)")
    // case-insensitive, mixable with symbol forms
    assert(ExpressionDialect.translate("a AND b | c")
      === "((`a` AND `b`) OR `c`)")
    // python precedence: `not` is looser than comparisons, tighter than and
    assert(ExpressionDialect.translate("not a > 1")
      === "(NOT (`a` > 1))")
    assert(ExpressionDialect.translate("not a > 1 and b < 2")
      === "((NOT (`a` > 1)) AND (`b` < 2))")
  }

  test("membership: in and not in at comparison precedence") {
    assert(ExpressionDialect.translate("category in ('A', 'B')")
      === "(`category` IN ('A', 'B'))")
    assert(ExpressionDialect.translate("x not in (1, 2, 3)")
      === "(`x` NOT IN (1, 2, 3))")
    assert(ExpressionDialect.translate("a in ('x') and b > 1")
      === "((`a` IN ('x')) AND (`b` > 1))")
    // unary not still works when not followed by in
    assert(ExpressionDialect.translate("not a in ('x')")
      === "(NOT (`a` IN ('x')))")
  }

  test("unary minus and nested parens") {
    assert(ExpressionDialect.translate("-(a + b) * 2") === "((- ((`a` + `b`))) * 2)")
  }

  test("chained comparisons expand pairwise like python, not as a left fold") {
    assert(ExpressionDialect.translate("a < b < c")
      === "((`a` < `b`) AND (`b` < `c`))")
    assert(ExpressionDialect.translate("1 <= a < 3")
      === "((1 <= `a`) AND (`a` < 3))")
    assert(ExpressionDialect.translate("a < b < c < d")
      === "(((`a` < `b`) AND (`b` < `c`)) AND (`c` < `d`))")
    // chain members interact correctly with boolean precedence
    assert(ExpressionDialect.translate("a < b < c & d")
      === "(((`a` < `b`) AND (`b` < `c`)) AND `d`)")
  }

  test("a chain may not share a nondeterministic operand (it would re-draw)") {
    val e = intercept[IllegalArgumentException] {
      ExpressionDialect.translate("a < rand() < b")
    }
    assert(e.getMessage.contains("rand"))
    // deterministic calls are fine in any position...
    assert(ExpressionDialect.translate("0 < abs(a) < 10")
      === "((0 < abs(`a`)) AND (abs(`a`) < 10))")
    // ...and nondeterministic ones are fine at the ENDS, which are emitted
    // exactly once
    assert(ExpressionDialect.translate("rand() < a < b")
      === "((rand() < `a`) AND (`a` < `b`))")
    assert(ExpressionDialect.translate("a < b < rand()")
      === "((`a` < `b`) AND (`b` < rand()))")
  }

  test("python modulo emits the divisor-sign form") {
    assert(ExpressionDialect.translate("a % 3") === "(((`a` % 3) + 3) % 3)")
  }
}

/** Value-level cross-check of the dialect's python-semantics corner cases
  * (r8 stretch #9): every expression is BOTH evaluated by Spark after
  * translation AND by a hand-rolled evaluator implementing python/pandas
  * arithmetic (`**` right-assoc, `//` floor division, `%` divisor-sign
  * modulo, chained comparisons), over fixed bindings and seeded random
  * expression trees. One Spark job evaluates all expressions at once.
  */
class ExpressionDialectSemanticsSpec extends AnyFunSuite with minietl.SparkTestBase {

  // bindings exercising every sign combination
  private val binds = Map("a" -> -7L, "b" -> 3L, "c" -> 2L, "d" -> -2L)

  private def sparkEval(exprs: Seq[String]): Seq[Any] = {
    import org.apache.spark.sql.functions.expr
    val one = spark.sql(binds.map { case (k, v) => s"CAST($v AS BIGINT) AS $k" }
      .mkString("SELECT ", ", ", ""))
    val row = one.select(exprs.map(e =>
      expr(ExpressionDialect.translate(e))): _*).collect()(0)
    (0 until row.length).map(row.get)
  }
  private def num(v: Any): Double = v match {
    case d: java.lang.Double => d
    case l: java.lang.Long => l.toDouble
    case i: java.lang.Integer => i.toDouble
    case x => fail(s"unexpected result type: $x (${x.getClass})")
  }

  test("operator corner cases match python values through Spark") {
    val cases = Seq(
      "2 ** 3 ** 2" -> 512.0,   // right-assoc: 2^(3^2), not (2^3)^2=64
      "-2 ** 2" -> -4.0,        // ** binds tighter than unary minus
      "a // c" -> -4.0,         // floor(-3.5), python -7//2 = -4 (trunc would be -3)
      "7 // d" -> -4.0,         // floor(-3.5) with negative divisor
      "a // d" -> 3.0,          // -7 // -2 = floor(3.5) = 3
      "a % b" -> 2.0,           // -7 % 3 = 2 (python); Spark's raw % gives -1
      "7 % d" -> -1.0,          // 7 % -2 = -1 (divisor's sign)
      "a % d" -> -1.0,          // -7 % -2 = -1
      "a % c" -> 1.0,           // -7 % 2 = 1
      "a + b * c" -> -1.0,      // precedence sanity: -7 + 6
      "(a + b) * c" -> -8.0)
    val got = sparkEval(cases.map(_._1))
    cases.zip(got).foreach { case ((e, want), v) =>
      assert(num(v) === want, s"for '$e'")
    }
  }

  test("chained comparisons evaluate like python through Spark") {
    val cases = Seq(
      "d < c < b" -> true,      // -2 < 2 < 3
      "a < d < c < b" -> true,  // -7 < -2 < 2 < 3
      "b < c < 100" -> false,   // 3 < 2 fails the first link
      "1 < c <= 2" -> true,
      "c == c == c" -> true,    // python: (c==c) and (c==c)
      "a < b > d" -> true)      // mixed directions are pairwise
    val got = sparkEval(cases.map(_._1))
    cases.zip(got).foreach { case ((e, want), v) =>
      assert(v === want, s"for '$e'")
    }
  }

  // ---- seeded random expression trees vs the hand-rolled evaluator ----
  private sealed trait E
  private case class Lit(v: Long) extends E
  private case class Va(name: String) extends E
  private case class Bin(op: String, l: E, r: E) extends E

  /** Python-semantics evaluation (doubles stay exact at these magnitudes). */
  private def pyEval(e: E): Double = e match {
    case Lit(v) => v.toDouble
    case Va(n) => binds(n).toDouble
    case Bin(op, l, r) =>
      val (a, b) = (pyEval(l), pyEval(r))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "//" => math.floor(a / b)
        case "%" => a - math.floor(a / b) * b
        case "**" => math.pow(a, b)
      }
  }
  /** Fully parenthesized render — the same tree python would read.
    * Negative literals are parenthesized too: bare `-5 ** 2` would read
    * as `-(5**2)` (python's ** outbinds unary minus — which the
    * corner-case test asserts separately), diverging from this AST.
    */
  private def render(e: E): String = e match {
    case Lit(v) => if (v < 0) s"($v)" else v.toString
    case Va(n) => n
    case Bin(op, l, r) => s"(${render(l)} $op ${render(r)})"
  }

  test("random expression trees agree with the python evaluator through Spark") {
    val rnd = new scala.util.Random(42)
    val vars = binds.keys.toArray.sorted
    // divisors/exponents drawn from safe pools: nonzero divisors keep //
    // and % total; small non-negative exponents keep ** exact in doubles
    val divLits = Array(-3L, -2L, 2L, 3L, 5L)
    val divVars = Array("b", "c", "d")
    def divisor(): E =
      if (rnd.nextBoolean()) Lit(divLits(rnd.nextInt(divLits.length)))
      else Va(divVars(rnd.nextInt(divVars.length)))
    def gen(depth: Int): E =
      if (depth == 0) {
        if (rnd.nextBoolean()) Va(vars(rnd.nextInt(vars.length)))
        else Lit(rnd.nextInt(11).toLong - 5L)
      } else rnd.nextInt(7) match {
        case 0 => Bin("+", gen(depth - 1), gen(depth - 1))
        case 1 => Bin("-", gen(depth - 1), gen(depth - 1))
        case 2 => Bin("*", gen(depth - 1), gen(depth - 1))
        case 3 => Bin("/", gen(depth - 1), divisor())
        case 4 => Bin("//", gen(depth - 1), divisor())
        case 5 => Bin("%", gen(depth - 1), divisor())
        case 6 => Bin("**", gen(depth - 1), Lit(rnd.nextInt(4).toLong))
      }
    val trees = Seq.fill(120)(gen(2 + rnd.nextInt(2)))
    val got = sparkEval(trees.map(render))
    trees.zip(got).foreach { case (t, v) =>
      val want = pyEval(t)
      assert(num(v) === want, s"for '${render(t)}'")
    }
  }

  test("unary minus sits between ** and %/*// like python") {
    val cases = Seq(
      "-b ** c" -> -9.0,   // ** outbinds unary minus: -(3^2)
      "(-b) ** c" -> 9.0,
      "-a % b" -> 1.0,     // unary minus outbinds %: (7) % 3
      "-a // c" -> 3.0,    // (7) // 2
      "-a + b" -> 10.0,    // (-a) + b
      "- -b" -> 3.0)
    val got = sparkEval(cases.map(_._1))
    cases.zip(got).foreach { case ((e, want), v) =>
      assert(num(v) === want, s"for '$e'")
    }
  }

  // ---- r9 stretch #8: random BOOLEAN trees (comparisons incl. strings,
  // in/not-in membership, chains, &/|/~) vs the hand evaluator ----
  private sealed trait B
  private case class NCmp(op: String, l: E, r: E) extends B
  private case class SCmp(op: String, l: String, r: String) extends B
  private case class NIn(e: E, items: Seq[Long], neg: Boolean) extends B
  private case class SIn(v: String, items: Seq[String], neg: Boolean) extends B
  private case class Chain(first: E, rest: Seq[(String, E)]) extends B
  private case class Bool(op: String, l: B, r: B) extends B
  private case class Neg(b: B) extends B

  private def cmpD(op: String, a: Double, b: Double): Boolean = op match {
    case "==" => a == b
    case "!=" => a != b
    case "<" => a < b
    case "<=" => a <= b
    case ">" => a > b
    case ">=" => a >= b
  }
  private def cmpS(op: String, a: String, b: String): Boolean = op match {
    // python string comparison is lexicographic by code point — identical
    // to Spark's default binary collation for these ASCII pools
    case "==" => a == b
    case "!=" => a != b
    case "<" => a < b
    case "<=" => a <= b
    case ">" => a > b
    case ">=" => a >= b
  }
  private def pyBool(b: B): Boolean = b match {
    case NCmp(op, l, r) => cmpD(op, pyEval(l), pyEval(r))
    case SCmp(op, l, r) => cmpS(op, l, r)
    case NIn(e, items, neg) =>
      val in = items.contains(pyEval(e).toLong); if (neg) !in else in
    case SIn(v, items, neg) =>
      val in = items.contains(v); if (neg) !in else in
    case Chain(first, rest) =>
      // python: each adjacent pair, conjoined, operands evaluated once
      val vals = (first +: rest.map(_._2)).map(pyEval)
      rest.map(_._1).zip(vals.zip(vals.tail)).forall {
        case (op, (a, c)) => cmpD(op, a, c)
      }
    case Bool("&", l, r) => pyBool(l) && pyBool(r)
    case Bool("|", l, r) => pyBool(l) || pyBool(r)
    case Bool(op, _, _) => fail(s"bad bool op $op")
    case Neg(x) => !pyBool(x)
  }
  private def q(s: String) = "'" + s + "'"
  private def renderB(b: B): String = b match {
    case NCmp(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case SCmp(op, l, r) => s"(${q(l)} $op ${q(r)})"
    case NIn(e, items, neg) =>
      s"(${render(e)} ${if (neg) "not in" else "in"} ${items.mkString("(", ", ", ")")})"
    case SIn(v, items, neg) =>
      s"(${q(v)} ${if (neg) "not in" else "in"} ${items.map(q).mkString("(", ", ", ")")})"
    case Chain(first, rest) =>
      // the chain stays BARE inside its parens so the pairwise expansion
      // path is what parses it
      s"(${render(first)} ${rest.map { case (op, e) => s"$op ${render(e)}" }.mkString(" ")})"
    case Bool(op, l, r) => s"(${renderB(l)} $op ${renderB(r)})"
    case Neg(x) => s"~${renderB(x)}"
  }

  test("random boolean trees (strings, in-lists, chains) agree with python") {
    val rnd = new scala.util.Random(7)
    val strPool = Array("", "a", "ab", "abc", "abd", "b", "zz")
    val cmps = Array("==", "!=", "<", "<=", ">", ">=")
    def smallE(): E = rnd.nextInt(3) match {
      case 0 => Va(binds.keys.toArray.sorted.apply(rnd.nextInt(binds.size)))
      case 1 => Lit(rnd.nextInt(11).toLong - 5L)
      case 2 =>
        val ops = Array("+", "-", "*")
        Bin(ops(rnd.nextInt(3)),
          Va(binds.keys.toArray.sorted.apply(rnd.nextInt(binds.size))),
          Lit(rnd.nextInt(7).toLong - 3L))
    }
    def leaf(): B = rnd.nextInt(5) match {
      case 0 => NCmp(cmps(rnd.nextInt(cmps.length)), smallE(), smallE())
      case 1 => SCmp(cmps(rnd.nextInt(cmps.length)),
        strPool(rnd.nextInt(strPool.length)), strPool(rnd.nextInt(strPool.length)))
      case 2 => NIn(smallE(),
        Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(11).toLong - 5L).distinct,
        rnd.nextBoolean())
      case 3 => SIn(strPool(rnd.nextInt(strPool.length)),
        Seq.fill(1 + rnd.nextInt(3))(strPool(rnd.nextInt(strPool.length))).distinct,
        rnd.nextBoolean())
      case 4 => Chain(smallE(),
        Seq.fill(1 + rnd.nextInt(2))((cmps(rnd.nextInt(cmps.length)), smallE())))
    }
    def genB(depth: Int): B =
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => Bool("&", genB(depth - 1), genB(depth - 1))
        case 1 => Bool("|", genB(depth - 1), genB(depth - 1))
        case 2 => Neg(genB(depth - 1))
        case _ => leaf()
      }
    val trees = Seq.fill(150)(genB(1 + rnd.nextInt(2)))
    val got = sparkEval(trees.map(renderB))
    trees.zip(got).foreach { case (t, v) =>
      assert(v === pyBool(t), s"for '${renderB(t)}'")
    }
  }
}
