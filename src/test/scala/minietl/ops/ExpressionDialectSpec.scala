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
}
