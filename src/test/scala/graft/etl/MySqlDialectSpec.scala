package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class MySqlDialectSpec extends AnyFunSuite {
  import MySqlDialect.rewrite

  test("comma LIMIT rewrites to LIMIT count OFFSET offset") {
    assert(rewrite("SELECT a FROM t LIMIT 5, 10") ===
      "SELECT a FROM t LIMIT 10 OFFSET 5")
    assert(rewrite("select a from t limit 0,3") ===
      "select a from t LIMIT 3 OFFSET 0")
    assert(rewrite("SELECT a FROM t ORDER BY a LIMIT  12 , 34 -- tail") ===
      "SELECT a FROM t ORDER BY a LIMIT 34 OFFSET 12 -- tail")
  }

  test("plain LIMIT, identifiers and keywords-in-names pass through") {
    for (sql <- Seq(
      "SELECT a FROM t LIMIT 10",
      "SELECT `limit`, limit_5 FROM t",
      "SELECT a FROM t WHERE b = 'limit 1, 2'",
      "SELECT a FROM t WHERE b = \"limit 3, 4\"",
      "SELECT a, unlimited FROM t",
      "SELECT a FROM t -- limit 1, 2\n",
      "SELECT a /* limit 1, 2 */ FROM t",
      "SELECT a FROM t LIMIT 5 OFFSET 2"))
      assert(rewrite(sql) === sql, sql)
  }

  test("bare -- is double negation (MySQL), not a comment — rewrite still fires") {
    assert(rewrite("SELECT price--discount AS net FROM t LIMIT 5, 10") ===
      "SELECT price--discount AS net FROM t LIMIT 10 OFFSET 5")
    // with whitespace it IS a comment and protects its tail
    assert(rewrite("SELECT a FROM t -- LIMIT 5, 10\nLIMIT 1, 2") ===
      "SELECT a FROM t -- LIMIT 5, 10\nLIMIT 2 OFFSET 1")
  }

  test("quoted regions honor escapes") {
    val s = "SELECT 'it''s limit 1, 2 ok', `we``ird` FROM t LIMIT 1, 2"
    assert(rewrite(s) ===
      "SELECT 'it''s limit 1, 2 ok', `we``ird` FROM t LIMIT 2 OFFSET 1")
  }

  test("backtick identifiers are valid Spark quoting (no rewrite needed)") {
    assert(rewrite("SELECT `o_orderkey` FROM `orders`") ===
      "SELECT `o_orderkey` FROM `orders`")
  }
}
