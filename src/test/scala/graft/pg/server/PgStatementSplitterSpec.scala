package graft.pg.server

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the quote/comment/paren-aware script splitter used by
  * the simple-query multi-statement flow and the golden-corpus harness.
  */
class PgStatementSplitterSpec extends AnyFunSuite {

  test("splits on top-level semicolons only") {
    assert(PgStatementSplitter.split("SELECT 1; SELECT 2") === Seq("SELECT 1", "SELECT 2"))
    assert(PgStatementSplitter.split("SELECT (1; 2); SELECT 3") ===
      Seq("SELECT (1; 2)", "SELECT 3"))
  }

  test("quotes and comments shield semicolons") {
    assert(PgStatementSplitter.split("SELECT 'a;b'; SELECT 2") ===
      Seq("SELECT 'a;b'", "SELECT 2"))
    // the comment text stays in the part (Spark's parser strips it); the
    // point is that its ';' must not split
    assert(PgStatementSplitter.split("SELECT 1 -- c;\n; SELECT 2") ===
      Seq("SELECT 1 -- c;", "SELECT 2"))
    assert(PgStatementSplitter.split("/* x; */ SELECT 1; SELECT 2") ===
      Seq("/* x; */ SELECT 1", "SELECT 2"))
  }

  test("an unmatched ')' cannot swallow the rest of the script") {
    // depth must clamp at zero: a malformed statement with a stray ')'
    // poisons only itself, not every statement after it
    assert(PgStatementSplitter.split("SELECT bad ); SELECT 1; SELECT 2") ===
      Seq("SELECT bad )", "SELECT 1", "SELECT 2"))
    assert(PgStatementSplitter.split(")); SELECT 42") === Seq("))", "SELECT 42"))
  }

  test("comment-only and empty parts are dropped") {
    assert(PgStatementSplitter.split("-- nothing\n; ; SELECT 1;") === Seq("SELECT 1"))
    assert(PgStatementSplitter.split("") === Seq.empty)
  }
}
