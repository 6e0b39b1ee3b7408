package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the wire-protocol text parsers — the
  * hand-rolled scanners (statement split, `$n` binding) are exactly where
  * adversarial inputs hide bugs.
  */
object ProtocolPropertySpec extends Properties("Protocol") {

  // identifier-ish words plus the scanner's special characters
  private val atom: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
    Gen.oneOf("'a;b'", "'it''s'", "\"we;ird\"", "-- note\n", "/* ; */",
      "$$ body; $$", "$1", "$2", " ", ",", "(", ")"))
  private val stmtGen: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, atom)).map(_.mkString(" "))

  property("splitStatements concatenation preserves non-quoted content") =
    forAll(Gen.listOfN(3, stmtGen)) { parts =>
      // join syntactically balanced statements with ';' — the split must
      // return exactly the non-empty trimmed parts, in order
      val balanced = parts.map(_.replace(";", "")) // make each part ';'-free
      val joined = balanced.mkString(";")
      val split = Pgwire.splitStatements(joined)
      split == balanced.map(_.trim).filter(_.nonEmpty)
    }

  property("splitStatements never splits inside quotes/comments/dollar") =
    forAll(Gen.oneOf(
      "select 'a;b'", "select \"c;d\" from t", "select 1 -- tail; note",
      "select /* ; */ 2", "create function f as $$ select 1; $$")) { s =>
      Pgwire.splitStatements(s) == Seq(s.trim)
    }

  private val paramVal: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr, Gen.const("it's"), Gen.const(""), Gen.const("a;b"))

  property("bindParams leaves $-free SQL untouched") = forAll(stmtGen) { s =>
    val noDollar = s.replace("$", "")
    Pgwire.bindParams(noDollar, Nil) == noDollar
  }

  property("bindParams quotes and escapes every placeholder") =
    forAll(paramVal, paramVal) { (a, b) =>
      val bound = Pgwire.bindParams("select $1, $2", Seq(a, b))
      val expA = "'" + a.replace("'", "''") + "'"
      val expB = "'" + b.replace("'", "''") + "'"
      bound == s"select $expA, $expB"
    }

  property("bindParams ignores $n inside string literals") =
    forAll(paramVal) { a =>
      Pgwire.bindParams("select '$1', $1", Seq(a)) ==
        "select '$1', '" + a.replace("'", "''") + "'"
    }

  property("maxParamIndex equals the highest unquoted placeholder") =
    forAll(Gen.choose(1, 9), Gen.choose(1, 9)) { (m, n) =>
      val hi = math.max(m, n)
      Pgwire.maxParamIndex("select $" + m + " + $" + n + ", '$99'") == hi
    }

  property("null params bind as NULL") = forAll(paramVal) { a =>
    Pgwire.bindParams("select $1, $2", Seq(a, null)) ==
      "select '" + a.replace("'", "''") + "', NULL"
  }

  property("copyTailOpts normalizes all psql forms to the same options") =
    forAll(Gen.oneOf("", "  ", "(format csv)", "with (format csv)",
      "WITH (format csv)", "csv")) { tail =>
      val norm = Pgwire.copyTailOpts(tail)
      if (tail.trim.isEmpty) norm.isEmpty
      else norm.contains("format csv")
    }

  // ---- MERGE WHEN-clause boundary scanner (engine/Engine.whenBoundaries):
  // build statements from known clause offsets out of adversarial
  // expressions (CASE WHEN bodies, nested CASE, ' when ' string payloads,
  // doubled-quote escapes, parenthesized commas) and require the scanner
  // to recover EXACTLY the constructed boundaries.
  private lazy val engineForParse = {
    val dir = "/root/repo/target/graft-tmp/proto-parse-warehouse"
    new graft.engine.Engine(TestSpark.spark, dir)
  }
  private val mergeExpr: Gen[String] = Gen.oneOf(
    "a + 1", "f(a, b)", "'plain'", "' when matched '", "'it''s when not'",
    "case when a > 1 then 'w' else b end",
    "case when (a, b) = (1, 2) then case when c > 0 then 1 else 2 end else 0 end",
    "coalesce(b, case when a is null then ' when ' else 'x' end)")
  private val mergeClause: Gen[String] = Gen.oneOf(
    mergeExpr.map(e => s"when matched then update set x = $e"),
    Gen.const("when matched then delete"),
    Gen.zip(mergeExpr, mergeExpr).map { case (a, b) =>
      s"when not matched then insert values ($a, $b)"
    })
  private val mergeCond: Gen[String] = Gen.oneOf(
    "t.k = s.k", "t.k = case when s.v > 0 then s.k else 0 end",
    "t.name = ' when matched '", "t.k = s.k and t.tag <> 'when not'")

  property("whenBoundaries recovers exactly the constructed clause offsets") =
    forAll(mergeCond, Gen.choose(1, 3).flatMap(Gen.listOfN(_, mergeClause))) {
      (cond, clauses) =>
        val sb = new StringBuilder(cond)
        val offsets = clauses.map { c =>
          sb.append(' ')
          val off = sb.length
          sb.append(c)
          off
        }
        engineForParse.whenBoundaries(sb.toString) == offsets
    }
}
