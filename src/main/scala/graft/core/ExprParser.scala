package graft.core

import scala.util.parsing.combinator.RegexParsers

/** Row-filter DSL parser (ref: pyiceberg/expressions/parser.py).
  *
  * Grammar parity with the reference: comparisons (`< <= > >= = == != <>`),
  * `BETWEEN x AND y`, `IS [NOT] NULL`, `IS [NOT] NAN`, `[NOT] IN (…)`,
  * `[NOT] LIKE 'prefix%'` (prefix-only — interior `%` rejected, ref
  * parser.py:136), `AND`/`OR`/`NOT`, parentheses, quoted identifiers,
  * dotted nested columns. Literals: int, float, string, boolean.
  */
object ExprParser extends RegexParsers {

  override def skipWhitespace = true

  private def kw(s: String): Parser[String] = ("""(?i)\b""" + s + """\b""").r ^^ (_ => s.toUpperCase)

  private def ident: Parser[String] =
    ("""[a-zA-Z_][a-zA-Z0-9_]*(\.[a-zA-Z_][a-zA-Z0-9_]*)*""".r
      .withFilter(s => !Set("AND", "OR", "NOT", "IN", "IS", "NULL", "NAN", "LIKE", "BETWEEN", "TRUE", "FALSE")
        .contains(s.toUpperCase))) |
    ("\"" ~> """[^"]+""".r <~ "\"")

  private def stringLit: Parser[String] = "'" ~> """[^']*""".r <~ "'"

  private def numberLit: Parser[Any] =
    """-?\d+\.\d+([eE][+-]?\d+)?""".r ^^ (s => new java.math.BigDecimal(s)) |
    """-?\d+[eE][+-]?\d+""".r ^^ (s => new java.math.BigDecimal(s)) |
    """-?\d+""".r ^^ (s => java.lang.Long.parseLong(s): Any)

  private def boolLit: Parser[Any] = kw("TRUE") ^^ (_ => true) | kw("FALSE") ^^ (_ => false)

  private def literal: Parser[Any] = numberLit | stringLit ^^ (s => s: Any) | boolLit

  private def literalList: Parser[Seq[Any]] = "(" ~> rep1sep(literal, ",") <~ ")"

  private def likePattern(column: String, pattern: String, negated: Boolean): Expr = {
    // prefix-only LIKE (ref parser.py:136 _evaluate_like_statement)
    val body = pattern.stripSuffix("%")
    if (body.contains("%"))
      throw new IllegalArgumentException(s"LIKE supports only prefix matching: '$pattern'")
    if (pattern.endsWith("%")) {
      if (negated) NotStartsWith(column, body) else StartsWith(column, body)
    } else {
      if (negated) NotEq(column, pattern) else Eq(column, pattern)
    }
  }

  /** `transform(column)` term, e.g. `day(ts)`, `bucket[16](id)` —
    * predicates on transformed terms (ref: BoundTransform
    * transforms.py:1158). */
  private def transformTerm: Parser[(String, Transform)] =
    ("""(?i)(identity|year|month|day|hour|void|bucket\[\d+\]|truncate\[\d+\])""".r <~ "(") ~
      (ident <~ ")") ^^ { case tname ~ c => (c, Transform.parse(tname.toLowerCase)) }

  private def transformPredicate: Parser[Expr] =
    transformTerm ~ ("<=" | ">=" | "==" | "!=" | "<>" | "<" | ">" | "=") ~ literal ^^ {
      case ((c, tr)) ~ op ~ v => op match {
        case "<" => Lt(c, v, Some(tr))
        case "<=" => LtEq(c, v, Some(tr))
        case ">" => Gt(c, v, Some(tr))
        case ">=" => GtEq(c, v, Some(tr))
        case "=" | "==" => Eq(c, v, Some(tr))
        case "!=" | "<>" => NotEq(c, v, Some(tr))
      }
    } |
    transformTerm ~ (opt(kw("NOT")) <~ kw("IN")) ~ literalList ^^ {
      case ((c, tr)) ~ not ~ vs =>
        if (not.isDefined) NotIn(c, vs, Some(tr)) else In(c, vs, Some(tr))
    }

  private def predicate: Parser[Expr] =
    transformPredicate |
    ident ~ (kw("IS") ~> opt(kw("NOT")) ~ (kw("NULL") | kw("NAN"))) ^^ {
      case c ~ (not ~ "NULL") => if (not.isDefined) NotNull(c) else IsNull(c)
      case c ~ (not ~ _) => if (not.isDefined) NotNaN(c) else IsNaN(c)
    } |
    ident ~ (opt(kw("NOT")) <~ kw("IN")) ~ literalList ^^ {
      case c ~ not ~ vs => if (not.isDefined) NotIn(c, vs) else In(c, vs)
    } |
    ident ~ (opt(kw("NOT")) <~ kw("LIKE")) ~ stringLit ^^ {
      case c ~ not ~ p => likePattern(c, p, not.isDefined)
    } |
    ident ~ (kw("BETWEEN") ~> literal) ~ (kw("AND") ~> literal) ^^ {
      case c ~ lo ~ hi => And(GtEq(c, lo), LtEq(c, hi))
    } |
    ident ~ ("<=" | ">=" | "==" | "!=" | "<>" | "<" | ">" | "=") ~ literal ^^ {
      case c ~ op ~ v => op match {
        case "<" => Lt(c, v)
        case "<=" => LtEq(c, v)
        case ">" => Gt(c, v)
        case ">=" => GtEq(c, v)
        case "=" | "==" => Eq(c, v)
        case "!=" | "<>" => NotEq(c, v)
      }
    } |
    // reversed operand order: literal OP column
    literal ~ ("<=" | ">=" | "==" | "!=" | "<>" | "<" | ">" | "=") ~ ident ^^ {
      case v ~ op ~ c => op match {
        case "<" => Gt(c, v)
        case "<=" => GtEq(c, v)
        case ">" => Lt(c, v)
        case ">=" => LtEq(c, v)
        case "=" | "==" => Eq(c, v)
        case "!=" | "<>" => NotEq(c, v)
      }
    }

  private def factor: Parser[Expr] =
    kw("TRUE") ^^ (_ => AlwaysTrue) |
    kw("FALSE") ^^ (_ => AlwaysFalse) |
    kw("NOT") ~> factor ^^ (Not(_)) |
    "(" ~> orExpr <~ ")" |
    predicate

  private def andExpr: Parser[Expr] = rep1sep(factor, kw("AND")) ^^ (Exprs.and(_))
  private def orExpr: Parser[Expr] = rep1sep(andExpr, kw("OR")) ^^ {
    case Seq(one) => one
    case many => many.reduce(Or(_, _))
  }

  def parse(s: String): Expr = parseAll(orExpr, s) match {
    case Success(e, _) => e
    case NoSuccess(msg, next) =>
      throw new IllegalArgumentException(
        s"Cannot parse row filter '$s' at ${next.pos}: $msg")
    case other => throw new IllegalArgumentException(s"Cannot parse '$s': $other")
  }
}
