package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** The reference's serialized predicate DSL
  * (`core/relations.py:66-205`, `core/predicate_parser.py`): prefix
  * notation, e.g. `and >= x 1000 <= x 1500`, `~ x [0-9]+`, `not == x "A"`.
  *
  * Ops: `~` match (anchored at start, Python `re.match`), `~=` fullmatch,
  * `%` search (unanchored), `== < <= > >= !=`, `and or not`. The
  * component token `x` denotes the target value; any other component
  * name resolves as a column reference, so one serialized predicate can
  * span columns. Values: double-quoted strings (with `\"` and `\\`
  * escapes) or numeric literals.
  *
  * Metric-/profile-getter references (`:column:metric/component`) are
  * intentionally out of scope: metric-level predicates are Scala
  * closures over summaries here (Constraints), not strings.
  *
  * Row predicates compile 1:1 to Catalyst columns, so a parsed predicate
  * fuses into the same scan as everything else.
  */
object Predicates {

  sealed trait Pred {
    def serialize: String
    /** Compile to a Catalyst predicate; `resolve` maps component names
      * (`x` = the target value) to Columns. */
    def toColumn(resolve: String => Column): Column
  }

  final case class Rel(op: String, component: String, value: Value) extends Pred {
    def serialize: String = s"$op $component ${value.serialize}"
    def toColumn(resolve: String => Column): Column = {
      val c = resolve(component)
      op match {
        case "~"  => c.rlike("^(?:" + value.asString + ")")
        case "~=" => c.rlike("^(?:" + value.asString + ")$")
        case "%"  => c.rlike(value.asString)
        case "==" => c === value.lit
        case "!=" => c =!= value.lit
        case "<"  => c < value.lit
        case "<=" => c <= value.lit
        case ">"  => c > value.lit
        case ">=" => c >= value.lit
      }
    }
  }

  final case class And(left: Pred, right: Pred) extends Pred {
    def serialize: String = s"and ${left.serialize} ${right.serialize}"
    def toColumn(resolve: String => Column): Column =
      left.toColumn(resolve) && right.toColumn(resolve)
  }

  final case class Or(left: Pred, right: Pred) extends Pred {
    def serialize: String = s"or ${left.serialize} ${right.serialize}"
    def toColumn(resolve: String => Column): Column =
      left.toColumn(resolve) || right.toColumn(resolve)
  }

  final case class Not(right: Pred) extends Pred {
    def serialize: String = s"not ${right.serialize}"
    def toColumn(resolve: String => Column): Column = !right.toColumn(resolve)
  }

  sealed trait Value {
    def serialize: String
    def asString: String
    def lit: Column
  }
  final case class StrValue(s: String) extends Value {
    def serialize: String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def asString: String = s
    def lit: Column = F.lit(s)
  }
  final case class IntValue(v: Long) extends Value {
    def serialize: String = v.toString
    def asString: String = v.toString
    def lit: Column = F.lit(v)
  }
  final case class NumValue(v: Double) extends Value {
    def serialize: String = v.toString
    def asString: String = v.toString
    def lit: Column = F.lit(v)
  }

  private val relOps = Set("~", "~=", "%", "==", "!=", "<", "<=", ">", ">=")

  /** Parse the prefix-notation DSL. Inverse of `Pred.serialize`. */
  def parse(expression: String): Pred = {
    val (p, rest) = parsePred(tokenize(expression), expression)
    require(rest.isEmpty, s"trailing tokens in predicate '$expression': $rest")
    p
  }

  /** Compile a serialized predicate against a single target column. */
  def compile(expression: String, target: Column): Column =
    parse(expression).toColumn {
      case "x"  => target
      case name => F.col(name)
    }

  private def parsePred(tokens: List[String], src: String): (Pred, List[String]) =
    tokens match {
      case "and" :: rest =>
        val (l, r1) = parsePred(rest, src)
        val (r, r2) = parsePred(r1, src)
        (And(l, r), r2)
      case "or" :: rest =>
        val (l, r1) = parsePred(rest, src)
        val (r, r2) = parsePred(r1, src)
        (Or(l, r), r2)
      case "not" :: rest =>
        val (p, r1) = parsePred(rest, src)
        (Not(p), r1)
      case op :: component :: value :: rest if relOps(op) =>
        (Rel(op, component, parseValue(op, value)), rest)
      case other =>
        throw new IllegalArgumentException(s"cannot parse predicate '$src' at $other")
    }

  private def parseValue(op: String, token: String): Value =
    if (token.startsWith("\"")) StrValue(unescape(token.substring(1, token.length - 1)))
    else if (op == "~" || op == "~=" || op == "%") StrValue(token) // bare regex
    else if (token.matches("[-+]?\\d+")) IntValue(token.toLong)
    else NumValue(token.toDouble)

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) { b.append(s.charAt(i + 1)); i += 2 }
      else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private def tokenize(s: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else if (c == '"') {
        // escape-aware scan: a backslash escapes the NEXT char, so an
        // escaped backslash before the closing quote doesn't swallow it
        val start = i
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          s.charAt(i) match {
            case '\\' => i += 2
            case '"'  => closed = true; i += 1
            case _    => i += 1
          }
        }
        require(closed, s"unterminated string literal in predicate '$s'")
        out += s.substring(start, math.min(i, s.length))
      } else {
        val start = i
        while (i < s.length && s.charAt(i) != ' ') i += 1
        out += s.substring(start, i)
      }
    }
    out.result()
  }
}
