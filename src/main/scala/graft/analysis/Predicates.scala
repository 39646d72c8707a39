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
  * Metric-/profile-getter references (reference
  * `core/predicate_parser.py:46-76`, `core/metric_getters.py`) are
  * supported as values: `::metric/component` reads the named summary
  * component of the CURRENT column, `:column:metric/component` that of
  * another column (`\:` escapes a colon in the column name). They bind
  * against a profile via [[Pred.bindRefs]] before compiling — the getter
  * becomes a literal, so the compiled predicate is still a plain Catalyst
  * expression.
  *
  * Row predicates compile 1:1 to Catalyst columns, so a parsed predicate
  * fuses into the same scan as everything else.
  */
object Predicates {

  import graft.profile.DatasetProfileView

  sealed trait Pred {
    def serialize: String
    /** Compile to a Catalyst predicate; `resolve` maps component names
      * (`x` = the target value) to Columns. */
    def toColumn(resolve: String => Column): Column

    /** Resolve metric-getter values against a profile: `::path` against
      * `currentColumn`, `:col:path` against that column's summary. The
      * result contains only literal values and compiles anywhere. */
    def bindRefs(view: DatasetProfileView, currentColumn: Option[String] = None): Pred =
      this match {
        case Rel(op, c, ref: MetricRef) => Rel(op, c, ref.resolve(view, currentColumn))
        case r: Rel    => r
        case And(l, r) => And(l.bindRefs(view, currentColumn), r.bindRefs(view, currentColumn))
        case Or(l, r)  => Or(l.bindRefs(view, currentColumn), r.bindRefs(view, currentColumn))
        case Not(p)    => Not(p.bindRefs(view, currentColumn))
      }
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

  /** Metric-getter reference (reference `metric_getters.py`): reads a
    * summary component — `column = None` means the current column
    * (`::metric/path`), `Some(c)` another column (`:c:metric/path`).
    * Must be bound via [[Pred.bindRefs]] before compiling. */
  final case class MetricRef(column: Option[String], path: String) extends Value {
    def serialize: String =
      ":" + column.map(_.replace(":", "\\:")).getOrElse("") + ":" + path
    def asString: String =
      throw new IllegalStateException(s"unbound metric reference $serialize — call bindRefs first")
    def lit: Column = F.lit(asString)

    private[Predicates] def resolve(view: DatasetProfileView, currentColumn: Option[String]): Value = {
      val colName = column.orElse(currentColumn).getOrElse(
        throw new IllegalArgumentException(
          s"metric reference $serialize needs a current column to bind against"))
      val col = view.columns.getOrElse(colName,
        throw new IllegalArgumentException(s"metric reference $serialize: no column '$colName' in profile"))
      val summary = col.summaryMap
      // reference MultiMetric paths use ns/sub:subns/comp; our summary
      // keys flatten with slashes
      val v = summary.get(path).orElse(summary.get(path.replace(':', '/'))).getOrElse(
        throw new IllegalArgumentException(
          s"metric reference $serialize: no summary component '$path' on '$colName' " +
            s"(available: ${summary.keys.toSeq.sorted.take(8).mkString(", ")}…)"))
      v match {
        case l: Long   => IntValue(l)
        case i: Int    => IntValue(i.toLong)
        case d: Double => NumValue(d)
        case s: String => StrValue(s)
        case other     => NumValue(String.valueOf(other).toDouble)
      }
    }
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

  /** Compile with metric-getter references bound against `profile`
    * (`::path` resolves on `currentColumn`). */
  def compile(
      expression: String,
      target: Column,
      profile: graft.profile.DatasetProfileView,
      currentColumn: Option[String]): Column =
    parse(expression).bindRefs(profile, currentColumn).toColumn {
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
    else if (token.startsWith(":")) parseMetricRef(token)
    else if (op == "~" || op == "~=" || op == "%") StrValue(token) // bare regex
    else if (token.matches("[-+]?\\d+")) IntValue(token.toLong)
    else NumValue(token.toDouble)

  /** `::metric/path` or `:column:metric/path` with `\:` escapes in the
    * column section (reference `predicate_parser.py:27-31,46-47`). */
  private def parseMetricRef(token: String): MetricRef = {
    var i = 1
    val col = new StringBuilder
    var closed = false
    while (i < token.length && !closed) {
      token.charAt(i) match {
        case '\\' if i + 1 < token.length && token.charAt(i + 1) == ':' =>
          col.append(':'); i += 2
        case ':' => closed = true; i += 1
        case c   => col.append(c); i += 1
      }
    }
    require(closed && i < token.length, s"malformed metric reference '$token'")
    MetricRef(if (col.isEmpty) None else Some(col.toString), token.substring(i))
  }

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
      } else if (c == ':') {
        // metric reference: the `:column:` section may contain spaces and
        // \:-escaped colons; the path tail is space-delimited
        val start = i
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          s.charAt(i) match {
            case '\\' if i + 1 < s.length && s.charAt(i + 1) == ':' => i += 2
            case ':' => closed = true; i += 1
            case _   => i += 1
          }
        }
        require(closed, s"unterminated metric reference in predicate '$s'")
        while (i < s.length && s.charAt(i) != ' ') i += 1
        out += s.substring(start, i)
      } else {
        val start = i
        while (i < s.length && s.charAt(i) != ' ') i += 1
        out += s.substring(start, i)
      }
    }
    out.result()
  }
}
