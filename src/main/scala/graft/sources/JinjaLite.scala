package graft.sources

/** A minimal Jinja2-subset renderer for user `.sql.jinja` ETL queries.
  *
  * The reference renders user SQL through a full Jinja2 environment
  * (`/root/reference/src/riab/etl/bigquery/etl.py:325-345`), and its own
  * templates use variables, `{% if %}`/`{% else %}` and `{% for %}` blocks
  * (the constructs throughout `src/riab/etl/&lt;dialect&gt;/templates/` `.sql.jinja` files).
  * This renderer implements exactly that subset with Jinja2's published
  * semantics — and FAILS LOUDLY on anything else. The round-6 advisory
  * flagged the previous behavior (unknown `{% ... %}` passed through to
  * `spark.sql` unrendered) as a silent failure mode; now every
  * unsupported construct raises "unsupported Jinja construct ..." naming
  * the offending tag.
  *
  * Supported:
  *  - `{{ var }}` substitution (whitespace-tolerant)
  *  - `{# comment #}` (stripped)
  *  - whitespace control (`{%- ... -%}` / `{{- ... -}}`), trimming all
  *    adjacent whitespace like Jinja2's trim markers
  *  - `{% if cond %} .. {% elif cond %} .. {% else %} .. {% endif %}`
  *    where cond is `[not] operand [==|!= operand]` and an operand is a
  *    variable name, `loop.*` attribute, or a quoted literal; Jinja
  *    truthiness = defined and non-empty
  *  - `{% for x in xs %} .. {% endfor %}` over a caller-supplied list
  *    variable; the loop variable shadows scalars inside the body, and
  *    `loop.first` / `loop.last` / `loop.index` / `loop.index0` /
  *    `loop.length` are bound inside the body (the reference's own
  *    templates use `{%- if not loop.first -%},{%- endif %}` as the
  *    comma-separator idiom)
  *  - `{% set x = expr %}` (block-scoped) and `{% set ns = namespace(a=0) %}`
  *    / `{% set ns.a = ns.a + 1 %}` mutable namespaces (the pk-swap
  *    template's loop counter idiom, r15); expressions cover literals,
  *    variables, `ns.attr`, `list[idxExpr]`, `x.lower()` and `+` addition
  *  - `and`-joined condition terms
  *  - nesting of the above
  *
  * Unsupported (clear error): filters (`{{ x | upper }}`),
  * `{% include %}`, `{% macro %}`, comparison beyond ==/!=,
  * undefined variables (Jinja's silent-empty default hides typos in SQL,
  * so undefined names are errors here).
  */
object JinjaLite {

  /** Render `template` with scalar and list bindings. */
  def render(
      template: String,
      scalars: Map[String, String],
      lists: Map[String, Seq[String]] = Map.empty): String = {
    val (nodes, rest) = parseNodes(tokenize(template), inBlock = false)
    rest match {
      case Stmt(s) :: _ => sys.error(s"'{% $s %}' without an opening block")
      case _ =>
    }
    val sb = new StringBuilder
    eval(nodes, scalars, lists, sb)
    sb.result()
  }

  // ---- tokens ------------------------------------------------------------

  private sealed trait Tok
  private final case class Text(s: String) extends Tok
  private final case class Expr(s: String) extends Tok // {{ ... }}
  private final case class Stmt(s: String) extends Tok // {% ... %}

  private val TagRe = raw"(?s)\{\{(.*?)\}\}|\{%(.*?)%\}|\{#(.*?)#\}".r

  /** Jinja2 whitespace control: `{%-` eats whitespace before the tag,
    * `-%}` after it (same for expression and comment delimiters).
    */
  private def applyTrimMarkers(t: String): String =
    t.replaceAll(raw"(?s)\s*\{([{%#])-", "{$1")
      .replaceAll(raw"(?s)-([}%#])\}\s*", "$1}")

  private def tokenize(raw: String): List[Tok] = {
    val t = applyTrimMarkers(raw)
    val out = List.newBuilder[Tok]
    var last = 0
    for (m <- TagRe.findAllMatchIn(t)) {
      if (m.start > last) out += Text(t.substring(last, m.start))
      if (m.group(1) != null) out += Expr(m.group(1).trim)
      else if (m.group(2) != null) out += Stmt(m.group(2).trim)
      // comments drop
      last = m.end
    }
    if (last < t.length) out += Text(t.substring(last))
    // a stray half-delimiter means the user wrote Jinja we failed to lex
    val rendered = out.result()
    rendered.foreach {
      case Text(s) =>
        require(!s.contains("{%") && !s.contains("{{") && !s.contains("{#"),
          s"malformed Jinja delimiter near: ${s.slice(s.indexOf('{'), s.indexOf('{') + 40)}")
      case _ =>
    }
    rendered
  }

  // ---- AST ----------------------------------------------------------------

  private sealed trait Node
  private final case class Lit(s: String) extends Node
  private final case class Var(expr: String) extends Node
  private final case class If(branches: Seq[(BExpr, Seq[Node])], otherwise: Seq[Node]) extends Node
  private final case class For(v: String, list: String, body: Seq[Node]) extends Node
  /** `{% set name = expr %}` — scoped scalar binding (does not leak out
    * of the enclosing block, Jinja2 semantics); when `expr` is a
    * `namespace(attr=v)` call the binding is a MUTABLE namespace object
    * (the Jinja2 idiom for state that must survive loop iterations — the
    * pk-swap template's `ns.ci_counter`, r15).
    */
  private final case class SetVar(name: String, expr: String) extends Node
  /** `{% set ns.attr = expr %}` — namespace attribute mutation. */
  private final case class SetAttr(ns: String, attr: String, expr: String) extends Node

  /** `op` carries (== / != , rhs) comparisons; `inList` a list-membership
    * test `lhs in <list>` (the reference's duplicate-rows template guards
    * columns with `not column in events.values()` — the subset treats a
    * list-valued variable's `.values()` as the list itself; callers with
    * dict-typed template vars supply the VALUES as the list, r15).
    */
  private final case class Cond(negated: Boolean, lhs: String,
      op: Option[(String, String)], inList: Option[String] = None)

  private val Ident = raw"[A-Za-z_][A-Za-z0-9_]*"
  // a variable reference in {{ .. }} / conditions: plain name or loop
  // attr. The loop.* alternative comes FIRST — in a prefix match the
  // bare-Ident alternative would otherwise stop at 'loop' and leave
  // '.first' as trailing input (the r15 CondParser regression).
  private val VarRef = raw"(?:loop\.(?:first|last|index0?|length)|$Ident)"

  private def isTerminator(s: String): Boolean =
    s == "else" || s == "endif" || s == "endfor" || s.startsWith("elif ")

  /** Parse until end-of-input (top level) or an `elif`/`else`/`endif`/
    * `endfor` terminator (inside a block); returns nodes + remaining tokens
    * STARTING WITH the terminator `Stmt`.
    */
  private def parseNodes(toks: List[Tok], inBlock: Boolean): (Seq[Node], List[Tok]) = {
    val nodes = Seq.newBuilder[Node]
    var rest = toks
    while (rest.nonEmpty) {
      rest match {
        case Text(s) :: tl => nodes += Lit(s); rest = tl
        case Expr(e) :: tl =>
          // a quoted literal expression is the published templates' comma
          // separator idiom (`{%- if not loop.first -%}{{', '}}{%- endif %}`)
          if (e.matches(raw"'[^']*'|\x22[^\x22]*\x22"))
            nodes += Lit(e.substring(1, e.length - 1))
          else {
            // filters stay unsupported — fail at parse time with the
            // construct named; other expressions defer to evalExpr
            require(!e.contains("|"),
              s"unsupported Jinja construct '{{ $e }}' — filters are not supported")
            nodes += Var(e)
          }
          rest = tl
        case Stmt(s) :: tl if s.startsWith("set ") =>
          val assign = s.drop(4).trim
          val attrSet = raw"(?s)^($Ident)\.($Ident)\s*=\s*(.+)$$".r
          val varSet = raw"(?s)^($Ident)\s*=\s*(.+)$$".r
          assign match {
            case attrSet(n, a, e) => nodes += SetAttr(n, a, e.trim)
            case varSet(n, e) => nodes += SetVar(n, e.trim)
            case other => sys.error(s"unsupported Jinja set '$other' — " +
              "expected 'name = expr' or 'ns.attr = expr'")
          }
          rest = tl
        case Stmt(s) :: tl if s.startsWith("if ") =>
          val (n, r) = parseIf(cond(s.drop(3)), tl)
          nodes += n; rest = r
        case Stmt(s) :: tl if s.matches(s"for\\s+$Ident\\s+in\\s+$Ident(?:\\.values\\(\\))?") =>
          // `for x in somedict.values()` iterates the same caller-supplied
          // list as the bare name (the subset's dict-as-values convention,
          // matching the membership test's treatment)
          val parts = s.split("\\s+")
          val listName = parts(3).stripSuffix(".values()")
          val (body, r) = parseNodes(tl, inBlock = true)
          r match {
            case Stmt("endfor") :: r2 => nodes += For(parts(1), listName, body); rest = r2
            case other => sys.error(
              s"'{% for %}' closed by '${termName(other)}', expected '{% endfor %}'")
          }
        case (all @ Stmt(s) :: _) if isTerminator(s) =>
          require(inBlock, s"'{% $s %}' without an opening block")
          return (nodes.result(), all)
        case Stmt(s) :: _ =>
          val tag = s.split("\\s+").headOption.getOrElse(s)
          sys.error(s"unsupported Jinja construct '{% $s %}' — this engine renders " +
            s"variables, if/elif/else and for blocks only (tag '$tag' is not supported)")
        case Nil => // exhausted
      }
    }
    (nodes.result(), Nil)
  }

  private def termName(toks: List[Tok]): String = toks match {
    case Stmt(s) :: _ => s
    case _ => "<eof>"
  }

  private def parseIf(c: BExpr, toks: List[Tok]): (Node, List[Tok]) = {
    val branches = Seq.newBuilder[(BExpr, Seq[Node])]
    var currentCond = c
    var rest = toks
    var otherwise: Seq[Node] = Nil
    var done = false
    while (!done) {
      val (body, term) = parseNodes(rest, inBlock = true)
      term match {
        case Stmt(t) :: tl if t.startsWith("elif ") =>
          branches += ((currentCond, body))
          currentCond = cond(t.drop(5))
          rest = tl
        case Stmt("else") :: tl =>
          branches += ((currentCond, body))
          val (eb, term2) = parseNodes(tl, inBlock = true)
          term2 match {
            case Stmt("endif") :: tl2 => otherwise = eb; rest = tl2; done = true
            case other => sys.error(
              s"'{% else %}' closed by '${termName(other)}', expected '{% endif %}'")
          }
        case Stmt("endif") :: tl =>
          branches += ((currentCond, body))
          rest = tl; done = true
        case other =>
          sys.error(s"'{% if %}' closed by '${termName(other)}', expected '{% endif %}'")
      }
    }
    (If(branches.result(), otherwise), rest)
  }

  /** Full boolean condition grammar (the published merge template's
    * shapes, r15): `or` / `and` / `not` with Jinja2 precedence
    * (or < and < not), parenthesized groups, and the terms —
    * truthiness, `==`/`!=`, `x in somelist[.values()|.keys()]`,
    * `x in ["lit", ...]` literal lists (lhs may be a quoted literal
    * too), `x.endswith("lit")`, and `xs.keys()|length > n` (the one
    * filter the published tree compares on).
    */
  private def cond(raw: String): BExpr = {
    val p = new CondParser(raw)
    val e = p.parseOr()
    p.skipWs()
    require(p.atEnd, s"unsupported Jinja condition '$raw' — trailing input at '${p.rest}'")
    e
  }

  private sealed trait BExpr
  private final case class BOr(a: BExpr, b: BExpr) extends BExpr
  private final case class BAnd(a: BExpr, b: BExpr) extends BExpr
  private final case class BNot(a: BExpr) extends BExpr
  private final case class BTerm(c: Cond) extends BExpr
  private final case class BEndsWith(x: String, suffix: String) extends BExpr
  private final case class BInLits(x: String, lits: Seq[String]) extends BExpr
  private final case class BLenGt(list: String, n: Int) extends BExpr

  /** Recursive-descent parser over one `{% if %}` condition. */
  private final class CondParser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def rest: String = s.substring(i)
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def word(w: String): Boolean = {
      skipWs()
      if (s.regionMatches(false, i, w, 0, w.length) &&
          (i + w.length >= s.length || !s.charAt(i + w.length).isLetterOrDigit)) {
        i += w.length; true
      } else false
    }
    private def peekWord(w: String): Boolean = {
      val save = i
      val ok = word(w)
      i = save
      ok
    }
    private val OperandRe = raw"($VarRef|'[^']*'|\x22[^\x22]*\x22)".r
    private def operandTok(): String = {
      skipWs()
      OperandRe.findPrefixOf(s.substring(i)) match {
        case Some(tok) => i += tok.length; tok
        case None => sys.error(
          s"unsupported Jinja condition '$s' — expected a variable or quoted literal at '${rest.take(30)}'")
      }
    }
    def parseOr(): BExpr = {
      var l = parseAnd()
      while (peekWord("or")) { word("or"); l = BOr(l, parseAnd()) }
      l
    }
    private def parseAnd(): BExpr = {
      var l = parseNot()
      while (peekWord("and")) { word("and"); l = BAnd(l, parseNot()) }
      l
    }
    private def parseNot(): BExpr =
      if (word("not")) BNot(parseNot())
      else {
        skipWs()
        if (i < s.length && s.charAt(i) == '(') {
          i += 1
          val e = parseOr()
          skipWs()
          require(i < s.length && s.charAt(i) == ')',
            s"unsupported Jinja condition '$s' — missing ')' at '${rest.take(30)}'")
          i += 1
          e
        } else parseTerm()
      }
    private def parseTerm(): BExpr = {
      // xs.keys()|length > n — the only filter comparison the tree uses
      skipWs()
      val lenRe = raw"($Ident)\.keys\(\)\s*\|\s*length\s*>\s*(\d+)".r
      lenRe.findPrefixMatchOf(s.substring(i)) match {
        case Some(m) => i += m.end; return BLenGt(m.group(1), m.group(2).toInt)
        case None =>
      }
      val endsRe = raw"($Ident)\.endswith\(\s*('[^']*'|\x22[^\x22]*\x22)\s*\)".r
      endsRe.findPrefixMatchOf(s.substring(i)) match {
        case Some(m) =>
          i += m.end
          val q = m.group(2)
          return BEndsWith(m.group(1), q.substring(1, q.length - 1))
        case None =>
      }
      val lhs = operandTok()
      skipWs()
      if (s.startsWith("==", i) || s.startsWith("!=", i)) {
        val op = s.substring(i, i + 2); i += 2
        BTerm(Cond(negated = false, lhs, Some((op, operandTok()))))
      } else if (peekWord("in")) {
        word("in")
        skipWs()
        if (i < s.length && s.charAt(i) == '[') {
          // literal list: in ["a", "b", ...]
          val close = {
            var j = i + 1; var inQ = false
            while (j < s.length && (inQ || s.charAt(j) != ']')) {
              if (s.charAt(j) == '\'' || s.charAt(j) == '"') inQ = !inQ
              j += 1
            }
            require(j < s.length, s"unsupported Jinja condition '$s' — missing ']'")
            j
          }
          val lits = s.substring(i + 1, close).split(",").toSeq
            .map(_.trim).filter(_.nonEmpty)
            .map(q => q.substring(1, q.length - 1))
          i = close + 1
          BInLits(lhs, lits)
        } else {
          val memRe = raw"($Ident)(?:\.(?:values|keys)\(\))?".r
          memRe.findPrefixMatchOf(s.substring(i)) match {
            case Some(m) =>
              i += m.end
              BTerm(Cond(negated = false, lhs, None, inList = Some(m.group(1))))
            case None => sys.error(
              s"unsupported Jinja condition '$s' — expected a list name after 'in'")
          }
        }
      } else BTerm(Cond(negated = false, lhs, None))
    }
  }

  // ---- eval ----------------------------------------------------------------

  private def lookup(name: String, scalars: Map[String, String]): String =
    scalars.getOrElse(name, sys.error(
      s"undefined Jinja variable '$name' — provided: ${scalars.keys.toSeq.sorted.mkString(", ")}"))

  private def operand(o: String, scalars: Map[String, String]): String =
    if (o.startsWith("'") || o.startsWith("\"")) o.substring(1, o.length - 1)
    else lookup(o, scalars)

  private def truthy(c: Cond, scalars: Map[String, String],
      lists: Map[String, Seq[String]]): Boolean = {
    val base = (c.op, c.inList) match {
      case (Some((op, r)), _) =>
        val l = operand(c.lhs, scalars)
        val rv = operand(r, scalars)
        if (op == "==") l == rv else l != rv
      case (None, Some(listName)) =>
        lists.getOrElse(listName, sys.error(
          s"undefined Jinja list '$listName' in membership test — provided: " +
            lists.keys.toSeq.sorted.mkString(", ")))
          .contains(operand(c.lhs, scalars))
      case (None, None) => scalars.get(c.lhs).exists(_.nonEmpty)
    }
    if (c.negated) !base else base
  }

  private def evalB(e: BExpr, scalars: Map[String, String],
      lists: Map[String, Seq[String]]): Boolean = e match {
    case BOr(a, b) => evalB(a, scalars, lists) || evalB(b, scalars, lists)
    case BAnd(a, b) => evalB(a, scalars, lists) && evalB(b, scalars, lists)
    case BNot(a) => !evalB(a, scalars, lists)
    case BTerm(c) => truthy(c, scalars, lists)
    case BEndsWith(x, suffix) => lookup(x, scalars).endsWith(suffix)
    case BInLits(x, lits) => lits.contains(operand(x, scalars))
    case BLenGt(l, n) => lists.getOrElse(l, sys.error(
      s"undefined Jinja list '$l' in |length — provided: " +
        lists.keys.toSeq.sorted.mkString(", "))).size > n
  }

  /** Mutable namespace objects (`{% set ns = namespace(a=0) %}`) — Jinja2's
    * escape hatch for state that must survive loop-iteration scoping.
    * Keyed by binding name; re-binding replaces the object (the pk-swap
    * template re-initializes its counter namespace before each loop).
    */
  private type NsEnv = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]

  /** `namespace(a=0[, b=0, ...])` — one or more attribute initializers. */
  private val NamespaceCall = raw"(?s)^namespace\(\s*(.+?)\s*\)$$".r
  private val NsKv = raw"^($Ident)\s*=\s*(.+)$$".r

  /** Evaluate a Jinja expression to a string: quoted/int literals,
    * (loop-)variables, `ns.attr` reads, `list[indexExpr]` indexing,
    * `var.lower()`, and top-level `+` integer addition. Anything else
    * fails loudly with the expression named.
    */
  private def evalExpr(e: String, scalars: Map[String, String],
      lists: Map[String, Seq[String]], env: NsEnv): String = {
    val s = e.trim
    val plusParts = {
      // split on '+' outside quotes/brackets/parens
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var inQ = false
      var depth = 0
      s.foreach { ch =>
        if (ch == '\'') { inQ = !inQ; cur += ch }
        else if (!inQ && (ch == '(' || ch == '[')) { depth += 1; cur += ch }
        else if (!inQ && (ch == ')' || ch == ']')) { depth -= 1; cur += ch }
        else if (!inQ && depth == 0 && ch == '+') { out += cur.result(); cur.clear() }
        else cur += ch
      }
      out += cur.result()
      out.result()
    }
    if (plusParts.length > 1)
      return plusParts.map(p => evalExpr(p, scalars, lists, env).toLong).sum.toString
    val attrRef = raw"^($Ident)\.($Ident)$$".r
    val indexRef = raw"(?s)^($Ident)\[(.+)\]$$".r
    val lowerCall = raw"^($Ident)\.lower\(\)$$".r
    s match {
      case q if q.matches(raw"'[^']*'|\x22[^\x22]*\x22") => q.substring(1, q.length - 1)
      case n if n.matches(raw"-?\d+") => n
      case v if v.matches(VarRef) => lookup(v, scalars)
      case lowerCall(n) => lookup(n, scalars).toLowerCase
      case attrRef(n, a) if env.contains(n) =>
        env(n).getOrElse(a, sys.error(s"namespace '$n' has no attribute '$a'"))
      case indexRef(n, idx) =>
        val xs = lists.getOrElse(n, sys.error(
          s"undefined Jinja list '$n' in index expression — provided: " +
            lists.keys.toSeq.sorted.mkString(", ")))
        val i = evalExpr(idx, scalars, lists, env).toInt
        require(i >= 0 && i < xs.size, s"index $i out of range for list '$n' (size ${xs.size})")
        xs(i)
      case other => sys.error(s"unsupported Jinja expression '$other' — " +
        "supported: literals, variables, ns.attr, list[idx], x.lower(), '+' addition")
    }
  }

  private def eval(nodes: Seq[Node], scalars0: Map[String, String],
      lists: Map[String, Seq[String]], sb: StringBuilder,
      env: NsEnv = scala.collection.mutable.Map.empty): Unit = {
    // {% set %} bindings apply to the REST of this node list only (block
    // scoped, Jinja2 semantics) — thread an updatable view
    var scalars = scalars0
    nodes.foreach {
      case Lit(s) => sb.append(s)
      case Var(e) => sb.append(evalExpr(e, scalars, lists, env))
      case SetVar(n, e) => e match {
        case NamespaceCall(kvs) =>
          val m = scala.collection.mutable.Map.empty[String, String]
          kvs.split(",").map(_.trim).filter(_.nonEmpty).foreach {
            case NsKv(attr, v) => m(attr) = evalExpr(v, scalars, lists, env)
            case other => sys.error(
              s"unsupported namespace initializer '$other' — expected attr = expr")
          }
          env(n) = m
        case expr => scalars = scalars + (n -> evalExpr(expr, scalars, lists, env))
      }
      case SetAttr(n, a, e) =>
        env.getOrElse(n, sys.error(
          s"'$n' is not a namespace — bind it with {{% set $n = namespace(...) %}} first"))
          .update(a, evalExpr(e, scalars, lists, env))
      case If(branches, otherwise) =>
        branches.find { case (c, _) => evalB(c, scalars, lists) } match {
          case Some((_, body)) => eval(body, scalars, lists, sb, env)
          case None => eval(otherwise, scalars, lists, sb, env)
        }
      case For(v, listName, body) =>
        val xs = lists.getOrElse(listName, sys.error(
          s"undefined Jinja list '$listName' — provided lists: " +
            lists.keys.toSeq.sorted.mkString(", ")))
        xs.zipWithIndex.foreach { case (x, i) =>
          // truthiness is non-empty, so ""/"true" encode loop booleans
          val loopVars = Map(
            "loop.first" -> (if (i == 0) "true" else ""),
            "loop.last" -> (if (i == xs.size - 1) "true" else ""),
            "loop.index" -> (i + 1).toString,
            "loop.index0" -> i.toString,
            "loop.length" -> xs.size.toString)
          eval(body, scalars ++ loopVars + (v -> x), lists, sb, env)
        }
    }
  }
}
