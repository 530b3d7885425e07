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
  private final case class If(branches: Seq[(Seq[Cond], Seq[Node])], otherwise: Seq[Node]) extends Node
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
  // a variable reference in {{ .. }} / conditions: plain name or loop attr
  private val VarRef = raw"(?:$Ident|loop\.(?:first|last|index0?|length))"

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

  private def parseIf(c: Seq[Cond], toks: List[Tok]): (Node, List[Tok]) = {
    val branches = Seq.newBuilder[(Seq[Cond], Seq[Node])]
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

  /** An `and`-joined condition list (Jinja2: `and` binds looser than
    * `not`/`in`, so each side parses as one term — the pk-swap template's
    * `not column in events and not column in events.values()`, r15); a
    * branch is truthy when EVERY term is.
    */
  private def cond(raw: String): Seq[Cond] =
    raw.split(raw"\s+and\s+").toSeq.map(condTerm)

  private def condTerm(raw: String): Cond = {
    val s = raw.trim
    val (neg, body) = if (s.startsWith("not ")) (true, s.drop(4).trim) else (false, s)
    val cmp = raw"($VarRef|'[^']*'|\x22[^\x22]*\x22)\s*(==|!=)\s*($VarRef|'[^']*'|\x22[^\x22]*\x22)".r
    val mem = raw"($VarRef)\s+in\s+($Ident)(?:\.values\(\))?".r
    body match {
      case cmp(l, op, r) => Cond(neg, l, Some((op, r)))
      case mem(l, listName) => Cond(neg, l, None, inList = Some(listName))
      case v if v.matches(VarRef) => Cond(neg, v, None)
      case other => sys.error(s"unsupported Jinja condition '$other' — " +
        "use a variable, 'not var', == / != against a quoted literal, " +
        "or 'x in somelist' membership (terms may be 'and'-joined)")
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

  /** Mutable namespace objects (`{% set ns = namespace(a=0) %}`) — Jinja2's
    * escape hatch for state that must survive loop-iteration scoping.
    * Keyed by binding name; re-binding replaces the object (the pk-swap
    * template re-initializes its counter namespace before each loop).
    */
  private type NsEnv = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]

  private val NamespaceCall = raw"(?s)^namespace\(\s*($Ident)\s*=\s*(.+?)\s*\)$$".r

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
        case NamespaceCall(attr, v) =>
          env(n) = scala.collection.mutable.Map(
            attr -> evalExpr(v, scalars, lists, env))
        case expr => scalars = scalars + (n -> evalExpr(expr, scalars, lists, env))
      }
      case SetAttr(n, a, e) =>
        env.getOrElse(n, sys.error(
          s"'$n' is not a namespace — bind it with {{% set $n = namespace(...) %}} first"))
          .update(a, evalExpr(e, scalars, lists, env))
      case If(branches, otherwise) =>
        branches.find { case (cs, _) => cs.forall(truthy(_, scalars, lists)) } match {
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
