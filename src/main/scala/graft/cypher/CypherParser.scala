package graft.cypher

import CypherAst._

/** Recursive-descent parser for the Cypher READ subset documented on
  * [[CypherAst]]. Hand-rolled (no parser library — the build's only
  * dependencies are Spark + scalatest) and ~public-grammar-faithful:
  * keywords are case-insensitive, identifiers may be backquoted,
  * strings take single or double quotes.
  *
  * Errors carry the token position so a malformed query fails with
  * `cypher parse error at 37: expected ')' …` rather than a stack of
  * Nones — this is a user-facing query language, not an internal DSL.
  */
object CypherParser {

  final case class Tok(kind: String, s: String, pos: Int)

  // ---- lexer -----------------------------------------------------
  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += Tok("ident", q.substring(j, i), j)
      } else if (c == '`') {
        val j = i + 1
        i = j
        while (i < n && q(i) != '`') i += 1
        if (i >= n) fail(j, "unterminated backquoted identifier")
        out += Tok("ident", q.substring(j, i), j - 1)
        i += 1
      } else if (c.isDigit) {
        val j = i
        while (i < n && q(i).isDigit) i += 1
        if (i < n && q(i) == '.' && i + 1 < n && q(i + 1).isDigit) {
          i += 1
          while (i < n && q(i).isDigit) i += 1
          out += Tok("float", q.substring(j, i), j)
        } else out += Tok("int", q.substring(j, i), j)
      } else if (c == '$') {
        val j = i + 1
        i = j
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        if (i == j) fail(j, "expected parameter name after '$'")
        out += Tok("param", q.substring(j, i), j - 1)
      } else if (c == '\'' || c == '"') {
        // backslash escapes (\\ \' \" \n \t \r) and the doubled-quote
        // form ('it''s') — what real drivers emit; without these a
        // quote could never appear inside a string and valid
        // openCypher would mis-lex at the wire front door
        val j = i + 1
        i = j
        val sb = new java.lang.StringBuilder
        var closed = false
        while (i < n && !closed) {
          val ch = q(i)
          if (ch == '\\' && i + 1 < n) {
            q(i + 1) match {
              case '\\' => sb.append('\\')
              case '\'' => sb.append('\'')
              case '"' => sb.append('"')
              case 'n' => sb.append('\n')
              case 't' => sb.append('\t')
              case 'r' => sb.append('\r')
              case other => fail(i, s"unknown string escape '\\$other'")
            }
            i += 2
          } else if (ch == c && i + 1 < n && q(i + 1) == c) {
            sb.append(c); i += 2 // doubled quote
          } else if (ch == c) {
            closed = true; i += 1
          } else { sb.append(ch); i += 1 }
        }
        if (!closed) fail(j, "unterminated string literal")
        out += Tok("str", sb.toString, j - 1)
      } else {
        // two-char operators first, then single punctuation
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (two == "//") {
          // openCypher line comment — the reference's projector
          // statement text carries these inline
          // (graph_app_nutrient_content.py:146-160)
          while (i < n && q(i) != '\n') i += 1
        } else if (two == "/*") {
          val close = q.indexOf("*/", i + 2)
          if (close < 0) fail(i, "unterminated /* comment")
          i = close + 2
        } else if (two == "<>" || two == "<=" || two == ">=" ||
            two == ".." || two == "+=") {
          out += Tok("op", two, i); i += 2
        } else if ("()[]{},:.|*->=<+/%".indexOf(c) >= 0) {
          out += Tok("op", c.toString, i); i += 1
        } else fail(i, s"unexpected character '$c'")
      }
    }
    out.result()
  }

  private def fail(pos: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"cypher parse error at $pos: $msg")

  // ---- parser state ----------------------------------------------
  private final class P(toks: Vector[Tok]) {
    var i = 0
    var anon = 0
    def freshName(prefix: String): String = { anon += 1; s"  $prefix$anon" }
    def peek: Tok =
      if (i < toks.length) toks(i) else Tok("eof", "", Int.MaxValue)
    def peek2: Tok =
      if (i + 1 < toks.length) toks(i + 1) else Tok("eof", "", Int.MaxValue)
    def next(): Tok = { val t = peek; i += 1; t }
    def isKw(t: Tok, kw: String): Boolean =
      t.kind == "ident" && t.s.equalsIgnoreCase(kw)
    def atKw(kw: String): Boolean = isKw(peek, kw)
    def eatKw(kw: String): Unit =
      if (atKw(kw)) i += 1 else fail(peek.pos, s"expected $kw, got '${peek.s}'")
    def atOp(op: String): Boolean = peek.kind == "op" && peek.s == op
    def eatOp(op: String): Unit =
      if (atOp(op)) i += 1
      else fail(peek.pos, s"expected '$op', got '${peek.s}'")
    def ident(): String = {
      val t = next()
      if (t.kind != "ident") fail(t.pos, s"expected identifier, got '${t.s}'")
      t.s
    }
  }

  /** Parse one read query (possibly a UNION chain). Throws
    * IllegalArgumentException with a position on malformed input. */
  def parse(q: String): Query = {
    val p = new P(lex(q))
    val query = parseQuery(p)
    if (p.peek.kind != "eof")
      fail(p.peek.pos, s"trailing input '${p.peek.s}'")
    query
  }

  /** Parse a statement that may be a READ query or a WRITE statement
    * (MERGE/CREATE/SET — the reference's projector idioms, now with
    * the `MERGE … RETURN` / `… WITH … RETURN` read continuations).
    * Statement kind: the statement is a WRITE iff a clause-position
    * write keyword appears BEFORE any clause-position RETURN. A
    * keyword after `.` / `:` / `{` / `,` / `(` / `[` is a prop key,
    * label, map key or pattern variable, never a clause; a keyword
    * after `AS` is an alias (`WITH n.a AS delete`, `UNWIND xs AS
    * merge`), never a clause; and `set` — the write keyword most
    * commonly used as a bare identifier elsewhere — counts as a
    * clause only when followed by `ident.`/`ident +=` (the SET-item
    * shape). The shape tests are a fast ROUTER, not the grammar: if
    * the write parse rejects a statement the router sent it (a write
    * keyword used as an identifier in a position the shapes miss,
    * e.g. `WHERE delete IS NULL`), the statement is re-tried as a
    * read query, and only if BOTH grammars reject does the write
    * error surface. A valid read can never silently misroute the
    * other way — the read grammar has no write clauses. */
  def parseAny(q: String): Either[WriteQuery, Query] = {
    val toks = lex(q)
    val strongKw = Set("merge", "create", "delete", "detach", "remove",
      "foreach")
    def clausePos(i: Int): Boolean = i == 0 || {
      val prev = toks(i - 1)
      !((prev.kind == "op" && Set(".", ":", "{", ",", "(", "[")(prev.s)) ||
        (prev.kind == "ident" && prev.s.equalsIgnoreCase("as")))
    }
    def looksSetClause(i: Int): Boolean =
      i + 2 < toks.length && toks(i + 1).kind == "ident" &&
        toks(i + 2).kind == "op" &&
        (toks(i + 2).s == "." || toks(i + 2).s == "+=" ||
          toks(i + 2).s == ":") // SET v:Label (round 14)
    def firstClause(pred: Int => Boolean): Int =
      toks.indices.collectFirst {
        case i if toks(i).kind == "ident" && clausePos(i) && pred(i) => i
      }.getOrElse(Int.MaxValue)
    val firstReturn = firstClause(i => toks(i).s.equalsIgnoreCase("return"))
    val firstWrite = firstClause { i =>
      val s = toks(i).s.toLowerCase
      strongKw(s) || (s == "set" && looksSetClause(i))
    }
    if (firstWrite < firstReturn) {
      try {
        val p = new P(toks)
        val w = parseWrite(p)
        if (p.peek.kind != "eof")
          fail(p.peek.pos, s"trailing input '${p.peek.s}'")
        Left(w)
      } catch {
        case we: IllegalArgumentException =>
          try Right(parse(q))
          catch { case _: IllegalArgumentException => throw we }
      }
    } else Right(parse(q))
  }

  /** Parse `CREATE CONSTRAINT [name] [IF NOT EXISTS] FOR (v:Label)
    * REQUIRE (v.k1[, v.k2…]) IS UNIQUE` — the reference's bootstrap
    * DDL (app/graph_constraints.py:2-133; the single-key spelling
    * `REQUIRE v.k IS UNIQUE` included). Returns None when the text is
    * not a CREATE CONSTRAINT statement at all; a statement that IS
    * one but is malformed (or a non-UNIQUE constraint kind) fails
    * loudly — a typo'd schema statement must not fall through to the
    * write grammar's unrelated error. A trailing `;` is tolerated:
    * the reference's own statement strings carry one. */
  /** Parse the built-in catalog-procedure calls a real Neo4j driver,
    * Browser, or BI tool issues on connect (round 16): `CALL
    * db.labels()` / `db.relationshipTypes()` / `db.propertyKeys()` /
    * `db.schema.visualization()` / `dbms.components()` — parens
    * optional (Neo4j accepts `CALL db.labels`), and the plain
    * `YIELD x [RETURN x]` tails drivers append are tolerated (the
    * db.* token procedures are single-column, so the tail renames
    * nothing the engine serves differently). Returns the CANONICAL
    * procedure name, or None when the text is not one of these
    * calls — `CALL { … }` subqueries and any other statement fall
    * through to the ordinary grammar. */
  def parseProcedureCall(q: String): Option[String] = {
    val procRe =
      ("""(?is)^\s*CALL\s+(db\.(?:labels|relationshipTypes|propertyKeys|""" +
        """schema\.visualization)|dbms\.components)\s*(?:\(\s*\))?\s*""" +
        """(?:YIELD\s+[A-Za-z_][A-Za-z0-9_]*\s*""" +
        """(?:RETURN\s+[A-Za-z_][A-Za-z0-9_]*\s*)?)?;?\s*$""").r
    q match {
      case procRe(name) => Some(name.toLowerCase match {
        case "db.labels" => "db.labels"
        case "db.relationshiptypes" => "db.relationshipTypes"
        case "db.propertykeys" => "db.propertyKeys"
        case "dbms.components" => "dbms.components"
        case _ => "db.schema.visualization"
      })
      case _ => None
    }
  }

  def parseConstraintDdl(q: String): Option[ConstraintDdl] = {
    val trimmed = q.trim.stripSuffix(";").trim
    val head = trimmed.split("\\s+", 3)
    if (head.length < 2 || !head(0).equalsIgnoreCase("create") ||
        !head(1).equalsIgnoreCase("constraint")) return None
    val p = new P(lex(trimmed))
    p.eatKw("create"); p.eatKw("constraint")
    val name =
      if (p.peek.kind == "ident" && !p.atKw("if") && !p.atKw("for"))
        p.ident()
      else ""
    val ifNot =
      if (p.atKw("if")) {
        p.eatKw("if"); p.eatKw("not"); p.eatKw("exists"); true
      } else false
    p.eatKw("for")
    p.eatOp("(")
    val v = p.ident()
    p.eatOp(":")
    val label = p.ident()
    p.eatOp(")")
    p.eatKw("require")
    val keys = Vector.newBuilder[String]
    def prop(): Unit = {
      val pv = p.ident()
      if (pv != v) fail(p.peek.pos,
        s"REQUIRE references `$pv` but the FOR pattern binds `$v`")
      p.eatOp(".")
      keys += p.ident()
    }
    if (p.atOp("(")) {
      p.eatOp("(")
      prop()
      while (p.atOp(",")) { p.eatOp(","); prop() }
      p.eatOp(")")
    } else prop()
    p.eatKw("is")
    p.eatKw("unique")
    if (p.peek.kind != "eof")
      fail(p.peek.pos, s"trailing input '${p.peek.s}' after IS UNIQUE")
    Some(ConstraintDdl(name, ifNot, label, keys.result()))
  }

  // ---- write statements (round 11) ---------------------------------
  private def parseWrite(p: P): WriteQuery = {
    val unwinds = Vector.newBuilder[(Expr, String)]
    while (p.atKw("unwind")) {
      p.eatKw("unwind")
      val listE: Expr =
        if (p.peek.kind == "param") Param(p.next().s)
        else fail(p.peek.pos, "write UNWIND takes a $param list")
      p.eatKw("as")
      unwinds += ((listE, p.ident()))
    }
    val matches = Vector.newBuilder[MatchPart]
    while (p.atKw("match")) {
      p.eatKw("match")
      val paths = Vector.newBuilder[PathPat]
      paths += pathPat(p)
      while (p.atOp(",")) { p.eatOp(","); paths += pathPat(p) }
      val where =
        if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) } else None
      matches += MatchPart(paths.result(), optional = false, where)
    }
    val clauses: Seq[WriteClause] =
      if (atWriteKw(p)) parseWriteClauses(p) else Nil
    // `[WITH items [WHERE pred]] ( CALL { … } | [MATCH …]* <write
    // clauses> )` — the statement TAIL. Covers the round-14
    // conditional-write CALL block (the reference's optional-edge
    // idiom, graph_app_nutrient_content.py:155-162) AND its two
    // inline spellings from the projector corpus (round 15):
    //   MATCH … WITH ie, $end AS endp WHERE endp IS NOT NULL SET …
    //     (graph_irrigation_event.py:323-328 — conditional SET), and
    //   MERGE (c:Crop {…}) WITH c MATCH (osr:…) MERGE (c)-[r]->(osr)
    //     (graph_optimum_sap_range.py:39-44 — write → WITH → MATCH →
    //     write).
    // Both desugar onto the SAME CallBlock apply: bare items are
    // scope imports, `expr AS alias` items become computed `lets`
    // columns, the WHERE filters the statement frame, the MATCH parts
    // bind against the pre-apply graph, and the clauses contribute to
    // this statement's deltas. Tentative parse: a tail that does not
    // end in write clauses (e.g. `WITH … RETURN`) restores and falls
    // through to the read continuation below.
    val call: Option[CallBlock] = {
      val save = p.i
      var ok = true
      val importsB = Vector.newBuilder[String]
      val letsB = Vector.newBuilder[(String, Expr)]
      var where0: Option[Expr] = None
      if (p.atKw("with")) {
        p.eatKw("with")
        // a bare ident NOT followed by an expression continuation is
        // a scope import; anything else must parse as `expr AS alias`
        def exprCont(k: String, s: String): Boolean =
          (k == "op" && Set(".", "(", "[", "+", "-", "*", "/", "%",
            "=", "<>", "<", "<=", ">", ">=")(s)) ||
          (k == "ident" && Set("as", "is", "in", "contains", "starts",
            "ends", "and", "or", "not")(s.toLowerCase))
        def item(): Unit =
          if (p.peek.kind == "ident" && !p.atKw("call") &&
              !exprCont(p.peek2.kind, p.peek2.s)) importsB += p.ident()
          else scala.util.Try {
            val e = orExpr(p)
            if (p.atKw("as")) { p.eatKw("as"); letsB += ((p.ident(), e)) }
            else ok = false
          }.getOrElse { ok = false }
        item()
        while (ok && p.atOp(",")) { p.eatOp(","); item() }
        if (ok && p.atKw("where"))
          scala.util.Try { p.eatKw("where"); where0 = Some(orExpr(p)) }
            .getOrElse { ok = false }
      }
      val imports0 = importsB.result()
      val lets0 = letsB.result()
      if (ok && p.atKw("call") && p.peek2.kind == "op" && p.peek2.s == "{") {
        p.eatKw("call")
        val cb = parseCallBlock(p, imports0)
        val w = (where0, cb.where) match {
          case (Some(a), Some(b)) => Some(And(a, b))
          case (a, b) => a.orElse(b)
        }
        Some(cb.copy(where = w, lets = lets0))
      } else if (ok && (imports0.nonEmpty || lets0.nonEmpty) &&
                 (p.atKw("match") || atWriteKw(p))) {
        // the inline tail: optional MATCH parts, then write clauses
        val matchesB = Vector.newBuilder[MatchPart]
        var fine = true
        scala.util.Try {
          while (p.atKw("match")) {
            p.eatKw("match")
            val paths = Vector.newBuilder[PathPat]
            paths += pathPat(p)
            while (p.atOp(",")) { p.eatOp(","); paths += pathPat(p) }
            val w = if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
                    else None
            matchesB += MatchPart(paths.result(), optional = false, w)
          }
        }.getOrElse { fine = false }
        if (fine && atWriteKw(p))
          Some(CallBlock(imports0, where0, matchesB.result(),
            parseWriteClauses(p), lets0))
        else { p.i = save; None }
      } else { p.i = save; None }
    }
    if (call.isDefined && (p.atKw("return") || p.atKw("with")))
      fail(p.peek.pos,
        "a read continuation after CALL { … } is not supported " +
        "(CALL is the statement's tail block)")
    // read continuation (round 13): `… RETURN items` projects the
    // statement's bound rows against the POST-APPLY graph; `… WITH
    // items [MATCH …]* RETURN items` threads them through the read
    // pipeline (the write-then-read idiom). The continuation reuses
    // the read grammar wholesale.
    val returning: Option[Query] =
      if (call.isDefined) None
      else if (p.atKw("return")) {
        p.eatKw("return")
        Some(Query(Seq(Segment(Nil, Nil, None, None)), returnClause(p)))
      } else if (p.atKw("with")) {
        p.eatKw("with")
        val w = withClause(p)
        val rest = parseQuery(p, isFirst = false)
        if (rest.union.isDefined)
          fail(p.peek.pos, "UNION after a write statement is not supported")
        Some(Query(Segment(Nil, Nil, None, Some(w)) +: rest.segments,
          rest.ret))
      } else None
    if (clauses.isEmpty && call.isEmpty)
      fail(p.peek.pos, "expected MERGE, CREATE or SET")
    WriteQuery(unwinds.result(), matches.result(), clauses, returning, call)
  }

  private def atWriteKw(p: P): Boolean =
    p.atKw("merge") || p.atKw("create") || p.atKw("set") ||
    p.atKw("delete") || p.atKw("detach") || p.atKw("remove") ||
    p.atKw("foreach")

  /** The inside of `CALL { … }`: scope WITHs (bare variable lists,
    * each with an optional WHERE — accumulated conjunctively), MATCH
    * parts, write clauses, and an optional trailing RETURN (openCypher
    * requires one; its value feeds nothing in a tail block, so it is
    * parsed and discarded). */
  private def parseCallBlock(p: P, outerImports: Seq[String]): CallBlock = {
    p.eatOp("{")
    val imports = Vector.newBuilder[String]
    imports ++= outerImports
    var where: Option[Expr] = None
    while (p.atKw("with")) {
      p.eatKw("with")
      imports += p.ident()
      while (p.atOp(",")) { p.eatOp(","); imports += p.ident() }
      if (p.atKw("where")) {
        p.eatKw("where")
        val w = orExpr(p)
        where = Some(where.fold(w)(And(_, w)))
      }
    }
    val matches = Vector.newBuilder[MatchPart]
    while (p.atKw("match")) {
      p.eatKw("match")
      val paths = Vector.newBuilder[PathPat]
      paths += pathPat(p)
      while (p.atOp(",")) { p.eatOp(","); paths += pathPat(p) }
      val w = if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
              else None
      matches += MatchPart(paths.result(), optional = false, w)
    }
    val clauses = parseWriteClauses(p)
    if (p.atKw("return")) { p.eatKw("return"); returnClause(p) }
    p.eatOp("}")
    CallBlock(imports.result().distinct, where, matches.result(), clauses)
  }

  /** The write-clause sequence (MERGE/CREATE/SET/DELETE/REMOVE) —
    * shared by the statement top level and FOREACH bodies. */
  private def parseWriteClauses(p: P): Seq[WriteClause] = {
    val clauses = Vector.newBuilder[WriteClause]
    // the most recent MERGE clause, held open so a following plain SET
    // that targets only its bound variable folds into it (the
    // reference's `MERGE … SET …` idiom — node and relationship form)
    var last: Option[WriteClause] = None
    def flush(): Unit = { last.foreach(clauses += _); last = None }
    var any = false
    while (p.atKw("merge") || p.atKw("create") || p.atKw("set") ||
           p.atKw("delete") || p.atKw("detach") || p.atKw("remove") ||
           p.atKw("foreach")) {
      any = true
      if (p.atKw("foreach")) {
        // `FOREACH (v IN list | <write clauses>)` — round 14: a
        // first-class clause (siblings before/after, nesting via the
        // recursive body parse), executed as a sub-scope by the apply
        flush()
        p.eatKw("foreach")
        p.eatOp("(")
        val v = p.ident()
        p.eatKw("in")
        val listE: Expr =
          if (p.peek.kind == "param") Param(p.next().s)
          else if (p.atOp("[")) {
            p.eatOp("[")
            val vals = Vector.newBuilder[Lit]
            if (!p.atOp("]")) {
              vals += literal(p)
              while (p.atOp(",")) { p.eatOp(","); vals += literal(p) }
            }
            p.eatOp("]")
            ListLit(vals.result())
          } else fail(p.peek.pos,
            "FOREACH takes `v IN $param` or a literal list")
        p.eatOp("|")
        val inner = parseWriteClauses(p)
        p.eatOp(")")
        clauses += Foreach(v, listE, inner)
      } else if (p.atKw("delete") || p.atKw("detach")) {
        flush()
        val detach = p.atKw("detach")
        if (detach) p.eatKw("detach")
        p.eatKw("delete")
        val vars = Vector.newBuilder[String]
        vars += p.ident()
        while (p.atOp(",")) { p.eatOp(","); vars += p.ident() }
        clauses += Delete(vars.result(), detach)
      } else if (p.atKw("remove")) {
        // REMOVE v.k desugars to SET v.k = null (same map semantics);
        // REMOVE v:Label clears a matching stored label (round 14)
        flush()
        p.eatKw("remove")
        val items = Vector.newBuilder[SetItem]
        def one(): Unit = {
          val v = p.ident()
          if (p.atOp(":")) {
            p.eatOp(":"); clauses += SetLabel(v, p.ident(), add = false)
          } else {
            p.eatOp(".")
            items += SetItem(v, Some(p.ident()), Lit(null))
          }
        }
        one()
        while (p.atOp(",")) { p.eatOp(","); one() }
        val its = items.result()
        if (its.nonEmpty) clauses += SetOnly(its)
      } else if (p.atKw("merge")) {
        flush()
        p.eatKw("merge")
        val pat = linearPat(p)
        var onCreate = Seq.empty[SetItem]
        var onMatch = Seq.empty[SetItem]
        while (p.atKw("on")) {
          p.eatKw("on")
          if (p.atKw("create")) {
            p.eatKw("create"); p.eatKw("set"); onCreate ++= setItems(p)
          } else {
            p.eatKw("match"); p.eatKw("set"); onMatch ++= setItems(p)
          }
        }
        if (pat.edges.isEmpty) {
          last = Some(MergeNode(pat.nodes.head, onCreate, onMatch, Nil))
        } else {
          if (pat.edges.length != 1 || pat.edges.head.range.isDefined)
            fail(p.peek.pos,
              "MERGE supports one fixed-length relationship per clause")
          if (pat.edges.head.undirected)
            fail(p.peek.pos,
              "MERGE on an undirected relationship is ambiguous — " +
              "write patterns need a direction")
          last = Some(MergeRel(pat, onCreate, onMatch, Nil))
        }
      } else if (p.atKw("create")) {
        flush()
        p.eatKw("create")
        val paths = Vector.newBuilder[PathPat]
        paths += linearPat(p)
        while (p.atOp(",")) { p.eatOp(","); paths += linearPat(p) }
        last = Some(Create(paths.result()))
      } else {
        p.eatKw("set")
        // plain SET also accepts the label form `SET v:Label`
        // (round 14) — collected apart from the prop items
        val itemsB = Vector.newBuilder[SetItem]
        val labelsB = Vector.newBuilder[SetLabel]
        def oneSet(): Unit = {
          val v = p.ident()
          if (p.atOp(":")) {
            p.eatOp(":"); labelsB += SetLabel(v, p.ident(), add = true)
          } else if (p.atOp("+=")) {
            p.eatOp("+="); itemsB += SetItem(v, None, addExpr(p))
          } else {
            p.eatOp(".")
            val k = p.ident()
            p.eatOp("=")
            itemsB += SetItem(v, Some(k), addExpr(p))
          }
        }
        oneSet()
        while (p.atOp(",")) { p.eatOp(","); oneSet() }
        val items = itemsB.result()
        val labels = labelsB.result()
        if (items.isEmpty) {
          flush()
          clauses ++= labels
        } else {
        // a plain SET whose every item targets the just-MERGEd node or
        // relationship folds into that MERGE (the reference's
        // `MERGE … SET …`); a keyed SET on a just-CREATEd single node
        // folds into the CREATE pattern's props (round 13 — the
        // `CREATE (x:L {k:1}) SET x.y = 2` idiom: identical semantics
        // here, since SET values cannot reference the created node)
        last match {
          case Some(mn: MergeNode) if items.forall(_.v == mn.pat.name) =>
            last = Some(mn.copy(always = mn.always ++ items))
          case Some(mr: MergeRel)
              if items.forall(_.v == mr.path.edges.head.name) =>
            last = Some(mr.copy(always = mr.always ++ items))
          case Some(Create(Seq(path)))
              if path.edges.isEmpty &&
                items.forall(si => si.v == path.nodes.head.name &&
                  si.key.isDefined) =>
            val np = path.nodes.head
            val folded = np.copy(props = np.props ++
              items.map(si => si.key.get -> si.value))
            last = Some(Create(Seq(path.copy(nodes = Seq(folded)))))
          case _ =>
            flush()
            clauses += SetOnly(items)
        }
        if (labels.nonEmpty) { flush(); clauses ++= labels }
        }
      }
    }
    flush()
    if (!any) fail(p.peek.pos, "expected MERGE, CREATE or SET")
    clauses.result()
  }

  private def setItems(p: P): Seq[SetItem] = {
    val items = Vector.newBuilder[SetItem]
    def one(): SetItem = {
      val v = p.ident()
      if (p.atOp("+=")) {
        p.eatOp("+=")
        SetItem(v, None, addExpr(p))
      } else {
        p.eatOp(".")
        val k = p.ident()
        p.eatOp("=")
        SetItem(v, Some(k), addExpr(p))
      }
    }
    items += one()
    while (p.atOp(",")) { p.eatOp(","); items += one() }
    items.result()
  }

  /** `isFirst = false` parses a query CONTINUATION (after a write
    * statement's WITH): the first segment may be empty — the write's
    * bound rows are its input. */
  private def parseQuery(p: P, isFirst: Boolean = true): Query = {
    val segments = Vector.newBuilder[Segment]
    var isFirstSegment = isFirst
    var done = false
    while (!done) {
      val unwinds = Vector.newBuilder[(Expr, String)]
      while (p.atKw("unwind")) {
        p.eatKw("unwind")
        val listE: Expr =
          if (p.peek.kind == "param") Param(p.next().s)
          else if (p.atOp("[")) {
            p.eatOp("[")
            val vals = Vector.newBuilder[Lit]
            if (!p.atOp("]")) {
              vals += literal(p)
              while (p.atOp(",")) { p.eatOp(","); vals += literal(p) }
            }
            p.eatOp("]")
            ListLit(vals.result())
          } else fail(p.peek.pos,
            "UNWIND takes a literal list or a $param list")
        p.eatKw("as")
        unwinds += ((listE, p.ident()))
      }
      val uw = unwinds.result()
      val matches = Vector.newBuilder[MatchPart]
      var first = uw.isEmpty
      while (p.atKw("match") || p.atKw("optional")) {
        val optional = p.atKw("optional")
        if (optional) {
          if (first && isFirstSegment)
            fail(p.peek.pos, "query cannot start with OPTIONAL MATCH")
          p.eatKw("optional")
        }
        p.eatKw("match")
        val paths = Vector.newBuilder[PathPat]
        paths += pathPat(p)
        while (p.atOp(",")) { p.eatOp(","); paths += pathPat(p) }
        // WHERE binds to THIS match clause (openCypher): for an
        // OPTIONAL MATCH it filters the optional side before the
        // null-extension rather than the joined rows after
        val partWhere =
          if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
          else None
        matches += MatchPart(paths.result(), optional, partWhere)
        first = false
      }
      val ms = matches.result()
      if (ms.isEmpty && uw.isEmpty && isFirstSegment)
        fail(p.peek.pos, "expected MATCH or UNWIND")
      // a WHERE here (not after a MATCH — e.g. directly after UNWIND)
      // filters the segment's current rows
      val where = if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
                  else None
      if (p.atKw("with")) {
        p.eatKw("with")
        segments += Segment(uw, ms, where, Some(withClause(p)))
        isFirstSegment = false
      } else {
        p.eatKw("return")
        segments += Segment(uw, ms, where, None)
        done = true
      }
    }
    val ret = returnClause(p)
    val union =
      if (p.atKw("union")) {
        p.eatKw("union")
        val all = p.atKw("all")
        if (all) p.eatKw("all")
        Some((all, parseQuery(p)))
      } else None
    Query(segments.result(), ret, union)
  }

  /** The WITH projection reuses the RETURN item grammar, plus the
    * trailing WHERE openCypher allows only here. */
  private def withClause(p: P): WithClause = {
    val r = returnClause(p)
    val where = if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
                else None
    WithClause(r.distinct, r.items, r.orderBy, r.skip, r.limit, where)
  }

  // ---- patterns --------------------------------------------------
  private def pathPat(p: P): PathPat = {
    // `p = shortestPath((a)-[:R*m..n]->(b))` | `p = (a)-[…]->(b)`
    // (general path binding, round 16 — nodes(p)/relationships(p)/
    // length(p) project over it)
    if (p.peek.kind == "ident" && p.peek2.kind == "op" && p.peek2.s == "=") {
      val pvar = p.ident()
      p.eatOp("=")
      if (p.atKw("shortestpath") || p.atKw("allshortestpaths")) {
        val all = p.atKw("allshortestpaths")
        p.eatKw(if (all) "allshortestpaths" else "shortestpath")
        p.eatOp("(")
        val inner = linearPat(p)
        p.eatOp(")")
        if (inner.edges.length != 1 || inner.edges.head.range.isEmpty)
          fail(p.peek.pos,
            "shortestPath needs exactly one bounded var-length edge")
        return inner.copy(shortest = Some(pvar), shortestAll = all)
      }
      return linearPat(p).copy(pathVar = Some(pvar))
    }
    linearPat(p)
  }

  private def linearPat(p: P): PathPat = {
    val nodes = Vector.newBuilder[NodePat]
    val edges = Vector.newBuilder[EdgePat]
    nodes += nodePat(p)
    while (p.atOp("-") || p.atOp("<")) {
      edges += edgePat(p)
      nodes += nodePat(p)
    }
    PathPat(nodes.result(), edges.result())
  }

  private def nodePat(p: P): NodePat = {
    p.eatOp("(")
    val name =
      if (p.peek.kind == "ident") p.ident() else p.freshName("n")
    val label =
      if (p.atOp(":")) { p.eatOp(":"); Some(p.ident()) } else None
    val props = if (p.atOp("{")) propMap(p) else Map.empty[String, Lit]
    p.eatOp(")")
    NodePat(name, label, props)
  }

  private def edgePat(p: P): EdgePat = {
    // '<' '-' '[' … ']' '-'  |  '-' '[' … ']' '-' '>'  |  '-[…]-'
    val in = p.atOp("<")
    if (in) { p.eatOp("<"); p.eatOp("-") } else p.eatOp("-")
    // bare edge `-->` / `<--` / `--` (no bracket part)
    if (!p.atOp("[")) {
      p.eatOp("-")
      val out = !in && p.atOp(">")
      if (out) p.eatOp(">")
      return EdgePat(p.freshName("e"), Nil, out = out || in == false,
        None, Map.empty, undirected = !in && !out)
    }
    p.eatOp("[")
    val name = if (p.peek.kind == "ident") p.ident() else p.freshName("e")
    val types = Vector.newBuilder[String]
    if (p.atOp(":")) {
      p.eatOp(":"); types += p.ident()
      while (p.atOp("|")) {
        p.eatOp("|")
        if (p.atOp(":")) p.eatOp(":") // tolerate `|:REL` (pre-9 Cypher)
        types += p.ident()
      }
    }
    val range =
      if (p.atOp("*")) {
        p.eatOp("*")
        def intTok(what: String): Int = p.next() match {
          case Tok("int", s, _) => s.toInt
          case t => fail(t.pos, s"expected $what")
        }
        // an absent upper bound is the OPEN form (hi = None): the
        // compiler converges it to the trail-semantics fixpoint —
        // openCypher's unbounded semantics, never a silent hop cap
        val r: (Int, Option[Int]) =
          if (p.atOp("]") || p.atOp("{")) (1, None) // [*]
          else if (p.atOp("..")) { // [*..n]
            p.eatOp(".."); (1, Some(intTok("upper bound after '..'")))
          } else {
            val lo = intTok("hop count after '*'")
            if (p.atOp("..")) {
              p.eatOp("..")
              if (p.peek.kind == "int")
                (lo, Some(intTok("upper bound"))) // [*m..n]
              else (lo, None) // [*m..]
            } else (lo, Some(lo)) // [*n] — exactly n hops
          }
        val (lo, hi) = r
        if (lo < 1 || hi.exists(_ < lo))
          fail(p.peek.pos, s"bad variable-length range *$lo..${hi.getOrElse("")}")
        Some(r)
      } else None
    val props = if (p.atOp("{")) propMap(p) else Map.empty[String, Lit]
    p.eatOp("]")
    p.eatOp("-")
    val out = p.atOp(">")
    if (out) p.eatOp(">")
    if (in && out) fail(p.peek.pos, "edge cannot be both <- and ->")
    EdgePat(name, types.result(), out = out || in == false, range, props,
      undirected = !in && !out)
  }

  private def propMap(p: P): Map[String, Expr] = {
    p.eatOp("{")
    val m = Map.newBuilder[String, Expr]
    var more = !p.atOp("}")
    while (more) {
      val k = p.ident()
      p.eatOp(":")
      val v: Expr =
        if (p.peek.kind == "param") Param(p.next().s)
        else if (p.peek.kind == "ident" &&
                 Set("datetime", "date")(p.peek.s.toLowerCase) &&
                 p.peek2.kind == "op" && p.peek2.s == "(") {
          // `{date: datetime($dt)}` — the reference's MERGE-pattern
          // idiom (e.g. graph_weather_day.py:230)
          val k = p.ident().toLowerCase
          p.eatOp("(")
          val inner =
            if (p.peek.kind == "param") Param(p.next().s) else literal(p)
          p.eatOp(")")
          TemporalFn(k, inner)
        } else if (p.peek.kind == "ident" && p.peek2.kind == "op" &&
                 p.peek2.s == "." &&
                 !Set("true", "false", "null")(p.peek.s.toLowerCase)) {
          // `{pid: row.pid}` — a property/field reference (the batch
          // write idiom binds pattern keys from the UNWIND row var);
          // the READ compiler rejects these in scan position, the
          // WRITE compiler evaluates them on the bound frame
          val v0 = p.ident(); p.eatOp("."); Prop(v0, p.ident())
        } else if (p.peek.kind == "ident" &&
                 !Set("true", "false", "null")(p.peek.s.toLowerCase)) {
          // `{name: t}` — a bare bound variable (the FOREACH element /
          // scalar-UNWIND idiom); same read/write split as Prop above
          Var(p.ident())
        } else literal(p)
      m += k -> v
      more = p.atOp(",")
      if (more) p.eatOp(",")
    }
    p.eatOp("}")
    m.result()
  }

  private def literal(p: P): Lit = {
    val neg = p.atOp("-")
    if (neg) p.eatOp("-")
    val t = p.next()
    t.kind match {
      case "str" if !neg => Lit(t.s)
      case "int" => Lit(if (neg) -t.s.toLong else t.s.toLong)
      case "float" => Lit(if (neg) -t.s.toDouble else t.s.toDouble)
      case "ident" if !neg && t.s.equalsIgnoreCase("true") => Lit(true)
      case "ident" if !neg && t.s.equalsIgnoreCase("false") => Lit(false)
      case "ident" if !neg && t.s.equalsIgnoreCase("null") => Lit(null)
      case _ => fail(t.pos, s"expected literal, got '${t.s}'")
    }
  }

  // ---- expressions -----------------------------------------------
  private def orExpr(p: P): Expr = {
    var l = andExpr(p)
    while (p.atKw("or")) { p.eatKw("or"); l = Or(l, andExpr(p)) }
    l
  }
  private def andExpr(p: P): Expr = {
    var l = notExpr(p)
    while (p.atKw("and")) { p.eatKw("and"); l = And(l, notExpr(p)) }
    l
  }
  private def notExpr(p: P): Expr =
    if (p.atKw("not")) { p.eatKw("not"); Not(notExpr(p)) }
    else comparison(p)

  private def comparison(p: P): Expr = {
    val l = addExpr(p)
    if (p.peek.kind == "op" && Set("=", "<>", "<", "<=", ">", ">=")(p.peek.s)) {
      val op = p.next().s
      Cmp(op, l, addExpr(p))
    } else if (p.atKw("is")) {
      p.eatKw("is")
      val not = p.atKw("not")
      if (not) p.eatKw("not")
      p.eatKw("null")
      IsNull(l, not)
    } else if (p.atKw("in")) {
      p.eatKw("in")
      p.eatOp("[")
      val vals = Vector.newBuilder[Lit]
      if (!p.atOp("]")) {
        vals += literal(p)
        while (p.atOp(",")) { p.eatOp(","); vals += literal(p) }
      }
      p.eatOp("]")
      InList(l, vals.result())
    } else if (p.atKw("contains")) {
      p.eatKw("contains"); StrPred("contains", l, addExpr(p))
    } else if (p.atKw("starts")) {
      p.eatKw("starts"); p.eatKw("with"); StrPred("starts", l, addExpr(p))
    } else if (p.atKw("ends")) {
      p.eatKw("ends"); p.eatKw("with"); StrPred("ends", l, addExpr(p))
    } else l
  }

  private def addExpr(p: P): Expr = {
    var l = mulExpr(p)
    while (p.atOp("+") || p.atOp("-")) {
      val op = p.next().s
      l = Arith(op, l, mulExpr(p))
    }
    l
  }

  private def mulExpr(p: P): Expr = {
    var l = atom(p)
    while (p.atOp("*") || p.atOp("/") || p.atOp("%")) {
      val op = p.next().s
      l = Arith(op, l, atom(p))
    }
    l
  }

  private def argList(p: P): Seq[Expr] = {
    val es = Vector.newBuilder[Expr]
    es += addExpr(p)
    while (p.atOp(",")) { p.eatOp(","); es += addExpr(p) }
    es.result()
  }

  /** `CASE WHEN c THEN v … [ELSE d] END` (the searched form) and the
    * simple form `CASE subject WHEN v THEN r … [ELSE d] END`, which
    * desugars to equality branches at parse time (round 15). */
  private def caseExpr(p: P): Expr = {
    val subject: Option[Expr] =
      if (p.atKw("when")) None else Some(addExpr(p))
    val branches = Vector.newBuilder[(Expr, Expr)]
    while (p.atKw("when")) {
      p.eatKw("when")
      val c0 = orExpr(p)
      val c = subject.fold(c0)(s => Cmp("=", s, c0))
      p.eatKw("then")
      branches += ((c, addExpr(p)))
    }
    val bs = branches.result()
    if (bs.isEmpty) fail(p.peek.pos, "CASE needs at least one WHEN")
    val other = if (p.atKw("else")) { p.eatKw("else"); Some(addExpr(p)) }
                else None
    p.eatKw("end")
    CaseWhen(bs, other)
  }

  /** Shared by WHERE and RETURN items (minus aggregates, which only
    * RETURN may hold). */
  private def atom(p: P): Expr = {
    if (p.atKw("case")) { p.eatKw("case"); return caseExpr(p) }
    if (p.atOp("[")) {
      // `[x IN list WHERE pred | proj]` — list comprehension (round
      // 15) — or a plain literal list in expression position
      p.eatOp("[")
      if (p.atOp("(")) {
        // `[(a)-[:R]->(b) WHERE pred | proj]` — pattern comprehension
        val path = pathPat(p)
        val w = if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
                else None
        p.eatOp("|")
        val proj = addExpr(p)
        p.eatOp("]")
        return PatComp(path, w, proj)
      }
      if (p.peek.kind == "ident" && p.peek2.kind == "ident" &&
          p.peek2.s.equalsIgnoreCase("in")) {
        val v = p.ident()
        p.eatKw("in")
        val l = addExpr(p)
        val w = if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
                else None
        val proj = if (p.atOp("|")) { p.eatOp("|"); Some(addExpr(p)) }
                   else None
        p.eatOp("]")
        return ListComp(v, l, w, proj)
      }
      val vals = Vector.newBuilder[Lit]
      if (!p.atOp("]")) {
        vals += literal(p)
        while (p.atOp(",")) { p.eatOp(","); vals += literal(p) }
      }
      p.eatOp("]")
      return ListLit(vals.result())
    }
    // Neo4j-5 brace subqueries: `EXISTS { [MATCH] pattern [WHERE p] }`
    // (semi/anti join in WHERE position) and `COUNT { … }` (sugar for
    // the size of a 1-projecting pattern comprehension — valid where
    // pattern comprehensions are: RETURN/WITH items)
    if (p.peek.kind == "ident" && p.peek2.kind == "op" &&
        p.peek2.s == "{" &&
        Set("exists", "count")(p.peek.s.toLowerCase)) {
      val kind = p.ident().toLowerCase
      p.eatOp("{")
      if (p.atKw("match")) p.eatKw("match")
      val path = pathPat(p)
      val w = if (p.atKw("where")) { p.eatKw("where"); Some(orExpr(p)) }
              else None
      p.eatOp("}")
      return if (kind == "exists") ExistsPat(path, w)
             else StrFn("size", Seq(PatComp(path, w, Lit(1L))))
    }
    if (p.atOp("(")) { p.eatOp("("); val e = orExpr(p); p.eatOp(")"); e }
    else if (p.peek.kind == "ident" && p.peek2.kind == "op" && p.peek2.s == "(") {
      val fname = p.ident().toLowerCase
      p.eatOp("(")
      val e = fname match {
        case "exists" if p.peek.kind == "ident" &&
            p.peek2.kind == "op" && p.peek2.s == "." =>
          // legacy openCypher `exists(n.prop)` — drivers still send it;
          // identical to `n.prop IS NOT NULL`
          val v = p.ident(); p.eatOp(".")
          IsNull(Prop(v, p.ident()), not = true)
        case a if aggNames(a) =>
          // aggregates are expressions (nestable: toString(collect(x)),
          // sum(a)*2); a bare top-level aggregate item normalizes back
          // to Item.agg in returnItem
          if (p.atOp("*")) {
            if (a != "count") fail(p.peek.pos, s"$a(*) is not Cypher")
            p.eatOp("*"); AggFn("count", distinct = false, None)
          } else {
            val d = p.atKw("distinct")
            if (d) p.eatKw("distinct")
            val arg = addExpr(p)
            val extra =
              if (p.atOp(",")) { p.eatOp(","); Some(addExpr(p)) } else None
            val needsExtra = a == "percentilecont" || a == "percentiledisc"
            if (needsExtra && extra.isEmpty)
              fail(p.peek.pos, s"$a() takes (expression, fraction)")
            if (!needsExtra && extra.isDefined)
              fail(p.peek.pos, s"$a() takes one argument")
            AggFn(a, d, Some(arg), extra)
          }
        case "exists" => ExistsPat(linearPat(p))
        case "id" => Id(p.ident())
        case "label" | "labeloffirst" => LabelOf(p.ident())
        case "labels" => LabelsOf(p.ident())
        case k @ ("datetime" | "date") => TemporalFn(k, addExpr(p))
        case "length" => PathLen(p.ident())
        case "nodes" => PathNodes(p.ident())
        case "relationships" => PathRels(p.ident())
        case "duration" =>
          // `duration({days: 1, hours: 2})` — component-map
          // constructor; two-temporal arithmetic is the
          // `duration.between(a, b)` form (parsed in atom's
          // dotted-access branch)
          if (!p.atOp("{")) fail(p.peek.pos,
            "duration() takes a component map {days: …, hours: …}; " +
            "for the interval between two temporals use " +
            "duration.between(a, b)")
          DurMake(propMap(p))
        case "tointeger" => ToInt(atom(p))
        case "tofloat" => ToFloat(atom(p))
        case "coalesce" =>
          Coalesce(argList(p))
        case "type" => TypeOf(p.ident())
        case "keys" => Keys(p.ident())
        case "properties" => PropsOf(p.ident())
        case "reduce" =>
          // reduce(acc = init, x IN list | body) — openCypher fold
          val acc = p.ident()
          p.eatOp("=")
          val init = addExpr(p)
          p.eatOp(",")
          val v = p.ident()
          p.eatKw("in")
          val l = addExpr(p)
          p.eatOp("|")
          Reduce(acc, init, v, l, addExpr(p))
        case q @ ("all" | "any" | "none" | "single") =>
          // all/any/none/single(x IN list WHERE pred) — quantifiers
          val v = p.ident()
          p.eatKw("in")
          val l = addExpr(p)
          p.eatKw("where")
          Quant(q, v, l, orExpr(p))
        case f @ ("tolower" | "toupper" | "trim" | "size" | "tostring" |
                  "substring" | "replace" | "round" | "abs" |
                  "split" | "head" | "last" | "range" |
                  "sqrt" | "floor" | "ceil" | "sign" | "reverse" |
                  "ltrim" | "rtrim" | "left" | "right" | "toboolean") =>
          val args = argList(p)
          val arity = f match {
            case "substring" => 2 to 3
            case "replace" => 3 to 3
            case "round" => 1 to 2
            case "split" => 2 to 2
            case "range" => 2 to 3
            case "left" | "right" => 2 to 2
            case _ => 1 to 1
          }
          if (!arity.contains(args.length))
            fail(p.peek.pos, s"$f() takes ${arity.mkString("-")} arguments")
          StrFn(f, args)
        case other => fail(p.peek.pos, s"unknown function $other()")
      }
      p.eatOp(")")
      e
    } else if (p.peek.kind == "param") {
      Param(p.next().s)
    } else if (p.peek.kind == "ident" &&
               !Set("true", "false", "null").contains(p.peek.s.toLowerCase)) {
      val v = p.ident()
      if (p.atOp(".")) {
        p.eatOp(".")
        val k = p.ident()
        // `duration.between(a, b)` — namespaced temporal function,
        // not property access (a variable literally named `duration`
        // with a `between` prop followed by `(` is shadowed;
        // documented with the DurBetween node)
        if (v.toLowerCase == "duration" && k.toLowerCase == "between" &&
            p.atOp("(")) {
          p.eatOp("(")
          val a = addExpr(p)
          p.eatOp(",")
          val b = addExpr(p)
          p.eatOp(")")
          DurBetween(a, b)
        } else Prop(v, k)
      }
      else if (p.atOp("{")) {
        // map projection `v {.k, alias: expr, .*}` (round 15)
        p.eatOp("{")
        val items = Vector.newBuilder[(String, Option[Expr])]
        var star = false
        def one(): Unit =
          if (p.atOp(".")) {
            p.eatOp(".")
            if (p.atOp("*")) { p.eatOp("*"); star = true }
            else items += ((p.ident(), None))
          } else {
            val a = p.ident()
            p.eatOp(":")
            items += ((a, Some(addExpr(p))))
          }
        if (!p.atOp("}")) {
          one()
          while (p.atOp(",")) { p.eatOp(","); one() }
        }
        p.eatOp("}")
        MapProj(v, items.result(), star)
      }
      else Var(v)
    } else literal(p)
  }

  // ---- RETURN ----------------------------------------------------
  private val aggNames = Set("count", "sum", "min", "max", "avg", "collect",
    "stdev", "stdevp", "percentilecont", "percentiledisc")

  private def returnClause(p: P): Return = {
    val distinct = p.atKw("distinct")
    if (distinct) p.eatKw("distinct")
    val items = Vector.newBuilder[Item]
    items += returnItem(p, items.knownSize)
    while (p.atOp(",")) { p.eatOp(","); items += returnItem(p, items.knownSize) }
    val orderBy = Vector.newBuilder[OrderItem]
    if (p.atKw("order")) {
      p.eatKw("order"); p.eatKw("by")
      def oitem(): OrderItem = {
        // any expression; a bare identifier resolves against the item
        // aliases first (the common `ORDER BY alias` form)
        val k = addExpr(p)
        val asc =
          if (p.atKw("desc")) { p.eatKw("desc"); false }
          else { if (p.atKw("asc")) p.eatKw("asc"); true }
        OrderItem(k, asc)
      }
      orderBy += oitem()
      while (p.atOp(",")) { p.eatOp(","); orderBy += oitem() }
    }
    val skip = if (p.atKw("skip")) {
      p.eatKw("skip")
      p.next() match {
        case Tok("int", s, _) => Some(s.toLong)
        case t => fail(t.pos, "expected integer after SKIP")
      }
    } else None
    val limit = if (p.atKw("limit")) {
      p.eatKw("limit")
      p.next() match {
        case Tok("int", s, _) => Some(s.toLong)
        case t => fail(t.pos, "expected integer after LIMIT")
      }
    } else None
    Return(distinct, items.result(), orderBy.result(), skip, limit)
  }

  private def returnItem(p: P, idx: Int): Item = {
    val item = addExpr(p) match {
      // bare top-level aggregate keeps the Item.agg shape (and its
      // default-alias convention); nested AggFns and two-argument
      // aggregates (percentiles) stay in the tree
      case AggFn(name, dist, arg, None) =>
        Item(arg, Some(name), dist, defaultAlias(name, arg, idx))
      case e =>
        Item(Some(e), None, distinct = false, defaultAlias("", Some(e), idx))
    }
    if (p.atKw("as")) { p.eatKw("as"); item.copy(alias = p.ident()) }
    else item
  }

  /** openCypher names unaliased items by their text; we only need a
    * stable deterministic default (the driver contract aliases every
    * output column explicitly anyway). */
  private def defaultAlias(agg: String, e: Option[Expr], idx: Int): String =
    (agg, e) match {
      case ("", Some(Prop(v, k))) => s"${v}_$k"
      case ("", Some(Var(v))) => v
      case ("", Some(Id(v))) => s"id_$v"
      case ("", Some(LabelOf(v))) => s"label_$v"
      case ("count", None) => "count"
      case (a, Some(Prop(v, k))) if a.nonEmpty => s"${a}_${v}_$k"
      case _ => s"col$idx"
    }
}
