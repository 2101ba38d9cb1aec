package graft.heroql

import Ast._

/** Hand-rolled lexer + recursive-descent parser for HeroQL (grammar per
  * `Kernel/Drafts/draft:103-118` and the samples in
  * `Kernel/README.md:107-234`; zero-dependency by design — the build has
  * no parser-combinator library available offline).
  *
  * Supported surface: `data` declarations, `query` rules with `in`/`out`
  * argument lists, conjunction `,` / disjunction `;` / terminator `.`,
  * atoms with variables, constants and `_`, `exists` / `not exists`,
  * bindings `x <- expr`, pipeline commands `@partition`,
  * `@order_by[_desc]`, `@aggregate(fn(var))`, nested sub-rules
  * `(vars) :- body .`, comparison predicates, and arithmetic expressions
  * with unary minus.
  */
object Parser {

  final case class ParseError(msg: String, pos: Int)
    extends RuntimeException(s"$msg at token $pos")

  // ------------------------------------------------------------- lexer

  sealed trait Tok
  final case class TId(s: String) extends Tok      // identifier or @command
  final case class TNum(s: String) extends Tok
  final case class TStr(s: String) extends Tok
  final case class TIStr(s: String) extends Tok    // $"... $(x) ..." raw body
  final case class TSym(s: String) extends Tok

  private val symbols = Seq(":-", "->", "<-", "<=", ">=", "==", "!=", "::",
    "(", ")", "{", "}", ",", ";", ".", ":", "<", ">", "=", "+", "-", "*", "/",
    "_", "|")

  def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c.isLetter || c == '@') {
        val start = i
        i += 1
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        // dotted identifier = struct/variant field access (`c.r`,
        // `target.belongTo` — `Kernel/Drafts/draft_type:264`): the dot
        // continues the identifier only when a letter follows IMMEDIATELY,
        // so the whitespace-separated rule terminator `.` still lexes as a
        // symbol
        while (i + 1 < n && src(i) == '.' && src(i + 1).isLetter) {
          i += 2
          while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        }
        out += TId(src.substring(start, i))
      } else if (c.isDigit) {
        val start = i
        while (i < n && (src(i).isDigit || src(i) == '.') &&
          // a '.' only continues the number if a digit follows (else it
          // is the rule terminator)
          !(src(i) == '.' && (i + 1 >= n || !src(i + 1).isDigit))) i += 1
        out += TNum(src.substring(start, i))
      } else if (c == '$' && i + 1 < n && src(i + 1) == '"') {
        // `$"... $(x) ..."` interpolated string: capture the raw body,
        // splice parsing happens in the expression parser
        val sb = new StringBuilder
        i += 2
        while (i < n && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < n) { sb += src(i + 1); i += 2 }
          else { sb += src(i); i += 1 }
        }
        if (i >= n) throw ParseError("unterminated interpolated string literal", i)
        i += 1
        out += TIStr(sb.toString)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) { sb += src(i + 1); i += 2 }
          else { sb += src(i); i += 1 }
        }
        if (i >= n) throw ParseError("unterminated string literal", i)
        i += 1
        out += TStr(sb.toString)
      } else {
        symbols.find(s => src.startsWith(s, i)) match {
          case Some(s) => out += TSym(s); i += s.length
          case None => throw ParseError(s"unexpected character '$c'", i)
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------ parser

  /** Parse-time boolean tree (`<BOOLEAN>` grammar,
    * `Kernel/Drafts/draft:104-112`) — normalized into classic Items (or
    * DNF alternatives) before it leaves the parser. */
  private sealed trait B
  private final case class BAtomT(a: Ast.Atom) extends B
  private final case class BScal(e: Ast.Expr) extends B
  private final case class BAnd(l: B, r: B) extends B
  private final case class BOr(l: B, r: B) extends B
  private final case class BNot(x: B) extends B
  private final case class BExists(x: B) extends B
  private final case class BEnsure(x: B) extends B
  private final case class BIf(c: B, t: B, e: Option[B]) extends B

  final class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = toks.lift(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectSym(s: String): Unit = next() match {
      case TSym(`s`) => ()
      case t => throw ParseError(s"expected '$s', got $t", pos - 1)
    }
    def expectId(): String = next() match {
      case TId(s) => s
      case t => throw ParseError(s"expected identifier, got $t", pos - 1)
    }
    /** `Nodes::Node`-style qualified reference (`Kernel/Drafts/draft:185`). */
    def qualifiedId(): String = {
      var n = expectId()
      while (at("::")) { pos += 1; n = n + "::" + expectId() }
      n
    }
    def at(s: String): Boolean = peek.contains(TSym(s))
    def atId(s: String): Boolean = peek.contains(TId(s))
    def eat(s: String): Boolean = { val b = at(s); if (b) pos += 1; b }

    /** Namespace each top-level name was declared in (name → ns, "" for
      * the root); feeds reference resolution. */
    val declNs = scala.collection.mutable.Map.empty[String, String]
    /** `using namespace N;` directives (`Kernel/Drafts/draft:168-197`). */
    val usings = scala.collection.mutable.ListBuffer.empty[String]

    def program(): Program = {
      val datas = Seq.newBuilder[DataDecl]
      val queries = Seq.newBuilder[QueryDecl]
      val unions = Seq.newBuilder[UnionDecl]
      val transactions = Seq.newBuilder[TransactionDecl]
      val fors = Seq.newBuilder[ForQuery]
      val indexes = Seq.newBuilder[IndexDecl]
      val globals = Seq.newBuilder[(String, Lit)]
      val instDecls = Seq.newBuilder[(String, String)]
      val procedures = Seq.newBuilder[ProcedureDecl]
      val funcs = scala.collection.mutable.LinkedHashMap.empty[String, FuncDecl]
      // `package NAME using P1, P2;` header — the rest of the text is the
      // package body (`Kernel/README.md:256-264`)
      val pkg = if (atId("package")) {
        pos += 1
        val name = expectId()
        val uses = Seq.newBuilder[String]
        if (atId("using")) {
          pos += 1
          uses += expectId()
          while (eat(",")) uses += expectId()
        }
        expectSym(";")
        Some(PackageHeader(name, uses.result()))
      } else None
      def qual(ns: String, n: String) = if (ns.isEmpty) n else s"$ns::$n"
      /** One declaration at namespace `ns`; `namespace N { ... }` nests
        * (`Kernel/Drafts/draft:168-170` "namespace can be nested"). */
      def decl(ns: String): Unit = {
        // `public` marks the next query/transaction as package-visible
        val pub = atId("public")
        if (pub) pos += 1
        def reg(n: String): String = { declNs(n) = ns; n }
        peek match {
          case Some(TId("namespace")) =>
            pos += 1
            val inner = qual(ns, expectId())
            expectSym("{")
            while (!at("}")) decl(inner)
            expectSym("}")
          case Some(TId("using")) =>
            pos += 1
            if (!atId("namespace")) throw ParseError("expected 'namespace' after 'using'", pos)
            pos += 1
            usings += qualifiedId()
            if (!eat(";")) expectSym(".")
          case Some(TId("data")) =>
            val d = dataDecl()
            datas += d.copy(name = reg(qual(ns, d.name)))
          case Some(TId("union")) =>
            val u = unionDecl()
            unions += u.copy(name = reg(qual(ns, u.name)))
          case Some(TId("query")) | Some(TId("cached")) =>
            val q = queryDecl().copy(isPublic = pub)
            queries += q.copy(name = reg(qual(ns, q.name)))
          case Some(TId("let")) =>
            val q = letDecl()
            queries += q.copy(name = reg(qual(ns, q.name)))
          case Some(TId("index")) =>
            val ix = indexDecl()
            // target resolves like any reference from this namespace
            indexes += ix.copy(target = qual(ns, ix.target))
          case Some(TId("transaction")) =>
            val t = transactionDecl().copy(isPublic = pub)
            transactions += t.copy(name = reg(qual(ns, t.name)))
          case Some(TId("procedure")) =>
            val p = procedureDecl().copy(isPublic = pub)
            procedures += p.copy(name = reg(qual(ns, p.name)))
          case Some(TId("for")) => fors += forQuery()
          case Some(TId("func")) =>
            val f = funcDecl()
            val qn = reg(qual(ns, f.name))
            funcs(qn) = f.copy(name = qn)
          case Some(TId("case")) =>
            val (name, c) = funcCase()
            // the clause attaches to the func resolved from this namespace
            val qn = Seq(qual(ns, name), name).find(funcs.contains).getOrElse(
              throw ParseError(s"case for undeclared func $name", pos))
            funcs(qn) = funcs(qn).copy(cases = funcs(qn).cases :+ c)
          // global readonly value (`Kernel/README.md:247-249`):
          // `Zero <- 0.` constant, or `Students <- new StudentPackage.`
          // package-instance binding
          case Some(TId(n)) if !n.startsWith("@") &&
              toks.lift(pos + 1).contains(TSym("<-")) =>
            pos += 2
            if (atId("new")) {
              pos += 1
              val pkgName = expectId()
              if (!eat(";")) expectSym(".")
              instDecls += (reg(qual(ns, n)) -> pkgName)
            } else {
              val e = exprP()
              if (!eat(";")) expectSym(".")
              globals += (reg(qual(ns, n)) -> foldConst(e))
            }
          case t => throw ParseError(
            s"expected a declaration ('data', 'query', 'let', 'transaction', 'for', 'func', 'case', 'namespace', ...), got $t", pos)
        }
      }
      while (peek.isDefined) decl("")
      // global readonly values are DECLARATIONS: a name may bind once
      // (readonly — `Kernel/README.md:247`), and may not reuse a name
      // the program already declares as a relation, function, or union
      // (which occurrence an atom means would be ambiguous)
      val globalNames = globals.result().map(_._1) ++ instDecls.result().map(_._1)
      globalNames.diff(globalNames.distinct).distinct.headOption.foreach(d =>
        throw ParseError(s"global readonly value $d bound more than once", pos))
      val declared = (datas.result().map(_.name) ++ queries.result().map(_.name)
        ++ unions.result().map(_.name) ++ funcs.keys).toSet
      globalNames.find(declared.contains).foreach(d =>
        throw ParseError(
          s"global readonly value $d collides with a declaration of the same name", pos))
      Program(datas.result(), queries.result(), funcs.values.toSeq,
        unions.result(), transactions.result(), fors.result(), pkg,
        indexes.result(), globals.result(), procedures.result(),
        instDecls.result())
    }

    /** Global readonly values are CONSTANTS (`Kernel/README.md:248`
      * "`Zero <- 0.`: Constants") — fold the right-hand side now. */
    private def foldConst(e: Expr): Lit = e match {
      case ELit(l) => l
      case EUnary("-", x) => foldConst(x) match {
        case LInt(v) => LInt(-v)
        case LDouble(v) => LDouble(-v)
        case other => throw ParseError(s"cannot negate $other in a global value", pos)
      }
      case EBinary(op, l, r) =>
        (op, foldConst(l), foldConst(r)) match {
          case ("+", LInt(a), LInt(b)) => LInt(a + b)
          case ("-", LInt(a), LInt(b)) => LInt(a - b)
          case ("*", LInt(a), LInt(b)) => LInt(a * b)
          case ("+", LString(a), LString(b)) => LString(a + b)
          case (o, a, b) =>
            def num(x: Lit): Double = x match {
              case LInt(v) => v.toDouble
              case LDouble(v) => v
              case other => throw ParseError(s"non-numeric global operand $other", pos)
            }
            o match {
              case "+" => LDouble(num(a) + num(b))
              case "-" => LDouble(num(a) - num(b))
              case "*" => LDouble(num(a) * num(b))
              case "/" => LDouble(num(a) / num(b))
              case other => throw ParseError(s"unknown operator $other in global value", pos)
            }
        }
      case other => throw ParseError(
        s"global readonly values must be constants, got $other", pos)
    }

    private[heroql] def namespaceContext: (Map[String, String], Seq[String]) =
      (declNs.toMap, usings.toList)

    /** `index Name { Hash(col) Ordered(col, col2) ... }`
      * (`Kernel/README.md:62-74,142-157`). */
    def indexDecl(): IndexDecl = {
      expectId() // index
      val target = expectId()
      expectSym("{")
      val specs = Seq.newBuilder[(String, Seq[String])]
      while (!at("}")) {
        val kind = expectId()
        expectSym("(")
        val cols = Seq.newBuilder[String]
        var first = true
        while (!at(")")) {
          if (!first) expectSym(",")
          first = false
          cols += expectId()
        }
        expectSym(")")
        specs += (kind -> cols.result())
      }
      expectSym("}")
      if (!eat(";")) { eat("."); () }
      IndexDecl(target, specs.result())
    }

    /** `let Name = query (arg1, arg2) :- body .`
      * (`Kernel/Drafts/draft:144`) — a named query whose args take the
      * anonymous untyped form (`draft:92-96`); equivalent to a `query`
      * declaration with inferred head types. */
    def letDecl(): QueryDecl = {
      expectId() // let
      val name = expectId()
      expectSym("=")
      if (!atId("query")) throw ParseError("expected 'query' after 'let NAME ='", pos)
      pos += 1
      expectSym("(")
      val args = looseArgList()
      expectSym(")")
      expectSym(":-")
      val b = body()
      expectSym(".")
      QueryDecl(name, args, Seq.empty, b)
    }

    /** `transaction query Name(args) :- prefix items, @mutations .`
      * (`Kernel/README.md:251-254`). */
    def transactionDecl(): TransactionDecl = {
      expectId() // transaction
      // optional scheduling class: `transaction(9) query ...`
      val importance = if (eat("(")) {
        val v = next() match {
          case TNum(s) if !s.contains('.') => s.toInt
          case t => throw ParseError(s"expected integer importance, got $t", pos - 1)
        }
        expectSym(")")
        v
      } else 0
      if (!atId("query")) throw ParseError(
        "expected 'query' after 'transaction'", pos)
      pos += 1
      val name = expectId()
      expectSym("(")
      val args = looseArgList()
      expectSym(")")
      expectSym(":-")
      val items = conj().items
      expectSym(".")
      if (!items.exists(_.isInstanceOf[Mutation]))
        throw ParseError(s"transaction query $name has no mutation statements", pos)
      TransactionDecl(name, args, items, importance = importance)
    }

    /** `procedure Name(arg: type, ...) { stmt; stmt; ... }` — the
      * reference's reserved-but-unspecified procedure form
      * (`Kernel/README.md:9,20`; see [[Ast.ProcedureDecl]]). Each
      * statement is a transaction-shaped conjunction terminated by
      * `;`; at least one statement must mutate (a procedure that only
      * reads would be a query). */
    def procedureDecl(): ProcedureDecl = {
      expectId() // procedure
      val name = expectId()
      rejectReservedName("procedure", name)
      expectSym("(")
      val args = looseArgList()
      expectSym(")")
      expectSym("{")
      val stmts = Seq.newBuilder[Conj]
      while (!at("}")) {
        val items = conj().items
        expectSym(";")
        stmts += Conj(items)
      }
      expectSym("}")
      val result = stmts.result()
      if (result.isEmpty)
        throw ParseError(s"procedure $name has an empty body", pos)
      if (!result.exists(_.items.exists(_.isInstanceOf[Mutation])))
        throw ParseError(
          s"procedure $name has no mutation statements — use 'query' for reads", pos)
      ProcedureDecl(name, args, result)
    }

    /** `for query(vars) :- body ( set T(...); remove T(...); ... )`
      * (`Kernel/Drafts/draft:138-142`). */
    def forQuery(): ForQuery = {
      expectId() // for
      if (!atId("query")) throw ParseError("expected 'query' after 'for'", pos)
      pos += 1
      expectSym("(")
      val vars = Seq.newBuilder[String]
      var first = true
      while (!at(")")) {
        if (!first) expectSym(",")
        first = false
        vars += expectId()
      }
      expectSym(")")
      expectSym(":-")
      val b = body()
      expectSym("(")
      val actions = Seq.newBuilder[Mutation]
      var more = true
      while (more && !at(")")) {
        val kw = expectId()
        val kind = kw match {
          case "set" => "insert"
          case "remove" => "remove"
          case "update" => "update"
          case other => throw ParseError(s"unknown for-body action $other", pos)
        }
        actions += Mutation(kind, atomItem())
        more = eat(";")
      }
      expectSym(")")
      // terminator optional: the draft's sample (`draft:138-142`) ends at
      // the closing paren
      if (!eat(";")) { eat("."); () }
      ForQuery(vars.result(), b, actions.result())
    }

    /** Arg list accepting both typed `n : T` and untyped `n` entries
      * (untyped = the anonymous-query form; empty type string). */
    private def looseArgList(): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var first = true
      while (!at(")")) {
        if (!first) expectSym(",")
        first = false
        val n = expectId()
        if (eat(":")) out += (n -> expectId()) else out += (n -> "")
      }
      out.result()
    }

    /** `union Shape = Circle(r: double) | Rect(w: double, h: double) | Point.` */
    def unionDecl(): UnionDecl = {
      expectId() // union
      val name = expectId()
      rejectReservedName("union type", name)
      expectSym("=")
      def variant(): UnionVariant = {
        val vn = expectId()
        rejectReservedName("union variant", vn)
        val fields = if (eat("(")) { val f = argList(); expectSym(")"); f }
        else Seq.empty
        UnionVariant(vn, fields)
      }
      val variants = Seq.newBuilder[UnionVariant]
      variants += variant()
      while (eat("|")) variants += variant()
      if (!eat(";")) expectSym(".")
      UnionDecl(name, variants.result())
    }

    /** `func Name(in a, out b);` — modes default to `in`
      * (`Kernel/Drafts/draft:75-79`). */
    /** Builtin scalar names are reserved words of the expression grammar
      * (`fingerprint(x)` parses as a call wherever it appears) — a
      * declaration reusing one would silently change the meaning of its
      * own atoms and fail later with a confusing arity/type error, so
      * reject it here with the real diagnosis. */
    private def rejectReservedName(kind: String, name: String): Unit =
      if (Builtins.scalar(name)) throw ParseError(
        s"'$name' is a reserved builtin scalar function name and cannot " +
          s"be declared as a $kind", pos - 1)

    def funcDecl(): FuncDecl = {
      expectId() // func
      val name = expectId()
      rejectReservedName("func", name)
      expectSym("(")
      val params = Seq.newBuilder[(String, String)]
      var first = true
      while (!at(")")) {
        if (!first) expectSym(",")
        first = false
        val a = expectId()
        if (a == "in" || a == "out") params += (a -> expectId())
        else params += ("in" -> a)
        // optional declared type (`in s : Shape` — draft_type:216): the
        // engine dispatches on case-level runtime-type patterns, so the
        // declaration-level annotation is parsed and not stored
        if (eat(":")) expectId()
      }
      expectSym(")")
      if (!eat(";")) expectSym(".")
      FuncDecl(name, params.result(), Seq.empty)
    }

    /** `case Name(pat, ...) [:- guards] ;` (`Kernel/Drafts/draft:81-89`). */
    def funcCase(): (String, FuncCase) = {
      expectId() // case
      val a = atomItem()
      val guards =
        if (eat(":-")) conj().items
        else Seq.empty
      if (!eat(";")) expectSym(".")
      (a.rel, FuncCase(a.args, guards))
    }

    def dataDecl(): DataDecl = {
      expectId() // data
      val name = expectId()
      rejectReservedName("data relation", name)
      expectSym("(")
      val fields = argList()
      expectSym(")")
      expectSym(".")
      DataDecl(name, fields)
    }

    private def argList(): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var first = true
      while (!at(")")) {
        if (!first) expectSym(",")
        first = false
        val n = expectId()
        expectSym(":")
        out += (n -> expectId())
      }
      out.result()
    }

    def queryDecl(): QueryDecl = {
      val cached = peek.contains(TId("cached"))
      if (cached) { next(); () } // `cached query ...`
      expectId() // query
      val name = expectId()
      rejectReservedName("query", name)
      expectSym("(")
      val inArgs = argList()
      expectSym(")")
      val outArgs = if (eat("->")) {
        expectSym("("); val a = argList(); expectSym(")"); a
      } else Seq.empty
      expectSym(":-")
      val b = body()
      expectSym(".")
      QueryDecl(name, inArgs, outArgs, b, cached)
    }

    def body(): Body = {
      val alts = Seq.newBuilder[Conj]
      alts ++= conjAlts()
      while (eat(";")) alts ++= conjAlts()
      Body(alts.result())
    }

    /** One `,`-conjunction (`<BOOLEAN> ::= <OR> {"," <OR>}` — the comma
      * binds LOOSER than `or`, which binds looser than `and`,
      * `Kernel/Drafts/draft:104-107`). `or` branches containing relation
      * atoms expand to disjunctive normal form — a cross product of
      * branch choices — so they ride the rule's existing `;`-union
      * planning (J2) instead of needing union-mid-conjunction plans. */
    def conjAlts(): Seq[Conj] = {
      var alts: Seq[Vector[Item]] = Seq(Vector.empty)
      var first = true
      while (first || eat(",")) {
        first = false
        val elem = element()
        alts = for { a <- alts; e <- elem } yield a ++ e
      }
      alts.map(items => Conj(items))
    }

    /** Single-alternative conjunction — contexts where DNF expansion has
      * nowhere to go (func-case guards, collection_query bodies). */
    def conj(): Conj = conjAlts() match {
      case Seq(c) => c
      case _ => throw ParseError(
        "'or' over relation atoms is not supported in this context", pos)
    }

    // ------------------------------------------- collection_query form

    def collectionQuery(): CollectionQuery = {
      if (!atId("collection_query"))
        throw ParseError("expected 'collection_query'", pos)
      pos += 1
      expectSym("(")
      val head = Seq.newBuilder[String]
      var first = true
      while (!at(")")) {
        if (!first) expectSym(",")
        first = false
        next() match {
          case TId(v) => head += v
          case TSym("_") => head += "_"
          case t => throw ParseError(s"bad head term $t", pos - 1)
        }
      }
      expectSym(")")
      expectSym(":-")
      val bodyConj = conj()
      def stage(kw: String): Option[CqStage] =
        if (atId(kw)) {
          pos += 1
          val key = expectId()
          expectSym("(")
          val items = Seq.newBuilder[CqItem]
          var f = true
          while (!at(")")) {
            if (!f) expectSym(",")
            f = false
            val n = expectId()
            if (eat("=")) {
              val fn = expectId()
              expectSym("(")
              val arg = exprP()
              val k = if (eat(",")) next() match {
                case TNum(s) => Some(s.toLong)
                case t => throw ParseError(s"expected k, got $t", pos - 1)
              } else None
              expectSym(")")
              items += CqBind(n, fn, arg, k)
            } else items += CqVar(n)
          }
          expectSym(")")
          Some(CqStage(key, items.result()))
        } else None
      val pb = stage("partition_by")
      val gb = stage("group_by")
      // `range_agg Rel(ts[, val]) within W of probeVar (out = Count(ts)
      // [, out2 = Sum(val)])` — the segment-tree interval aggregate
      val ra = if (atId("range_agg")) {
        pos += 1
        val rel = expectId()
        expectSym("(")
        val tsVar = expectId()
        val valVar = if (eat(",")) Some(expectId()) else None
        expectSym(")")
        if (!atId("within")) throw ParseError("expected 'within' in range_agg", pos)
        pos += 1
        val w = next() match {
          case TNum(s) => s.toLong
          case t => throw ParseError(s"expected window width, got $t", pos - 1)
        }
        if (!atId("of")) throw ParseError("expected 'of' in range_agg", pos)
        pos += 1
        val probeVar = expectId()
        expectSym("(")
        val binds = Seq.newBuilder[CqBind]
        var f = true
        while (!at(")")) {
          if (!f) expectSym(",")
          f = false
          val n = expectId()
          expectSym("=")
          val fn = expectId()
          expectSym("(")
          val arg = exprP()
          expectSym(")")
          binds += CqBind(n, fn, arg, None)
        }
        expectSym(")")
        Some(RangeAggStage(rel, tsVar, valVar, w, probeVar, binds.result()))
      } else None
      // `semantic_dedup(idVar, vecVar) threshold 0.4
      //    as (cluster_id, dup_of, max_cos)` — the layered SemDeDup
      // pipeline stage (fixed output triple, renamed by the `as` list)
      val sd = if (atId("semantic_dedup")) {
        pos += 1
        expectSym("(")
        val idVar = expectId()
        expectSym(",")
        val vecVar = expectId()
        expectSym(")")
        // optional `against Corpus(idField, vecField)` — incremental
        // batch-vs-corpus form (corpus-artifact centroids)
        val against = if (atId("against")) {
          pos += 1
          val rel = expectId()
          expectSym("(")
          val f1 = expectId()
          expectSym(",")
          val f2 = expectId()
          expectSym(")")
          Some((rel, f1, f2))
        } else None
        if (!atId("threshold"))
          throw ParseError("expected 'threshold' in semantic_dedup", pos)
        pos += 1
        val tau = next() match {
          case TNum(s) => s.toDouble
          case t => throw ParseError(s"expected threshold value, got $t", pos - 1)
        }
        if (!atId("as"))
          throw ParseError("expected 'as' in semantic_dedup", pos)
        pos += 1
        expectSym("(")
        val c = expectId(); expectSym(",")
        val dof = expectId(); expectSym(",")
        val mc = expectId()
        expectSym(")")
        Some(SemanticDedupStage(idVar, vecVar, tau, c, dof, mc, against))
      } else None
      // `nearest(idVar, vecVar) k 5 [probes 20]
      //    as (probe_id, neighbor_id, cos_sim, rank)` — index-backed
      // ANN top-k (fixed output quadruple, renamed by the `as` list)
      val nst = if (atId("nearest")) {
        pos += 1
        expectSym("(")
        val idVar = expectId()
        expectSym(",")
        val vecVar = expectId()
        expectSym(")")
        // optional `for Probes(idField, vecField)` — explicit probe
        // relation (otherwise the first-`probes`-ids convention)
        val forRel = if (atId("for")) {
          pos += 1
          val rel = expectId()
          expectSym("(")
          val f1 = expectId()
          expectSym(",")
          val f2 = expectId()
          expectSym(")")
          Some((rel, f1, f2))
        } else None
        if (!atId("k")) throw ParseError("expected 'k' in nearest", pos)
        pos += 1
        val k = next() match {
          case TNum(s) if !s.contains('.') => s.toInt
          case t => throw ParseError(s"expected integer k, got $t", pos - 1)
        }
        val np = if (atId("probes")) {
          if (forRel.nonEmpty) throw ParseError(
            "'probes N' and 'for Rel(...)' are mutually exclusive in nearest", pos)
          pos += 1
          next() match {
            case TNum(s) if !s.contains('.') => s.toInt
            case t => throw ParseError(s"expected integer probe count, got $t", pos - 1)
          }
        } else 20
        if (!atId("as")) throw ParseError("expected 'as' in nearest", pos)
        pos += 1
        expectSym("(")
        val p = expectId(); expectSym(",")
        val nb = expectId(); expectSym(",")
        val cs = expectId(); expectSym(",")
        val rk = expectId()
        expectSym(")")
        Some(NearestStage(idVar, vecVar, k, np, p, nb, cs, rk, forRel))
      } else None
      // `near_dedup(idVar, textVar) [against Rel(idF, textF)]
      //    threshold 0.25 as (...)` — layered MinHash-LSH keeper
      // election (self form, output triple) or batch-vs-corpus pair
      // detection (against form, output pair)
      val nd = if (atId("near_dedup")) {
        pos += 1
        expectSym("(")
        val idVar = expectId()
        expectSym(",")
        val textVar = expectId()
        expectSym(")")
        val against = if (atId("against")) {
          pos += 1
          val rel = expectId()
          expectSym("(")
          val f1 = expectId()
          expectSym(",")
          val f2 = expectId()
          expectSym(")")
          Some((rel, f1, f2))
        } else None
        if (!atId("threshold"))
          throw ParseError("expected 'threshold' in near_dedup", pos)
        pos += 1
        val tau = next() match {
          case TNum(s) => s.toDouble
          case t => throw ParseError(s"expected threshold value, got $t", pos - 1)
        }
        if (!atId("as"))
          throw ParseError("expected 'as' in near_dedup", pos)
        pos += 1
        expectSym("(")
        val outs = Seq.newBuilder[String]
        var f = true
        while (!at(")")) {
          if (!f) expectSym(",")
          f = false
          outs += expectId()
        }
        expectSym(")")
        Some(NearDedupStage(idVar, textVar, tau, outs.result(), against))
      } else None
      val having = if (eat(":-")) Some(comparison().asInstanceOf[Compare]) else None
      val ob =
        if (atId("order_by_desc")) { pos += 1; Some((exprP(), true)) }
        else if (atId("order_by")) { pos += 1; Some((exprP(), false)) }
        else None
      val rb = if (atId("range_by")) {
        pos += 1
        val a = next() match { case TNum(s) => s.toLong; case t => throw ParseError(s"bad range $t", pos - 1) }
        expectSym("."); expectSym(".")
        val b = next() match { case TNum(s) => s.toLong; case t => throw ParseError(s"bad range $t", pos - 1) }
        Some((a, b))
      } else None
      expectSym(";")
      CollectionQuery(head.result(), bodyConj, pb, gb, having, ob, rb, ra, sd,
        nst, nd)
    }

    /** One comma-element of a conjunction → its DNF alternatives (each a
      * sequence of Items; usually exactly one alternative). */
    private def element(): Seq[Vector[Item]] = peek match {
      case Some(TSym("(")) if subQueryAhead() => Seq(Vector(subQuery()))
      case Some(TId("where")) =>
        pos += 1
        normB(orTree())
      case Some(TId(id)) if id.startsWith("@") => Seq(Vector(pipelineCommand()))
      case Some(TId(name)) if !name.startsWith("@") &&
          toks.lift(pos + 1).contains(TSym("<-")) =>
        pos += 2
        peek match {
          case Some(TId(cmd)) if cmd.startsWith("@") =>
            pos += 1
            val desc = cmd == "@order_by_desc"
            if (cmd != "@order_by" && cmd != "@order_by_desc")
              throw ParseError(s"unknown command $cmd in binding", pos)
            expectSym("(")
            val key = exprP()
            expectSym(")")
            Seq(Vector(RankBinding(name, key, desc)))
          case _ => Seq(Vector(Binding(name, exprP())))
        }
      case _ => normB(orTree())
    }

    /** Lookahead: `(` id {"," id} `)` `:-` is a sub-rule head, anything
      * else starting with `(` is a parenthesized boolean. */
    private def subQueryAhead(): Boolean = {
      var j = pos + 1
      var wellFormed = true
      while (wellFormed && !toks.lift(j).contains(TSym(")"))) {
        toks.lift(j) match {
          case Some(TId(_)) | Some(TSym(",")) => j += 1
          case _ => wellFormed = false
        }
      }
      wellFormed && toks.lift(j + 1).contains(TSym(":-"))
    }

    /** Legacy single-item entry (func guards etc.): an element that must
      * lower to exactly one Item. */
    def item(): Item = element() match {
      case Seq(Vector(i)) => i
      case _ => throw ParseError("expected a single body item here", pos)
    }

    // ---------------- boolean grammar (`Kernel/Drafts/draft:104-112`)
    //
    // <OR>           ::= <AND> {"or" <AND>}
    // <AND>          ::= <BOOLEAN-PRIM> {"and" <BOOLEAN-PRIM>}
    // <BOOLEAN-PRIM> ::= atom | comparison
    //                  | "if" <B> "then" <B> ["else" <B>]
    //                  | ("not" | "exists" | "ensure") <BOOLEAN-PRIM>
    //                  | "(" <BOOLEAN> ")"

    private def orTree(): B = {
      var e = andTree()
      while (atId("or")) { pos += 1; e = BOr(e, andTree()) }
      e
    }
    private def andTree(): B = {
      var e = boolPrim()
      while (atId("and")) { pos += 1; e = BAnd(e, boolPrim()) }
      e
    }
    /** Inside parens the comma-conjunction is unambiguous — parse it. */
    private def commaTree(): B = {
      var e = orTree()
      while (eat(",")) e = BAnd(e, orTree())
      e
    }
    private def boolPrim(): B = peek match {
      case Some(TId("not")) => pos += 1; BNot(boolPrim())
      case Some(TId("exists")) => pos += 1; BExists(boolPrim())
      case Some(TId("ensure")) => pos += 1; BEnsure(boolPrim())
      case Some(TId("if")) =>
        pos += 1
        // divergence from the sketch: branches parse at <OR> level (the
        // draft's comma-greedy <BOOLEAN> would swallow the enclosing
        // conjunction's commas); parenthesize to conjoin inside a branch
        val c = orTree()
        if (!atId("then")) throw ParseError("expected 'then'", pos)
        pos += 1
        val t = orTree()
        val e = if (atId("else")) { pos += 1; Some(orTree()) } else None
        BIf(c, t, e)
      case Some(TSym("(")) =>
        // `(a+b) > 3` is a comparison whose left side parenthesizes an
        // arithmetic expression; `(A(x) or p > 1)` is a grouped boolean.
        // Try the comparison first, backtrack to the boolean on failure.
        val save = pos
        try BScal(comparisonExpr())
        catch {
          case _: ParseError =>
            pos = save
            expectSym("(")
            val b = commaTree()
            expectSym(")")
            b
        }
      case Some(TId(name)) if !name.startsWith("@") && name != "true" &&
          name != "false" && !Builtins.scalar(name) &&
          (toks.lift(pos + 1).contains(TSym("(")) ||
            toks.lift(pos + 1).contains(TSym("::"))) =>
        BAtomT(atomItem())
      case _ => BScal(comparisonExpr())
    }

    private def comparisonExpr(): Expr = {
      val l = exprP()
      // `x in (e1, e2, ...)` — membership list (the IN-probe surface)
      if (atId("in")) {
        pos += 1
        expectSym("(")
        val elems = Seq.newBuilder[Expr]
        var first = true
        while (!at(")")) {
          if (!first) expectSym(",")
          first = false
          elems += exprP()
        }
        expectSym(")")
        val es = elems.result()
        if (es.isEmpty) throw ParseError("empty `in` list", pos - 1)
        return EIn(l, es)
      }
      val op = next() match {
        case TSym(o) if Seq("<", "<=", ">", ">=", "==", "!=", "=").contains(o) => o
        case t => throw ParseError(s"expected comparison operator, got $t", pos - 1)
      }
      ECmp(if (op == "=") "==" else op, l, exprP())
    }

    /** Pure-scalar subtree → one boolean Expr (None when atoms occur). */
    private def scalarOf(b: B): Option[Expr] = b match {
      case BScal(e) => Some(e)
      case BAnd(l, r) => for { a <- scalarOf(l); c <- scalarOf(r) } yield EAnd(a, c)
      case BOr(l, r) => for { a <- scalarOf(l); c <- scalarOf(r) } yield EOr(a, c)
      case BNot(x) => scalarOf(x).map(ENot)
      case BExists(x) => scalarOf(x) // exists over a scalar adds nothing
      case BIf(c, t, e) =>
        for {
          cc <- scalarOf(c)
          tc <- scalarOf(t)
          ec <- e match {
            case None => Some(None)
            case Some(x) => scalarOf(x).map(Some(_))
          }
        } yield EIf(cc, tc, ec)
      case _ => None
    }

    /** Lower a boolean tree to DNF alternatives of classic Items. */
    private def normB(b: B): Seq[Vector[Item]] = scalarOf(b) match {
      case Some(ECmp(op, l, r)) => Seq(Vector(Compare(op, l, r)))
      case Some(e) => Seq(Vector(Filter(e)))
      case None => b match {
        case BAtomT(a) => Seq(Vector(a))
        case BAnd(l, r) => for { x <- normB(l); y <- normB(r) } yield x ++ y
        case BOr(l, r) => normB(l) ++ normB(r)
        case BNot(BExists(BAtomT(a))) => Seq(Vector(Negation(a)))
        case BNot(BAtomT(a)) => Seq(Vector(Negation(a)))
        case BExists(BAtomT(a)) => Seq(Vector(Existence(a)))
        case BEnsure(x) => scalarOf(x) match {
          case Some(e) => Seq(Vector(Ensure(e)))
          case None => throw ParseError(
            "ensure requires a scalar condition (no relation atoms)", pos)
        }
        case BIf(c, t, e) => scalarOf(c) match {
          case Some(ce) =>
            // atoms in a branch: (C and T) ; (not C [and E]) on the union path
            val thenAlts = normB(t).map(Filter(ce) +: _)
            val elseAlts = e match {
              case Some(eb) => normB(eb).map(Filter(ENot(ce)) +: _)
              case None => Seq(Vector(Filter(ENot(ce)): Item))
            }
            thenAlts ++ elseAlts
          case None => throw ParseError(
            "if-condition must be scalar (no relation atoms)", pos)
        }
        case other => throw ParseError(s"unsupported boolean form $other", pos)
      }
    }

    private def pipelineCommand(): Item = {
      val cmd = expectId()
      cmd match {
        case "@insert" | "@update" | "@remove" | "@remove_mor" =>
          Mutation(cmd.drop(1), atomItem())
        case "@partition" =>
          expectSym("(")
          val vars = Seq.newBuilder[String]
          var first = true
          while (!at(")")) {
            if (!first) expectSym(",")
            first = false
            vars += expectId()
          }
          expectSym(")")
          Partition(vars.result())
        case "@aggregate" =>
          expectSym("(")
          val fn = expectId()
          expectSym("(")
          val v = expectId()
          // optional second VARIABLE, then optional literal quantile
          // points (numbers only — `approx_quantile(rid, v, 0.95)`)
          var v2: Option[String] = None
          val qs = Seq.newBuilder[Double]
          var sawNum = false
          while (at(",")) {
            expectSym(",")
            next() match {
              case TNum(s) => sawNum = true; qs += s.toDouble
              case TId(s) if v2.isEmpty && !sawNum => v2 = Some(s)
              case t => throw ParseError(
                s"bad @aggregate argument $t (variables before quantile literals)",
                pos - 1)
            }
          }
          expectSym(")")
          expectSym(")")
          Aggregate(fn, v, v2, qs.result())
        case other => throw ParseError(s"unknown pipeline command $other", pos)
      }
    }

    private def subQuery(): SubQuery = {
      expectSym("(")
      val vars = Seq.newBuilder[String]
      var first = true
      while (!at(")")) {
        if (!first) expectSym(",")
        first = false
        vars += expectId()
      }
      expectSym(")")
      expectSym(":-")
      val b = body()
      expectSym(".")
      SubQuery(vars.result(), b)
    }

    private def atomItem(): Atom = {
      val rel = qualifiedId()
      expectSym("(")
      val args = Seq.newBuilder[Term]
      var first = true
      while (!at(")")) {
        if (!first) expectSym(",")
        first = false
        val save = pos
        val t = term()
        // `Fib(i-1, a)`: an arithmetic operator after a simple term means
        // the argument is a computed expression — reparse with the full
        // expression grammar (`Kernel/Drafts/draft:85-89`)
        if (at("+") || at("-") || at("*") || at("/")) {
          pos = save
          args += TExpr(exprP())
        } else args += t
      }
      expectSym(")")
      Atom(rel, args.result())
    }

    private def term(): Term = next() match {
      case TSym("_") => TWildcard
      case TId("true") => TConst(LBool(true))
      case TId("false") => TConst(LBool(false))
      case TId(v) if v.startsWith("@") => TAtVar(v.drop(1))
      case TId(v) if at(":") => // `x : Variant` runtime-type pattern
        expectSym(":"); TTyped(v, expectId())
      case TId(v) => TVar(v)
      case TNum(s) => TConst(numLit(s))
      case TStr(s) => TConst(LString(s))
      case TSym("-") => next() match {
        case TNum(s) => TConst(negate(numLit(s)))
        case t => throw ParseError(s"expected number after '-', got $t", pos - 1)
      }
      case t => throw ParseError(s"bad term $t", pos - 1)
    }

    // one operator list (comparisonExpr's); a new operator can't drift
    // between the Item and Expr forms
    private def comparison(): Item = comparisonExpr() match {
      case ECmp(op, l, r) => Compare(op, l, r)
      case other => throw ParseError(s"expected comparison, got $other", pos - 1)
    }

    // expression grammar: addSub ::= mulDiv (('+'|'-') mulDiv)*
    def exprP(): Expr = {
      var e = mulDiv()
      while (at("+") || at("-")) {
        val op = next().asInstanceOf[TSym].s
        e = EBinary(op, e, mulDiv())
      }
      e
    }
    private def mulDiv(): Expr = {
      var e = unary()
      while (at("*") || at("/")) {
        val op = next().asInstanceOf[TSym].s
        e = EBinary(op, e, unary())
      }
      e
    }
    private def unary(): Expr =
      if (eat("-")) EUnary("-", unary())
      else primary()
    private def primary(): Expr = next() match {
      case TSym("(") => val e = exprP(); expectSym(")"); e
      // `if <comparison> then <expr> [else <expr>]` in EXPRESSION
      // position (binding right-hand sides) — the boolean grammar's
      // BIf covers where-contexts; this covers `x <- if ...`. The
      // condition is a comparison or IN (the func-guard style);
      // `if` is reserved in expression position, as in the boolean
      // grammar.
      case TId("if") =>
        val c = comparisonExpr()
        if (!atId("then"))
          throw ParseError("expected 'then' in if-expression", pos)
        pos += 1
        val t = exprP()
        val el = if (atId("else")) { pos += 1; Some(exprP()) } else None
        EIf(c, t, el)
      case TId("true") => ELit(LBool(true))
      case TId("false") => ELit(LBool(false))
      case TId(v0) =>
        var v = v0
        while (at("::")) { pos += 1; v = v + "::" + expectId() } // Ns::Name
        if (Builtins.scalar(v) && at("(")) { // builtin scalar call
          expectSym("(")
          val args = Seq.newBuilder[Expr]
          var first = true
          while (!at(")")) {
            if (!first) expectSym(",")
            first = false
            args += exprP()
          }
          expectSym(")")
          ECall(v, args.result())
        } else if (at("{")) { // `Variant{ field = expr, ... }`
          expectSym("{")
          val fields = Seq.newBuilder[(String, Expr)]
          var first = true
          while (!at("}")) {
            if (!first) expectSym(",")
            first = false
            val fn = expectId()
            expectSym("=")
            fields += fn -> exprP()
          }
          expectSym("}")
          EConstruct(v, fields.result())
        } else EVar(v)
      case TNum(s) => ELit(numLit(s))
      case TStr(s) => ELit(LString(s))
      case TIStr(raw) => parseInterp(raw)
      case t => throw ParseError(s"bad expression token $t", pos - 1)
    }

    /** Split an interpolated string body into literal chunks and
      * `$( expr )` splices, each splice parsed with the full expression
      * grammar. */
    private def parseInterp(raw: String): Expr = {
      val parts = Seq.newBuilder[Either[String, Expr]]
      var i = 0
      val sb = new StringBuilder
      while (i < raw.length) {
        if (raw.startsWith("$(", i)) {
          if (sb.nonEmpty) { parts += Left(sb.toString); sb.clear() }
          var depth = 1
          var j = i + 2
          while (j < raw.length && depth > 0) {
            if (raw(j) == '(') depth += 1
            else if (raw(j) == ')') depth -= 1
            if (depth > 0) j += 1
          }
          if (depth != 0) throw ParseError(s"unterminated splice in $$\"$raw\"", pos)
          val inner = new P(lex(raw.substring(i + 2, j)))
          val e = inner.exprP()
          if (inner.peek.isDefined)
            throw ParseError(s"trailing tokens in splice: ${raw.substring(i + 2, j)}", pos)
          parts += Right(e)
          i = j + 1
        } else { sb += raw(i); i += 1 }
      }
      if (sb.nonEmpty) parts += Left(sb.toString)
      EInterp(parts.result())
    }

    private def numLit(s: String): Lit =
      // a raw NumberFormatException (multi-dot '1.2.3', overflowing
      // 20-digit integer) has no position and escapes boolPrim's
      // ParseError-only backtracking — surface it as a ParseError
      try if (s.contains('.')) LDouble(s.toDouble) else LInt(s.toLong)
      catch { case _: NumberFormatException =>
        throw ParseError(s"malformed numeric literal '$s'", pos)
      }
    private def negate(l: Lit): Lit = l match {
      case LInt(v) => LInt(-v)
      case LDouble(v) => LDouble(-v)
      case other => other
    }
  }

  def parse(src: String): Program = {
    val p = new P(lex(src))
    val prog = p.program()
    val (declNs, usings) = p.namespaceContext
    postProcess(prog, declNs, usings)
  }

  /** Post-parse name resolution (`Kernel/Drafts/draft:168-197`): rewrite
    * every relation/func reference to its declared qualified name —
    * resolution order is the declaring namespace chain innermost-out,
    * then exact, then `using namespace` directives — and substitute
    * global readonly values (`Kernel/README.md:247-249`) as constants
    * wherever the name is not locally bound. */
  private def postProcess(prog: Program, declNs: Map[String, String],
      usings: Seq[String]): Program = {
    val relNames: Set[String] = (prog.datas.map(_.name) ++
      prog.queries.map(_.name) ++ prog.funcs.map(_.name)).toSet
    val globalLit: Map[String, Lit] = prog.globals.toMap
    if (relNames.forall(!_.contains("::")) && globalLit.isEmpty &&
      usings.isEmpty) return prog // fast path: no namespaces, no globals

    def chain(ns: String): Seq[String] =
      if (ns.isEmpty) Seq("")
      else {
        val parts = ns.split("::").toSeq
        parts.indices.reverse.map(i => parts.take(i + 1).mkString("::")) :+ ""
      }
    def candidates(ns: String, ref: String): Seq[String] =
      chain(ns).map(c => if (c.isEmpty) ref else s"$c::$ref") ++
        usings.map(u => s"$u::$ref")
    def resolveRel(ns: String, ref: String): String =
      candidates(ns, ref).find(relNames.contains).getOrElse(ref)
    def resolveGlobal(ns: String, ref: String): Option[Lit] =
      candidates(ns, ref).collectFirst {
        case c if globalLit.contains(c) => globalLit(c)
      }

    val funcByName = prog.funcs.map(f => f.name -> f).toMap

    /** Names EXPLICITLY bound by an item sequence — these shadow
      * globals. A bare TVar occurrence in a data-atom pattern is NOT a
      * shadow: when the name is a global, that occurrence reads as the
      * constant (globals are readonly — a pattern cannot rebind one). */
    def boundOf(items: Seq[Item]): Set[String] = items.flatMap {
      case Atom(rel, args) => funcByName.get(rel) match {
        case Some(f) => f.params.zip(args).collect {
          case (("out", _), TVar(v)) => v
        }
        case None => args.collect { case TTyped(v, _) => v }
      }
      case Binding(out, _) => Seq(out)
      case RankBinding(out, _, _) => Seq(out)
      case SubQuery(outVars, _) => outVars
      case _ => Seq.empty
    }.toSet

    def mapExpr(ns: String, bound: Set[String])(e: Expr): Expr = {
      val m = mapExpr(ns, bound) _
      e match {
        case EVar(n) if !bound.contains(n.takeWhile(_ != '.')) =>
          resolveGlobal(ns, n).map(ELit.apply).getOrElse(e)
        case EVar(_) | ELit(_) => e
        case EUnary(op, x) => EUnary(op, m(x))
        case EBinary(op, l, r) => EBinary(op, m(l), m(r))
        case EConstruct(v, fields) =>
          EConstruct(v, fields.map { case (f, x) => f -> m(x) })
        case ECall(fn, args) => ECall(fn, args.map(m))
        case EInterp(parts) => EInterp(parts.map {
          case Right(x) => Right(m(x))
          case l => l
        })
        case ECmp(op, l, r) => ECmp(op, m(l), m(r))
        case EIn(x, es) => EIn(m(x), es.map(m))
        case EAnd(l, r) => EAnd(m(l), m(r))
        case EOr(l, r) => EOr(m(l), m(r))
        case ENot(x) => ENot(m(x))
        case EIf(c, t, el) => EIf(m(c), m(t), el.map(m))
      }
    }

    def mapAtom(ns: String, bound: Set[String])(a: Atom): Atom =
      Atom(resolveRel(ns, a.rel), a.args.map {
        case TVar(v) if !bound.contains(v) =>
          resolveGlobal(ns, v).map(TConst.apply).getOrElse(TVar(v))
        case TExpr(e) => TExpr(mapExpr(ns, bound)(e))
        case t => t
      })

    def mapItems(ns: String, items: Seq[Item],
        extraBound: Set[String] = Set.empty): Seq[Item] = {
      // resolve rels FIRST so func-out detection sees qualified names
      val resolved = items.map {
        case a: Atom => a.copy(rel = resolveRel(ns, a.rel))
        case Negation(a) => Negation(a.copy(rel = resolveRel(ns, a.rel)))
        case Existence(a) => Existence(a.copy(rel = resolveRel(ns, a.rel)))
        case Mutation(k, a) => Mutation(k, a.copy(rel = resolveRel(ns, a.rel)))
        case other => other
      }
      val bound = boundOf(resolved) ++ extraBound
      val me = mapExpr(ns, bound) _
      resolved.map {
        case a: Atom => mapAtom(ns, bound)(a)
        case Negation(a) => Negation(mapAtom(ns, bound)(a))
        case Existence(a) => Existence(mapAtom(ns, bound)(a))
        case Mutation(k, a) => Mutation(k, mapAtom(ns, bound)(a))
        case Binding(out, v) => Binding(out, me(v))
        case RankBinding(out, k, d) => RankBinding(out, me(k), d)
        case Compare(op, l, r) => Compare(op, me(l), me(r))
        case Filter(c) => Filter(me(c))
        case Ensure(c) => Ensure(me(c))
        case SubQuery(outVars, body) => SubQuery(outVars, mapBody(ns, body))
        case other => other
      }
    }
    def mapBody(ns: String, b: Body, extraBound: Set[String] = Set.empty): Body =
      Body(b.alts.map(c => Conj(mapItems(ns, c.items, extraBound))))

    def nsOf(n: String) = declNs.getOrElse(n, "")
    prog.copy(
      queries = prog.queries.map(q => q.copy(body = mapBody(nsOf(q.name), q.body,
        (q.inArgs ++ q.outArgs).map(_._1).toSet))),
      funcs = prog.funcs.map { f =>
        val ns = nsOf(f.name)
        f.copy(cases = f.cases.map { c =>
          // case-arg pattern vars shadow globals inside the guards
          val caseBound = c.args.collect {
            case TVar(v) => v
            case TTyped(v, _) => v
          }.toSet
          FuncCase(c.args, mapItems(ns, c.guards, caseBound))
        })
      },
      transactions = prog.transactions.map(t =>
        t.copy(items = mapItems(nsOf(t.name), t.items, t.inArgs.map(_._1).toSet))),
      procedures = prog.procedures.map { p =>
        val paramBound = p.inArgs.map(_._1).toSet
        p.copy(stmts = p.stmts.map(c =>
          Conj(mapItems(nsOf(p.name), c.items, paramBound))))
      },
      fors = prog.fors.map(fq => ForQuery(fq.vars, mapBody("", fq.body, fq.vars.toSet),
        mapItems("", fq.actions, fq.vars.toSet).collect { case m: Mutation => m })),
      indexes = prog.indexes.map { ix =>
        // recover (ns, raw) from the parse-time qualification
        val (tns, raw) = ix.target.lastIndexOf("::") match {
          case -1 => ("", ix.target)
          case i => (ix.target.take(i), ix.target.drop(i + 2))
        }
        ix.copy(target = resolveRel(tns, raw))
      })
  }

  /** Parse a standalone `uncache Name.` statement
    * (`Kernel/Drafts/draft:135-136` M4) — returns the cache key. */
  def parseUncache(src: String): String = {
    val p = new P(lex(src))
    p.expectId() match {
      case "uncache" => ()
      case t => throw ParseError(s"expected 'uncache', got $t", 0)
    }
    val name = p.expectId()
    if (!p.eat(";")) p.expectSym(".")
    name
  }

  /** Parse a standalone `collection_query ... ;` statement
    * (`Kernel/Drafts/draft:148-156`). */
  def parseCollection(src: String): CollectionQuery =
    new P(lex(src)).collectionQuery()

  /** Parse a `stream dedup Rel(id, payload…) by builtin(var) into
    * Table;` statement (see [[Ast.StreamDedup]]). The key function must
    * be a reserved builtin scalar and its argument a declared variable
    * other than the id — both rejected here with the real diagnosis
    * rather than failing downstream. */
  def parseStream(src: String): Ast.StreamStmt = {
    val p = new P(lex(src))
    def kw(w: String): Unit = p.expectId() match {
      case `w` => ()
      case t => throw ParseError(s"expected '$w', got $t", 0)
    }
    def relVars(): (String, Seq[String]) = {
      val rel = p.expectId()
      p.expectSym("(")
      val vars = Seq.newBuilder[String]
      var first = true
      while (!p.at(")")) {
        if (!first) p.expectSym(",")
        first = false
        vars += p.expectId()
      }
      p.expectSym(")")
      (rel, vars.result())
    }
    def intoTable(): String = {
      kw("into")
      val table = p.expectId()
      if (!p.eat(";")) p.expectSym(".")
      table
    }
    kw("stream")
    p.expectId() match {
      case "dedup" =>
        val (rel, vs) = relVars()
        if (vs.size < 2) throw ParseError(
          "stream dedup needs an id variable and at least one payload variable", 0)
        kw("by")
        val fn = p.expectId()
        if (!Builtins.scalar(fn)) throw ParseError(
          s"stream dedup key must be a builtin scalar function, got '$fn'", 0)
        p.expectSym("(")
        val arg = p.expectId()
        p.expectSym(")")
        val table = intoTable()
        if (!vs.contains(arg)) throw ParseError(
          s"stream dedup key argument '$arg' is not a declared variable of $rel", 0)
        if (arg == vs.head) throw ParseError(
          s"stream dedup key argument '$arg' is the id variable; key a payload variable", 0)
        Ast.StreamDedup(rel, vs, fn, arg, table)
      case "sessionize" =>
        val (rel, vs) = relVars()
        if (vs.size != 4) throw ParseError(
          s"stream sessionize needs exactly (user, ts, value, id) variables, got ${vs.size}", 0)
        kw("gap")
        val n = p.next() match {
          case TNum(s) => try s.toLong catch {
            case _: NumberFormatException => throw ParseError(
              s"stream sessionize gap needs a whole number of units, got '$s'", 0)
          }
          case t => throw ParseError(s"stream sessionize gap needs a number, got $t", 0)
        }
        if (n <= 0) throw ParseError(
          s"stream sessionize gap must be positive, got $n", 0)
        val unit = p.expectId() match {
          case "s" | "sec" | "second" | "seconds" => 1L
          case "m" | "min" | "minute" | "minutes" => 60L
          case "h" | "hour" | "hours" => 3600L
          case u => throw ParseError(
            s"stream sessionize gap unit must be seconds/minutes/hours, got '$u'", 0)
        }
        val table = intoTable()
        Ast.StreamSessionize(rel, vs, n * unit, table)
      case "aggregate" =>
        val (rel, vs) = relVars()
        if (vs.size != 3) throw ParseError(
          s"stream aggregate needs exactly (key, value, id) variables, got ${vs.size}", 0)
        if (vs.distinct.size != vs.size) throw ParseError(
          s"stream aggregate variables must be distinct, got ${vs.mkString(", ")}", 0)
        val table = intoTable()
        Ast.StreamAggregate(rel, vs, table)
      case "enrich" =>
        val (rel, vs) = relVars()
        if (vs.isEmpty) throw ParseError(
          "stream enrich needs at least one stream variable", 0)
        kw("with")
        val (dimRel, dvs) = relVars()
        if (dvs.isEmpty) throw ParseError(
          "stream enrich needs at least one dimension variable", 0)
        kw("on")
        val leftKey = p.expectId()
        p.expectSym("=")
        val rightKey = p.expectId()
        val table = intoTable()
        if (!vs.contains(leftKey)) throw ParseError(
          s"stream enrich join key '$leftKey' is not a declared variable of $rel", 0)
        if (!dvs.contains(rightKey)) throw ParseError(
          s"stream enrich join key '$rightKey' is not a declared variable of $dimRel", 0)
        Ast.StreamEnrich(rel, vs, dimRel, dvs, leftKey, rightKey, table)
      case other => throw ParseError(
        s"unknown stream statement 'stream $other' (expected dedup, sessionize, aggregate or enrich)", 0)
    }
  }
}
