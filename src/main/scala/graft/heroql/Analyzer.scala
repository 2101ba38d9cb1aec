package graft.heroql

import Ast._

/** Mode analysis — the reference's `<-` is directional ("cannot run
  * backward from x2 to x", `Kernel/README.md:136-137`), so every
  * expression may only read variables already bound by an earlier atom
  * or binding, and only a fresh (out) variable may appear left of `<-`.
  * This static pass orders/validates a rule before planning (SURVEY §4
  * "mode analysis ... is our join-order seed"); it needs no
  * SparkSession.
  */
object Analyzer {

  final case class AnalysisError(msg: String) extends RuntimeException(msg)

  def exprVars(e: Expr): Set[String] = e match {
    // `c.r` is a field access on variable `c` — the base is the
    // binding-relevant name
    case EVar(n) => Set(n.takeWhile(_ != '.'))
    case ELit(_) => Set.empty
    case EUnary(_, x) => exprVars(x)
    case EBinary(_, l, r) => exprVars(l) | exprVars(r)
    case EConstruct(_, fields) => fields.map(_._2).flatMap(exprVars).toSet
    case ECall(_, args) => args.flatMap(exprVars).toSet
    case ECmp(_, l, r) => exprVars(l) | exprVars(r)
    case EIn(x, es) => exprVars(x) | es.flatMap(exprVars).toSet
    case EInterp(parts) => parts.collect { case Right(e) => exprVars(e) }
      .foldLeft(Set.empty[String])(_ | _)
    case EAnd(l, r) => exprVars(l) | exprVars(r)
    case EOr(l, r) => exprVars(l) | exprVars(r)
    case ENot(x) => exprVars(x)
    case EIf(c, t, e) => exprVars(c) | exprVars(t) | e.map(exprVars).getOrElse(Set.empty)
  }

  private def atomVars(a: Atom): Set[String] =
    a.args.collect { case TVar(v) => v }.toSet

  /** Validate one query against the data declarations and the other
    * query declarations (atoms may reference either — a rule body atom
    * naming another `query` inlines that derived relation). */
  def analyze(decls: Map[String, DataDecl], queries: Map[String, QueryDecl],
      q: QueryDecl, funcs: Map[String, FuncDecl] = Map.empty): Unit = {
    val head = (q.inArgs ++ q.outArgs).map(_._1)
    q.body.alts.foreach { conj =>
      // in-args are moded "in": provided by the caller, bound up front
      val bound = analyzeConj(decls, queries, conj, q.inArgs.map(_._1).toSet, funcs)
      val missing = head.filterNot(bound.contains)
      if (missing.nonEmpty)
        throw AnalysisError(
          s"${q.name}: head variables not bound by body: ${missing.mkString(", ")}")
      // pre-binding makes the check above vacuous for IN-args — but the
      // planner's head projection selects them from the body's frame
      // (callers bind by joining on the result), so a body that never
      // produces one must be a diagnostic here, not an unresolved-column
      // Spark error later. MUTATION queries are exempt: their in-args
      // are caller-bound (executeMutation supplies the args frame) and
      // consumed by the mutation atoms, never projected as a head.
      val isMutation = conj.items.exists(_.isInstanceOf[Mutation])
      val produced = if (isMutation) Set.empty[String] else conj.items.collect {
        case a: Atom if funcs.contains(a.rel) =>
          funcs(a.rel).params.zip(a.args).collect {
            case (("out", _), TVar(v)) => v
          }.toSet
        case a: Atom => atomVars(a)
        case SubQuery(outVars, _) => outVars.toSet
        case Binding(out, _) => Set(out)
        case RankBinding(out, _, _) => Set(out)
      }.foldLeft(Set.empty[String])(_ | _)
      val phantom =
        if (isMutation) Nil
        else q.inArgs.map(_._1).filterNot(produced.contains)
      if (phantom.nonEmpty)
        throw AnalysisError(
          s"${q.name}: head variables not bound by body: ${phantom.mkString(", ")}")
    }
  }

  def analyzeConj(decls: Map[String, DataDecl], queries: Map[String, QueryDecl],
      conj: Conj, initialBound: Set[String] = Set.empty,
      funcs: Map[String, FuncDecl] = Map.empty): Set[String] = {
    var bound = initialBound
    conj.items.foreach {
      // moded function call: in-positions must be bound, out binds
      case a: Atom if funcs.contains(a.rel) =>
        val f = funcs(a.rel)
        if (f.params.size != a.args.size)
          throw AnalysisError(s"${a.rel} expects ${f.params.size} args, got ${a.args.size}")
        f.params.zip(a.args).foreach {
          case (("in", _), TVar(v)) if !bound.contains(v) =>
            throw AnalysisError(s"cannot run backward: unbound variable $v at an 'in' position of ${a.rel}")
          case (("in", _), TExpr(e)) =>
            requireBound(exprVars(e), bound, s"'in' expression of ${a.rel}")
          case (("out", _), TVar(v)) => bound += v
          case (("out", _), t) =>
            throw AnalysisError(s"'out' argument of ${a.rel} must be a fresh variable, got $t")
          case _ => ()
        }
      case Mutation(kind, a) =>
        checkArity(decls, queries, a)
        val atVars = a.args.collect { case TAtVar(v) => v }
        // computed args (`@insert Bonus(s, x + 1)`) must also be fully
        // bound — an unchecked TExpr surfaces later as an unresolved
        // column at transaction time, or silently resolves against an
        // unrelated same-named column
        val exprRefs = a.args.collect { case TExpr(e) => exprVars(e) }
          .foldLeft(Set.empty[String])(_ | _)
        val unbound = (atomVars(a) ++ atVars ++ exprRefs) -- bound
        if (unbound.nonEmpty)
          throw AnalysisError(
            s"@$kind ${a.rel}: unbound variable(s) ${unbound.mkString(", ")}")
        if (atVars.nonEmpty && kind != "update")
          throw AnalysisError(s"@-prefixed fields only valid in @update, not @$kind")
        if (kind == "update" && atVars.isEmpty)
          throw AnalysisError("@update needs at least one @-prefixed field to assign")
      case a: Atom =>
        checkArity(decls, queries, a)
        bound |= atomVars(a)
      case SubQuery(outVars, body) =>
        body.alts.foreach { alt =>
          // funcs pass through: the planner supports func atoms inside
          // sub-rule bodies, so the analyzer must not reject them as
          // unknown relations
          val b = analyzeConj(decls, queries, alt, funcs = funcs)
          val missing = outVars.filterNot(b.contains)
          if (missing.nonEmpty)
            throw AnalysisError(s"sub-rule head not bound: ${missing.mkString(", ")}")
        }
        bound |= outVars.toSet
      case Negation(a) =>
        checkArity(decls, queries, a)
        // GROUND atoms (constants/wildcards only) are safe: a constant
        // emptiness test over the whole conjunction. Atoms with FREE
        // variables stay rejected — unsafe negation has no finite
        // semantics
        if (atomVars(a).nonEmpty && (atomVars(a) & bound).isEmpty)
          throw AnalysisError(s"'not exists ${a.rel}' shares no bound variable")
      case Existence(a) =>
        checkArity(decls, queries, a)
        if (atomVars(a).nonEmpty && (atomVars(a) & bound).isEmpty)
          throw AnalysisError(s"'exists ${a.rel}' shares no bound variable")
      case Binding(out, value) =>
        requireBound(exprVars(value), bound, s"binding of $out")
        if (bound.contains(out))
          throw AnalysisError(
            s"cannot run backward: $out is already bound (only out variables may be left of '<-')")
        bound += out
      case RankBinding(out, key, _) =>
        requireBound(exprVars(key), bound, s"rank binding of $out")
        if (bound.contains(out)) throw AnalysisError(s"rank variable $out already bound")
        bound += out
      case Compare(_, l, r) =>
        requireBound(exprVars(l) | exprVars(r), bound, "comparison")
      case Filter(e) =>
        requireBound(exprVars(e), bound, "boolean filter")
      case Ensure(e) =>
        requireBound(exprVars(e), bound, "ensure")
      case Partition(vars) =>
        requireBound(vars.toSet, bound, "@partition")
      case Aggregate(_, v, v2, _) =>
        requireBound(Set(v) ++ v2, bound, "@aggregate")
    }
    bound
  }

  private def requireBound(vars: Set[String], bound: Set[String], where: String): Unit = {
    val unbound = vars -- bound
    if (unbound.nonEmpty)
      throw AnalysisError(
        s"cannot run backward: unbound variable(s) ${unbound.mkString(", ")} in $where")
  }

  private def checkArity(decls: Map[String, DataDecl],
      queries: Map[String, QueryDecl], a: Atom): Unit = {
    val arity = decls.get(a.rel).map(_.fields.size)
      .orElse(queries.get(a.rel).map(q => (q.inArgs ++ q.outArgs).size))
    arity match {
      case None => throw AnalysisError(s"unknown relation ${a.rel}")
      case Some(n) if n != a.args.size =>
        throw AnalysisError(s"${a.rel} expects $n arguments, got ${a.args.size}")
      case _ => ()
    }
  }
}
