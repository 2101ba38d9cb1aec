package graft.heroql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Ast._

/** HeroQL AST → DataFrame plans (the designed query path,
  * SURVEY §3 E_designed): atoms → scans+filters, shared variables →
  * equi-joins, `;` → union, `not exists`/`exists` → anti/semi joins,
  * `@partition`/`@order_by_desc`/rank-filter/`@aggregate` →
  * window + aggregation, head → projection with declared-type casts.
  *
  * Everything is emitted declaratively, so Catalyst does pushdown, join
  * selection, WindowGroupLimit top-k rewriting and whole-stage codegen —
  * the planner never schedules physical execution itself.
  *
  * Determinism note: the reference leaves rank ties unspecified; this
  * planner totalizes the `@order_by*` sort with the remaining bound
  * variables ascending (name order), so rank-filtered results are stable
  * and oracle-checkable.
  */
final class Planner(decls: Map[String, DataDecl],
    queryDecls: Map[String, QueryDecl], catalog: Map[String, DataFrame],
    funcs: Map[String, FuncDecl] = Map.empty) {

  /** Planning stack — a rule atom naming a query already being planned
    * is recursion, which the reference errors on via its "calculating"
    * cache sentinel (`Kernel/README.md:158-161`); recursive rules go
    * through [[graft.operators.Fixpoint]] instead. */
  private val planning = scala.collection.mutable.Set.empty[String]

  private def sparkType(t: String): String = t match {
    case "int" | "int32" => "int"
    case "int64" | "long" => "bigint"
    case "int8" => "tinyint"
    case "int16" => "smallint"
    case "uint8" | "uint16" => "int"
    case "uint32" | "uint64" => "bigint"
    case "double" | "float64" => "double"
    case "float" | "float32" => "float"
    case "string" | "char" => "string"
    case "bool" => "boolean"
    case other => other
  }

  def plan(q: QueryDecl): DataFrame = {
    if (planning.contains(q.name))
      throw Analyzer.AnalysisError(
        s"recursive query ${q.name}: already calculating (use the fixpoint evaluator)")
    planning += q.name
    try {
      val head = q.inArgs ++ q.outArgs
      val alts = q.body.alts.map { conj =>
        val df = planConj(conj)
        df.select(head.map { case (n, t) => col(n).cast(sparkType(t)).as(n) }: _*)
      }
      alts.reduce(_ union _)
    } finally planning -= q.name
  }

  /** Plan a body used as a derived relation (sub-rule): bag of rows with
    * `outVars` columns. */
  private def planBody(body: Body, outVars: Seq[String]): DataFrame =
    body.alts.map(planConj(_).select(outVars.map(col): _*)).reduce(_ union _)

  private final case class State(
      df: Option[DataFrame],
      bound: Set[String],
      partition: Seq[String])

  private def planConj(conj: Conj): DataFrame = {
    var st = State(None, Set.empty, Seq.empty)
    conj.items.foreach {
      case a: Atom if funcs.contains(a.rel) =>
        st = funcAtom(st, funcs(a.rel), a)
      case a: Atom =>
        st = joinIn(st, atomDf(a), atomVarSeq(a))
      case SubQuery(outVars, body) =>
        st = joinIn(st, planBody(body, outVars), outVars)
      case Negation(a) =>
        val av = atomVarSeq(a)
        val shared = av.filter(st.bound.contains)
        st = st.copy(df = Some(st.df.get.join(atomDf(a), shared, "left_anti")))
      case Existence(a) =>
        val av = atomVarSeq(a)
        val shared = av.filter(st.bound.contains)
        st = st.copy(df = Some(st.df.get.join(atomDf(a), shared, "left_semi")))
      case Binding(out, value) =>
        st = st.copy(df = Some(st.df.get.withColumn(out, exprCol(value))),
          bound = st.bound + out)
      case RankBinding(out, key, desc) =>
        val keyCol = if (desc) exprCol(key).desc else exprCol(key).asc
        val ties = (st.bound -- Analyzer.exprVars(key) -- st.partition)
          .toSeq.sorted.map(col(_).asc)
        val w = Window.partitionBy(st.partition.map(col): _*)
          .orderBy(keyCol +: ties: _*)
        st = st.copy(df = Some(st.df.get.withColumn(out, row_number().over(w))),
          bound = st.bound + out)
      case Compare(op, l, r) =>
        val c = op match {
          case "==" => exprCol(l) === exprCol(r)
          case "!=" => exprCol(l) =!= exprCol(r)
          case "<" => exprCol(l) < exprCol(r)
          case "<=" => exprCol(l) <= exprCol(r)
          case ">" => exprCol(l) > exprCol(r)
          case ">=" => exprCol(l) >= exprCol(r)
        }
        st = st.copy(df = Some(st.df.get.filter(c)))
      case Mutation(kind, _) =>
        throw Analyzer.AnalysisError(
          s"@$kind queries execute via HeroQL.executeMutation, not plan()")
      case Partition(vars) =>
        st = st.copy(partition = vars)
      case Aggregate(fn, v) =>
        val agg: Column = fn match {
          case "average" => avg(col(v))
          case "sum" => sum(col(v))
          case "count" => count(col(v))
          case "min" => min(col(v))
          case "max" => max(col(v))
          case "collect" => sort_array(collect_list(col(v)))
          case other => throw Analyzer.AnalysisError(s"unknown aggregate $other")
        }
        val grouped = st.df.get.groupBy(st.partition.map(col): _*).agg(agg.as(v))
        st = State(Some(grouped), st.partition.toSet + v, st.partition)
    }
    st.df.getOrElse(throw Analyzer.AnalysisError("empty rule body"))
  }

  /** `collection_query` pipeline (`Kernel/Drafts/draft:148-156`):
    * body → [partition_by top-k sample] → [group_by aggregation] →
    * [having] → [order_by] → [range_by slice]. Sorting is totalized with
    * the remaining columns ascending for deterministic, oracle-checkable
    * output; `range_by` is 1-based inclusive (`draft_students:53`
    * `range_by 1..1`). */
  def planCollection(cq: CollectionQuery): DataFrame = {
    var df = planConj(cq.body)
    var cols: Seq[String] = df.columns.toSeq

    cq.partitionBy.foreach { st =>
      val binds = st.items.collect { case b: CqBind => b }
      val keeps = st.items.collect { case CqVar(v) => v }
      binds match {
        case Seq(CqBind(out, "OrderByDesc", arg, Some(k))) =>
          val ties = (cols.toSet -- Analyzer.exprVars(arg) - st.key)
            .toSeq.sorted.map(col(_).asc)
          val w = Window.partitionBy(col(st.key))
            .orderBy(exprCol(arg).desc +: ties: _*)
          df = df.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") <= k)
            .withColumn(out, exprCol(arg))
          cols = keeps :+ out
          df = df.select(cols.map(col): _*)
        case other => throw Analyzer.AnalysisError(
          s"partition_by supports exactly one OrderByDesc(expr, k) sample, got $other")
      }
    }

    cq.groupBy.foreach { st =>
      val aggs = st.items.collect { case CqBind(out, fn, arg, _) =>
        val c = fn match {
          case "Average" => avg(exprCol(arg))
          case "Count" => count(exprCol(arg))
          case "Sum" => sum(exprCol(arg))
          case "Min" => min(exprCol(arg))
          case "Max" => max(exprCol(arg))
          case "Collect" => sort_array(collect_list(exprCol(arg)))
          case other => throw Analyzer.AnalysisError(s"unknown aggregation $other")
        }
        c.as(out)
      }
      if (aggs.isEmpty)
        throw Analyzer.AnalysisError("group_by needs at least one aggregation binding")
      df = df.groupBy(col(st.key)).agg(aggs.head, aggs.tail: _*)
      cols = st.key +: st.items.collect { case CqBind(out, _, _, _) => out }
      df = df.select(cols.map(col): _*)
    }

    cq.having.foreach { case Compare(op, l, r) =>
      val c = op match {
        case "==" => exprCol(l) === exprCol(r)
        case "!=" => exprCol(l) =!= exprCol(r)
        case "<" => exprCol(l) < exprCol(r)
        case "<=" => exprCol(l) <= exprCol(r)
        case ">" => exprCol(l) > exprCol(r)
        case ">=" => exprCol(l) >= exprCol(r)
      }
      df = df.filter(c)
    }

    cq.orderBy.foreach { case (e, desc) =>
      val key = if (desc) exprCol(e).desc else exprCol(e).asc
      val ties = (cols.toSet -- Analyzer.exprVars(e)).toSeq.sorted.map(col(_).asc)
      df = df.orderBy(key +: ties: _*)
    }

    cq.rangeBy.foreach { case (a, b) =>
      if (cq.orderBy.isEmpty)
        throw Analyzer.AnalysisError("range_by requires an order_by")
      df = df.offset((a - 1).toInt).limit((b - a + 1).toInt)
    }

    df
  }

  /** Moded `func` call (`Kernel/Drafts/draft:75-89`): inline the case
    * clauses as a first-match-wins CASE chain over the caller's bound
    * columns. Scalar mode only (all `in` bound + one `out`); recursive
    * funcs are rejected (the reference's own recursion guard — use the
    * fixpoint evaluator). */
  private def funcAtom(st: State, f: FuncDecl, a: Atom): State = {
    val outIdxs = f.params.zipWithIndex.collect { case (("out", _), i) => i }
    if (outIdxs.size != 1)
      throw Analyzer.AnalysisError(s"${f.name}: exactly one 'out' parameter supported")
    val outIdx = outIdxs.head
    val outVar = a.args(outIdx) match {
      case TVar(v) => v
      case t => throw Analyzer.AnalysisError(s"${f.name}: out argument must be a variable, got $t")
    }
    val callerIn: Map[Int, Column] = f.params.zipWithIndex.collect {
      case (("in", _), i) => i -> (a.args(i) match {
        case TVar(v) => col(v)
        case TConst(l) => litOf(l)
        case t => throw Analyzer.AnalysisError(s"${f.name}: bad 'in' argument $t")
      })
    }.toMap

    if (f.cases.isEmpty)
      throw Analyzer.AnalysisError(s"${f.name}: func has no case clauses")

    // one (condition, value) per case
    val clauses = f.cases.map { c =>
      if (c.args.size != f.params.size)
        throw Analyzer.AnalysisError(s"${f.name}: case arity mismatch")
      var env = Map.empty[String, Column]
      var conds = Seq.empty[Column]
      callerIn.foreach { case (i, callerCol) =>
        c.args(i) match {
          case TVar(v) =>
            if (env.contains(v)) conds :+= (callerCol === env(v))
            else env += v -> callerCol
          case TConst(l) => conds :+= (callerCol === litOf(l))
          case TWildcard => ()
          case t => throw Analyzer.AnalysisError(s"${f.name}: bad case pattern $t")
        }
      }
      // guards: comparisons → conditions; bindings → extend env (a
      // recursive self-call inside a guard is rejected)
      var outExprFromGuard: Option[Column] = None
      val caseOutVar = c.args(outIdx) match {
        case TVar(v) => Some(v)
        case _ => None
      }
      c.guards.foreach {
        case Compare(op, l, r) =>
          val (lc, rc) = (exprColEnv(l, env), exprColEnv(r, env))
          conds :+= (op match {
            case "==" => lc === rc
            case "!=" => lc =!= rc
            case "<" => lc < rc
            case "<=" => lc <= rc
            case ">" => lc > rc
            case ">=" => lc >= rc
          })
        case Binding(out, value) =>
          val vc = exprColEnv(value, env)
          if (caseOutVar.contains(out)) outExprFromGuard = Some(vc)
          else env += out -> vc
        case at: Atom if at.rel == f.name =>
          throw Analyzer.AnalysisError(
            s"recursive func ${f.name}: already calculating (use the fixpoint evaluator)")
        case other => throw Analyzer.AnalysisError(
          s"${f.name}: unsupported guard $other (only comparisons and bindings)")
      }
      val value = c.args(outIdx) match {
        case TConst(l) => litOf(l)
        case TVar(v) =>
          outExprFromGuard.orElse(env.get(v)).getOrElse(
            throw Analyzer.AnalysisError(s"${f.name}: out variable $v never assigned in case"))
        case t => throw Analyzer.AnalysisError(s"${f.name}: bad out pattern $t")
      }
      (conds.reduceOption(_ && _), value)
    }

    val chain = clauses.foldLeft(Option.empty[Column]) {
      case (acc, (condOpt, value)) =>
        val cond = condOpt.getOrElse(lit(true))
        Some(acc match {
          case None => when(cond, value)
          case Some(c) => c.when(cond, value)
        })
    }.get

    State(Some(st.df.getOrElse(throw Analyzer.AnalysisError(
      s"${f.name}: func call needs prior bindings in the rule body"))
      .withColumn(outVar, chain)),
      st.bound + outVar, st.partition)
  }

  /** Expr → Column with a substitution environment (used by func
    * inlining; defaults to column references). */
  private def exprColEnv(e: Expr, env: Map[String, Column]): Column = e match {
    case EVar(n) => env.getOrElse(n, col(n))
    case ELit(l) => litOf(l)
    case EUnary("-", x) => -exprColEnv(x, env)
    case EUnary(op, _) => throw Analyzer.AnalysisError(s"unknown unary $op")
    case EBinary(op, l, r) =>
      val (lc, rc) = (exprColEnv(l, env), exprColEnv(r, env))
      op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case other => throw Analyzer.AnalysisError(s"unknown operator $other")
      }
  }

  private def joinIn(st: State, right: DataFrame, rightVars: Seq[String]): State = {
    val merged = st.df match {
      case None => right
      case Some(left) =>
        val shared = rightVars.filter(st.bound.contains)
        if (shared.nonEmpty) left.join(right, shared)
        else left.crossJoin(right)
    }
    State(Some(merged), st.bound ++ rightVars, st.partition)
  }

  private def atomVarSeq(a: Atom): Seq[String] =
    a.args.collect { case TVar(v) => v }.distinct

  /** Atom → scan with constants as pushed filters, wildcards dropped,
    * repeated variables as equality filters, fields renamed to rule
    * variables. An atom naming another `query` inlines that derived
    * relation's plan (view expansion). */
  private def atomDf(a: Atom): DataFrame = {
    val (fields, base) = decls.get(a.rel) match {
      case Some(d) =>
        (d.fields.map(_._1), catalog.getOrElse(a.rel,
          throw Analyzer.AnalysisError(s"relation ${a.rel} not bound in catalog")))
      case None =>
        val q = queryDecls.getOrElse(a.rel,
          throw Analyzer.AnalysisError(s"unknown relation ${a.rel}"))
        ((q.inArgs ++ q.outArgs).map(_._1), plan(q))
    }
    var df = base
    val firstFieldOfVar = scala.collection.mutable.Map.empty[String, String]
    a.args.zip(fields).foreach {
      case (TConst(l), f) => df = df.filter(col(f) === litOf(l))
      case (TVar(v), f) =>
        firstFieldOfVar.get(v) match {
          case Some(f0) => df = df.filter(col(f) === col(f0))
          case None => firstFieldOfVar(v) = f
        }
      case (TWildcard, _) => ()
    }
    df.select(firstFieldOfVar.toSeq.map { case (v, f) => col(f).as(v) }: _*)
  }

  private def litOf(l: Lit): Column = l match {
    case LInt(v) => lit(v)
    case LDouble(v) => lit(v)
    case LString(v) => lit(v)
    case LBool(v) => lit(v)
  }

  private def exprCol(e: Expr): Column = e match {
    case EVar(n) => col(n)
    case ELit(l) => litOf(l)
    case EUnary("-", x) => -exprCol(x)
    case EUnary(op, _) => throw Analyzer.AnalysisError(s"unknown unary $op")
    case EBinary(op, l, r) =>
      val (lc, rc) = (exprCol(l), exprCol(r))
      op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case other => throw Analyzer.AnalysisError(s"unknown operator $other")
      }
  }
}

/** Facade: parse + analyze + plan one named query of a HeroQL program
  * against a catalog of table bindings. */
object HeroQL {
  def compile(program: String, queryName: String,
      catalog: Map[String, DataFrame]): DataFrame = {
    val ast = Parser.parse(program)
    val decls = ast.datas.map(d => d.name -> d).toMap
    val queryDecls = ast.queries.map(q => q.name -> q).toMap
    val funcs = ast.funcs.map(f => f.name -> f).toMap
    val q = ast.queries.find(_.name == queryName)
      .getOrElse(throw Analyzer.AnalysisError(s"no query named $queryName"))
    Analyzer.analyze(decls, queryDecls, q, funcs)
    new Planner(decls, queryDecls, catalog, funcs).plan(q)
  }

  /** Compile a standalone `collection_query ... ;` against the data
    * declarations of `program` and a catalog of table bindings. */
  def compileCollection(program: String, cqSrc: String,
      catalog: Map[String, DataFrame]): DataFrame = {
    val ast = Parser.parse(program)
    val decls = ast.datas.map(d => d.name -> d).toMap
    val queryDecls = ast.queries.map(q => q.name -> q).toMap
    val funcs = ast.funcs.map(f => f.name -> f).toMap
    val cq = Parser.parseCollection(cqSrc)
    Analyzer.analyzeConj(decls, queryDecls, cq.body, Set.empty, funcs)
    new Planner(decls, queryDecls, catalog, funcs).planCollection(cq)
  }

  /** Execute a mutation query (`@insert` / `@update` / `@remove`,
    * `Kernel/README.md:210-234`) against a [[graft.store.TableStore]]
    * table named after the mutated relation. The caller supplies the
    * query's in-arguments as a DataFrame whose columns are the in-arg
    * names (the reference's procedure-call form, bulk: one mutation per
    * args row, applied as a single atomic commit — the `for query (set)`
    * pattern `Kernel/Drafts/draft:138-142` lowered to one merge, never
    * row-at-a-time). */
  def executeMutation(program: String, queryName: String,
      args: DataFrame, store: graft.store.TableStore): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val ast = Parser.parse(program)
    val decls = ast.datas.map(d => d.name -> d).toMap
    val queryDecls = ast.queries.map(q => q.name -> q).toMap
    val q = ast.queries.find(_.name == queryName)
      .getOrElse(throw Analyzer.AnalysisError(s"no query named $queryName"))
    Analyzer.analyze(decls, queryDecls, q)
    val item = q.body.alts match {
      case Seq(Conj(Seq(m: Mutation))) => m
      case _ => throw Analyzer.AnalysisError(
        s"$queryName: mutation queries must have exactly one @-statement body")
    }
    val fields = decls(item.atom.rel).fields.map(_._1)
    val table = item.atom.rel
    def litOf(l: Lit) = l match {
      case LInt(v) => lit(v)
      case LDouble(v) => lit(v)
      case LString(v) => lit(v)
      case LBool(v) => lit(v)
    }
    item.kind match {
      case "insert" =>
        val cols = item.atom.args.zip(fields).map {
          case (TVar(v), f) => col(v).cast(store.read(table).schema(f).dataType).as(f)
          case (TConst(l), f) => litOf(l).as(f)
          case (t, f) => throw Analyzer.AnalysisError(s"bad @insert term $t for $f")
        }
        store.insert(table, args.select(cols: _*))
      case "remove" =>
        val keyPairs = item.atom.args.zip(fields).collect { case (TVar(v), f) => (v, f) }
        val constCond = item.atom.args.zip(fields).collect {
          case (TConst(l), f) => col(f) === litOf(l)
        }.reduceOption(_ && _)
        val cur = store.read(table)
        val keys = args
          .select(keyPairs.map { case (v, f) => col(v).cast(cur.schema(f).dataType).as(f) }: _*)
          .distinct()
        val keyFields = keyPairs.map(_._2)
        val next = constCond match {
          case None => cur.join(keys, keyFields, "left_anti")
          case Some(c) =>
            val hit = coalesce(c, lit(false))
            cur.filter(not(hit)).unionByName(cur.filter(hit).join(keys, keyFields, "left_anti"))
        }
        store.create(table, next)
      case "update" =>
        val matchPairs = item.atom.args.zip(fields).collect { case (TVar(v), f) => (v, f) }
        val setPairs = item.atom.args.zip(fields).collect { case (TAtVar(v), f) => (v, f) }
        val cur = store.read(table)
        val updates = args.select(
          matchPairs.map { case (v, f) => col(v).cast(cur.schema(f).dataType).as(f) } ++
            setPairs.map { case (v, f) => col(v).cast(cur.schema(f).dataType).as(s"__set_$f") }: _*)
          .distinct()
        val setFields = setPairs.map(_._2).toSet
        val merged = cur.join(updates, matchPairs.map(_._2), "left")
          .select(fields.map { f =>
            if (setFields(f)) coalesce(col(s"__set_$f"), col(f)).as(f) else col(f)
          }: _*)
        store.create(table, merged)
      case other => throw Analyzer.AnalysisError(s"unknown mutation @$other")
    }
  }
}
