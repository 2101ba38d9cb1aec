package graft.heroql

/** AST for HeroQL — the Datalog-style query language the reference
  * specifies but never implements (grammar sketch
  * `Kernel/Drafts/draft:103-118`; worked samples
  * `Kernel/README.md:107-234`). The engine is a compiler from this AST
  * to DataFrame plans (SURVEY §7 design stance).
  */
object Ast {

  /** `data Exams(student: string, score: int).` (`Kernel/README.md:56-60`) */
  final case class DataDecl(name: String, fields: Seq[(String, String)])

  /** `query Name(in: t, ...) -> (out: t, ...) :- body .`
    * (`Kernel/README.md:162-205`); result columns are inArgs ++ outArgs.
    * An empty type string means "untyped" (the anonymous-query arg form
    * `query (arg1, arg2)`, `Kernel/Drafts/draft:92-96`; also `let` —
    * no head cast is applied). */
  /** `cached` marks the reference's materialized-query form
    * (`Kernel/README.md:142-161`): first evaluation memoizes into the
    * store, later calls serve the committed snapshot. `isPublic` is the
    * `public query` package-visibility marker (`Kernel/README.md:263`). */
  final case class QueryDecl(
      name: String,
      inArgs: Seq[(String, String)],
      outArgs: Seq[(String, String)],
      body: Body,
      cached: Boolean = false,
      isPublic: Boolean = false)

  /** `transaction [(importance)] query Name(args) :- items, @insert
    * ..., @remove ... .` (`Kernel/README.md:251-254`; `Rewrite.md:4-16`
    * "queue updates parallelly, apply single-threaded"): non-mutation
    * prefix items bind variables, the mutation items apply IN ORDER
    * inside one atomic multi-table commit. The optional importance
    * literal maps to the store's prioritized commit
    * ([[graft.store.TableStore.transactionImportance]] — the
    * reference's scheduling classes, `Lock.cpp:637-676`): under
    * write-write contention the higher class commits first. */
  final case class TransactionDecl(
      name: String,
      inArgs: Seq[(String, String)],
      items: Seq[Item],
      isPublic: Boolean = false,
      importance: Int = 0)

  /** `procedure Name(arg: type, ...) { stmt; stmt; ... }` — a named,
    * stored, parameterized multi-statement body. The reference
    * reserves the keyword and includes procedures in a package's
    * content ("a data package includes schema, data, procedures",
    * `Kernel/README.md:9`; `PROCEDURE` in the content grammar,
    * `Kernel/README.md:20`) but never defines the statement grammar;
    * this is the minimal faithful form: each statement is a
    * transaction-shaped conjunction (binding prefix, then mutations in
    * order), statements run sequentially WITH read-your-writes, and
    * the whole body publishes as ONE atomic commit. Parameters
    * substitute as readonly constants at call time (the global-value
    * rule, `Kernel/README.md:247-249`, applied per invocation). */
  final case class ProcedureDecl(name: String, inArgs: Seq[(String, String)],
      stmts: Seq[Conj], isPublic: Boolean = false)

  /** `for query(vars) :- body ( set T(...); ... )` —
    * `Kernel/Drafts/draft:138-142`: iterate a query, mutate per row;
    * lowered to ONE bulk merge per action over the derived row set,
    * never row-at-a-time. */
  final case class ForQuery(vars: Seq[String], body: Body, actions: Seq[Mutation])

  /** `package NAME using P1, P2 ...;` header (`Kernel/README.md:256-264`)
    * — the rest of the program text is the package's declaration body,
    * `public` queries are its cross-package surface. */
  final case class PackageHeader(name: String, using: Seq[String])

  /** `index Name { Hash(col) Ordered(col) ... }`
    * (`Kernel/README.md:62-74`; on a cached query it keys the memo —
    * `Kernel/README.md:142-157`). One entry per kind clause. */
  final case class IndexDecl(target: String, specs: Seq[(String, Seq[String])])

  /** `union Shape = Circle(r: double) | Rect(w: double, h: double).` —
    * a tagged-union (ADT) declaration; variant order fixes the runtime
    * tag (`Kernel/README.md:36-39` union types; ADTs as unions of
    * structs `Kernel/Drafts/draft:21-23`; runtime-type case dispatch
    * `Kernel/Drafts/draft_type:218-311`). Payload field lists enable
    * constructor expressions (`Circle{ r = x }` — the draft_type
    * construction syntax, e.g. `LambdaType{ type = t }`); a variant may
    * omit them when its values only ever arrive pre-encoded. Values use
    * the frozen [[graft.types.UnionType]] struct encoding. */
  final case class UnionDecl(name: String, variants: Seq[UnionVariant]) {
    def variantNames: Seq[String] = variants.map(_.name)
  }
  final case class UnionVariant(name: String, fields: Seq[(String, String)])

  final case class Program(datas: Seq[DataDecl], queries: Seq[QueryDecl],
      funcs: Seq[FuncDecl] = Seq.empty,
      unions: Seq[UnionDecl] = Seq.empty,
      transactions: Seq[TransactionDecl] = Seq.empty,
      fors: Seq[ForQuery] = Seq.empty,
      pkg: Option[PackageHeader] = None,
      indexes: Seq[IndexDecl] = Seq.empty,
      globals: Seq[(String, Lit)] = Seq.empty,
      procedures: Seq[ProcedureDecl] = Seq.empty,
      // `Students <- new StudentPackage.` — global readonly PACKAGE
      // INSTANCE bindings (`Kernel/README.md:249`): global name →
      // package name. Relations of the instance are addressed
      // `Students::Rel(...)` (the instance IS a namespace; its store
      // tables are literally named that — Packages.Instance.table).
      instances: Seq[(String, String)] = Seq.empty)

  /** `func Name(in a, out b); case Name(0, 1); case Name(a, b) :- ... ;`
    * (`Kernel/Drafts/draft:75-89`): multi-clause moded function with
    * first-match-wins case dispatch. */
  final case class FuncDecl(name: String, params: Seq[(String, String)], // (mode, name)
      cases: Seq[FuncCase])
  /** One clause: positional patterns + optional guard/binding body. */
  final case class FuncCase(args: Seq[Term], guards: Seq[Item])

  /** Body = disjunction of conjunctions (`;` alternates rule bodies,
    * `Kernel/README.md:109-112`). */
  final case class Body(alts: Seq[Conj])
  final case class Conj(items: Seq[Item])

  sealed trait Item
  /** `Exams(student, score)` — relation atom with positional terms. */
  final case class Atom(rel: String, args: Seq[Term]) extends Item
  /** `not exists Atom` / `exists Atom` (`Kernel/Drafts/draft:111`,
    * `Kernel/Drafts/draft_type:190`). */
  final case class Negation(atom: Atom) extends Item
  final case class Existence(atom: Atom) extends Item
  /** `x2 <- x * x` — directional binding (`Kernel/README.md:125-140`). */
  final case class Binding(out: String, value: Expr) extends Item
  /** `delta > 0` — filter predicate. */
  final case class Compare(op: String, left: Expr, right: Expr) extends Item
  /** Scalar boolean filter — a composed `and`/`or`/`not`/`if-then-else`
    * condition over bound variables (the full `<BOOLEAN>` grammar,
    * `Kernel/Drafts/draft:104-112`). Boolean combinations over relation
    * ATOMS never reach this node: the parser lowers them to disjunctive
    * normal form on the rule's `;`-union path. */
  final case class Filter(cond: Expr) extends Item
  /** `ensure X` — throws if any row fails X (`Kernel/Drafts/draft:111`
    * "ensure X throws if not X"); rows that pass flow through unchanged. */
  final case class Ensure(cond: Expr) extends Item
  /** `@partition(student)` (`Kernel/README.md:176-185`). */
  final case class Partition(vars: Seq[String]) extends Item
  /** `order <- @order_by_desc(score)` / `@order_by(...)`
    * (`Kernel/README.md:162-174`). */
  final case class RankBinding(out: String, key: Expr, desc: Boolean) extends Item
  /** `@aggregate(average(score))` (`Kernel/README.md:188-205`).
    * Two-variable form for the sketch aggregates that consume a
    * (key, value) pair — `@aggregate(approx_sum_distinct(pk, qty))`
    * estimates Σ over distinct `pk` of max(`qty`) and binds the result
    * to the VALUE variable. The quantile sketches additionally take
    * LITERAL quantile points — `@aggregate(approx_quantile(rid, v,
    * 0.95))` (scalar) / `@aggregate(approx_quantiles(rid, v, 0.25,
    * 0.5, 0.75))` (array) — carried in `quantiles`. */
  final case class Aggregate(fn: String, variable: String,
      variable2: Option[String] = None,
      quantiles: Seq[Double] = Nil) extends Item
  /** `(parent) :- Body .` — nested anonymous sub-rule
    * (`Kernel/README.md:114-121`). */
  final case class SubQuery(outVars: Seq[String], body: Body) extends Item
  /** `@insert Exams(student, score)` / `@update Exams(student, @score)` /
    * `@remove Exams(student, _)` (`Kernel/README.md:210-234`). */
  final case class Mutation(kind: String, atom: Atom) extends Item

  /** `collection_query(args) :- body partition_by k(...) group_by k(...)
    * [:- having] [order_by[_desc] e] [range_by a..b] ;`
    * (`Kernel/Drafts/draft:148-156`, `draft_students:37-53`). */
  final case class CollectionQuery(
      head: Seq[String],
      body: Conj,
      partitionBy: Option[CqStage],
      groupBy: Option[CqStage],
      having: Option[Compare],
      orderBy: Option[(Expr, Boolean)], // (expr, descending)
      rangeBy: Option[(Long, Long)], // 1-based inclusive
      rangeAgg: Option[RangeAggStage] = None,
      semDedup: Option[SemanticDedupStage] = None,
      nearest: Option[NearestStage] = None,
      nearDedup: Option[NearDedupStage] = None)

  /** `range_agg Rel(tsField[, valField]) within W of probeVar
    * (out = Count(tsField)[, out2 = Sum(valField)])` — the
    * aggregate-only interval join ([[graft.operators.RangeCount]]'s
    * segment tree, O((n+q)·log n)) as a collection-query pipeline
    * stage: per body row, count (and sum over) the `Rel` rows whose
    * `tsField` falls in [probeVar, probeVar + W). The language route
    * to the scale-safe shape — a pair-enumerating rule-body join
    * answering the same question measures ~118× at the 100× probe
    * where this stage is ~3×. */
  final case class RangeAggStage(rel: String, tsVar: String,
      valVar: Option[String], window: Long, probeVar: String,
      binds: Seq[CqBind])

  /** `semantic_dedup(idVar, vecVar) [against Rel(idField, vecField)]
    * threshold τ as (cluster, dup_of, max_cos)` — SemDeDup (Abbas et
    * al. 2023) as a collection-query pipeline stage: per body row, the
    * cluster assignment plus the smallest-id earlier neighbor at
    * cosine ≥ τ within the cluster. Without `against`, plans to
    * [[graft.queries.Dedup.semanticDedupLayered]] (self-dedup); with
    * `against Rel(...)`, the body rows are the arriving BATCH and
    * `Rel` the already-ingested CORPUS — the incremental steady-state
    * shape ([[graft.queries.Dedup.semanticDedupIncremental]]):
    * centroids are a corpus artifact, precedence is corpus membership.
    * Both routes carry √n scaled centroids AND exact-value layering,
    * so the language is the 100-TB-shaped pipeline, never a raw
    * all-pairs search (the [[RangeAggStage]] posture). The three `as`
    * names rename the stage's fixed output triple. */
  final case class SemanticDedupStage(idVar: String, vecVar: String,
      tau: Double, outCluster: String, outDupOf: String, outMaxCos: String,
      against: Option[(String, String, String)] = None)

  /** `nearest(idVar, vecVar) [for Rel(idField, vecField)] k K
    * [probes P] as (probe, neighbor, cos, rank)` —
    * approximate-nearest-neighbor top-k as a collection-query pipeline
    * stage. Plans to [[graft.queries.Similarity.storedIvfPqTopKFor]]:
    * the body's vectors are IVF-PQ-encoded into a list-partitioned
    * stored index (built once per codebook fingerprint), each probe's
    * candidate scan opens ONLY its probed list partitions (static
    * partition pruning), and an exact-cosine re-rank of the bounded
    * candidate set yields top-k — the language route is the
    * index-backed scan-budgeted shape, never a brute all-pairs cosine.
    * The probe set is `Rel`'s rows when `for` is given (the real query
    * API — probe vectors need not be corpus members); otherwise the
    * ann family's convention (the first `probes` ids of the body).
    * Outputs are renamed by the `as` quadruple. */
  final case class NearestStage(idVar: String, vecVar: String,
      k: Int, nProbes: Int, outProbe: String, outNeighbor: String,
      outCos: String, outRank: String,
      forRel: Option[(String, String, String)] = None)

  /** `near_dedup(idVar, textVar) [against Rel(idField, textField)]
    * threshold τ as (…)` — MinHash-LSH near-duplicate detection as a
    * collection-query pipeline stage; τ is the Jaccard verification
    * threshold. Two forms:
    *  - SELF (no `against`): clustering + quality-keeper election,
    *    planning to [[graft.queries.Dedup.layeredLshKeeper]] (exact
    *    fp-collapse first, LSH banding over REPRESENTATIVES only,
    *    connected components, longest-then-smallest-id keeper); `as`
    *    names the output triple (keeper_id, keeper_tokens,
    *    cluster_size) appended to the id.
    *  - AGAINST: the body rows are the arriving BATCH and `Rel` the
    *    already-ingested CORPUS, planning to [[graft.queries.Dedup
    *    .incrementalNearDedup]] (both sides fp-collapsed, banding and
    *    verification batch-vs-representatives, verdicts fanned back
    *    through both fingerprints); one row per verified pair, `as`
    *    names the output pair (corpus_id, jaccard) appended to the id.
    * Either way the text route carries the 100-TB exchange
    * discipline — text never crosses a shuffle as key — by
    * construction. */
  final case class NearDedupStage(idVar: String, textVar: String,
      tau: Double, outs: Seq[String],
      against: Option[(String, String, String)] = None)

  /** `partition_by exam(student, exam, s = OrderByDesc(score, 3))` or
    * `group_by student(student, c = Count(score))`. */
  final case class CqStage(key: String, items: Seq[CqItem])
  sealed trait CqItem
  final case class CqVar(name: String) extends CqItem
  /** `out = Fn(expr[, k])` — OrderByDesc (sequence fn, k required) or an
    * aggregation fn (Average/Count/Sum/Min/Max/Collect). */
  final case class CqBind(out: String, fn: String, arg: Expr, k: Option[Long]) extends CqItem

  sealed trait Term
  final case class TVar(name: String) extends Term
  final case class TConst(value: Lit) extends Term
  case object TWildcard extends Term
  /** `x : Circle` — runtime-type pattern: matches when the union-typed
    * argument's tag is the variant's, binding `x` to the variant payload
    * (`Kernel/Drafts/draft_type:218-311`, e.g. `in target : FuncType`). */
  final case class TTyped(name: String, variant: String) extends Term
  /** Computed argument in a func-call atom (`Fib(i-1, a)` —
    * `Kernel/Drafts/draft:85-89`); not a match pattern. */
  final case class TExpr(e: Expr) extends Term
  /** `@score` inside `@update` — the field to assign
    * (`Kernel/README.md:218-225`). */
  final case class TAtVar(name: String) extends Term

  sealed trait Expr
  final case class EVar(name: String) extends Expr
  final case class ELit(value: Lit) extends Expr
  final case class EUnary(op: String, e: Expr) extends Expr
  final case class EBinary(op: String, l: Expr, r: Expr) extends Expr
  /** `Circle{ r = expr, ... }` — union-variant construction
    * (`Kernel/Drafts/draft_type:227` `DisgintuishedType{ name = ... }`). */
  final case class EConstruct(variant: String, fields: Seq[(String, Expr)]) extends Expr
  /** Boolean-valued expressions (`<BOOLEAN>` grammar,
    * `Kernel/Drafts/draft:104-112`): comparison, connectives, and the
    * boolean `if <B> then <B> [else <B>]` (no `else` = implication —
    * the construct "returns true" when the condition fails). */
  /** `$"... $(x) ..."` string interpolation
    * (`Kernel/Drafts/draft_type:225,237`): literal chunks and spliced
    * expressions, compiled to one concat. */
  final case class EInterp(parts: Seq[Either[String, Expr]]) extends Expr
  /** `fingerprint(text)` — a builtin scalar-function call. Builtin
    * names are reserved words of the expression grammar (see
    * [[Builtins]]); user-defined computation stays on the moded-`func`
    * path, which dispatches relationally. */
  final case class ECall(fn: String, args: Seq[Expr]) extends Expr
  final case class ECmp(op: String, l: Expr, r: Expr) extends Expr
  /** `x in (e1, e2, ...)` — membership over an explicit list. Plans to
    * Catalyst's `In`, which the transparent skipping rule
    * ([[graft.plans.AutoSkip]]) and parquet pushdown both recognize —
    * the language route to adm23's Bloom-pruned batch point lookup. */
  final case class EIn(x: Expr, elems: Seq[Expr]) extends Expr
  final case class EAnd(l: Expr, r: Expr) extends Expr
  final case class EOr(l: Expr, r: Expr) extends Expr
  final case class ENot(e: Expr) extends Expr
  final case class EIf(cond: Expr, thenB: Expr, elseB: Option[Expr]) extends Expr

  sealed trait Lit
  final case class LInt(v: Long) extends Lit
  final case class LDouble(v: Double) extends Lit
  final case class LString(v: String) extends Lit
  final case class LBool(v: Boolean) extends Lit

  /** A `stream …` statement (engine extension; the reference's
    * serialized-apply design `Rewrite.md:11-15` is the hook: updates
    * queue in arrival order and apply serially — here per micro-batch
    * commit). */
  sealed trait StreamStmt

  /** `stream dedup Rel(id, payload…) by fingerprint(var) into Table;`
    * — the statement form of the fp-keyed streaming dedup sink
    * ([[graft.streaming.DocStreams.dedupSinkToStoreByFp]]): rows of
    * `Rel` arrive as micro-batches, the builtin key deduplicates them
    * incrementally against the committed corpus (first arrival = min
    * id wins), and novel rows land in store table `Table`. The first
    * variable is the id; `keyArg` names the keyed payload variable;
    * the rest are carried by min-id. */
  final case class StreamDedup(rel: String, vars: Seq[String],
    keyFn: String, keyArg: String, table: String) extends StreamStmt

  /** `stream sessionize Rel(user, ts, value, id) gap 30 minutes into
    * Table;` — the statement form of the gap-based sessionization
    * (ev1's islands analysis): rows of `Rel` arrive as micro-batches
    * and land through atomic store commits; sessions (per-user
    * ordinals, bounds, duration, value sum) are derived over the
    * committed corpus and published into store table `Table`.
    * Variables are positional: partition key, event time, summed
    * value, tie-break id. */
  final case class StreamSessionize(rel: String, vars: Seq[String],
    gapSeconds: Long, table: String) extends StreamStmt

  /** `stream aggregate Rel(key, value, id) into Table;` — the statement
    * form of streaming materialized-view maintenance
    * ([[graft.store.MaterializedView]] driven per micro-batch): rows of
    * `Rel` arrive as micro-batches and fold into a store-held
    * `GROUP BY key → (count, exact-sum(value))` view, one atomic
    * marked commit per batch (exactly-once under replay). Variables
    * are positional: group key, summed value, arrival id (the staging
    * order). */
  final case class StreamAggregate(rel: String, vars: Seq[String],
    table: String) extends StreamStmt

  /** `stream enrich Rel(vars…) with Dim(dimVars…) on leftKey = rightKey
    * into Table;` — the statement form of the stream-static enrichment
    * join (st12's shape): rows of `Rel` arrive as micro-batches, the
    * static dimension `Dim` joins as a broadcast snapshot re-resolved
    * per batch, and enriched rows append into store table `Table`
    * through one atomic commit per batch. `leftKey` must be a declared
    * variable of `Rel`, `rightKey` of `Dim`; the join is inner
    * equi-key (state-free — no watermark needed). */
  final case class StreamEnrich(rel: String, vars: Seq[String],
    dimRel: String, dimVars: Seq[String], leftKey: String,
    rightKey: String, table: String) extends StreamStmt
}
