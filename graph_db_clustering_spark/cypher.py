"""Cypher front-end: run the reference's actual query strings on Spark.

The reference's entire query API is raw Cypher sent to Neo4j over Bolt
(kmeans_clustering/database.py:32; every query in
image_classification.py). A user "switching engines" therefore switches
*these strings*. This module compiles the reference's Cypher dialect —
the full grammar its queries use — into DataFrame plans over the
property-graph layer (operators/graph.Graph):

    CREATE (:Image {name: $name, ...})                 image_classification.py:220
    MATCH (n) WITH n, rand() AS r ORDER BY r LIMIT k
        CREATE (:Centroid {mean: n.mean, ...})         image_classification.py:233-237
    MATCH (n:Image {centroid: false}), (c:Image {centroid: true})
        WITH n, c, abs(n.mean - c.mean) AS difference ORDER BY difference ASC
        WITH n, collect({centroid: c, difference: difference})[0] AS closest
        WITH closest.centroid AS cent, closest.difference AS diff
        CREATE (n)-[:CLOSEST_TO {difference: diff}]->(cent)
                                                       image_classification.py:341-348
    MATCH ()-[r]-() DELETE r                           image_classification.py:357-359
    MATCH (c:Centroid) RETURN c                        image_classification.py:373-380
    MATCH (i:Image) WHERE ID(i)=$image_id MATCH (c:Centroid) WHERE ID(c)=$centroid_id
        CREATE (i)-[r:CLOSEST_TO]->(c) SET r.cosine_similarity = $similarity
                                                       image_classification.py:438-442
    MATCH (i:Image)-[:CLOSEST_TO]->(c:Centroid) WHERE ID(c)=$centroid_id RETURN i
                                                       image_classification.py:465-467
    MATCH (c:Centroid) WHERE ID(c)=$centroid_id SET c.corrcoef = $corrcoef, ...
                                                       image_classification.py:499-501
    MATCH (i:Image)-[r:CLOSEST_TO]->(c:Centroid) RETURN c, count(r)
                                                       image_classification.py:513-515
    MATCH (i:Image)-[r:CLOSEST_TO]->(c:Centroid) RETURN ID(c), i.name
                                                       image_classification.py:533-535
    MATCH (n) DETACH DELETE n                          database.py:46
    MATCH (a),(b) WHERE a.name=$x AND b.name=$y CREATE (a)-[r:TYPE]->(b)
                                                       database.py:51-67

Semantics on Spark (the binding-table model, as in openCypher):
- Each clause transforms a *table of bindings*; node/edge variables are
  struct columns (all properties + id / src,dst,eid,relationship), so
  `n.prop` is a struct field access Catalyst simplifies away.
- WITH/RETURN items containing aggregates (count/collect/sum/avg/min/max)
  trigger Cypher's implicit GROUP BY on the non-aggregate items.
- `collect(x)[0]` after `ORDER BY key` compiles to min/max(struct(key, x))
  — the argmin-as-aggregate shape (no window, no real collect): the
  reference's nearest-centroid assignment becomes the same single
  hash-aggregate our kmeans.assign uses, instead of materializing sorted
  lists per group.
- `rand()` is seeded (session seed) so sampling queries are reproducible.
- Mutations build batch DataFrames and apply once per run() — one
  union/join per statement, where the reference pays one Bolt round trip
  per row (image_classification.py:217-221, 444-445).
- Labels map to a `label` vertex column; multi-labels (round 13) store
  as a sorted ':'-joined set in the same column ((n:A:B) -> "A:B"), so
  single-label graphs keep the plain-string contract. Neo4j's internal
  ID() maps to the `id` / `eid` columns.

Scale notes: MATCH patterns are equi-joins Catalyst plans (broadcast for
small sides like the centroid label); property filters push into the
vertex scan. Synthesizing edge ids for a graph without an `eid` column
uses one global row_number — supply `eid` in production graphs.

Supported openCypher surface (everything else raises with a clear
message — gates are test-pinned in tests/test_cypher.py):

    clause / form                              status
    -----------------------------------------  --------------------------
    MATCH (multi-path, WHERE, undirected/      yes
      directed, property maps)
    OPTIONAL MATCH (pattern-side WHERE)        yes (left outer join)
    variable-length -[:T*lo..hi]-              yes (capped fixpoint,
                                                 _VARLEN_MAX_HOPS)
    WITH / RETURN (DISTINCT, aggregates with   yes
      implicit grouping, ORDER BY, SKIP,
      LIMIT, WITH ... WHERE)
    UNWIND list AS x (incl. as first clause)   yes (explode)
    CREATE / MERGE (+ SET on match/create)     yes (batch upserts)
    SET / DELETE / DETACH DELETE               yes (COW snapshots)
    REMOVE n.prop / REMOVE n:Label             yes (typed-NULL updates;
                                                 label nulls only where
                                                 it currently matches)
    FOREACH (x IN list | updating clauses)     yes (batch explode;
                                                 outer bindings unchanged)
    CALL { subquery } (uncorrelated,           yes (result cross-joined
      read-only, ends with RETURN)               to every input row)
    CALL { WITH a, b ... } (correlated,        yes (runs ONCE over the
      read-only; per-row aggregates,             distinct import combos,
      per-row ORDER BY/SKIP/LIMIT,               null-safe equi-join back;
      empty-group defaults 0/[]/0)               never per-row execution)
    CALL { [WITH a] CREATE/MERGE/SET/... }     yes (round 14: unit
      (UPDATING unit subquery, no RETURN)        subquery — body runs per
      [IN TRANSACTIONS [OF n ROWS]]              input ROW, outer rows
                                                 untouched; IN TRANSACTIONS
                                                 parses as a declared no-op
                                                 — all mutations commit
                                                 atomically at statement
                                                 end in this engine)
    list literals [..], map literals {..},    yes (round 11: x[expr]
      x[i] / x[$k] / x['key'] / x[i + 1],        computed list/map
      $params                                    subscripts; round 13:
                                                 RUNTIME node keys via a
                                                 type-unified CASE chain —
                                                 heterogeneous prop types
                                                 gate loudly)
    UNION / UNION ALL (RETURN parts, same      yes (unionByName,
      columns, no mixing — the Neo4j rules)      + distinct for bare UNION)
    CALL db.labels() / db.relationshipTypes()  yes (distinct metadata
      / db.propertyKeys() [YIELD col [AS x]]     scans / schema keys)
    CALL db.createLabel/createProperty/        yes (round 9: validated,
      createRelationshipType/awaitIndex(es)/     then a NO-OP — tokens/
      resampleIndex(es) (void procedures)        indexes are implicit here;
                                                 bindings pass through)
    apoc FUNCTIONS: coll.sum/avg/min/max/       yes (round 14: compile to
      contains/sort/toSet/flatten/indexOf/       built-in Spark SQL
      reverse/union/unionAll/intersection/       expressions — codegen,
      subtract/zip, text.join/split/replace/     no UDFs; unknown apoc
      clean/capitalize/distance/indexOf,         functions raise with
      map.fromPairs/fromLists/merge/             the supported list)
      removeKey, convert.toJson
    other CALL procedures (apoc.*, write/       no — ValueError with the
      admin; apoc.periodic.iterate's ingest      supported list
      pattern = CALL { } IN TRANSACTIONS)
    [p =] shortestPath((a)-[:T*..k]->(b))      yes (layered BFS over
      + length(p)                                distinct pairs: one row
                                                 per endpoint pair at its
                                                 minimal hop count)
    [p =] allShortestPaths((a)-[:T*..k]->(b))  yes (BFS + per-layer
                                                 path counting; one row
                                                 per minimal path)
    p = (a)-[r]->(b)...  fixed-length          yes (length/nodes/
                                                 relationships arrays)
    p = (a)-[:T*lo..hi]->(b)  varlength path   yes (round 11: per-PATH
      vars (one relationship in the pattern)     enumeration w/ relationship
                                                 uniqueness — one row per
                                                 path, exact length/nodes/
                                                 relationships; varlength
                                                 mixed with more edges
                                                 stays a ValueError)
    point({x, y[, z]} | {longitude,            yes (rounds 11-13:
      latitude[, height]}) + distance() /        cartesian euclidean;
      withinBBox; point ordering                 WGS-84[-3d] haversine;
                                                 ordering comparisons
                                                 between points are null,
                                                 ORDER BY deterministic)
    (x) (()-[:R]->()){lo,hi} (y) / (...)+      yes (rounds 11-13:
      quantified path patterns                   per-path rows, inner
                                                 patterns constrain every
                                                 step, zero-length, group
                                                 vars incl. multi-rel
                                                 bodies, per-repetition
                                                 unification of repeated
                                                 node vars)
    date()/datetime()/localdatetime()/         yes (rounds 11-13: string/
      time()/localtime()/duration() +            map construction, zero-arg
      accessors, comparisons, arithmetic         statement-clock forms,
                                                 type-aware accessors;
                                                 offset/zone forms gate
                                                 loudly — no zone-
                                                 preserving Spark type)
    LOAD CSV [WITH HEADERS] FROM 'file://…'    yes (round 13: Spark's
      AS row [FIELDTERMINATOR ';']               distributed CSV scan;
                                                 fields stay strings,
                                                 Neo4j's rule; network
                                                 schemes gate loudly)
    list comprehension [x IN l WHERE p | e]    yes (filter/transform
      (+ range(a, b[, step]))                    HOFs; lambda scoping)
    all/any/none/single(x IN l WHERE p)        yes (forall/exists HOFs)
    reduce(acc = init, x IN l | expr)          yes (F.aggregate; nested
                                                 reduce + shadowing work)
    pattern comprehension                      yes (bound subject; one
      [(a)-[:R]->(b) WHERE p | e]                join + collect per comp;
                                                 sorted lists — Neo4j
                                                 leaves order unspecified)
    exists((a)-[:R]->(b)) WHERE predicate      yes (flag-column join —
      (+ legacy exists(n.prop) = IS NOT NULL)    composes with NOT/OR)
    bare pattern predicates ((a)-->())         yes (round 11:
      + EXISTS { MATCH ... WHERE ... }            compiles as exists();
      existential subqueries                      RETURN-position
                                                  patterns stay errors)
    CASE (simple + searched, no ELSE -> null)  yes (F.when chain)
    IS [NOT] NULL, x IN list, STARTS WITH /    yes (=~ anchored to the
      ENDS WITH / CONTAINS, =~ regex             whole string, as Neo4j)
    aggregates: count/collect/sum/avg/min/max  yes (+ collect(x)[0]
      (+ DISTINCT forms; collect(DISTINCT x)       after ORDER BY = argmin)
      is a sorted set)
    functions: ID, rand, abs, not, coalesce,   yes (others: ValueError
      size (strings + lists), toLower/toUpper,   'unsupported function')
      toString/toInteger/toFloat/toBoolean,
      substring/left/right/trim/ltrim/rtrim/
      replace/split/reverse, head/last/tail,
      round/floor/ceil/sqrt/sign/exp/log/
      log10/pi, labels/type/keys/properties
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_db_clustering_spark.operators.graph import Graph

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_KEYWORDS = {
    "match", "where", "with", "order", "by", "limit", "create", "set",
    "delete", "detach", "return", "as", "and", "or", "not", "asc", "desc",
    "distinct", "true", "false", "null", "optional", "merge", "unwind",
    "skip", "union", "call", "foreach", "remove",
    "case", "when", "then", "else", "end", "in", "is", "starts", "ends",
    "contains",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<arrow>\]->|<-\[|-\[|\]-)
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>'[^']*'|"[^"]*")
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>=~|<=|>=|<>|!=|[(){}\[\],:.=<>+\-*/%|])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"cypher: bad character {src[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident" and text.lower() in _KEYWORDS:
            # keep the original spelling: keywords double as labels /
            # property names in name position (e.g. the :Order label)
            out.append(("kw", text))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: object


@dataclass
class Param:
    name: str


@dataclass
class Var:
    name: str


@dataclass
class Prop:
    base: object
    name: str


@dataclass
class Func:
    name: str
    args: list
    distinct: bool = False  # count(DISTINCT x) and friends


@dataclass
class MapLit:
    items: dict


@dataclass
class ListLit:
    items: list


@dataclass
class Index:
    base: object
    idx: int


@dataclass
class LabelTest:
    """`n:Label[:Label2]` in EXPRESSION position (WHERE n:A AND ...):
    true iff the node carries every listed label; on a relationship
    variable, a single-type test. ':'-joined sorted, like NodePat."""
    base: object
    label: str


@dataclass
class Bin:
    op: str
    left: object
    right: object


@dataclass
class NodePat:
    var: str | None
    # round 13: one OR MORE labels, ':'-joined in SORTED order
    # ((n:B:A) -> "A:B") — the single-label case is the plain name.
    # Sorted canonicalization makes CREATE/MERGE/labels() agree on one
    # spelling of a label set.
    label: str | None
    props: dict


@dataclass
class EdgePat:
    var: str | None
    rel: str | None
    props: dict
    direction: str  # 'out' | 'in' | 'any'
    hops: tuple | None = None  # (min, max|None) for variable-length -[*1..3]-
    # quantified path pattern (round 11): ((a)-[:R]->(b)){lo,hi} —
    # inner node constraints applied at EVERY step of the expansion
    qpp: bool = False
    qpp_src: object = None  # NodePat | None
    qpp_dst: object = None  # NodePat | None
    # round 12: GROUP VARIABLES — inner (a)-[r:R]->(b) names bind
    # LISTS per path row (a = step sources, b = step targets, r =
    # traversed relationships), per openCypher GPM
    qpp_vars: tuple = (None, None, None)  # (src, edge, dst) names
    # round 12: MULTI-RELATIONSHIP body — the inner Path when the
    # quantified group spans more than one relationship; each
    # repetition traverses the whole chain (composite step)
    qpp_body: object = None  # Path | None
    # round 13: group variables INSIDE a multi-relationship body —
    # (node var per body position 0..m, edge var per position 0..m-1);
    # each binds the per-repetition LIST at its chain position
    qpp_body_vars: tuple = ((), ())
    # round 13: node positions a repeated body variable must unify —
    # tuple of position groups, each sorted ascending; the equality
    # joins apply INSIDE every repetition's composite step
    qpp_body_unify: tuple = ()


@dataclass
class PathPat:
    nodes: list
    edges: list  # len(nodes) == len(edges) + 1
    shortest: bool = False  # wrapped in shortestPath(...)
    all_shortest: bool = False  # allShortestPaths(...): one row PER path
    pathvar: str | None = None  # p = shortestPath(...); length(p) resolves


@dataclass
class MatchC:
    paths: list
    where: object | None
    optional: bool = False


@dataclass
class MergeC:
    path: object  # single PathPat


@dataclass
class WithC:
    items: list  # [(expr, alias | None)]
    order_by: list  # [(expr, asc: bool)]
    limit: int | None
    distinct: bool
    skip: int | None = None
    where: object | None = None  # WITH ... WHERE pred (filters the projection)


@dataclass
class ReturnC(WithC):
    pass


@dataclass
class UnwindC:
    expr: object  # list-valued expression
    alias: str


@dataclass
class LoadCsvC:
    url: str
    var: str
    headers: bool
    sep: str


@dataclass
class CreateC:
    paths: list


@dataclass
class SetC:
    assignments: list  # [(var, prop, expr)]
    labels: list = field(default_factory=list)  # [(var, label)] SET n:L


@dataclass
class DeleteC:
    vars: list
    detach: bool


@dataclass
class RemoveC:
    items: list  # [(var, prop)]
    labels: list = field(default_factory=list)  # [(var, label)] REMOVE n:L


@dataclass
class ForeachC:
    var: str
    expr: object  # list expression
    clauses: list  # mutating clauses applied per element


@dataclass
class CallC:
    clauses: list  # subquery body (read: ends with RETURN; unit: no RETURN)
    imports: list | None = None  # importing-WITH variable names (correlated)
    unit: bool = False  # updating (mutating) body, executed per input row


@dataclass
class ProcC:
    name: str  # dotted procedure name (db.labels, ...)
    yields: list | None  # [(column, alias|None)] from YIELD, or None = all
    args: list = field(default_factory=list)  # void-procedure arguments


@dataclass
class ListComp:
    var: str
    src: object  # list expression
    pred: object | None  # WHERE filter
    mapped: object | None  # | projection


@dataclass
class PatternComp:
    path: object  # PathPat; first node must be a bound variable
    pred: object | None  # WHERE filter over the pattern's bindings
    mapped: object  # | projection (required, as in openCypher)


@dataclass
class PatternPred:
    path: object  # PathPat inside exists(); >=1 node var must be bound
    # EXISTS { MATCH p1, p2 WHERE pred } subquery form (round 11):
    # extra paths beyond `path`, and the subquery's own WHERE
    more_paths: tuple = ()
    where: object = None


@dataclass
class Quantifier:
    kind: str  # all | any | none | single
    var: str
    src: object  # list expression
    pred: object  # WHERE predicate


@dataclass
class Reduce:
    acc: str  # accumulator variable
    init: object  # initial value expression
    var: str  # element variable
    src: object  # list expression
    body: object  # | expression (sees acc and var)


@dataclass
class Case:
    subject: object | None  # simple form: CASE subj WHEN val ...; None = searched
    whens: list  # [(when_expr, then_expr)]; when_expr is a value (simple) or predicate (searched)
    default: object | None  # ELSE; Cypher yields null when absent


_AGG_FNS = {"count", "collect", "sum", "avg", "min", "max"}

# read-only introspection procedures (CALL db.labels() ...) -> Neo4j's
# output column names for each (round 7 adds the db.schema.* /
# dbms.components tier — VERDICT r6 Next #9). Deviations from Neo4j,
# chosen so every yield is a hashable scalar: propertyTypes is a
# comma-joined string instead of a list, and db.schema.visualization
# yields flattened (srcLabel, relationship, dstLabel) triples instead
# of virtual graph objects.
_PROCEDURES = {
    "db.labels": ("label",),
    "db.relationshipTypes": ("relationshipType",),
    "db.propertyKeys": ("propertyKey",),
    "db.schema.nodeTypeProperties": (
        "nodeType", "propertyName", "propertyTypes", "mandatory",
    ),
    "db.schema.relTypeProperties": (
        "relType", "propertyName", "propertyTypes", "mandatory",
    ),
    "db.schema.visualization": ("srcLabel", "relationship", "dstLabel"),
    "dbms.components": ("name", "version", "edition"),
}

# schema-management VOID procedures (round 9): scripts migrating from
# Neo4j routinely pre-create label/property/relationship tokens and
# await index builds before querying. Tokens are implicit in a
# DataFrame engine and scans need no index warm-up, so these validate
# their argument shape and then do NOTHING — the binding table passes
# through unchanged (Neo4j: void procedures yield zero columns).
# name -> expected argument count (None = any, incl. zero)
_NOOP_PROCEDURES = {
    "db.createLabel": 1,
    "db.createProperty": 1,
    "db.createRelationshipType": 1,
    "db.awaitIndex": None,
    "db.awaitIndexes": None,
    "db.resampleIndex": None,
    "db.resampleOutdatedIndexes": None,
}


def _neo_type_name(dt) -> str:
    """Spark type -> the Neo4j type-name vocabulary db.schema.* yields."""
    from pyspark.sql import types as _T

    if isinstance(dt, (_T.LongType, _T.IntegerType, _T.ShortType, _T.ByteType)):
        return "Long"
    if isinstance(dt, (_T.DoubleType, _T.FloatType)):
        return "Double"
    if isinstance(dt, _T.StringType):
        return "String"
    if isinstance(dt, _T.BooleanType):
        return "Boolean"
    if isinstance(dt, _T.BinaryType):
        return "ByteArray"
    if isinstance(dt, _T.DateType):
        return "Date"
    if isinstance(dt, (_T.TimestampType, _T.TimestampNTZType)):
        return "DateTime"
    if isinstance(dt, _T.ArrayType):
        return "List"
    return dt.simpleString()


def _has_agg(e) -> bool:
    if isinstance(e, Func):
        if e.name.lower() in _AGG_FNS:
            return True
        return any(_has_agg(a) for a in e.args)
    if isinstance(e, Bin):
        return _has_agg(e.left) or _has_agg(e.right)
    if isinstance(e, Prop):
        return _has_agg(e.base)
    if isinstance(e, Index):
        return _has_agg(e.base)
    if isinstance(e, LabelTest):
        return _has_agg(e.base)
    if isinstance(e, MapLit):
        return any(_has_agg(v) for v in e.items.values())
    if isinstance(e, ListLit):
        return any(_has_agg(v) for v in e.items)
    if isinstance(e, ListComp):
        return (
            _has_agg(e.src)
            or (e.pred is not None and _has_agg(e.pred))
            or (e.mapped is not None and _has_agg(e.mapped))
        )
    if isinstance(e, Case):
        return (
            (e.subject is not None and _has_agg(e.subject))
            or any(_has_agg(w) or _has_agg(t) for w, t in e.whens)
            or (e.default is not None and _has_agg(e.default))
        )
    if isinstance(e, Quantifier):
        return _has_agg(e.src) or _has_agg(e.pred)
    if isinstance(e, Reduce):
        return _has_agg(e.init) or _has_agg(e.src) or _has_agg(e.body)
    return False


def _name_of(e) -> str:
    """Cypher-style default output column name (the expression text)."""
    if isinstance(e, Var):
        return e.name
    if isinstance(e, Prop):
        return f"{_name_of(e.base)}.{e.name}"
    if isinstance(e, Func):
        return f"{e.name}({', '.join(_name_of(a) for a in e.args)})"
    if isinstance(e, Lit):
        return repr(e.value)
    if isinstance(e, Param):
        return f"${e.name}"
    if isinstance(e, Index):
        return f"{_name_of(e.base)}[{e.idx}]"
    if isinstance(e, LabelTest):
        return f"{_name_of(e.base)}:{e.label}"
    if isinstance(e, PatternComp):
        return "[pattern]"
    if isinstance(e, Case):
        return "case"
    if isinstance(e, Quantifier):
        return e.kind
    if isinstance(e, Reduce):
        return "reduce"
    return "expr"


# ---------------------------------------------------------------------------
# Parser (recursive descent over the reference grammar)
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, text=None):
        t = self.next()
        got = t[1].lower() if t[0] == "kw" else t[1]
        if t[0] != kind or (text is not None and got != text):
            raise SyntaxError(f"cypher: expected {text or kind}, got {t}")
        return t

    def at_kw(self, *kws):
        t = self.peek()
        return t[0] == "kw" and t[1].lower() in kws

    def _slice_count(self, kw):
        """SKIP/LIMIT operand: openCypher allows any expression, but this
        front-end supports only non-negative integer literals — reject
        parameters/expressions/negatives with the module's explicit
        unsupported-surface gate style (round-5 ADVICE) rather than a
        generic parse error."""
        t = self.peek()
        trailing = self.peek(1)
        if (
            t[0] != "num"
            or "." in t[1]
            or (trailing[0] == "op" and trailing[1] in "+-*/%^")
        ):
            raise ValueError(
                f"cypher: {kw} takes a non-negative integer literal; "
                f"parameters and expressions are not supported (got {t[1]!r})"
            )
        return int(self.next()[1])

    def ident(self):
        """Name position (label, property, alias): keywords are legal."""
        t = self.next()
        if t[0] not in ("ident", "kw"):
            raise SyntaxError(f"cypher: expected name, got {t}")
        return t[1]

    # -- clauses ------------------------------------------------------------

    def parse(self):
        """Top level: one clause sequence, or several joined by
        UNION [ALL]. Returns [(clauses, all_flag)] — all_flag is None on
        the first segment, else whether its joining UNION carried ALL."""
        segments = [(self.segment(), None)]
        while self.at_kw("union"):
            self.next()
            all_flag = False
            t = self.peek()
            if t[0] in ("ident", "kw") and t[1].lower() == "all":
                self.next()
                all_flag = True
            segments.append((self.segment(), all_flag))
        return segments

    def segment(self, stop=None):
        clauses = []
        while (
            self.peek()[0] != "eof"
            and not self.at_kw("union")
            and (stop is None or self.peek() != stop)
        ):
            t = self.peek()
            if t[0] == "ident" and t[1].lower() == "load":
                # LOAD CSV — kept out of _KEYWORDS so 'load'/'from'/
                # 'headers' stay usable as labels and property names
                clauses.append(self.load_csv_clause())
                continue
            if t[0] != "kw":
                raise SyntaxError(f"cypher: expected clause keyword, got {t}")
            kw = t[1].lower()
            if kw == "match":
                clauses.append(self.match_clause())
            elif kw == "optional":
                self.next()
                clauses.append(self.match_clause(optional=True))
            elif kw == "merge":
                clauses.append(self.merge_clause())
            elif kw == "with":
                clauses.append(self.with_clause(WithC))
            elif kw == "return":
                clauses.append(self.with_clause(ReturnC))
            elif kw == "create":
                clauses.append(self.create_clause())
            elif kw == "set":
                clauses.append(self.set_clause())
            elif kw in ("delete", "detach"):
                clauses.append(self.delete_clause())
            elif kw == "unwind":
                clauses.append(self.unwind_clause())
            elif kw == "remove":
                clauses.append(self.remove_clause())
            elif kw == "foreach":
                clauses.append(self.foreach_clause())
            elif kw == "call":
                clauses.append(self.call_clause())
            else:
                raise SyntaxError(f"cypher: unexpected {t[1].upper()}")
        return clauses

    def match_clause(self, optional=False):
        self.expect("kw", "match")
        paths = [self.path_element()]
        while self.peek() == ("op", ","):
            self.next()
            paths.append(self.path_element())
        where = None
        if self.at_kw("where"):
            self.next()
            where = self.expr()
        return MatchC(paths, where, optional)

    def merge_clause(self):
        self.expect("kw", "merge")
        return MergeC(self.path())

    def with_clause(self, cls):
        self.next()  # WITH / RETURN
        distinct = False
        if self.at_kw("distinct"):
            self.next()
            distinct = True
        items = [self.item()]
        while self.peek() == ("op", ","):
            self.next()
            items.append(self.item())
        order_by, limit = [], None
        if self.at_kw("order"):
            self.next()
            self.expect("kw", "by")
            while True:
                e = self.expr()
                asc = True
                if self.at_kw("asc", "desc"):
                    asc = self.next()[1].lower() == "asc"
                order_by.append((e, asc))
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
        skip = None
        if self.at_kw("skip"):
            self.next()
            skip = self._slice_count("SKIP")
        if self.at_kw("limit"):
            self.next()
            limit = self._slice_count("LIMIT")
        where = None
        if cls is WithC and self.at_kw("where"):
            # openCypher: WITH ... [ORDER BY] [SKIP] [LIMIT] [WHERE pred];
            # the predicate filters the projected (and sliced) rows.
            # RETURN takes no WHERE — it falls through to parse(), which
            # rejects the stray keyword.
            self.next()
            where = self.expr()
        return cls(items, order_by, limit, distinct, skip, where)

    def load_csv_clause(self):
        """LOAD CSV [WITH HEADERS] FROM '<file url>' AS row
        [FIELDTERMINATOR ';'] — Neo4j's bulk-ingest clause. Every
        field is a STRING (Neo4j's rule; coerce with toInteger()/
        toFloat()/toBoolean()); WITH HEADERS binds each line as a
        field-named map, without it as a list subscripted row[0]."""

        def ident(expected):
            t = self.next()
            if not (t[0] == "ident" and t[1].lower() == expected):
                raise SyntaxError(
                    f"cypher: expected {expected.upper()} in LOAD CSV, "
                    f"got {t}"
                )

        self.next()  # LOAD
        ident("csv")
        headers = False
        if self.at_kw("with"):
            self.next()
            ident("headers")
            headers = True
        ident("from")
        t = self.next()
        if t[0] != "str":
            raise ValueError(
                "cypher: LOAD CSV needs a literal file URL"
            )
        url = t[1][1:-1]
        self.expect("kw", "as")
        v = self.next()
        if v[0] != "ident":
            raise SyntaxError(
                f"cypher: expected a variable after AS, got {v}"
            )
        sep = ","
        if (
            self.peek()[0] == "ident"
            and self.peek()[1].lower() == "fieldterminator"
        ):
            self.next()
            ts = self.next()
            if ts[0] != "str":
                raise ValueError(
                    "cypher: FIELDTERMINATOR needs a literal string"
                )
            sep = ts[1][1:-1]
        return LoadCsvC(url, v[1], headers, sep)

    def unwind_clause(self):
        self.expect("kw", "unwind")
        e = self.expr()
        self.expect("kw", "as")
        return UnwindC(e, self.ident())

    def item(self):
        e = self.expr()
        alias = None
        if self.at_kw("as"):
            self.next()
            alias = self.ident()
        return (e, alias)

    def create_clause(self):
        self.expect("kw", "create")
        paths = [self.path()]
        while self.peek() == ("op", ","):
            self.next()
            paths.append(self.path())
        return CreateC(paths)

    def set_clause(self):
        self.expect("kw", "set")
        assignments, labels = [], []
        while True:
            var = self.expect("ident")[1]
            if self.peek() == ("op", ":"):
                # SET n:Label[:Label2] — add labels to the node's set
                while self.peek() == ("op", ":"):
                    self.next()
                    labels.append((var, self.ident()))
            else:
                self.expect("op", ".")
                prop = self.ident()
                self.expect("op", "=")
                assignments.append((var, prop, self.expr()))
            if self.peek() == ("op", ","):
                self.next()
                continue
            break
        return SetC(assignments, labels)

    def call_clause(self):
        """CALL { subquery } — uncorrelated (result rows join every
        input row) AND correlated (importing WITH, compiled once over
        the distinct import combos). CALL procedures beyond the
        supported db.* surface and mutating bodies stay gated."""
        self.expect("kw", "call")
        if self.peek() != ("op", "{"):
            return self.procedure_call()
        self.next()
        body = self.segment(stop=("op", "}"))
        if self.at_kw("union"):
            raise ValueError(
                "cypher: UNION inside a CALL { } subquery is not "
                "supported (run the UNION as the top-level query)"
            )
        self.expect("op", "}")
        if not body:
            raise SyntaxError("cypher: empty CALL subquery")
        imports = None
        if isinstance(body[0], WithC) and not isinstance(body[0], ReturnC):
            # correlated form: the first clause must be an importing WITH —
            # openCypher requires a bare variable list (no aliases,
            # expressions, DISTINCT, ORDER BY, WHERE, SKIP or LIMIT)
            imp = body[0]
            plain = all(
                isinstance(e, Var) and a is None for e, a in imp.items
            )
            if (
                not plain
                or imp.distinct
                or imp.order_by
                or imp.limit is not None
                or imp.skip
                or imp.where is not None
            ):
                raise ValueError(
                    "cypher: a CALL subquery's importing WITH must be a "
                    "plain variable list (WITH a, b) — no expressions, "
                    "aliases, DISTINCT, ORDER BY, WHERE, SKIP or LIMIT"
                )
            imports = [e.name for e, _ in imp.items]
            body = body[1:]
            if not body:
                raise SyntaxError("cypher: empty CALL subquery")
        has_mut = any(
            isinstance(
                cl, (CreateC, MergeC, SetC, DeleteC, RemoveC, ForeachC)
            )
            for cl in body
        )
        # round 14 (VERDICT r13 #8): UPDATING CALL { } subqueries — the
        # Neo4j batch-ingest idiom (CALL { WITH row CREATE ... } [IN
        # TRANSACTIONS]). A mutating body is a UNIT subquery: it must
        # not RETURN (Neo4j 5), executes once per input row, and
        # preserves the outer cardinality. The optional IN TRANSACTIONS
        # [OF n ROWS] suffix parses and is accepted as a no-op: this
        # engine commits every deferred mutation atomically at
        # statement end (immutable-snapshot model), so transaction
        # batching has nothing to batch — documented, not silent.
        if has_mut and isinstance(body[-1], ReturnC):
            raise ValueError(
                "cypher: an updating CALL { } subquery cannot RETURN "
                "(unit subquery — Neo4j 5 semantics)"
            )
        if not has_mut and not isinstance(body[-1], ReturnC):
            raise ValueError("cypher: CALL subquery must end with RETURN")
        if self.at_kw("in"):
            self.next()
            t = self.peek()
            if not (
                t[0] in ("ident", "kw")
                and t[1].lower() == "transactions"
            ):
                raise SyntaxError(
                    "cypher: expected TRANSACTIONS after CALL { } IN"
                )
            self.next()
            if not has_mut:
                raise ValueError(
                    "cypher: IN TRANSACTIONS applies to updating CALL "
                    "subqueries only"
                )
            t = self.peek()
            if t[0] in ("ident", "kw") and t[1].lower() == "of":
                self.next()
                if self.peek()[0] != "num":
                    raise SyntaxError(
                        "cypher: expected a row count after OF"
                    )
                self.next()
                t = self.peek()
                if not (
                    t[0] in ("ident", "kw") and t[1].lower() == "rows"
                ):
                    raise SyntaxError(
                        "cypher: expected ROWS after the batch size"
                    )
                self.next()
        return CallC(body, imports, unit=has_mut)

    def procedure_call(self):
        """CALL db.labels() [YIELD col [AS alias], ...] — the read-only
        introspection procedures a migrating Neo4j user runs first.
        Anything outside the supported set raises with the list."""
        name_parts = [self.ident()]
        while self.peek() == ("op", "."):
            self.next()
            name_parts.append(self.ident())
        name = ".".join(name_parts)
        if name in _NOOP_PROCEDURES:
            self.expect("op", "(")
            args = []
            if self.peek() != ("op", ")"):
                while True:
                    args.append(self.expr())
                    if self.peek() == ("op", ","):
                        self.next()
                        continue
                    break
            self.expect("op", ")")
            want = _NOOP_PROCEDURES[name]
            if want is not None and len(args) != want:
                raise ValueError(
                    f"cypher: {name}() takes {want} argument(s), got {len(args)}"
                )
            t = self.peek()
            if t[0] == "ident" and t[1].lower() == "yield":
                raise ValueError(
                    f"cypher: {name}() is a void procedure — nothing to YIELD"
                )
            return ProcC(name, None, args)
        if name not in _PROCEDURES:
            raise ValueError(
                f"cypher: procedure {name}() is not supported — available: "
                + ", ".join(sorted(set(_PROCEDURES) | set(_NOOP_PROCEDURES)))
                + " (write/admin procedures have no Spark analog)"
            )
        self.expect("op", "(")
        if self.peek() != ("op", ")"):
            raise ValueError(f"cypher: {name}() takes no arguments")
        self.next()
        yields = None
        t = self.peek()
        if t[0] == "ident" and t[1].lower() == "yield":
            self.next()
            yields = []
            while True:
                col = self.ident()
                alias = None
                if self.at_kw("as"):
                    self.next()
                    alias = self.ident()
                yields.append((col, alias))
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
        return ProcC(name, yields)

    def foreach_clause(self):
        """FOREACH (x IN list | <mutating clauses>) — per-element
        mutations (openCypher: the body allows only updating clauses;
        the outer binding table is unchanged)."""
        self.expect("kw", "foreach")
        self.expect("op", "(")
        var = self.expect("ident")[1]
        t = self.next()
        if not (t[0] in ("ident", "kw") and t[1].lower() == "in"):
            raise SyntaxError(f"cypher: expected IN in FOREACH, got {t}")
        e = self.expr()
        self.expect("op", "|")
        body = []
        while self.peek() != ("op", ")"):
            t = self.peek()
            if t[0] != "kw":
                raise SyntaxError(f"cypher: expected clause keyword, got {t}")
            kw = t[1].lower()
            if kw == "create":
                body.append(self.create_clause())
            elif kw == "merge":
                body.append(self.merge_clause())
            elif kw == "set":
                body.append(self.set_clause())
            elif kw in ("delete", "detach"):
                body.append(self.delete_clause())
            elif kw == "remove":
                body.append(self.remove_clause())
            elif kw == "foreach":
                body.append(self.foreach_clause())
            else:
                raise ValueError(
                    f"cypher: FOREACH body allows only updating clauses "
                    f"(CREATE/MERGE/SET/REMOVE/DELETE/FOREACH), got {kw.upper()}"
                )
        self.expect("op", ")")
        if not body:
            raise SyntaxError("cypher: empty FOREACH body")
        return ForeachC(var, e, body)

    def remove_clause(self):
        """REMOVE n.prop / REMOVE n:Label [, ...] — property removal is a
        typed-NULL update; label removal subtracts the label from the
        node's label set (round 13 multi-label model), nulling the
        column when the set empties; removing a label the node doesn't
        carry is a no-op, exactly Neo4j's behavior."""
        self.expect("kw", "remove")
        items, labels = [], []
        while True:
            var = self.expect("ident")[1]
            if self.peek() == ("op", ":"):
                while self.peek() == ("op", ":"):
                    self.next()
                    labels.append((var, self.ident()))
            else:
                self.expect("op", ".")
                items.append((var, self.ident()))
            if self.peek() == ("op", ","):
                self.next()
                continue
            break
        return RemoveC(items, labels)

    def delete_clause(self):
        detach = False
        if self.at_kw("detach"):
            self.next()
            detach = True
        self.expect("kw", "delete")
        names = [self.expect("ident")[1]]
        while self.peek() == ("op", ","):
            self.next()
            names.append(self.expect("ident")[1])
        return DeleteC(names, detach)

    # -- patterns -----------------------------------------------------------

    def path_element(self):
        """One element of a MATCH pattern list: a plain path,
        shortestPath(path), or p = shortestPath(path). General path
        variables (p = (a)-[:R]->(b)) stay gated — only shortestPath
        produces a bindable (length-only) path here."""
        pathvar = None
        t, t1 = self.peek(), self.peek(1)
        if t[0] == "ident" and t1 == ("op", "="):
            # patterns proper always start with '(' — ident '=' can only
            # open a path-variable assignment
            pathvar = self.next()[1]
            self.next()  # =
        t = self.peek()
        if t[0] == "ident" and t[1].lower() in ("shortestpath", "allshortestpaths"):
            fn = self.next()[1]
            self.expect("op", "(")
            p = self.path()
            self.expect("op", ")")
            if len(p.edges) != 1 or p.edges[0].hops is None:
                raise ValueError(
                    "cypher: shortestPath needs a single variable-length "
                    "relationship, e.g. shortestPath((a)-[:T*..5]->(b))"
                )
            if p.edges[0].qpp:
                raise ValueError(
                    "cypher: shortestPath over a quantified path "
                    "pattern is unsupported — use -[:T*lo..hi]->"
                )
            p.shortest = True
            p.all_shortest = fn.lower() == "allshortestpaths"
            p.pathvar = pathvar
            return p
        p = self.path()
        if pathvar is not None:
            # general path variable (round 10): fixed-length patterns —
            # every node and relationship is individually bound, so
            # nodes(p)/relationships(p)/length(p) are exact arrays.
            # Round 11: ALSO a single variable-length relationship
            # (p = (a)-[:T*1..3]->(b)) — per-path enumeration with
            # relationship uniqueness (_varlength_paths), one row PER
            # path, exact nodes()/relationships()/length().
            if any(e.hops is not None for e in p.edges):
                if len(p.edges) != 1:
                    raise ValueError(
                        "cypher: a path variable over a variable-length "
                        "relationship supports exactly one relationship "
                        "in the pattern (p = (a)-[:T*1..3]->(b))"
                    )
                p.pathvar = pathvar
                return p
            if any(
                n.var is None and n.label is None and not n.props
                for n in p.nodes
            ):
                raise ValueError(
                    "cypher: a path variable needs every node bindable — "
                    "name or constrain the anonymous () nodes"
                )
            p.pathvar = pathvar
        return p

    def path(self):
        nodes, edges = [self.node_pat()], []
        while True:
            t = self.peek()
            if t[0] == "arrow" and t[1] in ("-[", "<-["):
                edges.append(self.edge_pat())
                nodes.append(self.node_pat())
                continue
            if t == ("op", "("):
                # juxtaposed group = quantified path pattern (round 11):
                # (x) ((a)-[:R]->(b)){1,3} (y)
                edges.append(self.qpp_group())
                nodes.append(self.node_pat())
                continue
            break
        return PathPat(nodes, edges)

    def qpp_group(self):
        """((a)-[:R]->(b)){lo,hi} / + / * / {n} — openCypher
        quantified path pattern. Inner node patterns become per-step
        constraints (every step's source satisfies the left pattern,
        every step's target the right one — interior nodes therefore
        satisfy both, which is exactly the unification juxtaposition
        implies). Inner VARIABLES are group variables (round 12: list
        bindings, single-relationship bodies only); zero-length
        quantifiers unify the outer nodes. MULTI-relationship bodies
        (round 12) quantify the whole anonymous chain as one composite
        step."""
        self.expect("op", "(")
        inner = self.path()
        self.expect("op", ")")
        if any(e2.hops is not None for e2 in inner.edges):
            raise ValueError(
                "cypher: a variable-length relationship cannot be "
                "nested inside a quantified path pattern"
            )
        t = self.peek()
        if t == ("op", "+"):
            self.next()
            lo, hi = 1, None
        elif t == ("op", "*"):
            # round 12: zero-length included — the zero repetition
            # unifies the juxtaposed outer nodes (no inner constraints
            # apply, per openCypher's GPM semantics)
            self.next()
            lo, hi = 0, None
        elif t == ("op", "{"):
            self.next()
            lo = int(self.next()[1]) if self.peek()[0] == "num" else 0
            if self.peek() == ("op", ","):
                self.next()
                hi = (
                    int(self.next()[1])
                    if self.peek()[0] == "num" else None
                )
            else:
                hi = lo
            self.expect("op", "}")
        else:
            raise SyntaxError(
                f"cypher: expected a quantifier after the pattern "
                f"group, got {t}"
            )
        if len(inner.edges) == 1 and not (
            inner.nodes[0].var is not None
            and inner.nodes[0].var == inner.nodes[1].var
        ):
            left, right = inner.nodes
            epat = inner.edges[0]
            qsrc = left if (left.label or left.props) else None
            qdst = right if (right.label or right.props) else None
            return EdgePat(
                None, epat.rel, epat.props, epat.direction, (lo, hi),
                qpp=True, qpp_src=qsrc, qpp_dst=qdst,
                qpp_vars=(left.var, epat.var, right.var),
            )
        # A single-edge body with the SAME node variable on both ends
        # (((a)-[:R]->(a)){n}) falls through to the composite-body
        # path: its per-repetition unification applies the src==dst
        # step constraint and binds the group variable exactly once
        # (the fast single-edge representation would neither unify nor
        # gate — round-14 ADVICE fix).
        # multi-relationship body (round 12); round 13 adds GROUP
        # VARIABLES over the composite step — per-position list
        # bindings sliced from the enriched path frame — and
        # PER-REPETITION UNIFICATION for a NODE variable repeated
        # across body positions (openCypher: juxtaposed equal names
        # mean the same node within each repetition, e.g.
        # ((a)-->(x)-->(a)){n} walks out-and-back pairs). A repeated
        # RELATIONSHIP variable stays an error, as in Neo4j.
        body_nv = tuple(n.var for n in inner.nodes)
        body_ev = tuple(e2.var for e2 in inner.edges)
        enamed = [v for v in body_ev if v]
        if len(enamed) != len(set(enamed)) or set(enamed) & {
            v for v in body_nv if v
        }:
            raise ValueError(
                "cypher: a relationship variable cannot be repeated "
                "(or shared with a node variable) inside a quantified "
                "path pattern body"
            )
        by_name: dict[str, list[int]] = {}
        for j, nv in enumerate(body_nv):
            if nv:
                by_name.setdefault(nv, []).append(j)
        unify = tuple(
            tuple(ps) for ps in by_name.values() if len(ps) > 1
        )
        return EdgePat(
            None, None, {}, "out", (lo, hi),
            qpp=True, qpp_body=inner,
            qpp_body_vars=(body_nv, body_ev),
            qpp_body_unify=unify,
        )

    def node_pat(self):
        self.expect("op", "(")
        var = label = None
        props = {}
        if self.peek()[0] == "ident":
            var = self.next()[1]
        if self.peek() == ("op", ":"):
            labels = []
            while self.peek() == ("op", ":"):
                self.next()
                labels.append(self.ident())
            # multi-labels (n:A:B) canonicalize to sorted ':'-joined
            label = ":".join(sorted(set(labels)))
        if self.peek() == ("op", "{"):
            props = self.prop_map()
        self.expect("op", ")")
        return NodePat(var, label, props)

    def edge_pat(self):
        head = self.next()  # '-[' or '<-['
        direction = "in" if head[1] == "<-[" else None
        var = rel = None
        props = {}
        if self.peek()[0] == "ident":
            var = self.next()[1]
        if self.peek() == ("op", ":"):
            self.next()
            rel = self.ident()
        hops = None
        if self.peek() == ("op", "*"):
            self.next()
            lo, hi = 1, None
            if self.peek()[0] == "num":
                lo = int(self.next()[1])
                hi = lo  # *2 = exactly 2 (openCypher)
            if self.peek() == ("op", "."):  # '..'
                self.next()
                self.expect("op", ".")
                hi = int(self.next()[1]) if self.peek()[0] == "num" else None
            hops = (lo, hi)
        if self.peek() == ("op", "{"):
            props = self.prop_map()
        tail = self.next()  # ']->' or ']-'
        if tail[0] != "arrow" or tail[1] not in ("]->", "]-"):
            raise SyntaxError(f"cypher: bad edge pattern end {tail}")
        if direction is None:
            direction = "out" if tail[1] == "]->" else "any"
        elif tail[1] == "]->":
            raise SyntaxError("cypher: <-[...]-> is not a valid pattern")
        return EdgePat(var, rel, props, direction, hops)

    def prop_map(self):
        self.expect("op", "{")
        items = {}
        if self.peek() != ("op", "}"):
            while True:
                k = self.ident()
                self.expect("op", ":")
                items[k] = self.expr()
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
        self.expect("op", "}")
        return items

    # -- expressions --------------------------------------------------------

    def expr(self):
        return self.or_expr()

    def or_expr(self):
        e = self.and_expr()
        while self.at_kw("or"):
            self.next()
            e = Bin("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.at_kw("and"):
            self.next()
            e = Bin("and", e, self.not_expr())
        return e

    def not_expr(self):
        if self.at_kw("not"):
            self.next()
            return Func("not", [self.not_expr()])
        return self.cmp_expr()

    def cmp_expr(self):
        e = self.add_expr()
        t = self.peek()
        if t[0] == "op" and t[1] in ("=", "<>", "!=", "<", "<=", ">", ">=", "=~"):
            op = self.next()[1]
            e = Bin("=" if op == "=" else op, e, self.add_expr())
        elif self.at_kw("in"):
            self.next()
            e = Bin("in", e, self.add_expr())
        elif self.at_kw("starts", "ends"):
            which = self.next()[1].lower()
            self.expect("kw", "with")
            e = Bin("startswith" if which == "starts" else "endswith", e, self.add_expr())
        elif self.at_kw("contains"):
            self.next()
            e = Bin("contains", e, self.add_expr())
        # IS [NOT] NULL postfixes the comparison (Cypher binds it tightest
        # of the predicate forms; `a = b IS NULL` is not legal Cypher so
        # applying it to the whole comparison never changes a legal query)
        if self.at_kw("is"):
            self.next()
            neg = self.at_kw("not")
            if neg:
                self.next()
            self.expect("kw", "null")
            e = Func("isnotnull" if neg else "isnull", [e])
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = Bin(op, e, self.mul_expr())
        return e

    def mul_expr(self):
        e = self.unary_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            e = Bin(op, e, self.unary_expr())
        return e

    def unary_expr(self):
        if self.peek() == ("op", "-"):
            self.next()
            return Bin("-", Lit(0), self.unary_expr())
        return self.postfix_expr()

    def postfix_expr(self):
        e = self.primary()
        while True:
            t = self.peek()
            if t == ("op", "."):
                self.next()
                e = Prop(e, self.ident())
            elif t == ("op", "["):
                self.next()
                if (
                    self.peek()[0] == "num"
                    and self.peek(1) == ("op", "]")
                ):
                    e = Index(e, int(self.next()[1]))
                else:
                    # round 11: general subscript — x[$key], x['name'],
                    # x[i + 1]
                    e = Index(e, self.expr())
                self.expect("op", "]")
            elif (
                t == ("op", ":")
                and isinstance(e, Var)
                and self.peek(1)[0] in ("ident", "kw")
            ):
                # round 13: label test n:A[:B] as a boolean expression.
                # Unambiguous here — ':' otherwise appears only in map
                # literals (keys are consumed by prop_map, never after
                # a parsed operand) and node patterns (own parser).
                labels = []
                while self.peek() == ("op", ":"):
                    self.next()
                    labels.append(self.ident())
                e = LabelTest(e, ":".join(sorted(set(labels))))
            else:
                return e

    def case_expr(self):
        """CASE [subject] WHEN ... THEN ... [ELSE ...] END — both the
        simple (value-match) and searched (predicate) forms."""
        self.expect("kw", "case")
        subject = (
            None if self.at_kw("when", "else", "end") else self.expr()
        )
        whens = []
        while self.at_kw("when"):
            self.next()
            w = self.expr()
            self.expect("kw", "then")
            whens.append((w, self.expr()))
        if not whens:
            raise SyntaxError("cypher: CASE needs at least one WHEN ... THEN")
        default = None
        if self.at_kw("else"):
            self.next()
            default = self.expr()
        self.expect("kw", "end")
        return Case(subject, whens, default)

    def primary(self):
        if self.at_kw("case"):
            return self.case_expr()
        t = self.next()
        if t[0] == "num":
            return Lit(float(t[1]) if "." in t[1] else int(t[1]))
        if t[0] == "str":
            return Lit(t[1][1:-1])
        if t[0] == "param":
            return Param(t[1][1:])
        if t[0] == "kw" and t[1].lower() in ("true", "false"):
            return Lit(t[1].lower() == "true")
        if t[0] == "kw" and t[1].lower() == "null":
            return Lit(None)
        if t[0] == "op" and t[1] == "(":
            # bare pattern predicate (round 11, openCypher legacy
            # form): WHERE (n)-[:T]->() is exists(<pattern>). Probe by
            # backtracking — a path with >=1 edge is unambiguous (a
            # parenthesized expression can never continue with -[ / <-)
            save = self.i
            self.i -= 1  # re-include the '(' for path()
            try:
                cand = self.path()
                if len(cand.edges) >= 1:
                    return PatternPred(cand)
            except (SyntaxError, ValueError):
                pass
            self.i = save
            e = self.expr()
            self.expect("op", ")")
            return e
        if t[0] == "op" and t[1] == "{":
            self.i -= 1
            return MapLit(self.prop_map())
        if t[0] == "op" and t[1] == "[":
            # pattern comprehension: [(a)-[:R]->(b) WHERE pred | expr].
            # Backtracking probe: "[(" could also open a parenthesized
            # expression inside a list literal, so only commit when a
            # path with >=1 edge parses AND the required | (or WHERE)
            # follows.
            if self.peek() == ("op", "("):
                save = self.i
                path = None
                try:
                    cand = self.path()
                    if len(cand.edges) >= 1 and (
                        self.at_kw("where") or self.peek() == ("op", "|")
                    ):
                        path = cand
                except (SyntaxError, ValueError):
                    pass
                if path is not None:
                    pred = None
                    if self.at_kw("where"):
                        self.next()
                        pred = self.expr()
                    self.expect("op", "|")
                    mapped = self.expr()
                    self.expect("op", "]")
                    return PatternComp(path, pred, mapped)
                self.i = save
            # list comprehension: [x IN list WHERE pred | expr]
            nxt, nxt2 = self.peek(), self.peek(1)
            if (
                nxt[0] == "ident"
                and nxt2[0] in ("ident", "kw")
                and nxt2[1].lower() == "in"
            ):
                var = self.next()[1]
                self.next()  # IN
                src = self.expr()
                pred = mapped = None
                if self.at_kw("where"):
                    self.next()
                    pred = self.expr()
                if self.peek() == ("op", "|"):
                    self.next()
                    mapped = self.expr()
                self.expect("op", "]")
                return ListComp(var, src, pred, mapped)
            items = []
            if self.peek() != ("op", "]"):
                items.append(self.expr())
                while self.peek() == ("op", ","):
                    self.next()
                    items.append(self.expr())
            self.expect("op", "]")
            return ListLit(items)
        if t[0] == "ident":
            if (
                t[1].lower() in ("duration", "point")
                and self.peek() == ("op", ".")
                and self.peek(1)[0] == "ident"
                and self.peek(2) == ("op", "(")
            ):
                # namespaced builtin call: duration.between(...) /
                # point.distance(...) — scoped to the known namespaces
                # so property access on a call result stays a Prop
                self.next()  # .
                member = self.next()[1]
                t = (t[0], f"{t[1]}.{member}")
            if (
                t[1].lower() == "apoc"
                and self.peek() == ("op", ".")
                and self.peek(1)[0] in ("ident", "kw")
                and self.peek(2) == ("op", ".")
                and self.peek(3)[0] in ("ident", "kw")
                and self.peek(4) == ("op", "(")
            ):
                # apoc FUNCTION namespace (round 14): apoc.<ns>.<fn>(...)
                # — the compatibility subset _apoc_fn implements;
                # unknown members raise there with the supported list.
                # Members may collide with Cypher keywords
                # (apoc.map.MERGE), hence the kw acceptance.
                self.next()  # .
                ns = self.next()[1]
                self.next()  # .
                member = self.next()[1]
                t = (t[0], f"apoc.{ns}.{member}")
            if t[1].lower() == "exists" and self.peek() == ("op", "{"):
                # EXISTS { [MATCH] p1[, p2 ...] [WHERE pred] } — the
                # openCypher existential subquery (round 11); compiles
                # to the same flag-column join as exists(<pattern>)
                self.next()  # {
                if self.at_kw("match"):
                    self.next()
                paths = [self.path()]
                while self.peek() == ("op", ","):
                    self.next()
                    paths.append(self.path())
                where = None
                if self.at_kw("where"):
                    self.next()
                    where = self.expr()
                self.expect("op", "}")
                return PatternPred(paths[0], tuple(paths[1:]), where)
            if self.peek() == ("op", "("):
                self.next()
                # exists((a)-[:R]->(b)): pattern predicate (backtracking —
                # exists(expr) with a parenthesized expression stays legal)
                if t[1].lower() == "exists" and self.peek() == ("op", "("):
                    save = self.i
                    try:
                        cand = self.path()
                        if len(cand.edges) >= 1 and self.peek() == ("op", ")"):
                            self.next()
                            return PatternPred(cand)
                    except (SyntaxError, ValueError):
                        pass
                    self.i = save
                lname = t[1].lower()
                if lname in ("all", "any", "none", "single"):
                    # quantifier: all(x IN list WHERE pred) — only when
                    # the 'var IN' shape follows (all(...) with a plain
                    # expression stays a normal unsupported-function call)
                    nxt, nxt2 = self.peek(), self.peek(1)
                    if (
                        nxt[0] == "ident"
                        and nxt2[0] in ("ident", "kw")
                        and nxt2[1].lower() == "in"
                    ):
                        var = self.next()[1]
                        self.next()  # IN
                        src = self.expr()
                        self.expect("kw", "where")
                        pred = self.expr()
                        self.expect("op", ")")
                        return Quantifier(lname, var, src, pred)
                if lname == "reduce":
                    # reduce(acc = init, x IN list | body)
                    acc = self.expect("ident")[1]
                    self.expect("op", "=")
                    init = self.expr()
                    self.expect("op", ",")
                    var = self.expect("ident")[1]
                    tin = self.next()
                    if not (tin[0] in ("ident", "kw") and tin[1].lower() == "in"):
                        raise SyntaxError(
                            f"cypher: expected IN in reduce(), got {tin}"
                        )
                    src = self.expr()
                    self.expect("op", "|")
                    body = self.expr()
                    self.expect("op", ")")
                    return Reduce(acc, init, var, src, body)
                distinct = False
                if self.at_kw("distinct"):
                    if lname not in _AGG_FNS:
                        raise ValueError(
                            f"cypher: DISTINCT inside {t[1]}() — only "
                            "aggregate functions take DISTINCT"
                        )
                    self.next()
                    distinct = True
                args = []
                if self.peek() == ("op", "*"):
                    self.next()
                    args = [Var("*")]
                elif self.peek() != ("op", ")"):
                    args.append(self.expr())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.expr())
                self.expect("op", ")")
                return Func(t[1], args, distinct)
            return Var(t[1])
        raise SyntaxError(f"cypher: unexpected token {t}")


def parse(query: str):
    return _Parser(_tokenize(query)).parse()


# ---------------------------------------------------------------------------
# Compiler / executor
# ---------------------------------------------------------------------------

LABEL_COL = "label"


@dataclass
class _PendingCreate:
    kind: str  # 'node' | 'edge'
    df: DataFrame  # evaluated property rows (no ids yet)


@dataclass
class _PendingMerge:
    kind: str  # 'node' | 'edge'
    df: DataFrame  # key columns (+ SET-folded prop columns)
    keys: list  # identity columns: pattern label/props (node), src/dst/rel (edge)


@dataclass
class _Ctx:
    df: DataFrame | None = None
    sort: list = field(default_factory=list)  # [(expr, asc)] of last ORDER BY
    created: dict = field(default_factory=dict)  # var -> _PendingCreate
    ops: list = field(default_factory=list)  # deferred graph mutations
    order_col: str | None = None  # FOREACH element order (SET last-wins)
    call_keys: list = field(default_factory=list)  # hidden correlated-CALL
    # join-key columns (__ck_*) every projection must group by / carry


class CypherSession:
    """neo4j-driver-shaped entry point: ``session.run(query, **params)``.

    Read queries return a DataFrame (column names follow Cypher
    conventions: the AS alias, else the expression text). Mutating
    queries update ``self.graph`` (immutable snapshots — the previous
    Graph value stays valid) and return None.
    """

    def __init__(self, graph: Graph, seed: int = 42):
        edges = graph.edges
        if "eid" not in edges.columns:
            w = Window.orderBy("src", "dst", *(
                ["relationship"] if "relationship" in edges.columns else []
            ))
            edges = edges.withColumn("eid", F.row_number().over(w).cast("long"))
        self.graph = Graph(graph.vertices, edges)
        self.seed = seed
        self._lambda_env: dict[str, Column] = {}  # list-comprehension vars
        self._anon = 0  # session-wide fresh-name counter: anonymous
        # pattern columns (_r1, _n2, ...) must be unique ACROSS clauses,
        # or two MATCHes' hidden columns silently equi-join on the
        # shared name (round-6 review finding)

    # -- public API ---------------------------------------------------------

    def run(self, query: str, **params) -> DataFrame | None:
        stripped = query.lstrip()
        # \b + \s* so any whitespace after the keyword works (tab,
        # CRLF, multiple spaces) — the old "first 8 chars" check let
        # 'EXPLAIN\tMATCH ...' fall through and execute (round-7 advice)
        explain_m = re.match(r"EXPLAIN\b\s*", stripped, re.IGNORECASE)
        if explain_m:
            # Neo4j's EXPLAIN prefix: compile, don't execute — one row
            # per line of the Catalyst-optimized + physical plan, the
            # first-session tool a migrating user reaches for
            lines = self.explain(stripped[explain_m.end():], **params).splitlines()
            spark = self.graph.vertices.sparkSession
            return spark.createDataFrame(
                [(i, ln) for i, ln in enumerate(lines)], "line int, plan string"
            )
        segments = parse(query)
        if len(segments) == 1:
            return self._run_clauses(segments[0][0], params)
        # UNION [ALL]: compile each segment through the same pipeline and
        # combine. Neo4j rules enforced: parts are RETURN queries (no
        # mutations), identical return column names, no mixing UNION with
        # UNION ALL. Bare UNION = distinct rows, like SQL.
        flags = {flag for _, flag in segments[1:]}
        if len(flags) > 1:
            raise ValueError("cypher: cannot mix UNION and UNION ALL")
        union_all = flags.pop()
        parts = []
        for clauses, _ in segments:
            for c in clauses:
                if isinstance(c, (CreateC, MergeC, SetC, DeleteC, RemoveC, ForeachC)):
                    raise ValueError(
                        "cypher: mutating clauses are not allowed in UNION parts"
                    )
            df = self._run_clauses(clauses, params)
            if df is None:
                raise ValueError("cypher: every UNION part must RETURN")
            parts.append(df)
        cols0 = parts[0].columns
        types0 = {f.name: f.dataType for f in parts[0].schema.fields}
        for df in parts[1:]:
            if sorted(df.columns) != sorted(cols0):
                raise ValueError(
                    "cypher: all UNION parts must return the same columns "
                    f"({cols0} vs {df.columns})"
                )
            for f in df.schema.fields:
                # explicit gate: under ANSI mode Spark would coerce e.g.
                # string->bigint here and fail LAZILY with a runtime cast
                # error on the first incompatible value — a clear eager
                # error beats that
                if f.dataType != types0[f.name]:
                    raise ValueError(
                        "cypher: UNION parts have incompatible column "
                        f"types for {f.name!r} ({types0[f.name].simpleString()} "
                        f"vs {f.dataType.simpleString()})"
                    )
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out if union_all else out.distinct()


    def explain(self, query: str, **params) -> str:
        """Compile a read query and return Spark's formatted plan text
        WITHOUT executing it. Mutating queries raise BEFORE any clause
        runs (run() applies mutations eagerly, so the guard must come
        from the parse, not the return value)."""
        for clauses, _ in parse(query):
            for c in clauses:
                if isinstance(
                    c, (CreateC, MergeC, SetC, DeleteC, RemoveC, ForeachC)
                ):
                    raise ValueError(
                        "cypher: EXPLAIN requires a read-only RETURN query"
                    )
        df = self.run(query, **params)
        if df is None:
            raise ValueError("cypher: EXPLAIN requires a RETURN query")
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    # apoc FUNCTION compatibility subset (round 14): the expression-
    # level apoc.* calls a migrating Neo4j user reaches for first —
    # every one compiles to built-in Spark SQL functions (pure
    # whole-stage codegen, no UDFs). apoc PROCEDURES (CALL apoc.*)
    # stay gated; the updating CALL { } subquery covers the
    # apoc.periodic.iterate ingest pattern natively.
    _APOC_SUPPORTED = (
        "apoc.coll.sum/avg/min/max/contains/sort/toSet/flatten/"
        "indexOf/reverse/union/unionAll/intersection/subtract/zip, "
        "apoc.text.join/split/replace/clean/capitalize/distance/"
        "indexOf, apoc.map.fromPairs/fromLists/merge/removeKey, "
        "apoc.convert.toJson"
    )

    def _apoc_fn(self, name: str, args: list, df, params):
        a = [self._expr(x, df, params) for x in args]
        n = len(a)

        def need(k):
            if n != k:
                raise ValueError(
                    f"cypher: {name}() takes {k} argument(s), got {n}"
                )

        if name == "apoc.coll.sum":
            need(1)
            # apoc: sum of [] is 0.0 (aggregate keeps the seed)
            return F.aggregate(
                a[0], F.lit(0.0),
                lambda acc, v: acc + v.cast("double"),
            )
        if name == "apoc.coll.avg":
            need(1)
            s = F.aggregate(
                a[0], F.lit(0.0),
                lambda acc, v: acc + v.cast("double"),
            )
            return F.when(F.size(a[0]) > 0, s / F.size(a[0]))
        if name == "apoc.coll.min":
            need(1)
            return F.array_min(a[0])
        if name == "apoc.coll.max":
            need(1)
            return F.array_max(a[0])
        if name == "apoc.coll.contains":
            need(2)
            return F.array_contains(a[0], a[1])
        if name == "apoc.coll.sort":
            need(1)
            return F.sort_array(a[0])
        if name == "apoc.coll.toset":
            need(1)
            return F.array_distinct(a[0])
        if name == "apoc.coll.flatten":
            need(1)
            return F.flatten(a[0])
        if name == "apoc.coll.indexof":
            need(2)
            # apoc: -1 when absent; array_position is 1-based, 0=absent
            return (F.array_position(a[0], a[1]) - 1).cast("long")
        if name == "apoc.coll.reverse":
            need(1)
            return F.reverse(a[0])
        if name == "apoc.coll.union":
            need(2)
            # apoc union = distinct union (unionAll keeps duplicates)
            return F.array_distinct(F.concat(a[0], a[1]))
        if name == "apoc.coll.unionall":
            need(2)
            return F.concat(a[0], a[1])
        if name == "apoc.coll.intersection":
            need(2)
            return F.array_intersect(a[0], a[1])
        if name == "apoc.coll.subtract":
            need(2)
            return F.array_except(a[0], a[1])
        if name == "apoc.coll.zip":
            need(2)
            return F.zip_with(
                a[0], a[1], lambda x, y: F.array(x, y)
            )
        def lit_str(i, what):
            # several Spark string functions take the pattern/delimiter
            # as a PYTHON string, not a column — extract it from a
            # literal argument, gate loudly otherwise
            if isinstance(args[i], Lit) and isinstance(args[i].value, str):
                return args[i].value
            raise ValueError(
                f"cypher: {name}() needs a literal string {what}"
            )

        if name == "apoc.text.join":
            need(2)
            return F.array_join(a[0], lit_str(1, "delimiter"))
        if name == "apoc.text.split":
            need(2)
            return F.split(a[0], lit_str(1, "regex"))
        if name == "apoc.text.replace":
            need(3)
            return F.regexp_replace(a[0], a[1], a[2])
        if name == "apoc.text.clean":
            need(1)
            # apoc: lowercase, strip everything non-alphanumeric
            return F.regexp_replace(F.lower(a[0]), "[^a-z0-9]", "")
        if name == "apoc.text.capitalize":
            need(1)
            # first character uppercased, the rest untouched (NOT
            # initcap, which would also lowercase/retitle the tail)
            return F.concat(
                F.upper(F.substring(a[0], 1, 1)),
                F.substr(a[0], F.lit(2)),
            )
        if name == "apoc.text.distance":
            need(2)
            return F.levenshtein(a[0], a[1]).cast("long")
        if name == "apoc.text.indexof":
            need(2)
            return (F.instr(a[0], lit_str(1, "substring")) - 1).cast(
                "long"
            )
        if name == "apoc.map.frompairs":
            need(1)
            # typed-engine constraint: each [k, v] pair is a Spark
            # ARRAY, so k and v must share one element type (a mixed
            # ['x', 7] literal cannot type as an array — use
            # fromLists for split key/value lists of different types)
            return F.map_from_entries(F.transform(
                a[0],
                lambda p: F.struct(
                    F.element_at(p, 1).cast("string").alias("key"),
                    F.element_at(p, 2).alias("value"),
                ),
            ))
        if name == "apoc.map.fromlists":
            need(2)
            return F.map_from_arrays(a[0], a[1])
        if name == "apoc.map.merge":
            need(2)
            # right side wins on key conflicts (apoc semantics).
            # Cypher MAP LITERALS compile to Spark STRUCTS in this
            # engine, so structs merge schema-statically; true maps
            # (e.g. fromPairs results) merge via map_concat with the
            # overlapping left keys dropped (map_concat raises on
            # duplicates under the default EXCEPTION dedup policy)
            da, db = self._dtype_of(a[0], df), self._dtype_of(a[1], df)
            if isinstance(da, T.StructType) and isinstance(
                db, T.StructType
            ):
                keep = [f for f in da.names if f not in set(db.names)]
                return F.struct(
                    *[a[0].getField(f).alias(f) for f in keep],
                    *[a[1].getField(f).alias(f) for f in db.names],
                )
            return F.map_concat(
                F.map_filter(
                    a[0],
                    lambda k, v: ~F.array_contains(F.map_keys(a[1]), k),
                ),
                a[1],
            )
        if name == "apoc.map.removekey":
            need(2)
            dm = self._dtype_of(a[0], df)
            if isinstance(dm, T.StructType):
                key = lit_str(1, "key")
                keep = [f for f in dm.names if f != key]
                return F.struct(
                    *[a[0].getField(f).alias(f) for f in keep]
                )
            return F.map_filter(a[0], lambda k, v: k != a[1])
        if name == "apoc.convert.tojson":
            need(1)
            return F.to_json(a[0])
        raise ValueError(
            f"cypher: unsupported apoc function {name}() — supported: "
            f"{self._APOC_SUPPORTED}; apoc PROCEDURES (CALL apoc.*) "
            "are not implemented (use the native equivalents; "
            "CALL { ... } IN TRANSACTIONS covers periodic.iterate "
            "ingest)"
        )

    def _run_clauses(self, clauses, params) -> DataFrame | None:
        if (
            clauses
            and isinstance(clauses[-1], CallC)
            and not clauses[-1].unit
        ):
            # Neo4j's rule; without it the subquery's rows would be
            # silently dropped (run() would return None). A UNIT
            # (updating) subquery is exempt: it returns nothing by
            # definition, so it is a legal final clause.
            raise ValueError(
                "cypher: a query cannot conclude with CALL — add RETURN"
            )
        ctx = _Ctx()
        result = self._dispatch(ctx, clauses, params)
        self._apply(ctx)
        return result

    def _dispatch(self, ctx: _Ctx, clauses, params) -> DataFrame | None:
        """Run a clause list against an existing context (no _apply) —
        the shared loop for top-level queries and CALL subqueries."""
        result = None
        i = 0
        while i < len(clauses):
            c = clauses[i]
            if isinstance(c, MatchC):
                self._match(ctx, c, params)
            elif isinstance(c, ReturnC):
                result = self._project(ctx, c, params)
            elif isinstance(c, WithC):
                ctx.df = self._project(ctx, c, params)
            elif isinstance(c, CreateC):
                self._create(ctx, c, params)
            elif isinstance(c, MergeC):
                self._merge(ctx, c, params)
            elif isinstance(c, SetC):
                self._set(ctx, c, params)
            elif isinstance(c, DeleteC):
                self._delete(ctx, c)
            elif isinstance(c, RemoveC):
                self._remove(ctx, c)
            elif isinstance(c, ForeachC):
                self._foreach(ctx, c, params)
            elif isinstance(c, CallC):
                self._call(ctx, c, params)
            elif isinstance(c, ProcC):
                self._proc(ctx, c)
            elif isinstance(c, UnwindC):
                self._unwind(ctx, c, params)
            elif isinstance(c, LoadCsvC):
                self._load_csv(ctx, c)
            i += 1
        if result is None and clauses and isinstance(clauses[-1], ProcC):
            # standalone procedure CALL: its rows ARE the result (Neo4j
            # allows omitting RETURN for a trailing procedure call); a
            # standalone VOID procedure returns the Neo4j "no records"
            # shape — zero rows, zero columns
            if ctx.df is None:
                from pyspark.sql import types as _T

                result = self.graph.vertices.sparkSession.createDataFrame(
                    [], _T.StructType([])
                )
            else:
                result = ctx.df
        return result

    # -- MATCH --------------------------------------------------------------

    # -- labels ---------------------------------------------------------
    # Multi-label storage (round 13, VERDICT r12 Next #5): the single
    # `label` string column holds one OR MORE labels ':'-joined in
    # sorted order ("A:B"). The public Graph contract (a plain string
    # label column) is unchanged — single-label graphs never see a ':'.
    # Every label PREDICATE splits and tests membership, so (n:A)
    # matches both "A" and "A:B"; labels(n) splits; CREATE stores the
    # canonical joined set; REMOVE/SET subtract/add set members.

    @staticmethod
    def _labels_of(col: Column) -> Column:
        """Label set as array<string>; unlabeled -> [] (Neo4j labels())."""
        return F.when(
            col.isNull(), F.array().cast("array<string>")
        ).otherwise(F.split(col, ":"))

    @staticmethod
    def _has_labels(col: Column, joined: str) -> Column:
        """ALL labels of the ':'-joined pattern present in `col`."""
        pred = None
        for lbl in joined.split(":"):
            p = F.array_contains(F.split(col, ":"), lbl)
            pred = p if pred is None else (pred & p)
        return pred

    def _node_frame(self, pat: NodePat, name: str, params) -> DataFrame:
        v = self.graph.vertices
        if pat.label is not None:
            if LABEL_COL not in v.columns:
                raise ValueError(
                    f"graph has no '{LABEL_COL}' column but query uses :{pat.label}"
                )
            v = v.filter(self._has_labels(F.col(LABEL_COL), pat.label))
        for k, e in pat.props.items():
            v = v.filter(F.col(k) == self._expr(e, None, params))
        return v.select(F.struct(*v.columns).alias(name))

    def _edge_frame(self, pat: EdgePat, name: str, params) -> DataFrame:
        e = self.graph.edges
        if pat.rel is not None:
            e = e.filter(F.col("relationship") == pat.rel)
        for k, ex in pat.props.items():
            e = e.filter(F.col(k) == self._expr(ex, None, params))
        return e.select(F.struct(*e.columns).alias(name))

    _VARLEN_MAX_HOPS = 16

    def _varlength_pairs(self, epat: EdgePat, params) -> DataFrame:
        """(src, dst) endpoint pairs connected by a path of between
        hops[0] and hops[1] edges of the pattern's type/direction.

        Semantics: DISTINCT-pairs reachability (one row per connected
        endpoint pair, like a recursive CTE with UNION DISTINCT) — NOT
        Neo4j's one-row-per-path multiplicity, which is combinatorial on
        dense graphs and is exactly what you don't want at scale. Self
        pairs (a,a) are excluded: without per-path edge tracking the
        closure can't tell a genuine cycle from an undirected
        back-and-forth over one edge (which Neo4j's relationship
        uniqueness rule forbids). Plan:
        iterated hash-join frontier expansion with distinct + eager
        localCheckpoint per hop (lineage stays flat); unbounded `*` is
        capped at _VARLEN_MAX_HOPS hops and converges early when the
        frontier empties."""
        step = self._edge_step(epat, params)
        lo, hi = epat.hops
        # validate the USER-SUPPLIED range before applying the hop cap, so
        # *17..20 reports "exceeds max hops", not a garbled "*17..16"
        if lo < 1 or (hi is not None and lo > hi):
            raise ValueError(f"cypher: bad variable-length range *{lo}..{hi}")
        if lo > self._VARLEN_MAX_HOPS or (
            hi is not None and hi > self._VARLEN_MAX_HOPS
        ):
            # an explicit out-of-range bound is an error either way; only
            # the unbounded `*` form is silently capped below
            raise ValueError(
                f"cypher: variable-length range *{lo}.."
                f"{'' if hi is None else hi} exceeds max hops "
                f"({self._VARLEN_MAX_HOPS})"
            )
        hi = hi if hi is not None else self._VARLEN_MAX_HOPS
        frontier = step
        acc = frontier if lo <= 1 else None
        for k in range(2, hi + 1):
            frontier = (
                frontier.alias("f")
                .join(step.alias("s"), F.col("f.dst") == F.col("s.src"))
                .select(F.col("f.src").alias("src"), F.col("s.dst").alias("dst"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            if k >= lo:
                acc = frontier if acc is None else acc.unionAll(frontier)
        if acc is None:  # lo hops exceed every path length
            return step.limit(0)
        return acc.filter(F.col("src") != F.col("dst")).distinct()

    def _varlength_paths(self, epat: EdgePat, params) -> DataFrame:
        """Per-PATH variable-length enumeration for a bound path
        variable (p = (a)-[:T*lo..hi]->(b)): one row per distinct path
        under openCypher's RELATIONSHIP-uniqueness rule (nodes may
        repeat — cycles are real paths; an edge may not, and an
        undirected step may not reuse the edge it just traversed,
        because the edge identity is orientation-independent).

        Returns (src, dst, nodes: array<long>, eids: array<struct>)
        where eids holds the full stored edge struct plus a __dup
        ordinal distinguishing parallel duplicates. Same iterated
        hash-join frontier plan as _varlength_pairs (eager
        localCheckpoint per hop, early convergence, capped hops) —
        no distinct: paths are unique by construction, and the eids
        array IS the path identity. Unlike the bare (reachability)
        form, self pairs are KEPT: edge tracking makes genuine cycles
        distinguishable. A zero lower bound (QPP (...)* / {0,n},
        round 12) contributes ONE zero-length row per graph vertex —
        src = dst, nodes = [v], no edges, no inner constraints (the
        zero repetition imposes none, per openCypher GPM) — unioned
        with the 1..hi enumeration."""
        lo, hi = epat.hops
        min_lo = 0 if epat.qpp else 1
        if lo < min_lo or (hi is not None and lo > hi):
            raise ValueError(f"cypher: bad variable-length range *{lo}..{hi}")
        if lo > self._VARLEN_MAX_HOPS or (
            hi is not None and hi > self._VARLEN_MAX_HOPS
        ):
            raise ValueError(
                f"cypher: variable-length range *{lo}.."
                f"{'' if hi is None else hi} exceeds max hops "
                f"({self._VARLEN_MAX_HOPS})"
            )
        hi = hi if hi is not None else self._VARLEN_MAX_HOPS

        # Spark 4.1: localCheckpoint preserves the ORIGIN plan's
        # constraints on the LogicalRDD, and a self-join-derived
        # frontier can carry a constraint referencing an attribute not
        # in its own output — Union.rewriteConstraints then dies with
        # "key not found: <attr>" on some downstream shapes. Build the
        # whole iteration with constraint propagation off (the
        # checkpointed frames then carry empty constraints and stay
        # safe after the conf is restored).
        sess = self.graph.edges.sparkSession
        ckey = "spark.sql.constraintPropagation.enabled"
        prev = sess.conf.get(ckey, "true")
        sess.conf.set(ckey, "false")
        try:
            zero = None
            if lo == 0:
                ecols = self.graph.edges.columns
                estruct = T.StructType(
                    list(self.graph.edges.schema.fields)
                    + [T.StructField("__dup", T.IntegerType(), False)]
                )
                zero = self.graph.vertices.select(
                    F.col("id").alias("src"),
                    F.col("id").alias("dst"),
                    F.array("id").alias("nodes"),
                    F.array().cast(T.ArrayType(estruct)).alias("eids"),
                ).localCheckpoint(eager=True)
                if hi == 0:
                    return zero
                lo = 1
            walked = self._varlength_paths_inner(epat, params, lo, hi)
            if zero is None:
                return walked
            return zero.unionByName(walked).localCheckpoint(eager=True)
        finally:
            sess.conf.set(ckey, prev)

    def _qpp_node_filter(self, step, npat, col, params):
        """Semi-join `step` on `col` against the vertices matching an
        inner node pattern (label/props) — the per-step constraint
        quantified path patterns impose."""
        if npat is None or not (npat.label or npat.props):
            return step
        v = self.graph.vertices
        if npat.label is not None:
            v = v.filter(self._has_labels(F.col("label"), npat.label))
        for k, ex in npat.props.items():
            v = v.filter(F.col(k) == self._expr(ex, None, params))
        return step.join(v.select(F.col("id").alias(col)), col, "semi")

    def _qpp_edge_frame(self, epat, params) -> DataFrame:
        """One inner relationship as an oriented (_s, _d, _e) frame —
        type/prop-filtered, parallel duplicates ordinal-tagged so each
        is its own edge identity."""
        from pyspark.sql import Window

        e = self.graph.edges
        if epat.rel is not None:
            e = e.filter(F.col("relationship") == epat.rel)
        for k, ex in epat.props.items():
            e = e.filter(F.col(k) == self._expr(ex, None, params))
        ecols = self.graph.edges.columns
        # parallel duplicates get an ordinal so each is its own edge;
        # identical rows are interchangeable, so the row_number tie-break
        # is WLOG deterministic
        w = Window.partitionBy(*ecols).orderBy(F.lit(1))
        ee = e.withColumn("__dup", F.row_number().over(w))
        eid = F.struct(*[F.col(c) for c in ecols], F.col("__dup"))
        fwd = ee.select(
            F.col("src").alias("_s"), F.col("dst").alias("_d"),
            eid.alias("_e"),
        )
        rev = ee.select(
            F.col("dst").alias("_s"), F.col("src").alias("_d"),
            eid.alias("_e"),
        )
        if epat.direction == "out":
            return fwd
        if epat.direction == "in":
            return rev
        return fwd.unionAll(rev)

    def _qpp_step(self, epat: EdgePat, params) -> DataFrame:
        """One QPP REPETITION as a composite step frame
        (_s, _d, _es: array<edge>, _ns: array<long> — the step's
        interior+target nodes in traversal order). A single-edge body
        is the k=1 case; a multi-relationship body (round 12) chains
        its edges with join-on-shared-node and intra-step edge
        uniqueness (openCypher's relationship rule applies across the
        whole path, so it must hold inside a repetition too)."""
        if epat.qpp_body is None:
            step = self._qpp_edge_frame(epat, params)
            # inner node constraints hold at EVERY step — source side
            # satisfies the left inner pattern, target side the right
            # one (interior nodes therefore satisfy both)
            step = self._qpp_node_filter(step, epat.qpp_src, "_s", params)
            step = self._qpp_node_filter(step, epat.qpp_dst, "_d", params)
            return step.select(
                "_s", "_d",
                F.array("_e").alias("_es"),
                F.array("_d").alias("_ns"),
            )
        body = epat.qpp_body
        # round 13: per-repetition unification — a node variable
        # repeated across body positions pins those positions equal
        # within every repetition. anchor[p] = the group's first
        # position; the equality lands as a join-time predicate so
        # Catalyst folds it into the chain join, not a post-filter.
        anchor: dict[int, int] = {}
        for grp in epat.qpp_body_unify:
            for p in grp[1:]:
                anchor[p] = grp[0]
        comp = None
        for i, ep in enumerate(body.edges):
            ef = self._qpp_edge_frame(ep, params)
            ef = self._qpp_node_filter(ef, body.nodes[i], "_s", params)
            ef = self._qpp_node_filter(
                ef, body.nodes[i + 1], "_d", params
            )
            if comp is None:
                if anchor.get(1) == 0:
                    ef = ef.filter(F.col("_s") == F.col("_d"))
                comp = ef.select(
                    "_s",
                    F.col("_d").alias("_cur"),
                    F.array("_e").alias("_es"),
                    F.array("_d").alias("_ns"),
                )
            else:
                cond = F.col("c._cur") == F.col("n._s")
                if i + 1 in anchor:
                    p = anchor[i + 1]
                    prev = (
                        F.col("c._s") if p == 0
                        else F.element_at(F.col("c._ns"), p)
                    )
                    cond = cond & (F.col("n._d") == prev)
                comp = (
                    comp.alias("c")
                    .join(ef.alias("n"), cond)
                    .filter(~F.array_contains(
                        F.col("c._es"), F.col("n._e")
                    ))
                    .select(
                        F.col("c._s").alias("_s"),
                        F.col("n._d").alias("_cur"),
                        F.concat(
                            F.col("c._es"), F.array(F.col("n._e"))
                        ).alias("_es"),
                        F.concat(
                            F.col("c._ns"), F.array(F.col("n._d"))
                        ).alias("_ns"),
                    )
                )
        return comp.withColumnRenamed("_cur", "_d")

    def _varlength_paths_inner(
        self, epat: EdgePat, params, lo: int, hi: int
    ) -> DataFrame:
        step = self._qpp_step(epat, params).localCheckpoint(eager=True)

        frontier = step.select(
            F.col("_s").alias("src"), F.col("_d").alias("dst"),
            F.concat(F.array("_s"), F.col("_ns")).alias("nodes"),
            F.col("_es").alias("eids"),
        ).localCheckpoint(eager=True)
        acc = frontier if lo <= 1 else None
        for k in range(2, hi + 1):
            frontier = (
                frontier.alias("f")
                .join(step.alias("s"), F.col("f.dst") == F.col("s._s"))
                .filter(
                    ~F.arrays_overlap(F.col("f.eids"), F.col("s._es"))
                )
                .select(
                    F.col("f.src").alias("src"),
                    F.col("s._d").alias("dst"),
                    F.concat(
                        F.col("f.nodes"), F.col("s._ns")
                    ).alias("nodes"),
                    F.concat(
                        F.col("f.eids"), F.col("s._es")
                    ).alias("eids"),
                )
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            if k >= lo:
                acc = frontier if acc is None else acc.unionAll(frontier)
        if acc is None:
            return frontier.limit(0)
        # collapse the frontier union into one materialized frame: the
        # enrichment aggregate on top of a Union of checkpointed
        # frontiers trips Spark's union constraint rewrite (key-not-
        # found on a child attribute); one flat scan also keeps the
        # downstream join/groupBy plan shallow
        return acc.localCheckpoint(eager=True)

    def _enrich_path_nodes(self, paths: DataFrame) -> DataFrame:
        """Resolve a path frame's node-id array into full vertex
        structs (same shape as fixed-length __pnodes_ arrays): one
        posexplode → one equi-join on id → regroup on the eids array,
        which uniquely identifies the path, with array_sort restoring
        traversal order. Adds `pnodes: array<struct>`."""
        v = self.graph.vertices
        vstruct = F.struct(*[F.col(c) for c in v.columns])
        lookup = v.select(
            F.col("id").alias("_nid"), vstruct.alias("_nstruct")
        )
        ex = paths.select(
            "src", "dst", "nodes", "eids",
            F.posexplode("nodes").alias("_pos", "_nid"),
        )
        j = ex.join(lookup, "_nid", "left")
        return (
            j.groupBy("src", "dst", "nodes", "eids")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_nstruct"))
                ).alias("_ord")
            )
            .withColumn(
                "pnodes", F.transform("_ord", lambda s: s["_nstruct"])
            )
            .drop("_ord")
        )

    def _edge_step(self, epat: EdgePat, params) -> DataFrame:
        """One-hop (src, dst) step frame for a var-length pattern:
        type/prop-filtered, orientation-normalized, distinct."""
        e = self.graph.edges
        if epat.rel is not None:
            e = e.filter(F.col("relationship") == epat.rel)
        for k, ex in epat.props.items():
            e = e.filter(F.col(k) == self._expr(ex, None, params))
        step = e.select("src", "dst")
        if epat.direction == "in":
            step = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        elif epat.direction == "any":
            step = step.unionAll(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        return step.distinct().localCheckpoint(eager=True)

    def _shortest_pairs(self, epat: EdgePat, params) -> DataFrame:
        """(src, dst, dist) for shortestPath((a)-[:T*..k]->(b)): layered
        BFS over distinct endpoint pairs — a pair's FIRST appearance is
        its minimal hop count, so each frontier anti-joins the known set
        and new pairs are stamped with the current layer. Same
        frontier-expansion plan as _varlength_pairs (hash joins, eager
        localCheckpoint per hop, early convergence), plus one anti-join
        per layer. Self pairs are excluded, as in _varlength_pairs."""
        lo, hi = epat.hops
        if lo != 1:
            raise ValueError(
                "cypher: shortestPath supports a lower bound of 1 "
                f"(got *{lo}..{'' if hi is None else hi}); zero-length "
                "self-paths are not modeled"
            )
        if hi is not None and hi > self._VARLEN_MAX_HOPS:
            raise ValueError(
                f"cypher: variable-length range *{lo}..{hi} exceeds max "
                f"hops ({self._VARLEN_MAX_HOPS})"
            )
        hi = hi if hi is not None else self._VARLEN_MAX_HOPS
        step = self._edge_step(epat, params)
        known = step.withColumn("dist", F.lit(1)).localCheckpoint(eager=True)
        frontier = step
        for k in range(2, hi + 1):
            frontier = (
                frontier.alias("f")
                .join(step.alias("s"), F.col("f.dst") == F.col("s.src"))
                .select(F.col("f.src").alias("src"), F.col("s.dst").alias("dst"))
                .distinct()
                .join(known.select("src", "dst"), ["src", "dst"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            # the accumulated union is re-checkpointed each layer even
            # though every frontier is already materialized: skipping it
            # (union of checkpointed RDDs) makes the next layer's
            # anti-join share attribute ids with the frontier branch and
            # trips the optimizer (NoSuchElementException on the exprId
            # map — verified against sf0.01). The copy cost is
            # O(layers x pairs); acceptable against correctness, and the
            # layer count is capped at _VARLEN_MAX_HOPS.
            known = known.unionAll(
                frontier.withColumn("dist", F.lit(k))
            ).localCheckpoint(eager=True)
        return known.filter(F.col("src") != F.col("dst"))

    def _all_shortest_pairs(self, epat: EdgePat, params) -> DataFrame:
        """(src, dst, dist, npaths) for allShortestPaths: the same
        layered BFS as _shortest_pairs, additionally counting the
        DISTINCT minimal paths per endpoint pair. Every predecessor of
        a pair first reached at layer k sits at distance exactly k-1
        (prefixes of shortest paths are shortest paths), so the count
        is the layer-(k-1) counts summed over extending edges — one
        groupBy per layer instead of one distinct. Minimal-length walks
        are necessarily simple, so walk counting IS path counting.
        Parallel edges are collapsed by _edge_step (the same
        distinct-pairs convention every varlength form here uses)."""
        lo, hi = epat.hops
        if lo != 1:
            raise ValueError(
                "cypher: allShortestPaths supports a lower bound of 1 "
                f"(got *{lo}..{'' if hi is None else hi}); zero-length "
                "self-paths are not modeled"
            )
        if hi is not None and hi > self._VARLEN_MAX_HOPS:
            raise ValueError(
                f"cypher: variable-length range *{lo}..{hi} exceeds max "
                f"hops ({self._VARLEN_MAX_HOPS})"
            )
        hi = hi if hi is not None else self._VARLEN_MAX_HOPS
        step = self._edge_step(epat, params)
        known = (
            step.withColumn("dist", F.lit(1))
            .withColumn("npaths", F.lit(1).cast("long"))
            .localCheckpoint(eager=True)
        )
        frontier = known.select("src", "dst", "npaths")
        for k in range(2, hi + 1):
            frontier = (
                frontier.alias("f")
                .join(step.alias("s"), F.col("f.dst") == F.col("s.src"))
                .groupBy(
                    F.col("f.src").alias("src"), F.col("s.dst").alias("dst")
                )
                .agg(F.sum("npaths").alias("npaths"))
                .join(known.select("src", "dst"), ["src", "dst"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            known = known.unionAll(
                frontier.select(
                    "src", "dst", F.lit(k).alias("dist"), "npaths"
                )
            ).localCheckpoint(eager=True)
        return known.filter(F.col("src") != F.col("dst"))

    def _match(self, ctx: _Ctx, c: MatchC, params) -> None:
        def fresh(prefix):
            self._anon += 1
            return f"_{prefix}{self._anon}"

        # the clause's own pattern frame: paths combined on their shared
        # variables; OPTIONAL MATCH needs it separate from the running
        # binding table so WHERE applies to the PATTERN before the outer
        # join (openCypher: a failed optional pattern yields NULL bindings,
        # not a dropped row)
        local: DataFrame | None = None
        for path in c.paths:
            bound_here: list[str] = []
            plen_src: str | None = None  # shortestPath dist struct column

            def bind_node(pat, pdf):
                """Join node pattern into the path frame pdf (or start it)."""
                name = pat.var or fresh("n")
                unconstrained = pat.var is None and pat.label is None and not pat.props
                nf = None if unconstrained else self._node_frame(pat, name, params)
                return name, nf, pdf

            # first node
            name0, nf0, _ = bind_node(path.nodes[0], None)
            pdf = nf0
            prev_node, prev_bound = name0, nf0 is not None
            for epat, npat in zip(path.edges, path.nodes[1:]):
                nname = npat.var or fresh("n")
                # repeated variable within one path ((a)-[:T]->(a), the
                # TCK self-loop shape): constrain against the EXISTING
                # binding instead of re-joining a second frame under
                # the same name (which is an ambiguous self-join)
                repeated = npat.var is not None and npat.var in (
                    [name0] + bound_here
                )
                if repeated and (npat.label is not None or npat.props):
                    raise ValueError(
                        f"cypher: variable {npat.var!r} is already bound "
                        "in this pattern; restate constraints in WHERE"
                    )
                unconstrained = (
                    npat.var is None and npat.label is None and not npat.props
                )
                nf = (
                    None
                    if unconstrained or repeated
                    else self._node_frame(npat, nname, params)
                )

                if epat.hops is not None:
                    if epat.var is not None:
                        raise ValueError(
                            "cypher: variable-length relationships cannot be "
                            "bound to a variable (reachability pairs carry no "
                            "single edge to bind)"
                        )
                    ename = fresh("r")
                    if path.shortest:
                        pairs = (
                            self._all_shortest_pairs(epat, params)
                            if path.all_shortest
                            else self._shortest_pairs(epat, params)
                        )
                        if path.all_shortest:
                            # openCypher: one row PER minimal path — the
                            # pair repeats npaths times (all its bindings
                            # are identical; only the multiplicity is
                            # observable through this length-only
                            # path surface)
                            pairs = pairs.withColumn(
                                "__dup",
                                F.explode(
                                    F.sequence(F.lit(1), F.col("npaths"))
                                ),
                            )
                        ef = pairs.select(
                            F.struct(
                                F.col("src"), F.col("dst"), F.col("dist")
                            ).alias(ename)
                        )
                        plen_src = ename
                    elif path.pathvar is not None or epat.qpp:
                        # round 11: varlength PATH VARIABLE and/or a
                        # quantified path pattern — per-path rows
                        # (openCypher row multiplicity); exact
                        # nodes/relationships/length when bound to p
                        pv = path.pathvar
                        gsv, gev, gdv = (
                            epat.qpp_vars if epat.qpp
                            else (None, None, None)
                        )
                        body_nv, body_ev = (
                            epat.qpp_body_vars
                            if epat.qpp and epat.qpp_body is not None
                            else ((), ())
                        )
                        if epat.qpp:
                            # openCypher: a group variable must be new
                            # — a name already bound as a singleton
                            # (earlier clause or the outer pattern)
                            # cannot be re-declared inside a
                            # quantified path pattern (Neo4j raises a
                            # type error; round-14 ADVICE gate)
                            gvars = {
                                v for v in (gsv, gev, gdv) if v
                            } | {v for v in body_nv if v} | {
                                v for v in body_ev if v
                            }
                            outer_names = set(
                                ctx.df.columns
                            ) if ctx.df is not None else set()
                            outer_names |= {
                                n2.var for n2 in path.nodes if n2.var
                            }
                            outer_names |= {
                                e2.var for e2 in path.edges
                                if e2.var and not e2.qpp
                            }
                            clash = sorted(gvars & outer_names)
                            if clash:
                                raise ValueError(
                                    "cypher: group variable(s) "
                                    f"{clash} inside a quantified "
                                    "path pattern are already bound "
                                    "as singletons in an outer scope "
                                    "(openCypher forbids reusing a "
                                    "bound variable as a group "
                                    "variable)"
                                )
                        if pv is None and not (
                            gsv or gev or gdv
                            or any(body_nv) or any(body_ev)
                        ):
                            ef = self._varlength_paths(
                                epat, params
                            ).select(
                                F.struct(
                                    F.col("src"), F.col("dst")
                                ).alias(ename)
                            )
                        else:
                            ecols = self.graph.edges.columns
                            enriched = self._enrich_path_nodes(
                                self._varlength_paths(epat, params)
                            )
                            rels_col = F.transform(
                                "eids",
                                lambda s: F.struct(
                                    *[s[c].alias(c) for c in ecols]
                                ),
                            )
                            sel = [
                                F.struct(
                                    F.col("src"), F.col("dst")
                                ).alias(ename),
                            ]
                            if pv is not None:
                                sel += [
                                    F.col("pnodes").alias(
                                        f"__pnodes_{pv}"),
                                    rels_col.alias(f"__prels_{pv}"),
                                    F.size("eids").alias(
                                        f"__plen_{pv}"),
                                ]
                            # group variables (round 12): lists per
                            # path row — a = step sources (nodes
                            # [0..k-1]), b = step targets ([1..k]),
                            # r = the traversed relationships
                            k = F.size("eids")
                            if gsv:
                                sel.append(F.slice(
                                    F.col("pnodes"), F.lit(1), k
                                ).alias(gsv))
                            if gdv:
                                sel.append(F.slice(
                                    F.col("pnodes"), F.lit(2), k
                                ).alias(gdv))
                            if gev:
                                sel.append(rels_col.alias(gev))
                            # round 13: group variables inside a
                            # MULTI-relationship body — position j of
                            # repetition r is pnodes[r*m + j] (0-based;
                            # pnodes[0] is the outer source), its edge
                            # eids[r*m + i]. Zero repetitions bind [].
                            if any(body_nv) or any(body_ev):
                                m = len(body_ev)
                                reps = (
                                    F.size("eids") / F.lit(m)
                                ).cast("int")
                                seq = F.when(
                                    reps > F.lit(0),
                                    F.sequence(
                                        F.lit(0), reps - F.lit(1)
                                    ),
                                ).otherwise(
                                    F.array().cast("array<int>")
                                )
                                # single-arg lambda factory: a 2-arg
                                # lambda would make transform() pass
                                # the ARRAY INDEX as the second arg,
                                # shadowing the captured position
                                def _picker(arr, off):
                                    return lambda r: F.element_at(
                                        arr, r * F.lit(m) + F.lit(off)
                                    )

                                # a unified (repeated) node variable
                                # binds once — its positions are equal
                                # by construction, so the first slice
                                # IS the binding
                                emitted = set()
                                for j, nv in enumerate(body_nv):
                                    if not nv or nv in emitted:
                                        continue
                                    emitted.add(nv)
                                    sel.append(F.transform(
                                        seq,
                                        _picker(F.col("pnodes"), j + 1),
                                    ).alias(nv))
                                for i, ev in enumerate(body_ev):
                                    if not ev:
                                        continue
                                    sel.append(F.transform(
                                        seq,
                                        _picker(rels_col, i + 1),
                                    ).alias(ev))
                            ef = enriched.select(*sel)
                    else:
                        ef = self._varlength_pairs(epat, params).select(
                            F.struct(F.col("src"), F.col("dst")).alias(ename)
                        )
                    lcol = F.col(ename).getField("src")
                    rcol = F.col(ename).getField("dst")
                else:
                    ename = epat.var or fresh("r")
                    ef = self._edge_frame(epat, ename, params)

                    eid_src = F.col(ename).getField("src")
                    eid_dst = F.col(ename).getField("dst")
                    if epat.direction == "out":
                        lcol, rcol = eid_src, eid_dst
                    elif epat.direction == "in":
                        lcol, rcol = eid_dst, eid_src
                    else:  # any: match either orientation by duplicating the edge
                        fwd = ef
                        rev = ef.select(
                            F.struct(
                                F.col(ename).getField("dst").alias("src"),
                                F.col(ename).getField("src").alias("dst"),
                                *[
                                    F.col(ename).getField(f).alias(f)
                                    for f in self.graph.edges.columns
                                    if f not in ("src", "dst")
                                ],
                            ).alias(ename)
                        )
                        ef = (
                            fwd.unionByName(rev)
                            if prev_bound or nf is not None or repeated
                            else fwd
                        )
                        lcol, rcol = (
                            F.col(ename).getField("src"),
                            F.col(ename).getField("dst"),
                        )

                if pdf is None:
                    pdf = ef
                elif prev_bound:
                    pdf = pdf.join(
                        ef, F.col(prev_node).getField("id") == lcol
                    )
                else:
                    pdf = pdf.crossJoin(ef)
                if nf is not None:
                    pdf = pdf.join(nf, rcol == F.col(nname).getField("id"))
                elif repeated:
                    pdf = pdf.filter(
                        rcol == F.col(nname).getField("id")
                    )
                prev_node, prev_bound = nname, nf is not None or repeated
                bound_here.extend([ename, nname])

            if pdf is None:
                # MATCH (n) with no constraints: all vertices
                pdf = self._node_frame_all(name0)
            bound_here.insert(0, name0)
            if path.pathvar is not None and plen_src is not None:
                # p = shortestPath(...): the only thing p exposes is its
                # hop count, surfaced as a hidden column length() resolves
                pdf = pdf.withColumn(
                    f"__plen_{path.pathvar}",
                    F.col(plen_src).getField("dist"),
                )
            elif (
                path.pathvar is not None
                and f"__plen_{path.pathvar}" in pdf.columns
            ):
                pass  # varlength path variable: columns rode in on ef
            elif path.pathvar is not None:
                # general fixed-length path variable (round 10): the
                # parser guaranteed every node/edge is bound, so the
                # path is EXACT — length is the edge count and
                # nodes()/relationships() are arrays of the bound
                # structs, surfaced as hidden columns the expression
                # compiler resolves
                # anonymous-but-constrained nodes got fresh names in
                # bound_here order: nodes appear at 0, 2, 4, ...
                ordered = [bound_here[0]] + [
                    bound_here[i] for i in range(2, len(bound_here), 2)
                ]
                edge_names = [
                    bound_here[i] for i in range(1, len(bound_here), 2)
                ]
                pv = path.pathvar
                pdf = pdf.withColumn(
                    f"__plen_{pv}", F.lit(len(path.edges))
                )
                if ordered and all(c in pdf.columns for c in ordered):
                    pdf = pdf.withColumn(
                        f"__pnodes_{pv}", F.array(*ordered)
                    )
                if edge_names and all(
                    c in pdf.columns for c in edge_names
                ):
                    pdf = pdf.withColumn(
                        f"__prels_{pv}", F.array(*edge_names)
                    )

            # combine with the clause-local frame on shared variables
            if local is None:
                local = pdf
            else:
                shared = [v for v in pdf.columns if v in local.columns]
                local = local.join(pdf, shared) if shared else local.crossJoin(pdf)

        if c.optional:
            if c.where is not None:
                local = self._filter_with_pattern_preds(local, c.where, params)
            if ctx.df is None:
                # OPTIONAL MATCH as first clause: one all-NULL row when the
                # pattern is empty (openCypher), via a constant-key left join
                ctx.df = (
                    self._one_row()
                    .select(F.lit(1).alias("_mk"))
                    .join(local.withColumn("_mk", F.lit(1)), "_mk", "left")
                    .drop("_mk")
                )
            else:
                shared = [v for v in local.columns if v in ctx.df.columns]
                if shared:
                    ctx.df = ctx.df.join(local, shared, "left")
                else:
                    ctx.df = (
                        ctx.df.withColumn("_mk", F.lit(1))
                        .join(local.withColumn("_mk", F.lit(1)), "_mk", "left")
                        .drop("_mk")
                    )
        else:
            if ctx.df is None:
                ctx.df = local
            else:
                shared = [v for v in local.columns if v in ctx.df.columns]
                ctx.df = ctx.df.join(local, shared) if shared else ctx.df.crossJoin(local)
            if c.where is not None:
                ctx.df = self._filter_with_pattern_preds(ctx.df, c.where, params)
        ctx.sort = []

    def _node_frame_all(self, name: str) -> DataFrame:
        v = self.graph.vertices
        return v.select(F.struct(*v.columns).alias(name))

    # -- WITH / RETURN ------------------------------------------------------

    def _filter_with_pattern_preds(self, frame: DataFrame, where, params) -> DataFrame:
        """Apply a WHERE whose tree may contain exists(<pattern>)
        predicates: each pattern becomes a boolean flag column via one
        match-frame join keyed on the ids of its BOUND variables (a
        semi-join shape, kept as a flag so NOT / OR compose), then the
        rewritten predicate filters the frame and the flags are dropped."""
        flags: list[str] = []

        def rw(e):
            if isinstance(e, PatternPred):
                name = f"__pe{len(flags)}"
                flags.append(name)
                nonlocal frame
                frame = self._attach_pattern_pred(frame, e, name, params)
                return Var(name)
            if isinstance(e, Bin):
                return Bin(e.op, rw(e.left), rw(e.right))
            if isinstance(e, Func):
                return Func(e.name, [rw(a) for a in e.args], e.distinct)
            if isinstance(e, Prop):
                return Prop(rw(e.base), e.name)
            if isinstance(e, Index):
                return Index(rw(e.base), e.idx)
            if isinstance(e, LabelTest):
                return LabelTest(rw(e.base), e.label)
            if isinstance(e, Case):
                return Case(
                    rw(e.subject) if e.subject is not None else None,
                    [(rw(w), rw(t)) for w, t in e.whens],
                    rw(e.default) if e.default is not None else None,
                )
            return e

        where = rw(where)
        out = frame.filter(self._expr(where, frame, params))
        return out.drop(*flags) if flags else out

    def _attach_pattern_pred(self, frame: DataFrame, pp, name: str, params) -> DataFrame:
        """exists((a)-[:R]->(b)): True for rows whose bound-variable ids
        participate in at least one pattern match. Bound vars appearing in
        the pattern become the join key (so exists((a)-[:R]->(b)) with
        BOTH bound checks that specific edge); unbound ones are
        existential."""
        all_paths = [pp.path, *pp.more_paths]
        node_vars = [
            n.var for p in all_paths for n in p.nodes if n.var
        ]
        bound = [v for v in node_vars if v in frame.columns]
        if not bound:
            raise ValueError(
                "cypher: exists(<pattern>) needs at least one variable "
                "bound by the enclosing MATCH"
            )
        sub = _Ctx()
        self._match(sub, MatchC(all_paths, pp.where, False), params)
        ids = (
            sub.df.select(
                *[
                    F.col(v).getField("id").alias(f"__pek_{v}")
                    for v in bound
                ]
            )
            .distinct()
            .withColumn(name, F.lit(True))
        )
        cond = None
        for v in bound:
            c = frame[v].getField("id") == ids[f"__pek_{v}"]
            cond = c if cond is None else (cond & c)
        return (
            frame.join(ids, cond, "left")
            .drop(*[f"__pek_{v}" for v in bound])
            .withColumn(name, F.coalesce(F.col(name), F.lit(False)))
        )

    def _rewrite_pattern_comps(self, ctx: _Ctx, exprs: list, params) -> list:
        """Replace every PatternComp in the expression trees with a Var
        referencing a temp column attached to the binding table by
        _attach_pattern_comp (one join + agg per comprehension)."""
        counter = [0]

        def rw(e):
            if isinstance(e, PatternComp):
                name = f"__pc{counter[0]}"
                counter[0] += 1
                self._attach_pattern_comp(ctx, e, name, params)
                return Var(name)
            if isinstance(e, Bin):
                return Bin(e.op, rw(e.left), rw(e.right))
            if isinstance(e, Prop):
                return Prop(rw(e.base), e.name)
            if isinstance(e, Index):
                return Index(rw(e.base), e.idx)
            if isinstance(e, LabelTest):
                return LabelTest(rw(e.base), e.label)
            if isinstance(e, Func):
                return Func(e.name, [rw(a) for a in e.args], e.distinct)
            if isinstance(e, MapLit):
                return MapLit({k: rw(v) for k, v in e.items.items()})
            if isinstance(e, ListLit):
                return ListLit([rw(v) for v in e.items])
            if isinstance(e, ListComp):
                return ListComp(
                    e.var,
                    rw(e.src),
                    rw(e.pred) if e.pred is not None else None,
                    rw(e.mapped) if e.mapped is not None else None,
                )
            if isinstance(e, Case):
                return Case(
                    rw(e.subject) if e.subject is not None else None,
                    [(rw(w), rw(t)) for w, t in e.whens],
                    rw(e.default) if e.default is not None else None,
                )
            return e

        return [rw(e) for e in exprs]

    def _attach_pattern_comp(self, ctx: _Ctx, pc, name: str, params) -> None:
        """[(a)-[:R]->(b) WHERE p | expr] for a BOUND subject a: run the
        pattern as its own match frame, compile the projection against
        it, collect per subject id (sort_array for determinism — Neo4j
        leaves the order unspecified), and LEFT-join the lists onto the
        binding table ([] for subjects with no matches). One join + one
        aggregate per comprehension — never a per-row subquery."""
        if ctx.df is None:
            raise ValueError(
                "cypher: pattern comprehension requires a bound subject "
                "(start with MATCH)"
            )
        subj = pc.path.nodes[0].var
        if subj is None or subj not in ctx.df.columns:
            raise ValueError(
                "cypher: a pattern comprehension's first node must be a "
                "variable bound by an earlier MATCH"
            )
        inner_vars = [n.var for n in pc.path.nodes[1:] if n.var] + [
            e.var for e in pc.path.edges if e.var
        ]
        clash = sorted(v for v in inner_vars if v in ctx.df.columns)
        if clash:
            raise ValueError(
                f"cypher: pattern comprehension rebinds variables {clash}"
            )
        sub = _Ctx()
        self._match(sub, MatchC([pc.path], pc.pred, False), params)
        payload = self._expr(pc.mapped, sub.df, params)
        agg = (
            sub.df.select(
                F.col(subj).getField("id").alias("__pc_sid"),
                payload.alias("__pc_val"),
            )
            .groupBy("__pc_sid")
            .agg(F.sort_array(F.collect_list("__pc_val")).alias(name))
        )
        list_type = agg.schema[name].dataType
        ctx.df = (
            ctx.df.join(
                agg,
                F.col(subj).getField("id") == F.col("__pc_sid"),
                "left",
            )
            .drop("__pc_sid")
            .withColumn(
                name,
                F.coalesce(F.col(name), F.array().cast(list_type)),
            )
        )

    def _project(self, ctx: _Ctx, c: WithC, params) -> DataFrame:
        # pattern comprehensions need DataFrame surgery (a join + agg per
        # comprehension), so they are extracted into temp columns on the
        # binding table first; default names come from the ORIGINAL items
        items = self._rewrite_pattern_comps(ctx, [e for e, _ in c.items], params)
        pairs = [
            (re, a or _name_of(oe)) for (oe, a), re in zip(c.items, items)
        ]
        df = ctx.df
        if df is None:
            # expression-only RETURN/WITH (Neo4j's `RETURN 1`): one
            # anonymous input row; references to unbound variables still
            # fail naturally at column resolution
            df = self._one_row()
        aggs = [(e, nm) for e, nm in pairs if _has_agg(e)]
        keys = [(e, nm) for e, nm in pairs if not _has_agg(e)]
        names = [nm for _, nm in pairs]
        # inside a correlated CALL subquery the hidden __ck_* import
        # columns ride through every projection: extra grouping keys for
        # aggregates, pass-through columns otherwise — this is what turns
        # the body's "global" aggregate into a per-input-combo aggregate
        hidden = [k for k in ctx.call_keys if k in df.columns]
        if aggs:
            key_cols = [self._expr(e, df, params).alias(nm) for e, nm in keys]
            agg_cols = [
                self._agg_expr(e, df, params, ctx.sort).alias(nm)
                for e, nm in aggs
            ]
            grouped = df.groupBy(*key_cols, *[F.col(k) for k in hidden])
            out = grouped.agg(*agg_cols)
            # restore the item order of the WITH/RETURN list (backticks:
            # Cypher default names like `i.name` contain dots)
            out = out.select(*[F.col(f"`{n}`") for n in names], *hidden)
            ob_cols: dict = {}
        else:
            # Neo4j lets a non-DISTINCT, non-aggregating projection ORDER
            # BY expressions over the PRE-projection bindings (RETURN
            # o.name AS onm ORDER BY o.price): such sort keys compile
            # against df into hidden __ob columns, used for the sort and
            # dropped at the end. DISTINCT restricts ORDER BY to the
            # projected items (as Neo4j does — extra columns would change
            # the dedup).
            ob_cols = {}
            if c.order_by and not c.distinct:
                proj_names = {nm for _, nm in pairs}
                for i, (oe, _a) in enumerate(c.order_by):
                    if _name_of(oe) not in proj_names and not _has_agg(oe):
                        ob_cols[i] = f"__ob{i}"
            out = df.select(
                *[self._expr(e, df, params).alias(nm) for e, nm in pairs],
                *[
                    self._expr(c.order_by[i][0], df, params).alias(nm)
                    for i, nm in ob_cols.items()
                ],
                *hidden,
            )
        if c.distinct:
            out = out.dropDuplicates()
        ctx.sort = []
        if c.order_by:
            sort_cols = []
            for i, (e, asc) in enumerate(c.order_by):
                # prefer a projected output column of the same Cypher name
                # (ORDER BY after RETURN/WITH sees the projection first),
                # then a hidden pre-projection sort column
                nm = _name_of(e)
                if nm in out.columns:
                    col = F.col(f"`{nm}`")
                elif i in ob_cols:
                    col = F.col(ob_cols[i])
                else:
                    col = self._expr(e, out, params)
                # openCypher/Neo4j null ordering: nulls sort LAST on
                # ASC and FIRST on DESC — the opposite of Spark's
                # default (nulls first on asc)
                sort_cols.append(
                    col.asc_nulls_last() if asc else col.desc_nulls_first()
                )
            ctx.sort = list(c.order_by)
            if not hidden:
                out = out.orderBy(*sort_cols)
        if hidden and (c.skip or c.limit is not None):
            # per-input-combo SKIP/LIMIT: a window top-k partitioned by
            # the import keys (a global offset/limit would take rows from
            # whichever combos happened to sort first). Without ORDER BY
            # the kept rows are arbitrary, as in Neo4j.
            order = (
                sort_cols
                if c.order_by
                else [F.monotonically_increasing_id()]
            )
            w = Window.partitionBy(*[F.col(k) for k in hidden]).orderBy(*order)
            rn = "__call_rn"
            lo = c.skip or 0
            hi = lo + c.limit if c.limit is not None else None
            cond = F.col(rn) > lo
            if hi is not None:
                cond = cond & (F.col(rn) <= hi)
            out = (
                out.withColumn(rn, F.row_number().over(w))
                .filter(cond)
                .drop(rn)
            )
        elif not hidden:
            if c.skip:
                out = out.offset(c.skip)
            if c.limit is not None:
                out = out.limit(c.limit)
        if c.where is not None:
            # WITH ... WHERE: filter the projected (and sliced) rows
            out = out.filter(self._expr(c.where, out, params))
        if ob_cols:
            # hidden pre-projection sort columns served their purpose
            # (dropping is a projection — row order is preserved)
            out = out.drop(*ob_cols.values())
        return out

    def _unwind(self, ctx: _Ctx, c: UnwindC, params) -> None:
        """UNWIND list AS x — one output row per element, appended to the
        current bindings (explode: empty/NULL lists produce no rows, the
        openCypher contract). As the first clause it seeds the binding
        table from a literal/parameter list."""
        col = self._expr(c.expr, ctx.df, params)
        if ctx.df is None:
            ctx.df = self._one_row().select(F.explode(col).alias(c.alias))
            return
        if c.alias in ctx.df.columns:
            raise ValueError(f"cypher: UNWIND rebinds variable {c.alias!r}")
        ctx.df = ctx.df.select("*", F.explode(col).alias(c.alias))

    def _load_csv(self, ctx: _Ctx, c: LoadCsvC) -> None:
        """LOAD CSV ... AS row — the binding table seeds from Spark's
        distributed CSV reader (splittable scan, not a driver loop),
        so a 100 GB ingest parallelizes like any other source. Fields
        stay strings (inferSchema off, Neo4j semantics; empty
        unquoted fields read as null). WITH HEADERS binds a
        field-named struct (row.name / row['name']), otherwise a
        string list (row[0]). file:// URLs and plain paths only —
        this engine does no network I/O, so other schemes gate."""
        if ctx.df is not None:
            raise ValueError(
                "cypher: LOAD CSV must be the first clause of its "
                "query"
            )
        url = c.url
        if url.startswith("file:"):
            # round 14 (ADVICE): a real URL parse — file://host/p is
            # a REMOTE-host URL (authority = host), which the old
            # prefix-strip silently read as local /host/p
            from urllib.parse import urlparse

            u = urlparse(url)
            if u.netloc not in ("", "localhost"):
                raise ValueError(
                    "cypher: LOAD CSV file URL has a non-local "
                    f"authority {u.netloc!r} (no network in this "
                    "engine); use file:///absolute/path"
                )
            path = u.path or "/"
        elif "://" in url:
            raise ValueError(
                "cypher: LOAD CSV supports file:// URLs or plain "
                f"paths only (no network in this engine), got {url!r}"
            )
        else:
            path = url
        spark = self.graph.vertices.sparkSession
        # multiLine: RFC 4180 / Neo4j LOAD CSV allow embedded
        # newlines inside quoted fields — without it Spark splits
        # them into spurious records (round-14 ADVICE fix). The scan
        # stays distributed: Spark parallelizes multiLine files
        # per-FILE rather than per-block, which is the correct
        # trade-off for correctness on quoted newlines.
        df0 = (
            spark.read.option("header", str(c.headers).lower())
            .option("sep", c.sep)
            .option("inferSchema", "false")
            .option("multiLine", "true")
            .csv(path)
        )
        if c.headers:
            col = F.struct(*[F.col(x).alias(x) for x in df0.columns])
        else:
            col = F.array(*[F.col(x) for x in df0.columns])
        ctx.df = df0.select(col.alias(c.var))

    def _lambda_fn(self, names: list, sub, df, params):
        """N-ary HOF lambda compiling `sub` with `names` bound to the
        lambda arguments (shadowing outer bindings; saved/restored for
        nesting) — the generalization of _listcomp_over's helper for
        forall/exists/aggregate."""

        def apply(cols):
            saved = {}
            for nm, c in zip(names, cols):
                saved[nm] = (nm in self._lambda_env, self._lambda_env.get(nm))
                self._lambda_env[nm] = c
            try:
                return self._expr(sub, df, params)
            finally:
                for nm, (had, old) in saved.items():
                    if had:
                        self._lambda_env[nm] = old
                    else:
                        del self._lambda_env[nm]

        # pyspark HOFs inspect the signature and reject *args — hand back
        # a fixed-arity wrapper
        if len(names) == 1:
            return lambda a: apply((a,))
        return lambda a, b: apply((a, b))

    def _listcomp_over(self, src_col: Column, e, df, params) -> Column:
        """filter/transform HOFs over an already-compiled source column;
        the lambda variable shadows outer bindings for the duration of
        each sub-expression's compilation (saved/restored for nesting)."""

        def _with(sub):
            def fn(x):
                had, old = e.var in self._lambda_env, self._lambda_env.get(e.var)
                self._lambda_env[e.var] = x
                try:
                    return self._expr(sub, df, params)
                finally:
                    if had:
                        self._lambda_env[e.var] = old
                    else:
                        del self._lambda_env[e.var]

            return fn

        out = src_col
        if e.pred is not None:
            out = F.filter(out, _with(e.pred))
        if e.mapped is not None:
            out = F.transform(out, _with(e.mapped))
        return out

    def _agg_expr(self, e, df, params, sort) -> Column:
        """Aggregate item, with collect(x)[0]-after-ORDER-BY compiled as
        min/max(struct(sort keys, x)) — argmin as a hash aggregate."""
        if isinstance(e, ListComp):
            # [x IN collect(...) WHERE p | m] — the canonical Neo4j
            # collect-into-comprehension idiom: aggregate the source,
            # then apply the HOFs post-aggregation (round-6 review)
            if (e.pred is not None and _has_agg(e.pred)) or (
                e.mapped is not None and _has_agg(e.mapped)
            ):
                raise ValueError(
                    "cypher: aggregates inside a comprehension's WHERE/"
                    "projection are not supported (aggregate in the "
                    "source list only)"
                )
            return self._listcomp_over(
                self._agg_expr(e.src, df, params, sort), e, df, params
            )
        if (
            isinstance(e, Index)
            and isinstance(e.base, Func)
            and e.base.name.lower() == "collect"
            and e.idx == 0
        ):
            payload = self._expr(e.base.args[0], df, params)
            if not sort:
                return F.min(F.struct(payload.alias("_p"))).getField("_p")
            ascs = {asc for _, asc in sort}
            if len(ascs) > 1:
                raise ValueError("cypher: mixed ASC/DESC before collect()[0]")
            keys = [self._expr(se, df, params) for se, _ in sort]
            packed = F.struct(
                *[k.alias(f"_k{i}") for i, k in enumerate(keys)],
                payload.alias("_p"),
            )
            agg = F.min(packed) if ascs == {True} else F.max(packed)
            return agg.getField("_p")
        if isinstance(e, Func) and e.name.lower() == "count":
            if len(e.args) == 1 and isinstance(e.args[0], Var) and e.args[0].name == "*":
                if e.distinct:
                    raise ValueError("cypher: count(DISTINCT *) is not legal")
                return F.count(F.lit(1))
            c = self._expr(e.args[0], df, params)
            return F.countDistinct(c) if e.distinct else F.count(c)
        if isinstance(e, Func) and e.name.lower() in _AGG_FNS:
            name = e.name.lower()
            c = self._expr(e.args[0], df, params)
            if e.distinct:
                # DISTINCT aggregates: count/sum have native forms,
                # collect(DISTINCT x) is a (sorted, deterministic) set,
                # avg(DISTINCT x) = sum_distinct / countDistinct,
                # min/max are insensitive to DISTINCT
                if name == "sum":
                    return F.sum_distinct(c)
                if name == "collect":
                    return F.sort_array(F.collect_set(c))
                if name == "avg":
                    return F.sum_distinct(c) / F.countDistinct(c)
            fn = {
                "collect": F.collect_list,
                "sum": F.sum,
                "avg": F.avg,
                "min": F.min,
                "max": F.max,
            }[name]
            return fn(c)
        raise ValueError(f"cypher: unsupported aggregate shape {e}")

    # -- CREATE / SET / DELETE ----------------------------------------------

    def _create(self, ctx: _Ctx, c: CreateC, params) -> None:
        base = ctx.df if ctx.df is not None else None

        def _bound(var):
            return (
                var is not None
                and base is not None
                and var in base.columns
            )

        simple = all(
            len(p.nodes) == 1
            or (
                len(p.nodes) == 2
                and len(p.edges) == 1
                and _bound(p.nodes[0].var)
                and _bound(p.nodes[1].var)
            )
            for p in c.paths
        )
        if simple:
            for path in c.paths:
                if len(path.nodes) == 1:
                    pat = path.nodes[0]
                    props = {
                        k: self._expr(e, base, params)
                        for k, e in pat.props.items()
                    }
                    cols = [col.alias(k) for k, col in props.items()]
                    if pat.label is not None:
                        cols.append(F.lit(pat.label).alias(LABEL_COL))
                    rows = (
                        base.select(*cols)
                        if base is not None
                        else self._one_row().select(*cols)
                    )
                    pc = _PendingCreate("node", rows)
                    if pat.var:
                        ctx.created[pat.var] = pc
                    ctx.ops.append(pc)
                else:
                    a, epat, b = path.nodes[0], path.edges[0], path.nodes[1]
                    if epat.direction == "in":
                        a, b = b, a
                    props = {
                        k: self._expr(e, base, params)
                        for k, e in epat.props.items()
                    }
                    rows = base.select(
                        F.col(a.var).getField("id").alias("src"),
                        F.col(b.var).getField("id").alias("dst"),
                        F.lit(epat.rel).alias("relationship"),
                        *[col.alias(k) for k, col in props.items()],
                    )
                    pc = _PendingCreate("edge", rows)
                    if epat.var:
                        ctx.created[epat.var] = pc
                    ctx.ops.append(pc)
            return
        # Full-pattern CREATE (round 11, openCypher TCK setup shape):
        # `CREATE (a:A)-[:T]->(b:B), (b)-[:S]->(c)` — inline nodes get
        # sequential SLOT numbers resolved to real ids at apply time
        # (id = offset + rid*k + slot), so edges between not-yet-created
        # endpoints resolve batch-side with zero driver loops.
        work = base if base is not None else self._one_row()
        order = work.columns if work.columns else [F.lit(1)]
        rid = F.row_number().over(Window.orderBy(*order)) - 1
        work = work.withColumn("__rid", rid.cast("long"))
        slots: dict[str, int] = {}
        inline: list = []  # (slot, NodePat)
        node_ref: dict = {}

        for path in c.paths:
            for np_ in path.nodes:
                key = id(np_)
                if _bound(np_.var):
                    node_ref[key] = ("bound", np_.var)
                    continue
                if np_.var is not None and np_.var in slots:
                    if np_.label is not None or np_.props:
                        raise ValueError(
                            f"cypher: CREATE variable {np_.var!r} "
                            "already bound in this statement"
                        )
                    node_ref[key] = ("new", slots[np_.var])
                    continue
                slot = len(inline)
                inline.append(np_)
                if np_.var is not None:
                    slots[np_.var] = slot
                node_ref[key] = ("new", slot)
        k = max(len(inline), 1)
        node_rows = None
        for slot, np_ in enumerate(inline):
            cols = [
                self._expr(e, work, params).alias(kk)
                for kk, e in np_.props.items()
            ]
            if np_.label is not None:
                cols.append(F.lit(np_.label).alias(LABEL_COL))
            r = work.select(
                (F.col("__rid") * k + slot).alias("__seq"), *cols
            )
            node_rows = (
                r
                if node_rows is None
                else node_rows.unionByName(r, allowMissingColumns=True)
            )
        edge_rows = None
        for path in c.paths:
            for j, epat in enumerate(path.edges):
                if epat.rel is None:
                    raise ValueError(
                        "cypher: CREATE edge needs a relationship type"
                    )
                a_i, b_i = path.nodes[j], path.nodes[j + 1]
                if epat.direction == "in":
                    a_i, b_i = b_i, a_i

                def _endpoint(np_):
                    kind, v = node_ref[id(np_)]
                    if kind == "bound":
                        return (
                            F.col(v).getField("id").cast("long"),
                            F.lit(None).cast("long"),
                        )
                    return (
                        F.lit(None).cast("long"),
                        (F.col("__rid") * k + v).cast("long"),
                    )

                sa, ss = _endpoint(a_i)
                da, ds = _endpoint(b_i)
                props = {
                    kk: self._expr(e, work, params)
                    for kk, e in epat.props.items()
                }
                r = work.select(
                    sa.alias("__src_abs"),
                    ss.alias("__src_seq"),
                    da.alias("__dst_abs"),
                    ds.alias("__dst_seq"),
                    F.lit(epat.rel).alias("relationship"),
                    *[col.alias(kk) for kk, col in props.items()],
                )
                edge_rows = (
                    r
                    if edge_rows is None
                    else edge_rows.unionByName(
                        r, allowMissingColumns=True
                    )
                )
        ctx.ops.append(_PendingCreate("pattern", (node_rows, edge_rows)))

    def _merge(self, ctx: _Ctx, c: MergeC, params) -> None:
        """MERGE = match-or-create, compiled as an upsert over the pattern's
        identity keys (left-anti join finds the missing rows; a following
        SET folds into the pending frame and is applied to matched AND
        created rows — COW update + unionByName, the same shape as
        operators/maintenance.upsert_parquet).

        Node MERGE keys on (label, pattern props); edge MERGE (endpoints
        bound by earlier clauses, like CREATE) keys on
        (src, dst, relationship, pattern props). The merged variable is
        NOT added to the binding table — it may be SET but not returned
        (the reference never returns from a mutation statement)."""
        path = c.path
        base = ctx.df
        if len(path.nodes) == 1:
            pat = path.nodes[0]
            if pat.label is None and not pat.props:
                raise ValueError("cypher: MERGE node needs a label or properties")
            cols = []
            if pat.label is not None:
                cols.append(F.lit(pat.label).alias(LABEL_COL))
            for k, e in pat.props.items():
                cols.append(self._expr(e, base, params).alias(k))
            rows = (base if base is not None else self._one_row()).select(*cols)
            rows = rows.dropDuplicates()
            pm = _PendingMerge("node", rows, [f.name for f in rows.schema.fields])
            if pat.var:
                ctx.created[pat.var] = pm
            ctx.ops.append(pm)
        else:
            if len(path.nodes) != 2 or len(path.edges) != 1:
                raise ValueError("cypher: MERGE supports single-hop paths")
            a, epat, b = path.nodes[0], path.edges[0], path.nodes[1]
            if a.var is None or b.var is None or base is None:
                raise ValueError("cypher: MERGE edge endpoints must be bound")
            if epat.direction == "in":
                a, b = b, a
            if epat.rel is None:
                raise ValueError("cypher: MERGE edge needs a relationship type")
            cols = [
                F.col(a.var).getField("id").alias("src"),
                F.col(b.var).getField("id").alias("dst"),
                F.lit(epat.rel).alias("relationship"),
            ]
            for k, e in epat.props.items():
                cols.append(self._expr(e, base, params).alias(k))
            rows = base.select(*cols).dropDuplicates()
            pm = _PendingMerge("edge", rows, [f.name for f in rows.schema.fields])
            if epat.var:
                ctx.created[epat.var] = pm
            ctx.ops.append(pm)

    def _set(self, ctx: _Ctx, c: SetC, params) -> None:
        for var, label in c.labels:
            df = ctx.df
            if var in ctx.created:
                pc = ctx.created[var]
                pc.df = pc.df.withColumn(
                    LABEL_COL,
                    F.array_join(F.array_sort(F.array_union(
                        self._labels_of(
                            F.col(LABEL_COL)
                            if LABEL_COL in pc.df.columns
                            else F.lit(None).cast("string")
                        ),
                        F.array(F.lit(label)),
                    )), ":"),
                )
                continue
            if df is None or var not in df.columns:
                raise ValueError(f"cypher: SET on unbound variable {var}")
            if "src" in self._fields(df, var):
                raise ValueError(
                    "cypher: SET of a label applies to nodes, not "
                    "relationships"
                )
            ids = (
                df.select(F.col(var).getField("id").alias("_sid"))
                .dropDuplicates(["_sid"])
            )
            ctx.ops.append(("set_label", ids, label))
        by_var: dict[str, list] = {}
        for var, prop, e in c.assignments:
            by_var.setdefault(var, []).append((prop, e))
        for var, assigns in by_var.items():
            if var in ctx.created:
                # SET on a var created in this query: fold into the pending rows
                pc = ctx.created[var]
                for prop, e in assigns:
                    pc.df = pc.df.withColumn(
                        prop, self._expr(e, pc.df, params)
                    )
                continue
            df = ctx.df
            if df is None or var not in df.columns:
                raise ValueError(f"cypher: SET on unbound variable {var}")
            kind = "edge" if "src" in self._fields(df, var) else "node"
            idf = F.col(var).getField("eid" if kind == "edge" else "id")
            news = [
                self._expr(e, df, params).alias(f"_new_{prop}")
                for prop, e in assigns
            ]
            if ctx.order_col:
                # inside FOREACH: several rows per entity, one per list
                # element — the LAST element's value must win (openCypher
                # per-element execution order)
                upd = (
                    df.select(idf.alias("_sid"), F.col(ctx.order_col).alias("_ord"), *news)
                    .groupBy("_sid")
                    .agg(
                        *[
                            F.max_by(f"_new_{p}", F.col("_ord")).alias(f"_new_{p}")
                            for p, _ in assigns
                        ]
                    )
                )
            else:
                upd = df.select(idf.alias("_sid"), *news).dropDuplicates(["_sid"])
            ctx.ops.append(("set", kind, upd, [p for p, _ in assigns]))

    def _call(self, ctx: _Ctx, c: CallC, params) -> None:
        """CALL { subquery }, both forms.

        Uncorrelated: compile the (read-only, parser-enforced) body with a
        fresh context and join its result rows to every outer row — a
        cross join, which Catalyst turns into a broadcast nested loop with
        the (typically tiny aggregate) result broadcast. As the first
        clause it seeds the binding table.

        Correlated (importing WITH): Neo4j executes the body once per
        input row; the set-based compile instead runs it ONCE over the
        DISTINCT imported-variable combinations and equi-joins the result
        back on those columns (null-safe) — identical semantics, and at
        scale strictly less work when imports repeat. The import combos
        ride through the body in hidden __ck_* columns that every
        projection groups by / carries (ctx.call_keys), so an aggregate
        like count(o) aggregates PER input combo, and ORDER BY + LIMIT
        become a per-combo window top-k. An all-aggregate RETURN joins
        back LEFT with Cypher's empty-group defaults (count 0, collect [],
        sum 0) so inputs with no matches survive, as they do in Neo4j.

        UNIT (updating) subquery (round 14): the body executes once
        per input ROW (no dedup — mutation multiplicity is the whole
        point of the idiom: UNWIND rows CALL { WITH row CREATE ... }),
        sees ONLY the imported variables, RETURNs nothing, and leaves
        the outer binding table untouched (cardinality preserved).
        The body's deferred mutations merge into the outer op list and
        commit atomically at statement end with everything else, which
        is also why IN TRANSACTIONS batching is a declared no-op."""
        if c.unit:
            if c.imports is not None:
                if ctx.df is None:
                    raise ValueError(
                        "cypher: a correlated CALL subquery (importing "
                        "WITH) needs bindings from an earlier clause"
                    )
                missing = [
                    v for v in c.imports if v not in ctx.df.columns
                ]
                if missing:
                    raise ValueError(
                        f"cypher: CALL imports unbound variables {missing}"
                    )
                seed = ctx.df.select(c.imports)
            elif ctx.df is None:
                seed = None  # first clause: the body runs exactly once
            else:
                # no imports: one execution per outer row, empty scope
                seed = ctx.df.select()
            sub_ctx = _Ctx(df=seed)
            self._dispatch(sub_ctx, c.clauses, params)
            ctx.ops.extend(sub_ctx.ops)
            return
        if c.imports is None:
            sub = self._run_clauses(c.clauses, params)
            if ctx.df is None:
                ctx.df = sub
                return
            overlap = set(sub.columns) & set(ctx.df.columns)
            if overlap:
                raise ValueError(
                    f"cypher: CALL subquery rebinds variables {sorted(overlap)}"
                )
            ctx.df = ctx.df.crossJoin(sub)
            return
        if ctx.df is None:
            raise ValueError(
                "cypher: a correlated CALL subquery (importing WITH) needs "
                "bindings from an earlier clause"
            )
        missing = [v for v in c.imports if v not in ctx.df.columns]
        if missing:
            raise ValueError(
                f"cypher: CALL imports unbound variables {missing}"
            )
        keys = [f"__ck_{v}" for v in c.imports]
        seed = ctx.df.select(c.imports).dropDuplicates()
        seed = seed.select(
            "*", *[F.col(v).alias(k) for v, k in zip(c.imports, keys)]
        )
        sub_ctx = _Ctx(df=seed, call_keys=keys)
        sub = self._dispatch(sub_ctx, c.clauses, params)
        out_cols = [col for col in sub.columns if col not in keys]
        overlap = set(out_cols) & set(ctx.df.columns)
        if overlap:
            raise ValueError(
                f"cypher: CALL subquery rebinds variables {sorted(overlap)}"
            )
        ret = c.clauses[-1]
        all_agg = all(_has_agg(e) for e, _ in ret.items)
        cond = None
        for v, k in zip(c.imports, keys):
            eq = ctx.df[v].eqNullSafe(sub[k])
            cond = eq if cond is None else (cond & eq)
        joined = ctx.df.join(sub, cond, "left" if all_agg else "inner")
        if all_agg:
            # Cypher's aggregates over zero rows: count -> 0, collect ->
            # [], sum -> 0; min/max/avg stay null. Applied only to BARE
            # aggregate items (a compound like count(o)+1 keeps null).
            for (e, a) in ret.items:
                nm = a or _name_of(e)
                if nm not in out_cols or not isinstance(e, Func):
                    continue
                fn = e.name.lower()
                col_t = joined.schema[nm].dataType
                if fn == "count":
                    joined = joined.withColumn(
                        nm, F.coalesce(F.col(f"`{nm}`"), F.lit(0).cast(col_t))
                    )
                elif fn == "sum":
                    joined = joined.withColumn(
                        nm, F.coalesce(F.col(f"`{nm}`"), F.lit(0).cast(col_t))
                    )
                elif fn == "collect":
                    joined = joined.withColumn(
                        nm,
                        F.coalesce(F.col(f"`{nm}`"), F.array().cast(col_t)),
                    )
        ctx.df = joined.drop(*keys)

    def _proc(self, ctx: _Ctx, c: ProcC) -> None:
        """Read-only introspection procedures: each is a small distinct
        scan over the graph's metadata columns (or pure schema, for
        propertyKeys), sorted for determinism, YIELD-projected, and
        joined to the bindings like an uncorrelated CALL subquery."""
        g = self.graph
        spark = g.vertices.sparkSession
        if c.name in _NOOP_PROCEDURES:
            # void schema-management shim: tokens/indexes are implicit
            # in this engine — validated at parse, nothing to execute,
            # bindings pass through untouched
            return
        if c.name == "db.labels":
            # multi-label aware: each member of a node's label set is
            # its own token (Neo4j lists labels, not combinations)
            df = (
                g.vertices.select(
                    F.explode(
                        self._labels_of(F.col(LABEL_COL))
                    ).alias("label")
                )
                .distinct()
                .orderBy("label")
            )
        elif c.name == "db.relationshipTypes":
            df = (
                g.edges.select(F.col("relationship").alias("relationshipType"))
                .filter(F.col("relationshipType").isNotNull())
                .distinct()
                .orderBy("relationshipType")
            )
        elif c.name == "db.propertyKeys":  # static: the schema knows the keys
            vkeys = {f for f in g.vertices.columns if f not in ("id", LABEL_COL)}
            ekeys = {
                f
                for f in g.edges.columns
                if f not in ("src", "dst", "eid", "relationship")
            }
            df = spark.createDataFrame(
                [(k,) for k in sorted(vkeys | ekeys)], "propertyKey string"
            )
        elif c.name == "db.schema.nodeTypeProperties":
            df = self._schema_properties(
                g.vertices.filter(F.col(LABEL_COL).isNotNull()),
                F.concat(F.lit(":`"), F.col(LABEL_COL), F.lit("`")),
                ("id", LABEL_COL),
                "nodeType",
            )
        elif c.name == "db.schema.relTypeProperties":
            df = self._schema_properties(
                g.edges.filter(F.col("relationship").isNotNull()),
                F.concat(F.lit(":`"), F.col("relationship"), F.lit("`")),
                ("src", "dst", "eid", "relationship"),
                "relType",
            )
        elif c.name == "db.schema.visualization":
            # unlabeled endpoints / untyped edges are omitted, matching
            # Neo4j and the isNotNull discipline of the sibling
            # db.labels / db.schema.*Properties procedures
            v = g.vertices.filter(F.col(LABEL_COL).isNotNull()).select(
                F.col("id"), F.col(LABEL_COL).alias("__lbl")
            )
            df = (
                g.edges.select("src", "dst", "relationship")
                .filter(F.col("relationship").isNotNull())
                .join(v.withColumnRenamed("__lbl", "srcLabel"),
                      F.col("src") == F.col("id"))
                .drop("id")
                .join(v.withColumnRenamed("__lbl", "dstLabel"),
                      F.col("dst") == F.col("id"))
                .select(
                    F.concat(F.lit(":`"), "srcLabel", F.lit("`")).alias("srcLabel"),
                    "relationship",
                    F.concat(F.lit(":`"), "dstLabel", F.lit("`")).alias("dstLabel"),
                )
                .distinct()
                .orderBy("srcLabel", "relationship", "dstLabel")
            )
        else:  # dbms.components — static engine metadata
            df = spark.createDataFrame(
                [("graph-db-clustering-spark", "round-7", "community")],
                "name string, version string, edition string",
            )
        if c.yields is not None:
            missing = [col for col, _ in c.yields if col not in df.columns]
            if missing:
                raise ValueError(
                    f"cypher: {c.name}() yields {df.columns}, not {missing}"
                )
            df = df.select(
                *[F.col(col).alias(a or col) for col, a in c.yields]
            )
        if ctx.df is None:
            ctx.df = df
            return
        overlap = set(df.columns) & set(ctx.df.columns)
        if overlap:
            raise ValueError(
                f"cypher: CALL {c.name}() rebinds variables {sorted(overlap)}"
            )
        ctx.df = ctx.df.crossJoin(df)

    def _schema_properties(self, df, type_expr, reserved, type_alias):
        """Shared plan for db.schema.nodeTypeProperties /
        relTypeProperties: ONE aggregate pass per entity frame computes
        row count + per-property non-null counts grouped by label/type,
        then melts to one row per (type, property) — mandatory =
        non-null on every entity of that type; properties with no value
        for a type are omitted (Neo4j's behavior). Driver traffic: the
        (n_types x n_properties) result only."""
        props = [f for f in df.columns if f not in reserved]
        spark = df.sparkSession
        if not props:
            return spark.createDataFrame(
                [],
                f"{type_alias} string, propertyName string, "
                "propertyTypes string, mandatory boolean",
            )
        types = {f.name: _neo_type_name(f.dataType) for f in df.schema.fields}
        stats = df.groupBy(type_expr.alias(type_alias)).agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.count(F.col(p)).alias(f"__c{i}") for i, p in enumerate(props)],
        )
        melted = stats.select(
            type_alias,
            "__n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("propertyName"),
                            F.lit(types[p]).alias("propertyTypes"),
                            F.col(f"__c{i}").alias("__c"),
                        )
                        for i, p in enumerate(props)
                    ]
                )
            ).alias("__pp"),
        )
        return (
            melted.filter(F.col("__pp.__c") > 0)
            .select(
                type_alias,
                F.col("__pp.propertyName").alias("propertyName"),
                F.col("__pp.propertyTypes").alias("propertyTypes"),
                (F.col("__pp.__c") == F.col("__n")).alias("mandatory"),
            )
            .orderBy(type_alias, "propertyName")
        )

    def _foreach(self, ctx: _Ctx, c: ForeachC, params) -> None:
        """FOREACH: explode the list into a PRIVATE binding table (outer
        bindings + element var), run the body's mutation handlers against
        it, and adopt only the pending mutations — the outer binding table
        is untouched, per openCypher. Batch semantics carry over: each
        body clause becomes one pending batch op over all elements x all
        outer rows, applied with everything else at _apply."""
        col = self._expr(c.expr, ctx.df, params)
        inner = _Ctx()
        base = self._one_row() if ctx.df is None else ctx.df
        if ctx.df is not None and c.var in ctx.df.columns:
            raise ValueError(f"cypher: FOREACH rebinds variable {c.var!r}")
        # posexplode: the element INDEX orders SET applications so the
        # last element wins, as per-element execution would (openCypher);
        # nested FOREACH stacks indexes lexicographically via a struct
        pos = f"_fe_pos{len(c.var)}_{c.var}"
        inner.df = base.select("*", F.posexplode(col).alias(pos, c.var))
        if ctx.order_col:
            inner.order_col = f"{pos}_nested"
            inner.df = inner.df.withColumn(
                inner.order_col, F.struct(F.col(ctx.order_col), F.col(pos))
            )
        else:
            inner.order_col = pos
        for cl in c.clauses:
            if isinstance(cl, CreateC):
                self._create(inner, cl, params)
            elif isinstance(cl, MergeC):
                self._merge(inner, cl, params)
            elif isinstance(cl, SetC):
                self._set(inner, cl, params)
            elif isinstance(cl, DeleteC):
                self._delete(inner, cl)
            elif isinstance(cl, RemoveC):
                self._remove(inner, cl)
            elif isinstance(cl, ForeachC):
                self._foreach(inner, cl, params)
        ctx.ops.extend(inner.ops)

    def _remove(self, ctx: _Ctx, c: RemoveC) -> None:
        by_var: dict[str, list] = {}
        for var, prop in c.items:
            by_var.setdefault(var, []).append(prop)
        for var, props in by_var.items():
            if var in ctx.created:
                raise ValueError(
                    "cypher: REMOVE on a variable created in the same "
                    "query is not supported"
                )
            df = ctx.df
            if df is None or var not in df.columns:
                raise ValueError(f"cypher: REMOVE on unbound variable {var}")
            kind = "edge" if "src" in self._fields(df, var) else "node"
            idf = F.col(var).getField("eid" if kind == "edge" else "id")
            ids = df.select(idf.alias("_sid")).dropDuplicates(["_sid"])
            ctx.ops.append(("remove", kind, ids, props))
        for var, label in c.labels:
            if var in ctx.created:
                raise ValueError(
                    "cypher: REMOVE on a variable created in the same "
                    "query is not supported"
                )
            df = ctx.df
            if df is None or var not in df.columns:
                raise ValueError(f"cypher: REMOVE on unbound variable {var}")
            if "src" in self._fields(df, var):
                raise ValueError(
                    "cypher: REMOVE of a label applies to nodes, not "
                    "relationships"
                )
            # subtract THIS label from the node's label set (round 13:
            # multi-label aware — only nodes carrying it are touched;
            # removing the last label nulls the column, Neo4j's
            # unlabeled-node state)
            ids = (
                df.filter(self._has_labels(
                    F.col(var).getField(LABEL_COL), label
                ))
                .select(F.col(var).getField("id").alias("_sid"))
                .dropDuplicates(["_sid"])
            )
            ctx.ops.append(("remove_label", ids, label))

    def _delete(self, ctx: _Ctx, c: DeleteC) -> None:
        df = ctx.df
        for var in c.vars:
            if df is None or var not in df.columns:
                raise ValueError(f"cypher: DELETE on unbound variable {var}")
            if "src" in self._fields(df, var):
                ctx.ops.append(
                    ("del_edges", df.select(F.col(var).getField("eid").alias("eid")))
                )
            else:
                ids = df.select(F.col(var).getField("id").alias("id"))
                ctx.ops.append(("del_nodes", ids, c.detach))

    def _apply(self, ctx: _Ctx) -> None:
        g = self.graph
        for op in ctx.ops:
            if isinstance(op, _PendingCreate):
                if op.kind == "node":
                    offset = (
                        g.vertices.agg(F.max("id")).collect()[0][0] or 0
                    ) + 1
                    w = Window.orderBy(*op.df.columns)
                    rows = op.df.withColumn(
                        "id", (F.row_number().over(w) + offset - 1).cast("long")
                    )
                    g = g.add_vertices(rows)
                elif op.kind == "pattern":
                    node_rows, edge_rows = op.df
                    offset = (
                        g.vertices.agg(F.max("id")).collect()[0][0] or 0
                    ) + 1
                    if node_rows is not None:
                        rows = node_rows.withColumn(
                            "id", (F.col("__seq") + offset).cast("long")
                        ).drop("__seq")
                        g = g.add_vertices(rows)
                    if edge_rows is not None:
                        eoff = (
                            g.edges.agg(F.max("eid")).collect()[0][0] or 0
                        ) + 1
                        src = F.coalesce(
                            F.col("__src_abs"),
                            F.col("__src_seq") + offset,
                        ).cast("long")
                        dst = F.coalesce(
                            F.col("__dst_abs"),
                            F.col("__dst_seq") + offset,
                        ).cast("long")
                        keep = [
                            c for c in edge_rows.columns
                            if not c.startswith("__")
                        ]
                        erows = edge_rows.select(
                            src.alias("src"), dst.alias("dst"), *keep
                        )
                        w = Window.orderBy("src", "dst", "relationship")
                        erows = erows.withColumn(
                            "eid",
                            (F.row_number().over(w) + eoff - 1).cast("long"),
                        )
                        g = Graph(
                            g.vertices,
                            g.edges.unionByName(
                                erows, allowMissingColumns=True
                            ),
                        )
                else:
                    offset = (g.edges.agg(F.max("eid")).collect()[0][0] or 0) + 1
                    w = Window.orderBy("src", "dst")
                    rows = op.df.withColumn(
                        "eid", (F.row_number().over(w) + offset - 1).cast("long")
                    )
                    g = Graph(g.vertices, g.edges.unionByName(rows, allowMissingColumns=True))
            elif isinstance(op, _PendingMerge):
                keys, mdf = op.keys, op.df
                extra = [c for c in mdf.columns if c not in keys]
                target = g.vertices if op.kind == "node" else g.edges
                for k in keys:
                    if k not in target.columns:
                        # a pattern property NO node in the graph
                        # carries: nothing can match, the merge
                        # creates, and the graph gains the column
                        # (null elsewhere) — Neo4j's behavior
                        target = target.withColumn(
                            k,
                            F.lit(None).cast(mdf.schema[k].dataType),
                        )
                # node MERGE matching uses MATCH semantics for labels
                # (round 13): the pattern's label set must be a SUBSET
                # of the node's — MERGE (n:A) matches an existing
                # (:A:B) node. Created rows still carry exactly the
                # pattern's (canonical) label set.
                subset = op.kind == "node" and LABEL_COL in keys

                def _mcond():
                    conds = []
                    for k in keys:
                        if k == LABEL_COL and subset:
                            conds.append(F.forall(
                                F.split(F.col(f"_m_{k}"), ":"),
                                lambda l: F.array_contains(
                                    F.split(F.col(k), ":"), l
                                ),
                            ))
                        else:
                            conds.append(F.col(k) == F.col(f"_m_{k}"))
                    out = conds[0]
                    for c in conds[1:]:
                        out = out & c
                    return out

                if subset:
                    m2 = mdf.select(
                        *[F.col(c).alias(f"_m_{c}") for c in mdf.columns]
                    )
                    absent = m2.join(target, _mcond(), "left_anti").select(
                        *[F.col(f"_m_{c}").alias(c) for c in mdf.columns]
                    )
                else:
                    absent = mdf.join(target, keys, "left_anti")
                if extra and subset:
                    joined = target.join(F.broadcast(m2), _mcond(), "left")
                    for p in extra:
                        old = F.col(p) if p in target.columns else F.lit(None)
                        joined = joined.withColumn(
                            f"_v_{p}", F.coalesce(F.col(f"_m_{p}"), old)
                        )
                    keep = [c for c in target.columns if c not in extra] + [
                        F.col(f"_v_{p}").alias(p) for p in extra
                    ]
                    target = joined.select(*keep)
                elif extra:
                    # matched rows: COW update (SET applies to matched AND
                    # created — created rows carry the props directly)
                    upd = mdf.select(
                        *keys, *[F.col(p).alias(f"_new_{p}") for p in extra]
                    )
                    joined = target.join(F.broadcast(upd), keys, "left")
                    for p in extra:
                        old = F.col(p) if p in target.columns else F.lit(None)
                        joined = joined.withColumn(
                            f"_v_{p}", F.coalesce(F.col(f"_new_{p}"), old)
                        )
                    keep = [c for c in target.columns if c not in extra] + [
                        F.col(f"_v_{p}").alias(p) for p in extra
                    ]
                    target = joined.select(*keep)
                idc = "id" if op.kind == "node" else "eid"
                offset = (target.agg(F.max(idc)).collect()[0][0] or 0) + 1
                w = Window.orderBy(*keys)
                created = absent.withColumn(
                    idc, (F.row_number().over(w) + offset - 1).cast("long")
                )
                merged = target.unionByName(created, allowMissingColumns=True)
                g = (
                    Graph(merged, g.edges)
                    if op.kind == "node"
                    else Graph(g.vertices, merged)
                )
            elif op[0] == "set":
                _, kind, upd, props = op
                if kind == "node":
                    target, key = g.vertices, "id"
                else:
                    target, key = g.edges, "eid"
                joined = target.join(
                    F.broadcast(upd), target[key] == upd["_sid"], "left"
                )
                for p in props:
                    old = F.col(p) if p in target.columns else F.lit(None)
                    joined = joined.withColumn(
                        f"_v_{p}", F.coalesce(F.col(f"_new_{p}"), old)
                    )
                keep = [
                    c for c in target.columns if c not in props
                ] + [F.col(f"_v_{p}").alias(p) for p in props]
                out = joined.select(*keep)
                g = (
                    Graph(out, g.edges) if kind == "node" else Graph(g.vertices, out)
                )
            elif op[0] == "remove":
                _, kind, ids, props = op
                if kind == "node":
                    target, key = g.vertices, "id"
                else:
                    target, key = g.edges, "eid"
                types = dict(target.dtypes)
                marked = ids.withColumn("_rm", F.lit(True))
                joined = target.join(
                    F.broadcast(marked), target[key] == marked["_sid"], "left"
                )
                sel = []
                for col in target.columns:
                    if col in props:
                        # typed NULL on matched rows; unmatched (_rm null)
                        # fall through to the original value
                        sel.append(
                            F.when(F.col("_rm"), F.lit(None).cast(types[col]))
                            .otherwise(F.col(col))
                            .alias(col)
                        )
                    else:
                        sel.append(F.col(col))
                out = joined.select(*sel)
                g = (
                    Graph(out, g.edges) if kind == "node" else Graph(g.vertices, out)
                )
            elif op[0] in ("remove_label", "set_label"):
                _, ids, lbl = op
                target = g.vertices
                marked = ids.withColumn("_rm", F.lit(True))
                joined = target.join(
                    F.broadcast(marked),
                    target["id"] == marked["_sid"], "left",
                )
                cur = self._labels_of(F.col(LABEL_COL))
                if op[0] == "remove_label":
                    arr = F.array_remove(cur, lbl)
                else:
                    arr = F.array_union(cur, F.array(F.lit(lbl)))
                new = F.when(
                    F.size(arr) > 0,
                    F.array_join(F.array_sort(arr), ":"),
                )
                sel = [
                    F.when(F.col("_rm"), new)
                    .otherwise(F.col(col))
                    .alias(col)
                    if col == LABEL_COL
                    else F.col(col)
                    for col in target.columns
                ]
                g = Graph(joined.select(*sel), g.edges)
            elif op[0] == "del_edges":
                g = Graph(g.vertices, g.edges.join(op[1], "eid", "left_anti"))
            elif op[0] == "del_nodes":
                _, ids, detach = op
                v = g.vertices.join(ids, "id", "left_anti")
                e = g.edges
                if detach:
                    e = e.join(
                        ids.withColumnRenamed("id", "src"), "src", "left_anti"
                    ).join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
                g = Graph(v, e)
        if ctx.ops:
            # Mutations commit eagerly (as a Neo4j transaction would) and
            # truncate lineage: without this, an iterative driver loop —
            # the reference's train() — stacks every past mutation's
            # joins/unions into one ever-deeper plan and each iteration
            # re-executes all previous ones (same fix as kmeans.fit's
            # per-iteration localCheckpoint).
            g = Graph(
                g.vertices.localCheckpoint(eager=True),
                g.edges.localCheckpoint(eager=True),
            )
        self.graph = g

    # -- expressions --------------------------------------------------------

    def _fields(self, df: DataFrame, var: str) -> list[str]:
        return [f.name for f in df.schema[var].dataType.fields]

    def _one_row(self) -> DataFrame:
        # no columns: range(1) would expose an 'id' column and let the
        # unbound variable `id` silently resolve to 0 (round-6 review)
        return self.graph.vertices.sparkSession.range(1).select()

    def _dtype_of(self, col: Column, df: DataFrame | None):
        """Best-effort Spark type of a compiled column against the
        current frame — None when it cannot be resolved (lambda scope,
        no frame). Analysis only, no job."""
        if df is None:
            return None
        try:
            return df.select(col).schema[0].dataType
        except Exception:
            return None

    @staticmethod
    def _entity_prop_fields(bdt) -> list | None:
        """Property fields of a node/relationship struct, or None when
        the struct is NOT an entity (a plain map literal). Entity
        structs are recognized by their full internal column
        signature — id+label for nodes, src+dst+relationship for
        relationships. KNOWN HEURISTIC RESIDUE (round-14 ADVICE): a
        user map literal that happens to carry id:long+label:string
        (e.g. WITH {id: n.id, label: n.label, x: 1} AS m) is
        indistinguishable from an entity by schema alone and is
        classified as one — harmless for literal-key access (which
        resolves every field since round 14), but a RUNTIME-computed
        key over such a map skips its id/label fields. A hidden
        marker field on real entity structs would disambiguate at the
        cost of changing every entity schema; not worth it for this
        corner."""
        names = set(bdt.names)
        if (
            {"id", "label"} <= names
            and isinstance(bdt["id"].dataType, T.LongType)
            and isinstance(bdt["label"].dataType, T.StringType)
        ):
            internal = ("id", "label")
        elif (
            {"src", "dst", "relationship"} <= names
            and isinstance(bdt["src"].dataType, T.LongType)
            and isinstance(bdt["dst"].dataType, T.LongType)
        ):
            internal = ("src", "dst", "relationship")
        else:
            # name collision without the entity TYPES (e.g. a LOAD
            # CSV row whose headers happen to include id/label — all
            # strings): a plain map, every field resolvable
            return None
        return [f for f in bdt.names if f not in internal]

    # Neo4j temporal accessor -> Spark function (ISO week rules match;
    # Spark's dayofweek is Sunday=1, Neo4j's is ISO Monday=1)
    _DATE_ACCESSORS = {
        "year": F.year,
        "quarter": F.quarter,
        "month": F.month,
        "week": F.weekofyear,
        "day": F.dayofmonth,
        "ordinalDay": F.dayofyear,
        "dayOfWeek": lambda c: ((F.dayofweek(c) + 5) % 7) + 1,
    }
    _TIME_ACCESSORS = {
        "hour": F.hour,
        "minute": F.minute,
        "second": F.second,
    }

    def _temporal_accessor(self, base: Column, name: str, dt) -> Column:
        """date/datetime component access (d.year, ts.minute, ...)."""
        if name in self._DATE_ACCESSORS:
            return self._DATE_ACCESSORS[name](base).cast("long")
        timelike = isinstance(dt, (T.TimestampType, T.TimestampNTZType))
        if name in self._TIME_ACCESSORS:
            if not timelike:
                raise ValueError(
                    f"cypher: .{name} needs a datetime, not a date"
                )
            return self._TIME_ACCESSORS[name](base).cast("long")
        if name == "epochSeconds" and timelike:
            return F.unix_seconds(base.cast("timestamp"))
        if name == "epochMillis" and timelike:
            return F.unix_millis(base.cast("timestamp"))
        raise ValueError(
            f"cypher: unsupported temporal accessor .{name} "
            "(year/quarter/month/week/day/ordinalDay/dayOfWeek"
            "/hour/minute/second/epochSeconds/epochMillis)"
        )

    _ISO_DURATION = re.compile(
        r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
        r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
    )

    # durations compile to Neo4j's own internal model — a struct of
    # (months, days, seconds) — so accessors and duration.between()
    # are plain field reads/arithmetic; conversion to a Spark interval
    # happens only at temporal +/- sites (_interval_from_duration).
    _DUR_FIELDS = ("months", "days", "seconds")

    @classmethod
    def _is_duration_dt(cls, dt) -> bool:
        return (
            isinstance(dt, T.StructType)
            and tuple(dt.names) == cls._DUR_FIELDS
        )

    @staticmethod
    def _duration_struct(months, days, seconds) -> Column:
        return F.struct(
            months.cast("long").alias("months"),
            days.cast("long").alias("days"),
            seconds.cast("double").alias("seconds"),
        )

    @staticmethod
    def _interval_from_duration(c: Column) -> Column:
        z = F.lit(0)
        return F.make_interval(
            z, c["months"], z, c["days"], z, z, c["seconds"]
        )

    # Neo4j's geographic calculator: haversine over a sphere of the
    # WGS-84 MEAN earth radius (6371 km class). The exact constant
    # Neo4j uses is an implementation detail not fixed by openCypher;
    # this module pins the IUGG mean radius 6371008.7714 m (the
    # (2a+b)/3 mean of the published WGS-84 ellipsoid axes a=6378137,
    # b=6356752.3142) and documents it — oracle entries state the
    # same formula, so the choice is test-visible, not hidden.
    _EARTH_RADIUS_M = 6371008.7714

    def _geo_distance(
        self, a: Column, b: Column, with_height: bool = False
    ) -> Column:
        lat1 = F.radians(a["latitude"])
        lat2 = F.radians(b["latitude"])
        dlat = lat2 - lat1
        dlon = F.radians(b["longitude"]) - F.radians(a["longitude"])
        h = (
            F.sin(dlat / 2) ** 2
            + F.cos(lat1) * F.cos(lat2) * F.sin(dlon / 2) ** 2
        )
        angle = 2 * F.asin(F.least(F.lit(1.0), F.sqrt(h)))
        if not with_height:
            return F.lit(self._EARTH_RADIUS_M) * angle
        # wgs-84-3d (round 13): Neo4j's GeographicCalculator computes
        # the surface arc on a sphere inflated by the AVERAGE height,
        # then combines it with the height difference via Pythagoras —
        # the arc/chord mix is Neo4j's documented model, reproduced
        # exactly (over this module's pinned mean radius).
        avg_h = (a["height"] + b["height"]) / 2
        d2d = (F.lit(self._EARTH_RADIUS_M) + avg_h) * angle
        return F.sqrt(d2d ** 2 + (b["height"] - a["height"]) ** 2)

    @staticmethod
    def _maybe_duration(e) -> bool:
        """Cheap AST test for 'could compile to a duration struct' —
        gates the +/- dtype probe (one analysis pass) to candidates:
        duration()/duration.between() calls and bound variables (a
        WITH-aliased duration). Literals, properties and everything
        else can't be durations (vertex columns are primitive)."""
        if isinstance(e, Func):
            return e.name.lower() in ("duration", "duration.between")
        return isinstance(e, Var)

    @staticmethod
    def _maybe_point(e) -> bool:
        """Cheap AST test for 'could compile to a spatial point' —
        point() calls and bound variables (a WITH-aliased point);
        vertex property columns are primitive, so Prop can't be one."""
        if isinstance(e, Func):
            return e.name.lower() == "point"
        return isinstance(e, Var)

    @staticmethod
    def _is_point_dt(dt) -> bool:
        return isinstance(dt, T.StructType) and "crs" in dt.names

    def _duration_col(self, arg, df, params) -> Column:
        """duration({...}) / duration('P1DT2H') -> a duration struct.
        Component maps take expressions; the string form must be a
        literal (it parses driver-side)."""
        zero = F.lit(0)
        if isinstance(arg, MapLit):
            allowed = (
                "years", "months", "weeks", "days",
                "hours", "minutes", "seconds",
            )
            bad = set(arg.items) - set(allowed)
            if bad:
                raise ValueError(
                    f"cypher: duration() component(s) {sorted(bad)} "
                    f"unsupported (use {'/'.join(allowed)})"
                )
            p = {
                k: self._expr(v, df, params) for k, v in arg.items.items()
            }

            def g(k):
                return p.get(k, zero)

            return self._duration_struct(
                g("years") * 12 + g("months"),
                g("weeks") * 7 + g("days"),
                g("hours") * 3600 + g("minutes") * 60 + g("seconds"),
            )
        if isinstance(arg, Lit) and isinstance(arg.value, str):
            m = self._ISO_DURATION.match(arg.value)
            if not m or arg.value in ("P", "PT"):
                raise ValueError(
                    f"cypher: bad ISO-8601 duration {arg.value!r}"
                )
            y, mo, w, d, h, mi, s = (
                (float(g) if g and "." in g else int(g or 0))
                for g in m.groups()
            )
            return self._duration_struct(
                F.lit(y * 12 + mo),
                F.lit(w * 7 + d),
                F.lit(h * 3600 + mi * 60 + s),
            )
        raise ValueError(
            "cypher: duration() takes a component map or a string "
            "LITERAL"
        )

    def _duration_between(self, a: Column, b: Column, adt, bdt) -> Column:
        """duration.between(a, b): Neo4j's (months, days, seconds)
        decomposition — the largest whole-month count m with
        add_months(a, m) not past b, then whole days, then leftover
        seconds (timestamps only). floor(months_between) can be off by
        one in either direction (it assumes 31-day months), so both
        corrections are applied explicitly. Reversed ranges (b < a)
        truncate toward zero with java.time/Neo4j semantics — the
        most-NEGATIVE m with add_months(a, m) >= b, then signed days,
        then signed leftover seconds — so components carry a uniform
        sign AND a + duration.between(a, b) = b round-trips exactly
        (month clamping is not symmetric, so decomposing |interval|
        and negating would break the round-trip on dates)."""
        datelike = isinstance(adt, T.DateType) and isinstance(
            bdt, T.DateType
        )
        if datelike:
            mb = F.months_between(b, a)
            m0f = F.floor(mb).cast("int")
            m_fwd = (
                m0f
                + F.when(F.add_months(a, m0f + 1) <= b, 1).otherwise(0)
                - F.when(F.add_months(a, m0f) > b, 1).otherwise(0)
            )
            m0b = F.ceil(mb).cast("int")
            m_bwd = (
                m0b
                - F.when(F.add_months(a, m0b - 1) >= b, 1).otherwise(0)
                + F.when(F.add_months(a, m0b) < b, 1).otherwise(0)
            )
            m = F.when(b < a, m_bwd).otherwise(m_fwd)
            days = F.datediff(b, F.add_months(a, m))
            return self._duration_struct(m, days, F.lit(0))
        # timestamp / timestamp_ntz: the month count compares ANCHORED
        # timestamps (time-of-day matters — Jan-15 10:00 to Feb-15
        # 09:00 is zero whole months)
        ts_a, ts_b = a.cast("timestamp"), b.cast("timestamp")
        z = F.lit(0)

        def addm(k):
            return ts_a + F.make_interval(z, k, z, z, z, z, z)

        mb = F.months_between(ts_b, ts_a)
        m0f = F.floor(mb).cast("int")
        m_fwd = (
            m0f
            + F.when(addm(m0f + 1) <= ts_b, 1).otherwise(0)
            - F.when(addm(m0f) > ts_b, 1).otherwise(0)
        )
        m0b = F.ceil(mb).cast("int")
        m_bwd = (
            m0b
            - F.when(addm(m0b - 1) >= ts_b, 1).otherwise(0)
            + F.when(addm(m0b) < ts_b, 1).otherwise(0)
        )
        m = F.when(ts_b < ts_a, m_bwd).otherwise(m_fwd)
        total = F.unix_seconds(ts_b) - F.unix_seconds(addm(m))
        days = ((total - total % 86400) / 86400).cast("long")
        secs = (total - days * 86400).cast("double")
        return self._duration_struct(m, days, secs)

    # Neo4j duration accessor -> (field, transform). Divisions
    # truncate toward ZERO (Neo4j's negative-duration semantics), not
    # floor — Spark's % keeps the dividend's sign, so (c - c % n) / n
    # is exact truncating division, and double→long casts truncate.
    @staticmethod
    def _tdiv(c: Column, n: int) -> Column:
        return ((c - c % n) / n).cast("long")

    _DURATION_ACCESSORS = {
        "years": lambda c: CypherSession._tdiv(c["months"], 12),
        "months": lambda c: c["months"],
        "monthsOfYear": lambda c: c["months"] % 12,
        "weeks": lambda c: CypherSession._tdiv(c["days"], 7),
        "days": lambda c: c["days"],
        "daysOfWeek": lambda c: c["days"] % 7,
        "hours": lambda c: CypherSession._tdiv(c["seconds"], 3600),
        "minutes": lambda c: CypherSession._tdiv(c["seconds"], 60),
        "seconds": lambda c: c["seconds"].cast("long"),
        "minutesOfHour": lambda c: CypherSession._tdiv(c["seconds"], 60)
        % 60,
        "secondsOfMinute": lambda c: c["seconds"].cast("long") % 60,
        "milliseconds": lambda c: (c["seconds"] * 1000).cast("long"),
    }

    def _expr(self, e, df: DataFrame | None, params) -> Column:
        if isinstance(e, Lit):
            return F.lit(e.value)
        if isinstance(e, Param):
            if e.name not in params:
                raise KeyError(f"cypher: missing parameter ${e.name}")
            return F.lit(params[e.name])
        if isinstance(e, Var):
            if e.name in self._lambda_env:
                return self._lambda_env[e.name]
            return F.col(e.name)
        if isinstance(e, LabelTest):
            base = self._expr(e.base, df, params)
            if (
                isinstance(e.base, Var)
                and df is not None
                and e.base.name in df.columns
                and isinstance(
                    df.schema[e.base.name].dataType, T.StructType
                )
                and "src" in df.schema[e.base.name].dataType.names
            ):
                # relationship variable: r:TYPE is a type test (types
                # are single-valued, so multi tests can never hold)
                if ":" in e.label:
                    return F.lit(False)
                return base.getField("relationship") == e.label
            return self._has_labels(base.getField(LABEL_COL), e.label)
        if isinstance(e, Prop):
            # openCypher: accessing a property a node/edge does not HAVE
            # is null, not an error — when the base is a plain bound
            # variable whose struct schema lacks the field entirely
            # (no node in the whole graph carries it), compile to null
            if (
                isinstance(e.base, Var)
                and e.base.name not in self._lambda_env
                and df is not None
                and e.base.name in df.columns
            ):
                dt = df.schema[e.base.name].dataType
                if (
                    isinstance(dt, T.StructType)
                    and e.name not in dt.names
                    and not (
                        # derived duration accessors (.years, .hours,
                        # ...) are not struct fields — let them reach
                        # the _DURATION_ACCESSORS hook below
                        self._is_duration_dt(dt)
                        and e.name in self._DURATION_ACCESSORS
                    )
                ):
                    return F.lit(None)
            base = self._expr(e.base, df, params)
            # the dtype probe costs one analysis pass — only pay it for
            # names that could be temporal/duration accessors at all
            if e.name in self._DURATION_ACCESSORS:
                ddt = self._dtype_of(base, df)
                if self._is_duration_dt(ddt):
                    return self._DURATION_ACCESSORS[e.name](
                        base
                    ).cast("long")
            if (
                e.name in self._DATE_ACCESSORS
                or e.name in self._TIME_ACCESSORS
                or e.name in ("epochSeconds", "epochMillis")
            ):
                bdt = self._dtype_of(base, df)
                if isinstance(
                    bdt,
                    (T.DateType, T.TimestampType, T.TimestampNTZType),
                ):
                    return self._temporal_accessor(base, e.name, bdt)
            return base.getField(e.name)
        if isinstance(e, Index):
            base = self._expr(e.base, df, params)
            if isinstance(e.idx, int):
                return base.getItem(e.idx)
            # round 11: dynamic subscript — a literal/parameter key is
            # known at compile time, so node/relationship structs
            # resolve through getField (absent property -> null, the
            # openCypher rule); anything else subscripts JVM-side
            key = None
            if isinstance(e.idx, Lit):
                key = e.idx.value
            elif isinstance(e.idx, Param):
                if e.idx.name not in params:
                    raise KeyError(
                        f"cypher: missing parameter ${e.idx.name}"
                    )
                key = params[e.idx.name]
            if isinstance(key, int) and not isinstance(key, bool):
                return base.getItem(key)
            if isinstance(key, str):
                bdt = self._dtype_of(base, df)
                if isinstance(bdt, T.StructType):
                    # a compile-time string key is exactly Prop
                    # access, so n['id'] resolves like n.id — in THIS
                    # engine's data model id/label/src/dst are
                    # accessible properties (every fixture reads
                    # n.id), and the two literal access forms must
                    # not diverge (round-14 ADVICE fix). Only
                    # RUNTIME-computed keys stay property-only — see
                    # the entity-prop-fields rule below.
                    if key not in bdt.names:
                        return F.lit(None)
                    return base.getField(key)
                return base.getItem(key)  # map subscript
            idx_col = self._expr(e.idx, df, params)
            bdt = self._dtype_of(base, df)
            if isinstance(bdt, T.StructType):
                # round 13: RUNTIME-computed key — a CASE chain over
                # the entity's PROPERTY fields. DOCUMENTED DIVERGENCE
                # (round 14): literal forms n.id / n['id'] DO resolve
                # internal fields (they are accessible properties in
                # this engine's data model), but a runtime key never
                # reaches id/label/src/dst/relationship — including
                # them would drag label:string into the type
                # unification below and gate every numeric-property
                # entity. The branch type is unified
                # HERE, not by Spark's When coercion — ANSI happily
                # coerces string->long in a CASE, which would turn a
                # string property into a runtime cast error. Rule:
                # identical types ride as-is; mixed integrals widen
                # to long; a mixed numeric family widens to double
                # (Cypher's 1 = 1.0 equality semantics); anything
                # else is the documented heterogeneity gate.
                props = self._entity_prop_fields(bdt)
                if props is None:
                    props = list(bdt.names)
                if not props:
                    return F.lit(None)
                ftypes = [bdt[f].dataType for f in props]
                integral = (T.ByteType, T.ShortType,
                            T.IntegerType, T.LongType)
                numeric = integral + (
                    T.FloatType, T.DoubleType, T.DecimalType
                )
                distinct = {t.simpleString() for t in ftypes}
                if len(distinct) == 1:
                    cast_to = None
                elif all(isinstance(t, integral) for t in ftypes):
                    cast_to = "long"
                elif all(isinstance(t, numeric) for t in ftypes):
                    cast_to = "double"
                else:
                    raise ValueError(
                        "cypher: dynamic property access with a "
                        "runtime key needs the entity's property "
                        "types to unify (same type, or one numeric "
                        "family); this graph mixes "
                        f"{sorted(distinct)} — use a literal or "
                        "parameter key (n['name'], n[$k]) instead"
                    )
                chain = None
                for fname in props:
                    cond = idx_col == F.lit(fname)
                    val = base.getField(fname)
                    if cast_to is not None:
                        val = val.cast(cast_to)
                    chain = (
                        F.when(cond, val) if chain is None
                        else chain.when(cond, val)
                    )
                return chain.otherwise(F.lit(None))
            return base[idx_col]
        if isinstance(e, MapLit):
            return F.struct(
                *[
                    self._expr(v, df, params).alias(k)
                    for k, v in e.items.items()
                ]
            )
        if isinstance(e, ListLit):
            return F.array(*[self._expr(v, df, params) for v in e.items])
        if isinstance(e, ListComp):
            # [x IN src WHERE pred | mapped] -> filter + transform HOFs
            return self._listcomp_over(self._expr(e.src, df, params), e, df, params)
        if isinstance(e, Quantifier):
            src = self._expr(e.src, df, params)
            fn = self._lambda_fn([e.var], e.pred, df, params)
            if e.kind == "all":
                return F.forall(src, fn)
            if e.kind == "any":
                return F.exists(src, fn)
            if e.kind == "none":
                return ~F.exists(src, fn)
            # single: exactly one element satisfies
            return F.size(F.filter(src, fn)) == 1
        if isinstance(e, Reduce):
            # F.aggregate requires merge-result type == init type; Cypher
            # integers are 64-bit, so an integer-literal init compiles as
            # long (acc + <int/long element> then stays long). Float
            # accumulation needs a float init (0.0), as in Neo4j.
            init = self._expr(e.init, df, params)
            if isinstance(e.init, Lit) and isinstance(e.init.value, int) and not isinstance(e.init.value, bool):
                init = init.cast("long")
            return F.aggregate(
                self._expr(e.src, df, params),
                init,
                self._lambda_fn([e.acc, e.var], e.body, df, params),
            )
        if isinstance(e, Case):
            subj = (
                self._expr(e.subject, df, params)
                if e.subject is not None
                else None
            )
            col = None
            for w, th in e.whens:
                wc = self._expr(w, df, params)
                cond = wc if subj is None else (subj == wc)
                then = self._expr(th, df, params)
                col = F.when(cond, then) if col is None else col.when(cond, then)
            # Cypher: no ELSE -> null (F.when's default, so nothing to add)
            return col if e.default is None else col.otherwise(
                self._expr(e.default, df, params)
            )
        if isinstance(e, Bin):
            if e.op in ("and", "or"):
                l, r = self._expr(e.left, df, params), self._expr(e.right, df, params)
                return (l & r) if e.op == "and" else (l | r)
            l, r = self._expr(e.left, df, params), self._expr(e.right, df, params)
            if e.op == "in":
                return F.array_contains(r, l)
            if e.op == "startswith":
                return l.startswith(r)
            if e.op == "endswith":
                return l.endswith(r)
            if e.op == "contains":
                return l.contains(r)
            if e.op == "=~":
                # Cypher =~ is a WHOLE-string match (Java matches());
                # Spark's regexp_like is a find() — anchor the pattern
                return F.regexp_like(
                    l, F.concat(F.lit("^(?:"), r, F.lit(")$"))
                )
            if e.op in ("+", "-") and (
                self._maybe_duration(e.left)
                or self._maybe_duration(e.right)
            ):
                ldt = self._dtype_of(l, df)
                rdt = self._dtype_of(r, df)
                ldur = self._is_duration_dt(ldt)
                rdur = self._is_duration_dt(rdt)
                if ldur and rdur:
                    sign = 1 if e.op == "+" else -1
                    return self._duration_struct(
                        l["months"] + sign * r["months"],
                        l["days"] + sign * r["days"],
                        l["seconds"] + sign * r["seconds"],
                    )
                if rdur:  # temporal +/- duration
                    iv = self._interval_from_duration(r)
                    return (l + iv) if e.op == "+" else (l - iv)
                if ldur and e.op == "+":  # duration + temporal
                    return r + self._interval_from_duration(l)
            if e.op in ("<", "<=", ">", ">=") and (
                self._maybe_point(e.left) or self._maybe_point(e.right)
            ):
                # Neo4j: ordering comparisons BETWEEN points are
                # undefined and yield null (equality still compares
                # by components+crs, which struct equality gives);
                # the dtype probe is gated to syntactic candidates,
                # like the duration +/- path above
                if self._is_point_dt(
                    self._dtype_of(l, df)
                ) or self._is_point_dt(self._dtype_of(r, df)):
                    return F.lit(None).cast("boolean")
            return {
                "=": l == r,
                "<>": l != r,
                "!=": l != r,
                "<": l < r,
                "<=": l <= r,
                ">": l > r,
                ">=": l >= r,
                "+": l + r,
                "-": l - r,
                "*": l * r,
                "/": l / r,
                "%": l % r,  # sign of dividend, Cypher == Java == Spark
            }[e.op]
        if isinstance(e, Func):
            name = e.name.lower()
            if name.startswith("apoc."):
                return self._apoc_fn(name, e.args, df, params)
            if name == "id":
                base = self._expr(e.args[0], df, params)
                if df is not None and isinstance(e.args[0], Var):
                    fields = self._fields(df, e.args[0].name)
                    return base.getField("eid" if "src" in fields else "id")
                return base.getField("id")
            if name == "rand":
                return F.rand(self.seed)
            if name == "abs":
                return F.abs(self._expr(e.args[0], df, params))
            if name == "not":
                return ~self._expr(e.args[0], df, params)
            if name in ("tolower", "lower"):
                return F.lower(self._expr(e.args[0], df, params))
            if name in ("toupper", "upper"):
                return F.upper(self._expr(e.args[0], df, params))
            if name == "coalesce":
                return F.coalesce(*[self._expr(a, df, params) for a in e.args])
            if name == "exists" and len(e.args) == 1:
                # legacy Neo4j exists(n.prop) == n.prop IS NOT NULL; the
                # pattern form exists((a)-[:R]->(b)) is parsed separately
                # as PatternPred and handled in WHERE
                return self._expr(e.args[0], df, params).isNotNull()
            if name == "range":
                # Cypher range(start, end[, step]): inclusive both ends,
                # EMPTY when the step's sign can't reach end from start —
                # where F.sequence would either auto-negate the step
                # (range(5,1) -> [5..1]) or throw (explicit wrong-sign
                # step), so gate with a when() (round-6 review)
                s = self._expr(e.args[0], df, params)
                stop = self._expr(e.args[1], df, params)
                step = (
                    self._expr(e.args[2], df, params)
                    if len(e.args) > 2
                    else F.lit(1)
                )
                reachable = ((step > 0) & (s <= stop)) | ((step < 0) & (s >= stop))
                empty = F.slice(F.sequence(s, s), 1, 0)  # typed empty array
                return F.when(reachable, F.sequence(s, stop, step)).otherwise(empty)
            if name == "size":
                # Cypher size() counts list elements AND string chars;
                # F.size is list/map-only, so resolve the operand's type
                # (driver-side analysis, no job) and pick length() for
                # strings. Lambda-scoped operands can't be resolved
                # against df — fall back to the list form.
                c = self._expr(e.args[0], df, params)
                if df is not None:
                    try:
                        dt = df.select(c).schema[0].dataType
                    except Exception:
                        dt = None
                    if isinstance(dt, T.StringType):
                        return F.length(c)
                return F.size(c)
            if name == "length":
                a = e.args[0]
                if (
                    isinstance(a, Var)
                    and df is not None
                    and f"__plen_{a.name}" in df.columns
                ):
                    return F.col(f"__plen_{a.name}")
                raise ValueError(
                    "cypher: length() is supported for path variables "
                    "(p = ..., p = shortestPath(...)); use size() for "
                    "strings and lists"
                )
            if name in ("nodes", "relationships", "rels"):
                a = e.args[0]
                col = (
                    f"__pnodes_{a.name}"
                    if name == "nodes"
                    else f"__prels_{a.name}"
                )
                if isinstance(a, Var) and df is not None and col in df.columns:
                    return F.col(col)
                raise ValueError(
                    f"cypher: {name}() needs a general path variable "
                    "(p = (a)-[r]->(b); shortestPath paths expose only "
                    "length())"
                )
            if name in ("isnull", "isnotnull"):
                c = self._expr(e.args[0], df, params)
                return c.isNull() if name == "isnull" else c.isNotNull()
            if name == "tostring":
                return self._expr(e.args[0], df, params).cast("string")
            if name == "tointeger":
                # Cypher: numeric -> truncate toward zero; string -> parse
                # (null on failure, hence try_cast under ANSI mode). The
                # direct long path first: routing everything through
                # double would corrupt integers above 2^53 (round-6
                # review); the double fallback handles '4.2'-style
                # strings and float columns (truncation toward zero).
                c = self._expr(e.args[0], df, params)
                return F.coalesce(
                    c.try_cast("long"), c.try_cast("double").cast("long")
                )
            if name == "tofloat":
                return self._expr(e.args[0], df, params).try_cast("double")
            if name == "toboolean":
                # strict 'true'/'false' (any case), null otherwise — Spark's
                # boolean cast also accepts 'yes'/'1' which Cypher rejects
                lc = F.lower(self._expr(e.args[0], df, params).cast("string"))
                return F.when(lc == "true", F.lit(True)).when(
                    lc == "false", F.lit(False)
                )
            if name == "substring":
                # Cypher is 0-based; Spark substring is 1-based
                s = self._expr(e.args[0], df, params)
                start = self._expr(e.args[1], df, params)
                ln = (
                    self._expr(e.args[2], df, params)
                    if len(e.args) > 2
                    else F.length(s)
                )
                return F.substring(s, start + F.lit(1), ln)
            if name == "left":
                s = self._expr(e.args[0], df, params)
                return F.substring(s, F.lit(1), self._expr(e.args[1], df, params))
            if name == "right":
                s = self._expr(e.args[0], df, params)
                n = self._expr(e.args[1], df, params)
                return F.substring(
                    s, F.greatest(F.length(s) - n + F.lit(1), F.lit(1)), n
                )
            if name == "trim":
                return F.trim(self._expr(e.args[0], df, params))
            if name == "ltrim":
                return F.ltrim(self._expr(e.args[0], df, params))
            if name == "rtrim":
                return F.rtrim(self._expr(e.args[0], df, params))
            if name == "replace":
                return F.replace(
                    *[self._expr(a, df, params) for a in e.args]
                )
            if name == "split":
                # Cypher splits on a LITERAL delimiter; F.split takes a
                # regex, so the delimiter must be known at compile time
                # to be escaped
                d = e.args[1]
                if isinstance(d, Param):
                    d = Lit(params.get(d.name))
                if not isinstance(d, Lit) or not isinstance(d.value, str):
                    raise ValueError(
                        "cypher: split() needs a string-literal (or string "
                        "parameter) delimiter"
                    )
                return F.split(
                    self._expr(e.args[0], df, params), re.escape(d.value), -1
                )
            if name == "reverse":  # strings and lists
                return F.reverse(self._expr(e.args[0], df, params))
            if name == "head":
                return F.get(self._expr(e.args[0], df, params), 0)
            if name == "last":
                c = self._expr(e.args[0], df, params)
                return F.get(c, F.size(c) - F.lit(1))
            if name == "tail":
                c = self._expr(e.args[0], df, params)
                return F.slice(
                    c, F.lit(2), F.greatest(F.size(c) - F.lit(1), F.lit(0))
                )
            if name == "round":
                c = self._expr(e.args[0], df, params)
                if len(e.args) > 1:
                    prec = e.args[1]
                    if not isinstance(prec, Lit) or not isinstance(prec.value, int):
                        raise ValueError(
                            "cypher: round() precision must be an integer literal"
                        )
                    return F.round(c, prec.value)
                return F.round(c)  # HALF_UP, matching Neo4j
            if name == "floor":
                return F.floor(self._expr(e.args[0], df, params))
            if name == "ceil":
                return F.ceil(self._expr(e.args[0], df, params))
            if name == "sqrt":
                return F.sqrt(self._expr(e.args[0], df, params))
            if name == "sign":  # Cypher sign() returns INTEGER
                return F.signum(self._expr(e.args[0], df, params)).cast("long")
            if name == "exp":
                return F.exp(self._expr(e.args[0], df, params))
            if name == "log":  # Cypher log() is the natural log
                return F.log(self._expr(e.args[0], df, params))
            if name == "log10":
                return F.log10(self._expr(e.args[0], df, params))
            if name == "pi":
                return F.lit(math.pi)
            if name == "labels":
                # round 13: label SET (sorted, ':'-split); unlabeled -> []
                return self._labels_of(
                    self._expr(e.args[0], df, params).getField(LABEL_COL)
                )
            if name == "type":
                return self._expr(e.args[0], df, params).getField("relationship")
            if name in ("keys", "properties"):
                if df is None or not isinstance(e.args[0], Var):
                    raise ValueError(
                        f"cypher: {name}() needs a bound node/edge variable"
                    )
                var = e.args[0].name
                fields = self._fields(df, var)
                internal = (
                    {"src", "dst", "eid", "relationship"}
                    if "src" in fields
                    else {"id", LABEL_COL}
                )
                base = self._expr(e.args[0], df, params)
                props = [f for f in fields if f not in internal]
                if name == "properties":
                    # Returns a STRUCT (Spark rows have a fixed schema),
                    # so a property absent on this entity appears as a
                    # null field — Neo4j's heterogeneous map would omit
                    # it. keys() is the Neo4j-accurate present-only
                    # list; use it when presence matters.
                    return F.struct(
                        *[base.getField(f).alias(f) for f in props]
                    )
                # keys(): only properties present (non-null) on this entity
                return F.filter(
                    F.array(
                        *[
                            F.when(base.getField(f).isNotNull(), F.lit(f))
                            for f in props
                        ]
                    ),
                    lambda x: x.isNotNull(),
                )
            if name in ("date", "datetime", "localdatetime"):
                # round 11 temporal subset: construction from an ISO
                # string or a component map; accessors via Prop,
                # comparisons native, +/- duration() via make_interval.
                # Round 13: CURRENT-time forms — zero args reads the
                # statement clock (Spark's ComputeCurrentTime resolves
                # current_date/current_timestamp/localtimestamp ONCE
                # per query, so every temporal function in a statement
                # observes the same instant, Neo4j's statement-clock
                # rule). Timezone ARGUMENTS stay gated.
                if len(e.args) == 0:
                    if name == "date":
                        return F.current_date()
                    if name == "datetime":
                        return F.current_timestamp()
                    return F.localtimestamp()
                if len(e.args) != 1:
                    raise ValueError(
                        f"cypher: {e.name}() takes zero arguments "
                        "(statement clock) or one (string or "
                        "component map)"
                    )
                a = e.args[0]
                target = (
                    "date" if name == "date"
                    else "timestamp_ntz" if name == "localdatetime"
                    else "timestamp"
                )
                if isinstance(a, MapLit):
                    allowed = (
                        ("year", "month", "day") if name == "date"
                        else ("year", "month", "day",
                              "hour", "minute", "second")
                    )
                    bad = set(a.items) - set(allowed)
                    if bad:
                        raise ValueError(
                            f"cypher: {e.name}() component(s) "
                            f"{sorted(bad)} unsupported"
                        )
                    if "year" not in a.items:
                        raise ValueError(
                            f"cypher: {e.name}() map needs a year"
                        )

                    def comp(k, dflt):
                        if k in a.items:
                            return self._expr(
                                a.items[k], df, params
                            ).cast("int")
                        return F.lit(dflt)

                    d = F.make_date(
                        comp("year", 0), comp("month", 1), comp("day", 1)
                    )
                    if name == "date":
                        return d
                    ts = F.to_timestamp(d).cast(
                        "timestamp_ntz"
                    ) + F.make_interval(
                        F.lit(0), F.lit(0), F.lit(0), F.lit(0),
                        comp("hour", 0), comp("minute", 0),
                        comp("second", 0),
                    )
                    return ts.cast(target)
                if isinstance(a, Lit) and isinstance(a.value, str):
                    # offset/zone-bearing literals gate loudly (the
                    # same rule as time(): Spark would silently shift
                    # to the UTC instant and accessors would diverge
                    # from Neo4j's zone-local components)
                    if not re.fullmatch(
                        r"\d{4}-\d{2}-\d{2}"
                        r"(T\d{2}(:\d{2}(:\d{2}(\.\d+)?)?)?)?",
                        a.value,
                    ):
                        raise ValueError(
                            f"cypher: {e.name}() with an explicit "
                            "offset/zone is unsupported"
                        )
                return self._expr(a, df, params).cast(target)
            if name == "duration":
                if len(e.args) != 1:
                    raise ValueError(
                        "cypher: duration() takes exactly one argument"
                    )
                return self._duration_col(e.args[0], df, params)
            if name in ("duration.between", "duration.inmonths",
                        "duration.indays", "duration.inseconds"):
                if len(e.args) != 2:
                    raise ValueError(
                        f"cypher: {e.name}() takes two temporals"
                    )
                a = self._expr(e.args[0], df, params)
                b = self._expr(e.args[1], df, params)
                full = self._duration_between(
                    a, b, self._dtype_of(a, df), self._dtype_of(b, df)
                )
                z = F.lit(0)
                if name == "duration.inmonths":
                    # whole months only (days/seconds truncate away)
                    return self._duration_struct(
                        full["months"], z, z
                    )
                if name == "duration.indays":
                    # whole DAYS between (no month component): for
                    # dates a plain datediff; for timestamps the
                    # floored second difference
                    adt = self._dtype_of(a, df)
                    bdt = self._dtype_of(b, df)
                    if isinstance(adt, T.DateType) and isinstance(
                        bdt, T.DateType
                    ):
                        return self._duration_struct(
                            z, F.datediff(b, a), z
                        )
                    secs = F.unix_seconds(
                        b.cast("timestamp")
                    ) - F.unix_seconds(a.cast("timestamp"))
                    # truncate toward zero, not floor: a -25h span is
                    # -1 whole day in Neo4j, not -2 (Spark's % keeps
                    # the dividend's sign, so this is exact)
                    return self._duration_struct(
                        z,
                        ((secs - secs % 86400) / 86400).cast("long"),
                        z,
                    )
                if name == "duration.inseconds":
                    adt = self._dtype_of(a, df)
                    bdt = self._dtype_of(b, df)
                    if isinstance(adt, T.DateType) and isinstance(
                        bdt, T.DateType
                    ):
                        secs = F.datediff(b, a).cast("long") * 86400
                    else:
                        secs = F.unix_seconds(
                            b.cast("timestamp")
                        ) - F.unix_seconds(a.cast("timestamp"))
                    return self._duration_struct(z, z, secs)
                return full
            if name in ("time", "localtime"):
                # round 12: clock values ride a timestamp_ntz anchored
                # at 1970-01-01 — accessors (.hour/.minute/.second) and
                # comparisons fall out of the existing machinery.
                # Offsets/timezones stay gated (Spark has no TIME type
                # with zone); time() without an offset equals
                # localtime() under the session's UTC convention.
                # Round 13: zero args = the statement clock's
                # time-of-day, anchored like every other clock value.
                if len(e.args) == 0:
                    return F.to_timestamp(F.concat(
                        F.lit("1970-01-01T"),
                        F.date_format(
                            F.localtimestamp(), "HH:mm:ss.SSSSSS"
                        ),
                    )).cast("timestamp_ntz")
                if len(e.args) != 1:
                    raise ValueError(
                        f"cypher: {e.name}() takes zero arguments "
                        "(statement clock) or one (string or "
                        "component map)"
                    )
                a = e.args[0]
                if isinstance(a, MapLit):
                    if "timezone" in a.items:
                        raise ValueError(
                            f"cypher: {e.name}() timezone component is "
                            "unsupported (UTC-convention clock values "
                            "only)"
                        )
                    bad = set(a.items) - {"hour", "minute", "second"}
                    if bad:
                        raise ValueError(
                            f"cypher: {e.name}() component(s) "
                            f"{sorted(bad)} unsupported"
                        )

                    def tcomp(k):
                        if k in a.items:
                            return self._expr(
                                a.items[k], df, params
                            ).cast("int")
                        return F.lit(0)

                    return (
                        F.to_timestamp(F.lit("1970-01-01"))
                        .cast("timestamp_ntz")
                        + F.make_interval(
                            F.lit(0), F.lit(0), F.lit(0), F.lit(0),
                            tcomp("hour"), tcomp("minute"),
                            tcomp("second"),
                        )
                    )
                if isinstance(a, Lit) and isinstance(a.value, str):
                    # whitelist plain clock forms: HH[:MM[:SS[.fff]]].
                    # Anything else — '+HH:MM', '-HH:MM' (a negative
                    # offset is NOT a separator here), trailing 'Z',
                    # '[zone]' — gates loudly instead of being silently
                    # cast to timestamp_ntz with the zone dropped.
                    if not re.fullmatch(
                        r"\d{2}(:\d{2}(:\d{2}(\.\d+)?)?)?", a.value
                    ):
                        raise ValueError(
                            f"cypher: {e.name}() with an explicit "
                            "offset/zone is unsupported"
                        )
                    return F.lit(
                        f"1970-01-01T{a.value}"
                    ).cast("timestamp_ntz")
                return F.concat(
                    F.lit("1970-01-01T"),
                    self._expr(a, df, params).cast("string"),
                ).cast("timestamp_ntz")
            if name == "point":
                # spatial points — a typed struct {components..., crs}.
                # Round 11: CARTESIAN x/y[/z]. Round 12: GEOGRAPHIC
                # (WGS-84) longitude/latitude; distance() uses the
                # haversine great-circle model (see _geo_distance).
                # Round 13: wgs-84-3d (height) — distance follows
                # Neo4j's avg-height-inflated arc + Pythagoras mix.
                if len(e.args) != 1 or not isinstance(e.args[0], MapLit):
                    raise ValueError(
                        "cypher: point() takes one component map"
                    )
                items = e.args[0].items
                if {"longitude", "latitude"} & set(items):
                    bad = set(items) - {
                        "longitude", "latitude", "height"
                    }
                    if bad or not (
                        {"longitude", "latitude"} <= set(items)
                    ):
                        raise ValueError(
                            "cypher: geographic point() needs "
                            "longitude and latitude (optional "
                            f"height), got {sorted(items)}"
                        )
                    cols = [
                        self._expr(items["longitude"], df, params)
                        .cast("double").alias("longitude"),
                        self._expr(items["latitude"], df, params)
                        .cast("double").alias("latitude"),
                    ]
                    if "height" in items:
                        cols.append(
                            self._expr(items["height"], df, params)
                            .cast("double").alias("height")
                        )
                        crs = "wgs-84-3d"
                    else:
                        crs = "wgs-84"
                    return F.struct(*cols, F.lit(crs).alias("crs"))
                bad = set(items) - {"x", "y", "z"}
                if bad or not {"x", "y"} <= set(items):
                    raise ValueError(
                        "cypher: point() needs x and y (optional z), "
                        f"got {sorted(items)}"
                    )
                cols = [
                    self._expr(items[k], df, params)
                    .cast("double").alias(k)
                    for k in ("x", "y", "z")
                    if k in items
                ]
                crs = "cartesian-3d" if "z" in items else "cartesian"
                return F.struct(*cols, F.lit(crs).alias("crs"))
            if name == "point.withinbbox":
                # round 12: point.withinBBox(p, lowerLeft, upperRight)
                # — cartesian is a plain range test; geographic wraps
                # across the antimeridian when lowerLeft.longitude >
                # upperRight.longitude (Neo4j's rule)
                if len(e.args) != 3:
                    raise ValueError(
                        "cypher: point.withinBBox() takes a point and "
                        "two corner points"
                    )
                p = self._expr(e.args[0], df, params)
                ll = self._expr(e.args[1], df, params)
                ur = self._expr(e.args[2], df, params)
                pdt = self._dtype_of(p, df)
                geo = (
                    isinstance(pdt, T.StructType)
                    and "longitude" in pdt.names
                )
                if geo:
                    lat_ok = (
                        (p["latitude"] >= ll["latitude"])
                        & (p["latitude"] <= ur["latitude"])
                    )
                    lon_ok = F.when(
                        ll["longitude"] <= ur["longitude"],
                        (p["longitude"] >= ll["longitude"])
                        & (p["longitude"] <= ur["longitude"]),
                    ).otherwise(
                        (p["longitude"] >= ll["longitude"])
                        | (p["longitude"] <= ur["longitude"])
                    )
                    return lat_ok & lon_ok
                cond = (
                    (p["x"] >= ll["x"]) & (p["x"] <= ur["x"])
                    & (p["y"] >= ll["y"]) & (p["y"] <= ur["y"])
                )
                if isinstance(pdt, T.StructType) and "z" in pdt.names:
                    cond = cond & (
                        (p["z"] >= ll["z"]) & (p["z"] <= ur["z"])
                    )
                return cond
            if name in ("distance", "point.distance"):
                if len(e.args) != 2:
                    raise ValueError(
                        "cypher: distance() takes two points"
                    )
                a = self._expr(e.args[0], df, params)
                b = self._expr(e.args[1], df, params)
                adt = self._dtype_of(a, df)
                bdt = self._dtype_of(b, df)

                def kind(dt):
                    if not isinstance(dt, T.StructType):
                        return None
                    if "longitude" in dt.names:
                        return (
                            "geo3d" if "height" in dt.names else "geo"
                        )
                    return "3d" if "z" in dt.names else "2d"

                ka, kb = kind(adt), kind(bdt)
                if ka != kb:
                    # Neo4j: distance between points of different
                    # CRS/dimension is null, not an error
                    return F.lit(None).cast("double")
                if ka == "geo":
                    return self._geo_distance(a, b)
                if ka == "geo3d":
                    return self._geo_distance(a, b, with_height=True)
                d2 = (a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2
                if ka == "3d":
                    d2 = d2 + (a["z"] - b["z"]) ** 2
                return F.sqrt(d2)
            raise ValueError(f"cypher: unsupported function {e.name}()")
        raise ValueError(f"cypher: cannot compile expression {e}")
