"""Mini-SPARQL over the triple table, compiled to DataFrame plans.

The reference's documented consumption mode for its emitted triples is
SPARQL against a Jena endpoint (csv2rdf-v4/jena/requests.sparql): a
plain BGP dump (:7), a subPropertyOf-inference CONSTRUCT/INSERT
(:9-19), and the version-resolution SELECT DISTINCT + MINUS + FILTER
(:22-31). This module makes the triple table queryable the same way
WITHOUT an external triple store, by compiling that SPARQL subset
straight to Catalyst plans:

  grammar   PREFIX pfx: <iri>
            SELECT [DISTINCT] (?v | (FN([DISTINCT] ?v|*) AS ?alias)
            | (valexpr AS ?alias) ... | *) WHERE { group }
            [GROUP BY ?v ...] [HAVING(expr)]
              — FN ∈ COUNT|SUM|MIN|MAX|AVG|SAMPLE|GROUP_CONCAT
              (GROUP_CONCAT takes `; SEPARATOR="..."`; SAMPLE =
              deterministic min; GROUP_CONCAT sorts members —
              spec leaves both free); grouping is term-based
              (datatype shadows join the keys); projected plain vars
              must be grouped; COUNT skips unbound; SUM/AVG try_cast
              lexical forms to double; MIN/MAX compare lexical forms;
              (valexpr AS ?alias) items are non-aggregate SELECT
              expressions (out of subset next to aggregates)
            CONSTRUCT { template } WHERE { group }
            INSERT { template } WHERE { group }       (same as CONSTRUCT)
            ASK [WHERE] { group }   -> one (ask: boolean) row; probes
              with limit(1), never materializing the solution set
            group := triple patterns ('.'-separated, ';'/',' lists,
                     `a` == rdf:type; predicate position takes a
                     property path over constant predicates:
                     p := seq ('|' seq)*; seq := elt ('/' elt)*;
                     elt := '^' elt | prim ('+'|'*')?;
                     prim := iri | 'a' | '(p)'
                     — `^` inverts IRI-object steps (literal-object
                     triples cannot invert in-subset);
                     — `+`/`*` are SET semantics incl. cycle-reflexive
                     pairs, '/' and '|' are BAG semantics per spec;
                     `*`'s zero-length identity ranges over the
                     graph's IRI node domain) | OPTIONAL { group }
                     | MINUS { group } | FILTER(expr) | nested { group }
                     | FILTER [NOT] EXISTS { group }  (top-level only,
                       bare or parenthesized; EXISTS nested in boolean
                       expressions is out of subset)
                     | VALUES ?v { term... }
                     | VALUES (?v ...) { (term ...) ... }   (inline
                       bindings: a broadcast local relation joined in
                       datatype-reconciled, bag semantics; bare
                       numbers carry xsd:integer/xsd:decimal; UNDEF is
                       out of subset)
                     | BIND(valexpr AS ?v)   (fresh target; operands
                       must be bound by PRECEDING members — forward /
                       optional-only references rejected; a later
                       pattern may not join on a BIND target, but
                       FILTER / OPTIONAL / MINUS / EXISTS may use it.
                       valexpr := arithmetic + - * / over numeric
                       terms (int×int stays xsd:integer via try_add
                       family, otherwise xsd:double; plain literals
                       with numeric lexical forms promote, matching
                       the FILTER subset) | CONCAT | STR | STRLEN |
                       UCASE | LCASE | ?var | term)
                     | { group } UNION { group } (UNION ...)*
            expr  := !=, =, <, <=, >, >=, &&, ||, !, parens,
                     BOUND(?v), REGEX(?v, "pat"[, "flags"]); operands
                     are ?vars, IRIs/pnames, "literals", numbers

  compile   each triple pattern -> a scan of the triple table with the
            constant positions pushed down as filters (subj/pred/obj
            equality reaches the parquet scan as PushedFilters) and the
            variable positions projected to the variable name; patterns
            chain with equi-joins on their shared variables. Patterns
            whose predicate is a schema predicate (rdfs:subClassOf /
            subPropertyOf / domain / range) are broadcast — the schema
            side is grammar-sized, so e.g. the version-resolution
            query's inference join never shuffles the schema side.
            MINUS compiles to LEFT ANTI on the shared variables
            (SPARQL-correct: no shared variables -> no-op); FILTER
            [NOT] EXISTS compiles to LEFT SEMI / LEFT ANTI on the
            shared variables — semantically DISTINCT from MINUS: with
            no shared variables it is a pure existence probe (all rows
            kept or dropped together), the classic disjoint-domain
            case where the two operators give different answers; a MINUS
            side that derives from instance triples is instance-scale,
            so the anti-join itself is a sort-merge join by design
            (AQE demotes it to broadcast at runtime when it is small).
            OPTIONAL compiles to a LEFT OUTER join on the shared
            variables (null-safe, datatype-reconciled like MINUS);
            within a group, optionals apply after the group's own
            patterns, then MINUS, then FILTER. An OPTIONAL sharing no
            variable with the group is out of subset (rejected).
            UNION compiles each branch independently and unions the
            solution bags (duplicates kept, per spec); branches must
            bind the SAME variable set (the subset's restriction —
            SPARQL's unbound-is-compatible join semantics for
            partially-overlapping branches is not expressible as a
            plain equi-join). Datatype shadows align across branches
            (a branch that bound a var IRI-only contributes NULL
            shadows, which IS the IRI tag). The unioned block joins
            the rest of the group datatype-reconciled like MINUS.
            FILTER comparisons follow SPARQL operator-mapping as far
            as the subset carries types: when both operands are
            numeric — a bare numeric constant, a literal typed with a
            numeric XSD datatype (the G11 grammar set xsd:integer/
            xsd:float, csv2rdf-v5/csv2rdf-v5.py:47-53, plus the
            standard XSD numeric family), or a variable whose bound
            datatype is numeric AT THAT ROW — the comparison is
            numeric ("10" > "9" holds for integer-typed versions);
            otherwise it is string-wise (simple-literal/IRI
            semantics). A numeric-typed literal whose lexical form
            doesn't parse is a SPARQL type error: the row is dropped
            (try_cast -> NULL -> filter false).

Solution compatibility after OPTIONAL: an unbound variable is
represented as NULL and compares null-safely in later joins and MINUS
boundaries (NULL matches only NULL) — stricter than SPARQL's
unbound-is-compatible rule. A triple pattern, UNION block, nested
group or MINUS written AFTER an OPTIONAL that touches one of the
OPTIONAL's optionally-bound variables is out of subset and REJECTED at
parse time (round-4 advice: the compiler reorders such patterns before
the OPTIONAL, which changes semantics — the parser used to silently
accept them). Chained OPTIONALs keep the documented null-safe
semantics.

RDF term typing rides along: a variable bound in object position
carries a hidden `<var>__dt` column (None = IRI, '' = plain literal,
else datatype IRI — the emit model, kgforge/triples/emit.py:168-186).
Join compatibility and MINUS compatibility include the datatype; a
variable that also appears in subject/predicate position in a group's
own patterns is IRI-only there, so its object bindings are filtered
to `obj_dt IS NULL` in-plan instead of carrying a shadow column (the
MINUS boundary reconciles sides that disagree on a variable's kind).

SELECT returns the lexical values (one column per variable, SPARQL
projection order); DISTINCT is TERM-based (the hidden datatype shadows
participate in the distinct, then are dropped — "5" plain and
"5"^^xsd:integer are two solutions, even though both print as "5").
CONSTRUCT/INSERT return a deduped (subj, pred, obj, obj_dt) triple
DataFrame; `insert()` unions it back into the source table. A template
subject/predicate variable that binds a literal skips ONLY that
instantiated triple (per-triple filter at instantiation), not the
solution's other template triples — the SPARQL ill-formed-triple rule.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = RDF_NS + "type"

#: patterns with these constant predicates match grammar-sized schema
#: triple sets -> safe to broadcast (see kgforge/rdfs.py docstring)
SCHEMA_PREDS = frozenset(
    RDFS_NS + local for local in ("subClassOf", "subPropertyOf", "domain", "range")
)

TRIPLE_FIELDS = ["subj", "pred", "obj", "obj_dt"]


# --------------------------------------------------------------------
# terms / AST
# --------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Lit:
    value: str
    dt: str | None = None  # None -> plain literal (obj_dt '')


@dataclass(frozen=True)
class PathPlus:
    """`elt+` — one-or-more property path (the Jena transitive idiom,
    e.g. rdfs:subClassOf+). SPARQL path semantics incl. cycles: (s, s)
    IS a solution when s has a length>=1 path back to itself (round-4
    advice — the strict-closure compilation silently lost those)."""
    elt: "PathExpr"


@dataclass(frozen=True)
class PathStar:
    """`elt*` — zero-or-more: the `+` closure plus zero-length
    identity over the graph's IRI node domain (subjects ∪ IRI
    objects). Subset restriction: literal zero-length endpoints (the
    spec's "every term in the graph" includes literals) are out of
    subset — a literal cannot re-enter a path and our subject-position
    vars are IRI-only."""
    elt: "PathExpr"


@dataclass(frozen=True)
class PathInv:
    """`^elt` — inverse path: (s, ^p, o) ⇔ (o, p, s). Subset
    restriction: only IRI-object steps invert (a literal-object triple
    would put a literal in the pattern's subject position, which the
    engine's IRI-only subject invariant excludes — documented, not
    silent: those triples are filtered before the swap)."""
    elt: "PathExpr"


@dataclass(frozen=True)
class PathSeq:
    """`e1/e2/...` — sequence paths; BAG semantics (the spec expands a
    sequence to a join over a fresh variable, multiplicities
    multiply)."""
    elts: tuple


@dataclass(frozen=True)
class PathAlt:
    """`e1|e2|...` — alternative paths; BAG semantics (the spec
    expands an alternative to UNION, duplicates kept)."""
    alts: tuple


PathExpr = Iri | PathPlus | PathStar | PathSeq | PathAlt | PathInv
PATH_TYPES = (PathPlus, PathStar, PathSeq, PathAlt, PathInv)

Term = Var | Iri | Lit


@dataclass
class Group:
    patterns: list[tuple[Term, Term, Term]] = field(default_factory=list)
    filters: list["Expr"] = field(default_factory=list)
    minuses: list["Group"] = field(default_factory=list)
    optionals: list["Group"] = field(default_factory=list)
    unions: list[list["Group"]] = field(default_factory=list)  # one entry per UNION chain
    exists: list[tuple[bool, "Group"]] = field(default_factory=list)  # (negated, group)
    values: list[tuple[list[str], list[list[Term]]]] = field(default_factory=list)
    binds: list[tuple[str, object]] = field(default_factory=list)  # (var, ValExpr)

    def all_vars(self) -> list[str]:
        """Variables of this group's own patterns, first-seen order."""
        out: list[str] = []
        for s, p, o in self.patterns:
            for t in (s, p, o):
                if isinstance(t, Var) and t.name not in out:
                    out.append(t.name)
        return out


@dataclass(frozen=True)
class Agg:
    """One aggregate projection: `(FN([DISTINCT] ?var|*) AS ?alias)`;
    GROUP_CONCAT additionally takes `; SEPARATOR="..."`."""
    fn: str  # count | sum | min | max | avg | sample | group_concat
    var: str | None  # None -> COUNT(*)
    distinct: bool
    alias: str
    sep: str = " "  # GROUP_CONCAT separator (spec default: single space)


@dataclass
class Query:
    form: str  # "select" | "construct"
    group: Group
    select_vars: list[str] | None = None  # None -> SELECT *
    distinct: bool = False
    template: list[tuple[Term, Term, Term]] | None = None
    order: list[tuple[str, bool]] | None = None  # (var, descending)
    limit: int | None = None
    offset: int | None = None
    #: projection order when aggregates or SELECT expressions are
    #: present: ("var", name) | ("agg", index into aggs) | ("expr",
    #: index into exprs); None for plain variable-only SELECT
    select_items: list[tuple[str, object]] | None = None
    aggs: list[Agg] = field(default_factory=list)
    group_by: list[str] | None = None
    having: "Expr | None" = None
    #: SELECT expression items `(valexpr AS ?alias)`: (alias, ValExpr)
    exprs: list[tuple[str, object]] = field(default_factory=list)


# filter expression AST
@dataclass(frozen=True)
class Cmp:
    op: str
    left: Term | float
    right: Term | float


@dataclass(frozen=True)
class BoolOp:
    op: str  # "and" | "or"
    args: tuple


@dataclass(frozen=True)
class Not:
    arg: object


@dataclass(frozen=True)
class Call:
    fn: str  # "bound" | "regex"
    args: tuple


Expr = Cmp | BoolOp | Not | Call


# value-expression AST (BIND / SELECT expressions)
@dataclass(frozen=True)
class Arith:
    """Numeric arithmetic. Evaluation rule (subset): an operand is
    numeric when its datatype is in the XSD numeric family, OR it is a
    plain literal whose lexical form parses as a number (the
    reference's untyped version literals — same promotion the FILTER
    subset applies to bare-number comparisons). Integer×integer under
    +,-,* stays xsd:integer (64-bit); anything else evaluates in
    xsd:double (SPARQL's decimal results canonicalize to double — the
    subset's one divergence, documented). A non-numeric operand is a
    SPARQL type error: the bound value is unbound (NULL)."""
    op: str  # + - * /
    left: object
    right: object


@dataclass(frozen=True)
class FnCall:
    """String builtins of the subset: CONCAT (plain-literal result,
    NULL-propagating like the spec's error rule), STR (lexical form of
    any term, plain), STRLEN (xsd:integer), UCASE / LCASE (plain)."""
    fn: str  # concat | str | strlen | ucase | lcase
    args: tuple


ValExpr = Arith | FnCall | Term


# --------------------------------------------------------------------
# tokenizer / parser
# --------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      \s+ | \#[^\n]*                              # skip space + comments
    | (?P<iri><[^<>\s]*>)
    | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<lit>"(?:[^"\\]|\\.)*")
    | (?P<dtsep>\^\^)
    | (?P<num>[+-]?\d+(?:\.\d+)?)
    | (?P<pname>[A-Za-z_][A-Za-z0-9_.-]*)?:
      (?P<plocal>(?:[A-Za-z0-9_%-]+(?:\.[A-Za-z0-9_%-]+)*)?)
      # PN_LOCAL may CONTAIN dots but not end with one — a trailing
      # '.' is the triple terminator (`... ns1:Variant. }`)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op><=|>=|!=|\|\||&&|[{}().;,=<>!*+|/^])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "prefix", "select", "construct", "insert", "where", "distinct",
    "minus", "filter", "optional", "union", "a", "values", "group",
    "having", "order", "by", "asc", "desc", "limit", "offset", "bind",
}

_AGG_FNS = ("count", "sum", "min", "max", "avg", "sample", "group_concat")


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            raise ValueError(f"SPARQL tokenizer stuck at {text[pos:pos + 20]!r}")
        pos = m.end()
        if m.lastgroup is None or m.group().strip() == "" or m.group().startswith("#"):
            if m.group("plocal") is None and m.group("iri") is None:
                continue
        if m.group("iri"):
            out.append(("iri", m.group("iri")[1:-1]))
        elif m.group("var"):
            name = m.group("var")[1:]
            if name.startswith("__dt_"):
                raise ValueError(
                    f"variable ?{name} collides with the internal "
                    "datatype-shadow namespace (__dt_*)"
                )
            out.append(("var", name))
        elif m.group("lit"):
            raw = m.group("lit")[1:-1]
            out.append(("lit", raw.replace('\\"', '"').replace("\\\\", "\\")))
        elif m.group("dtsep"):
            out.append(("op", "^^"))
        elif m.group("num"):
            out.append(("num", m.group("num")))
        elif m.group("plocal") is not None:
            out.append(("pname", f"{m.group('pname') or ''}:{m.group('plocal')}"))
        elif m.group("word"):
            w = m.group("word")
            out.append(("kw", w.lower()) if w.lower() in _KEYWORDS else ("word", w))
        else:
            out.append(("op", m.group("op")))
    return out


def _pattern_vars(pats: list[tuple]) -> set[str]:
    return {t.name for pat in pats for t in pat if isinstance(t, Var)}


def _group_binds(g: Group) -> set[str]:
    """Every variable a group graph pattern may BIND (patterns, UNION
    branches, nested OPTIONALs, VALUES blocks, BIND targets — not
    MINUS/FILTER, which never bind; round-5 advice: a var bound only
    via VALUES used to escape the pattern-after-OPTIONAL hazard
    guard)."""
    out = _pattern_vars(g.patterns)
    for alts in g.unions:
        for a in alts:
            out |= _group_binds(a)
    for o in g.optionals:
        out |= _group_binds(o)
    for vars_, _rows in g.values:
        out |= set(vars_)
    out |= {v for v, _e in g.binds}
    return out


def _valexpr_vars(e) -> set[str]:
    """Variables a value expression reads."""
    if isinstance(e, Var):
        return {e.name}
    if isinstance(e, Arith):
        return _valexpr_vars(e.left) | _valexpr_vars(e.right)
    if isinstance(e, FnCall):
        return set().union(*(_valexpr_vars(a) for a in e.args)) if e.args else set()
    return set()


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # -- token helpers -------------------------------------------------
    def peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {k}:{v!r}")
        return v

    def at(self, kind: str, val: str | None = None) -> bool:
        k, v = self.peek()
        return k == kind and (val is None or v == val)

    # -- grammar -------------------------------------------------------
    def parse(self) -> Query:
        while self.at("kw", "prefix"):
            self.next()
            pfx = self.expect("pname")
            if not pfx.endswith(":"):
                pfx = pfx.split(":")[0] + ":"
            ns = self.expect("iri")
            self.prefixes[pfx[:-1]] = ns
        if self.at("kw", "select"):
            q = self._select()
        elif self.at("kw", "construct") or self.at("kw", "insert"):
            q = self._construct()
        elif self.at("word") and self.peek()[1].lower() == "ask":
            self.next()
            if self.at("kw", "where"):
                self.next()
            q = Query("ask", self._group())
        else:
            raise ValueError(f"expected SELECT/CONSTRUCT/INSERT/ASK, got {self.peek()}")
        if not self.at("eof"):
            # silently ignoring trailing tokens would e.g. drop a
            # misspelled modifier and dump the full result set
            raise ValueError(f"unexpected trailing tokens at {self.peek()}")
        return q

    def _select(self) -> Query:
        self.expect("kw", "select")
        distinct = False
        if self.at("kw", "distinct"):
            self.next()
            distinct = True
        sel: list[str] | None
        items: list[tuple[str, object]] = []
        aggs: list[Agg] = []
        exprs: list[tuple[str, object]] = []
        if self.at("op", "*"):
            self.next()
            sel = None
        else:
            while True:
                if self.at("var"):
                    items.append(("var", self.next()[1]))
                elif self.at("op", "("):
                    # `(FN(...) AS ?a)` aggregate vs `(valexpr AS ?a)`
                    # expression: an aggregate head is FN followed by
                    # an opening paren
                    k2, v2 = (
                        self.toks[self.i + 1]
                        if self.i + 1 < len(self.toks) else ("eof", "")
                    )
                    k3, v3 = (
                        self.toks[self.i + 2]
                        if self.i + 2 < len(self.toks) else ("eof", "")
                    )
                    if (
                        k2 == "word" and v2.lower() in _AGG_FNS
                        and k3 == "op" and v3 == "("
                    ):
                        aggs.append(self._agg_item())
                        items.append(("agg", len(aggs) - 1))
                    else:
                        exprs.append(self._expr_item())
                        items.append(("expr", len(exprs) - 1))
                else:
                    break
            if not items:
                raise ValueError("SELECT needs ?vars, aggregates or *")
            sel = [name for kind, name in items if kind == "var"]
        if self.at("kw", "where"):
            self.next()
        group = self._group()
        gb: list[str] | None = None
        if self.at("kw", "group"):
            self.next()
            self.expect("kw", "by")
            gb = []
            while self.at("var"):
                gb.append(self.next()[1])
            if not gb:
                raise ValueError("GROUP BY needs at least one ?variable")
        having = None
        if self.at("kw", "having"):
            if not aggs and gb is None:
                raise ValueError("HAVING requires aggregates or GROUP BY")
            self.next()
            self.expect("op", "(")
            having = self._expr()
            self.expect("op", ")")
        if aggs or gb is not None:
            if sel is None:
                raise ValueError("SELECT * cannot combine with aggregates/GROUP BY")
            if distinct:
                raise ValueError("SELECT DISTINCT with aggregates is out of subset")
            if exprs:
                raise ValueError(
                    "SELECT expressions next to aggregates/GROUP BY are "
                    "out of subset (compute with BIND inside the group, "
                    "or post-process the grouped result)"
                )
            q = Query(
                "select", group, select_vars=sel, select_items=items,
                aggs=aggs, group_by=gb, having=having,
            )
        elif exprs:
            seen_aliases = {a for a, _ in exprs}
            dup = seen_aliases & set(sel or [])
            if dup or len(seen_aliases) != len(exprs):
                raise ValueError(
                    "SELECT expression alias collides with a projected "
                    f"variable or another alias ({sorted(dup) or 'dup alias'})"
                )
            q = Query(
                "select", group, select_vars=sel, distinct=distinct,
                select_items=items, exprs=exprs,
            )
        else:
            q = Query("select", group, select_vars=sel, distinct=distinct)
        self._modifiers(q)
        return q

    def _expr_item(self) -> tuple[str, object]:
        """`( valexpr AS ?alias )` — a SELECT expression item."""
        self.expect("op", "(")
        ex = self._val_expr()
        if not (self.at("word") and self.peek()[1].lower() == "as"):
            raise ValueError("SELECT expression needs AS ?alias")
        self.next()
        alias = self.expect("var")
        self.expect("op", ")")
        return (alias, ex)

    def _agg_item(self) -> Agg:
        """`( FN ( [DISTINCT] ?var | * ) AS ?alias )` — the aggregate
        projection form. FN ∈ COUNT | SUM | MIN | MAX | AVG | SAMPLE |
        GROUP_CONCAT (SUM/AVG coerce lexical forms with try_cast
        double — non-numeric terms become NULL and are ignored, the
        subset's reading of the spec's type-error rule; SAMPLE picks
        the MINIMUM lexical form — the spec allows any member, the
        engine canonicalizes for determinism; GROUP_CONCAT sorts
        members ascending before joining — the spec leaves order
        undefined — and takes `; SEPARATOR="..."`, default one
        space)."""
        self.expect("op", "(")
        k, v = self.next()
        fn = v.lower() if k == "word" else ""
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported aggregate {v!r}")
        self.expect("op", "(")
        distinct = False
        if self.at("kw", "distinct"):
            self.next()
            distinct = True
        if self.at("op", "*"):
            self.next()
            var = None
            if fn != "count":
                raise ValueError(f"{fn.upper()}(*) is not a thing; only COUNT(*)")
        else:
            var = self.expect("var")
        sep = " "
        if self.at("op", ";"):
            if fn != "group_concat":
                raise ValueError("only GROUP_CONCAT takes a SEPARATOR option")
            self.next()
            if not (self.at("word") and self.peek()[1].lower() == "separator"):
                raise ValueError('expected SEPARATOR="..." after ;')
            self.next()
            self.expect("op", "=")
            sep = self.expect("lit")
        self.expect("op", ")")
        if not (self.at("word") and self.peek()[1].lower() == "as"):
            raise ValueError("aggregate projection needs AS ?alias")
        self.next()
        alias = self.expect("var")
        self.expect("op", ")")
        return Agg(fn, var, distinct, alias, sep)

    def _modifiers(self, q: Query) -> None:
        """ORDER BY (ASC(?v)|DESC(?v)|?v)+ / LIMIT n / OFFSET n."""
        if self.at("kw", "order"):
            self.next()
            self.expect("kw", "by")
            q.order = []
            while True:
                if self.at("kw", "asc") or self.at("kw", "desc"):
                    desc = self.next()[1] == "desc"
                    self.expect("op", "(")
                    q.order.append((self.expect("var"), desc))
                    self.expect("op", ")")
                elif self.at("var"):
                    q.order.append((self.next()[1], False))
                else:
                    break
            if not q.order:
                raise ValueError("ORDER BY needs at least one sort key")
        while self.at("kw", "limit") or self.at("kw", "offset"):
            kw = self.next()[1]
            val = int(self.expect("num"))
            if val < 0:
                raise ValueError(f"{kw.upper()} must be non-negative")
            if kw == "limit":
                q.limit = val
            else:
                q.offset = val

    def _construct(self) -> Query:
        self.next()  # construct | insert
        self.expect("op", "{")
        template = self._triples_until_close()
        self.expect("kw", "where")
        group = self._group()
        q = Query("construct", group, template=template)
        self._modifiers(q)  # modifiers act on the solution sequence
        return q

    def _group(self) -> Group:
        self.expect("op", "{")
        g = Group()
        # pattern-after-OPTIONAL guard (round-4 advice): Group drops
        # textual order, and the compiler joins all patterns BEFORE
        # applying optionals — hoisting a pattern over an OPTIONAL is
        # only semantics-preserving when it shares no variable the
        # OPTIONAL may leave unbound (Join(LeftJoin(P,O), P2) ==
        # LeftJoin(Join(P,P2), O) iff vars(P2) ∩ newvars(O) == ∅).
        # `bound` tracks vars certainly bound so far; `hazard` the
        # optional-only vars; later patterns / UNION blocks / MINUS
        # sides touching a hazard var are out of subset and REJECTED,
        # matching the explicit-rejection policy used elsewhere.
        bound: set[str] = set()
        hazard: set[str] = set()
        bind_targets: set[str] = set()

        def _check(new_vars: set[str], what: str) -> None:
            clash = new_vars & hazard
            if clash:
                raise ValueError(
                    f"{what} written after an OPTIONAL shares its "
                    f"optionally-bound variable(s) {sorted(clash)} — the "
                    "compiler would reorder it before the OPTIONAL "
                    "(different semantics); out of subset"
                )
            # BIND targets compile AFTER the group's joins: a pattern /
            # UNION / VALUES member using one would be hoisted before
            # the BIND (different semantics) — rejected, same policy
            bclash = new_vars & bind_targets
            if bclash:
                raise ValueError(
                    f"{what} uses BIND-assigned variable(s) "
                    f"{sorted(bclash)} — the subset evaluates BIND after "
                    "the group's patterns, so a pattern cannot join on a "
                    "BIND target (use FILTER/OPTIONAL/MINUS, which "
                    "evaluate after BIND); out of subset"
                )

        while not self.at("op", "}"):
            if self.at("kw", "minus"):
                self.next()
                m = self._group()
                _check(_group_binds(m), "MINUS")
                g.minuses.append(m)
            elif self.at("kw", "optional"):
                self.next()
                opt = self._group()
                g.optionals.append(opt)
                new_hazard = _group_binds(opt) - bound
                # the REVERSE reorder: the compiler applies optionals
                # BEFORE minuses, so a MINUS already parsed that shares
                # this OPTIONAL's new vars would also run under
                # different semantics than written — reject both
                # directions ("MINUS and OPTIONAL may not share
                # optionally-bound variables")
                for m in g.minuses:
                    clash = _group_binds(m) & new_hazard
                    if clash:
                        raise ValueError(
                            "MINUS written before an OPTIONAL shares its "
                            f"optionally-bound variable(s) {sorted(clash)} — "
                            "the compiler applies optionals first "
                            "(different semantics); out of subset"
                        )
                hazard |= new_hazard
            elif self.at("kw", "filter"):
                # filters are group-scoped in SPARQL (applied to the
                # whole group regardless of position) — no hazard.
                # FILTER [NOT] EXISTS { G } is the brace-group form
                # (top-level only; EXISTS nested inside boolean
                # expressions is out of subset)
                self.next()
                wrapped = False
                if self.at("op", "("):
                    k2, v2 = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else ("eof", "")
                    if k2 == "word" and v2.lower() in ("exists", "not"):
                        self.next()
                        wrapped = True
                if self.at("word") and self.peek()[1].lower() in ("exists", "not"):
                    negated = self.next()[1].lower() == "not"
                    if negated:
                        k2, v2 = self.next()
                        if k2 != "word" or v2.lower() != "exists":
                            raise ValueError("expected EXISTS after NOT")
                    g.exists.append((negated, self._group()))
                    if wrapped:
                        self.expect("op", ")")
                else:
                    if not wrapped:
                        self.expect("op", "(")
                    g.filters.append(self._expr())
                    self.expect("op", ")")
            elif self.at("op", "{"):
                inner = self._group()
                if self.at("kw", "union"):
                    alts = [inner]
                    while self.at("kw", "union"):
                        self.next()
                        alts.append(self._group())
                    uvars = set().union(*(_group_binds(a) for a in alts))
                    _check(uvars, "UNION block")
                    g.unions.append(alts)
                    bound |= uvars
                else:
                    # nested group graph pattern with no UNION == merge
                    # (EVERY member list carries over — a dropped
                    # inner.values/inner.exists would silently widen
                    # the result instead of restricting it, round-5
                    # advice)
                    _check(_group_binds(inner), "nested group")
                    for tgt2, _ex2 in inner.binds:
                        if tgt2 in bound or tgt2 in hazard:
                            raise ValueError(
                                f"BIND target ?{tgt2} of a nested group "
                                "is already in scope (spec: must be fresh)"
                            )
                    g.patterns += inner.patterns
                    g.filters += inner.filters
                    g.minuses += inner.minuses
                    g.optionals += inner.optionals
                    g.unions += inner.unions
                    g.values += inner.values
                    g.exists += inner.exists
                    g.binds += inner.binds
                    bound |= _pattern_vars(inner.patterns)
                    for alts2 in inner.unions:
                        bound |= set().union(*(_group_binds(a) for a in alts2))
                    for vars2, _rows2 in inner.values:
                        bound |= set(vars2)
                    for tgt2, _ex2 in inner.binds:
                        bind_targets.add(tgt2)
                        bound.add(tgt2)
                    for opt in inner.optionals:
                        hazard |= _group_binds(opt) - bound
            elif self.at("kw", "values"):
                self.next()
                vars_, rows = self._values_block()
                _check(set(vars_), "VALUES block")
                g.values.append((vars_, rows))
                bound |= set(vars_)
            elif self.at("kw", "bind"):
                self.next()
                self.expect("op", "(")
                ex = self._val_expr()
                if not (self.at("word") and self.peek()[1].lower() == "as"):
                    raise ValueError("BIND needs AS ?var")
                self.next()
                tgt = self.expect("var")
                self.expect("op", ")")
                used = _valexpr_vars(ex)
                fwd = used - bound
                if fwd:
                    # spec scoping: BIND sees only variables bound by
                    # PRECEDING elements; a forward/optional-only/never
                    # reference would silently evaluate differently
                    # under the subset's patterns-first compile order
                    raise ValueError(
                        f"BIND reads variable(s) {sorted(fwd)} not bound "
                        "before it (move the BIND after the pattern that "
                        "binds them; optionally-bound or never-bound "
                        "operands are out of subset)"
                    )
                if tgt in bound or tgt in hazard:
                    raise ValueError(
                        f"BIND target ?{tgt} is already in scope "
                        "(spec: the target must be a fresh variable)"
                    )
                g.binds.append((tgt, ex))
                bind_targets.add(tgt)
                bound.add(tgt)
            elif self.at("op", "."):
                self.next()
            elif self.at("kw", "union"):
                raise ValueError("UNION must follow a braced group pattern")
            else:
                n_before = len(g.patterns)
                self._triple_lists(g.patterns)
                new_vars = _pattern_vars(g.patterns[n_before:])
                _check(new_vars, "triple pattern")
                bound |= new_vars
        self.expect("op", "}")
        return g

    def _triples_until_close(self) -> list[tuple[Term, Term, Term]]:
        pats: list[tuple[Term, Term, Term]] = []
        while not self.at("op", "}"):
            if self.at("op", "."):
                self.next()
                continue
            self._triple_lists(pats)
        self.expect("op", "}")
        return pats

    def _triple_lists(self, out: list[tuple[Term, Term, Term]]) -> None:
        """subject pred obj (',' obj)* (';' pred obj ...)*"""
        s = self._term()
        while True:
            p = self._term(pred=True)
            while True:
                o = self._term()
                out.append((s, p, o))
                if self.at("op", ","):
                    self.next()
                    continue
                break
            if self.at("op", ";"):
                self.next()
                if self.at("op", ".") or self.at("op", "}"):
                    break
                continue
            break

    def _term(self, pred: bool = False) -> Term:
        if pred and not self.at("var"):
            # predicate position: a property-path expression (a bare
            # IRI/pname/`a` is the trivial path and comes back as Iri)
            return self._path()
        k, v = self.next()
        if k == "var":
            return Var(v)
        if k == "iri":
            return Iri(v)
        if k == "pname":
            return Iri(self._expand(v))
        if k == "lit":
            if self.at("op", "^^"):
                self.next()
                dk, dv = self.next()
                if dk == "iri":
                    return Lit(v, dv)
                if dk == "pname":
                    return Lit(v, self._expand(dv))
                raise ValueError(f"bad datatype token {dk}:{dv!r}")
            return Lit(v)
        raise ValueError(f"bad term {k}:{v!r}")

    def _expand(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    # -- VALUES --------------------------------------------------------
    def _values_block(self) -> tuple[list[str], list[list[Term]]]:
        """`VALUES ?v { t ... }` or `VALUES (?v ...) { (t ...) ... }`.
        Terms are IRIs/pnames, (typed) literals, or bare numbers
        (which carry xsd:integer / xsd:decimal datatypes, the spec's
        numeric-literal mapping); UNDEF is out of subset."""
        if self.at("var"):
            vars_ = [self.next()[1]]
            self.expect("op", "{")
            rows = []
            while not self.at("op", "}"):
                rows.append([self._values_term()])
            self.next()
            return vars_, rows
        self.expect("op", "(")
        vars_ = []
        while self.at("var"):
            vars_.append(self.next()[1])
        if not vars_:
            raise ValueError("VALUES needs at least one ?variable")
        if len(set(vars_)) != len(vars_):
            raise ValueError(f"duplicate variable in VALUES ({vars_})")
        self.expect("op", ")")
        self.expect("op", "{")
        rows = []
        while not self.at("op", "}"):
            self.expect("op", "(")
            row = []
            while not self.at("op", ")"):
                row.append(self._values_term())
            self.next()
            if len(row) != len(vars_):
                raise ValueError(
                    f"VALUES row width {len(row)} != variable count {len(vars_)}"
                )
            rows.append(row)
        self.next()
        return vars_, rows

    def _values_term(self) -> Term:
        k, v = self.next()
        if k == "iri":
            return Iri(v)
        if k == "pname":
            return Iri(self._expand(v))
        if k == "lit":
            if self.at("op", "^^"):
                self.next()
                dk, dv = self.next()
                if dk == "iri":
                    return Lit(v, dv)
                if dk == "pname":
                    return Lit(v, self._expand(dv))
                raise ValueError(f"bad datatype token {dk}:{dv!r}")
            return Lit(v)
        if k == "num":
            dt = "integer" if re.fullmatch(r"[+-]?\d+", v) else "decimal"
            return Lit(v, _XSD_NS + dt)
        if k == "word" and v.lower() == "undef":
            raise ValueError("UNDEF in VALUES is out of subset")
        raise ValueError(f"bad VALUES term {k}:{v!r}")

    # -- value expressions (BIND / SELECT expressions) -----------------
    #   valexpr := mul (('+'|'-') mul)*
    #   mul     := prim (('*'|'/') prim)*
    #   prim    := '(' valexpr ')' | FN '(' valexpr (',' valexpr)* ')'
    #            | ?var | iri | pname | "lit"[^^dt] | number
    #   FN ∈ CONCAT | STR | STRLEN | UCASE | LCASE
    _VAL_FNS = {"concat": None, "str": 1, "strlen": 1, "ucase": 1, "lcase": 1}

    def _val_expr(self):
        e = self._val_mul()
        while True:
            if self.at("op", "+") or self.at("op", "-"):
                op = self.next()[1]
                e = Arith(op, e, self._val_mul())
            elif self.at("num") and self.peek()[1][0] in "+-":
                # `2+3` tokenizes as num(2) num(+3) — the sign glues to
                # the number (SPARQL shares this lexical quirk); split
                # it back into operator + operand, then let a `*`/`/`
                # suffix bind tighter as usual
                v = self.next()[1]
                dt = "integer" if re.fullmatch(r"[+-]?\d+", v) else "decimal"
                rhs = self._val_mul_tail(Lit(v[1:], _XSD_NS + dt))
                e = Arith(v[0], e, rhs)
            else:
                return e

    def _val_mul(self):
        return self._val_mul_tail(self._val_prim())

    def _val_mul_tail(self, e):
        while self.at("op", "*") or self.at("op", "/"):
            op = self.next()[1]
            e = Arith(op, e, self._val_prim())
        return e

    def _val_prim(self):
        if self.at("op", "("):
            self.next()
            e = self._val_expr()
            self.expect("op", ")")
            return e
        k, v = self.peek()
        if k == "word" and v.lower() in self._VAL_FNS:
            self.next()
            self.expect("op", "(")
            args = [self._val_expr()]
            while self.at("op", ","):
                self.next()
                args.append(self._val_expr())
            self.expect("op", ")")
            fn = v.lower()
            arity = self._VAL_FNS[fn]
            if arity is not None and len(args) != arity:
                raise ValueError(f"{fn.upper()} takes {arity} argument(s)")
            return FnCall(fn, tuple(args))
        k, v = self.next()
        if k == "var":
            return Var(v)
        if k == "iri":
            return Iri(v)
        if k == "pname":
            return Iri(self._expand(v))
        if k == "lit":
            if self.at("op", "^^"):
                self.next()
                dk, dv = self.next()
                if dk == "iri":
                    return Lit(v, dv)
                if dk == "pname":
                    return Lit(v, self._expand(dv))
                raise ValueError(f"bad datatype token {dk}:{dv!r}")
            return Lit(v)
        if k == "num":
            # bare numbers carry xsd:integer / xsd:decimal (the spec's
            # numeric-literal mapping, same as VALUES terms)
            dt = "integer" if re.fullmatch(r"[+-]?\d+", v) else "decimal"
            return Lit(v, _XSD_NS + dt)
        raise ValueError(f"bad value-expression operand {k}:{v!r}")

    # -- property paths ------------------------------------------------
    # SPARQL Path grammar, the constant-predicate subset:
    #   Path         := PathSequence ('|' PathSequence)*
    #   PathSequence := PathElt ('/' PathElt)*
    #   PathElt      := PathPrimary ('+' | '*')?
    #   PathPrimary  := iri | pname | 'a' | '(' Path ')'
    def _path(self):
        alts = [self._path_seq()]
        while self.at("op", "|"):
            self.next()
            alts.append(self._path_seq())
        return alts[0] if len(alts) == 1 else PathAlt(tuple(alts))

    def _path_seq(self):
        elts = [self._path_elt()]
        while self.at("op", "/"):
            self.next()
            elts.append(self._path_elt())
        return elts[0] if len(elts) == 1 else PathSeq(tuple(elts))

    def _path_elt(self):
        if self.at("op", "^"):  # PathEltOrInverse
            self.next()
            return PathInv(self._path_elt())
        prim = self._path_primary()
        if self.at("op", "+"):
            self.next()
            return PathPlus(prim)
        if self.at("op", "*"):
            self.next()
            return PathStar(prim)
        return prim

    def _path_primary(self):
        if self.at("op", "("):
            self.next()
            p = self._path()
            self.expect("op", ")")
            return p
        k, v = self.next()
        if k == "iri":
            return Iri(v)
        if k == "pname":
            return Iri(self._expand(v))
        if k == "kw" and v == "a":
            return Iri(RDF_TYPE)
        raise ValueError(f"bad path element {k}:{v!r}")

    # -- filter expressions --------------------------------------------
    def _expr(self) -> Expr:
        e = self._and()
        while self.at("op", "||"):
            self.next()
            e = BoolOp("or", (e, self._and()))
        return e

    def _and(self) -> Expr:
        e = self._unary()
        while self.at("op", "&&"):
            self.next()
            e = BoolOp("and", (e, self._unary()))
        return e

    def _unary(self) -> Expr:
        if self.at("op", "!"):
            self.next()
            return Not(self._unary())
        if self.at("op", "("):
            self.next()
            e = self._expr()
            self.expect("op", ")")
            return e
        k, v = self.peek()
        if k == "word" and v.lower() in ("bound", "regex"):
            self.next()
            self.expect("op", "(")
            args = [self._operand()]
            while self.at("op", ","):
                self.next()
                args.append(self._operand())
            self.expect("op", ")")
            fn = v.lower()
            if fn == "bound" and (len(args) != 1 or not isinstance(args[0], Var)):
                raise ValueError("BOUND takes exactly one ?variable")
            if fn == "regex":
                if len(args) not in (2, 3) or not all(
                    isinstance(a, Lit) for a in args[1:]
                ):
                    raise ValueError(
                        'REGEX takes (term, "pattern"[, "flags"]) with '
                        "literal pattern/flags"
                    )
            return Call(fn, tuple(args))
        left = self._operand()
        k, v = self.peek()
        if k == "op" and v in ("!=", "=", "<", "<=", ">", ">="):
            self.next()
            return Cmp(v, left, self._operand())
        raise ValueError("bare term is not a boolean filter")

    def _operand(self) -> Term | float:
        k, v = self.next()
        if k == "var":
            return Var(v)
        if k == "iri":
            return Iri(v)
        if k == "pname":
            return Iri(self._expand(v))
        if k == "lit":
            if self.at("op", "^^"):  # typed literal, same as _term
                self.next()
                dk, dv = self.next()
                if dk == "iri":
                    return Lit(v, dv)
                if dk == "pname":
                    return Lit(v, self._expand(dv))
                raise ValueError(f"bad datatype token {dk}:{dv!r}")
            return Lit(v)
        if k == "num":
            return float(v)
        raise ValueError(f"bad filter operand {k}:{v!r}")


def parse(query: str) -> Query:
    return _Parser(query).parse()


# --------------------------------------------------------------------
# compiler
# --------------------------------------------------------------------


def _dt_shadow(var: str) -> str:
    return f"__dt_{var}"


def _iri_only_vars(g: Group) -> set[str]:
    """Variables that appear in subject or predicate position in THIS
    group's own patterns: always IRIs, no dt shadow. Deliberately NOT
    recursive into MINUS blocks — a subject-position occurrence inside
    a MINUS must not pre-filter the OUTER group's object bindings to
    IRIs (that would wrongly REMOVE literal solutions that SPARQL
    MINUS keeps); the anti-join boundary handles the mixed case with
    an explicit datatype-compatibility condition instead."""
    out: set[str] = set()
    for s, p, _o in g.patterns:
        for t in (s, p):
            if isinstance(t, Var):
                out.add(t.name)
    return out


def _path_preds(path) -> set[str]:
    """Constant predicate IRIs a path expression touches."""
    if isinstance(path, Iri):
        return {path.value}
    if isinstance(path, (PathPlus, PathStar, PathInv)):
        return _path_preds(path.elt)
    if isinstance(path, PathSeq):
        return set().union(*(_path_preds(e) for e in path.elts))
    if isinstance(path, PathAlt):
        return set().union(*(_path_preds(a) for a in path.alts))
    raise ValueError(f"unknown path node {path!r}")


def _node_domain(triples: DataFrame) -> DataFrame:
    """Zero-length path identity: (n, n, NULL) over the graph's IRI
    node domain — every subject plus every IRI object. A table-wide
    distinct; at instance scale a bare `?a p* ?b` enumerates the whole
    node set, which is what the spec asks for (see PathStar — literal
    terms are the subset's one restriction)."""
    nodes = (
        triples.select(F.col("subj").alias("src"))
        .unionByName(
            triples.filter(F.col("obj_dt").isNull()).select(F.col("obj").alias("src"))
        )
        .distinct()
    )
    return nodes.select(
        "src", F.col("src").alias("dst"), F.lit(None).cast("string").alias("dst_dt")
    )


def _plus_df(triples: DataFrame, elt) -> DataFrame:
    """One-or-more closure of a path element, SPARQL semantics:
    distinct (src, dst, dst_dt) pairs connected by >=1 step.

    Continuation edges are IRI-ending (a literal cannot continue a
    path), closed by kgforge.rdfs.transitive_closure with
    reflexive_on_cycle=True — (s, s) IS a solution when s sits on a
    cycle or has a self-edge (round-4 advice: the strict closure lost
    those). Literal-ENDING steps re-enter as the final step only:
    length-1 literal edges directly, longer paths as closure ∘ literal
    edge."""
    from kgforge.rdfs import transitive_closure

    e = _path_df(triples, elt)
    iri_closure = transitive_closure(
        e.filter(F.col("dst_dt").isNull()).select("src", "dst"),
        reflexive_on_cycle=True,
    ).select("src", "dst", F.lit(None).cast("string").alias("dst_dt"))
    lit_edges = e.filter(F.col("dst_dt").isNotNull())
    lit_tails = (
        iri_closure.alias("_c")
        .join(lit_edges.alias("_e"), F.col("_c.dst") == F.col("_e.src"))
        .select(
            F.col("_c.src").alias("src"),
            F.col("_e.dst").alias("dst"),
            F.col("_e.dst_dt").alias("dst_dt"),
        )
    )
    return iri_closure.unionByName(lit_edges).unionByName(lit_tails).distinct()


def _path_df(triples: DataFrame, path) -> DataFrame:
    """Compile a path expression to its solution pair set
    (src, dst, dst_dt). Bag semantics for bare predicates, `/` and `|`
    (the spec expands them to join/UNION — duplicates kept); SET
    semantics for `+`/`*` (defined duplicate-free)."""
    if isinstance(path, Iri):
        return triples.filter(F.col("pred") == path.value).select(
            F.col("subj").alias("src"),
            F.col("obj").alias("dst"),
            F.col("obj_dt").alias("dst_dt"),
        )
    if isinstance(path, PathInv):
        # only IRI-object steps invert (PathInv docstring): filter
        # literal endings, then swap the pair; the new dst is the
        # original SUBJECT — an IRI by RDF, so dst_dt is NULL
        return (
            _path_df(triples, path.elt)
            .filter(F.col("dst_dt").isNull())
            .select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.lit(None).cast("string").alias("dst_dt"),
            )
        )
    if isinstance(path, PathAlt):
        parts = [_path_df(triples, a) for a in path.alts]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    if isinstance(path, PathSeq):
        out = _path_df(triples, path.elts[0])
        for elt in path.elts[1:]:
            step = _path_df(triples, elt)
            out = (
                out.filter(F.col("dst_dt").isNull())  # literals end a path
                .alias("_l")
                .join(step.alias("_r"), F.col("_l.dst") == F.col("_r.src"))
                .select(
                    F.col("_l.src").alias("src"),
                    F.col("_r.dst").alias("dst"),
                    F.col("_r.dst_dt").alias("dst_dt"),
                )
            )
        return out
    if isinstance(path, PathPlus):
        return _plus_df(triples, path.elt)
    if isinstance(path, PathStar):
        return (
            _plus_df(triples, path.elt)
            .unionByName(_node_domain(triples))
            .distinct()
        )
    raise ValueError(f"unknown path node {path!r}")


def _seeded_path_df(
    triples: DataFrame, p: PathPlus | PathStar, s: Term, o: Term
) -> DataFrame | None:
    """Constant-endpoint pushdown for top-level `+`/`*` paths (round-5
    verdict #1): `:x p+ ?y` / `?x p+ :y` evaluate as seed-constrained
    reachability — a frontier BFS over the step relation from the
    constant side — instead of materializing the FULL predicate
    closure and filtering it afterwards. Touched rows are proportional
    to the reachable subgraph, the plan a seeded path query needs at
    crawl scale (BENCH/path_closure seeded legs).

    Applies when either endpoint is a constant IRI. Returns None (the
    caller falls back to `_path_df`, the full closure — identical
    results) when: neither endpoint is constant, the object constant
    is a literal with a variable subject (a rare shape the BFS would
    need a literal-aware reverse step for), or the distributed BFS did
    not drain within its round budget (pathological depth). Literal-
    object steps re-enter as FINAL steps only, same rule as _plus_df.
    """
    from kgforge.rdfs import seeded_reachable

    s_const = s.value if isinstance(s, Iri) else None
    o_const = o.value if isinstance(o, Iri) else None
    if s_const is None and o_const is None:
        return None
    e = _path_df(triples, p.elt)
    iri_e = e.filter(F.col("dst_dt").isNull()).select("src", "dst")
    null_dt = F.lit(None).cast("string")
    from kgforge.session import local_df

    def _identity(node: str) -> DataFrame:
        # `*`'s zero-length solution for a constant endpoint — present
        # even when the node is absent from the graph (spec: a
        # zero-length path matches the term itself)
        return local_df(
            triples.sparkSession,
            [(node, node, None)],
            "src string, dst string, dst_dt string",
        )

    if s_const is not None:
        reached = seeded_reachable(iri_e, [s_const])
        if reached is None:
            return None
        out = reached.select(
            F.lit(s_const).alias("src"),
            F.col("node").alias("dst"),
            null_dt.alias("dst_dt"),
        )
        # literal endings: one lit step from the seed directly, or a
        # lit step off any reached IRI node
        lit_edges = e.filter(F.col("dst_dt").isNotNull())
        lit_srcs = reached.select("node").unionByName(
            local_df(triples.sparkSession, [(s_const,)], "node string")
        )
        lit_tails = (
            lit_srcs.alias("_n")
            .join(lit_edges.alias("_e"), F.col("_n.node") == F.col("_e.src"))
            .select(
                F.lit(s_const).alias("src"),
                F.col("_e.dst").alias("dst"),
                F.col("_e.dst_dt").alias("dst_dt"),
            )
        )
        out = out.unionByName(lit_tails).distinct()
        if isinstance(p, PathStar):
            out = out.unionByName(_identity(s_const)).distinct()
        return out
    # object-constant IRI, variable subject: inverse BFS. A path to an
    # IRI endpoint is IRI-steps throughout (a literal ends a path), so
    # the reversed IRI step relation suffices.
    rev = iri_e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    reached = seeded_reachable(rev, [o_const])
    if reached is None:
        return None
    out = reached.select(
        F.col("node").alias("src"),
        F.lit(o_const).alias("dst"),
        null_dt.alias("dst_dt"),
    )
    if isinstance(p, PathStar):
        out = out.unionByName(_identity(o_const)).distinct()
    return out


def _compile_path_pattern(
    triples: DataFrame,
    pat: tuple[Term, object, Term],
    iri_only: set[str],
) -> DataFrame:
    """`s PATH o` — the path's solution pair set bound like an
    ordinary pattern. Object vars carry the final step's datatype as
    their shadow (a path CAN end at a literal); subject-position
    literals never match (RDF has no literal subjects). For a
    top-level `*`, a constant endpoint contributes its zero-length
    (X, X) solution even when X is absent from the graph (spec:
    zero-length paths match the term itself); constant endpoints
    absent from the graph under a star NESTED in a longer path are out
    of subset (the nested star's identity ranges over the graph node
    domain only)."""
    s, p, o = pat
    df = None
    if isinstance(p, (PathPlus, PathStar)):
        # constant-endpoint pushdown (round-5 verdict #1): evaluate
        # seed-first when a const IRI endpoint bounds the closure
        df = _seeded_path_df(triples, p, s, o)
    if df is None:
        df = _path_df(triples, p)
        if isinstance(p, PathStar):
            consts = sorted({t.value for t in (s, o) if isinstance(t, Iri)})
            if consts:
                from kgforge.session import local_df

                extra = local_df(
                    triples.sparkSession,
                    [(v, v, None) for v in consts],
                    "src string, dst string, dst_dt string",
                )
                df = df.unionByName(extra).distinct()
    proj: dict[str, F.Column] = {}

    def bind(term: Term, col: str, is_obj: bool) -> None:
        nonlocal df
        if isinstance(term, Var):
            if term.name in proj:
                df = df.filter(F.col(col) == proj[term.name])
                if is_obj and term.name in iri_only:
                    df = df.filter(F.col("dst_dt").isNull())
                return
            proj[term.name] = F.col(col)
            if is_obj:
                if term.name in iri_only:
                    df = df.filter(F.col("dst_dt").isNull())
                else:
                    proj[_dt_shadow(term.name)] = F.col("dst_dt")
        elif isinstance(term, Iri):
            df = df.filter(F.col(col) == term.value)
            if is_obj:
                df = df.filter(F.col("dst_dt").isNull())
        else:  # Lit — meaningful at the object end only
            if is_obj:
                df = df.filter(
                    (F.col(col) == term.value)
                    & (F.col("dst_dt") == (term.dt if term.dt else ""))
                )
            else:  # RDF has no literal subjects
                df = df.filter(F.lit(False))

    bind(s, "src", False)
    bind(o, "dst", True)
    out = df.select([expr.alias(name) for name, expr in proj.items()])
    preds = _path_preds(p)
    if preds and preds <= SCHEMA_PREDS:
        out = broadcast(out)
    return out


def _compile_pattern(
    triples: DataFrame,
    pat: tuple[Term, Term, Term],
    iri_only: set[str],
) -> DataFrame:
    s, p, o = pat
    if isinstance(p, PATH_TYPES):
        return _compile_path_pattern(triples, pat, iri_only)
    df = triples.select(*TRIPLE_FIELDS)
    proj: dict[str, F.Column] = {}

    def bind(term: Term, col: str, is_obj: bool) -> None:
        nonlocal df
        if isinstance(term, Var):
            if term.name in proj:  # repeated var inside one pattern
                df = df.filter(F.col(col) == proj[term.name])
                # a repeat at the object position still carries the
                # IRI-only constraint (the var was just bound in a
                # subject/predicate slot of this very pattern)
                if is_obj and term.name in iri_only:
                    df = df.filter(F.col("obj_dt").isNull())
                return
            proj[term.name] = F.col(col)
            if is_obj:
                if term.name in iri_only:
                    df = df.filter(F.col("obj_dt").isNull())
                else:
                    proj[_dt_shadow(term.name)] = F.col("obj_dt")
        elif isinstance(term, Iri):
            df = df.filter(F.col(col) == term.value)
            if is_obj:
                df = df.filter(F.col("obj_dt").isNull())
        else:  # Lit — only meaningful in object position
            df = df.filter(F.col(col) == term.value)
            if is_obj:
                df = df.filter(F.col("obj_dt") == (term.dt if term.dt else ""))

    bind(s, "subj", False)
    bind(p, "pred", False)
    bind(o, "obj", True)
    out = df.select([expr.alias(name) for name, expr in proj.items()])
    if isinstance(p, Iri) and p.value in SCHEMA_PREDS:
        out = broadcast(out)
    return out


def _shared_keys(acc: DataFrame, pdf: DataFrame) -> list[str]:
    # dt shadows join too when BOTH sides carry them (term equality
    # includes the datatype); a side that lacks the shadow bound the
    # var in subj/pred position -> handled by the iri_only filter
    both = set(acc.columns) & set(pdf.columns)
    return sorted(c for c in both if not c.startswith("__dt_")) + sorted(
        c for c in both if c.startswith("__dt_")
    )


def _null_safe_cond(keys: list[str]) -> F.Column:
    # a dt shadow is NULL for IRI bindings, so key equality must be
    # null-safe (<=>) or IRI == IRI never matches
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"_l.{k}").eqNullSafe(F.col(f"_r.{k}"))
    return cond


def _join_step(acc: DataFrame | None, pdf: DataFrame) -> DataFrame:
    if acc is None:
        return pdf
    keys = _shared_keys(acc, pdf)
    if not keys:
        return acc.crossJoin(pdf)
    joined = acc.alias("_l").join(pdf.alias("_r"), _null_safe_cond(keys), "inner")
    keep = [F.col(f"_l.{c}").alias(c) for c in acc.columns] + [
        F.col(f"_r.{c}").alias(c) for c in pdf.columns if c not in set(acc.columns)
    ]
    return joined.select(keep)


def _boundary_cond(
    l_cols: list[str], r_cols: list[str], shared: list[str]
) -> F.Column:
    """Null-safe, datatype-reconciled match condition between an
    accumulated binding set (_l) and a sub-group's (_r): shared vars
    compare null-safely, dt shadows join when both sides carry them,
    and a side that bound the var IRI-only (no shadow) forces the
    other side's shadow NULL — only IRI terms match."""
    cond = F.lit(True)
    for v in shared:
        cond = cond & F.col(f"_l.{v}").eqNullSafe(F.col(f"_r.{v}"))
        sh = _dt_shadow(v)
        l_sh, r_sh = sh in l_cols, sh in r_cols
        if l_sh and r_sh:  # both sides carry the term's datatype
            cond = cond & F.col(f"_l.{sh}").eqNullSafe(F.col(f"_r.{sh}"))
        elif l_sh:  # sub-group bound v as an IRI — only IRI
            cond = cond & F.col(f"_l.{sh}").isNull()  # terms match
        elif r_sh:  # outer side bound v as an IRI
            cond = cond & F.col(f"_r.{sh}").isNull()
    return cond


def _compile_union(triples: DataFrame, alts: list[Group]) -> DataFrame:
    """{A} UNION {B} ... — each branch compiled independently, solution
    BAGS unioned (duplicates kept per spec). Subset restriction:
    branches must bind the same variable set (module docstring).
    Datatype shadows align across branches — a branch that bound the
    var IRI-only contributes NULL shadows (NULL = the IRI tag)."""
    dfs = [_compile_group(triples, a) for a in alts]
    varsets = [
        {c for c in d.columns if not c.startswith("__dt_")} for d in dfs
    ]
    if any(v != varsets[0] for v in varsets):
        raise ValueError(
            "UNION branches must bind the same variables "
            f"(got {sorted(varsets[0])} vs {sorted(next(v for v in varsets if v != varsets[0]))})"
        )
    shadows = sorted(
        set().union(*({c for c in d.columns if c.startswith("__dt_")} for d in dfs))
    )
    cols = sorted(varsets[0]) + shadows
    aligned = []
    for d in dfs:
        for sh in shadows:
            if sh not in d.columns:
                d = d.withColumn(sh, F.lit(None).cast("string"))
        aligned.append(d.select(*cols))
    out = aligned[0]
    for d in aligned[1:]:
        out = out.unionByName(d)
    return out


def _reconciled_join(acc: DataFrame, other: DataFrame) -> DataFrame:
    """Inner join of two binding sets where the sides may DISAGREE on
    which vars carry datatype shadows — the _boundary_cond treatment
    (shared with MINUS/OPTIONAL) applied to a plain conjunction join.
    Used at the UNION-block boundary; plain pattern chaining keeps the
    simpler _join_step (a pattern's shadow carriage is decided by the
    group-level iri_only set, so its sides always agree)."""
    shared = sorted(
        c
        for c in set(acc.columns) & set(other.columns)
        if not c.startswith("__dt_")
    )
    if not shared:
        return acc.crossJoin(other)
    cond = _boundary_cond(acc.columns, other.columns, shared)
    new_cols = [c for c in other.columns if c not in set(acc.columns)]
    joined = acc.alias("_l").join(other.alias("_r"), cond, "inner")
    return joined.select(
        [F.col(f"_l.{c}").alias(c) for c in acc.columns]
        + [F.col(f"_r.{c}").alias(c) for c in new_cols]
    )


def _values_df(spark, vars_: list[str], rows: list[list]) -> DataFrame:
    """Inline VALUES data as a local relation: one lexical column per
    variable plus its datatype shadow (a block may mix IRIs and
    literals), joined into the group datatype-reconciled. Bag
    semantics — duplicate rows are kept as written."""
    from kgforge.session import local_df

    cols: list[str] = []
    for v in vars_:
        cols += [v, _dt_shadow(v)]
    data = []
    for row in rows:
        out: list[str | None] = []
        for t in row:
            if isinstance(t, Iri):
                out += [t.value, None]
            else:  # Lit
                out += [t.value, t.dt if t.dt else ""]
        data.append(tuple(out))
    schema = ", ".join(f"{c} string" for c in cols)
    return local_df(spark, data, schema)


def _compile_group(triples: DataFrame, g: Group) -> DataFrame:
    if not g.patterns and not g.unions and not g.values and not g.binds:
        raise ValueError("empty group graph pattern")
    iri_only = _iri_only_vars(g)
    acc: DataFrame | None = None
    for pat in g.patterns:
        acc = _join_step(acc, _compile_pattern(triples, pat, iri_only))
    for alts in g.unions:
        ublock = _compile_union(triples, alts)
        acc = ublock if acc is None else _reconciled_join(acc, ublock)
    for vars_, rows in g.values:
        vdf = _values_df(triples.sparkSession, vars_, rows)
        # inline data is row-count-tiny by construction — broadcast it
        # so the restriction join never shuffles the instance side
        acc = vdf if acc is None else _reconciled_join(acc, broadcast(vdf))
    if acc is None:
        # binds-only group: SPARQL's single empty solution μ0 — one
        # row, no columns. The carrier column lives in the reserved
        # __dt_ namespace (the tokenizer rejects such vars) and is
        # dropped right after the binds extend it.
        from kgforge.session import local_df

        acc = local_df(triples.sparkSession, [(True,)], "__dt_mu0 boolean")
    for var, ex in g.binds:
        # parser guarantees the target is fresh and the operands were
        # bound by preceding members, so extending columns post-join
        # equals the spec's written-position evaluation
        acc = _apply_valexpr(acc, var, ex)
    if "__dt_mu0" in acc.columns:
        acc = acc.drop("__dt_mu0")
    assert acc is not None
    for opt in g.optionals:
        # OPTIONAL = left outer join; the optional side computes its
        # OWN iri-only set (an occurrence inside OPTIONAL must not
        # restrict the outer group's bindings — non-matching solutions
        # survive with unbound vars)
        odf = _compile_group(triples, opt)
        shared = sorted(
            c
            for c in set(acc.columns) & set(odf.columns)
            if not c.startswith("__dt_")
        )
        if not shared:
            raise ValueError(
                "OPTIONAL sharing no variable with its group is out of "
                "subset (would be a cartesian extension)"
            )
        cond = _boundary_cond(acc.columns, odf.columns, shared)
        new_cols = [c for c in odf.columns if c not in set(acc.columns)]
        joined = acc.alias("_l").join(odf.alias("_r"), cond, "left_outer")
        acc = joined.select(
            [F.col(f"_l.{c}").alias(c) for c in acc.columns]
            + [F.col(f"_r.{c}").alias(c) for c in new_cols]
        )
    for m in g.minuses:
        # the MINUS side computes its OWN iri-only set; the boundary
        # reconciles sides that disagree on a shared variable's term
        # kind (one side shadowed, the other IRI-only)
        mdf = _compile_group(triples, m)
        shared = sorted(
            c
            for c in set(acc.columns) & set(mdf.columns)
            if not c.startswith("__dt_")
        )
        if not shared:  # SPARQL MINUS with disjoint domains is a no-op
            continue
        keep = shared + [
            _dt_shadow(v) for v in shared if _dt_shadow(v) in mdf.columns
        ]
        cond = _boundary_cond(acc.columns, mdf.columns, shared)
        acc = acc.alias("_l").join(
            broadcast_if_schema_only(m, mdf.select(keep)).alias("_r"),
            cond,
            "left_anti",
        )
    for negated, eg in g.exists:
        # FILTER [NOT] EXISTS — correlation on the SHARED variables:
        # left_semi (EXISTS) / left_anti (NOT EXISTS) with the same
        # dt-reconciled null-safe boundary as MINUS/OPTIONAL. Unlike
        # MINUS, NO shared variables does NOT make it a no-op: the
        # filter then degenerates to "does the inner pattern have any
        # solution at all" — every row kept or dropped together (the
        # classic disjoint-domain case where NOT EXISTS and MINUS give
        # different answers). Correlation through a variable an
        # earlier OPTIONAL left unbound follows the engine's null-safe
        # semantics (NULL matches only NULL), stricter than the
        # spec's substitution semantics.
        edf = _compile_group(triples, eg)
        shared = sorted(
            c
            for c in set(acc.columns) & set(edf.columns)
            if not c.startswith("__dt_")
        )
        if shared:
            keep = shared + [
                _dt_shadow(v) for v in shared if _dt_shadow(v) in edf.columns
            ]
            cond = _boundary_cond(acc.columns, edf.columns, shared)
            side = broadcast_if_schema_only(eg, edf.select(keep))
        else:
            cond = F.lit(True)
            side = edf.limit(1)  # pure existence probe — one row suffices
        acc = acc.alias("_l").join(
            side.alias("_r"), cond, "left_anti" if negated else "left_semi"
        )
    for f_expr in g.filters:
        acc = acc.filter(_compile_expr(f_expr, set(acc.columns)))
    return acc


def broadcast_if_schema_only(g: Group, mdf: DataFrame) -> DataFrame:
    """Broadcast a MINUS side iff every pattern in it is schema-bound
    (constant schema predicate) or joins to one — heuristic: all
    constant predicates and at least one schema predicate."""
    preds = [p for _s, p, _o in g.patterns if isinstance(p, Iri)]
    if len(preds) == len(g.patterns) and any(p.value in SCHEMA_PREDS for p in preds):
        return broadcast(mdf)
    return mdf


_XSD_NS = "http://www.w3.org/2001/XMLSchema#"
#: datatypes whose literals compare numerically — the grammar's G11
#: numeric types (xsd:integer / xsd:float, csv2rdf-v5/csv2rdf-v5.py:
#: 47-53) plus the rest of the standard XSD numeric family a consumer
#: may add by hand
_NUMERIC_DTS = frozenset(
    _XSD_NS + t
    for t in ("integer", "float", "decimal", "double", "long", "int",
              "short", "byte", "nonNegativeInteger", "positiveInteger")
)


def _operand_col(x: Term | float, cols: set[str] | None = None) -> F.Column:
    if isinstance(x, Var):
        if cols is not None and x.name not in cols:
            # a variable with no binding column is unbound everywhere:
            # any comparison on it is a SPARQL type error per row →
            # NULL → filtered, i.e. an empty result, not an
            # AnalysisException
            return F.lit(None).cast("string")
        return F.col(x.name)
    if isinstance(x, Iri):
        return F.lit(x.value)
    if isinstance(x, Lit):
        return F.lit(x.value)
    return F.lit(x)  # number


def _operand_numeric(x: Term | float, cols: set[str]):
    """(is-numeric Column, static truth or None-if-row-dependent) for
    a FILTER operand: bare numbers always, typed literals by their
    declared datatype, variables by their dt shadow AT EACH ROW (a var
    with no shadow bound an IRI — never numeric)."""
    if isinstance(x, float):
        return F.lit(True), True
    if isinstance(x, Lit):
        is_num = x.dt in _NUMERIC_DTS
        return F.lit(is_num), is_num
    if isinstance(x, Var):
        sh = _dt_shadow(x.name)
        if sh in cols:
            return F.col(sh).isin(*sorted(_NUMERIC_DTS)), None
        return F.lit(False), False
    return F.lit(False), False  # Iri


def _compile_expr(e: Expr, cols: set[str]) -> F.Column:
    if isinstance(e, Cmp):
        lhs, rhs = _operand_col(e.left, cols), _operand_col(e.right, cols)
        l_num, l_static = _operand_numeric(e.left, cols)
        r_num, r_static = _operand_numeric(e.right, cols)

        def _ops(left: F.Column, right: F.Column) -> F.Column:
            return {
                "=": left == right, "!=": left != right, "<": left < right,
                "<=": left <= right, ">": left > right, ">=": left >= right,
            }[e.op]

        # try_cast, not cast: a numeric-typed literal with a junk
        # lexical form is a SPARQL type error (row filtered), not an
        # ANSI runtime exception
        num_cmp = _ops(lhs.try_cast("double"), rhs.try_cast("double"))
        str_cmp = _ops(lhs, rhs)
        bare_const = isinstance(e.left, float) or isinstance(e.right, float)
        if (l_static and r_static) or bare_const:
            # both certainly numeric — or the query wrote a bare
            # number, which forces the numeric reading (pre-round-4
            # subset behavior, kept: it is what the reference's ad-hoc
            # queries rely on for untyped version literals)
            return num_cmp
        if l_static is False or r_static is False:
            return str_cmp  # a side can never be numeric
        # row-dependent: numeric when BOTH terms are numeric there
        return F.when(l_num & r_num, num_cmp).otherwise(str_cmp)
    if isinstance(e, BoolOp):
        a, b = (_compile_expr(x, cols) for x in e.args)
        return (a & b) if e.op == "and" else (a | b)
    if isinstance(e, Not):
        # SPARQL effective-boolean-value: an error (NULL from a
        # comparison on an unbound var) stays an error under negation
        # — coalesce AFTER the flip would turn errors into kept rows;
        # Spark's three-valued NOT already does the right thing
        return ~_compile_expr(e.arg, cols)
    if isinstance(e, Call):
        if e.fn == "bound":
            name = e.args[0].name
            # a var absent from the binding columns entirely is
            # statically unbound (SPARQL: bound() = false)
            if name not in cols:
                return F.lit(False)
            return F.col(name).isNotNull()
        if e.fn == "regex":
            target = _operand_col(e.args[0], cols)
            pat = e.args[1].value
            flags = e.args[2].value if len(e.args) == 3 else ""
            if "i" in flags:  # the one XPath flag the subset carries
                pat = "(?i)" + pat
            return target.rlike(pat)
        raise ValueError(f"unknown function {e.fn!r}")
    raise ValueError(f"unknown expr {e!r}")


#: datatypes whose arithmetic stays in 64-bit integers (xsd:integer
#: and its derived types the engine carries)
_INT_DTS = frozenset(
    _XSD_NS + t
    for t in ("integer", "long", "int", "short", "byte",
              "nonNegativeInteger", "positiveInteger")
)
_INT_LEX = r"^[+-]?\d+$"


def _compile_valexpr(e, cols: set[str]) -> tuple[F.Column, F.Column]:
    """Value expression (BIND / SELECT expression) → (lexical-value
    column, datatype-shadow column). The engine's term model rides
    along: dt NULL = IRI, '' = plain literal, else datatype IRI.

    Numeric rules (Arith docstring): integer×integer under +,-,*
    evaluates in 64-bit integers via try_add/try_subtract/try_multiply
    (overflow → NULL → unbound, not an ANSI runtime error) and carries
    xsd:integer; every other numeric case evaluates in double via the
    try_* family (so /0 and junk lexical forms become unbound, the
    subset's reading of the spec's type-error rule — xsd:double's
    INF-on-/0 is the one documented divergence) and carries
    xsd:double. A non-numeric operand makes the whole arithmetic
    result unbound."""
    if isinstance(e, Var):
        if e.name not in cols:
            # statically unbound: the expression errors per row →
            # target unbound (the parser rejects this inside BIND;
            # reachable from SELECT expressions over OPTIONAL vars)
            return F.lit(None).cast("string"), F.lit(None).cast("string")
        sh = _dt_shadow(e.name)
        dt = F.col(sh) if sh in cols else F.lit(None).cast("string")
        return F.col(e.name), dt
    if isinstance(e, Iri):
        return F.lit(e.value), F.lit(None).cast("string")
    if isinstance(e, Lit):
        return F.lit(e.value), F.lit(e.dt if e.dt else "")
    if isinstance(e, Arith):
        lv, ld = _compile_valexpr(e.left, cols)
        rv, rd = _compile_valexpr(e.right, cols)

        def numeric(v: F.Column, d: F.Column) -> F.Column:
            typed = F.coalesce(d.isin(*sorted(_NUMERIC_DTS)), F.lit(False))
            plain = F.coalesce(
                (d == "") & v.try_cast("double").isNotNull(), F.lit(False)
            )
            return typed | plain

        def int_like(v: F.Column, d: F.Column) -> F.Column:
            typed = F.coalesce(d.isin(*sorted(_INT_DTS)), F.lit(False))
            plain = F.coalesce((d == "") & v.rlike(_INT_LEX), F.lit(False))
            return typed | plain

        valid = numeric(lv, ld) & numeric(rv, rd)
        li, ri = lv.try_cast("long"), rv.try_cast("long")
        ldb, rdb = lv.try_cast("double"), rv.try_cast("double")
        null_s = F.lit(None).cast("string")
        if e.op == "/":
            both_int = F.lit(False)
            int_val = null_s
            dbl = F.try_divide(ldb, rdb)
        else:
            fn = {"+": F.try_add, "-": F.try_subtract, "*": F.try_multiply}[e.op]
            both_int = (
                int_like(lv, ld) & int_like(rv, rd)
                & li.isNotNull() & ri.isNotNull()
            )
            int_val = fn(li, ri).cast("string")
            dbl = fn(ldb, rdb)
        value = (
            F.when(~valid, null_s)
            .when(both_int, int_val)
            .otherwise(dbl.cast("string"))
        )
        dt = (
            F.when(value.isNull(), null_s)
            .when(both_int, F.lit(_XSD_NS + "integer"))
            .otherwise(F.lit(_XSD_NS + "double"))
        )
        return value, dt
    if isinstance(e, FnCall):
        vals = [_compile_valexpr(a, cols)[0] for a in e.args]
        plain = F.lit("")
        if e.fn == "concat":
            # NULL-propagating, per the spec's error rule (an unbound
            # operand makes the result unbound)
            return F.concat(*vals), plain
        if e.fn == "str":
            return vals[0], plain  # lexical form of any term
        if e.fn == "strlen":
            return F.length(vals[0]).cast("string"), F.lit(_XSD_NS + "integer")
        if e.fn == "ucase":
            return F.upper(vals[0]), plain
        if e.fn == "lcase":
            return F.lower(vals[0]), plain
        raise ValueError(f"unknown value function {e.fn!r}")
    raise ValueError(f"unknown value expression {e!r}")


def _apply_valexpr(df: DataFrame, var: str, ex) -> DataFrame:
    """Bind `var` (value + dt shadow) from a value expression; an
    error (NULL value) forces the shadow NULL too, matching the
    engine's unbound representation from OPTIONAL."""
    val, dt = _compile_valexpr(ex, set(df.columns))
    df = df.withColumn(var, val)
    return df.withColumn(
        _dt_shadow(var),
        F.when(F.col(var).isNull(), F.lit(None).cast("string")).otherwise(dt),
    )


def _select_aggregate(q: Query, bound: DataFrame) -> DataFrame:
    """SELECT with aggregates / GROUP BY: grouping is TERM-based (the
    datatype shadows participate in the keys — "5" plain and
    "5"^^xsd:integer are different groups even though both print as
    "5"), then the lexical forms project. COUNT(?v) skips unbound
    (NULL) rows; COUNT(DISTINCT ?v) counts distinct TERMS; SUM coerces
    with try_cast double (non-numeric → NULL → ignored); MIN/MAX
    compare lexical forms (the subset's ordering). A projected plain
    variable must be grouped (the spec's rule); GROUP BY with no
    aggregates degenerates to one row per group."""
    gb = q.group_by or []
    missing = [v for v in gb if v not in bound.columns]
    if missing:
        raise ValueError(f"GROUP BY on unbound variable(s) {missing}")
    plain = [name for kind, name in q.select_items if kind == "var"]
    bad = [v for v in plain if v not in gb]
    if bad:
        raise ValueError(
            f"non-grouped variable(s) {bad} projected next to aggregates"
        )
    keys: list[str] = []
    for v in gb:
        keys.append(v)
        if _dt_shadow(v) in bound.columns:
            keys.append(_dt_shadow(v))

    def agg_col(a: Agg) -> F.Column:
        if a.fn == "count" and a.var is None:
            return F.count(F.lit(1)).cast("bigint")
        assert a.var is not None
        if a.var not in bound.columns:
            # statically-unbound var: COUNT = 0, others = NULL (a
            # SPARQL evaluation error aggregates to the empty value)
            v = F.lit(None).cast("string")
        else:
            v = F.col(a.var)
        if a.fn == "count":
            if a.distinct:
                sh = _dt_shadow(a.var) if a.var in bound.columns else None
                term = (
                    F.struct(v, F.col(sh)) if sh and sh in bound.columns
                    else F.struct(v)
                )
                # when() gates unbound rows out: a struct with NULL
                # fields is still a non-NULL struct and would count
                return F.count_distinct(F.when(v.isNotNull(), term)).cast("bigint")
            return F.count(v).cast("bigint")
        if a.fn == "sum":
            return F.coalesce(F.sum(v.try_cast("double")), F.lit(0.0))
        if a.fn == "avg":
            # all-non-numeric / all-unbound group -> NULL (the spec's
            # error value); numeric coercion identical to SUM
            return F.avg(v.try_cast("double"))
        if a.fn == "min":
            return F.min(v)
        if a.fn == "max":
            return F.max(v)
        if a.fn == "sample":
            # spec: any member; engine: the MINIMUM lexical form, so
            # results are deterministic (and oracle-checkable)
            return F.min(v)
        if a.fn == "group_concat":
            # spec leaves member order undefined; the engine
            # canonicalizes ascending (determinism ban on unordered
            # collect) — oracle: string_agg(... ORDER BY ...)
            members = F.collect_set(v) if a.distinct else F.collect_list(v)
            return F.array_join(F.array_sort(members), a.sep)
        raise ValueError(f"unsupported aggregate {a.fn!r}")

    exprs = [agg_col(a).alias(a.alias) for a in q.aggs]
    if exprs:
        grouped = bound.groupBy(*keys).agg(*exprs) if keys else bound.agg(*exprs)
    else:  # GROUP BY with no aggregates: one row per group
        grouped = bound.select(*keys).distinct()
    if q.having is not None:
        # HAVING filters the grouped solutions; operands are grouped
        # vars and aggregate aliases (numeric columns compare
        # numerically — a bare-number comparand forces the numeric
        # reading in _compile_expr)
        grouped = grouped.filter(_compile_expr(q.having, set(grouped.columns)))
    out_cols = [
        name if kind == "var" else q.aggs[name].alias
        for kind, name in q.select_items
    ]
    if q.order:
        missing = [v for v, _ in q.order if v not in grouped.columns]
        if missing:
            raise ValueError(f"ORDER BY on unavailable variable(s) {missing}")
        grouped = grouped.orderBy(
            *[F.col(v).desc() if d else F.col(v).asc() for v, d in q.order]
        )
    out = grouped.select(*out_cols)
    if q.offset:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


# --------------------------------------------------------------------
# public API
# --------------------------------------------------------------------


def sparql(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL query (see module docstring for the subset) over a
    (subj, pred, obj, obj_dt) triple table.

    SELECT -> one column per projected variable (lexical values).
    CONSTRUCT / INSERT -> a deduped triple DataFrame (for INSERT, pass
    the result to `insert()` to union it back into the table).
    """
    q = parse(query)
    bound = _compile_group(triples, q.group)

    if q.form == "ask":
        from kgforge.session import local_df

        # one row, one boolean column; limit(1) keeps the probe from
        # materializing the full solution set (same shape as the
        # uncorrelated EXISTS probe)
        probe = bound.limit(1).count() > 0
        return local_df(triples.sparkSession, [(probe,)], "ask boolean")

    if q.form == "select" and (q.aggs or q.group_by is not None):
        return _select_aggregate(q, bound)

    if q.form == "select":
        if q.exprs:
            # SELECT expressions: spec-equivalent to a BIND appended
            # after the group (the alias is fresh — parser-enforced
            # against other projection items, here against the group's
            # own variables)
            clash = [a for a, _ in q.exprs if a in bound.columns]
            if clash:
                raise ValueError(
                    f"SELECT expression alias(es) {clash} already bound "
                    "in the group (spec: must be fresh)"
                )
            for alias, ex in q.exprs:
                bound = _apply_valexpr(bound, alias, ex)
            out_vars = [
                name if kind == "var" else q.exprs[name][0]
                for kind, name in q.select_items
            ]
        else:
            out_vars = q.select_vars
        if out_vars is None:
            out_vars = [c for c in bound.columns if not c.startswith("__dt_")]
        missing = [v for v in out_vars if v not in bound.columns]
        if missing:
            raise ValueError(f"SELECT of unbound variable(s) {missing}")
        def _order(df: DataFrame) -> DataFrame:
            missing = [v for v, _ in q.order if v not in df.columns]
            if missing:
                raise ValueError(
                    f"ORDER BY on unavailable variable(s) {missing}"
                    + (" (DISTINCT restricts sort keys to projected vars)"
                       if q.distinct else "")
                )
            return df.orderBy(
                *[F.col(v).desc() if d else F.col(v).asc() for v, d in q.order]
            )

        if q.distinct:
            # spec: DISTINCT applies to the projected SOLUTIONS — terms,
            # not lexical forms: the dt shadows participate in the
            # distinct then drop ("5" plain vs "5"^^xsd:integer stay
            # two rows). ORDER BY may then only use projected variables.
            shadows = [
                _dt_shadow(v) for v in out_vars if _dt_shadow(v) in bound.columns
            ]
            out = bound.select(*out_vars, *shadows).distinct().select(*out_vars)
            if q.order:
                out = _order(out)
        else:
            out = _order(bound) if q.order else bound
            out = out.select(*out_vars)  # projection preserves sort order
        if q.offset:
            out = out.offset(q.offset)
        if q.limit is not None:
            # with an ORDER BY this plans as TakeOrderedAndProject —
            # no global sort materialization, same shape as top-k
            out = out.limit(q.limit)
        return out

    # CONSTRUCT: instantiate the template per binding row, union, dedup
    assert q.template, "CONSTRUCT requires a template"
    for _ts, tp, _to in q.template:
        if isinstance(tp, PATH_TYPES):
            raise ValueError(
                "property paths are not valid in CONSTRUCT/INSERT templates"
            )
    # solution modifiers act on the binding sequence BEFORE template
    # instantiation (the instantiated graph is still a set)
    if q.order:
        missing = [v for v, _ in q.order if v not in bound.columns]
        if missing:
            raise ValueError(f"ORDER BY on unavailable variable(s) {missing}")
        bound = bound.orderBy(
            *[F.col(v).desc() if d else F.col(v).asc() for v, d in q.order]
        )
    if q.offset:
        bound = bound.offset(q.offset)
    if q.limit is not None:
        bound = bound.limit(q.limit)
    null_dt = F.lit(None).cast("string")
    parts: list[DataFrame] = []
    for s, p, o in q.template:

        def val(term: Term) -> F.Column:
            if isinstance(term, Var):
                if term.name not in bound.columns:
                    raise ValueError(f"template var ?{term.name} unbound")
                return F.col(term.name)
            if isinstance(term, Iri):
                return F.lit(term.value)
            return F.lit(term.value)

        # the SPARQL ill-formed-triple rule, applied PER template
        # triple: a solution whose binding for THIS triple's subject/
        # predicate var is a literal skips only this instantiation —
        # its other template triples still materialize (round-3 advice:
        # the old whole-binding-set pre-filter dropped those too)
        part = bound
        for t in (s, p):
            if isinstance(t, Var) and _dt_shadow(t.name) in bound.columns:
                part = part.filter(F.col(_dt_shadow(t.name)).isNull())
        for t in (s, p, o):
            # a var left unbound by OPTIONAL skips this instantiation
            if isinstance(t, Var) and t.name in bound.columns:
                part = part.filter(F.col(t.name).isNotNull())
        if isinstance(o, Var) and _dt_shadow(o.name) in bound.columns:
            o_dt = F.col(_dt_shadow(o.name))
        elif isinstance(o, Lit):
            o_dt = F.lit(o.dt if o.dt else "")
        else:
            o_dt = null_dt
        parts.append(
            part.select(
                val(s).alias("subj"),
                val(p).alias("pred"),
                val(o).alias("obj"),
                o_dt.alias("obj_dt"),
            )
        )
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out.dropDuplicates(TRIPLE_FIELDS)


def insert(triples: DataFrame, query: str) -> DataFrame:
    """INSERT { template } WHERE { ... }: the source table plus the
    constructed triples, globally deduped (one shuffle on the full
    triple key — same shape as the orchestrator's A4 dedup)."""
    derived = sparql(triples, query)
    return (
        triples.select(*TRIPLE_FIELDS)
        .unionByName(derived)
        .dropDuplicates(TRIPLE_FIELDS)
    )
