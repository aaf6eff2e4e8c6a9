"""Engine-vs-oracle parity: the Spark pipeline must reproduce the
reference's (subj, pred, obj, obj_dt) sets exactly (P/R = 1.0 on
fixtures; BASELINE.json gate is ≥ 0.95)."""

from __future__ import annotations

import pytest

from kgforge.io.read import dataframe_from_rows
from kgforge.mapping.compile_ini import compile_v234, compile_v5
from kgforge.mapping.compile_v1 import (
    compile_v1_default,
    compile_v1_semantic,
)
from kgforge.triples.emit import assert_no_map_miss, emit_triples

from tests import gen_fixtures as G
from tests import oracle


def triple_set(df) -> set[tuple]:
    return {(r.subj, r.pred, r.obj, r.obj_dt) for r in df.collect()}


def pr(engine: set, expected: set) -> tuple[float, float]:
    if not engine or not expected:
        return (0.0, 0.0)
    tp = len(engine & expected)
    return tp / len(engine), tp / len(expected)


def assert_parity(engine: set, expected: set) -> None:
    p, r = pr(engine, expected)
    extra = sorted(engine - expected)[:5]
    missing = sorted(expected - engine)[:5]
    assert engine == expected, (
        f"P={p:.4f} R={r:.4f}\nextra(5)={extra}\nmissing(5)={missing}"
    )


# ------------------------------------------------------------------ v1
def test_v1_default_parity(spark):
    rows = G.v1_rows()
    expected = oracle.v1_default(rows, G.V1_DOMAIN, G.V1_TYPE, G.V1_PREFIX)
    df = dataframe_from_rows(spark, rows, with_rowindex=True)
    spec = compile_v1_default(G.V1_DOMAIN, G.V1_TYPE, G.V1_PREFIX, rows[0])
    assert_parity(triple_set(emit_triples(df, spec)), expected)


def test_v1_semantic_parity(spark):
    rows = G.v1_rows()
    expected = oracle.v1_semantic(G.V1_GRAMMAR, rows, G.V1_DOMAIN)
    df = dataframe_from_rows(spark, rows)
    spec = compile_v1_semantic(G.V1_DOMAIN, G.V1_GRAMMAR, rows[0])
    assert_parity(triple_set(emit_triples(df, spec)), expected)


def test_v1_semantic_reference_grammar_parity(spark):
    """Against the reference's real 67-rule grammar, with synthesized
    67-column data (the repo's own fixture CSVs are absent)."""
    import random

    grammar = G.reference_v1_grammar()
    rng = random.Random(42)
    header = [c for c, _ in grammar]
    rows = [header]
    for i in range(1, 40):
        row = ["x"] * len(header)
        row[2] = f"PN-{i:03d}"  # Part number -> subject1|PN
        row[4] = " ".join(f"PN-{rng.randint(1, 39):03d}" for _ in range(rng.randint(0, 2)))
        row[5] = f"PN-{rng.randint(1, 39):03d}" if rng.random() < 0.4 else "NONE"
        row[6] = rng.choice(["Rotor head", "Tail boom - assy", "-"])
        row[14] = rng.choice(["GRP1", "GRP2", ""])
        row[22] = f"PN-{rng.randint(1, 39):03d}" if rng.random() < 0.3 else ""
        rows.append(row)
    expected = oracle.v1_semantic(grammar, rows, G.V1_DOMAIN)
    df = dataframe_from_rows(spark, rows)
    spec = compile_v1_semantic(G.V1_DOMAIN, grammar, rows[0])
    assert_parity(triple_set(emit_triples(df, spec)), expected)


# ------------------------------------------------------------------ v2/v3/v4
@pytest.mark.parametrize("version", ["v2", "v3", "v4"])
def test_v234_parity(spark, version):
    rows = G.mipl_rows(include_map_misses=(version == "v4"))
    expected = oracle.v234(version, G.GRAMMAR_V2, rows, G.MIPL_DOMAIN)
    df = dataframe_from_rows(spark, rows)
    spec = compile_v234(version, G.MIPL_DOMAIN, G.GRAMMAR_V2, rows[0])
    if spec.strict_map_miss:
        assert_no_map_miss(df, spec)
    assert_parity(triple_set(emit_triples(df, spec)), expected)


def test_v2_strict_miss_raises(spark):
    rows = G.mipl_rows(include_map_misses=True)
    df = dataframe_from_rows(spark, rows)
    spec = compile_v234("v2", G.MIPL_DOMAIN, G.GRAMMAR_V2, rows[0])
    with pytest.raises(LookupError):
        assert_no_map_miss(df, spec)


# ------------------------------------------------------------------ v5
def test_v5_parity(spark):
    rows = G.mipl_rows(include_map_misses=True)
    expected = oracle.v5(G.GRAMMAR_V5, rows, G.MIPL_DOMAIN)
    df = dataframe_from_rows(spark, rows)
    spec = compile_v5(G.MIPL_DOMAIN, G.GRAMMAR_V5, rows[0])
    assert_parity(triple_set(emit_triples(df, spec)), expected)


def test_v5_ontology_requirements():
    from kgforge.mapping.compile_ini import ontology_requirements

    rows = G.mipl_rows()
    spec = compile_v5(G.MIPL_DOMAIN, G.GRAMMAR_V5, rows[0])
    got = ontology_requirements(spec)
    want = oracle.v5_ontology_requirements(G.GRAMMAR_V5, rows, G.MIPL_DOMAIN)
    assert sorted(got) == sorted(want)


# ------------------------------------------------------------------ dedup
def test_output_has_no_duplicate_triples(spark):
    rows = G.mipl_rows()
    df = dataframe_from_rows(spark, rows)
    spec = compile_v5(G.MIPL_DOMAIN, G.GRAMMAR_V5, rows[0])
    out = emit_triples(df, spec)
    assert out.count() == out.dropDuplicates(["subj", "pred", "obj", "obj_dt"]).count()


def test_rdflib_isomorphism_if_available(spark):
    rdflib = pytest.importorskip("rdflib")
    rows = G.mipl_rows()
    df = dataframe_from_rows(spark, rows)
    spec = compile_v5(G.MIPL_DOMAIN, G.GRAMMAR_V5, rows[0])
    got = triple_set(emit_triples(df, spec))

    def to_graph(triples):
        g = rdflib.Graph()
        for s, p, o, dt in triples:
            if dt is None:
                g.add((rdflib.URIRef(s), rdflib.URIRef(p), rdflib.URIRef(o)))
            elif dt == "":
                g.add((rdflib.URIRef(s), rdflib.URIRef(p), rdflib.Literal(o)))
            else:
                g.add(
                    (
                        rdflib.URIRef(s),
                        rdflib.URIRef(p),
                        rdflib.Literal(o, datatype=rdflib.URIRef(dt)),
                    )
                )
        return g

    from rdflib.compare import isomorphic

    want = oracle.v5(G.GRAMMAR_V5, rows, G.MIPL_DOMAIN)
    assert isomorphic(to_graph(got), to_graph(want))


def test_emit_tagged_dedup_equivalence(spark):
    """The tagged-narrow dedup path (constant pred/obj_dt templates)
    must equal the definitional dedup over the wide triple rows, and
    a spec with colliding (pred, obj_dt) templates must fall back to
    the wide path and still collapse cross-rule duplicate triples."""
    from kgforge.contract import table_melt_spec
    from kgforge.mapping.spec import MappingSpec, Rule, t_const_iri, t_iri
    from kgforge.triples.emit import TRIPLE_FIELDS, constant_template_terms

    df = spark.createDataFrame(
        [("k1", "a", "a"), ("k2", "b", ""), ("k3", "", "c"), ("k4", "a", "a")],
        "pk string, c1 string, c2 string",
    )
    spec = table_melt_spec("http://x/", "pk", "P_", "Thing", ["c1", "c2"])
    assert constant_template_terms(spec) is not None  # tagged path armed
    got = {tuple(r) for r in emit_triples(df, spec).collect()}
    want = {
        tuple(r)
        for r in emit_triples(df, spec, dedup=False)
        .dropDuplicates(TRIPLE_FIELDS)
        .collect()
    }
    assert got == want and len(got) > 0

    # two rules emitting the SAME constant (pred, obj_dt): the tagged
    # narrowing must refuse (it could no longer identify the template
    # from the output triple) and the wide path must dedup ACROSS rules
    rules = (
        Rule(
            rule_id="r1",
            column="c1",
            templates=(
                (t_iri("http://x/P_", "pkey", None), t_const_iri("http://x/p"),
                 t_iri("http://x/V_", "raw", None)),
            ),
        ),
        Rule(
            rule_id="r2",
            column="c2",
            templates=(
                (t_iri("http://x/P_", "pkey", None), t_const_iri("http://x/p"),
                 t_iri("http://x/V_", "raw", None)),
            ),
        ),
    )
    collide = MappingSpec(
        profile="v5", domain="http://x/", rules=rules, pkey_column="pk"
    )
    assert constant_template_terms(collide) is None  # wide path
    out = [tuple(r) for r in emit_triples(df, collide).collect()]
    # rows k1/k4 emit the identical triple from BOTH rules (c1 == c2)
    # and k1 == k4 up to subject key; global dedup keeps exactly one
    # row per distinct triple
    assert len(out) == len(set(out))
    assert ("http://x/P_k1", "http://x/p", "http://x/V_a", None) in out
