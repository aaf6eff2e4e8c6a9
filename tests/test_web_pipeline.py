"""North-rule pipeline tests: extraction byte-identity, mention-triple
exactness, linking cluster quality, end-to-end canonical-triple P/R."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kgforge.web import corpus as C
from kgforge.web.canon import canonical_map, connected_components, rewrite_triples
from kgforge.web.extract import extract_text, extract_text_py
from kgforge.web.mentions import extract_mention_triples
from kgforge.web.pipeline import run_pipeline, surfaces_of


@pytest.fixture(scope="module")
def corpus():
    return C.make_corpus(n_pages=300, seed=42)


@pytest.fixture(scope="module")
def pages(spark, corpus):
    return C.pages_dataframe(spark, corpus).cache()


# ------------------------------------------------------------- extraction
def test_extract_byte_identity_single_node(corpus):
    """The pinned extractor reproduces ground-truth text byte-for-byte."""
    for url, ts, html, text, lang in corpus.pages[:50]:
        assert extract_text_py(html) == text, url


def test_extract_byte_identity_spark(spark, pages, corpus):
    got = {
        r.url: hashlib.sha256(r.text_extracted.encode()).hexdigest()
        for r in extract_text(pages).select("url", "text_extracted").collect()
    }
    want = {
        url: hashlib.sha256(text.encode()).hexdigest()
        for url, _, _, text, _ in corpus.pages
    }
    assert got == want


# ------------------------------------------------------------- mentions
def test_mention_triples_exact(spark, pages, corpus):
    out = extract_mention_triples(pages, text_col="text")
    got = {
        (r.subj, r.pred, r.obj)
        for r in out.filter(F.col("obj_dt").isNull()).collect()
    }
    assert got == corpus.mention_triples
    # labels carried for every mention IRI
    lbl = {
        (r.subj, r.obj)
        for r in out.filter(F.col("obj_dt") == "").collect()
    }
    assert lbl == corpus.labels


def test_mention_provenance_deterministic(spark, pages):
    a = extract_mention_triples(pages).select("subj", "pred", "obj", "prov_url")
    b = extract_mention_triples(pages).select("subj", "pred", "obj", "prov_url")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


# ------------------------------------------------------------- CC
def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d"), ("f", "e"), ("x", "y")],
        ["src", "dst"],
    )
    cc = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert cc == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("d", "d"), ("e", "d"), ("f", "d"),
        ("x", "x"), ("y", "x"),
    }


def test_connected_components_chain_and_fixpoint(spark):
    # pathological chain — needs the O(log n) star rounds
    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], ["src", "dst"]
    )
    cc = connected_components(edges)
    comps = {r.component for r in cc.collect()}
    assert comps == {"n000"}
    assert cc.count() == n + 1


def test_connected_components_schema_stable_by_input_size(spark):
    """Empty and non-empty edge lists must agree on output types: the
    empty case previously hardcoded strings while the non-empty case
    inferred from pandas (long for numeric ids)."""
    empty = spark.createDataFrame([], "src long, dst long")
    some = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    t_empty = [f.dataType for f in connected_components(empty).schema.fields]
    t_some = [f.dataType for f in connected_components(some).schema.fields]
    assert t_empty == t_some
    assert connected_components(empty).count() == 0


# ------------------------------------------------------------- end-to-end
def pairwise_f1(pred_map: dict, true_map: dict) -> tuple[float, float, float]:
    def pairs(m):
        clusters: dict[str, list[str]] = {}
        for k, v in m.items():
            clusters.setdefault(v, []).append(k)
        out = set()
        for mem in clusters.values():
            mem = sorted(mem)
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    out.add((mem[i], mem[j]))
        return out

    pp, tp = pairs(pred_map), pairs(true_map)
    if not pp or not tp:
        return (0.0, 0.0, 0.0)
    inter = len(pp & tp)
    p, r = inter / len(pp), inter / len(tp)
    return p, r, 2 * p * r / (p + r) if p + r else 0.0


def test_pipeline_end_to_end_pr(spark, pages, corpus):
    out = run_pipeline(pages, text_from_html=True)
    got = {
        (r.subj, r.pred, r.obj)
        for r in out["canonical_triples"].filter(F.col("obj_dt").isNull()).collect()
    }
    want = C.true_canonical_triples(corpus)
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f} got={len(got)} want={len(want)}"
    )


def test_pipeline_end_to_end_pr_scale_profile(spark, pages, corpus):
    """The SCALE profile (every guard armed — the posture the contract
    query and crawl-scale runs use) keeps the north-rule P/R gate."""
    from kgforge.profile import SCALE

    out = run_pipeline(pages, text_from_html=True, profile=SCALE)
    got = {
        (r.subj, r.pred, r.obj)
        for r in out["canonical_triples"].filter(F.col("obj_dt").isNull()).collect()
    }
    want = C.true_canonical_triples(corpus)
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f} got={len(got)} want={len(want)}"
    )


def test_linking_cluster_quality(spark, pages, corpus):
    out = run_pipeline(pages, text_from_html=False)
    pred_map = {r.node: r.canon for r in out["canonical_map"].collect()}
    true_map = {
        C.mention_iri(s): canon
        for s, canon in (
            (s, C.true_canonical_map(corpus)[C.mention_iri(s)])
            for s in corpus.surface_entity
        )
    }
    p, r, f1 = pairwise_f1(pred_map, true_map)
    assert f1 >= 0.95, f"pairwise P={p:.4f} R={r:.4f} F1={f1:.4f}"


def test_tfidf_scorer_equivalent_quality(spark, pages, corpus):
    out = run_pipeline(pages, text_from_html=False, scorer="tfidf", link_threshold=0.5)
    got = {
        (r.subj, r.pred, r.obj)
        for r in out["canonical_triples"].filter(F.col("obj_dt").isNull()).collect()
    }
    want = C.true_canonical_triples(corpus)
    tp = len(got & want)
    assert tp / len(got) >= 0.9 and tp / len(want) >= 0.9


def test_rewrite_triples_prov_modes(spark):
    """collapse_prov=True → one row per distinct triple (min prov);
    False → one row per (triple, provenance), full-row dedup — the
    north-rule lineage table shape."""
    cmap = spark.createDataFrame(
        [("e:a1", "e:a"), ("e:a2", "e:a")], "node string, canon string"
    )
    triples = spark.createDataFrame(
        [
            ("e:a1", "p:r", "e:o", None, "https://ex/1"),
            ("e:a2", "p:r", "e:o", None, "https://ex/2"),
            ("e:a2", "p:r", "e:o", None, "https://ex/2"),  # exact dup
        ],
        "subj string, pred string, obj string, obj_dt string, prov_url string",
    )
    compact = rewrite_triples(triples, cmap).collect()
    assert len(compact) == 1
    assert compact[0].subj == "e:a" and compact[0].prov_url == "https://ex/1"

    lineage_rows = {
        tuple(r) for r in rewrite_triples(triples, cmap, collapse_prov=False).collect()
    }
    assert lineage_rows == {
        ("e:a", "p:r", "e:o", None, "https://ex/1"),
        ("e:a", "p:r", "e:o", None, "https://ex/2"),
    }


def test_corpus_hub_frac_plants_mega_hub(spark):
    """hub_frac plants one entity as SUBJECT on ~that fraction of
    pages; the generator stays deterministic and ground-truth-exact."""
    c = C.make_corpus(n_pages=400, seed=42, hub_frac=0.3)
    c2 = C.make_corpus(n_pages=400, seed=42, hub_frac=0.3)
    assert c.pages == c2.pages  # deterministic
    # the hub is orgs[0]; find its surfaces via the truth map
    ents = C.make_entities(42, n_person=min(max(80, 400 // 50), 250000),
                           n_org=min(max(60, 400 // 80), 150000),
                           n_place=min(max(30, 400 // 250), 50000))
    hub = [e for e in ents if e.kind == "org"][0]
    hub_subj_pages = sum(
        1 for (_u, _t, _h, text, _l) in c.pages
        if any(text.startswith(v) or f"\n{v}" in "\n" + text for v in hub.variants)
    )
    assert 0.2 * 400 <= hub_subj_pages  # ~30% of pages lead with the hub


def test_tfidf_score_preserves_empty_gram_pairs(spark):
    """Round-4 advice: a pair whose gram stream is empty on BOTH sides
    (NULL or empty arrays) must come back scored 0.0, not vanish —
    score_tfidf_cosine promises to preserve `pairs` cardinality."""
    from kgforge.web.linking import compute_idf_df, score_tfidf_cosine

    idf = compute_idf_df(
        spark.createDataFrame([("alpha",), ("beta",)], "surface string")
    )
    pairs = spark.createDataFrame(
        [
            ("alpha", "beta", ["alp", "lph", "pha"], ["bet", "eta"]),
            ("x", "y", [], []),
            ("p", "q", None, None),
        ],
        "a string, b string, grams_a array<string>, grams_b array<string>",
    )
    rows = {r.a: r.score for r in score_tfidf_cosine(pairs, idf).collect()}
    assert set(rows) == {"alpha", "x", "p"}  # no row dropped
    assert rows["x"] == 0.0 and rows["p"] == 0.0


def test_tfidf_large_vocabulary_no_driver_state(spark):
    """Planted very-large-vocabulary surfaces (unicode noise): the
    TF-IDF path must stay fully columnar — no vocabulary-sized driver
    state, no forced broadcast of the weight table (round-4 verdict
    item 5: AQE decides). 20k random-unicode surfaces yield a gram
    vocabulary in the hundreds of thousands; the scorer must complete
    and score an exact duplicate pair 1.0."""
    import random

    from kgforge.web.linking import char_ngrams, compute_idf_df, score_tfidf_cosine

    rng = random.Random(7)
    # unicode noise spanning several scripts — maximizes distinct grams
    alphabet = (
        [chr(c) for c in range(0x0391, 0x03C9)]      # greek
        + [chr(c) for c in range(0x0410, 0x044F)]    # cyrillic
        + [chr(c) for c in range(0x4E00, 0x4F00)]    # cjk slice
        + list("abcdefghijklmnopqrstuvwxyz")
    )
    surfaces = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(8, 24)))
        for _ in range(20_000)
    ]
    sdf = spark.createDataFrame([(s,) for s in surfaces], "surface string").repartition(8)
    idf = compute_idf_df(sdf)
    # the weight table is genuinely large-vocabulary
    assert idf.count() > 100_000
    dup = surfaces[0]
    pairs = spark.createDataFrame(
        [(dup, dup + " ", None, None), (surfaces[1], surfaces[2], None, None)],
        "a string, b string, grams_a array<string>, grams_b array<string>",
    ).select(
        "a", "b",
        char_ngrams(F.col("a")).alias("grams_a"),
        char_ngrams(F.col("b")).alias("grams_b"),
    )
    got = {r.a: r.score for r in score_tfidf_cosine(pairs, idf).collect()}
    assert got[dup] > 0.9  # near-duplicate scores high
    assert 0.0 <= got[surfaces[1]] < 0.5  # unrelated noise scores low
