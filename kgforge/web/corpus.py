"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §3).

Generates the `web_pages(url, warc_ts, html, text, lang)` table per
BASELINE.json input_hint, plus exact ground truth for every pipeline
stage (the generator knows which mentions it planted):

* text          — what extraction must reproduce BYTE-IDENTICALLY
* mention-level triples — what template extraction must emit (P/R=1 target)
* entity clusters — which surface forms co-refer (linking ground truth)
* canonical triples — mention triples rewritten through the true
  canonical map with min-IRI election (end-to-end P/R ≥ 0.95 gate)

Entity mention frequency is Zipf-distributed to create the head-entity
skew the north rule requires the engine to handle.
Everything derives from an integer seed; no external data.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from kgforge.mapping.spec import sanitize_py

DOMAIN = "https://kg.example.org/web#"

RELATIONS = {
    "works_for": "works for",
    "founded": "founded",
    "located_in": "is located in",
    "partner_of": "is a partner of",
}

_SYL = ["ba", "den", "fir", "gol", "han", "kel", "lor", "mun",
        "nor", "pra", "quin", "ras", "sol", "tam", "vex", "wil",
        "yor", "zan", "bel", "cor"]


def _word_pool(rng: random.Random, n: int) -> list[str]:
    """Globally unique words: distinct entities share no whole word, so
    surface similarity separates clusters (a surface-only linker has no
    context signal; cross-entity word reuse is out of scope here)."""
    pool: list[str] = []
    seen: set[str] = set()
    while len(pool) < n:
        w = "".join(rng.choice(_SYL) for _ in range(rng.randint(2, 3))).capitalize()
        lw = w.lower()
        if lw in seen:
            continue
        # no word may be a substring of another ("Yorpra"/"Rasyorpra"
        # are indistinguishable to a surface-only linker)
        if any(lw in p or p in lw for p in seen):
            continue
        seen.add(lw)
        pool.append(w)
    rng.shuffle(pool)
    return pool


@dataclass
class Entity:
    eid: str           # stable generator id, e.g. person:17
    kind: str          # person | org | place
    canonical: str     # canonical surface form
    variants: list[str]  # all surface forms incl. canonical


def _variants(rng: random.Random, name: str, kind: str) -> list[str]:
    """Surface-form variants engineered to stay 3-gram-similar to the
    canonical name (casing, suffix, single-char typo) so a correct
    linker can cluster them, while distinct entities stay far apart."""
    out = [name]
    out.append(name.upper())
    if kind == "org":
        out.append(name + " Inc")
    # single-character typo: drop one mid-word character — only on
    # names long enough that the variant stays 3-gram-linkable
    body = list(name)
    mid = len(body) // 2
    if len(body) >= 10 and body[mid] != " ":
        out.append("".join(body[:mid] + body[mid + 1 :]))
    return out


def make_entities(
    seed: int = 42, n_person: int = 80, n_org: int = 60, n_place: int = 30
) -> list[Entity]:
    rng = random.Random(seed)
    pool = _word_pool(rng, n_person * 2 + n_org * 2 + n_place)
    it = iter(pool)
    ents: list[Entity] = []

    def mk(kind: str, i: int, words: int) -> Entity:
        nm = " ".join(next(it) for _ in range(words))
        return Entity(f"{kind}:{i}", kind, nm, _variants(rng, nm, kind))

    ents += [mk("person", i, 2) for i in range(n_person)]
    ents += [mk("org", i, 2) for i in range(n_org)]
    ents += [mk("place", i, 1) for i in range(n_place)]
    return ents


def mention_iri(surface: str) -> str:
    return DOMAIN + "m_" + sanitize_py(surface, "v5")


def _zipf_pick(rng: random.Random, items: list, a: float = 1.3):
    """Zipf-ish pick: rank r with weight 1/r^a (head-entity skew)."""
    n = len(items)
    weights = [1.0 / ((r + 1) ** a) for r in range(n)]
    return rng.choices(items, weights=weights, k=1)[0]


_HTML_HEAD = (
    "<html><head><title>{title}</title>"
    "<style>body {{ font: 14px sans-serif; }}</style>"
    "<script>var tracker = {page};</script></head>"
    "<body><nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>"
    "<header><h1>{title}</h1></header>"
)
_HTML_FOOT = "<footer>&copy; 2024 Example Org</footer></body></html>"

_FILLERS = [
    "Welcome to our homepage.",
    "All rights reserved.",
    "Contact us for more information.",
]


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


@dataclass
class Corpus:
    pages: list[tuple]          # (url, warc_ts, html, text, lang)
    mention_triples: set        # (subj_iri, pred_iri, obj_iri)
    surface_entity: dict        # surface form -> eid (true clustering)
    labels: set                 # (mention_iri, surface) rdfs:label pairs


def make_corpus(
    n_pages: int = 1000,
    seed: int = 42,
    facts_per_page: tuple[int, int] = (2, 6),
) -> Corpus:
    rng = random.Random(seed * 7919 + 13)
    ents = make_entities(seed)
    persons = [e for e in ents if e.kind == "person"]
    orgs = [e for e in ents if e.kind == "org"]
    places = [e for e in ents if e.kind == "place"]

    # fixed fact base (entity-level truth), Zipf-skewed endpoints
    facts: list[tuple[Entity, str, Entity]] = []
    for p in persons:
        facts.append((p, "works_for", _zipf_pick(rng, orgs)))
        if rng.random() < 0.25:
            facts.append((p, "founded", _zipf_pick(rng, orgs)))
    for o in orgs:
        facts.append((o, "located_in", _zipf_pick(rng, places)))
        if rng.random() < 0.3:
            facts.append((o, "partner_of", _zipf_pick(rng, orgs)))

    # ground truth requires every surface form to denote exactly one
    # entity (typo variants could in principle collide across entities)
    owner: dict[str, str] = {}
    for e in ents:
        for v in e.variants:
            if owner.setdefault(v, e.eid) != e.eid:
                raise AssertionError(f"surface collision: {v!r}")

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    pages: list[tuple] = []
    mention_triples: set = set()
    surface_entity: dict[str, str] = {}
    labels: set = set()

    for i in range(n_pages):
        k = rng.randint(*facts_per_page)
        lines: list[str] = []
        for _ in range(k):
            s_ent, rel, o_ent = _zipf_pick(rng, facts, a=1.1)
            s_surf = rng.choice(s_ent.variants)
            o_surf = rng.choice(o_ent.variants)
            lines.append(f"{s_surf} {RELATIONS[rel]} {o_surf}.")
            s_iri, o_iri = mention_iri(s_surf), mention_iri(o_surf)
            mention_triples.add((s_iri, DOMAIN + rel, o_iri))
            surface_entity[s_surf] = s_ent.eid
            surface_entity[o_surf] = o_ent.eid
            labels.add((s_iri, s_surf))
            labels.add((o_iri, o_surf))
        if rng.random() < 0.5:
            lines.append(rng.choice(_FILLERS))
        text = "\n".join(lines)
        title = f"Report {i}"
        html = (
            _HTML_HEAD.format(title=title, page=i)
            + "".join(f"<p>{_esc(ln)}</p>" for ln in lines)
            + _HTML_FOOT
        )
        url = f"https://ex{seed}.org/page/{i}"
        lang = rng.choices(
            ["en", "es", "de", "fr", "zh"], weights=[70, 10, 8, 7, 5]
        )[0]
        pages.append((url, t0 + timedelta(seconds=i), html.encode("utf-8"), text, lang))

    return Corpus(pages, mention_triples, surface_entity, labels)


def true_canonical_map(corpus: Corpus) -> dict[str, str]:
    """surface-form IRI -> canonical IRI under TRUE clustering with
    min-IRI election (the pipeline's target output)."""
    clusters: dict[str, list[str]] = {}
    for surf, eid in corpus.surface_entity.items():
        clusters.setdefault(eid, []).append(mention_iri(surf))
    out: dict[str, str] = {}
    for iris in clusters.values():
        rep = min(iris)
        for iri in iris:
            out[iri] = rep
    return out


def true_canonical_triples(corpus: Corpus) -> set:
    cmap = true_canonical_map(corpus)
    return {
        (cmap[s], p, cmap[o]) for (s, p, o) in corpus.mention_triples
    }


def pages_dataframe(spark, corpus: Corpus):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(corpus.pages, schema)
