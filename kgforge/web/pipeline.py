"""End-to-end web KG pipeline (the north rule's four stages).

    web_pages ──extract──▶ text ──mentions──▶ mention triples
        │                                        │
        └── (html pruned immediately)            ├─ distinct surfaces ──link──▶ sameAs
                                                 │                                │
                                                 └──────── rewrite ◀── CC min-IRI ┘
                                                              │
                                                   bucketed triple table

Stage boundaries are materialization points (lineage + resume, see
kgforge.lineage). Shuffle inventory at scale:
  1. mention-triple dedup (groupBy full triple, partial-agg first)
  2. LSH self-join on distinct surfaces (small input by construction)
  3. CC iterations (edge list is cluster-sized, tiny vs corpus)
  4. canonical-map joins + final dedup
Everything else is narrow. html never crosses a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.mapping.spec import RDFS_LABEL
from kgforge.web.canon import canonical_map, rewrite_triples
from kgforge.web.extract import extract_text
from kgforge.web.linking import link_surfaces
from kgforge.web.mentions import extract_mention_triples


def surfaces_of(mention_triples: DataFrame) -> DataFrame:
    """Distinct (iri, surface) pairs from the label triples."""
    return (
        mention_triples.filter(F.col("pred") == RDFS_LABEL)
        .select(F.col("subj").alias("iri"), F.col("obj").alias("surface"))
        .distinct()
    )


def run_pipeline(
    pages: DataFrame,
    text_from_html: bool = True,
    link_threshold: float = 0.78,
    scorer: str = "set",
    persist_intermediate: bool = False,
    profile=None,
) -> dict[str, DataFrame]:
    """Returns every stage output keyed by name (callers materialize
    via kgforge.lineage.run_stage for resumability).

    persist_intermediate=True caches mention_triples and surfaces,
    which the downstream stages consume 2-4× each — right when the
    caller materializes everything in one session (benchmarks, the
    contract query); leave False when stages are checkpointed to
    storage anyway (the scaling/lineage path persists externally).

    `profile` (kgforge.profile.ScaleProfile) arms the linking-stage
    guards; hand its salt_partitions to materialize_triples for the
    write stage."""
    if text_from_html:
        extracted = extract_text(pages, "html", "text_extracted")
        pages_txt = extracted.select(
            "url", "warc_ts", F.col("text_extracted").alias("text"), "lang"
        )
    else:
        pages_txt = pages.select("url", "warc_ts", "text", "lang")

    mention_triples = extract_mention_triples(pages_txt, text_col="text")
    if persist_intermediate:
        mention_triples = mention_triples.persist()

    surfaces = surfaces_of(mention_triples)
    if persist_intermediate:
        surfaces = surfaces.persist()
    same_as = link_surfaces(
        surfaces.select(F.col("surface")),
        threshold=link_threshold,
        scorer=scorer,
        profile=profile,
    )
    # sameAs edges between surface IRIs (join back surface → iri)
    s1 = surfaces.select(F.col("surface").alias("a"), F.col("iri").alias("iri_a"))
    s2 = surfaces.select(F.col("surface").alias("b"), F.col("iri").alias("iri_b"))
    edges = (
        same_as.join(s1, "a").join(s2, "b").select(
            F.col("iri_a").alias("a"), F.col("iri_b").alias("b"), "score"
        )
    )

    all_nodes = surfaces.select(F.col("iri").alias("node"))
    cmap = canonical_map(edges, all_nodes)
    canonical = rewrite_triples(mention_triples, cmap)

    return {
        "pages_text": pages_txt,
        "mention_triples": mention_triples,
        "surfaces": surfaces,
        "same_as": edges,
        "canonical_map": cmap,
        "canonical_triples": canonical,
    }


def unpersist_intermediates(result: dict[str, DataFrame]) -> None:
    """Release the caches a persist_intermediate=True run holds.

    Call after the consuming stages are materialized — a long-lived
    session that runs the pipeline repeatedly otherwise accumulates
    cached mention/surface blocks (the same leak class the linking
    feature cache had in round 1)."""
    for key in ("mention_triples", "surfaces"):
        df = result.get(key)
        if df is not None and df.is_cached:
            df.unpersist()
