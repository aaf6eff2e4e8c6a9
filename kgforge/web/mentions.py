"""Mention detection + triple extraction over extracted text.

This is the web generalization of the reference's "cell value → rule →
triples" dataflow (SURVEY.md §0): a *detected mention* plays the role
of a cell value, a *relation template* plays the role of a grammar
rule, and the emitted triple set carries provenance (url, warc_ts).

Implementation is fully JVM-columnar: split text into lines, explode,
run one anchored regexp per relation template, build the triple
structs, explode, dedup. No Python UDFs — at 10^12 documents the
regexp runs inside whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgforge.mapping.spec import RDFS_LABEL
from kgforge.triples.emit import sanitize_expr
from kgforge.web.corpus import DOMAIN, RELATIONS


def _mention_iri_expr(surface: Column) -> Column:
    return F.concat(F.lit(DOMAIN + "m_"), sanitize_expr(surface, "v5"))


def relation_pattern(phrase: str) -> str:
    """Anchored sentence template: '<subj> <phrase> <obj>.'"""
    import re as _re

    return rf"^(.+?) {_re.escape(phrase)} (.+?)\.$"


def extract_mention_triples(
    pages: DataFrame,
    text_col: str = "text",
    with_labels: bool = True,
    dedup: bool = True,
) -> DataFrame:
    """web_pages → (subj, pred, obj, obj_dt, prov_url, warc_ts).

    Label triples (rdfs:label raw-surface provenance, reference v5 G14)
    ride along so canonicalization can elect readable representatives.
    """
    lines = pages.select(
        F.col("url").alias("prov_url"),
        F.col("warc_ts"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )

    def _mk(s, p, o, dt):
        return F.struct(
            s.alias("subj"), p.alias("pred"), o.alias("obj"), dt.alias("obj_dt")
        )

    # one branch per relation: a cheap substring prefilter (no regex)
    # gates the anchored regexp, so each line pays ~R contains-checks
    # plus at most one regex parse — vs R regex parses per line when
    # every relation's extract runs unconditionally (~3× less regex
    # work, the hot cost at 10^12 lines). Branches are narrow unions:
    # no extra shuffle.
    branches = []
    for rel, phrase in RELATIONS.items():
        pat = relation_pattern(phrase)
        matched = lines.filter(F.col("line").contains(f" {phrase} "))
        s_surf = F.regexp_extract(F.col("line"), pat, 1)
        o_surf = F.regexp_extract(F.col("line"), pat, 2)
        parsed = matched.select(
            "prov_url",
            "warc_ts",
            s_surf.alias("s_surf"),
            o_surf.alias("o_surf"),
        ).filter((F.col("s_surf") != "") & (F.col("o_surf") != ""))
        s_iri = _mention_iri_expr(F.col("s_surf"))
        o_iri = _mention_iri_expr(F.col("o_surf"))
        null_dt = F.lit(None).cast("string")
        structs = [_mk(s_iri, F.lit(DOMAIN + rel), o_iri, null_dt)]
        if with_labels:
            structs.append(_mk(s_iri, F.lit(RDFS_LABEL), F.col("s_surf"), F.lit("")))
            structs.append(_mk(o_iri, F.lit(RDFS_LABEL), F.col("o_surf"), F.lit("")))
        branches.append(
            parsed.select(
                F.explode(F.array(*structs)).alias("t"), "prov_url", "warc_ts"
            )
        )

    unioned = branches[0]
    for b in branches[1:]:
        unioned = unioned.union(b)
    out = unioned.select(
        "t.subj", "t.pred", "t.obj", "t.obj_dt", "prov_url", "warc_ts"
    )
    if dedup:
        out = out.groupBy("subj", "pred", "obj", "obj_dt").agg(
            F.min("prov_url").alias("prov_url"),
            F.min("warc_ts").alias("warc_ts"),
        )
    return out
