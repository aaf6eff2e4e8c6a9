"""Materialized RDFS inference over the triple table.

The reference documents downstream RDFS consumption as the intended
use of its emitted schema triples: Jena resolves subPropertyOf when
querying (csv2rdf-v4/jena/requests.sparql:9-19, version-resolution
MINUS at :22-31) against the rdfs:domain/rdfs:range/type-chain triples
the converter emits. This module materializes that inference so the
triple table is consumable WITHOUT an external reasoner:

  * transitive closure of rdfs:subClassOf / rdfs:subPropertyOf
  * type inheritance   (x rdf:type C) ∧ (C subClassOf+ D) → (x rdf:type D)
  * property inheritance (s p o) ∧ (p subPropertyOf+ q)   → (s q o)
  * rdfs2 (domain)     (p rdfs:domain C) ∧ (s p o)        → (s rdf:type C)
  * rdfs3 (range)      (p rdfs:range C) ∧ (s p o), o IRI  → (o rdf:type C)

Rule ordering is a sound single pass for this subset: prp-spo1 first
(so domain/range see inherited predicates), then rdfs2/rdfs3 over the
widened property triples, then cax-sco over base PLUS domain/range-
derived types (so derived types inherit up the closed hierarchy).
The only chains that would need a second pass are meta-schema cases
(domain/range declared ON rdf:type or the rdfs vocabulary itself),
which the reference's Jena setup never exercises.

Scale shape: the SCHEMA (hierarchy edges) is grammar-sized — thousands
of nodes at most, never corpus-sized — so the closure loop runs on a
tiny DataFrame (iterative doubling, O(log diameter) self-joins with
per-iteration localCheckpoint, same machinery as web.canon). The
DATA-side application is two broadcast joins of the closed hierarchy
against the instance triples: one shuffle-free pass at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROPERTYOF = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"

TRIPLE_FIELDS = ["subj", "pred", "obj", "obj_dt"]


def transitive_closure(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """(src, dst) edge list → all strictly-reachable pairs (src, dst).

    Iterative doubling: paths double in length per round, so a chain of
    depth d closes in ⌈log2 d⌉ rounds. Inputs are schema hierarchies
    (small by construction — see module docstring); localCheckpoint
    cuts the loop's lineage exactly like web.canon's CC iteration.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("x"),
        ).collect()[0]
        return (row.n, row.x)

    sig = _sig(e)
    if sig[0] == 0:
        # empty hierarchy (the common case: no schema triples) — the
        # loop below would still cost 2 probe jobs + a join per
        # iteration before discovering there is nothing to close
        return e
    for _ in range(max_iter):
        hop = (
            e.alias("a")
            .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        e2 = (
            e.unionByName(hop)
            .filter(F.col("src") != F.col("dst"))  # cycles close to self
            .distinct()
            .localCheckpoint()
        )
        sig2 = _sig(e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    return e


def rdfs_closure(
    triples: DataFrame,
    include_input: bool = True,
) -> DataFrame:
    """Triple table → table with RDFS-inferred triples materialized.

    Inference rules (the RDFS subset the reference's Jena RDFS
    reasoner applies to the emitted schema triples,
    csv2rdf-v4/jena/test-conf.ttl:36-47): transitive subClassOf/
    subPropertyOf, type inheritance (cax-sco), property inheritance
    (prp-spo1), and domain/range entailment (rdfs2/rdfs3) — the
    grammar compiler emits rdfs:domain/rdfs:range schema triples
    (csv2rdf-v3/csv2rdf-v3.py:386-398, csv2rdf-v5/csv2rdf-v5.py:
    321-340) that license exactly these. Output carries the core
    (subj, pred, obj, obj_dt) columns, deduped.
    """
    base = triples.select(*TRIPLE_FIELDS)

    sco = transitive_closure(
        base.filter(F.col("pred") == RDFS_SUBCLASSOF).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
    )
    spo = transitive_closure(
        base.filter(F.col("pred") == RDFS_SUBPROPERTYOF).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
    )
    null_dt = F.lit(None).cast("string")

    # closed hierarchy edges as schema triples
    sco_triples = sco.select(
        F.col("src").alias("subj"),
        F.lit(RDFS_SUBCLASSOF).alias("pred"),
        F.col("dst").alias("obj"),
        null_dt.alias("obj_dt"),
    )
    spo_triples = spo.select(
        F.col("src").alias("subj"),
        F.lit(RDFS_SUBPROPERTYOF).alias("pred"),
        F.col("dst").alias("obj"),
        null_dt.alias("obj_dt"),
    )

    # prp-spo1: property inheritance — obj/obj_dt ride along unchanged
    inherited_props = (
        base.join(broadcast(spo), F.col("pred") == F.col("src"))
        .select("subj", F.col("dst").alias("pred"), "obj", "obj_dt")
    )

    # rdfs2/rdfs3: domain/range entailment over base PLUS inherited
    # predicates (p spo q ∧ q domain C must fire on instances of p).
    # The domain/range edge sets are schema-sized — broadcast joins,
    # shuffle-free at any corpus size.
    props_all = base.unionByName(inherited_props)
    dom = base.filter(F.col("pred") == RDFS_DOMAIN).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    rng = base.filter(F.col("pred") == RDFS_RANGE).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    dom_types = props_all.join(broadcast(dom), F.col("pred") == F.col("src")).select(
        "subj",
        F.lit(RDF_TYPE).alias("pred"),
        F.col("dst").alias("obj"),
        null_dt.alias("obj_dt"),
    )
    # rdfs3 types the OBJECT node — only IRI objects (obj_dt null);
    # literals (obj_dt '' or a datatype IRI) are never typed
    rng_types = (
        props_all.filter(F.col("obj_dt").isNull())
        .join(broadcast(rng), F.col("pred") == F.col("src"))
        .select(
            F.col("obj").alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.col("dst").alias("obj"),
            null_dt.alias("obj_dt"),
        )
    )

    # cax-sco over base AND domain/range-derived types, so e.g.
    # (p domain C) ∧ (C subClassOf+ D) ∧ (s p o) yields (s type D)
    all_types = (
        base.filter(F.col("pred") == RDF_TYPE)
        .select(*TRIPLE_FIELDS)
        .unionByName(dom_types)
        .unionByName(rng_types)
    )
    inherited_types = all_types.join(
        broadcast(sco), F.col("obj") == F.col("src")
    ).select(
        "subj",
        F.lit(RDF_TYPE).alias("pred"),
        F.col("dst").alias("obj"),
        null_dt.alias("obj_dt"),
    )

    inferred = (
        sco_triples.unionByName(spo_triples)
        .unionByName(inherited_types)
        .unionByName(inherited_props)
        .unionByName(dom_types)
        .unionByName(rng_types)
    )
    out = base.unionByName(inferred) if include_input else inferred
    return out.dropDuplicates(TRIPLE_FIELDS)
