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

    Inference rules (the RDFS subset the reference's Jena setup
    exercises): transitive subClassOf/subPropertyOf, type inheritance
    (cax-sco), property inheritance (prp-spo1). Output carries the
    core (subj, pred, obj, obj_dt) columns, deduped.
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

    # cax-sco: type inheritance — broadcast the closed (tiny) hierarchy
    inherited_types = (
        base.filter(F.col("pred") == RDF_TYPE)
        .join(broadcast(sco), F.col("obj") == F.col("src"))
        .select(
            "subj",
            F.lit(RDF_TYPE).alias("pred"),
            F.col("dst").alias("obj"),
            null_dt.alias("obj_dt"),
        )
    )

    # prp-spo1: property inheritance — obj/obj_dt ride along unchanged
    inherited_props = (
        base.join(broadcast(spo), F.col("pred") == F.col("src"))
        .select("subj", F.col("dst").alias("pred"), "obj", "obj_dt")
    )

    inferred = (
        sco_triples.unionByName(spo_triples)
        .unionByName(inherited_types)
        .unionByName(inherited_props)
    )
    out = base.unionByName(inferred) if include_input else inferred
    return out.dropDuplicates(TRIPLE_FIELDS)
