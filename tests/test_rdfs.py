"""RDFS closure: transitive hierarchy + type/property inheritance
(the consumption semantics of csv2rdf-v4/jena/requests.sparql)."""

from __future__ import annotations

from kgforge.rdfs import (
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    rdfs_closure,
    transitive_closure,
)


def _triples_df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_dt string"
    )


def tset(df):
    return {(r.subj, r.pred, r.obj, r.obj_dt) for r in df.collect()}


def test_transitive_closure_chain_and_cycle(spark):
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D"), ("X", "Y"), ("Y", "X")],
        "src string, dst string",
    )
    got = {(r.src, r.dst) for r in transitive_closure(edges).collect()}
    assert got == {
        ("A", "B"), ("A", "C"), ("A", "D"),
        ("B", "C"), ("B", "D"), ("C", "D"),
        ("X", "Y"), ("Y", "X"),  # cycle closes without self-loops
    }


def test_rdfs_closure_type_and_property_inheritance(spark):
    rows = [
        ("c:A", RDFS_SUBCLASSOF, "c:B", None),
        ("c:B", RDFS_SUBCLASSOF, "c:C", None),
        ("p:p", RDFS_SUBPROPERTYOF, "p:q", None),
        ("p:q", RDFS_SUBPROPERTYOF, "p:r", None),
        ("e:x", RDF_TYPE, "c:A", None),
        ("e:x", "p:p", "42", "http://www.w3.org/2001/XMLSchema#int"),
        ("e:x", "p:p", "e:y", None),
    ]
    out = tset(rdfs_closure(_triples_df(spark, rows)))

    # transitive schema edge materialized
    assert ("c:A", RDFS_SUBCLASSOF, "c:C", None) in out
    assert ("p:p", RDFS_SUBPROPERTYOF, "p:r", None) in out
    # cax-sco: x typed up the closed chain
    assert ("e:x", RDF_TYPE, "c:B", None) in out
    assert ("e:x", RDF_TYPE, "c:C", None) in out
    # prp-spo1: literal rides with its datatype; IRI object stays IRI
    assert ("e:x", "p:q", "42", "http://www.w3.org/2001/XMLSchema#int") in out
    assert ("e:x", "p:r", "42", "http://www.w3.org/2001/XMLSchema#int") in out
    assert ("e:x", "p:q", "e:y", None) in out
    # input preserved
    assert set(rows) <= out

    inferred_only = tset(rdfs_closure(_triples_df(spark, rows), include_input=False))
    assert ("e:x", RDF_TYPE, "c:A", None) not in inferred_only
    assert ("e:x", RDF_TYPE, "c:C", None) in inferred_only
