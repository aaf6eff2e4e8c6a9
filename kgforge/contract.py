"""Helpers for the driver contract (__spark_entry__.py).

Builds MappingSpecs over the driver-provided TPC-H-ish tables so the
contract queries exercise the REAL engine (compile → emit) rather than
ad-hoc DataFrame code, with content-derived subject IRIs (never
row-position — SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.mapping.spec import (
    RDF_TYPE,
    MappingSpec,
    Rule,
    Term,
    t_const_iri,
    t_iri,
    t_lit,
)

DOMAIN = "https://kg.example.org/d#"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_melt_spec(
    domain: str,
    pkey_column: str,
    subject_prefix: str,
    type_name: str,
    columns: list[str],
) -> MappingSpec:
    """v1-default-style melt of a keyed table: one type triple per row
    plus one literal triple per non-empty cell, with subjects minted
    from the primary key (content-derived, scale-safe)."""
    subj = t_iri(domain + subject_prefix, "pkey", None)
    rules = [
        Rule(
            rule_id="row_type",
            column=pkey_column,
            guard="always",
            templates=((subj, t_const_iri(RDF_TYPE), t_const_iri(domain + type_name)),),
        )
    ]
    for c in columns:
        rules.append(
            Rule(
                rule_id=f"melt_{c}",
                column=c,
                guard="nonblank",
                templates=((subj, t_const_iri(domain + c), t_lit("raw", dt="")),),
            )
        )
    return MappingSpec(
        profile="v1_default",  # same emission shape, content-keyed subjects
        domain=domain,
        rules=tuple(rules),
        pkey_column=pkey_column,
        needs_rowindex=False,
        source_name=f"melt:{type_name}",
    )


def stringify(df: DataFrame, columns: list[str]) -> DataFrame:
    """Cast the given columns to string (the mapping engine's cell
    model); other columns pass through."""
    return df.select(
        *[
            F.col(c).cast("string").alias(c) if c in columns else F.col(c)
            for c in df.columns
        ]
    )
