"""Compile the v1 mapping languages → MappingSpec.

Two modes of the original converter (/root/reference/csv2rdf/csv2rdf.py):

* default mode (no grammar): every row gets a type triple on a
  row-index-minted subject, every non-empty cell melts to a literal
  triple under a sanitized-header predicate (csv2rdf.py:90-132).
* semantic mode: a positional 2-field CSV grammar
  (`colname;role|type|direction|name`) with roles subject1/subject2/
  literal/ignore; grammar line i binds to CSV column i
  (csv2rdf.py:184-266 — rules are keyed by grammar row index).

Behavioral points preserved exactly (SURVEY.md §2):
* v1 sanitizer charset is just ' ' and '-' (format_predicate).
* semantic subject1 IRIs use the RAW (unsanitized) cell value and the
  hardcoded 'A_' namespace infix (csv2rdf.py:231).
* subject1 type triple fires on EVERY data row, even when the subject
  cell is blank or in the FORGET set (csv2rdf.py:231-234).
* FORGET = {'NONE', '-', ''} skips other rules (csv2rdf.py:142,241).
* subject2 cells split on ' '; each token is typed and linked with
  direction S (subj1 → token) or R (token → subj1) (csv2rdf.py:251-266).
* subject2 link predicate name defaults to the sanitized column name
  when the 4th grammar field is absent (csv2rdf.py:170-174).
"""

from __future__ import annotations

import csv
import io

from kgforge.mapping.spec import (
    RDF_TYPE,
    MappingSpec,
    Rule,
    Term,
    sanitize_py,
    t_const_iri,
    t_iri,
    t_lit,
)

V1 = "v1"
FORGET = ("NONE", "-", "")


def compile_v1_default(
    domain: str,
    type_name: str,
    predicate_prefix: str,
    columns: list[str],
    source_name: str = "source",
) -> MappingSpec:
    """Default (grammar-less) mode: header melt + row typing."""
    subj = Term(kind="rowindex_iri", value=domain + predicate_prefix)
    rules: list[Rule] = [
        Rule(
            rule_id="row_type",
            column=None,
            guard="always",
            templates=(
                (subj, t_const_iri(RDF_TYPE), t_const_iri(domain + type_name)),
            ),
        )
    ]
    for i, col in enumerate(columns):
        pred = t_const_iri(domain + sanitize_py(col, V1))
        rules.append(
            Rule(
                rule_id=f"melt_{i}",
                column=col,
                guard="nonblank",
                templates=((subj, pred, t_lit("raw", dt="")),),
            )
        )
    return MappingSpec(
        profile="v1_default",
        domain=domain,
        rules=tuple(rules),
        needs_rowindex=True,
        source_name=source_name,
    )


def parse_v1_grammar(text: str, delimiter: str = ";") -> list[tuple[str, str]]:
    """Grammar CSV → ordered [(colname, rule_string)] by line position."""
    rows = list(csv.reader(io.StringIO(text), delimiter=delimiter))
    out: list[tuple[str, str]] = []
    for i, row in enumerate(rows):
        if len(row) != 2:
            raise ValueError(f"grammar row #{i + 1} must have 2 fields: {row}")
        out.append((row[0], row[1]))
    return out


def compile_v1_semantic(
    domain: str,
    grammar_rows: list[tuple[str, str]],
    columns: list[str],
    source_name: str = "source",
) -> MappingSpec:
    """Semantic mode. `grammar_rows[i]` binds to `columns[i]` (positional,
    csv2rdf.py:201,205,212,239); extra grammar rows beyond the data's
    width are invalid, extra data columns are untouched."""
    a = domain + "A_"
    subj1_col: str | None = None
    subj1_type: str | None = None
    rules: list[Rule] = []

    for i, (cname, rule_str) in enumerate(grammar_rows):
        if rule_str == "ignore":
            continue
        if i >= len(columns):
            raise ValueError(
                f"grammar row #{i + 1} ({cname!r}) has no matching data column"
            )
        col = columns[i]
        parts = rule_str.split("|")
        role = parts[0]
        if role == "subject1":
            if len(parts) != 2:
                raise ValueError(f"bad subject1 grammar: {rule_str!r}")
            subj1_col = col
            subj1_type = parts[1]
        elif role == "subject2":
            if len(parts) not in (3, 4):
                raise ValueError(f"bad subject2 grammar: {rule_str!r}")
            stype, direction = parts[1], parts[2]
            # empty/absent 4th field falls back to the sanitized column
            # name (csv2rdf.py:170-174)
            name = parts[3] if len(parts) == 4 and parts[3] != "" else sanitize_py(
                cname, V1
            )
            token_iri = t_iri(a, "token", None)
            link_pred = t_const_iri(a + name)
            subj1_iri = t_iri(a, "pkey", None)
            if direction == "S":
                link = (subj1_iri, link_pred, token_iri)
            elif direction == "R":
                link = (token_iri, link_pred, subj1_iri)
            else:
                raise ValueError(f"bad subject2 direction {direction!r}")
            rules.append(
                Rule(
                    rule_id=f"subject2_{i}",
                    column=col,
                    guard="forget",
                    split_tokens=True,
                    templates=(
                        (token_iri, t_const_iri(RDF_TYPE), t_const_iri(a + stype)),
                        link,
                    ),
                )
            )
        elif role == "literal":
            rules.append(
                Rule(
                    rule_id=f"literal_{i}",
                    column=col,
                    guard="forget",
                    templates=(
                        (t_iri(a, "pkey", None), t_const_iri(a + cname), t_lit("raw")),
                    ),
                )
            )
        else:
            raise ValueError(f"grammar role not recognized: {rule_str!r}")

    if subj1_col is None or subj1_type is None:
        raise ValueError("v1 semantic grammar requires a subject1 rule")

    # subject1 typing fires unconditionally per row (csv2rdf.py:231-234)
    rules.insert(
        0,
        Rule(
            rule_id="subject1_type",
            column=subj1_col,
            guard="always",
            templates=(
                (
                    t_iri(a, "raw", None),
                    t_const_iri(RDF_TYPE),
                    t_const_iri(a + subj1_type),
                ),
            ),
        ),
    )
    return MappingSpec(
        profile="v1_semantic",
        domain=domain,
        rules=tuple(rules),
        pkey_column=subj1_col,
        source_name=source_name,
    )
