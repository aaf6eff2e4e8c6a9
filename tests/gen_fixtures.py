"""Deterministic fixture generators (seed=42, no external data).

The reference repo ships grammars/configs but its data CSVs are absent
(FIXTURES.md), so every dataset here is synthesized to exercise the
surveyed behaviors: blanks, FORGET values, duplicates (rdflib
set-dedup), multi-valued cells, sanitizer charsets, slice quirks,
map-miss policies, multi-treatment sections, prefix over-matching.
"""

from __future__ import annotations

import random

# --------------------------------------------------------------- v1 fixtures
V1_DOMAIN = "https://www.example.com/rdf/design#"
V1_TYPE = "ConfigurationItem"
V1_PREFIX = "CI_"

# compact positional grammar exercising every v1 role form
V1_GRAMMAR: list[tuple[str, str]] = [
    ("WBS", "ignore"),
    ("Part number", "subject1|PN"),
    ("Father parts", "subject2|PN|R|Father_of"),
    ("CI before", "subject2|PN|S|Is_before"),
    ("Title", "literal"),
    ("Des group", "subject2|Group|R"),  # name defaults to sanitized colname
    ("Doc Type", "ignore"),
]


def v1_rows(n: int = 60, seed: int = 42) -> list[list[str]]:
    rng = random.Random(seed)
    header = [c for c, _ in V1_GRAMMAR]
    rows = [header]
    titles = [
        "Main rotor head",
        "Tail boom - assembly",
        "Gear box (upper)",
        "NONE",
        "Fuel line A-12",
        "-",
    ]
    for i in range(1, n + 1):
        pn = f"PN-{i:03d}"
        fathers = " ".join(
            f"PN-{rng.randint(1, n):03d}" for _ in range(rng.randint(0, 3))
        )
        before = f"PN-{rng.randint(1, n):03d}" if rng.random() < 0.5 else ""
        title = rng.choice(titles)
        grp = rng.choice(["GRP1", "GRP2", "GRP3", "NONE", ""])
        rows.append(["W1", pn, fathers, before, title, grp, "DRW"])
    # duplicate row (set semantics) + row with all-FORGET optionals
    rows.append(list(rows[1]))
    rows.append(["W2", "PN-999", "", "-", "NONE", "", "SPEC"])
    return rows


# ------------------------------------------------------------- INI fixtures
MIPL_DOMAIN = "https://www.example.org/rdf/mipl/"

# v2/v3/v4 grammar (cell/celltypes/column/columntypes)
GRAMMAR_V2 = """
[PNR]
cell = pkey
celltypes = pnr,part_ref,RDFS:RESOURCE

[IPPN]
cell = subject
celltypes = ippn,part_ref
column = predicate
columntypes = ippn_contains,RDF:PROPERTY

[CSN]
cell = object
celltypes = csn
column = predicate
columntypes = csn_located_in

[SRV]
cell = object,map(all;*nations*)
celltypes = nation
column = predicate
columntypes = serviced_to

[VAPMOV$1]
cell = object,map(0:1;*nationcodes*)
celltypes = nation
column = predicate
columntypes = vapmov_country

[VAPMOV$2]
cell = object,extract(1:3)
celltypes = variant
column = predicate
columntypes = vapmov_variant

[EFY$1]
cell = object,extract(-3:)
celltypes = bbl_code
column = predicate
columntypes = effectivity_bbl

[EFY$2]
cell = object,prefix(efy_)
celltypes = effectivity
column = predicate
columntypes = effectivity_raw

[ADT]
cell = object
celltypes = string
column = predicate
columntypes = part_description

[ECO]
cell = object
celltypes = eco
column = predicate
columntypes = eco_ref

[ECO links]
cell = object
celltypes = eco_link
column = predicate
columntypes = eco_linked

[TOP]
cell = ignore
celltypes = none

[*nations*]
FIF = Finland
NON = Norway
SES = Sweden
DEL = Germany

[*nationcodes*]
A = Australia
B = Belgium
F = France
S = Sweden
"""

# v5 grammar (cellrole/celltype/columntype) — same logical mapping
GRAMMAR_V5 = """
[PNR]
cellrole = pkey
celltype = pnr

[IPPN]
cellrole = subject
celltype = ippn
columntype = ippn_contains

[CSN]
cellrole = object
celltype = csn
columntype = csn_located_in

[SRV]
cellrole = object,map(all;*nations*)
celltype = nation
columntype = serviced_to

[VAPMOV$1]
cellrole = object,map(0:1;*nationcodes*)
celltype = nation
columntype = vapmov_country

[VAPMOV$2]
cellrole = object,extract(1:3)
celltype = variant
columntype = vapmov_variant

[EFY$1]
cellrole = object,extract(-3:)
celltype = bbl_code
columntype = effectivity_bbl

[EFY$2]
cellrole = object,prefix(efy_)
celltype = effectivity
columntype = effectivity_raw

[ADT]
cellrole = object
celltype = string
columntype = part_description

[ECO]
cellrole = object
celltype = eco
columntype = eco_ref

[ECO links]
cellrole = object
celltype = eco_link
columntype = eco_linked

[TOP]
cellrole = ignore

[*nations*]
FIF = Finland
NON = Norway
SES = Sweden
DEL = Germany

[*nationcodes*]
A = Australia
B = Belgium
F = France
S = Sweden
"""

MIPL_HEADER = [
    "PNR",
    "IPPN",
    "CSN",
    "SRV",
    "VAPMOV",
    "EFY",
    "ADT",
    "ECO",
    "ECO links",
    "TOP",
]


def mipl_rows(
    n: int = 80, seed: int = 42, include_map_misses: bool = False
) -> list[list[str]]:
    """Rows for both grammar dialects. With include_map_misses=False the
    data only uses mapped keys (required for strict v2/v3 runs)."""
    rng = random.Random(seed)
    rows = [list(MIPL_HEADER)]
    nations = ["FIF", "NON", "SES", "DEL"]
    if include_map_misses:
        nations += ["ZZZ"]  # unmapped → v4 keeps, v5 keeps+warns
    codes = ["A", "B", "F", "S"]
    descr = [
        "Main gear box (upper), steel",
        "Bolt/washer assy - M5",
        'Bracket "left" <rev>',
        "Pipe, 3.5% alloy",
    ]
    for i in range(1, n + 1):
        pnr = f"S000N{i:04d}"
        ippn = f"C0418E{rng.randint(1, 20):03d}" if rng.random() < 0.8 else ""
        csn = f"CSN {rng.randint(1, 9)}" if rng.random() < 0.7 else ""
        srv = rng.choice(nations) if rng.random() < 0.9 else ""
        vap = rng.choice(codes) + rng.choice(["N", "S", "T"]) + str(rng.randint(0, 9))
        efy = f"{rng.randint(1, 9)}T{rng.randint(10, 99)}"
        adt = rng.choice(descr) if rng.random() < 0.6 else ""
        eco = f"ECO-{rng.randint(1, 5)}" if rng.random() < 0.4 else ""
        ecol = f"L{rng.randint(1, 3)}" if rng.random() < 0.3 else ""
        rows.append([pnr, ippn, csn, srv, vap, efy, adt, eco, ecol, "x"])
    # duplicate row, shared pkey (fan-in), whitespace-only cell
    rows.append(list(rows[1]))
    rows.append([rows[2][0], "C0418E001", "", "FIF", "AN1", "2T34", "", "", "", "x"])
    rows.append([f"S000N9999", "", " ", "DEL", "BS2", "3T55", "", "", "", "x"])
    return rows


def reference_v1_grammar() -> list[tuple[str, str]]:
    """The actual 67-rule grammar shipped with the reference
    (read-only; it is mapping config, not code)."""
    import csv

    with open("/root/reference/csv2rdf/tests/semantics.csv", encoding="utf-8") as f:
        return [(r[0], r[1]) for r in csv.reader(f, delimiter=";")]
