"""Compile the INI grammar generations (v2..v5) → MappingSpec.

References (all under /root/reference/, studied for behavior only):
  v2  csv2rdf-v2/csv2rdf-v2.py   (roles cell/column, type chains via
                                  rdf:type, transforms, interactive
                                  halt on map miss)
  v3  csv2rdf-v3/csv2rdf-v3.py   (rdfs:Class/Property typing +
                                  subClassOf/subPropertyOf chains,
                                  rdfs:domain/range, column ≡ predicate)
  v4  csv2rdf-v4/csv2rdf-v4.py   (wider sanitizer charset, non-fatal
                                  map fallback, `column` key dropped)
  v5  csv2rdf-v5/csv2rdf-v5.py   (class-per-rule factory, typed XSD
                                  literals, rdfs:label provenance,
                                  ontology-requirements side output)

Faithful behavioral quirks preserved:
* v2..v4 sanitize every cell (and the pkey) at the parser level BEFORE
  transforms (csv2rdf-v2.py:510,516) → Rule.pre_sanitize.
* v2..v4 bind sections to columns by sanitized-header prefix match;
  an `ignore` section anywhere in the match set vetoes the whole
  column (csv2rdf-v2.py:446-462).
* v2 simple-case typing triple does NOT sanitize celltypes[0]
  (csv2rdf-v2.py:281-283) while the command path does (:359-361).
* v2..v4: a missing pkey header silently binds to the LAST column
  (pkeyindex stays -1 → row[-1]).
* v5 binds sections to headers by exact match after stripping a `$n`
  suffix and fails fast on a miss (csv2rdf-v5.py:456-477).
* v5 role dispatch compares the FULL cellrole string against
  'subject' (csv2rdf-v5.py:311), so 'subject,map(...)' falls into the
  object branch — reproduced as-is.
* v5 `prefix(p)` actually appends (cell + p, csv2rdf-v5.py:280-282).
* type chains/class-typing/labels are emitted per firing cell in the
  reference and collapse in the rdflib set; here they are constant
  templates inside the rule (same guard), collapsed by dedup.
"""

from __future__ import annotations

import configparser

from kgforge.mapping.spec import (
    RDF_PROPERTY,
    RDF_TYPE,
    RDFS_CLASS,
    RDFS_COMMENT,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_LITERAL,
    RDFS_RANGE,
    RDFS_RESOURCE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    XSD_TYPES,
    MappingSpec,
    Rule,
    Template,
    Transform,
    sanitize_py,
    t_const_iri,
    t_const_lit,
    t_iri,
    t_lit,
)

MISS_POLICY = {
    "v2": ("error", "error"),
    "v3": ("error", "error"),
    "v4": ("keep_or_strange", "keep_slice_or_strange"),
    "v5": ("keep", "keep"),
}


def parse_ini(text: str) -> tuple[dict[str, dict[str, str]], dict[str, dict[str, str]]]:
    """INI → (sections, lists) in file order; list sections are the
    `[*name*]` lookup tables (keys configparser-lowercased)."""
    config = configparser.ConfigParser()
    config.read_string(text)
    sections: dict[str, dict[str, str]] = {}
    lists: dict[str, dict[str, str]] = {}
    for elem in config.sections():
        d = {k: config[elem][k] for k in config[elem]}
        if elem.startswith("*") and elem.endswith("*"):
            lists[elem] = d
        else:
            sections[elem] = d
    return sections, lists


def parse_command(
    cell_value: str, lists: dict[str, dict[str, str]], version: str
) -> tuple[str, Transform]:
    """'role[,command]' → (role, Transform). Mirrors the transform
    pre-parsing of URIColumn.__init__ (csv2rdf-v5.py:227-256)."""
    parts = cell_value.split(",")
    role = parts[0]
    if len(parts) == 1:
        return role, Transform()
    cmd = parts[1]
    miss_all, miss_part = MISS_POLICY[version]
    if cmd.startswith("map("):
        args = cmd[4:-1].split(";")
        table = tuple(sorted(lists[args[1]].items()))
        if args[0] == "all":
            return role, Transform(kind="map_all", table=table, miss=miss_all)
        lo_s, hi_s = args[0].split(":")
        return role, Transform(
            kind="map_part",
            table=table,
            lo=int(lo_s) if lo_s != "" else 0,
            hi=int(hi_s) if hi_s != "" else 0,
            miss=miss_part,
        )
    if cmd.startswith("extract("):
        lo_s, hi_s = cmd[8:-1].split(":")
        return role, Transform(
            kind="extract",
            lo=int(lo_s) if lo_s != "" else 0,
            hi=int(hi_s) if hi_s != "" else 0,
        )
    if cmd.startswith("prefix("):
        affix = cmd[7:-1]
        # v5 appends, v2..v4 prepend (SURVEY.md T3)
        return role, Transform(
            kind="suffix" if version == "v5" else "prefix", affix=affix
        )
    raise ValueError(f"unknown cell command {cmd!r}")


# --------------------------------------------------------------------------
# v2/v3/v4 — the `cell/celltypes[/column]/columntypes` generation
# --------------------------------------------------------------------------


def _chain_v2(domain: str, lst: list[str]) -> list[Template]:
    """v2 generate_type_triples (csv2rdf-v2.py:210-232): pairwise
    rdf:type with RDFS:RESOURCE/RDF:PROPERTY/RDFS:COMMENT specials;
    type names NOT sanitized."""
    out: list[Template] = []
    if len(lst) < 2:
        return out
    for i in range(len(lst) - 1):
        lower, new = lst[i], lst[i + 1]
        if new.upper() == "RDFS:RESOURCE":
            obj = RDFS_RESOURCE
        elif new.upper() == "RDF:PROPERTY":
            obj = RDF_PROPERTY
        elif new.upper() == "RDFS:COMMENT":
            obj = RDFS_COMMENT
        else:
            obj = domain + new
        out.append(
            (t_const_iri(domain + lower), t_const_iri(RDF_TYPE), t_const_iri(obj))
        )
    return out


def _chain_v34(domain: str, lst: list[str], is_class: bool) -> list[Template]:
    """v3/v4 generate_type_triples (csv2rdf-v3.py:263-281): every type
    gets rdfs:Class / rdf:Property typing + pairwise subClassOf /
    subPropertyOf; names NOT sanitized."""
    out: list[Template] = []
    meta = RDFS_CLASS if is_class else RDF_PROPERTY
    rel = RDFS_SUBCLASSOF if is_class else RDFS_SUBPROPERTYOF
    for t in lst:
        out.append((t_const_iri(domain + t), t_const_iri(RDF_TYPE), t_const_iri(meta)))
    for i in range(len(lst) - 1):
        out.append(
            (
                t_const_iri(domain + lst[i]),
                t_const_iri(rel),
                t_const_iri(domain + lst[i + 1]),
            )
        )
    return out


def compile_v234(
    version: str,
    domain: str,
    grammar_ini_text: str,
    columns: list[str],
    source_name: str = "source",
) -> MappingSpec:
    """Compile a v2/v3/v4 grammar against a concrete header."""
    assert version in ("v2", "v3", "v4")
    charset = "v2" if version in ("v2", "v3") else "v4"
    sections, lists = parse_ini(grammar_ini_text)

    pkey_section = None
    pkey_name = None
    for name, d in sections.items():
        if d.get("cell") == "pkey":
            pkey_section, pkey_name = d, name
    if pkey_section is None:
        raise ValueError("grammar has no pkey section")
    pkeytype = pkey_section["celltypes"].split(",")[0]

    # pkey binding: raw header equality; miss silently falls back to the
    # last column (reference row[-1] behavior)
    pkey_column = pkey_name if pkey_name in columns else columns[-1]

    rules: list[Rule] = []
    for ci, header in enumerate(columns):
        colname = sanitize_py(header, charset)
        if colname == "":
            continue
        matched = [
            (sname, sdict)
            for sname, sdict in sections.items()
            if sname.startswith(colname)
        ]
        if any(sd.get("cell") == "ignore" for _, sd in matched):
            continue
        for sname, sdict in matched:
            rules.extend(
                _v234_rules_for(
                    version,
                    charset,
                    domain,
                    header,
                    ci,
                    sname,
                    sdict,
                    lists,
                    pkeytype,
                )
            )

    return MappingSpec(
        profile=version,
        domain=domain,
        rules=tuple(rules),
        pkey_column=pkey_column,
        strict_map_miss=(version in ("v2", "v3")),
        source_name=source_name,
    )


def _v234_rules_for(
    version: str,
    charset: str,
    domain: str,
    header: str,
    ci: int,
    sname: str,
    sdict: dict[str, str],
    lists: dict[str, dict[str, str]],
    pkeytype: str,
) -> list[Rule]:
    rid = f"{sname}@{ci}"
    fp = lambda s: sanitize_py(s, charset)  # noqa: E731

    # pkey rule (G6)
    if sdict["cell"] == "pkey":
        celltypes = sdict["celltypes"].split(",")
        templates: list[Template] = [
            (
                t_iri(domain, "raw", charset),
                t_const_iri(RDF_TYPE),
                t_const_iri(domain + fp(celltypes[0])),
            )
        ]
        if version == "v2":
            templates += _chain_v2(domain, celltypes)
        else:
            templates += _chain_v34(domain, celltypes, is_class=True)
        return [
            Rule(
                rule_id=rid,
                column=header,
                guard="nonblank",
                pre_sanitize=charset,
                templates=tuple(templates),
            )
        ]

    # pkey-description rule (G7): celltypes == 'string'
    if sdict["celltypes"] == "string":
        return [
            Rule(
                rule_id=rid,
                column=header,
                guard="nonblank",
                pre_sanitize=charset,
                templates=(
                    (
                        t_iri(domain, "pkey", None),
                        t_const_iri(RDFS_COMMENT),
                        t_lit("raw", dt=""),
                    ),
                ),
            )
        ]

    # general case (G8/G9)
    role, transform = parse_command(sdict["cell"], lists, version)
    celltypes = sdict["celltypes"].split(",")
    coltypes = sdict["columntypes"].split(",")
    if version in ("v2", "v3"):
        colrole = sdict["column"].split(",")[0]
        if colrole != "predicate":
            raise ValueError(
                f"[{sname}] column role {colrole!r}: only 'predicate' is "
                "supported (other combos are broken/aborting in the reference)"
            )
    if role not in ("subject", "object"):
        raise ValueError(f"[{sname}] cell role {role!r} not supported")

    has_cmd = transform.kind != "none"
    cell_iri = t_iri(domain, "new", charset)
    pkey_iri = t_iri(domain, "pkey", charset)
    coltype_iri = t_const_iri(domain + fp(coltypes[0]))
    celltype_iri_s = t_const_iri(domain + fp(celltypes[0]))
    pkeytype_iri = t_const_iri(domain + fp(pkeytype))

    templates = []
    if version == "v2":
        # typing triple: simple case leaves celltypes[0] raw and uses the
        # parser-sanitized cell without re-sanitizing (csv2rdf-v2.py:281)
        if has_cmd:
            templates.append((cell_iri, t_const_iri(RDF_TYPE), celltype_iri_s))
        else:
            templates.append(
                (
                    t_iri(domain, "raw", None),
                    t_const_iri(RDF_TYPE),
                    t_const_iri(domain + celltypes[0]),
                )
            )
        if role == "subject":
            templates.append((cell_iri, coltype_iri, pkey_iri))
        else:
            templates.append((pkey_iri, coltype_iri, cell_iri))
        templates += _chain_v2(domain, celltypes)
        templates += _chain_v2(domain, coltypes)
    else:
        templates.append((cell_iri, t_const_iri(RDF_TYPE), celltype_iri_s))
        if role == "subject":
            templates.append((cell_iri, coltype_iri, pkey_iri))
            templates.append((coltype_iri, t_const_iri(RDFS_DOMAIN), celltype_iri_s))
            templates.append((coltype_iri, t_const_iri(RDFS_RANGE), pkeytype_iri))
        else:
            templates.append((pkey_iri, coltype_iri, cell_iri))
            templates.append((coltype_iri, t_const_iri(RDFS_DOMAIN), pkeytype_iri))
            templates.append((coltype_iri, t_const_iri(RDFS_RANGE), celltype_iri_s))
        templates += _chain_v34(domain, celltypes, is_class=True)
        templates += _chain_v34(domain, coltypes, is_class=False)

    return [
        Rule(
            rule_id=rid,
            column=header,
            guard="nonblank",
            pre_sanitize=charset,
            transform=transform,
            templates=tuple(templates),
        )
    ]


# --------------------------------------------------------------------------
# v5 — class-per-rule factory: PKey / LiteralColumn / URIColumn
# --------------------------------------------------------------------------


def compile_v5(
    domain: str,
    grammar_ini_text: str,
    columns: list[str],
    source_name: str = "source",
) -> MappingSpec:
    sections, lists = parse_ini(grammar_ini_text)
    fp = lambda s: sanitize_py(s, "v5")  # noqa: E731

    # locate pkey first (needed by every other rule)
    pkey_header = None
    pkeytype = None
    for sname, sdict in sections.items():
        if sdict.get("cellrole") == "pkey":
            base = sname.split("$")[0] if len(sname) >= 2 and sname[-2] == "$" else sname
            if base not in columns:
                raise ValueError(f"pkey section {sname!r} not found in header")
            pkey_header = base
            pkeytype = sdict["celltype"]
    if pkey_header is None or pkeytype is None:
        raise ValueError("v5 grammar has no pkey section")
    pkeytype_iri = t_const_iri(domain + fp(pkeytype))

    rules: list[Rule] = []
    for sname, sdict in sections.items():
        if "cellrole" not in sdict:
            raise ValueError(f"[{sname}] 'cellrole' is mandatory")
        cellrole = sdict["cellrole"]
        if cellrole == IGNORE_V5:
            continue
        base = sname.split("$")[0] if len(sname) >= 2 and sname[-2] == "$" else sname
        if base not in columns:
            # v5 fails fast on unbound grammar sections (csv2rdf-v5.py:462)
            raise ValueError(f"grammar section {sname!r} not found in CSV header")

        if cellrole == "pkey":
            celltype = sdict["celltype"]
            celltype_iri = t_const_iri(domain + fp(celltype))
            rules.append(
                Rule(
                    rule_id=f"pkey[{sname}]",
                    column=base,
                    guard="nonblank_strip",
                    templates=(
                        (t_iri(domain, "raw", "v5"), t_const_iri(RDFS_LABEL), t_lit("raw")),
                        (celltype_iri, t_const_iri(RDFS_LABEL), t_const_lit(celltype)),
                        (t_iri(domain, "raw", "v5"), t_const_iri(RDF_TYPE), celltype_iri),
                    ),
                )
            )
            continue

        if "celltype" not in sdict:
            raise ValueError(f"[{sname}] 'celltype' is mandatory")
        celltype = sdict["celltype"]

        if celltype in XSD_TYPES:
            # LiteralColumn (csv2rdf-v5.py:321-340)
            columntype = sdict["columntype"]
            coltype_iri = t_const_iri(domain + fp(columntype))
            rules.append(
                Rule(
                    rule_id=f"lit[{sname}]",
                    column=base,
                    guard="nonblank_strip",
                    templates=(
                        (coltype_iri, t_const_iri(RDFS_LABEL), t_const_lit(columntype)),
                        (
                            t_iri(domain, "pkey", "v5"),
                            coltype_iri,
                            t_lit("raw", dt=XSD_TYPES[celltype]),
                        ),
                        (coltype_iri, t_const_iri(RDFS_DOMAIN), pkeytype_iri),
                        (coltype_iri, t_const_iri(RDFS_RANGE), t_const_iri(RDFS_LITERAL)),
                    ),
                )
            )
            continue

        # URIColumn (csv2rdf-v5.py:218-318)
        role, transform = parse_command(cellrole, lists, "v5")
        columntype = sdict["columntype"]
        celltype_iri = t_const_iri(domain + fp(celltype))
        coltype_iri = t_const_iri(domain + fp(columntype))
        cell_iri = t_iri(domain, "new", "v5")
        pkey_iri = t_iri(domain, "pkey", "v5")
        templates = [
            (cell_iri, t_const_iri(RDFS_LABEL), t_lit("new")),
            (celltype_iri, t_const_iri(RDFS_LABEL), t_const_lit(celltype)),
            (coltype_iri, t_const_iri(RDFS_LABEL), t_const_lit(columntype)),
            (cell_iri, t_const_iri(RDF_TYPE), celltype_iri),
        ]
        # v5 quirk: role comparison is on the FULL cellrole string, so a
        # transformed 'subject,...' behaves as object (csv2rdf-v5.py:311)
        if cellrole == "subject":
            templates += [
                (cell_iri, coltype_iri, pkey_iri),
                (coltype_iri, t_const_iri(RDFS_DOMAIN), celltype_iri),
                (coltype_iri, t_const_iri(RDFS_RANGE), pkeytype_iri),
            ]
        else:
            templates += [
                (pkey_iri, coltype_iri, cell_iri),
                (coltype_iri, t_const_iri(RDFS_DOMAIN), pkeytype_iri),
                (coltype_iri, t_const_iri(RDFS_RANGE), celltype_iri),
            ]
        rules.append(
            Rule(
                rule_id=f"uri[{sname}]",
                column=base,
                guard="nonblank_strip",
                transform=transform,
                templates=tuple(templates),
            )
        )

    return MappingSpec(
        profile="v5",
        domain=domain,
        rules=tuple(rules),
        pkey_column=pkey_header,
        source_name=source_name,
    )


IGNORE_V5 = "ignore"


def ontology_requirements(spec: MappingSpec) -> list[str]:
    """v5 ontology-requirements side output (csv2rdf-v5.py:73-87):
    order-preserving distinct 'Cell type: <iri>' / 'Column type: <iri>'
    strings, derivable from the spec alone (S7 in SURVEY.md §2.1)."""
    if spec.profile != "v5":
        raise ValueError("ontology requirements are a v5 feature")
    out: list[str] = []

    def add(s: str) -> None:
        if s not in out:
            out.append(s)

    for rule in spec.rules:
        if rule.rule_id.startswith("pkey["):
            celltype_iri = rule.templates[2][2].value
            add(f"Cell type: <{celltype_iri}>")
        elif rule.rule_id.startswith("uri["):
            celltype_iri = rule.templates[3][2].value
            coltype_iri = rule.templates[2][0].value
            add(f"Cell type: <{celltype_iri}>")
            add(f"Column type: <{coltype_iri}>")
        elif rule.rule_id.startswith("lit["):
            coltype_iri = rule.templates[0][0].value
            add(f"Column type: <{coltype_iri}>")
    return out
