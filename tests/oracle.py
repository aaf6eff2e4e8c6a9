"""Reference-semantics oracle (pure Python, no Spark, no rdflib).

Reimplements the exact emission behavior of orey/csv2rdf's five
generations as surveyed in SURVEY.md §2, producing the SET of
(subj, pred, obj, obj_dt) tuples an rdflib Graph would hold:
  obj_dt None -> IRI object; '' -> plain literal; else datatype IRI.

Set equality ≡ graph isomorphism here because the converter never emits
blank nodes (csv2rdf/README.md:43). rdflib is not installed in this
sandbox; when available, tests add an isomorphism cross-check.

This module deliberately does NOT reuse kgforge's MappingSpec — it
follows the reference's row-at-a-time control flow so that engine bugs
cannot hide in shared code.
"""

from __future__ import annotations

import configparser

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF_NS + "type"
RDF_PROPERTY = RDF_NS + "Property"
RDFS_CLASS = RDFS_NS + "Class"
RDFS_LABEL = RDFS_NS + "label"
RDFS_COMMENT = RDFS_NS + "comment"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"
RDFS_SUBCLASSOF = RDFS_NS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS_NS + "subPropertyOf"
RDFS_RESOURCE = RDFS_NS + "Resource"
RDFS_LITERAL = RDFS_NS + "Literal"

XSD_TYPES = {
    "string": XSD_NS + "string",
    "integer": XSD_NS + "integer",
    "float": XSD_NS + "float",
    "date": XSD_NS + "date",
}

Triple = tuple[str, str, str, str | None]

CHARSETS = {
    "v1": set(" -"),
    "v2": set(" -/(),\"'"),
    "v4": set(" -/\\(),\"'<>|{}^"),
    "v5": set(" -/\\(),\"'<>|{}^#$*.`+=%"),
}


def fp(s: str, version: str) -> str:
    cs = CHARSETS[version]
    return "".join("_" if c in cs else c for c in s)


def _slice_bounds(spec: str) -> tuple[int, int]:
    lo_s, hi_s = spec.split(":")
    return (int(lo_s) if lo_s != "" else 0, int(hi_s) if hi_s != "" else 0)


# ---------------------------------------------------------------- v1 default
def v1_default(
    rows: list[list[str]], domain: str, mytype: str, prefix: str
) -> set[Triple]:
    """csv2rdf/csv2rdf.py:90-132 — header melt + row-index subjects."""
    out: set[Triple] = set()
    predicates = [domain + fp(h, "v1") for h in rows[0]]
    for i, row in enumerate(rows):
        if i == 0:
            continue
        subject = domain + prefix + str(i)
        out.add((subject, RDF_TYPE, domain + mytype, None))
        for n, elem in enumerate(row):
            if elem != "":
                out.add((subject, predicates[n], elem, ""))
    return out


# --------------------------------------------------------------- v1 semantic
FORGET = ("NONE", "-", "")


def v1_semantic(
    grammar_rows: list[tuple[str, str]], rows: list[list[str]], domain: str
) -> set[Triple]:
    """csv2rdf/csv2rdf.py:176-269 — positional grammar, A_ namespace."""
    out: set[Triple] = set()
    subj1 = None  # (index, type)
    literals: dict[int, str] = {}  # index -> colname
    subject2: dict[int, tuple[str, str, str]] = {}  # index -> (stype, dir, name)
    for i, (cname, value) in enumerate(grammar_rows):
        if value == "ignore":
            continue
        parts = value.split("|")
        if parts[0] == "subject1":
            subj1 = (i, parts[1])
        elif parts[0] == "subject2":
            name = parts[3] if len(parts) == 4 and parts[3] != "" else fp(cname, "v1")
            subject2[i] = (parts[1], parts[2], name)
        elif parts[0] == "literal":
            literals[i] = cname
    assert subj1 is not None
    a = domain + "A_"
    for i, row in enumerate(rows):
        if i == 0:
            continue
        subj = a + row[subj1[0]]
        out.add((subj, RDF_TYPE, a + subj1[1], None))
        for k, cname in literals.items():
            val = row[k]
            if val in FORGET:
                continue
            out.add((subj, a + cname, val, ""))
        for k, (stype, direction, name) in subject2.items():
            val = row[k]
            if val in FORGET:
                continue
            for token in val.split(" "):
                out.add((a + token, RDF_TYPE, a + stype, None))
                if direction == "S":
                    out.add((subj, a + name, a + token, None))
                else:
                    out.add((a + token, a + name, subj, None))
    return out


# ----------------------------------------------------------------- v2/v3/v4
def _parse_ini(text: str):
    config = configparser.ConfigParser()
    config.read_string(text)
    sections, lists = {}, {}
    for elem in config.sections():
        d = {k: config[elem][k] for k in config[elem]}
        if elem.startswith("*") and elem.endswith("*"):
            lists[elem] = d
        else:
            sections[elem] = d
    return sections, lists


def _chain_v2(lst: list[str], domain: str, out: set[Triple]) -> None:
    if len(lst) < 2:
        return
    for i in range(len(lst) - 1):
        new = lst[i + 1]
        if new.upper() == "RDFS:RESOURCE":
            obj = RDFS_RESOURCE
        elif new.upper() == "RDF:PROPERTY":
            obj = RDF_PROPERTY
        elif new.upper() == "RDFS:COMMENT":
            obj = RDFS_COMMENT
        else:
            obj = domain + new
        out.add((domain + lst[i], RDF_TYPE, obj, None))


def _chain_v34(lst: list[str], domain: str, is_class: bool, out: set[Triple]) -> None:
    meta = RDFS_CLASS if is_class else RDF_PROPERTY
    rel = RDFS_SUBCLASSOF if is_class else RDFS_SUBPROPERTYOF
    for t in lst:
        out.add((domain + t, RDF_TYPE, meta, None))
    for i in range(len(lst) - 1):
        out.add((domain + lst[i], rel, domain + lst[i + 1], None))


def _alter(cell: str, cmd: str, lists, version: str) -> str:
    """Transform command on the (already parser-sanitized) cell."""
    if cmd.startswith("map("):
        args = cmd[4:-1].split(";")
        table = lists[args[1]]
        if args[0] == "all":
            key = cell.lower()
            if key in table:
                return table[key]
            if version == "v4":
                return cell if cell.strip() != "" else "STRANGE"
            if version == "v5":
                return cell
            raise LookupError(f"map miss: {cell!r}")
        lo, hi = _slice_bounds(args[0])
        key = cell[lo:hi].lower()
        if key in table:
            return table[key]
        if version == "v4":
            return key if key.strip() != "" else "STRANGE"
        if version == "v5":
            return cell
        raise LookupError(f"map miss: {key!r}")
    if cmd.startswith("extract("):
        lo, hi = _slice_bounds(cmd[8:-1])
        return cell[lo:hi]
    if cmd.startswith("prefix("):
        affix = cmd[7:-1]
        return cell + affix if version == "v5" else affix + cell
    raise ValueError(f"unknown command {cmd!r}")


def v234(
    version: str, ini_text: str, rows: list[list[str]], domain: str
) -> set[Triple]:
    """csv2rdf-v2/-v3/-v4 semantic parser over header-bound sections."""
    charset = "v2" if version in ("v2", "v3") else "v4"
    sections, lists = _parse_ini(ini_text)
    out: set[Triple] = set()
    header = rows[0]

    pkey_colname = None
    pkeytype = None
    for name, d in sections.items():
        if d.get("cell") == "pkey":
            pkey_colname = name
            pkeytype = d["celltypes"].split(",")[0]
    assert pkey_colname is not None
    pkeyindex = -1
    for i, h in enumerate(header):
        if h == pkey_colname:
            pkeyindex = i

    for rowi, row in enumerate(rows):
        if rowi == 0:
            continue
        for j, rawcell in enumerate(row):
            cell = fp(rawcell, charset)
            if cell == "":
                continue
            pkey = fp(row[pkeyindex], charset)
            colname = fp(header[j], charset)
            if colname == "":
                continue
            matched = [
                (sn, sd) for sn, sd in sections.items() if sn.startswith(colname)
            ]
            if any(sd.get("cell") == "ignore" for _, sd in matched):
                continue
            for sname, sd in matched:
                _v234_cell(version, charset, domain, cell, pkey, pkeytype, sd, lists, out)
    return out


def _v234_cell(version, charset, domain, cell, pkey, pkeytype, sd, lists, out):
    if sd["cell"] == "pkey":
        celltypes = sd["celltypes"].split(",")
        out.add(
            (
                domain + fp(cell, charset),
                RDF_TYPE,
                domain + fp(celltypes[0], charset),
                None,
            )
        )
        if version == "v2":
            _chain_v2(celltypes, domain, out)
        else:
            _chain_v34(celltypes, domain, True, out)
        return
    if sd["celltypes"] == "string":
        out.add((domain + pkey, RDFS_COMMENT, cell, ""))
        return

    cellgrammar = sd["cell"].split(",")
    celltypes = sd["celltypes"].split(",")
    coltypes = sd["columntypes"].split(",")
    role = cellgrammar[0]
    has_cmd = len(cellgrammar) != 1
    newcell = _alter(cell, cellgrammar[1], lists, version) if has_cmd else cell

    if version == "v2":
        if has_cmd:
            out.add(
                (
                    domain + fp(newcell, charset),
                    RDF_TYPE,
                    domain + fp(celltypes[0], charset),
                    None,
                )
            )
        else:
            out.add((domain + cell, RDF_TYPE, domain + celltypes[0], None))
        s = domain + fp(newcell, charset)
        p = domain + fp(coltypes[0], charset)
        o = domain + fp(pkey, charset)
        if role == "subject":
            out.add((s, p, o, None))
        elif role == "object":
            out.add((o, p, s, None))
        else:
            raise ValueError(f"role {role!r} unsupported")
        _chain_v2(celltypes, domain, out)
        _chain_v2(coltypes, domain, out)
    else:
        rdfcell = domain + fp(newcell, charset)
        rdfcelltype = domain + fp(celltypes[0], charset)
        rdfcoltype = domain + fp(coltypes[0], charset)
        rdfpkey = domain + fp(pkey, charset)
        rdfpkeytype = domain + fp(pkeytype, charset)
        out.add((rdfcell, RDF_TYPE, rdfcelltype, None))
        if role == "subject":
            out.add((rdfcell, rdfcoltype, rdfpkey, None))
            out.add((rdfcoltype, RDFS_DOMAIN, rdfcelltype, None))
            out.add((rdfcoltype, RDFS_RANGE, rdfpkeytype, None))
        elif role == "object":
            out.add((rdfpkey, rdfcoltype, rdfcell, None))
            out.add((rdfcoltype, RDFS_DOMAIN, rdfpkeytype, None))
            out.add((rdfcoltype, RDFS_RANGE, rdfcelltype, None))
        else:
            raise ValueError(f"role {role!r} unsupported")
        _chain_v34(celltypes, domain, True, out)
        _chain_v34(coltypes, domain, False, out)


# ------------------------------------------------------------------------ v5
def v5(ini_text: str, rows: list[list[str]], domain: str) -> set[Triple]:
    """csv2rdf-v5 semantic parser (csv2rdf-v5.py:432-499)."""
    sections, lists = _parse_ini(ini_text)
    out: set[Triple] = set()
    header = rows[0]

    def f5(s: str) -> str:
        return fp(s, "v5")

    # bind sections to header indexes (strip $n; exact match; fail fast)
    bound: list[tuple[str, dict, int]] = []
    pkeyindex = -1
    pkeytype = None
    for sname, sd in sections.items():
        if sd.get("cellrole") == "ignore":
            continue
        base = sname.split("$")[0] if len(sname) >= 2 and sname[-2] == "$" else sname
        if base not in header:
            raise ValueError(f"section {sname!r} not in header")
        idx = header.index(base)
        bound.append((sname, sd, idx))
        if sd["cellrole"] == "pkey":
            pkeyindex = idx
            pkeytype = sd["celltype"]
    assert pkeyindex >= 0 and pkeytype is not None

    for rowi, row in enumerate(rows):
        if rowi == 0:
            continue
        pkeyvalue = row[pkeyindex]
        for sname, sd, idx in bound:
            cellvalue = row[idx]
            if cellvalue.strip() == "":
                continue
            cellrole = sd["cellrole"]
            if cellrole == "pkey":
                cv = domain + f5(cellvalue)
                ct = domain + f5(sd["celltype"])
                out.add((cv, RDFS_LABEL, cellvalue, ""))
                out.add((ct, RDFS_LABEL, sd["celltype"], ""))
                out.add((cv, RDF_TYPE, ct, None))
                continue
            celltype = sd["celltype"]
            if celltype in XSD_TYPES:
                ctu = domain + f5(sd["columntype"])
                pku = domain + f5(pkeyvalue)
                pkt = domain + f5(pkeytype)
                out.add((ctu, RDFS_LABEL, sd["columntype"], ""))
                out.add((pku, ctu, cellvalue, XSD_TYPES[celltype]))
                out.add((ctu, RDFS_DOMAIN, pkt, None))
                out.add((ctu, RDFS_RANGE, RDFS_LITERAL, None))
                continue
            # URIColumn
            cellgrammar = cellrole.split(",")
            new = (
                _alter(cellvalue, cellgrammar[1], lists, "v5")
                if len(cellgrammar) != 1
                else cellvalue
            )
            cvu = domain + f5(new)
            ctu = domain + f5(celltype)
            cou = domain + f5(sd["columntype"])
            pku = domain + f5(pkeyvalue)
            pkt = domain + f5(pkeytype)
            out.add((cvu, RDFS_LABEL, new, ""))
            out.add((ctu, RDFS_LABEL, celltype, ""))
            out.add((cou, RDFS_LABEL, sd["columntype"], ""))
            out.add((cvu, RDF_TYPE, ctu, None))
            if cellrole == "subject":  # full-string comparison (v5 quirk)
                out.add((cvu, cou, pku, None))
                out.add((cou, RDFS_DOMAIN, ctu, None))
                out.add((cou, RDFS_RANGE, pkt, None))
            else:
                out.add((pku, cou, cvu, None))
                out.add((cou, RDFS_DOMAIN, pkt, None))
                out.add((cou, RDFS_RANGE, ctu, None))
    return out


def v5_ontology_requirements(ini_text: str, rows: list[list[str]], domain: str) -> list[str]:
    """Order-preserving distinct requirement strings (csv2rdf-v5.py:73-87),
    collected in the same visit order as the row loop."""
    sections, lists = _parse_ini(ini_text)
    header = rows[0]

    def f5(s: str) -> str:
        return fp(s, "v5")

    bound = []
    for sname, sd in sections.items():
        if sd.get("cellrole") == "ignore":
            continue
        base = sname.split("$")[0] if len(sname) >= 2 and sname[-2] == "$" else sname
        bound.append((sname, sd, header.index(base)))

    out: list[str] = []

    def add(*args: str) -> None:
        for s in args:
            if s not in out:
                out.append(s)

    for rowi, row in enumerate(rows):
        if rowi == 0:
            continue
        for sname, sd, idx in bound:
            if row[idx].strip() == "":
                continue
            role = sd["cellrole"]
            if role == "pkey":
                add(f"Cell type: <{domain + f5(sd['celltype'])}>")
            elif sd["celltype"] in XSD_TYPES:
                add(f"Column type: <{domain + f5(sd['columntype'])}>")
            else:
                add(
                    f"Cell type: <{domain + f5(sd['celltype'])}>",
                    f"Column type: <{domain + f5(sd['columntype'])}>",
                )
    return out
