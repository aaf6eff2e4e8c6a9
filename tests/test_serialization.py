"""Property-based round-trips for the RDF text sinks (S5/A5).

Hypothesis drives arbitrary literal content (quotes, backslashes,
newlines, tabs, unicode) through to_ntriples_lines / to_turtle_lines
and parses the text back; the triple set must survive byte-exactly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgforge.io.write import to_ntriples_lines, to_turtle_lines

# characters our escaper handles; Turtle/N-Triples forbid raw control
# chars other than these in the serialized form we emit
_LIT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc"),
    ).map(lambda c: c)
    | st.sampled_from(['"', "\\", "\n", "\r", "\t"]),
    max_size=40,
)

_IRI = st.from_regex(r"https://ex\.org/[A-Za-z0-9_]{1,12}", fullmatch=True)


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append({"n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\"}[s[i + 1]])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _parse_nt_line(line: str):
    assert line.endswith(" .")
    body = line[:-2]
    s_end = body.index("> ")
    subj = body[1:s_end]
    rest = body[s_end + 2:]
    p_end = rest.index("> ")
    pred = rest[1:p_end]
    objterm = rest[p_end + 2:]
    if objterm.startswith("<"):
        return (subj, pred, objterm[1:-1], None)
    if objterm.endswith('"'):
        return (subj, pred, _unescape(objterm[1:-1]), "")
    lit, dt = objterm.rsplit('^^<', 1)
    return (subj, pred, _unescape(lit[1:-1]), dt[:-1])


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    rows=st.lists(
        st.tuples(_IRI, _IRI, _LIT, st.sampled_from(["", None, "http://www.w3.org/2001/XMLSchema#string"])),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_ntriples_roundtrip_property(spark, rows):
    # obj_dt None means the object is an IRI — substitute a valid IRI
    fixed = [
        (s, p, ("https://ex.org/o" if dt is None else o), dt)
        for (s, p, o, dt) in rows
    ]
    df = spark.createDataFrame(
        fixed, "subj string, pred string, obj string, obj_dt string"
    )
    lines = [r.line for r in to_ntriples_lines(df).collect()]
    got = {_parse_nt_line(ln) for ln in lines}
    assert got == set(fixed)


def test_turtle_lines_reconstruct(spark):
    rows = [
        ("https://ex.org/a", "https://ex.org/p", 'quote " back \\ nl \n tab \t', ""),
        ("https://ex.org/a", "https://ex.org/q", "https://ex.org/b", None),
        ("https://ex.org/b", "https://ex.org/p", "42", "http://www.w3.org/2001/XMLSchema#int"),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_dt string"
    )
    out = to_turtle_lines(df).sort("subj", "rn").collect()
    # block structure: first line of each subject starts with <subj>,
    # continuations are indented, last line of a block ends with ' .'
    text = {}
    for r in out:
        starts_block = not r.line.startswith("    ")
        if starts_block:
            assert r.line.startswith(f"<{r.subj}> ")
        text.setdefault(r.subj, []).append(r.line)
    for subj, lines in text.items():
        assert lines[-1].endswith(" .")
        assert all(ln.endswith(" ;") for ln in lines[:-1])
