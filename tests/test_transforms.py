"""Property tests for the scalar transform layer (T1/T2 in SURVEY §2.3):
Spark column expressions must equal Python semantics exactly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kgforge.mapping.spec import SANITIZE_CHARSETS, sanitize_py
from kgforge.triples.emit import py_slice_expr, sanitize_expr

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


SAMPLES = [
    "", "a", "ab", "abcd", "1T23", "S000N0001", "A-B C/D(E)", "  ",
    "x" * 10, "héllo wörld", "Pipe, 3.5% alloy", 'Bracket "left" <rev>',
]
BOUNDS = [0, 1, 2, 3, 5, -1, -2, -3, -5, 100, -100]


def _spark_slice(spark, values, lo, hi):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r.o for r in df.select(py_slice_expr(F.col("s"), lo, hi).alias("o")).collect()]


def test_slice_matches_python_grid(spark):
    for lo in BOUNDS:
        for hi in BOUNDS:
            got = _spark_slice(spark, SAMPLES, lo, hi)
            want = [s[lo:hi] for s in SAMPLES]
            assert got == want, f"slice [{lo}:{hi}]"


def test_extract_minus3_quirk(spark):
    """Documented grammar example `extract(-3:)` parses to [-3:0] == ''
    (csv2rdf-v2.py:347-349)."""
    got = _spark_slice(spark, ["ABCDEF"], -3, 0)
    assert got == [""]


@pytest.mark.parametrize("version", list(SANITIZE_CHARSETS))
def test_sanitizer_matches_python(spark, version):
    df = spark.createDataFrame([(v,) for v in SAMPLES], ["s"])
    got = [
        r.o for r in df.select(sanitize_expr(F.col("s"), version).alias("o")).collect()
    ]
    want = [sanitize_py(s, version) for s in SAMPLES]
    assert got == want


@pytest.mark.parametrize("version", list(SANITIZE_CHARSETS))
def test_sanitizer_idempotent(version):
    for s in SAMPLES:
        once = sanitize_py(s, version)
        assert sanitize_py(once, version) == once


if HAVE_HYP:

    @given(
        s=st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=20
        ),
        lo=st.integers(-8, 8),
        hi=st.integers(-8, 8),
    )
    @settings(max_examples=200, deadline=None)
    def test_python_slice_model(s, lo, hi):
        """The oracle slice model (spec.py_slice) is plain Python."""
        from kgforge.mapping.spec import py_slice

        assert py_slice(s, lo, hi) == s[lo:hi]


def test_spark_slice_random(spark):
    rng = random.Random(42)
    vals = [
        "".join(rng.choice("ab cd-/()0123") for _ in range(rng.randint(0, 12)))
        for _ in range(50)
    ]
    for _ in range(20):
        lo, hi = rng.randint(-6, 6), rng.randint(-6, 6)
        assert _spark_slice(spark, vals, lo, hi) == [v[lo:hi] for v in vals]
