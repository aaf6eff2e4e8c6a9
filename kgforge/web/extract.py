"""Deterministic boilerplate-stripping HTML→text extraction.

The north rule's per-row invariant is BYTE-IDENTICAL extracted text per
url versus the pinned single-node extractor — so the single-node
function `extract_text_py` IS the specification, and the Spark stage is
that exact function applied via an Arrow-batched pandas UDF (the only
Python in the pipeline; everything downstream is JVM columnar).

The extractor is trafilatura-*equivalent* in role, not implementation
(trafilatura is not installable here — SURVEY.md §7.1): it removes
script/style/nav/header/footer subtrees, strips tags, unescapes the
core entities, and canonicalizes whitespace to newline-joined
non-empty lines. Deterministic: pure string→string, no config, no
randomness, no date.

Scale: mapInPandas streams Arrow batches; html never leaves the
executor; the output column prunes `html` away immediately after this
stage so downstream stages shuffle only text-sized rows.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_DROP_BLOCKS = re.compile(
    r"<(head|script|style|nav|header|footer)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAGS = re.compile(r"<[^>]+>")
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; doesn't double-decode
]


def extract_text_py(html: bytes | str) -> str:
    """The pinned single-node reference extractor (specification)."""
    s = html.decode("utf-8", errors="ignore") if isinstance(html, (bytes, bytearray)) else html
    s = _DROP_BLOCKS.sub(" ", s)
    # block-level tags become line breaks so adjacent text doesn't fuse
    s = re.sub(r"(?i)</(p|div|h[1-6]|li|tr|br)\s*>|<br\s*/?>", "\n", s)
    s = _TAGS.sub(" ", s)
    for src, dst in _ENTITIES:
        s = s.replace(src, dst)
    lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln != "")


def extract_text(df: DataFrame, html_col: str = "html", out_col: str = "text_extracted") -> DataFrame:
    """web_pages → + extracted text column (Arrow-batched)."""
    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.StringType(), True)])
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[html_col].map(extract_text_py)
            yield pdf[cols + [out_col]]

    return df.mapInPandas(run, schema=out_schema)
