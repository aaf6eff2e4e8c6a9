"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting. All pure JVM column expressions
(oracle-checkable in DuckDB; no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny marker vocabularies (n-gram/stopword heuristic language ID)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "at", "by"]


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), "\\s+")


#: BPE-ish pretokenizer: letter runs | digit runs | single non-space
#: symbol — the GPT-2-family pretokenizer shape minus the lookahead
#: and contraction alternates, deliberately, so the SAME pattern runs
#: on Java regex (Spark) and RE2 (DuckDB — no lookahead) identically
BPE_TOKEN_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"


def token_count(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "ws",
) -> DataFrame:
    """(id, n_tokens, n_subtokens_est) — token counting, pure JVM.

    tokenizer="ws" (default): whitespace split. tokenizer="bpe": the
    BPE-ish pretokenizer regex above — counts the units a BPE merge
    pass would start from (letter runs, digit runs, individual
    symbols), which tracks real LLM token counts far better than
    whitespace on punctuation-/code-heavy web text. The chars/4
    sub-token estimate (the usual budget heuristic) rides along in
    both modes."""
    if tokenizer == "ws":
        n = F.size(tokens(F.col(text_col)))
    elif tokenizer == "bpe":
        n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r} (expected ws|bpe)")
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("bigint").alias("n_tokens"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("bigint").alias("n_subtokens_est"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_guess) by marker-token voting; deterministic tie-break
    (highest count, then lexicographic lang); 'und' when no marker hits."""
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    # notes: (a) Column.isin/array_contains misbehave on higher-order-
    # function lambda variables — build an explicit OR chain; (b) the
    # HOF lambda must be UNARY (a 2-arg lambda receives the array index
    # as its second argument) — capture the word list via a closure
    def _matcher(words):
        def f(t):
            cond = F.lit(False)
            for w in words:
                cond = cond | (t == F.lit(w))
            return cond

        return f

    scores = [
        F.size(F.filter(toks, _matcher(markers))).alias(lang)
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col).alias("id"), *scores)
    # argmax with deterministic tie-break
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(lang) for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (checked last)
        guess = F.when((F.col(lang) == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return scored.select("id", guess.alias("lang_guess"))


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, mean_token_len, stopword_ratio, alpha_ratio,
    quality) — length/stopword/alpha heuristics rounded to 4 decimals.
    quality ∈ [0,1]: penalizes very short docs, no-stopword text, and
    symbol soup."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    text = F.col(text_col)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    def _in_stop(x):
        cond = F.lit(False)
        for w in EN_STOPWORDS:
            cond = cond | (x == F.lit(w))
        return cond

    stop_hits = F.size(F.filter(F.transform(t, lambda x: F.lower(x)), _in_stop))
    mean_len = F.when(n > 0, (n_chars - (n - 1)) / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    length_term = F.least(n / F.lit(20.0), F.lit(1.0))
    quality = F.round(
        length_term * 0.4 + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3 + alpha_ratio * 0.3,
        4,
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("bigint").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        quality.alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp) — md5 over whitespace-normalized lowercased text.
    Content-defined identity for cross-snapshot dedup/audits."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), "\\s+", " ")))
    return df.select(F.col(id_col).alias("id"), F.md5(norm).alias("fp"))
