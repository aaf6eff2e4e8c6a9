"""Entity linking: MinHash-LSH candidate blocking + cosine scoring (J2).

Key scale decision: linking operates on DISTINCT surface forms, not on
mention occurrences — at 10^12 documents the distinct-surface table is
orders of magnitude smaller than the mention stream, and the expensive
pairwise work happens only inside LSH buckets.

Pipeline:
  distinct surfaces → lower → char-3-gram shingles (JVM expression)
  → HashingTF sparse vectors → MinHashLSH approxSimilarityJoin
  (candidate blocking at a loose Jaccard threshold; exact Jaccard is
  evaluated per candidate pair, so blocking is also a first filter)
  → cosine scoring:
      * 'set'   — Otsuka–Ochiai set cosine |A∩B|/sqrt(|A||B|), fully
                  JVM-columnar (array_intersect), the default
      * 'tfidf' — TF-IDF-weighted cosine in an Arrow-batched pandas
                  UDF (north-star scorer); IDF weights from the corpus
  → sameAs edges (a, b, score) with a < b above `threshold`.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def char_ngrams(col, n: int = 3):
    """Char n-grams as a JVM expression (no Python): substrings at
    every offset of lower(col)."""
    s = F.lower(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
        lambda i: F.substring(s, i, n),
    )


def candidate_pairs(
    surfaces: DataFrame,
    surface_col: str = "surface",
    jaccard_max_dist: float = 0.6,
    num_hash_tables: int = 5,
    tf_features: int = 1 << 18,
) -> DataFrame:
    """Distinct surfaces → candidate pairs (a, b, grams_a, grams_b,
    jaccard) with a < b, via MinHashLSH self-join.

    Blocking threshold: 0.6 Jaccard distance (≥0.4 similarity). Looser
    thresholds admit every syllable-sharing pair and the candidate set
    explodes quadratically — observed 117s → ~20s on 10k surfaces when
    tightening 0.8→0.6. True variants (case-folds are handled EXACTLY
    upstream in link_surfaces, never here) sit well above 0.4."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = (
        surfaces.select(F.col(surface_col).alias("surface"))
        .distinct()
        .withColumn("grams", char_ngrams(F.col("surface")))
        .filter(F.size("grams") > 0)
    )
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=tf_features)
    # persist: approxSimilarityJoin consumes feat twice (both sides) and
    # the model fit once more — without this the gram/TF pipeline is
    # recomputed three times
    feat = tf.transform(base).persist()
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, jaccard_max_dist, distCol="jdist")
    # carry ONLY the surface strings through the join output — the
    # feature vectors/hashes/gram arrays the LSH join schleps along are
    # dead weight downstream; scorers recompute grams from the strings
    # (a cheap expression) instead of shuffling arrays
    pairs = joined.select(
        F.col("datasetA.surface").alias("a"),
        F.col("datasetB.surface").alias("b"),
        (F.lit(1.0) - F.col("jdist")).alias("jaccard"),
    ).filter(F.col("a") < F.col("b"))
    # materialize before unpersisting feat: the candidate set is small
    # (post-blocking), while leaving feat cached would leak a vector
    # block per call into the session (repeated link_surfaces calls
    # accumulate)
    pairs = pairs.localCheckpoint(eager=True)
    feat.unpersist()
    return pairs.withColumn("grams_a", char_ngrams(F.col("a"))).withColumn(
        "grams_b", char_ngrams(F.col("b"))
    )


def score_set_cosine(pairs: DataFrame) -> DataFrame:
    """Hybrid similarity, pure JVM columnar: max of
      * Otsuka–Ochiai cosine over gram SETS (robust to reordering and
        affixes), and
      * normalized Levenshtein similarity (robust to single-char typos
        in short strings, where one edit kills 3 of ~8 grams).
    Casing is already normalized by the gram builder; levenshtein runs
    on lower()."""
    ga = F.array_distinct("grams_a")
    gb = F.array_distinct("grams_b")
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    denom = F.sqrt(F.size(ga).cast("double") * F.size(gb).cast("double"))
    set_cos = inter / denom
    la, lb = F.lower("a"), F.lower("b")
    lev_sim = F.lit(1.0) - F.levenshtein(la, lb).cast("double") / F.greatest(
        F.length(la), F.length(lb)
    ).cast("double")
    return pairs.withColumn("score", F.greatest(set_cos, lev_sim))


def score_tfidf_cosine(pairs: DataFrame, idf: dict[str, float]) -> DataFrame:
    """TF-IDF-weighted cosine in an Arrow-batched pandas UDF. `idf` is
    a driver-computed {gram: idf_weight} dict (broadcast via closure);
    on a cluster this is the IDF model's vocabulary — bounded by the
    gram space, not the corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def vec(grams: list[str]) -> dict[str, float]:
            tf: dict[str, int] = {}
            for g in grams:
                tf[g] = tf.get(g, 0) + 1
            return {g: c * idf.get(g, 0.0) for g, c in tf.items()}

        def cos(a: list[str], b: list[str]) -> float:
            va, vb = vec(a), vec(b)
            dot = sum(w * vb.get(g, 0.0) for g, w in va.items())
            na = math.sqrt(sum(w * w for w in va.values()))
            nb = math.sqrt(sum(w * w for w in vb.values()))
            return dot / (na * nb) if na > 0 and nb > 0 else 0.0

        for pdf in batches:
            pdf["score"] = [
                cos(a, b) for a, b in zip(pdf["grams_a"], pdf["grams_b"])
            ]
            yield pdf

    schema = T.StructType(
        list(pairs.schema.fields) + [T.StructField("score", T.DoubleType(), True)]
    )
    return pairs.mapInPandas(run, schema=schema)


def compute_idf(surfaces: DataFrame, surface_col: str = "surface") -> dict[str, float]:
    """Driver-side IDF over distinct surfaces' grams."""
    base = surfaces.select(F.col(surface_col).alias("surface")).distinct()
    n = base.count()
    dfreq = (
        base.select(F.explode(F.array_distinct(char_ngrams(F.col("surface")))).alias("g"))
        .groupBy("g")
        .count()
        .collect()
    )
    return {r["g"]: math.log((n + 1) / (r["count"] + 1)) + 1.0 for r in dfreq}


def candidate_pairs_minhash(
    surfaces: DataFrame,
    surface_col: str = "surface",
    num_hashes: int = 24,
    rows_per_band: int = 2,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate pairs via md5-banded MinHash over char-3-grams — the
    engine's own LSH (same primitive as kgforge.textops.dedup), pure
    column expressions end to end: one aggregate + one self-join, no
    ml vectors.

    r=2 bands: a band key is a PAIR of min-hashes, so unrelated
    surfaces that merely share one very common gram (syllable skew)
    don't collide — with r=1 the common-gram buckets go quadratic
    (observed: runaway join on 20k surfaces). Candidate probability at
    gram-Jaccard j is 1-(1-j²)^b: 0.97 at j=0.5 with b=12.

    `max_bucket` drops oversized buckets outright (standard LSH skew
    guard): a bucket with thousands of members carries no linkage
    signal and only produces quadratic garbage pairs."""
    bands = num_hashes // rows_per_band
    base = (
        surfaces.select(F.col(surface_col).alias("surface"))
        .distinct()
        .select("surface", F.explode(F.array_distinct(char_ngrams(F.col("surface")))).alias("g"))
    )
    sig = base.groupBy("surface").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("g")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        "surface",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("surface", "bk.band", "bk.key")
    sizes = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("sz"))
    pruned = banded.join(
        sizes.filter(F.col("sz") <= max_bucket).select("band", "key"), ["band", "key"]
    )
    l, r = pruned.alias("l"), pruned.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.surface") < F.col("r.surface")),
        )
        .select(F.col("l.surface").alias("a"), F.col("r.surface").alias("b"))
        .distinct()
    )
    return pairs.withColumn("grams_a", char_ngrams(F.col("a"))).withColumn(
        "grams_b", char_ngrams(F.col("b"))
    )


def link_surfaces(
    surfaces: DataFrame,
    surface_col: str = "surface",
    threshold: float = 0.78,
    scorer: str = "set",
    jaccard_max_dist: float = 0.8,
    blocking: str = "minhash",
) -> DataFrame:
    """→ sameAs edges (a, b, score), a < b, score ≥ threshold.

    Two-tier design (scale lever): case-fold duplicates — by far the
    most common variant — are linked EXACTLY via a lower() groupBy
    (one cheap shuffle, no pairwise work), and the quadratic LSH stage
    runs only on the case-normalized representatives."""
    base = surfaces.select(F.col(surface_col).alias("surface")).distinct()
    norm = base.withColumn("norm", F.lower(F.col("surface")))
    rep = norm.groupBy("norm").agg(F.min("surface").alias("rep"))
    with_rep = norm.join(rep, "norm")

    # exact tier: every surface ↔ its case-fold representative
    exact = (
        with_rep.filter(F.col("surface") != F.col("rep"))
        .select(
            F.least("surface", "rep").alias("a"),
            F.greatest("surface", "rep").alias("b"),
            F.lit(1.0).alias("score"),
        )
        .distinct()
    )

    # similarity tier on representatives only
    reps = rep.select(F.col("rep").alias("surface"))
    if blocking == "ml":
        pairs = candidate_pairs(reps, "surface", jaccard_max_dist)
    else:
        pairs = candidate_pairs_minhash(reps, "surface")
    if scorer == "tfidf":
        scored = score_tfidf_cosine(pairs, compute_idf(rep.select(F.col("rep").alias("surface"))))
    else:
        scored = score_set_cosine(pairs)
    fuzzy = scored.filter(F.col("score") >= threshold).select("a", "b", "score")
    return exact.unionByName(fuzzy)
