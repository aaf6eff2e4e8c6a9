"""One switch for every scale guard (the round-3 verdict's "scale
profile": a single object that flips all the skew/hot-bucket guards at
once, so call sites can't forget one).

The engine's quadratic hazards are all the same class — a banded-LSH
bucket self-join where one hot key (boilerplate band signature, empty
text hashing to simhash 0, duplicate/zero embedding vectors, stopword
shingles, a head-entity subject bucket) turns O(n) rows into C(n, 2)
pairs. Each operator has its own guard knob; `ScaleProfile` carries
them all, and every guarded operator accepts `profile=` which
OVERRIDES its individual keyword arguments:

    from kgforge.profile import SCALE
    minhash_lsh_candidates(df, profile=SCALE)
    simhash_near_dups(df, profile=SCALE)
    embedding_near_dups(emb, profile=SCALE)
    ngram_jaccard_pairs(df, profile=SCALE)
    materialize_triples(..., salt_partitions=SCALE.salt_partitions)

Three presets:

* `PARITY` — no guards; exactly the DuckDB-oracle semantics. Opt-in
  (`profile=PARITY` or explicit `max_bucket=None`) since round 5.
* `SAFE` — only the guards that do NOT change result semantics:
  `max_bucket` with `oversize="join"` bounds per-task memory (no
  collect_list hub row can form) while producing the identical pair
  set. Since round 5 this is the SIGNATURE DEFAULT of every guarded
  bucket-pair operator — calling one with no arguments runs SAFE
  (asserted by test_profile.test_safe_is_the_default_for_guarded_
  operators).
* `SCALE` — every guard on, including the semantics-changing ones
  (oversized buckets dropped as boilerplate, simhash-0 empty docs
  pre-dropped, corpus-relative shingle df cap, salted bucketed
  writes). The crawl-scale posture.
"""

from __future__ import annotations

from dataclasses import dataclass, fields


@dataclass(frozen=True)
class ScaleProfile:
    #: cap on banded-LSH bucket membership before pair generation
    #: (minhash / simhash / embedding near-dup self-joins). None = no
    #: guard: an adversarial bucket materializes C(n,2) pairs.
    max_bucket: int | None = None
    #: policy for buckets over `max_bucket`: "join" streams their pairs
    #: row-at-a-time (identical output, bounded memory, still quadratic
    #: OUTPUT for that bucket); "drop" skips them (a bucket hotter than
    #: a reasonable cap carries boilerplate, not near-dup signal).
    oversize: str = "join"
    #: n-gram Jaccard: drop shingles shared by more than this FRACTION
    #: of the corpus as join keys (corpus-relative stopword guard;
    #: None keeps the operator's absolute max_df default).
    ngram_max_df_frac: float | None = None
    #: simhash: pre-drop documents whose signature is 0 (empty /
    #: whitespace-only text — ALL of them share every (chunk, 0) band
    #: key; their duplication is exact-dedup's job anyway).
    simhash_drop_zero: bool = False
    #: entity-linking banded-bucket cap (candidate_pairs_minhash);
    #: linking always guards — this only tunes the cap.
    linking_max_bucket: int = 64
    #: bucketed triple write: split a hot subj_bucket across this many
    #: tasks (head-entity skew; kgforge.io.catalog.ParquetLedgerSink).
    #: None = unsalted.
    salt_partitions: int | None = None

    def __post_init__(self) -> None:
        if self.oversize not in ("join", "drop"):
            raise ValueError(f"unknown oversize policy {self.oversize!r}")


#: oracle-parity semantics — no guards. NOT the implicit default since
#: round 5: the guarded operators' signatures default to SAFE's values;
#: pass profile=PARITY (or max_bucket=None) to run unguarded.
PARITY = ScaleProfile()

#: semantics-preserving guards only: bounded per-task memory with the
#: exact same output pair set (safe under hash-checked oracles)
SAFE = ScaleProfile(max_bucket=1024, oversize="join")

#: every guard on — the 100-TB posture. max_bucket=1024 caps any
#: collect_list array at ~1k members; dropped buckets (oversize="drop")
#: are boilerplate by construction at this cap; shingles shared by
#: >0.1% of the corpus carry no near-dup signal; empty docs leave the
#: simhash path entirely; bucketed writes salt 32-way.
SCALE = ScaleProfile(
    max_bucket=1024,
    oversize="drop",
    ngram_max_df_frac=0.001,
    simhash_drop_zero=True,
    linking_max_bucket=64,
    salt_partitions=32,
)


def knob_names() -> list[str]:
    """Every guard knob the profile carries (test hook: asserts new
    knobs get added HERE, not as one-off keyword args)."""
    return [f.name for f in fields(ScaleProfile)]
