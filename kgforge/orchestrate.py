"""Source registry + multi-source orchestration (reference S2/S9/P4/A4).

The reference's front door is an options INI listing CSV sources; the
engine compiles each source's grammar and runs them all in one go.
Two dialects exist in the reference lineage, both supported here:

* **v5 dialect** (csv2rdf-v5.py:109-137): named sections with keys
  `file/domain/delimiter/semantics/active`; ONLY sources whose
  `active` equals the exact string "True" are kept (the reference
  compares `== "True"`, so "true"/"yes" deactivate — quirk preserved).
  Main loop runs one store per source (csv2rdf-v5.py:526-551).
* **v1 dialect** (csv2rdf/csv2rdf.py:15-57): the section NAME is the
  CSV path; keys `domain/type/predicate_prefix/delimiter` plus
  optional `semantics` (+ `semantics_delimiter`, default ';').
  The orchestrator (csv2rdf.py:275-290) routes each file to the
  semantic or default parser and accumulates ALL sources in ONE
  shared store — union + global dedup (A4), the shape the reference's
  own test_orchestrator exercises (tests_csv.py:72-85).

Spark realization: per source → MappingSpec (compile once, driver
side) → emit_triples (one narrow pass + dedup). Multi-source union is
`unionByName` + one global dedup shuffle; each source's scan stays
independent (different files, different schemas), so the union
parallelizes per-source at any cluster size.

Grammar version resolution for INI grammars: an optional `profile` key
on the source section pins v2/v3/v4/v5 explicitly (our extension —
the reference ties the version to the binary you run, which a single
engine cannot); otherwise sections with `cellrole` sniff as v5 and
sections with `cell` sniff as v4 (the latest of the v2-v4 family).
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.session import local_df
from kgforge.io.read import read_csv, read_csv_with_rowindex
from kgforge.mapping.compile_ini import (
    compile_v234,
    compile_v5,
    ontology_requirements,
)
from kgforge.mapping.compile_v1 import (
    compile_v1_default,
    compile_v1_semantic,
    parse_v1_grammar,
)
from kgforge.mapping.spec import MappingSpec
from kgforge.triples.emit import TRIPLE_FIELDS, emit_triples

INI_PROFILES = ("v2", "v3", "v4", "v5")


@dataclass(frozen=True)
class SourceConfig:
    """One activated source from an options INI."""

    name: str
    file: str
    domain: str
    delimiter: str
    semantics: str | None = None
    profile: str | None = None  # None → sniff the grammar file
    type_name: str | None = None  # v1 default mode
    predicate_prefix: str | None = None
    semantics_delimiter: str = ";"


def _resolve(path: str, base_dir: str) -> str:
    if os.path.isabs(path) or "://" in path:
        return path
    return os.path.join(base_dir, path)


def parse_options(text: str, base_dir: str = ".") -> list[SourceConfig]:
    """Options INI text → active SourceConfigs (P4 active-source
    filter). Dialect is detected per the module docstring; relative
    file/semantics paths resolve against `base_dir` (the conf file's
    directory)."""
    config = configparser.ConfigParser()
    config.read_string(text)
    sources: list[SourceConfig] = []
    for section in config.sections():
        sec = config[section]
        if "file" in sec:
            # v5 dialect — active-only, exact-string "True"
            # (csv2rdf-v5.py:124-132)
            if sec.get("active") != "True":
                continue
            sources.append(
                SourceConfig(
                    name=section,
                    file=_resolve(sec["file"], base_dir),
                    domain=sec["domain"],
                    delimiter=sec.get("delimiter", ";"),
                    semantics=_resolve(sec["semantics"], base_dir)
                    if sec.get("semantics")
                    else None,
                    profile=sec.get("profile"),
                    type_name=sec.get("type"),
                    predicate_prefix=sec.get("predicate_prefix"),
                )
            )
        else:
            # v1 dialect — section name IS the file; no active key
            sources.append(
                SourceConfig(
                    name=os.path.splitext(os.path.basename(section))[0],
                    file=_resolve(section, base_dir),
                    domain=sec["domain"],
                    delimiter=sec.get("delimiter", ";"),
                    semantics=_resolve(sec["semantics"], base_dir)
                    if sec.get("semantics")
                    else None,
                    profile=sec.get("profile", "v1"),
                    type_name=sec.get("type"),
                    predicate_prefix=sec.get("predicate_prefix"),
                    semantics_delimiter=sec.get(
                        "semantics_delimiter", ";"
                    ),
                )
            )
    return sources


def load_options(path: str) -> list[SourceConfig]:
    if not os.path.isfile(path):
        raise FileNotFoundError(f'File "{path}" not found.')
    with open(path, encoding="utf-8") as f:
        text = f.read()
    return parse_options(text, base_dir=os.path.dirname(os.path.abspath(path)))


def sniff_profile(grammar_text: str) -> str:
    """INI grammar → engine profile. `cellrole` keys are the v5 rule
    classes; `cell` keys are the v2-v4 family (default to v4, the
    newest charset/miss-policy of that family)."""
    config = configparser.ConfigParser()
    config.read_string(grammar_text)
    for section in config.sections():
        if config.has_option(section, "cellrole"):
            return "v5"
        if config.has_option(section, "cell"):
            return "v4"
    raise ValueError("grammar INI has no cell/cellrole sections")


def compile_source(src: SourceConfig, columns: list[str]) -> MappingSpec:
    """SourceConfig + concrete CSV header → MappingSpec (S3 dispatch)."""
    if src.semantics is None:
        # v1 default mode: header melt + row typing
        if src.type_name is None or src.predicate_prefix is None:
            raise ValueError(
                f"source {src.name!r}: no semantics requires type + "
                "predicate_prefix (v1 default mode)"
            )
        return compile_v1_default(
            src.domain, src.type_name, src.predicate_prefix, columns, src.name
        )
    with open(src.semantics, encoding="utf-8") as f:
        grammar_text = f.read()
    profile = src.profile
    if profile in (None, "auto"):
        profile = (
            sniff_profile(grammar_text)
            if grammar_text.lstrip().startswith("[")
            else "v1"
        )
    if profile == "v1":
        rows = parse_v1_grammar(grammar_text, src.semantics_delimiter)
        return compile_v1_semantic(src.domain, rows, columns, src.name)
    if profile == "v5":
        return compile_v5(src.domain, grammar_text, columns, src.name)
    if profile in ("v2", "v3", "v4"):
        return compile_v234(profile, src.domain, grammar_text, columns, src.name)
    raise ValueError(f"source {src.name!r}: unknown profile {profile!r}")


def run_source(
    spark: SparkSession, src: SourceConfig, dedup: bool = True
) -> tuple[DataFrame, MappingSpec]:
    """One source → (triple DataFrame, its compiled spec)."""
    needs_rowindex = src.semantics is None  # v1 default subject minting
    if needs_rowindex:
        df = read_csv_with_rowindex(spark, src.file, src.delimiter)
        columns = [c for c in df.columns if c != "__rowindex__"]
    else:
        df = read_csv(spark, src.file, src.delimiter)
        columns = list(df.columns)
    spec = compile_source(src, columns)
    return emit_triples(df, spec, dedup=dedup), spec


def run_sources(
    spark: SparkSession,
    sources: list[SourceConfig],
    mode: str = "per_source",
) -> dict[str, DataFrame]:
    """S9 multi-source orchestration.

    mode='per_source' (v5 main loop): {source_name: triples}, each
    deduped independently; result also carries '__ontology__' when any
    v5 source contributed requirement strings (reference dump_define).

    mode='shared' (v1 orchestrator): {'__shared__': union of all
    sources + ONE global dedup} — the rdflib shared-store semantics
    (A4): a triple emitted by two sources appears once.
    """
    if mode not in ("per_source", "shared"):
        raise ValueError(f"unknown mode {mode!r}")
    out: dict[str, DataFrame] = {}
    onto: list[str] = []
    parts: list[DataFrame] = []
    for src in sources:
        triples, spec = run_source(spark, src, dedup=(mode == "per_source"))
        if spec.profile == "v5":
            for req in ontology_requirements(spec):
                if req not in onto:
                    onto.append(req)
        if mode == "per_source":
            out[src.name] = triples
        else:
            parts.append(triples.select(*TRIPLE_FIELDS))
    if mode == "shared":
        if not parts:
            raise ValueError("no active sources")
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        # single global dedup — the only multi-source shuffle
        out["__shared__"] = union.dropDuplicates(TRIPLE_FIELDS)
    if onto:
        out["__ontology__"] = local_df(
            spark, [(s,) for s in onto], "requirement string"
        )
    return out


def run_config(
    spark: SparkSession, config_path: str, mode: str = "per_source"
) -> dict[str, DataFrame]:
    """Options INI path → orchestrated triple DataFrames (the engine's
    equivalent of `csv2rdf -c conf.ini`)."""
    return run_sources(spark, load_options(config_path), mode=mode)
