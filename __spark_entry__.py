"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship pipeline at sf0.001;
`queries()` exposes implemented operators from SURVEY.md §2 (plus the
training-data ops) as (spark, sf_dir) callables; `oracle_sql()` gives
the DuckDB-equivalent SQL for the correctness gate. Column names and
types are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.contract import DOMAIN, load, stringify, table_melt_spec
from kgforge.mapping.spec import RDF_TYPE, RDFS_LABEL
from kgforge.triples.emit import emit_triples, sanitize_expr

PART_COLS = ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triple extraction (melt profile) over sf0.001 part."""
    sf_dir = "/root/testdata/sf0.001"
    df = stringify(load(spark, sf_dir, "part"), ["p_partkey", *PART_COLS])
    spec = table_melt_spec(DOMAIN, "p_partkey", "P_", "Part", PART_COLS)
    return emit_triples(df, spec)


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------
def q_kg_melt_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G2: keyed unpivot of `part` into (subj, pred, obj, obj_dt)."""
    df = stringify(load(spark, sf_dir, "part"), ["p_partkey", *PART_COLS])
    spec = table_melt_spec(DOMAIN, "p_partkey", "P_", "Part", PART_COLS)
    return emit_triples(df, spec)


def q_kg_sanitize_iri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: URI sanitizer over p_name (charset without SQL-quote chars)."""
    df = load(spark, sf_dir, "part")
    return df.select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.concat(F.lit(DOMAIN), F.translate(F.col("p_name"), " -/(),", "______")).alias(
            "iri"
        ),
    )


def q_kg_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/J1: lookup-map join (broadcast) with keep-on-miss fallback."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
        "left",
    )
    return joined.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.col("n_name").alias("n_name"),
        F.coalesce(F.col("r_name"), F.col("n_name")).alias("mapped"),
    )


def q_kg_pkey_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6/G14 (v5 PKey): typed + labeled subject IRIs from supplier."""
    df = load(spark, sf_dir, "supplier")
    subj = F.concat(F.lit(DOMAIN), sanitize_expr(F.col("s_name"), "v5"))
    t1 = F.struct(
        subj.alias("subj"),
        F.lit(RDFS_LABEL).alias("pred"),
        F.col("s_name").alias("obj"),
        F.lit("").alias("obj_dt"),
    )
    t2 = F.struct(
        subj.alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.lit(DOMAIN + "Supplier").alias("obj"),
        F.lit(None).cast("string").alias("obj_dt"),
    )
    return (
        df.select(F.explode(F.array(t1, t2)).alias("t"))
        .select("t.subj", "t.pred", "t.obj", "t.obj_dt")
        .dropDuplicates(["subj", "pred", "obj", "obj_dt"])
    )


def q_kg_link_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: relationship triples with S/R direction swap (orders→customer)."""
    df = load(spark, sf_dir, "orders")
    o = F.concat(F.lit(DOMAIN + "O_"), F.col("o_orderkey").cast("string"))
    c = F.concat(F.lit(DOMAIN + "C_"), F.col("o_custkey").cast("string"))
    s_dir = F.struct(
        o.alias("subj"), F.lit(DOMAIN + "placed_by").alias("pred"), c.alias("obj")
    )
    r_dir = F.struct(
        c.alias("subj"), F.lit(DOMAIN + "placed").alias("pred"), o.alias("obj")
    )
    return (
        df.select(F.explode(F.array(s_dir, r_dir)).alias("t"))
        .select("t.subj", "t.pred", "t.obj")
        .dropDuplicates(["subj", "pred", "obj"])
    )


def q_kg_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: multi-valued cell split/explode with FORGET filter, counted."""
    df = load(spark, sf_dir, "documents")
    tok = F.explode(F.split(F.col("text"), " ")).alias("token")
    return (
        df.select(tok)
        .filter(~F.col("token").isin("NONE", "-", ""))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def q_kg_pred_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-style rollup: triple counts per predicate over the part melt."""
    return (
        q_kg_melt_part(spark, sf_dir)
        .groupBy("pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate (engine credibility baseline)."""
    df = load(spark, sf_dir, "lineitem")
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_melt_part": q_kg_melt_part,
        "kg_sanitize_iri": q_kg_sanitize_iri,
        "kg_map_lookup": q_kg_map_lookup,
        "kg_pkey_triples": q_kg_pkey_triples,
        "kg_link_direction": q_kg_link_direction,
        "kg_token_explode": q_kg_token_explode,
        "kg_pred_count": q_kg_pred_count,
        "pricing_summary": q_pricing_summary,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------
_D = DOMAIN
_RDF_TYPE = RDF_TYPE
_LABEL = RDFS_LABEL

_MELT_PART_SQL = f"""
WITH t AS (
  SELECT '{_D}P_' || CAST(p_partkey AS VARCHAR) AS subj,
         '{_RDF_TYPE}' AS pred, '{_D}Part' AS obj,
         CAST(NULL AS VARCHAR) AS obj_dt
  FROM part
  {{unions}}
)
SELECT DISTINCT subj, pred, obj, obj_dt FROM t
"""


def _melt_union(col: str) -> str:
    return f"""
  UNION ALL
  SELECT '{_D}P_' || CAST(p_partkey AS VARCHAR) AS subj,
         '{_D}{col}' AS pred, CAST({col} AS VARCHAR) AS obj, '' AS obj_dt
  FROM part WHERE CAST({col} AS VARCHAR) <> ''
"""


def oracle_sql() -> dict[str, str]:
    melt = _MELT_PART_SQL.format(unions="".join(_melt_union(c) for c in PART_COLS))
    return {
        "kg_melt_part": melt,
        "kg_sanitize_iri": f"""
            SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
                   '{_D}' || translate(p_name, ' -/(),', '______') AS iri
            FROM part
        """,
        "kg_map_lookup": """
            SELECT CAST(n.n_nationkey AS BIGINT) AS n_nationkey,
                   n.n_name AS n_name,
                   COALESCE(r.r_name, n.n_name) AS mapped
            FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "kg_pkey_triples": f"""
            WITH t AS (
              SELECT '{_D}' || translate(s_name,
                       ' -/\\(),"''<>|{{}}^#$*.`+=%',
                       '__________________________') AS subj,
                     '{_LABEL}' AS pred, s_name AS obj, '' AS obj_dt
              FROM supplier
              UNION ALL
              SELECT '{_D}' || translate(s_name,
                       ' -/\\(),"''<>|{{}}^#$*.`+=%',
                       '__________________________') AS subj,
                     '{_RDF_TYPE}' AS pred, '{_D}Supplier' AS obj,
                     CAST(NULL AS VARCHAR) AS obj_dt
              FROM supplier
            )
            SELECT DISTINCT subj, pred, obj, obj_dt FROM t
        """,
        "kg_link_direction": f"""
            WITH t AS (
              SELECT '{_D}O_' || CAST(o_orderkey AS VARCHAR) AS subj,
                     '{_D}placed_by' AS pred,
                     '{_D}C_' || CAST(o_custkey AS VARCHAR) AS obj
              FROM orders
              UNION ALL
              SELECT '{_D}C_' || CAST(o_custkey AS VARCHAR) AS subj,
                     '{_D}placed' AS pred,
                     '{_D}O_' || CAST(o_orderkey AS VARCHAR) AS obj
              FROM orders
            )
            SELECT DISTINCT subj, pred, obj FROM t
        """,
        "kg_token_explode": """
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            WHERE token NOT IN ('NONE', '-', '')
            GROUP BY token
        """,
        "kg_pred_count": f"""
            WITH t AS (
              SELECT '{_D}P_' || CAST(p_partkey AS VARCHAR) AS subj,
                     '{_RDF_TYPE}' AS pred, '{_D}Part' AS obj,
                     CAST(NULL AS VARCHAR) AS obj_dt
              FROM part
              {"".join(_melt_union(c) for c in PART_COLS)}
            ), d AS (SELECT DISTINCT subj, pred, obj, obj_dt FROM t)
            SELECT pred, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY pred
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
    }
