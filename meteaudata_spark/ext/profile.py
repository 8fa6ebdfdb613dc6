"""Table profiling ([EXT]): the per-column data-quality report every
large-scale ingestion job runs before trusting a new drop — null
counts, exact distinct cardinality, numeric/string min-max — emitted
as one long-format relation.

Scale design: null counts and min/max come from ONE no-distinct
aggregation pass (pure map-side combine); exact distinct counts come
from one column-pruned two-stage aggregate PER COLUMN, unioned — each
branch scans only its own parquet column and its shuffle carries only
the column's map-side-deduplicated distinct values.  This beats the
tempting single multi-distinct agg, which Spark plans as an Expand
(n_cols+1 copies of every row through ONE shuffle — measured 22 s vs
3 s on the sf0.1 gate table).  At 100 TB you would swap the exact
distincts for ``approx_count_distinct`` (HLL, one pass, mergeable) —
the gate keeps exact counts so the DuckDB oracle can hash-match.

Timestamps are profiled as epoch MICROS cast to double (exact below
2^53): Spark renders sub-second timestamp strings differently from
DuckDB, so string min/max is reserved for genuine varchar columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteaudata_spark.functions.epoch import epoch_seconds

# (column, kind) for the lineitem gate table; kind ∈ num | str | ts
_LINEITEM_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def profile_table(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """Column profile of ``df`` over the (name, kind) spec: one
    no-distinct base pass + one pruned distinct-count branch per
    column (see module docstring for why not a multi-distinct agg)."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c, kind in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn")
        )
        if kind == "num":
            mn = F.min(F.col(c)).cast("double")
            mx = F.max(F.col(c)).cast("double")
        elif kind == "ts":
            # NTZ-safe micros: cast through LTZ (session tz pinned to
            # UTC) then to micros-exact double via epoch seconds ×1e6
            mn = epoch_seconds(F.min(F.col(c))) * 1000000.0
            mx = epoch_seconds(F.max(F.col(c))) * 1000000.0
        else:
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
        aggs.append(mn.alias(f"{c}__mn"))
        aggs.append(mx.alias(f"{c}__mx"))
        if kind == "str":
            aggs.append(F.min(F.col(c)).alias(f"{c}__mns"))
            aggs.append(F.max(F.col(c)).alias(f"{c}__mxs"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__mns"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__mxs"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"{c}__nn").cast("bigint").alias("n_null"),
            F.col(f"{c}__mn").alias("min_num"),
            F.col(f"{c}__mx").alias("max_num"),
            F.col(f"{c}__mns").alias("min_str"),
            F.col(f"{c}__mxs").alias("max_str"),
        )
        for c, _ in cols
    ]
    base = row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    # exact distincts: one pruned two-stage agg per column, unioned —
    # each shuffle carries only that column's partially-deduplicated
    # distinct values, and the 11 branches run as independent stages
    dparts = None
    for c, _ in cols:
        dc = df.select(F.col(c).alias("__v")).groupBy("__v").agg(
            F.lit(1).alias("__one")
        )
        part = dc.agg(
            F.sum(F.when(F.col("__v").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_distinct")
        ).select(F.lit(c).alias("column_name"), "n_distinct")
        dparts = part if dparts is None else dparts.unionAll(part)
    return (
        base.join(F.broadcast(dparts), "column_name")
        .select(
            "column_name",
            "n_rows",
            "n_null",
            "n_distinct",
            "min_num",
            "max_num",
            "min_str",
            "max_str",
        )
        .orderBy("column_name")
    )


def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the full lineitem column profile."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return profile_table(df, _LINEITEM_COLS)


def _profile_sql(table: str, cols: list[tuple[str, str]]) -> str:
    parts = []
    for c, kind in cols:
        if kind == "num":
            mn = f"CAST(MIN({c}) AS DOUBLE)"
            mx = f"CAST(MAX({c}) AS DOUBLE)"
        elif kind == "ts":
            mn = f"CAST(epoch_us(MIN({c})) AS DOUBLE)"
            mx = f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
        if kind == "str":
            mns, mxs = f"MIN({c})", f"MAX({c})"
        else:
            mns = "CAST(NULL AS VARCHAR)"
            mxs = "CAST(NULL AS VARCHAR)"
        parts.append(
            f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {mns} AS min_str, {mxs} AS max_str
FROM {table}"""
        )
    body = "\nUNION ALL\n".join(parts)
    return f"{body}\nORDER BY column_name"


LINEITEM_PROFILE_SQL = _profile_sql("lineitem", _LINEITEM_COLS)
