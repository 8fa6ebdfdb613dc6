"""Table profiling ([EXT]): the per-column data-quality report every
large-scale ingestion job runs before trusting a new drop — null
counts, exact distinct cardinality, numeric/string min-max — emitted
as one long-format relation.

Scale design: ONE column-pruned two-stage aggregate PER COLUMN,
unioned — each branch scans only its own parquet column, its shuffle
carries only the column's map-side-deduplicated distinct values, and
every base stat (row/null counts, min/max) folds into the same branch
off the grouped relation (r14: the former full-width no-distinct base
pass is gone — sum of group counts ≡ COUNT(*), min over distinct
values ≡ min over rows).  This beats the tempting single
multi-distinct agg, which Spark plans as an Expand (n_cols+1 copies
of every row through ONE shuffle — measured 22 s vs 3 s on the sf0.1
gate table).  At 100 TB you would swap the exact distincts for
``approx_count_distinct`` (HLL, one pass, mergeable) — the gate keeps
exact counts so the DuckDB oracle can hash-match.

Timestamps are profiled as epoch MICROS cast to double (exact below
2^53): Spark renders sub-second timestamp strings differently from
DuckDB, so string min/max is reserved for genuine varchar columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteaudata_spark.functions.epoch import epoch_seconds
from meteaudata_spark.sources.tables import load_table

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
    """Column profile of ``df`` over the (name, kind) spec: ONE pruned
    two-stage aggregate per column, unioned (see module docstring for
    why not a multi-distinct agg).

    r14 optimization (guide §2.3 aggregate-before-shuffle / §2.4 fewer
    passes): the base stats (row count, null count, min/max) used to
    come from a separate full-width no-distinct pass over all columns
    joined against the per-column distinct branches.  Every base stat
    is exactly recoverable from the per-column ``groupBy(value)``
    relation each distinct branch already builds — ``n_rows`` is the
    sum of group counts, ``n_null`` the null group's count, min/max
    over distinct values equal min/max over rows — so the base pass
    (a single-task full-width decode on a one-row-group test input)
    and the broadcast join are gone, and each column is ONE pruned
    scan + one distinct-values-sized shuffle.  The per-column branches
    run as independent concurrent stages on both the old and new
    shape; dropping the full-width pass also drops one corpus read at
    any scale."""
    # r14 (guide §1.2 driver-side per-task work): the former
    # Column-API loop issued ~100 py4j ops and re-analyzed the
    # growing union per branch (~0.9 s of DRIVER time per call at 11
    # columns); one parsed SQL statement builds the identical plan —
    # expression-for-expression the same aggregates, casts, and
    # NTZ→LTZ epoch handling (epoch_seconds ≡
    # CAST(CAST(x AS TIMESTAMP_LTZ) AS DOUBLE)).
    parts = []
    for c, kind in cols:
        if kind == "num":
            mn = "CAST(MIN(__v) AS DOUBLE)"
            mx = "CAST(MAX(__v) AS DOUBLE)"
        elif kind == "ts":
            # NTZ-safe micros: cast through LTZ (session tz pinned to
            # UTC) then to micros-exact double via epoch seconds ×1e6
            mn = "CAST(CAST(MIN(__v) AS TIMESTAMP_LTZ) AS DOUBLE) * 1000000.0"
            mx = "CAST(CAST(MAX(__v) AS TIMESTAMP_LTZ) AS DOUBLE) * 1000000.0"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
        if kind == "str":
            mns = "CAST(MIN(__v) AS STRING)"
            mxs = "CAST(MAX(__v) AS STRING)"
        else:
            mns = "CAST(NULL AS STRING)"
            mxs = "CAST(NULL AS STRING)"
        parts.append(
            # coalesce: an empty input has no groups, and the old base
            # pass reported COUNT(*) = 0 there, not NULL
            f"""SELECT '{c}' AS column_name,
       CAST(coalesce(SUM(__cnt), 0) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN __v IS NULL THEN __cnt ELSE 0 END) AS BIGINT) AS n_null,
       CAST(SUM(CASE WHEN __v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {mns} AS min_str, {mxs} AS max_str
FROM (SELECT `{c}` AS __v, COUNT(1) AS __cnt FROM {{df}} GROUP BY `{c}`)"""
        )
    return df.sparkSession.sql("\nUNION ALL\n".join(parts), df=df)


def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the full lineitem column profile."""
    df = load_table(spark, sf_dir, "lineitem")
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


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit: child rows whose key has no match
    in the parent — the check every warehouse load runs before
    publishing.  LEFT ANTI join keyed on the FK; Spark broadcasts the
    parent when small, shuffles both sides keyed otherwise — either
    way no row leaves the JVM."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )


def orders_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: cross-table integrity report for the star schema —
    orphan counts for lineitem→orders, lineitem→part,
    lineitem→supplier, orders→customer, one row per relationship
    (all zero on healthy TPC-H data — the oracle proves the CHECK
    itself, not just the happy count: both engines must agree on the
    anti-join semantics over every key)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    checks = [
        ("lineitem.l_orderkey->orders", li, orders, "l_orderkey", "o_orderkey"),
        ("lineitem.l_partkey->part", li, part, "l_partkey", "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, supplier, "l_suppkey", "s_suppkey"),
        ("orders.o_custkey->customer", orders, customer, "o_custkey", "c_custkey"),
    ]
    out = None
    for name, c, p, ck, pk in checks:
        row = (
            fk_orphans(c.select(ck), p.select(pk), ck, pk)
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(
                F.lit(name).alias("relationship"),
                F.col("n_orphans").cast("bigint"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


ORDERS_INTEGRITY_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(COUNT(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
ORDER BY relationship
"""
