"""Physical-plan inspection helpers (plan-regression guardrails).

The scale rules in README are enforceable: these helpers extract the
facts worth asserting — pushed filters, scanned columns, join
strategies, exchange count — so tests fail when a refactor silently
turns a broadcast join into a shuffle or drops a pushdown.
"""

from __future__ import annotations

import io
import contextlib
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings — verify column pruning reached scans."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def join_strategies(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges (excludes broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def keyed_exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges excluding the round-robin spreads that the
    scale-adaptive ``_spread`` parallelism floor inserts at small test
    SFs (r14): those exist ONLY when the input scan yields fewer
    splits than the session parallelism (single-row-group test
    parquet) and vanish on any real multi-split input, so plan-shape
    guards about the distributed ALGORITHM (map-only, one keyed agg,
    shuffle budgets) must not count them."""
    plan = formatted_plan(df)
    n_rr = len(re.findall(r"Arguments: RoundRobinPartitioning", plan))
    return len(re.findall(r"\(\d+\) Exchange\b", plan)) - n_rr


def scan_columns(df: DataFrame, table_hint: str = "") -> set[str]:
    """Union of columns read by scans whose path contains table_hint."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        if table_hint and table_hint not in schema:
            continue
        cols.update(re.findall(r"(\w+):", schema))
    return cols
