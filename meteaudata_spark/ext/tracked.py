"""Lineage-tracked table transforms: the [EXT] operators emit
ProcessingStep lineage like any reference transform (SURVEY §7.2 M4).

The reference tracks lineage per univariate series
(``Signal.process``, types.py:678-723).  Table-level extension
operators (dedup, similarity, text analysis, relational) work on
whole DataFrames, so the same metadata ride-along happens at table
granularity: a ``TrackedTable`` pairs a lazy DataFrame with the
ordered list of ProcessingSteps that produced it, capturing each
transform's identity, parameters, and source code exactly the way
``Signal.process`` does.

Everything is driver-side metadata — the data plane stays a lazy
Spark plan; tracking adds zero jobs.

Example::

    docs = TrackedTable.from_table(spark, sf_dir, "documents")
    pairs = docs.apply(
        minhash_lsh_pairs,
        ptype=ProcessingType.REMOVE_DUPLICATES,
        suffix="MINHASH-LSH",
        num_hashes=32,
    )
    pairs.steps[-1].function_info.source_code  # full transform source
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from meteaudata_spark.metadata import (
    FunctionInfo,
    Parameters,
    ProcessingStep,
    ProcessingType,
    dedup_steps,
)


class TrackedTable:
    """A lazy DataFrame plus the ProcessingStep lineage that made it."""

    def __init__(
        self,
        df: DataFrame,
        name: str,
        steps: list[ProcessingStep] | None = None,
    ) -> None:
        self.df = df
        self.name = name
        self.steps = list(steps or [])

    @classmethod
    def from_table(
        cls, spark: SparkSession, sf_dir: str, table: str
    ) -> "TrackedTable":
        from meteaudata_spark.sources.tables import load_table

        return cls(load_table(spark, sf_dir, table), name=table)

    def apply(
        self,
        fn: Callable[..., DataFrame],
        *args: Any,
        ptype: ProcessingType = ProcessingType.TRANSFORMATION,
        suffix: str | None = None,
        description: str | None = None,
        **kwargs: Any,
    ) -> "TrackedTable":
        """Run ``fn(self.df, *args, **kwargs)`` and record the step.

        Mirrors the Signal.process bookkeeping (lineage concat + dedup,
        source capture, parameter record) at table granularity; the
        suffix grammar rule (no ``_``) is enforced by ProcessingStep
        itself."""
        out = fn(self.df, *args, **kwargs)
        info = FunctionInfo(name=getattr(fn, "__name__", str(fn)))
        info.capture_source(fn)
        doc_first = (fn.__doc__ or "").strip().splitlines()
        step = ProcessingStep(
            type=ptype,
            description=description
            or (doc_first[0][:200] if doc_first else f"table transform {info.name}"),
            function_info=info,
            parameters=Parameters(**{k: repr(v) for k, v in kwargs.items()}),
            suffix=suffix or info.name.upper().replace("_", "-"),
            input_series_names=[self.name],
        )
        return TrackedTable(
            out,
            name=f"{self.name}_{step.suffix}",
            steps=dedup_steps(self.steps + [step]),
        )

    def lineage_summary(self) -> list[dict[str, Any]]:
        """Compact provenance record (one dict per step) for manifests."""
        return [
            {
                "type": s.type.value,
                "function": s.function_info.name if s.function_info else None,
                "suffix": s.suffix,
                "inputs": s.input_series_names,
                "parameters": (
                    s.parameters.model_dump() if s.parameters else {}
                ),
            }
            for s in self.steps
        ]
