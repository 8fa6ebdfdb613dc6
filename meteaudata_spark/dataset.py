"""Dataset: a named collection of versioned Signals.

Reference semantics: ``types.py:1203-1428``.  Dataset-level transforms
(``DatasetTransformFunctionProtocol``, types.py:1180-1200) take whole
Signals and return new Signals; the Dataset versions their names and
merges lineage exactly like Signal.process does for series.
"""

from __future__ import annotations

import datetime
from typing import Any, Optional, Protocol

from meteaudata_spark import naming
from meteaudata_spark.metadata import ProcessingStep, dedup_steps
from meteaudata_spark.signal import Signal


class DatasetTransformFunctionProtocol(Protocol):
    def __call__(
        self,
        input_signals: list[Signal],
        input_series_names: list[str],
        *args: Any,
        **kwargs: Any,
    ) -> list[Signal]: ...


class Dataset:
    def __init__(
        self,
        name: str = "dataset",
        description: str = "",
        owner: str = "",
        purpose: str = "",
        project: str = "",
        signals: Optional[dict[str, Signal]] = None,
        created_on: Optional[datetime.datetime] = None,
        last_updated: Optional[datetime.datetime] = None,
    ) -> None:
        self.name = name
        self.description = description
        self.owner = owner
        self.purpose = purpose
        self.project = project
        self.created_on = created_on or datetime.datetime.now()
        self.last_updated = last_updated or datetime.datetime.now()
        self.signals: dict[str, Signal] = {}
        for key, sig in (signals or {}).items():
            # signals keyed by their own (versioned) names
            # (reference: Dataset.__init__, types.py:1213-1231)
            versioned = naming.ensure_versioned(sig.name)
            sig.name = versioned
            self.signals[versioned] = sig

    # ------------------------------------------------------------------
    # naming (reference: types.py:1233-1267)
    # ------------------------------------------------------------------
    def max_name_number(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for full in self.signals:
            base, num = naming.parse_version(full)
            if num is not None:
                out[base] = max(out.get(base, 0), num)
        return out

    def update_numbered_name(self, name: str) -> str:
        base, _ = naming.parse_version(name)
        nxt = self.max_name_number().get(base, 0) + 1
        return naming.with_version(base, nxt)

    def add(self, signal: Signal) -> None:
        new_name = self.update_numbered_name(signal.name)
        signal.rename(new_name)
        self.signals[new_name] = signal
        self._touch()

    @property
    def all_signals(self) -> list[str]:
        return list(self.signals.keys())

    def persist(self, names: Optional[list[str]] = None) -> "Dataset":
        """Persist every series of the named signals (default: all) —
        the dataset-level entry to common-subplan reuse (see
        ``TimeSeries.persist``)."""
        for name in names or self.all_signals:
            self.signals[name].persist()
        return self

    def unpersist(self, names: Optional[list[str]] = None) -> "Dataset":
        for name in names or self.all_signals:
            self.signals[name].unpersist()
        return self

    def all_series_names(self) -> list[str]:
        names: list[str] = []
        for sig in self.signals.values():
            names.extend(sig.all_time_series)
        return names

    # ------------------------------------------------------------------
    # processing (reference: types.py:1366-1428)
    # ------------------------------------------------------------------
    def process(
        self,
        input_time_series_names: list[str],
        transform_function: DatasetTransformFunctionProtocol,
        *args: Any,
        **kwargs: Any,
    ) -> "Dataset":
        available = set(self.all_series_names())
        missing = [n for n in input_time_series_names if n not in available]
        if missing:
            raise ValueError(
                f"Series {missing} not found in Dataset. "
                f"Available: {sorted(available)}"
            )
        input_signals: list[Signal] = []
        for full in input_time_series_names:
            signal_part, _ = naming.split_full_name(full)
            sig = self.signals.get(signal_part)
            if sig is None:
                raise ValueError(
                    f"Signal {signal_part!r} not found for series {full!r}"
                )
            input_signals.append(_copy_signal(sig))

        outputs = transform_function(
            input_signals, input_time_series_names, *args, **kwargs
        )
        for out_sig in outputs:
            # rename() (not direct assignment) so every contained series
            # gets its prefix rewritten when the version bumps
            out_sig.rename(self.update_numbered_name(out_sig.name))
            # merge lineage: every output series inherits all input series'
            # steps, then its own, deduped (reference: types.py:1408-1428)
            for ts in out_sig.time_series.values():
                inherited: list[ProcessingStep] = []
                for full in input_time_series_names:
                    signal_part, _ = naming.split_full_name(full)
                    src = self.signals[signal_part].time_series[full]
                    inherited.extend(
                        s.model_copy(deep=True) for s in src.processing_steps
                    )
                ts.processing_steps = dedup_steps(
                    inherited + ts.processing_steps
                )
            self.signals[out_sig.name] = out_sig
        self._touch()
        return self

    def _touch(self) -> None:
        self.last_updated = datetime.datetime.now()

    # ------------------------------------------------------------------
    # one-job batch processing over many series (scale path)
    # ------------------------------------------------------------------
    def to_long_dataframe(self, names: Optional[list[str]] = None):
        """Union of all (or named) series tagged by full series name:
        ``(series_name, timestamp, value)`` — the layout where one
        partitioned kernel processes every series in a single job."""
        from pyspark.sql import functions as F

        names = names or self.all_series_names()
        long_df = None
        for full in names:
            signal_part, _ = naming.split_full_name(full)
            ts = self.signals[signal_part].time_series[full]
            part = ts.df.select(
                F.lit(full).alias("series_name"),
                F.col("timestamp"),
                F.col("value"),
            )
            long_df = part if long_df is None else long_df.unionByName(part)
        if long_df is None:
            raise ValueError("Dataset has no series")
        return long_df

    def process_long(
        self,
        kernel,
        suffix: str,
        processing_type,
        description: str,
        parameters=None,
        names: Optional[list[str]] = None,
        function_name: Optional[str] = None,
    ) -> "Dataset":
        """Apply a partitioned kernel to every (or named) series in ONE
        Spark job plan.

        ``Signal.process`` builds one plan per series — correct, but N
        series mean N jobs.  Here all series go through a single long
        DataFrame with ``partition_cols=["series_name"]``: one shuffle
        covers the whole dataset, and each output series is a pruned
        filter view over the shared plan (Catalyst pushes the
        series_name predicate down to the union branches).

        ``kernel(df_long, partition_cols=["series_name"]) -> df_long``
        must preserve the (series_name, timestamp, value) schema.
        Lineage is recorded per output series exactly like
        ``Signal.process``.
        """
        import datetime as _dt

        from pyspark.sql import functions as F

        from meteaudata_spark.metadata import FunctionInfo, ProcessingStep
        from meteaudata_spark.timeseries import TimeSeries

        names = names or self.all_series_names()
        long_df = self.to_long_dataframe(names)
        out_long = kernel(long_df, partition_cols=["series_name"])

        for full in names:
            signal_part, _ = naming.split_full_name(full)
            sig = self.signals[signal_part]
            src = sig.time_series[full]
            step = ProcessingStep(
                type=processing_type,
                description=description,
                run_datetime=_dt.datetime.now(),
                requires_calibration=False,
                function_info=FunctionInfo(
                    name=function_name or getattr(kernel, "__name__", "kernel"),
                    version="0.1",
                    author="meteaudata-spark",
                ),
                parameters=parameters,
                suffix=suffix,
                input_series_names=[full],
            )
            out_df = out_long.filter(
                F.col("series_name") == full
            ).select("timestamp", "value")
            out_ts = TimeSeries(
                df=out_df,
                index_metadata=src.index_metadata.model_copy(deep=True),
                values_dtype="float64",
                name=f"{signal_part}_{suffix}",
            )
            out_ts.processing_steps = dedup_steps(
                [s.model_copy(deep=True) for s in src.processing_steps] + [step]
            )
            out_ts.name = sig.update_numbered_ts_name(out_ts.name)
            sig.time_series[out_ts.name] = out_ts
        self._touch()
        return self

    def resample_all(self, frequency: str, names: Optional[list[str]] = None) -> "Dataset":
        """Resample every series in one job (A1 across the dataset)."""
        from functools import partial

        from meteaudata_spark.metadata import Parameters, ProcessingType
        from meteaudata_spark.operators import kernels

        return self.process_long(
            partial(kernels.resample_mean, freq=frequency),
            suffix="RESAMPLED",
            processing_type=ProcessingType.RESAMPLING,
            description="A simple processing function that resamples a series to a given frequency",
            parameters=Parameters(frequency=frequency),
            names=names,
            function_name="resample",
        )

    def smooth_all(
        self, alpha: float = 0.3, names: Optional[list[str]] = None
    ) -> "Dataset":
        """EWMA-smooth every series in one job (SMOOTHING across the
        dataset; grouped-pandas kernel, parallel per series)."""
        from functools import partial

        from meteaudata_spark.metadata import Parameters, ProcessingType
        from meteaudata_spark.operators import kernels

        return self.process_long(
            partial(kernels.ewma, alpha=alpha),
            suffix="EWMA",
            processing_type=ProcessingType.SMOOTHING,
            description=f"Exponential smoothing with alpha={alpha}",
            parameters=Parameters(alpha=alpha),
            names=names,
            function_name="exponential_smoothing",
        )

    def interpolate_all(self, names: Optional[list[str]] = None) -> "Dataset":
        """Linear-interpolate every series in one job (W1 across the
        dataset)."""
        from meteaudata_spark.metadata import Parameters, ProcessingType
        from meteaudata_spark.operators import kernels

        return self.process_long(
            kernels.interpolate_linear,
            suffix="LIN-INT",
            processing_type=ProcessingType.GAP_FILLING,
            description="A simple processing function that linearly interpolates a series",
            parameters=Parameters(),
            names=names,
            function_name="linear interpolation",
        )

    # ------------------------------------------------------------------
    # persistence (reference: Dataset.save/load, types.py:1293-1364)
    # ------------------------------------------------------------------
    def save(self, path: str, zip: bool = False, data_format: str = "parquet") -> str:
        from meteaudata_spark.sources import store

        if zip:
            return store.save_dataset_zip(
                self, f"{path.rstrip('/')}/{self.name}.zip", data_format=data_format
            )
        return store.save_dataset(self, path, data_format=data_format)

    @classmethod
    def load(cls, spark, ds_dir_or_zip: str) -> "Dataset":
        from meteaudata_spark.sources import store

        if ds_dir_or_zip.endswith(".zip"):
            return store.load_dataset_zip(spark, ds_dir_or_zip)
        return store.load_dataset(spark, ds_dir_or_zip)

    # ------------------------------------------------------------------
    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Dataset):
            return NotImplemented
        return (
            self.name == other.name
            and self.description == other.description
            and self.owner == other.owner
            and self.purpose == other.purpose
            and self.project == other.project
            and set(self.signals) == set(other.signals)
            and all(self.signals[k] == other.signals[k] for k in self.signals)
        )

    def __repr__(self) -> str:
        return f"Dataset(name={self.name!r}, signals={self.all_signals})"

    def metadata_dict(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "owner": self.owner,
            "purpose": self.purpose,
            "project": self.project,
            "created_on": self.created_on.isoformat(),
            "last_updated": self.last_updated.isoformat(),
            "signals": {
                name: sig.metadata_dict() for name, sig in self.signals.items()
            },
        }


def _copy_signal(sig: Signal) -> Signal:
    from meteaudata_spark.signal import _shallow_copy

    return Signal(
        name=sig.name,
        units=sig.units,
        provenance=sig.provenance.model_copy(deep=True),
        time_series={
            name: _shallow_copy(ts) for name, ts in sig.time_series.items()
        },
        created_on=sig.created_on,
        last_updated=sig.last_updated,
    )
