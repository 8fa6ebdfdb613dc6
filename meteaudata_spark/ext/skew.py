"""Skew mitigation: salted joins for pathological key distributions.

AQE's skew-join splitting (on by default in ``session.py``) handles
most skew at runtime by subdividing oversized partitions.  Salting is
the explicit fallback for the case AQE can't fix: ONE key so hot that
even a split partition's rows must all meet the same right-side row —
replicate that right-side row N ways and spread the left side across
the replicas.

``salted_join(left, right, on, n_salts)``:
  * left side: each row gets a random-but-deterministic salt in
    [0, n_salts) (hash of the whole row — no RNG, so plans stay
    reproducible);
  * right side: exploded N× with every salt value;
  * join on (key, salt) — the hot key's rows now land in N partitions.

Cost: right side inflates N×, so use it for dimension-sized right
sides or after pre-filtering to the hot keys only (join the skewed
keys salted, the rest normally, and union — the classic recipe).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salt trick; result equals
    ``left.join(right, on, how)`` row-for-row."""
    on = list(on)
    salted_left = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_left.join(salted_right, on + ["__salt"], how)
        .drop("__salt")
    )
