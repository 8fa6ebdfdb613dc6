"""Streaming benchmark-contamination filter: Bloom-bit membership
checks on an incoming document stream.

The batch side (``ext/corpus_ops.contamination_bloom``) builds the
benchmark's Bloom filter relationally so a DuckDB oracle can verify it
bit-for-bit.  The streaming side answers the ingestion-time question —
*does this arriving document leak the eval benchmark?* — as a
STATELESS map over micro-batches:

1. ``build_bloom_bits`` runs once, batch-side, and collects the
   benchmark's set bit positions (≤ ``m_bits`` 64-bit ints; the same
   ``h60(i + ':' + gram) mod m`` math as the batch operator, so the
   two paths flag identical grams);
2. the positions pack into an m_bits/8-byte BITMAP and ship to
   executors once via a Spark broadcast (512 KB at m = 2²² — a
   Python set of int positions would cost ~100 bytes/entry per
   executor, forfeiting the bounded-size guarantee the Bloom design
   exists for);
3. ``stream_contamination_flags`` maps each micro-batch through an
   Arrow-batched ``mapInPandas`` that shingles the text in Python
   (identical word-n-gram + md5-h60 math) and counts grams whose k
   positions are ALL present.  Docs with no n-grams (shorter than n
   words, or null text) emit NO row — exactly the batch operator's
   output, so the differential test can assert strict equality.

No state store is involved — contamination of a doc depends only on
the doc and the (static) benchmark — so throughput scales with
partitions and there is nothing to expire.  Flags inherit the batch
operator's guarantee: a superset of true overlaps (Bloom false
positives only), never a miss.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

_FLAGS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_grams", LongType()),
        StructField("n_flagged", LongType()),
        StructField("contaminated", BooleanType()),
    ]
)


def _h60_py(s: str) -> int:
    """Python twin of ``ext/dedup._h60`` (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text, n: int) -> set[str]:
    if not text:  # null text -> no grams (mirrors F.split on NULL)
        return set()
    words = text.split(" ")
    return {
        " ".join(words[i : i + n]) for i in range(max(0, len(words) - n + 1))
    }


def build_bloom_bits(
    benchmark: DataFrame, n: int = 5, m_bits: int = 65536, k: int = 4
) -> list[int]:
    """Batch-side Bloom construction: distinct set bit positions of the
    benchmark's word n-grams (sorted, ≤ m_bits entries).  Uses the
    relational path from ``contamination_bloom`` so the bits are
    engine-verified; only the final ≤ m_bits-row collect touches the
    driver — bounded by the filter size, NOT the benchmark size."""
    from meteaudata_spark.ext.corpus_ops import _h60, _shingles

    bits = (
        _shingles(benchmark, n)
        .select("shingle")
        .distinct()
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            _h60(
                                F.concat(F.lit(f"{i}:"), F.col("shingle"))
                            ),
                            F.lit(m_bits),
                        ).cast("bigint")
                        for i in range(k)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    return sorted(r["pos"] for r in bits.collect())


def stream_contamination_flags(
    stream: DataFrame,
    bloom_bits: list[int],
    n: int = 5,
    m_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Map a (doc_id, text) stream to per-doc contamination flags.

    Stateless — works identically on a batch DataFrame, which is how
    the differential test pins it against the batch operator."""
    spark = stream.sparkSession
    bitmap = bytearray((m_bits + 7) // 8)
    for pos in bloom_bits:
        bitmap[pos >> 3] |= 1 << (pos & 7)
    bc = spark.sparkContext.broadcast(bytes(bitmap))

    def flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = bc.value

        def _set(pos: int) -> bool:
            return bool((bits[pos >> 3] >> (pos & 7)) & 1)

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                grams = _grams(text, n)
                if not grams:
                    continue  # batch parity: gram-less docs emit no row
                flagged = sum(
                    1
                    for g in grams
                    if all(
                        _set(_h60_py(f"{i}:{g}") % m_bits)
                        for i in range(k)
                    )
                )
                out.append(
                    (int(doc_id), len(grams), flagged, flagged > 0)
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_grams", "n_flagged", "contaminated"],
            )

    return stream.select("doc_id", "text").mapInPandas(flag, _FLAGS_SCHEMA)
