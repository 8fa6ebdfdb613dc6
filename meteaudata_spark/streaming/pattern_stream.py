"""Streaming pattern census: the ingestion-time twin of
``textstats.doc_pattern_profile``.

Every arriving document is annotated with its URL / email / number
match counts in a STATELESS narrow projection (JVM ``regexp_count``,
the same dialect-safe patterns as the batch query) — the live feed
behind PII triage dashboards and scrubber monitoring.  No state, no
watermark needed; per-window rollups compose downstream with the
usual windowed aggregation if desired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteaudata_spark.ext.textstats import _PAT_EMAIL, _PAT_NUM, _PAT_URL


def stream_pattern_flags(stream: DataFrame) -> DataFrame:
    """(doc_id, lang, n_urls, n_emails, n_numbers) per arriving doc."""
    return stream.select(
        "doc_id",
        "lang",
        F.regexp_count(F.col("text"), F.lit(_PAT_URL)).cast("bigint").alias(
            "n_urls"
        ),
        F.regexp_count(F.col("text"), F.lit(_PAT_EMAIL))
        .cast("bigint")
        .alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PAT_NUM)).cast("bigint").alias(
            "n_numbers"
        ),
    )
