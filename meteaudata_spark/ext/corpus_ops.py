"""Training-corpus pipeline operators over ``documents`` ([EXT]):
deterministic train/validation/test splitting, stratified sampling,
benchmark-contamination detection, and PII scrubbing.

These are the corpus-management steps a large-scale LLM data pipeline
runs between dedup and training (north star: BASELINE.json).  Every
operator keys on the cross-engine md5-derived 60-bit hash (``_h60``)
so the full pipeline — including which rows land in which split or
sample — is verified value-for-value by a DuckDB oracle.

Scale notes: splitting and sampling are stateless row-local
projections (no shuffle, no driver state — a 1000-executor cluster
splits 100 TB without coordination, and membership is stable under
re-partitioning because it depends only on doc_id).  Contamination
broadcasts the (small) benchmark n-gram set against the corpus — the
canonical build side — and the scrubber is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteaudata_spark.ext.dedup import _docs, _h60, _shingles, _H60_DUCK

# regexes kept to the syntax subset Java regex (Spark) and RE2
# (DuckDB) treat identically
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d{1,2}-\d{3}-\d{4}"


# ----------------------------------------------------------------------
# deterministic hash split
# ----------------------------------------------------------------------
def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    valid_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Assign every row to train/validation/test by hashing its key.

    bucket = h60(salt:key) mod 100; [0,train) → train,
    [train,train+valid) → validation, rest → test.  Membership is a
    pure function of the key: stable across runs, partitionings, and
    engines (no sampling state, no RNG) — the property a 100 TB
    pipeline needs so re-runs and backfills land rows in the same
    split.
    """
    bucket = F.pmod(
        _h60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
        F.lit(100),
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("bucket", bucket.cast("bigint")).withColumn("split", split)


def doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: per-doc split assignment."""
    d = _docs(spark, sf_dir)
    return hash_split(d).select("doc_id", "bucket", "split")


DOC_HASH_SPLIT_SQL = f"""
SELECT doc_id,
       {_H60_DUCK.format(col="'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
       CASE WHEN {_H60_DUCK.format(col="'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
            WHEN {_H60_DUCK.format(col="'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


# ----------------------------------------------------------------------
# stratified deterministic sampling
# ----------------------------------------------------------------------
def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str = "doc_id",
    fraction: float = 0.2,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows per stratum, deterministically.

    keep ⇔ h60(salt:key) mod 1000 < fraction·1000.  Same engine-
    stable membership guarantee as ``hash_split``; stratification is
    free because the predicate is row-local (the stratum only matters
    for reporting, not for the keep decision).
    """
    thresh = int(round(fraction * 1000))
    keep = (
        F.pmod(
            _h60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
            F.lit(1000),
        )
        < thresh
    )
    return df.withColumn("__keep", keep)


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: per-lang totals vs deterministic 20% sample."""
    d = _docs(spark, sf_dir)
    s = stratified_sample(d, "lang", fraction=0.2)
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("__keep").cast("bigint")).alias("n_sampled"),
        )
        .withColumn(
            "sample_frac",
            F.round(F.col("n_sampled").cast("double") / F.col("n_total"), 4),
        )
        .select("lang", "n_total", "n_sampled", "sample_frac")
    )


DOC_STRATIFIED_SAMPLE_SQL = f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_H60_DUCK.format(col="'sample:' || CAST(doc_id AS VARCHAR)")} % 1000 < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       ROUND(CAST(SUM(CASE WHEN {_H60_DUCK.format(col="'sample:' || CAST(doc_id AS VARCHAR)")} % 1000 < 200 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS sample_frac
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ----------------------------------------------------------------------
# benchmark contamination (n-gram overlap vs a held-out eval set)
# ----------------------------------------------------------------------
def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
) -> DataFrame:
    """Per-corpus-doc overlap with the benchmark's word n-grams.

    The decontamination check every serious training pipeline runs:
    a training doc sharing long n-grams with an eval benchmark leaks
    the benchmark.  Benchmark n-grams (distinct, hashed) are tiny next
    to the corpus → broadcast; the corpus side streams through one
    explode + broadcast-semi-count, no corpus-sized shuffle.  Returns
    every corpus doc with its distinct-n-gram count, how many appear
    in the benchmark, and the overlap ratio.
    """
    bench_grams = (
        _shingles(benchmark, n).select(_h60("shingle").alias("h")).distinct()
    )
    corp = _shingles(corpus, n).select(
        "doc_id", _h60("shingle").alias("h")
    ).distinct()
    marked = corp.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "h", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_overlap"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_overlap").cast("double") / F.col("n_grams"), 6),
        )
        .select("doc_id", "n_grams", "n_overlap", "contamination")
    )


def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: docs 50+ checked against docs 0-49 as the 'benchmark'."""
    d = _docs(spark, sf_dir)
    return contamination(d.filter(F.col("doc_id") >= 50), d.filter(F.col("doc_id") < 50))


_SHINGLE5_DUCK = """
  SELECT doc_id,
         UNNEST(list_transform(
           generate_series(1, LEN(string_split(text, ' ')) - 4),
           i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
         )) AS shingle
  FROM documents
"""

DOC_CONTAMINATION_SQL = f"""
WITH grams AS (
  SELECT DISTINCT doc_id, {_H60_DUCK.format(col="shingle")} AS h
  FROM ({_SHINGLE5_DUCK})
),
bench AS (SELECT DISTINCT h FROM grams WHERE doc_id < 50),
corp AS (SELECT doc_id, h FROM grams WHERE doc_id >= 50),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM corp GROUP BY doc_id),
ov AS (
  SELECT c.doc_id, COUNT(*) AS n_overlap
  FROM corp c JOIN bench b ON c.h = b.h
  GROUP BY c.doc_id
)
SELECT s.doc_id, s.n_grams,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / s.n_grams, 6) AS contamination
FROM sizes s LEFT JOIN ov ON s.doc_id = ov.doc_id
ORDER BY s.doc_id
"""


# ----------------------------------------------------------------------
# PII scrubbing
# ----------------------------------------------------------------------
def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails and phone numbers with placeholder tokens and
    count what was removed.  Pure projection — JVM regex, no UDF, no
    shuffle; at 100 TB this is a map-only pass."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint")
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.regexp_count(after_email, F.lit(PHONE_RE)).cast("bigint")
    scrubbed = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", n_emails)
        .withColumn("n_phones", n_phones)
        .withColumn(text_col, scrubbed)
    )


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: decorate each doc with synthetic PII derived from
    its id (the corpus itself contains none), scrub it, and report
    counts + a hash of the scrubbed text.  Exercises the real regex
    path in both engines."""
    d = _docs(spark, sf_dir)
    decorated = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" today"),
        ),
    )
    return scrub_pii(decorated).select(
        "doc_id", "n_emails", "n_phones", F.md5("text").alias("scrub_hash")
    )


DOC_PII_SCRUB_SQL = """
WITH decorated AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' AS text
  FROM documents
),
scrub1 AS (
  SELECT doc_id,
         CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS text
  FROM decorated
)
SELECT doc_id, n_emails,
       CAST(LEN(regexp_extract_all(text, '\\+?\\d{1,2}-\\d{3}-\\d{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(text, '\\+?\\d{1,2}-\\d{3}-\\d{4}', '<PHONE>', 'g')) AS scrub_hash
FROM scrub1
ORDER BY doc_id
"""
