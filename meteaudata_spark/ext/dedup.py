"""Deduplication operators over the ``documents`` table ([EXT]):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale ladder (each step trades exactness for a smaller join):
  * exact        — one hash-groupBy; the O(n) baseline.
  * ngram-jaccard— shingle self-join; exact Jaccard, quadratic in
                   the worst case but the shingle join only pairs
                   docs sharing a shingle (inverted-index semantics).
  * minhash-lsh  — banded signatures; candidate pairs are only docs
                   colliding in ≥1 band; exact-verify after.  This is
                   the 100 TB path.
  * simhash      — one 16-bit signature per doc; hamming-bucket join.

All shingling/hashing is Spark built-ins (xxhash64, md5) — no Python
in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus small enough that
# a·h+b never overflows a signed 64-bit long under ANSI arithmetic
_MERSENNE = (1 << 31) - 1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per md5(text); report how
    many copies each kept doc had."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("kept_doc_id", "text_hash", "n_copies")
        
    )


DOC_EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS kept_doc_id, md5(text) AS text_hash, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY kept_doc_id
"""


def _shingles(d: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    ``split`` runs once per row (projected before the lambda) — with
    the split inside the lambda Catalyst re-evaluates it per shingle
    index, turning an O(words) projection into O(words²)."""
    # Spark SQL array subscript is 0-based inside lambda expressions
    shingle_arr = F.expr(
        f"array_distinct(transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))))"
    )
    return (
        d.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
        .select("doc_id", F.explode(shingle_arr).alias("shingle"))
    )


def _hashed_shingles(d: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, h) with h = xxhash64(shingle): 8-byte join/group keys
    instead of ~20-byte strings.  Jaccard over hashed shingles equals
    string Jaccard up to a ~n_shingles²/2⁶⁴ collision probability —
    negligible, and the same trick every large-scale dedup pipeline
    uses."""
    return _shingles(d, n).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )


def doc_ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.25, n: int = 3
) -> DataFrame:
    """Near-duplicate pairs by exact word-3-gram Jaccard ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle (docs sharing no shingle never pair), count intersections,
    then |A∩B| / (|A|+|B|−|A∩B|).
    """
    d = _docs(spark, sf_dir)
    sh = _hashed_shingles(d, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        
    )
    return jac


DOC_NGRAM_JACCARD_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(
             generate_series(1, LEN(string_split(text, ' ')) - 2),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
           )) AS shingle
    FROM documents
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.25
ORDER BY doc_a, doc_b
"""


def doc_minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.25,
    n: int = 3,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    Signature: ``minhash_j(doc) = min over shingles of
    (a_j·xxhash64(shingle) + b_j) mod p`` with fixed (a_j, b_j) drawn
    deterministically from j (reproducible across runs/engines).
    Bands of ``num_hashes/bands`` rows each; docs colliding on any
    band's full sub-signature become candidates; candidates are
    verified with exact Jaccard so the output has no false positives
    (only the recall is approximate).  At 100 TB the band join
    replaces the quadratic shingle self-join with group-by-bucket.
    """
    rows_per_band = num_hashes // bands
    d = _docs(spark, sf_dir)
    # one shingle pass feeds both the signature agg and the verify
    # docsets branch
    sh = _hashed_shingles(d, n).persist()

    h = F.pmod(F.col("h"), F.lit(_MERSENNE))
    # deterministic per-j coefficients (odd a, arbitrary b)
    sig_cols = [
        F.min(
            F.pmod(
                (F.lit(2 * j + 1) * h + F.lit(7919 * (j + 1))), F.lit(_MERSENNE)
            )
        ).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    sigs = sh.groupBy("doc_id").agg(*sig_cols)

    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.hash(
                *[F.col(f"mh_{band * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for band in range(bands)
    ]
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # exact verify: join the (small) candidate-pair set against
    # per-doc sorted shingle-hash sets and intersect the arrays.
    # Candidates drive the join — the quadratic shingle self-join
    # never runs; each side is one shuffle of the candidate ids
    # against the doc-keyed set table.  This is the 100 TB shape:
    # |candidates| ≪ |all sharing pairs| by LSH design.
    docsets = sh.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("h")).alias("hs")
    )
    verified = (
        candidates.join(
            docsets.select(
                F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")
            ),
            "doc_a",
        )
        .join(
            docsets.select(
                F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("n_inter"),
            F.size("hs_a").alias("n_a"),
            F.size("hs_b").alias("n_b"),
        )
    )
    return (
        verified.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def doc_simhash(spark: SparkSession, sf_dir: str, bits: int = 16) -> DataFrame:
    """Per-doc SimHash signature: sign-sum of token-hash bits.

    bit_b(doc) = 1 iff Σ_tokens (bit_b(xxhash64(token)) ? +1 : −1) > 0.
    Near-dup candidates are docs whose signatures differ in ≤k bits —
    found by exact-match join on signature rotations (not included in
    the oracle set; signature itself is deterministic and testable).
    """
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    h = F.xxhash64("token")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.cast("bigint").alias("simhash"))
