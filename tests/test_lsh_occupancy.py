"""Occupancy auto-derive for the LSH plane count (ext/simsearch.py):
callers who omit n_planes must get a corpus-sized default that keeps
expected bucket occupancy n/2^planes ~ _LSH_TARGET_OCCUPANCY, while the
oracle gate keeps pinning the fixed reproducible literals."""

import pytest
from pyspark.sql import functions as F

from meteaudata_spark.ext import simsearch
from meteaudata_spark.ext.simsearch import (
    _LSH_PLANES,
    _LSH_TABLES,
    _LSH_TARGET_OCCUPANCY,
    derive_lsh_planes,
    lsh_bucketize,
    lsh_near_pairs,
)


def test_derived_plane_counts_pinned():
    # never below the recall-tuned gate default
    assert derive_lsh_planes(0) == _LSH_PLANES
    assert derive_lsh_planes(10) == _LSH_PLANES
    assert derive_lsh_planes(500) == _LSH_PLANES
    # the SCALE.md regimes: occupancy lands in the tens
    assert derive_lsh_planes(1_000_000) == 15
    assert derive_lsh_planes(10_000_000) == 19
    for n in (1_000_000, 10_000_000):
        occ = n / 2 ** derive_lsh_planes(n)
        assert occ <= _LSH_TARGET_OCCUPANCY
        assert occ > _LSH_TARGET_OCCUPANCY / 4  # not absurdly over-split


def test_explicit_zero_knobs_raise(spark):
    emb = spark.createDataFrame(
        [(0, 0, [0.1] * simsearch._LSH_DIM)],
        "vec_id bigint, label int, embedding array<double>",
    )
    with pytest.raises(ValueError):
        lsh_bucketize(emb, n_tables=0).collect()
    with pytest.raises(ValueError):
        lsh_bucketize(emb, n_planes=0).collect()


def test_small_corpus_derives_gate_default(spark):
    # below the occupancy target the derived count equals the gate
    # literal, so omitted-knob buckets match explicit-knob buckets
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    auto = lsh_bucketize(emb).orderBy("vec_id", "table").collect()
    pinned = lsh_bucketize(
        emb, n_tables=_LSH_TABLES, n_planes=_LSH_PLANES
    ).orderBy("vec_id", "table").collect()
    assert auto == pinned


def test_near_pairs_n_vectors_skips_count(spark):
    # passing n_vectors must avoid the extra count() job yet produce
    # the same derived plan; equality of results pins the passthrough
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    with_hint = lsh_near_pairs(emb, 0.35, n_vectors=n)
    counted = lsh_near_pairs(emb, 0.35)
    assert sorted(map(tuple, with_hint.collect())) == sorted(
        map(tuple, counted.collect())
    )


def test_two_tier_derive_params():
    from meteaudata_spark.ext.simsearch import (
        _LSH_MAX_TABLES,
        _LSH_PAIRGEN_OCCUPANCY,
        derive_lsh_params,
    )

    # small corpora: exact gate literals (byte-identical oracle buckets)
    assert derive_lsh_params(0) == (_LSH_TABLES, _LSH_PLANES)
    assert derive_lsh_params(500) == (_LSH_TABLES, _LSH_PLANES)
    # 1M vectors: occupancy ~1 (20 planes; candidates = T*n*occ/2 is
    # the verify-stage cost), recall bought back with tables (the
    # closed-form match of the occupancy-32 recall at cosine 0.9)
    t, p = derive_lsh_params(1_000_000)
    assert p == 20 and 1_000_000 / 2**p <= _LSH_PAIRGEN_OCCUPANCY
    assert _LSH_TABLES < t <= _LSH_MAX_TABLES
    # 10M: planes deepen, table count stays bounded
    t10, p10 = derive_lsh_params(10_000_000)
    assert p10 > p and _LSH_TABLES < t10 <= _LSH_MAX_TABLES
    # recall at cosine 0.9 must not drop below the single-tier config
    import math

    c = 1.0 - math.acos(0.9) / math.pi
    for n in (1_000_000, 10_000_000):
        tt, pp = derive_lsh_params(n)
        ref = derive_lsh_planes(n)
        r_ref = 1.0 - (1.0 - c**ref) ** _LSH_TABLES
        r_new = 1.0 - (1.0 - c**pp) ** tt
        assert r_new >= r_ref - 1e-9, (n, r_new, r_ref)


def test_knobless_bucketize_uses_two_tier(spark):
    from meteaudata_spark.ext.simsearch import derive_lsh_params

    # a synthetic corpus big enough to clear the gate floor: the
    # knob-less path must emit derive_lsh_params' table count
    n = 10_000
    emb = spark.range(n).selectExpr(
        "id as vec_id",
        "0 as label",
        f"transform(sequence(1, {simsearch._LSH_DIM}), "
        "i -> cast(sin(xxhash64(id, i)) as double)) as embedding",
    )
    t_exp, _ = derive_lsh_params(n)
    tables = lsh_bucketize(emb, n_vectors=n).select("table").distinct().count()
    assert tables == t_exp > _LSH_TABLES
