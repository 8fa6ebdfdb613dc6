"""EXT operator sanity tests at sf0.001 (the full oracle gate runs via
tools/check_correctness.py at sf0.01; these are fast structural
checks)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    return e


def test_all_queries_declared_with_oracles(entry):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # every declared query carries a DuckDB oracle — the md5-derived
    # h60 hash makes even minhash/simhash cross-engine, and IVF is
    # plain window SQL
    assert set(qs) - set(oracles) == set()


def test_entry_smoke(spark, entry):
    df = entry.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["bucket_ts", "avg_across_series"]


def test_asof_join_semantics(spark):
    import pandas as pd

    from meteaudata_spark.ext.asof import asof_join_backward

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                "t": pd.to_datetime(
                    ["2020-01-01 10:00", "2020-01-01 11:00", "2020-01-01 09:00",
                     "2020-01-01 10:00"]
                ),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "rt": pd.to_datetime(
                    ["2020-01-01 09:30", "2020-01-01 10:00", "2020-01-01 12:00"]
                ),
                "rv": [1.0, 2.0, 3.0],
            }
        )
    )
    out = (
        asof_join_backward(left, right, "t", "rt", by=["k"], value_cols=["rv"])
        .orderBy("k", "t")
        .toPandas()
    )
    # a@09:00 → no match; a@10:00 → exact-time match 2.0 (inclusive);
    # a@11:00 → 2.0; b@10:00 → no match (right is later)
    assert out["rv"].tolist()[0] != out["rv"].tolist()[0]  # NaN
    assert out["rv"].tolist()[1] == 2.0
    assert out["rv"].tolist()[2] == 2.0
    import math

    assert math.isnan(out["rv"].tolist()[3])


def test_minhash_recall_vs_exact(spark, entry):
    """MinHash-LSH candidates must recover a healthy share of the true
    Jaccard pairs (here: all of them, empirically)."""
    from meteaudata_spark.ext import dedup

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.doc_ngram_jaccard_pairs(spark, SF).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in dedup.doc_minhash_lsh_pairs(spark, SF).collect()
    }
    assert exact, "exact pass found no pairs — fixture changed?"
    assert len(approx & exact) / len(exact) >= 0.8


def test_simhash_close_for_similar_docs(spark):
    from meteaudata_spark.ext import dedup

    sigs = dedup.doc_simhash(spark, SF).collect()
    assert len({r.simhash for r in sigs}) > 1  # not degenerate


def test_ivf_recall_vs_brute_force(spark):
    """IVF with 4 of 16 lists probed must still recover most of the
    exact top-5 (approximation = unprobed lists only)."""
    from meteaudata_spark.ext import simsearch

    exact = {
        (r.query_id, r.vec_id)
        for r in simsearch.emb_cosine_topk(spark, SF).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in simsearch.emb_ivf_topk(spark, SF).collect()
    }
    assert exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, recall


def test_lsh_buckets_shape(spark):
    from meteaudata_spark.ext import simsearch

    b = simsearch.emb_lsh_buckets(spark, SF)
    pdf = b.toPandas()
    n_vecs = pdf["vec_id"].nunique()
    assert len(pdf) == n_vecs * simsearch._LSH_TABLES
    assert pdf["bucket"].between(0, 2 ** simsearch._LSH_PLANES - 1).all()


def test_wide_view_alignment(spark, provenance):
    """Signal.to_wide_dataframe: full-outer alignment on timestamp
    (the reference's _to_dataframe analog, J1)."""
    import numpy as np
    import pandas as pd

    from meteaudata_spark.operators.univariate import resample
    from meteaudata_spark.signal import Signal

    idx = pd.date_range("2020-01-01", freq="6min", periods=30)
    ser = pd.Series(np.arange(30.0), index=idx, name="RAW")
    sig = Signal(
        input_data=ser, name="WV", units="x", provenance=provenance, spark=spark
    )
    sig.process(["WV#1_RAW#1"], resample, "5min")
    wide = sig.to_wide_dataframe().toPandas()
    assert set(wide.columns) == {"timestamp", "WV#1_RAW#1", "WV#1_RESAMPLED#1"}
    # outer join: all timestamps from both series present
    n_raw = 30
    n_res = sig.time_series["WV#1_RESAMPLED#1"].count()
    assert len(wide) >= max(n_raw, n_res)


def test_embedding_dups_keep_lower_id(spark):
    from meteaudata_spark.ext import dedup

    rows = dedup.doc_embedding_dups(spark, SF).collect()
    # keep/drop orientation: kept id strictly below dropped id
    assert all(r.kept_doc_id < r.dropped_doc_id for r in rows)
    assert all(r.cosine >= 0.4 for r in rows)


def test_h60_hash_cross_engine(spark):
    """The md5-h60 hash must agree bit-for-bit across Spark, DuckDB,
    and Python — it keys the minhash/simhash oracles."""
    import hashlib

    import duckdb
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.dedup import _H60_DUCK, _h60

    words = ["", "a", "hello world", "naïve café", "0" * 100, "xyz 123"]
    sdf = spark.createDataFrame([(w,) for w in words], "s STRING")
    got_spark = {
        r.s: r.h for r in sdf.select("s", _h60("s").alias("h")).collect()
    }
    con = duckdb.connect()
    expr = _H60_DUCK.format(col="s")
    for w in words:
        (got_duck,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS s)", [w]
        ).fetchone()
        ref = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        assert got_spark[w] == got_duck == ref, (w, got_spark[w], got_duck, ref)


def test_every_query_runs_at_smallest_sf(spark, entry):
    """Every declared gate query must execute on the tiniest dataset —
    catches empty-input and small-data edge crashes before the driver
    does."""
    failures = []
    for name, fn in entry.queries().items():
        try:
            fn(spark, SF).count()
        except Exception as exc:  # noqa: BLE001 - collect all failures
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, failures


# ----------------------------------------------------------------------
# generalized as-of join (round 2): directions + tolerance vs pandas
# ----------------------------------------------------------------------
def _asof_case(spark, direction, tolerance=None):
    import numpy as np
    import pandas as pd
    from meteaudata_spark.ext.asof import asof_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 60),
            "t": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.integers(0, 5000, 60), unit="s"),
            "lv": np.arange(60.0),
        }
    ).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 40),
            "rt": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.integers(0, 5000, 40), unit="s"),
            "rv": np.arange(40.0) * 10,
        }
    ).sort_values("rt").reset_index(drop=True)

    ref = pd.merge_asof(
        left.sort_values("t"),
        right.rename(columns={"rt": "t"}).sort_values("t"),
        on="t",
        by="k",
        direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_time="t",
            right_time="rt",
            by=["k"],
            value_cols=["rv"],
            direction=direction,
            tolerance_seconds=tolerance,
        )
        .orderBy("lv")
        .toPandas()
    )
    ref = ref.sort_values("lv").reset_index(drop=True)
    got = got.sort_values("lv").reset_index(drop=True)
    assert np.allclose(got["rv"].values, ref["rv"].values, equal_nan=True), (
        direction,
        tolerance,
        got["rv"].values,
        ref["rv"].values,
    )


def test_asof_backward_matches_pandas(spark):
    _asof_case(spark, "backward")


def test_asof_forward_matches_pandas(spark):
    _asof_case(spark, "forward")


def test_asof_nearest_matches_pandas(spark):
    _asof_case(spark, "nearest")


def test_asof_tolerance_matches_pandas(spark):
    _asof_case(spark, "backward", tolerance=600)
    _asof_case(spark, "forward", tolerance=600)
    _asof_case(spark, "nearest", tolerance=600)


def test_simhash_near_pairs_equals_brute_force(spark):
    """The pigeonhole block cover must lose NOTHING: banded candidates
    + hamming verify == brute-force all-pairs hamming join."""
    from pyspark.sql import functions as F

    from meteaudata_spark.ext import dedup

    sf = "/root/testdata/sf0.001"
    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.doc_simhash_near_pairs(spark, sf, k=2).collect()
    }
    sig = dedup.doc_simhash(spark, sf)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["doc_a"], r["doc_b"]): r["h"]
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("bigint"))
        .filter(F.col("h") <= 2)
        .collect()
    }
    assert banded == brute
