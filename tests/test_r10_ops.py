"""Round-10 operators: learned linear quality classifier."""

import hashlib

import pytest
from pyspark.sql import functions as F

from meteaudata_spark.ext import textstats

SF = "/root/testdata/sf0.001"


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_planted_weights_match_reference_hash(spark):
    rows = {
        r["bucket"]: r["weight_micros"]
        for r in textstats.planted_classifier_weights(spark, dim=8).collect()
    }
    assert len(rows) == 8
    for b in range(8):
        expect = (_h60_py(f"clsw-{b}") % 2001) * 1000 - 1000000
        assert rows[b] == expect
        assert -1000000 <= rows[b] <= 1000000


def test_classifier_separates_planted_vocabularies(spark):
    good = ["aurora", "benevolent", "clarity", "diligent", "eloquent"]
    bad = ["zzspam", "yyjunk", "xxnoise", "wwgarbage", "vvclutter"]
    dim = 64
    # train-free planted model: +0.5 for every bucket a good word hashes
    # to, -0.5 for bad-word buckets (the production weights_df shape)
    w = {}
    for t in good:
        w[_h60_py(t) % dim] = w.get(_h60_py(t) % dim, 0) + 500000
    for t in bad:
        w[_h60_py(t) % dim] = w.get(_h60_py(t) % dim, 0) - 500000
    weights = spark.createDataFrame(
        [(b, m) for b, m in w.items()], "bucket LONG, weight_micros LONG"
    )
    docs = spark.createDataFrame(
        [
            (1, " ".join(good * 3)),
            (2, " ".join(good + good[:2])),
            (3, " ".join(bad * 3)),
            (4, " ".join(bad + bad[:1])),
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r["doc_id"]: r
        for r in textstats.classifier_score(docs, weights, dim=dim).collect()
    }
    assert out[1]["label"] == "keep" and out[2]["label"] == "keep"
    assert out[3]["label"] == "drop" and out[4]["label"] == "drop"
    assert out[1]["logit_micros"] > 0 > out[3]["logit_micros"]
    # integer exactness: doc 1 is 15 good tokens
    assert out[1]["n_tokens"] == 15


def test_classifier_sparse_weights_and_empty_text(spark):
    # tokens hashing to buckets absent from the model contribute 0
    # (left join + coalesce), and empty docs drop out in both engines
    weights = spark.createDataFrame(
        [(0, 1000000)], "bucket LONG, weight_micros LONG"
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "")], "doc_id LONG, text STRING"
    )
    rows = textstats.classifier_score(docs, weights, dim=2).collect()
    ids = {r["doc_id"] for r in rows}
    assert 2 not in ids  # empty text produces no tokens
    (r1,) = [r for r in rows if r["doc_id"] == 1]
    hit = sum(
        1000000 for t in ["alpha", "beta", "gamma"] if _h60_py(t) % 2 == 0
    )
    assert r1["logit_micros"] == hit


def test_classifier_bias_shifts_decision(spark):
    weights = spark.createDataFrame(
        [(0, 0), (1, 0)], "bucket LONG, weight_micros LONG"
    )
    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    keep = textstats.classifier_score(
        docs, weights, dim=2, bias_micros=1
    ).collect()[0]
    drop = textstats.classifier_score(
        docs, weights, dim=2, bias_micros=-1
    ).collect()[0]
    assert keep["label"] == "keep" and drop["label"] == "drop"


# ----------------------------------------------------------------------
# incremental dedup ledger
# ----------------------------------------------------------------------
def _pairs_key(rows):
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}


def test_incremental_equals_full_recompute(spark):
    from meteaudata_spark.ext import dedup

    full = _pairs_key(
        dedup.minhash_lsh_pairs(dedup._docs(spark, SF)).collect()
    )
    inc_rows = dedup.doc_incremental_dedup(spark, SF, n_shards=4).collect()
    assert _pairs_key(inc_rows) == full
    # each pair minted exactly once, at the later doc's shard
    for r in inc_rows:
        assert r["minted_shard"] == max(r["doc_a"] % 4, r["doc_b"] % 4)


def test_incremental_adversarial_split_orders(spark):
    # shard sizes 1..n and reversed arrival must converge identically
    from meteaudata_spark.ext import dedup

    d = dedup._docs(spark, SF).filter(F.col("doc_id") < 60)
    full = _pairs_key(dedup.minhash_lsh_pairs(d).collect())

    store = None
    mined = {}
    # arrival order: big tail shard first, then tiny shards
    splits = [
        d.filter(F.col("doc_id") >= 40),
        d.filter((F.col("doc_id") >= 39) & (F.col("doc_id") < 40)),
        d.filter(F.col("doc_id") < 39),
    ]
    for shard in splits:
        delta, store = dedup.incremental_minhash_pairs(store, shard)
        for (a, b), j in _pairs_key(delta.collect()).items():
            assert (a, b) not in mined  # minted exactly once
            mined[(a, b)] = j
    assert mined == full


def test_signature_store_roundtrip(spark, tmp_path):
    from meteaudata_spark.ext import dedup

    d = dedup._docs(spark, SF)
    shard1 = d.filter(F.col("doc_id") % 2 == 0)
    shard2 = d.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "sigstore")

    _, sigs1 = dedup.incremental_minhash_pairs(None, shard1)
    dedup.write_signature_store(sigs1.filter(F.col("doc_id") % 2 == 0), path)

    # next run: load the persisted store, delta-mine the second shard
    store = dedup.read_signature_store(spark, path)
    delta2, _ = dedup.incremental_minhash_pairs(store, shard2)

    full = _pairs_key(dedup.minhash_lsh_pairs(d).collect())
    d1 = _pairs_key(dedup.minhash_lsh_pairs(shard1).collect())
    got = {**d1, **_pairs_key(delta2.collect())}
    assert got == full


# ----------------------------------------------------------------------
# market basket / PR curve / recall curve
# ----------------------------------------------------------------------
def test_market_basket_lift_math(spark):
    from meteaudata_spark.ext import relational

    rows = relational.orders_market_basket(spark, SF, top_k=20).collect()
    assert 0 < len(rows) <= 20
    import duckdb

    con = duckdb.connect()
    n_orders = con.execute(
        f"SELECT count(*) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    for r in rows[:5]:
        assert r["part_a"] < r["part_b"]
        expect = round(
            (r["n_both"] * n_orders * 1000000) / (r["n_a"] * r["n_b"])
        )
        assert r["lift_micros"] == expect
    # ranked by support, ties by part ids
    supports = [r["n_both"] for r in rows]
    assert supports == sorted(supports, reverse=True)


def test_pr_curve_planted(spark):
    from meteaudata_spark.ext.textstats import classifier_pr_curve

    scored = spark.createDataFrame(
        [(1, 900000), (2, 500000), (3, -200000), (4, -900000)],
        "doc_id LONG, avg_logit_micros LONG",
    )
    truth = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, False)],
        "doc_id LONG, is_good BOOLEAN",
    )
    rows = {
        r["threshold_micros"]: r
        for r in classifier_pr_curve(
            scored, truth, thresholds=[0, 1000000]
        ).collect()
    }
    at0 = rows[0]
    assert (at0["tp"], at0["fp"], at0["fn"], at0["tn"]) == (2, 0, 0, 2)
    assert at0["precision_bp"] == 10000 and at0["recall_bp"] == 10000
    hi = rows[1000000]
    assert (hi["tp"], hi["fp"]) == (0, 0)
    assert hi["precision_bp"] is None  # no predictions -> undefined
    assert hi["recall_bp"] == 0


def test_recall_curve_consistent_with_ann_recall(spark):
    from meteaudata_spark.ext import simsearch

    curve = {
        r["k"]: r
        for r in simsearch.emb_recall_curve(spark, SF).collect()
    }
    assert set(curve) == {1, 3, 5, 10}
    for k, r in curve.items():
        assert 0 <= r["macro_recall_micros"] <= 1000000
        assert r["total_overlap"] <= k * r["n_queries"]
    # the k=5 point must equal the single-point evaluation row
    ann = simsearch.emb_ann_recall(spark, SF).collect()[0]
    assert curve[5]["macro_recall_micros"] == ann["macro_recall_micros"]


# ----------------------------------------------------------------------
# exact_micros resample means (the sf1 ts_interpolate divergence fix)
# ----------------------------------------------------------------------
def test_resample_exact_micros_is_order_independent(spark):
    import numpy as np
    import pandas as pd

    from meteaudata_spark.operators import kernels

    rng = np.random.default_rng(7)
    idx = pd.date_range("2024-01-01", freq="13s", periods=5000)
    pdf = pd.DataFrame(
        {"timestamp": idx, "value": rng.normal(50, 30, 5000)}
    )
    df = spark.createDataFrame(pdf)

    def run(d):
        out = kernels.resample_mean(d, "5min", exact_micros=2**20).toPandas()
        return out.sort_values("timestamp").reset_index(drop=True)

    base = run(df.coalesce(1))
    shuffled = run(df.orderBy(F.rand(3)).repartition(17))
    # bit-identical, not allclose: integer partial sums are order-free
    assert (base["value"].values == shuffled["value"].values).all()
    # and the quantized mean matches the pandas reference within 2^-20
    ref = (
        pdf.set_index("timestamp")["value"].resample("5min").mean()
    )
    assert np.allclose(base["value"].values, ref.values, atol=2**-19)


def test_resample_exact_micros_empty_buckets_stay_null(spark):
    import pandas as pd

    from meteaudata_spark.operators import kernels

    pdf = pd.DataFrame(
        {
            "timestamp": pd.to_datetime(
                ["2024-01-01 00:00:30", "2024-01-01 00:20:10"]
            ),
            "value": [1.25, 7.5],
        }
    )
    out = (
        kernels.resample_mean(
            spark.createDataFrame(pdf), "5min", exact_micros=2**20
        )
        .toPandas()
        .sort_values("timestamp")
    )
    assert len(out) == 5  # 00:00 .. 00:20 inclusive
    assert out["value"].isna().sum() == 3


# key_skew_report — shuffle-skew observability
def test_key_skew_planted_hot_key(spark):
    from meteaudata_spark.ext.corpus_ops import key_skew_report

    # 99 keys with 1 row each + one hot key with 901 rows
    rows = [(k,) for k in range(99)] + [(999,)] * 901
    df = spark.createDataFrame(rows, "user_id BIGINT")
    out = key_skew_report(df, "user_id").collect()[0]
    assert out["n_keys"] == 100
    assert out["n_rows"] == 1000
    assert out["max_count"] == 901
    # 50th/90th/99th percentile of per-key counts: 99 keys at 1,
    # 1 key at 901 -> p50=p90=p99=1 (cum 99 covers up to 99%)
    assert out["p50_count"] == 1
    assert out["p90_count"] == 1
    assert out["p99_count"] == 1
    assert out["top_key_share_bp"] == 9010  # 901/1000
    assert out["skew_ratio_bp"] == 901000  # 901 / (1000/100) keys-mean


def test_key_skew_uniform_is_even(spark):
    from meteaudata_spark.ext.corpus_ops import key_skew_report

    rows = [(k % 50,) for k in range(500)]
    df = spark.createDataFrame(rows, "user_id BIGINT")
    out = key_skew_report(df, "user_id").collect()[0]
    assert out["max_count"] == 10
    assert out["p50_count"] == out["p99_count"] == 10
    assert out["skew_ratio_bp"] == 10000  # perfectly even


# char_entropy — compression-proxy quality signal
def test_char_entropy_planted_values(spark):
    import math

    from meteaudata_spark.ext.textstats import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaaaaaa"),          # one char: H = 0
            (2, "abababab"),          # two chars equal: H = ln 2
            (3, "abcd"),              # four distinct: H = ln 4
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r.entropy_micros for r in char_entropy(df).collect()}
    assert out[1] == 0
    assert abs(out[2] - round(math.log(2) * 1e6)) <= 1
    assert abs(out[3] - round(math.log(4) * 1e6)) <= 1
    # entropy is non-negative by construction (L monotone)
    assert all(v >= 0 for v in out.values())


def test_char_entropy_flags_repetitive_docs(spark):
    from meteaudata_spark.ext.textstats import char_entropy

    df = spark.createDataFrame(
        [(1, "spam " * 200), (2, "the quick brown fox jumps over 123!?")],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r.entropy_micros for r in char_entropy(df).collect()}
    assert out[1] < 2500000 < out[2]


# bpe_merge_candidates — vocabulary-induction pair mining
def test_bpe_merges_planted_corpus(spark):
    from meteaudata_spark.ext.textstats import bpe_merge_candidates

    df = spark.createDataFrame(
        [(1, "new york new york new york"), (2, "york city"), (3, "solo")],
        "doc_id BIGINT, text STRING",
    )
    rows = bpe_merge_candidates(df, top_k=3).collect()
    assert (rows[0].tok1, rows[0].tok2, rows[0].pair_count) == (
        "new", "york", 3,
    )
    got = {(r.tok1, r.tok2): r.pair_count for r in rows}
    assert got[("york", "new")] == 2
    assert got[("york", "city")] == 1


def test_bpe_merges_tiebreak_deterministic(spark):
    from meteaudata_spark.ext.textstats import bpe_merge_candidates

    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "a c")], "doc_id BIGINT, text STRING"
    )
    rows = bpe_merge_candidates(df, top_k=2).collect()
    # all pairs count 1 -> lexicographic cut: (a,b), (a,c)
    assert [(r.tok1, r.tok2) for r in rows] == [("a", "b"), ("a", "c")]


# dedup agreement matrix
def test_dedup_agreement_counts_consistent(spark):
    from meteaudata_spark.ext import dedup

    row = dedup.doc_dedup_agreement(spark, SF).collect()[0]
    assert row.n_both + row.n_only_minhash == row.n_minhash_pairs
    assert row.n_both + row.n_only_simhash == row.n_simhash_pairs
    union = row.n_minhash_pairs + row.n_simhash_pairs - row.n_both
    assert row.pair_jaccard_bp == (row.n_both * 10000) // union


# burst detection
def test_burst_detection_planted_spike(spark):
    import pandas as pd

    from meteaudata_spark.ext import timeseries_queries as tsq

    # 30 quiet hours at 4 events/h, then one hour with 20 events:
    # trailing-24 sum = 96, 20*24=480 >= 3*96=288 -> burst, 2.08x
    rows = []
    for h in range(30):
        for i in range(4):
            rows.append(("a", pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h, minutes=i)))
    for i in range(20):
        rows.append(("a", pd.Timestamp("2024-01-02 06:00") + pd.Timedelta(minutes=i)))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"])
    )
    import meteaudata_spark.ext.timeseries_queries as m

    orig = m._events
    m._events = lambda s, d: ev
    try:
        out = tsq.ts_burst_detection(spark, SF).collect()
    finally:
        m._events = orig
    (r,) = out
    assert r.n_buckets == 31
    assert r.n_bursts == 1
    assert r.max_intensity_bp == (20 * 24 * 10000) // 96  # 50000
    assert str(r.first_burst) == "2024-01-02 06:00:00"


def test_burst_detection_quiet_baseline_needs_full_history(spark):
    import pandas as pd

    from meteaudata_spark.ext import timeseries_queries as tsq
    import meteaudata_spark.ext.timeseries_queries as m

    # only 10 preceding buckets: n_prev < 24 -> never a burst
    rows = []
    for h in range(10):
        rows.append(("a", pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h)))
    for i in range(50):
        rows.append(("a", pd.Timestamp("2024-01-01 12:00") + pd.Timedelta(minutes=i)))
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "ts"]))
    orig = m._events
    m._events = lambda s, d: ev
    try:
        (r,) = tsq.ts_burst_detection(spark, SF).collect()
    finally:
        m._events = orig
    assert r.n_bursts == 0 and r.max_intensity_bp is None
