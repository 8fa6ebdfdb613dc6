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


# ----------------------------------------------------------------------
# cohort LTV
# ----------------------------------------------------------------------
def test_cohort_ltv_planted_matrix(spark, tmp_path):
    import datetime as dt

    rows = [
        # cust 1: cohort Jan, orders in Jan, Feb, far future (clamped)
        (1, dt.datetime(2020, 1, 5), 10.00),
        (1, dt.datetime(2020, 2, 20), 20.00),
        (1, dt.datetime(2022, 6, 1), 5.00),
        # cust 2: cohort Feb only
        (2, dt.datetime(2020, 2, 1), 7.50),
    ]
    spark.createDataFrame(
        rows, "o_custkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from meteaudata_spark.ext.relational import orders_cohort_ltv

    out = {
        (str(r["cohort_month"])[:7], r["months_since"]): r
        for r in orders_cohort_ltv(spark, str(tmp_path)).collect()
    }
    assert out[("2020-01", 0)]["revenue_cents"] == 1000
    assert out[("2020-01", 1)]["revenue_cents"] == 2000
    # 29 months out clamps into the months_since=12 tail bucket
    assert out[("2020-01", 12)]["revenue_cents"] == 500
    assert out[("2020-02", 0)]["n_customers"] == 1
    assert len(out) == 4


def test_cohort_ltv_cents_quantize_per_order(spark, tmp_path):
    import datetime as dt

    # two orders whose DOUBLE sum rounds differently than per-order cents
    rows = [
        (1, dt.datetime(2020, 1, 5), 0.145),
        (1, dt.datetime(2020, 1, 6), 0.145),
    ]
    spark.createDataFrame(
        rows, "o_custkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from meteaudata_spark.ext.relational import orders_cohort_ltv

    row = orders_cohort_ltv(spark, str(tmp_path)).collect()[0]
    # 0.145 → 14 cents (IEEE 0.145 is just below the half) twice = 28,
    # never round(0.29*100)=29
    assert row["revenue_cents"] == 28


# ----------------------------------------------------------------------
# dip/spike pattern detection
# ----------------------------------------------------------------------
def test_dip_spike_planted_shapes(spark):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    rows = []
    # series A: flat 100, one dip to 10 (both fences hit), flat
    for i, v in enumerate([100.0, 100.0, 10.0, 100.0, 100.0]):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, "a", v))
    # series B: one spike to 300 among 100s
    for i, v in enumerate([100.0, 300.0, 100.0]):
        rows.append((10 + i, t0 + dt.timedelta(minutes=i), 1, "b", v))
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE"
    )
    from meteaudata_spark.ext.timeseries_queries import dip_spike

    out = dip_spike(df, ["user_id", "event_type"]).collect()
    dips = [r for r in out if r["is_dip"]]
    spikes = [r for r in out if r["is_spike"]]
    assert len(dips) == 1 and dips[0]["event_id"] == 2
    assert dips[0]["dip_depth_micros"] == 90_000_000
    assert len(spikes) == 1 and spikes[0]["event_id"] == 11
    assert spikes[0]["spike_height_micros"] == 200_000_000


def test_dip_spike_fence_is_exclusive_at_boundary(spark):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    # exact 25% drop (100 → 75): 75*10000 == 100*7500 — NOT a dip
    rows = [
        (0, t0, 1, "a", 100.0),
        (1, t0 + dt.timedelta(minutes=1), 1, "a", 75.0),
        (2, t0 + dt.timedelta(minutes=2), 1, "a", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE"
    )
    from meteaudata_spark.ext.timeseries_queries import dip_spike

    out = {r["event_id"]: r for r in dip_spike(df, ["user_id", "event_type"]).collect()}
    assert not out[1]["is_dip"]
    # edges are never dips/spikes (NULL neighbour coalesces to False)
    assert not out[0]["is_dip"] and not out[2]["is_spike"]


# ----------------------------------------------------------------------
# boilerplate report (corpus-global C4 rule)
# ----------------------------------------------------------------------
def test_boilerplate_shared_across_sources_counts(spark):
    seg = "w1 w2 w3 w4 w5 w6 w7 w8"
    uniq = "u{} x{} y{} z{} p{} q{} r{} s{}"
    docs = spark.createDataFrame(
        [
            (1, seg + " " + uniq.format(*[1] * 8), "sA"),
            (2, seg + " " + uniq.format(*[2] * 8), "sB"),
            (3, uniq.format(*[3] * 8), "sB"),
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    from meteaudata_spark.ext.dedup import boilerplate_report

    out = {r["source"]: r for r in boilerplate_report(docs).collect()}
    # the 8-word segment is shared globally (docs 1+2, different sources)
    assert out["sA"]["n_shared_segments"] == 1
    assert out["sA"]["shared_occ"] == 1
    assert out["sA"]["boilerplate_bp"] == 5000  # 1 of 2 segments
    assert out["sB"]["n_shared_segments"] == 1
    assert out["sB"]["n_docs"] == 2
    assert out["sB"]["n_segment_occ"] == 3


def test_boilerplate_within_doc_repeat_not_shared(spark):
    seg = "a1 a2 a3 a4 a5 a6 a7 a8"
    docs = spark.createDataFrame(
        [(1, seg + " " + seg, "sA")],
        "doc_id LONG, text STRING, source STRING",
    )
    from meteaudata_spark.ext.dedup import boilerplate_report

    row = boilerplate_report(docs).collect()[0]
    # same segment twice in ONE doc: occurrences 2, but nd_global = 1
    assert row["n_segment_occ"] == 2
    assert row["n_distinct_segments"] == 1
    assert row["n_shared_segments"] == 0


# ----------------------------------------------------------------------
# Zipf fit
# ----------------------------------------------------------------------
def test_zipf_planted_power_law(spark):
    import math

    # counts EXACTLY rank^-1 scaled: c(r) = 1200/r for r=1..6 → slope ≈ −1
    counts = {f"t{r}": 1200 // r for r in range(1, 7)}
    text = " ".join(" ".join([w] * c) for w, c in counts.items())
    docs = spark.createDataFrame(
        [(1, text, "en")], "doc_id LONG, text STRING, lang STRING"
    )
    from meteaudata_spark.ext.textstats import zipf_fit

    row = zipf_fit(docs).collect()[0]
    assert row["n_types"] == 6
    # exact replication of the operator's integer math
    xs = [round(math.log(r) * 1e6) for r in range(1, 7)]
    ys = [round(math.log(counts[f"t{r}"]) * 1e6) for r in range(1, 7)]
    n = 6
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert row["zipf_slope_micros"] == round(num / den * 1e6)
    assert -1_100_000 < row["zipf_slope_micros"] < -900_000


def test_zipf_rank_ties_break_lexically(spark):
    # two tokens with equal counts must rank deterministically
    docs = spark.createDataFrame(
        [(1, "b b a a c", "en")], "doc_id LONG, text STRING, lang STRING"
    )
    from meteaudata_spark.ext.textstats import zipf_fit

    r1 = zipf_fit(docs).collect()[0]["zipf_slope_micros"]
    r2 = zipf_fit(docs).collect()[0]["zipf_slope_micros"]
    assert r1 == r2


# ----------------------------------------------------------------------
# PMI collocations
# ----------------------------------------------------------------------
def test_pmi_planted_collocation(spark):
    import math

    # "new york" always adjacent (8×); "the cat/dog/sun/..." dilute "the"
    pieces = ["new york"] * 8 + ["the cat", "the dog", "the sun", "the car",
                                 "the map", "the pen", "the cup", "the hat"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pieces)], "doc_id LONG, text STRING"
    )
    from meteaudata_spark.ext.textstats import pmi_bigrams

    out = pmi_bigrams(docs, min_count=5, top_k=5).collect()
    top = out[0]
    assert (top["tok1"], top["tok2"]) == ("new", "york")
    l = lambda x: round(math.log(x) * 1e6)
    # c_ab=8, N=16, c_a=c_b=8 → PMI = ln(8·16/64) = ln 2
    assert top["pmi_micros"] == l(8) + l(16) - l(8) - l(8)
    assert top["pmi_micros"] == l(2)


def test_pmi_min_count_fence(spark):
    docs = spark.createDataFrame(
        [(1, "rare pair"), (2, "rare pair"), (3, "x y")],
        "doc_id LONG, text STRING",
    )
    from meteaudata_spark.ext.textstats import pmi_bigrams

    assert pmi_bigrams(docs, min_count=3, top_k=10).count() == 0
    out = pmi_bigrams(docs, min_count=2, top_k=10).collect()
    assert [(r["tok1"], r["tok2"]) for r in out] == [("rare", "pair")]


# ----------------------------------------------------------------------
# DSIR deterministic resampling
# ----------------------------------------------------------------------
def test_dsir_sample_max_weight_doc_always_kept(spark):
    # target vocabulary is disjoint from background: target docs get the
    # max weight and must be accepted with probability ~1 (ln u < 0 only
    # fails for w == wmax when u underflows — u ≥ 0.5/1e6 keeps ln u
    # finite, and w − wmax = 0 means accept iff ln u < 0: always true)
    docs = spark.createDataFrame(
        [(i, "tgtword " * 20, "en") for i in range(3)]
        + [(10 + i, "bgword " * 20, "de") for i in range(3)],
        "doc_id LONG, text STRING, lang STRING",
    )
    from meteaudata_spark.ext.textstats import dsir_sample

    out = {r["doc_id"]: r for r in
           dsir_sample(docs, F.col("lang") == "en").collect()}
    # all en docs share the identical (max) weight → all accepted
    for i in range(3):
        assert out[i]["accepted"]
    # de docs carry strongly negative relative weight → rejected
    for i in range(3):
        assert not out[10 + i]["accepted"]


def test_dsir_sample_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{(i * 3) % 7} common", "en" if i % 2 else "fr")
         for i in range(40)],
        "doc_id LONG, text STRING, lang STRING",
    )
    from meteaudata_spark.ext.textstats import dsir_sample

    a = sorted((r["doc_id"], r["accepted"]) for r in
               dsir_sample(docs, F.col("lang") == "en").collect())
    b = sorted((r["doc_id"], r["accepted"]) for r in
               dsir_sample(docs, F.col("lang") == "en").collect())
    assert a == b


# ----------------------------------------------------------------------
# IVF list balance
# ----------------------------------------------------------------------
def test_ivf_balance_accounts_for_every_vector(spark):
    from meteaudata_spark.ext.simsearch import emb_ivf_balance

    rows = emb_ivf_balance(spark, SF).collect()
    n_vecs = spark.read.parquet(SF + "/embeddings.parquet").count()
    assert sum(r["list_size"] for r in rows) == n_vecs
    assert 1 <= len(rows) <= 16
    # hot factor of a perfectly balanced list is 10000 bp; totals obey
    # the floor-div identity sum(share_bp) <= 10000
    assert sum(r["share_bp"] for r in rows) <= 10000
    for r in rows:
        assert r["hot_factor_bp"] >= 0


def test_ivf_balance_matches_topk_assignment(spark):
    # the report must describe the SAME inverted lists emb_ivf_topk
    # searches: recompute assignment via the shared helper and compare
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.simsearch import (
        _assign_to_centroids,
        _emb,
        _norm_expr,
        emb_ivf_balance,
    )

    emb = _emb(spark, SF).withColumn("nrm", F.expr(_norm_expr("embedding")))
    cents = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 116)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    want = {
        r["centroid_id"]: r["n"]
        for r in _assign_to_centroids(emb, cents)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r["centroid_id"]: r["list_size"]
        for r in emb_ivf_balance(spark, SF).collect()
    }
    assert got == want


# ----------------------------------------------------------------------
# Z-order layout advisor
# ----------------------------------------------------------------------
def test_zorder_key_interleaves_bits(spark):
    from meteaudata_spark.ext.corpus_ops import zorder_key

    df = spark.createDataFrame(
        [(0b1011, 0b0110)], "x LONG, y LONG"
    ).select(zorder_key("x", "y", bits=4).alias("z"))
    # interleave x into even bits, y into odd (z bit 2i = x_i,
    # z bit 2i+1 = y_i): x=1011, y=0110 ->
    # x0+4*x1+8*y1+32*y2+64*x3 = 1+4+8+32+64 = 109
    assert df.collect()[0]["z"] == 109


def test_zorder_layout_constrains_both_dims(spark):
    from meteaudata_spark.ext.corpus_ops import events_zorder_layout

    rows = {
        r["layout"]: r
        for r in events_zorder_layout(spark, SF).collect()
    }
    nat, zo = rows["natural"], rows["zorder"]
    # natural (append) order: time is clustered, user is not
    assert nat["avg_ts_span_bp"] < 2000
    assert nat["avg_user_span_bp"] > 8000
    # z-order: BOTH dims far below the natural layout's worst dim,
    # i.e. a min/max-pruning reader can skip on either predicate
    assert zo["avg_user_span_bp"] < 3000
    assert zo["avg_ts_span_bp"] < 3000
    assert zo["n_buckets"] > 16
