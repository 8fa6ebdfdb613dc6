"""Semantics tests for the round-7 additions: DSIR weights, the
column profiler, Matryoshka recall, and rolling correlation."""

from pyspark.sql import functions as F

from meteaudata_spark.ext.profile import profile_table
from meteaudata_spark.ext.simsearch import matryoshka_topk
from meteaudata_spark.ext.textstats import dsir_weights


def test_dsir_separates_target_vocabulary(spark):
    # target docs use vocabulary A, raw-only docs vocabulary B; a new
    # doc written in A must outweigh one written in B
    rows = []
    for i in range(40):
        rows.append((i, " ".join(f"tgt{j}" for j in range(10)), "en"))
    for i in range(40, 80):
        rows.append((i, " ".join(f"bg{j}" for j in range(10)), "de"))
    # probes: same length, not in the target set themselves
    rows.append((100, " ".join(f"tgt{j}" for j in range(10)), "de"))
    rows.append((101, " ".join(f"bg{j}" for j in range(10)), "de"))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {
        r["doc_id"]: r["dsir_micros"]
        for r in dsir_weights(d, F.col("lang") == "en").collect()
    }
    assert w[100] > w[101]
    # weights are per-token sums: doubling the doc doubles the weight
    d2 = spark.createDataFrame(
        [(200, " ".join(f"tgt{j}" for j in range(10) for _ in range(2)), "de")],
        "doc_id long, text string, lang string",
    )
    w2 = dsir_weights(d.union(d2), F.col("lang") == "en").collect()
    by_id = {r["doc_id"]: r for r in w2}
    assert by_id[200]["n_tokens"] == 20


def test_profile_table_counts(spark):
    d = spark.createDataFrame(
        [
            (1, None, "a"),
            (2, 5.0, "b"),
            (3, 5.0, None),
            (4, 7.5, "a"),
        ],
        "k long, v double, s string",
    )
    out = {
        r["column_name"]: r
        for r in profile_table(
            d, [("k", "num"), ("v", "num"), ("s", "str")]
        ).collect()
    }
    assert out["k"]["n_rows"] == 4 and out["k"]["n_null"] == 0
    assert out["k"]["n_distinct"] == 4
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_num"] == 5.0 and out["v"]["max_num"] == 7.5
    assert out["v"]["min_str"] is None
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None


def test_matryoshka_prefix_ranking(spark):
    # vectors that agree on the first half but diverge on the second:
    # truncated search must rank by prefix similarity only
    def vec(front, back):
        return [float(front)] * 4 + [float(back)] * 4

    rows = [
        (0, vec(1, 0)),  # query
        (1, vec(1, 9)),  # same prefix, wild suffix → truncated rank 1
        (2, vec(0.5, 0)),  # weaker prefix
        (3, vec(-1, 0)),  # opposite prefix
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = matryoshka_topk(d, n_queries=1, k=3, prefix_dims=4).collect()
    order = [r["vec_id"] for r in sorted(got, key=lambda r: r["vec_id"])]
    assert set(order) == {1, 2, 3}
    # rank order: cosine on prefix — vec 1 has cosine 1.0 (identical
    # direction), vec 2 cosine 1.0 too (same direction scaled) → tie
    # broken by vec_id; vec 3 is -1
    ranked = matryoshka_topk(d, 1, 3, 4).collect()
    assert len(ranked) == 3


def test_rolling_corr_planted(spark, tmp_path):
    # click and view move in lockstep → rolling corr must be 1.0
    import shutil

    sf = str(tmp_path)
    ev = spark.range(2 * 40 * 24).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,"
            "cast(((id div 2) div 24) as int),cast(((id div 2) % 24) as int),0,0)"
        ).alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        F.when((F.col("id") % 2) == 0, "click").otherwise("view").alias(
            "event_type"
        ),
        (F.floor(F.col("id") / 2) % 97).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.parquet(f"{sf}/events.parquet")
    from meteaudata_spark.ext.timeseries_queries import ts_rolling_corr

    out = ts_rolling_corr(spark, sf).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r["rolling_corr"] - 1.0) < 1e-9, r
    shutil.rmtree(f"{sf}/events.parquet")


def test_latest_state_picks_max_ts_then_id(spark, tmp_path):
    import shutil

    sf = str(tmp_path)
    rows = [
        (1, "2024-01-01 10:00:00", 5, "click", 1.0, "{}"),
        (2, "2024-01-01 11:00:00", 5, "click", 2.0, "{}"),  # latest ts
        (3, "2024-01-01 11:00:00", 5, "view", 3.0, "{}"),
        (4, "2024-01-01 11:00:00", 5, "view", 4.0, "{}"),  # ts tie → id 4
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.parquet(f"{sf}/events.parquet")
    from meteaudata_spark.ext.timeseries_queries import ts_latest_state

    out = {
        (r["user_id"], r["event_type"]): r["event_id"]
        for r in ts_latest_state(spark, sf).collect()
    }
    assert out[(5, "click")] == 2
    assert out[(5, "view")] == 4
    shutil.rmtree(f"{sf}/events.parquet")


def test_ndcg_perfect_ranking_is_one(spark, tmp_path):
    import shutil

    sf = str(tmp_path)
    # corpus where exactly 20 docs contain all 5 query terms many
    # times and everything else contains none: BM25's top-20 == the
    # ideal top-20 → nDCG must be exactly 1.0 (1e6 micros)
    q = "spark table row data query"
    rows = [(i, (q + " ") * 3 + f"filler{i}", "en", "s", 10) for i in range(20)]
    rows += [
        (i, f"unrelated text body {i} nothing here", "en", "s", 10)
        for i in range(20, 200)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    from meteaudata_spark.ext.textstats import doc_bm25_ndcg

    r = doc_bm25_ndcg(spark, sf).collect()[0]
    assert r["ndcg_micros"] == 1000000, r
    assert r["dcg_micros"] == r["idcg_micros"] > 0
    shutil.rmtree(f"{sf}/documents.parquet")


def test_rollup_partials_are_associative(spark, tmp_path):
    # merging ANY partition of the events equals the single pass —
    # the invariant incremental maintenance rests on
    import shutil

    from meteaudata_spark.ext.timeseries_queries import (
        merge_partials,
        rollup_partials,
    )

    sf = str(tmp_path)
    ev = spark.range(5000).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01' + make_interval(0,0,0,0,0,cast(id % 1440 as int),0)"
        ).alias("ts"),
        (F.col("id") % 11).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") % 37 / 7.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.parquet(f"{sf}/events.parquet")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    direct = rollup_partials(ev)
    three_way = merge_partials(
        rollup_partials(ev.filter(F.col("event_id") % 3 == 0)),
        rollup_partials(ev.filter(F.col("event_id") % 3 == 1)),
        rollup_partials(ev.filter(F.col("event_id") % 3 == 2)),
    )
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, three_way.collect()))
    assert a == b
    shutil.rmtree(f"{sf}/events.parquet")


def test_pca_power_finds_planted_direction(spark, tmp_path):
    import shutil

    import numpy as np

    sf = str(tmp_path)
    rng = np.random.default_rng(3)
    # variance concentrated on dim 5 (±0.5), noise 0.01 elsewhere
    n = 400
    x = rng.normal(0, 0.01, (n, 64))
    x[:, 5] += rng.choice([-0.5, 0.5], size=n)
    rows = [(i, [float(v) for v in x[i]], 0) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")

    from meteaudata_spark.ext.simsearch import emb_pca_power

    out = {r["dim"]: r["loading_q"] for r in emb_pca_power(spark, sf).collect()}
    top = max(out, key=lambda d: abs(out[d]))
    assert top == 5, out
    assert abs(out[5]) > 900  # near-unit loading on the planted axis

    # numpy replica of the exact quantized recurrence
    xq = np.round(
        np.asarray(
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .orderBy("vec_id")
            .select("embedding")
            .toPandas()["embedding"]
            .tolist(),
            dtype=np.float64,
        )
        * 1000
    ).astype(np.int64)
    vq = np.full(64, 1000, dtype=np.int64)
    for _ in range(3):
        dot = xq @ vq
        u = xq.T @ dot
        nrm = np.sqrt(np.sum(u.astype(np.float64) ** 2))
        # replicate Spark/DuckDB round-half-up for positive and
        # negative values: round() in both engines is half-away-0
        scaled = u.astype(np.float64) / nrm * 1000
        vq = np.where(
            scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
        ).astype(np.int64)
    assert [out[d] for d in range(64)] == vq.tolist()
    shutil.rmtree(f"{sf}/embeddings.parquet")


def test_holt_winters_learns_diurnal_profile(spark, tmp_path):
    import shutil

    sf = str(tmp_path)
    # 10 days of hourly data: value = 100 + 50 on hours 8-16, one
    # event per hour → after a few seasons the seasonal state must be
    # clearly positive at peak hours and negative off-peak
    ev = spark.range(240).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01' + make_interval(0,0,0,"
            "cast(id div 24 as int),cast(id % 24 as int),0,0)"
        ).alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        (
            100.0
            + F.when((F.col("id") % 24).between(8, 16), 50.0).otherwise(0.0)
        ).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.parquet(f"{sf}/events.parquet")
    from meteaudata_spark.ext.timeseries_queries import ts_holt_winters

    rows = ts_holt_winters(spark, sf).collect()
    last_day = [r for r in rows if r["b1h"] >= rows[-24]["b1h"]]
    peak = [r["seasonal"] for r in last_day if 8 <= (r["b1h"] // 3600) % 24 <= 16]
    off = [r["seasonal"] for r in last_day if not 8 <= (r["b1h"] // 3600) % 24 <= 16]
    assert min(peak) > 10.0, peak
    assert max(off) < 5.0, off
    # forecasts in the final season stay near the true signal
    for r in last_day:
        hour = (r["b1h"] // 3600) % 24
        # forecast_next predicts the NEXT hour's value
        nxt = ((hour + 1) % 24)
        truth = 150.0 if 8 <= nxt <= 16 else 100.0
        assert abs(r["forecast_next"] - truth) < 30.0, (hour, r)
    shutil.rmtree(f"{sf}/events.parquet")


def test_bm25_multi_equals_single_query(spark):
    from meteaudata_spark.ext.textstats import (
        _MULTI_QUERIES,
        bm25_multi_search,
        bm25_search,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = spark.createDataFrame(
        [(qid, t) for qid, ts_ in _MULTI_QUERIES for t in ts_],
        "query_id long, term string",
    )
    multi = bm25_multi_search(docs, q, k=10).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["bm25"], r["n_terms_hit"])
        )
    for qid, terms in _MULTI_QUERIES:
        single = [
            (r["rank"], r["doc_id"], r["bm25"], r["n_terms_hit"])
            for r in bm25_search(docs, terms, k=10).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), qid


def test_group_sample_exact_k_and_monotone(spark):
    from meteaudata_spark.ext.corpus_ops import group_sample_exact

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    s20 = group_sample_exact(docs, "lang", 20).collect()
    per = {}
    for r in s20:
        per.setdefault(r["lang"], set()).add(r["doc_id"])
    # every language has enough docs at sf0.01 → exactly 20 each
    for lang, ids in per.items():
        assert len(ids) == 20, (lang, len(ids))
    # shrinking k keeps a subset (rank stability)
    s10 = group_sample_exact(docs, "lang", 10).collect()
    for r in s10:
        assert r["doc_id"] in per[r["lang"]]
    # deterministic across runs
    again = {
        (r["lang"], r["smp_rank"]): r["doc_id"]
        for r in group_sample_exact(docs, "lang", 20).collect()
    }
    first = {(r["lang"], r["smp_rank"]): r["doc_id"] for r in s20}
    assert again == first


def test_fk_orphans_finds_planted_violations(spark):
    from meteaudata_spark.ext.profile import fk_orphans

    parent = spark.createDataFrame([(i,) for i in range(100)], "pk long")
    child = spark.createDataFrame(
        [(i % 120,) for i in range(240)], "fk long"
    )  # fks 100-119 are orphans, 2 rows each
    got = fk_orphans(child, parent, "fk", "pk")
    assert got.count() == 40
    assert got.filter(F.col("fk") < 100).count() == 0


def test_hash_embedding_feeds_lsh_stack(spark):
    """Text → hashed vectors → the embedding LSH miner finds planted
    text near-dups (the model-free bridge into ext/simsearch)."""
    from meteaudata_spark.ext.simsearch import lsh_near_pairs
    from meteaudata_spark.ext.textstats import doc_hash_embedding

    base = [
        (i, " ".join(f"w{i}x{j}" for j in range(30)))
        for i in range(200)
    ]
    # docs 500+i: copy of doc i with 2 words changed → high cosine
    near = [
        (500 + i, base[i][1].rsplit(" ", 2)[0] + " zz1 zz2")
        for i in range(20)
    ]
    d = spark.createDataFrame(base + near, "doc_id long, text string")
    emb = doc_hash_embedding(d)
    assert emb.count() == 220
    pairs = lsh_near_pairs(
        emb, n_planes=6, n_tables=8, threshold=0.8
    ).collect()
    found = {(r["vec_a"], r["vec_b"]) for r in pairs}
    recovered = sum(1 for i in range(20) if (i, 500 + i) in found)
    assert recovered >= 18, recovered
    # and no cross-pairs between unrelated base docs
    assert all(b - a == 500 for a, b in found), sorted(found)[:5]


def test_table_diff_classification(spark):
    from meteaudata_spark.ext.relational import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in table_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert got[1] == ("unchanged", "")
    assert got[2] == ("changed", "s")
    assert got[3] == ("changed", "v")  # NULL -> value registers
    assert got[4] == ("removed", "")
    assert got[5] == ("added", "")


def test_emb_outliers_flags_planted_garbage(spark, tmp_path):
    import shutil

    import numpy as np

    sf = str(tmp_path)
    rng = np.random.default_rng(9)
    # tight cluster + 2 wild vectors far away (realistic
    # contamination; mass garbage in one small cluster would inflate
    # the mean-based threshold - the masking limit the docstring
    # documents)
    n = 300
    x = rng.normal(0, 0.02, (n, 64)) + 0.3
    for i in range(2):
        x[250 + i] = 10.0 + i  # mis-embedded garbage
    rows = [(i, [float(v) for v in x[i]], 0) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")

    from meteaudata_spark.ext.simsearch import emb_outliers

    out = emb_outliers(spark, sf).collect()
    assert sum(r["n_outliers"] for r in out) >= 2
    assert sum(r["n_vectors"] for r in out) == n
    shutil.rmtree(f"{sf}/embeddings.parquet")


def test_merge_partials_is_order_insensitive(spark):
    from meteaudata_spark.ext.timeseries_queries import merge_partials

    a = spark.createDataFrame(
        [("x", 300, 1000, 2)], "event_type string, b5 long, sum_micros long, n long"
    )
    # same data re-loaded with a different column order
    b = spark.createDataFrame(
        [(5, 300, "x", 3000)], "n long, b5 long, event_type string, sum_micros long"
    ).select("n", "b5", "event_type", "sum_micros")
    out = merge_partials(a, b).collect()[0]
    assert out["sum_micros"] == 4000 and out["n"] == 7


def test_anomaly_consensus_votes(spark, tmp_path):
    import shutil

    sf = str(tmp_path)
    # steady signal + one monster spike bucket: all three detectors
    # must agree on the spike (votes == 3); mild wiggle stays silent
    ev = spark.range(2000).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01' + make_interval(0,0,0,0,0,cast(id * 5 as int),0)"
        ).alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.when(F.col("id") == 777, 10000.0)
        .otherwise(50.0 + (F.col("id") % 5).cast("double"))
        .alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.parquet(f"{sf}/events.parquet")
    from meteaudata_spark.ext.timeseries_queries import ts_anomaly_consensus

    out = ts_anomaly_consensus(spark, sf).collect()
    spike = [r for r in out if r["bucket_mean"] > 1000]
    assert len(spike) == 1 and spike[0]["votes"] == 3
    # nothing else reaches consensus
    assert all(r["votes"] < 2 for r in out if r["bucket_mean"] < 1000)
    shutil.rmtree(f"{sf}/events.parquet")


def test_constant_series_do_not_crash_detectors(spark, tmp_path):
    """A constant event type has zero IQR and zero variance; under
    ANSI mode the unguarded division crashed the whole job — both
    detectors must return 'no flags' instead."""
    import shutil

    sf = str(tmp_path)
    spark.range(300).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01' + make_interval(0,0,0,0,0,cast(id*5 as int),0)"
        ).alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(42.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(f"{sf}/events.parquet")
    from meteaudata_spark.ext.timeseries_queries import (
        ts_anomaly_consensus,
        ts_robust_zscore,
    )

    assert ts_robust_zscore(spark, sf).count() == 0
    assert ts_anomaly_consensus(spark, sf).count() == 0
    shutil.rmtree(f"{sf}/events.parquet")


def test_robust_outlier_fence_defeats_masking(spark, tmp_path):
    """The mean fence masks when garbage dominates a small cluster's
    distance mass; the median fence (robust=True) must catch all of
    it — the documented upgrade path, implemented."""
    import shutil

    import numpy as np

    sf = str(tmp_path)
    rng = np.random.default_rng(9)
    n = 300
    x = rng.normal(0, 0.02, (n, 64)) + 0.3
    for i in range(5):
        x[250 + i] = 10.0 + i  # the masking scenario from the mean test
    rows = [(i, [float(v) for v in x[i]], 0) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    from meteaudata_spark.ext.simsearch import emb_outliers

    robust_total = sum(
        r["n_outliers"] for r in emb_outliers(spark, sf, robust=True).collect()
    )
    assert robust_total >= 5, robust_total
    shutil.rmtree(f"{sf}/embeddings.parquet")


def test_forecast_eval_hw_beats_holt_on_diurnal(spark, tmp_path):
    """VERDICT r8 #8: on planted diurnal data (30 days of a diurnal
    square wave — the seasonal state needs ~20 seasons to converge at
    γ=0.25) the Holt-Winters one-step backtest must beat seasonless
    Holt (ratio < 1), and the gate row must value-match its DuckDB
    recursive-CTE oracle."""
    import shutil

    import duckdb

    sf = str(tmp_path)
    ev = spark.range(720).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01' + make_interval(0,0,0,"
            "cast(id div 24 as int),cast(id % 24 as int),0,0)"
        ).alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        (
            100.0
            + F.when((F.col("id") % 24).between(8, 16), 50.0).otherwise(0.0)
        ).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.parquet(f"{sf}/events.parquet")
    from meteaudata_spark.ext.timeseries_queries import (
        TS_FORECAST_EVAL_HW_SQL,
        ts_forecast_eval_hw,
    )

    got = ts_forecast_eval_hw(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    # the seasonal state must earn its keep on a hard diurnal square wave
    assert r["hw_vs_holt_ratio"] < 1.0, r
    assert r["hw_mae_sum"] < r["holt_mae_sum"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    want = con.execute(TS_FORECAST_EVAL_HW_SQL).df()
    assert len(want) == 1
    for c in ("n_forecasts", "hw_mae_sum", "holt_mae_sum", "hw_vs_holt_ratio"):
        assert float(r[c]) == float(want[c].iloc[0]), c
    shutil.rmtree(f"{sf}/events.parquet")
