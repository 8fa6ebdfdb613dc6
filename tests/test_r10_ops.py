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
