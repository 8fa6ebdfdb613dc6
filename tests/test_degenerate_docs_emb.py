"""ANSI landmine sweep #2: every documents/embeddings/multimodal query
must survive a degenerate corpus — empty and sub-n-word texts,
ALL-ZERO embedding vectors (zero norms: the one corrupt row that
would otherwise kill a 100 TB job with DIVIDE_BY_ZERO), and
mass-identical vectors."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen"))
    rows = []
    for i in range(200):
        t = ["", "word", "same same same", "a b", "   "][i % 5]
        rows.append((i, t, ["en", "de"][i % 2], "s", len(t)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    erows = [
        (i, [0.0] * 64 if i < 100 else [1.0] * 64, i % 3) for i in range(208)
    ]
    spark.createDataFrame(
        erows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_every_doc_emb_query_survives_degenerate_corpus(degenerate_sf, spark):
    import __spark_entry__ as e

    failures = []
    for name, fn in e.queries().items():
        if not (
            name.startswith("doc_")
            or name.startswith("emb_")
            or name.startswith("mm_")
        ):
            continue
        try:
            fn(spark, degenerate_sf).count()
        except Exception as ex:
            failures.append((name, str(ex).splitlines()[0][:120]))
    assert not failures, failures


def test_empty_corpus_raises_cleanly_for_seeded_ops(spark, tmp_path):
    """Seed-dependent operators (k-means, SemDeDup) must fail with an
    explicit message on an empty corpus, not a numpy axis error; the
    PageRank family already had this contract."""
    import pytest as _pytest

    sf = str(tmp_path)
    spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(0).write.parquet(f"{sf}/embeddings.parquet")
    from meteaudata_spark.ext.simsearch import emb_kmeans_refine, emb_semdedup

    for fn in (emb_kmeans_refine, emb_semdedup):
        with _pytest.raises(ValueError, match="no centroids"):
            fn(spark, sf).count()
