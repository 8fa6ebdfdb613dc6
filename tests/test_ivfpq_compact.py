"""IVF-PQ list compaction (round 14): a long-running streaming ingest
appends one file per micro-batch per affected list; compaction bounds
that file count without changing a single row or search result."""

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _list_files(idx):
    out = {}
    for d in os.listdir(f"{idx}/codes"):
        if not d.startswith("centroid_id="):
            continue
        p = f"{idx}/codes/{d}"
        out[d] = sorted(
            (f, os.path.getmtime(f"{p}/{f}"), os.path.getsize(f"{p}/{f}"))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
    return out


def _fragment(spark, emb, idx, n_appends=3):
    """Build a base index and fragment it with several small appends."""
    from meteaudata_spark.ext.simsearch import (
        append_ivfpq_delta,
        build_ivfpq_index,
    )

    build_ivfpq_index(emb, idx)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    for k in range(n_appends):
        off = 1_000_000 + k * (max_id + 1)
        append_ivfpq_delta(
            spark,
            idx,
            emb.select((F.col("vec_id") + off).alias("vec_id"), "embedding"),
        )


def test_compact_preserves_rows_and_search_exactly(spark, tmp_path):
    from meteaudata_spark.ext.simsearch import (
        compact_ivfpq_lists,
        ivfpq_search,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    _fragment(spark, emb, idx)
    queries = emb.filter(F.col("vec_id") < 3)
    before_rows = sorted(
        map(tuple, spark.read.parquet(f"{idx}/codes").collect())
    )
    before_search = [
        tuple(r) for r in ivfpq_search(spark, idx, queries).collect()
    ]
    files_before = _list_files(idx)
    assert any(len(v) > 1 for v in files_before.values()), "not fragmented"

    n = compact_ivfpq_lists(spark, idx, max_files_per_list=1)
    assert n == sum(1 for v in files_before.values() if len(v) > 1)

    files_after = _list_files(idx)
    assert all(len(v) == 1 for v in files_after.values())
    assert sorted(
        map(tuple, spark.read.parquet(f"{idx}/codes").collect())
    ) == before_rows
    assert [
        tuple(r) for r in ivfpq_search(spark, idx, queries).collect()
    ] == before_search


def test_compact_leaves_unfragmented_lists_untouched(spark, tmp_path):
    from meteaudata_spark.ext.simsearch import (
        build_ivfpq_index,
        compact_ivfpq_lists,
    )

    from meteaudata_spark.ext.simsearch import append_ivfpq_delta

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    _fragment(spark, emb, idx)
    # one extra TINY append: only the lists those few vectors land in
    # fragment past the uniform level
    append_ivfpq_delta(
        spark,
        idx,
        emb.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 9_000_000).alias("vec_id"), "embedding"
        ),
    )
    files = _list_files(idx)
    threshold = max(len(v) for v in files.values()) - 1
    frag_dirs = {d for d, v in files.items() if len(v) > threshold}
    assert frag_dirs and len(frag_dirs) < len(files)

    compact_ivfpq_lists(spark, idx, max_files_per_list=threshold)
    after = _list_files(idx)
    untouched = [d for d in files if d not in frag_dirs]
    assert all(files[d] == after[d] for d in untouched), "under-threshold list rewritten"
    assert all(len(after[d]) == 1 for d in frag_dirs)
    # idempotent: nothing left over the threshold
    assert compact_ivfpq_lists(spark, idx, max_files_per_list=threshold) == 0

    # unrelated index state intact
    build_ivfpq_index  # (import used above)


def test_append_writes_at_most_one_file_per_list_per_batch(spark, tmp_path):
    """The small-files guard: an appended delta spread over many input
    partitions still lands as one file per affected list."""
    from meteaudata_spark.ext.simsearch import (
        append_ivfpq_delta,
        build_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    build_ivfpq_index(emb, idx)
    files_before = _list_files(idx)
    delta = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).repartition(16)
    append_ivfpq_delta(spark, idx, delta)
    files_after = _list_files(idx)
    grew = {
        d
        for d in files_after
        if len(files_after[d]) > len(files_before.get(d, []))
    }
    assert grew, "append wrote nothing"
    for d in grew:
        assert len(files_after[d]) - len(files_before.get(d, [])) == 1, d


def test_compact_guard_plan_is_o_delta_not_o_index(spark, tmp_path):
    """The idempotency guard must not shuffle the index: existing ids
    come from a sub_id=0 filtered scan (one row per vector, pushed
    down) joined via broadcast — no Exchange of the codes relation, no
    distinct over 8-way-duplicated vec_ids."""
    from meteaudata_spark.ext.simsearch import (
        build_ivfpq_index,
    )
    from meteaudata_spark.plans import inspect

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    build_ivfpq_index(emb, idx)
    delta_ids = emb.select("vec_id").limit(50)
    existing = (
        spark.read.parquet(f"{idx}/codes")
        .filter(F.col("sub_id") == 0)
        .select("vec_id")
    )
    hits = existing.join(F.broadcast(delta_ids), "vec_id", "left_semi")
    plan = inspect.formatted_plan(hits)
    assert "EqualTo(sub_id,0)" in plan  # pushed to the parquet scan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one scan of codes, no aggregate/distinct node
    assert "HashAggregate" not in plan
