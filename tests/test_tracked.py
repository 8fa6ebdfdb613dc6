"""TrackedTable: EXT table transforms emit ProcessingStep lineage
(SURVEY §7.2 M4) with source capture and parameter records."""

from meteaudata_spark.ext.tracked import TrackedTable
from meteaudata_spark.metadata import ProcessingType

SF = "/root/testdata/sf0.001"


def test_tracked_dedup_chain_records_lineage(spark):
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.dedup import minhash_lsh_pairs

    docs = TrackedTable.from_table(spark, SF, "documents")

    def drop_short(df, min_chars=10):
        """Filter documents shorter than min_chars."""
        return df.filter(F.col("n_chars") >= min_chars)

    filtered = docs.apply(
        drop_short,
        ptype=ProcessingType.FILTERING,
        min_chars=20,
    )
    pairs = filtered.apply(
        minhash_lsh_pairs,
        ptype=ProcessingType.REMOVE_DUPLICATES,
        suffix="MINHASH-LSH",
        num_hashes=16,
        bands=4,
    )
    # lineage accumulated in order, with source + parameters captured
    assert [s.type for s in pairs.steps] == [
        ProcessingType.FILTERING,
        ProcessingType.REMOVE_DUPLICATES,
    ]
    assert "def drop_short" in pairs.steps[0].function_info.source_code
    assert pairs.steps[0].parameters.model_dump()["min_chars"] == "20"
    assert pairs.steps[1].parameters.model_dump()["num_hashes"] == "16"
    assert pairs.name == "documents_DROP-SHORT_MINHASH-LSH"
    assert pairs.steps[1].input_series_names == ["documents_DROP-SHORT"]
    # the data plane stayed lazy but is runnable
    assert pairs.df.count() >= 0
    # manifest-ready summary
    summary = pairs.lineage_summary()
    assert summary[1]["function"] == "minhash_lsh_pairs"
    assert summary[1]["inputs"] == ["documents_DROP-SHORT"]


def test_tracked_suffix_grammar_enforced(spark):
    import pytest

    docs = TrackedTable.from_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="suffix"):
        docs.apply(lambda df: df, suffix="BAD_SUFFIX")


def test_tracked_handles_docless_functions(spark):
    docs = TrackedTable.from_table(spark, SF, "documents")

    def no_doc(df):
        return df

    def blank_doc(df):
        """   """
        return df

    for fn, expect in [(no_doc, "table transform no_doc"), (blank_doc, "table transform blank_doc")]:
        out = docs.apply(fn)
        assert out.steps[-1].description == expect


def test_tracked_corpus_pipeline_end_to_end(spark):
    """The round-2 corpus operators compose under lineage tracking:
    scrub → split → sample, each step recorded with type + params."""
    from meteaudata_spark.ext.corpus_ops import (
        hash_split,
        scrub_pii,
        stratified_sample,
    )
    from meteaudata_spark.metadata import ProcessingType

    docs = TrackedTable.from_table(spark, SF, "documents")
    cleaned = docs.apply(
        scrub_pii, ptype=ProcessingType.TRANSFORMATION, suffix="PII-SCRUB"
    )
    split = cleaned.apply(
        hash_split, ptype=ProcessingType.TRANSFORMATION, suffix="SPLIT"
    )
    sampled = split.apply(
        stratified_sample,
        "lang",
        fraction=0.5,
        ptype=ProcessingType.FILTERING,
        suffix="SAMPLE",
    )
    assert [s.suffix for s in sampled.steps] == ["PII-SCRUB", "SPLIT", "SAMPLE"]
    assert float(sampled.steps[2].parameters.fraction) == 0.5
    assert sampled.steps[2].type == ProcessingType.FILTERING
    # source capture carried through
    assert "def stratified_sample" in sampled.steps[2].function_info.source_code
    # the composed lazy plan runs: every doc has split + keep columns
    row = sampled.df.select("doc_id", "split", "__keep").limit(1).collect()
    assert len(row) == 1
