"""Docs-as-tests (reference tests/test_snippets.py pattern): the
README quick-start must execute verbatim."""

import re
from pathlib import Path


def test_readme_quickstart_runs(spark, tmp_path, monkeypatch):
    readme = Path(__file__).resolve().parent.parent / "README.md"
    blocks = re.findall(r"```python\n(.*?)```", readme.read_text(), re.S)
    assert blocks, "README lost its quick-start block"
    code = blocks[0].replace("/tmp/out", str(tmp_path / "out"))
    # the snippet calls get_spark(); reuse the session fixture so the
    # test doesn't spin up a second JVM
    import meteaudata_spark

    monkeypatch.setattr(meteaudata_spark, "get_spark", lambda *a, **k: spark)
    ns: dict = {}
    exec(compile(code, "README.md", "exec"), ns)  # noqa: S102 - docs test


def test_empty_signal_gets_placeholder_series(spark, provenance):
    from meteaudata_spark.signal import Signal

    sig = Signal(name="E", units="x", provenance=provenance, spark=spark)
    assert sig.all_time_series == ["E#1_RAW#1"]
    assert sig.time_series["E#1_RAW#1"].values_dtype == "str"
