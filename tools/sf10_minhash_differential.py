"""sf10 VALUE verification for the three minhash-CTE composition rows
(VERDICT r11 #5): ``doc_lsh_edit_verify``, ``doc_minhash_containment``,
``doc_jaccard_edit_calibration``.

Their gate oracles embed the full MinHash miner CTE chain, whose
DuckDB single-node recompute spills 40-70+ GB at sf10 — so the gate
runs them at sf0.001..sf1 only.  This tool closes the remaining decade
DIFFERENTIALLY: the Spark miner output (``doc_minhash_lsh_pairs``, the
composition rows' shared input, itself exponent-certified and
sf1-value-verified) is PERSISTED and registered as DuckDB's
``mh_pairs`` view, and each row's oracle runs with the miner CTEs
replaced by that view — the shingle work DuckDB still does is
semi-join-bounded to the pair docs, exactly like the Spark containment
path.  Every downstream expression is copied verbatim from the gate
oracle builders in ``ext/dedup.py``.

Usage: python tools/sf10_minhash_differential.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF10 = "/root/repo/.localdata/sf10"

# pairs come from the registered spark_pairs view; tx mirrors the gate
# oracle's sanitized-prefix projection verbatim
_EDIT_VERIFY_REDUCED = """
WITH mh_pairs AS (SELECT * FROM spark_pairs),
tx AS (
  SELECT doc_id,
         substring(regexp_replace(text, '[^\\x20-\\x7e]', '?', 'g'),
                   1, 2000) AS t
  FROM documents
  WHERE doc_id IN (SELECT doc_a FROM mh_pairs
                   UNION SELECT doc_b FROM mh_pairs)
),
joined AS (
  SELECT p.doc_a, p.doc_b, p.jaccard, a.t AS ta, b.t AS tb,
         CAST(length(a.t) AS BIGINT) AS la,
         CAST(length(b.t) AS BIGINT) AS lb,
         CAST(GREATEST(length(a.t), length(b.t)) AS BIGINT) AS mx
  FROM mh_pairs p
  JOIN tx a ON a.doc_id = p.doc_a
  JOIN tx b ON b.doc_id = p.doc_b
),
scored AS (
  SELECT doc_a, doc_b, jaccard,
         CAST(levenshtein(ta, tb) AS BIGINT) AS lev, mx
  FROM joined
  WHERE (mx - ABS(la - lb)) * 10000 >= 9000 * mx
)
SELECT doc_a, doc_b,
       CAST(ROUND(jaccard * 1000000) AS BIGINT) AS jaccard_micros,
       lev,
       (mx - lev) * 10000 // mx AS edit_sim_bp
FROM scored
WHERE (mx - lev) * 10000 // mx >= 9000
ORDER BY doc_a, doc_b
"""

# hh restricted to pair docs (the Spark containment path's semi-join
# bound); shingle + h60 expressions verbatim from _SHINGLE_HH_DUCK
_CONTAINMENT_REDUCED = """
WITH mh_pairs AS (SELECT * FROM spark_pairs),
pair_docs AS (
  SELECT doc_a AS doc_id FROM mh_pairs
  UNION SELECT doc_b FROM mh_pairs
),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(
             generate_series(1, LEN(string_split(text, ' ')) - 2),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
           )) AS shingle
    FROM documents
    WHERE doc_id IN (SELECT doc_id FROM pair_docs)
  )
),
hh AS (
  SELECT DISTINCT doc_id,
         CAST(CONCAT('0x', SUBSTR(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM hh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM mh_pairs c
  JOIN hh a ON a.doc_id = c.doc_a
  JOIN hh b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY 1, 2
),
scored AS (
  SELECT p.doc_a, p.doc_b,
         CAST(ROUND(p.jaccard * 1000000) AS BIGINT) AS jaccard_micros,
         CAST(i.n_inter AS BIGINT) AS n_inter,
         CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b
  FROM mh_pairs p
  JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, jaccard_micros,
       (n_inter * 10000) // n_a AS containment_a_bp,
       (n_inter * 10000) // n_b AS containment_b_bp,
       CAST(CASE WHEN GREATEST((n_inter * 10000) // n_a,
                               (n_inter * 10000) // n_b) >= 9500
                 THEN 1 ELSE 0 END AS BIGINT) AS is_subset
FROM scored
ORDER BY doc_a, doc_b
"""

_CALIBRATION_REDUCED = """
WITH mh_pairs AS (SELECT * FROM spark_pairs),
tx AS (
  SELECT doc_id,
         substring(regexp_replace(text, '[^\\x20-\\x7e]', '?', 'g'),
                   1, 2000) AS t
  FROM documents
  WHERE doc_id IN (SELECT doc_a FROM mh_pairs
                   UNION SELECT doc_b FROM mh_pairs)
),
labeled AS (
  SELECT CAST(FLOOR(p.jaccard * 20) AS BIGINT) AS band,
         (CAST(GREATEST(length(a.t), length(b.t)) AS BIGINT)
          - CAST(levenshtein(a.t, b.t) AS BIGINT)) * 10000
          // CAST(GREATEST(length(a.t), length(b.t)) AS BIGINT)
           AS edit_sim_bp
  FROM mh_pairs p
  JOIN tx a ON a.doc_id = p.doc_a
  JOIN tx b ON b.doc_id = p.doc_b
)
SELECT band AS jaccard_band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN edit_sim_bp >= 9000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_edit_true,
       CAST((SUM(CASE WHEN edit_sim_bp >= 9000
                      THEN 1 ELSE 0 END) * 10000)
            // COUNT(*) AS BIGINT) AS true_rate_bp,
       CAST(SUM(edit_sim_bp) // COUNT(*) AS BIGINT) AS avg_edit_sim_bp
FROM labeled
GROUP BY band ORDER BY jaccard_band
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF10
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_results",
            "correctness_sf10_minhash_rows.json",
        )
    )
    from check_correctness import compare  # same value gate as the driver

    from meteaudata_spark.ext import dedup
    from meteaudata_spark.session import get_spark

    spark = get_spark("sf10-minhash-diff")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    pairs_path = tempfile.mkdtemp() + "/mh_pairs"
    dedup.doc_minhash_lsh_pairs(spark, sf_dir).write.parquet(pairs_path)
    t_mine = time.perf_counter() - t0
    n_pairs = spark.read.parquet(pairs_path).count()
    print(f"# miner: {n_pairs} pairs in {t_mine:.1f}s", flush=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW spark_pairs AS SELECT * FROM '{pairs_path}/*.parquet'"
    )

    rows = {
        "doc_lsh_edit_verify": (
            dedup.doc_lsh_edit_verify,
            _EDIT_VERIFY_REDUCED,
        ),
        "doc_minhash_containment": (
            dedup.doc_minhash_containment,
            _CONTAINMENT_REDUCED,
        ),
        "doc_jaccard_edit_calibration": (
            dedup.doc_jaccard_edit_calibration,
            _CALIBRATION_REDUCED,
        ),
    }
    results, passed, failed = {}, 0, 0
    for name, (fn, sql) in rows.items():
        t0 = time.perf_counter()
        spark_pdf = fn(spark, sf_dir).toPandas()
        t_spark = time.perf_counter() - t0
        t0 = time.perf_counter()
        duck_pdf = con.execute(sql).fetchdf()
        t_duck = time.perf_counter() - t0
        ok = compare(name, spark_pdf, duck_pdf)
        results[name] = {
            "rows_match": len(spark_pdf) == len(duck_pdf),
            "value_match": bool(ok),
            "spark_rows": len(spark_pdf),
            "oracle_rows": len(duck_pdf),
            "spark_sec": round(t_spark, 1),
            "oracle_sec": round(t_duck, 1),
            "oracle": "reduced (pairs from persisted Spark miner)",
        }
        passed += bool(ok)
        failed += not ok
        print(
            f"  {'ok  ' if ok else 'FAIL'} {name}: "
            f"spark={len(spark_pdf)} duck={len(duck_pdf)} "
            f"({t_spark:.1f}s / {t_duck:.1f}s)",
            flush=True,
        )
    payload = {
        "sf_dir": sf_dir,
        "n_miner_pairs": int(n_pairs),
        "passed": passed,
        "failed": failed,
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"# wrote {out_json}: {passed} ok, {failed} failed")
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
