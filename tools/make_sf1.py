"""Build the sf1-equivalent local bench tier (VERDICT r8 #6): replicate
the deterministic sf0.1 tables ``factor``× with per-shard key shifts,
so every query's input grows 10× while join/FK structure, planted
dup patterns (doc_id mod arithmetic), and per-key series lengths stay
intact.

Shift rules (shard k gets ``id + k * (max_id + 1)`` per key domain):
  - customer.c_custkey ↔ orders.o_custkey        (FK-consistent)
  - orders.o_orderkey ↔ lineitem.l_orderkey
  - part.p_partkey ↔ lineitem.l_partkey
  - supplier.s_suppkey ↔ lineitem.l_suppkey
  - events.event_id / events.user_id
  - documents.doc_id, embeddings.vec_id
  - nation / region are DIMENSIONS: copied once, keys unshifted, and
    *_nationkey/_regionkey references keep pointing at them — exactly
    how a 10× production scale-up behaves (facts grow, dims don't).

Scale-up shape: MORE KEYS at the same per-key density — the growth
axis Spark parallelism actually absorbs (sequential-recurrence
lengths per key stay constant; shuffles grow by row count).

Cross-shard content is DECORRELATED, not copied: byte-identical texts
and embeddings across shards would put every copy in the same LSH /
shingle / hash bucket, growing candidate pairs QUADRATICALLY in the
replication factor — the first exponent run measured e≈1.65 for the
pair miners purely from that artifact.  Instead shard k>0 gets
  - embeddings: a per-(shard, dim) deterministic SIGN FLIP — an
    orthogonal transform, so in-shard geometry (norms, planted
    near-dup structure) is EXACTLY preserved while cross-shard cosine
    decorrelates;
  - documents: every token suffixed with ~k — in-shard shingle
    structure preserved (same token multiset shape), cross-shard
    shingle overlap zero; n_chars recomputed.

Usage: python tools/make_sf1.py [--factor 10] [--src /root/testdata/sf0.1]
       [--out /root/repo/.localdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SHIFTS: dict[str, list[tuple[str, str]]] = {
    # table -> [(column, domain-table whose max defines the offset)]
    "customer": [("c_custkey", "customer.c_custkey")],
    "orders": [
        ("o_orderkey", "orders.o_orderkey"),
        ("o_custkey", "customer.c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders.o_orderkey"),
        ("l_partkey", "part.p_partkey"),
        ("l_suppkey", "supplier.s_suppkey"),
    ],
    "part": [("p_partkey", "part.p_partkey")],
    "supplier": [("s_suppkey", "supplier.s_suppkey")],
    "events": [
        ("event_id", "events.event_id"),
        ("user_id", "events.user_id"),
    ],
    "documents": [("doc_id", "documents.doc_id")],
    "embeddings": [("vec_id", "embeddings.vec_id")],
}
DIMS = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.localdata/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    # per-domain offsets = max_id + 1 (keeps mod-20 planted patterns:
    # every domain max+1 here is a round number divisible by 20)
    offsets: dict[str, int] = {}
    for shifts in SHIFTS.values():
        for _, domain in shifts:
            if domain not in offsets:
                tbl, col = domain.split(".")
                offsets[domain] = (
                    con.execute(
                        f"SELECT MAX({col}) + 1 FROM "
                        f"'{args.src}/{tbl}.parquet'"
                    ).fetchone()[0]
                )
    print("offsets:", offsets)

    for tbl in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{tbl}.parquet') TO "
            f"'{args.out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied as-is (dimension)")

    # shard-k content rewrites (see module docstring)
    content_rewrite = {
        ("documents", "text"): (
            "CASE WHEN k.k = 0 THEN text ELSE array_to_string("
            "list_transform(string_split(text, ' '), w -> w || '~' || k.k),"
            " ' ') END AS text"
        ),
        ("documents", "n_chars"): (
            "CASE WHEN k.k = 0 THEN n_chars ELSE LENGTH(array_to_string("
            "list_transform(string_split(text, ' '), w -> w || '~' || k.k),"
            " ' ')) END AS n_chars"
        ),
        ("embeddings", "embedding"): (
            "CASE WHEN k.k = 0 THEN embedding ELSE CAST(list_transform("
            "embedding, (x, i) -> CASE WHEN (hash(k.k * 4096 + i) % 2) = 0 "
            "THEN x ELSE -x END) AS FLOAT[]) END AS embedding"
        ),
    }

    for tbl, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{args.src}/{tbl}.parquet'"
            ).fetchall()
        ]
        shifted = {c: dom for c, dom in shifts}
        select = ", ".join(
            content_rewrite[(tbl, c)]
            if (tbl, c) in content_rewrite
            else (
                f"{c} + k.k * {offsets[shifted[c]]} AS {c}"
                if c in shifted
                else c
            )
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} FROM '{args.src}/{tbl}.parquet', "
            f"(SELECT UNNEST(generate_series(0, {args.factor - 1})) AS k) k "
            f"ORDER BY k.k) TO '{args.out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{args.out}/{tbl}.parquet'"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
