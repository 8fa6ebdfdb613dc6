"""Explicit prewarm of the session-memoized shared relations.

Several gate queries COMPOSE expensive upstreams (LSH scored pairs,
MinHash pairs, SimHash pairs, dedup clusters, quality scores, domain
PageRank) that ``plans.opcache.memo_relation`` builds once per
session.  Whichever query touches an upstream first pays its cold
build — which makes per-query bench numbers conflate "this query's
marginal cost" with "the corpus's one-time mining cost".

``warm_pair_relations`` builds and materializes each shared relation
up front and returns the per-relation build seconds, so a bench (or an
interactive session about to run many compositions) can report the
one-time cost explicitly and every subsequent query number is marginal
(VERDICT r9 #4).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession


def warm_pair_relations(spark: SparkSession, sf_dir: str) -> dict:
    """Build + materialize every session-memoized shared relation for
    ``sf_dir``; returns {relation: build_seconds}."""
    from meteaudata_spark.ext import dedup, graph, simsearch, textstats

    builds = {
        "lsh_scored_pairs": lambda: simsearch.emb_lsh_near_pairs(
            spark, sf_dir, threshold=-1.0
        ),
        "minhash_pairs": lambda: dedup.doc_minhash_lsh_pairs(spark, sf_dir),
        "simhash_near_pairs": lambda: dedup.doc_simhash_near_pairs(
            spark, sf_dir
        ),
        "dedup_clusters": lambda: dedup.doc_dedup_clusters(spark, sf_dir),
        "quality_score": lambda: textstats.doc_quality_score(spark, sf_dir),
        "domain_pagerank": lambda: graph.doc_domain_pagerank(spark, sf_dir),
        # tokenizer trainer cores (r13): train/encode/eval/compare all
        # read these; the loops localCheckpoint internally, so touching
        # the core once materializes it for the session
        "bpe_core": lambda: textstats.doc_bpe_train(spark, sf_dir),
        "unigram_core": lambda: textstats.doc_unigram_lm_train(
            spark, sf_dir
        ),
        # r14: newly memoized shared cores — the kmeans trainer (the
        # embedding analog of the bpe core) and the flat-PQ codes
        # index (the _ivfpq_index_for precedent) — built here so their
        # one-time cost is EXPLICITLY accounted in warm_build_sec
        # instead of hiding inside whichever run pays the memo miss.
        "kmeans_train_core": lambda: simsearch.emb_kmeans_train(
            spark, sf_dir
        ),
        "pq_codes": lambda: simsearch.emb_pq_codes(spark, sf_dir),
        # r14 batch 3: the exact / IVF eval rankings (shared by the
        # topk gate rows + ann_recall + recall_curve + matryoshka +
        # hybrid) and the BM25 rankings (search/ndcg/hybrid share the
        # single-query core; multi/mmr the multi-query core)
        "exact_topk_core": lambda: simsearch.emb_cosine_topk(
            spark, sf_dir, n_queries=10, k=20
        ),
        "ivf_topk_core": lambda: simsearch.emb_ivf_topk(
            spark, sf_dir, n_queries=10, k=10
        ),
        "bm25_single_core": lambda: textstats.doc_bm25_search(
            spark, sf_dir
        ),
        "bm25_multi_core": lambda: textstats.bm25_multi_candidates(
            spark, sf_dir
        ),
        # r14 batch 8: the IVF-PQ index memos (full + base variants,
        # incl. the frozen-codebook delta encode) and the kmeans
        # refine centroids — their builds hid inside whichever bench
        # run paid the memo miss; account them here explicitly
        "ivfpq_full_index": lambda: simsearch.emb_ivfpq_topk(
            spark, sf_dir
        ),
        "ivfpq_base_delta": lambda: simsearch.emb_ivfpq_delta_topk(
            spark, sf_dir
        ),
        "kmeans_refine_cents": lambda: simsearch.emb_kmeans_refine(
            spark, sf_dir
        ),
        "ivfpq_sweep_cores": lambda: simsearch.emb_ivfpq_probe_sweep(
            spark, sf_dir
        ),
    }
    from meteaudata_spark.plans.opcache import pin_caches

    out = {}
    # pinned: the prewarmed relations are the bench's standing working
    # set — per-query cache_intermediate churn must not FIFO-evict
    # them (round-11 measured memo-read rows regressing 4-15× when the
    # incremental-ledger rows' per-shard caches pushed them out)
    with pin_caches():
        for name, build in builds.items():
            t0 = time.perf_counter()
            build().count()
            out[name] = round(time.perf_counter() - t0, 3)
    return out
