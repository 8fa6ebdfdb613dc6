"""Streaming tokenizer encode: per-micro-batch token counting with a
FROZEN trained unigram-LM vocabulary — the online twin of
``textstats.unigram_lm_encode_stats`` (the step a streaming ingestion
pipeline runs to meter token budgets as documents arrive).

Design: the vocabulary (piece → integer-quantized logp, the
``unigram_lm_train`` output) rides in the UDF closure; a word's
segmentation is a pure function of the word, so each Arrow batch
Viterbi-decodes only its NEW distinct words and a worker-local memo
(vocabulary-bounded — the same per-distinct-word trick the batch path
plays with its Spark-expression DP) makes repeat words free.  The
stage is STATELESS (`mapInArrow`): it emits per-(batch, group) partial
count rows; the consumer aggregates downstream (or sums in its sink),
so any output mode works and no state store is touched.

Exactness: the Viterbi DP and argmax-first tie semantics are
bit-identical to the batch expression fold (same integer logp, same
left-to-right backtrack) — the differential test streams the corpus
and matches ``unigram_lm_encode_stats``'s totals exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame


def _viterbi_len(w: str, lp: dict, max_len: int) -> int:
    """Token count of ``w`` under the pruned vocabulary — the same DP
    and tie semantics as the batch expression fold (best over piece
    lengths, backtrack prefers the LONGEST piece achieving best)."""
    n = len(w)
    best = [0] * (n + 1)
    for i in range(1, n + 1):
        b = None
        for ln in range(1, min(max_len, i) + 1):
            p = w[i - ln : i]
            s = lp.get(p)
            if s is not None:
                v = best[i - ln] + s
                if b is None or v > b:
                    b = v
        best[i] = b
    pos, cnt = n, 0
    while pos > 0:
        chosen = 1
        for ln in range(min(max_len, pos), 1, -1):
            p = w[pos - ln : pos]
            s = lp.get(p)
            if s is not None and best[pos - ln] + s == best[pos]:
                chosen = ln
                break
        cnt += 1
        pos -= chosen
    return cnt


def stream_token_counts(
    stream_df: DataFrame,
    vocab: list,
    group_col: str = "lang",
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """(group, text) stream → per-(micro-batch partition, group)
    partial rows (group, n_words, n_chars, n_tokens); sum per group
    downstream for the ``unigram_lm_encode_stats`` totals.

    ``vocab``: list of (piece, logp_micros) from the trained
    ``unigram_lm_train`` table (the piece lengths bound the DP).
    Words longer than ``max_word_len`` are excluded from all counts on
    both engines (the trainer's fence)."""
    if not vocab:
        raise ValueError("need a trained vocabulary")
    lp = {str(p): int(s) for p, s in vocab}
    max_len = max(len(p) for p in lp)
    memo: dict = {}

    def encode(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            cols = {n: i for i, n in enumerate(batch.schema.names)}
            groups = batch.column(cols[group_col]).to_pylist()
            texts = batch.column(cols[text_col]).to_pylist()
            agg: dict = {}
            for g, t in zip(groups, texts):
                if t is None:
                    continue
                a = agg.setdefault(g, [0, 0, 0])
                for w in t.split(" "):
                    if not w or len(w) > max_word_len:
                        continue
                    hit = memo.get(w)
                    if hit is None:
                        hit = _viterbi_len(w, lp, max_len)
                        memo[w] = hit
                    a[0] += 1
                    a[1] += len(w)
                    a[2] += hit
            if not agg:
                continue
            ks = sorted(agg)
            yield pa.record_batch(
                [
                    pa.array(ks, type=pa.string()),
                    pa.array(
                        np.array([agg[k][0] for k in ks], dtype=np.int64)
                    ),
                    pa.array(
                        np.array([agg[k][1] for k in ks], dtype=np.int64)
                    ),
                    pa.array(
                        np.array([agg[k][2] for k in ks], dtype=np.int64)
                    ),
                ],
                names=[group_col, "n_words", "n_chars", "n_tokens"],
            )

    return stream_df.mapInArrow(
        encode,
        f"{group_col} string, n_words long, n_chars long, n_tokens long",
    )
