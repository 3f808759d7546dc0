"""Distributed unigram-LM training vs a sequential naive twin."""

from __future__ import annotations

import math
import sys
from collections import Counter

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.unigram_lm import (  # noqa: E402
    apply_unigram_lm, train_unigram_lm)


def _naive_viterbi(word, scores, max_len):
    NEG = float("-inf")
    best_lp = [NEG] * (len(word) + 1)
    best_np = [0] * (len(word) + 1)
    back = [0] * (len(word) + 1)
    best_lp[0] = 0.0
    for i in range(1, len(word) + 1):
        for l in range(1, min(max_len, i) + 1):
            lp = scores.get(word[i - l:i])
            if lp is None or best_lp[i - l] == NEG:
                continue
            clp, cnp = best_lp[i - l] + lp, best_np[i - l] + 1
            if clp > best_lp[i] or (clp == best_lp[i] and cnp < best_np[i]):
                best_lp[i], best_np[i], back[i] = clp, cnp, l
    if best_lp[len(word)] == NEG:
        return None
    out, i = [], len(word)
    while i > 0:
        out.append(word[i - back[i]:i])
        i -= back[i]
    return out[::-1]


def _naive_train(texts, vocab_size, em_iters, max_len, seed_size):
    """The identical procedure, sequentially: seed from freq-weighted
    substrings (chars always kept), Viterbi-EM rounds, prune by
    (count desc, piece asc) keeping chars, final EM round."""
    vocab = Counter(w for t in texts for w in t.lower().split())

    sub_w: Counter = Counter()
    for w, f in vocab.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                sub_w[w[i:i + l]] += f
    chars = sorted(p for p in sub_w if len(p) == 1)
    multi = sorted((p for p in sub_w if len(p) > 1),
                   key=lambda p: (-sub_w[p], p))
    seed = {p: sub_w[p] for p in chars}
    for p in multi[:max(seed_size - len(chars), 0)]:
        seed[p] = sub_w[p]

    def norm(counts):
        total = sum(counts.values())
        return {p: math.log(c / total) for p, c in counts.items() if c > 0}

    def em(scores):
        counts: Counter = Counter()
        for w, f in vocab.items():
            seg = _naive_viterbi(w, scores, max_len)
            if seg:
                for p in seg:
                    counts[p] += f
        # char floor: in-vocab single chars never drop to zero
        for p in scores:
            if len(p) == 1 and counts[p] == 0:
                counts[p] = 1
        return counts

    scores = norm(seed)
    for _ in range(em_iters):
        scores = norm(em(scores))
    counts = em(scores)
    keep = {p: c for p, c in counts.items() if len(p) == 1}
    for p, c in sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                       key=lambda pc: (-pc[1], pc[0])):
        if len(keep) >= vocab_size:
            break
        keep[p] = c
    scores = norm(keep)
    scores = norm(em(scores))
    return sorted(scores.items())


TEXTS = ["low lower lowest low low lowland",
         "new newer newest new news newlow",
         "slow slower slowest lowest newest",
         "the lowest newest low new slow"]


def test_train_matches_naive_twin(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = train_unigram_lm(docs, vocab_size=24, em_iters=2,
                           max_piece_len=4, seed_size=64)
    want = _naive_train(TEXTS, vocab_size=24, em_iters=2,
                        max_len=4, seed_size=64)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (p, lp), (_, lw) in zip(got, want):
        assert lp == pytest.approx(lw, abs=1e-12), p
    # multi-char pieces emerged and the char fallback survived pruning
    assert any(len(p) > 1 for p, _ in got)
    assert {p for p, _ in got if len(p) == 1} >= set("lowestnrd")


def test_apply_unigram_lm_compresses(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    pieces = train_unigram_lm(docs, vocab_size=24, em_iters=2,
                              max_piece_len=4, seed_size=64)
    out = {r.doc_id: r for r in apply_unigram_lm(docs, pieces).collect()}
    scores = dict(pieces)
    for i, t in enumerate(TEXTS):
        ws = t.lower().split()
        segs = [_naive_viterbi(w, scores, 4) for w in ws]
        n_tok = sum(len(s) for s in segs)
        assert out[i].n_words == len(ws)
        assert out[i].n_lm_tokens == n_tok
        n_chars = sum(len(w) for w in ws)
        assert out[i].compression == round(n_chars / n_tok, 9)
        assert out[i].compression > 1.0  # pieces beat characters
        lp = sum(scores[p] for s in segs for p in s)
        assert out[i].avg_piece_logp == round(lp / n_tok, 9)


def test_unsegmentable_word_counts_as_char_oov(spark):
    # train on latin text, apply to a doc with unseen CJK chars
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    pieces = train_unigram_lm(docs, vocab_size=16, em_iters=1,
                              max_piece_len=3, seed_size=32)
    alien = spark.createDataFrame([(99, "中文 low")],
                                  "doc_id long, text string")
    row = apply_unigram_lm(alien, pieces).collect()[0]
    scores = dict(pieces)
    low_seg = _naive_viterbi("low", scores, 3)
    assert row.n_words == 2
    assert row.n_lm_tokens == 2 + len(low_seg)  # 2 OOV chars + low pieces


def test_unigram_lm_roundtrip_through_parquet(spark, tmp_path):
    from lightning_metastore_spark.operators.unigram_lm import (
        load_unigram_lm, save_unigram_lm)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    pieces = train_unigram_lm(docs, vocab_size=16, em_iters=1,
                              max_piece_len=3, seed_size=32)
    path = str(tmp_path / "unigram_artifact")
    save_unigram_lm(spark, pieces, path)
    got = load_unigram_lm(spark, path)
    assert [p for p, _ in got] == [p for p, _ in pieces]
    for (_, a), (_, b) in zip(got, pieces):
        assert a == b  # float64 exact through parquet
