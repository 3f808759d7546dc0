"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

The second classic subword learner next to BPE (operators/bpe.py):
Kudo's unigram language model (ACL 2018), here in its hard-EM
(Viterbi-EM) form — seed a large candidate-piece vocabulary from
frequent substrings, alternate (E) best-segmentation of every word
under current piece log-probs with (V)iterbi and (M) re-estimating
log-probs from the weighted piece counts, then prune to the target
vocabulary and re-fit.

Scale shape (the BPE discipline): ONE corpus shuffle builds the
distinct-word frequency relation; seeding is a JVM substring explode
+ one weighted aggregation over it (fan-out <= max_piece_len per
character of the VOCABULARY, not the corpus). Each EM iteration is one
Arrow-batched Viterbi pass over the word relation (the trained scores
ride in the closure — the tokenizer artifact is bounded by
``vocab_size``, KBs-to-MBs, broadcast-sized by definition) plus one
piece-count aggregation. Driver state per iteration is the piece table
itself — exactly the artifact a tokenizer trainer must ship, never
corpus-sized.

Determinism: every tie is broken structurally — seed selection by
(weight desc, piece asc); Viterbi by (total logp, fewer pieces,
shortest final piece) with strict-improvement updates; M-step log-probs
computed with the same ``math.log`` the naive twin uses. The pytest
twin (tests/test_unigram_lm.py) replays the identical procedure
sequentially and must agree piece-for-piece and score-for-score.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_freqs(docs: DataFrame, text_col: str,
                lowercase: bool) -> DataFrame:
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    return (docs.select(F.explode(
        F.regexp_extract_all(text, F.lit(r"(\S+)"), 1)).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _seed_pieces(words: DataFrame, max_piece_len: int,
                 seed_size: int) -> list[tuple[str, int]]:
    """Top-``seed_size`` substrings by corpus weight (freq-weighted
    occurrence count), ALWAYS including every single character so any
    word stays segmentable. JVM substring fan-out + one aggregation;
    the returned list is the bounded seed artifact."""
    subs = F.expr(
        f"flatten(transform(sequence(1, length(word)), "
        f"i -> transform(sequence(1, least({int(max_piece_len)}, "
        f"length(word) - i + 1)), l -> substring(word, i, l))))")
    weighted = (words.select("freq", F.explode(subs).alias("piece"))
                .groupBy("piece").agg(F.sum("freq").alias("w")))
    chars = (weighted.filter(F.length("piece") == 1)
             .orderBy(F.asc("piece")).collect())
    multi = (weighted.filter(F.length("piece") > 1)
             .orderBy(F.desc("w"), F.asc("piece"))
             .limit(max(seed_size - len(chars), 0)).collect())
    seed = {r["piece"]: int(r["w"]) for r in chars}
    seed.update({r["piece"]: int(r["w"]) for r in multi})
    return sorted(seed.items())


def _viterbi(word: str, scores: dict[str, float],
             max_piece_len: int) -> list[str] | None:
    """Best segmentation of ``word`` under ``scores`` (piece -> logp).
    Maximize total logp; ties -> fewer pieces; remaining ties -> the
    shortest final piece (first strict improvement wins while scanning
    piece lengths ascending). Returns None when unsegmentable."""
    n = len(word)
    NEG = float("-inf")
    best_lp = [NEG] * (n + 1)
    best_np = [0] * (n + 1)
    back = [0] * (n + 1)
    best_lp[0] = 0.0
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            lp = scores.get(word[i - l:i])
            if lp is None or best_lp[i - l] == NEG:
                continue
            cand_lp = best_lp[i - l] + lp
            cand_np = best_np[i - l] + 1
            if (cand_lp > best_lp[i]
                    or (cand_lp == best_lp[i] and cand_np < best_np[i])):
                best_lp[i] = cand_lp
                best_np[i] = cand_np
                back[i] = l
    if best_lp[n] == NEG:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[i - back[i]:i])
        i -= back[i]
    out.reverse()
    return out


def _piece_counts(words: DataFrame, scores: dict[str, float],
                  max_piece_len: int) -> DataFrame:
    """E-step: freq-weighted piece usage counts over the word relation.
    Arrow-batched Viterbi (scores in the closure), one aggregation."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str] | None] = {}
        for pdf in batches:
            pieces, freqs = [], []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                seg = memo.get(word)
                if seg is None and word not in memo:
                    seg = _viterbi(word, scores, max_piece_len)
                    memo[word] = seg
                if seg:
                    for p in seg:
                        pieces.append(p)
                        freqs.append(int(freq))
            yield pd.DataFrame({"piece": pieces, "freq": freqs})

    return (words.mapInPandas(run, schema="piece string, freq long")
            .groupBy("piece").agg(F.sum("freq").alias("c")))


def _normalize(counts: list[tuple[str, int]]) -> dict[str, float]:
    total = sum(c for _, c in counts)
    return {p: math.log(c / total) for p, c in counts if c > 0}


def _with_char_floor(counts: list[tuple[str, int]],
                     vocab: dict[str, float]) -> list[tuple[str, int]]:
    """Single characters in the current vocabulary keep a floor count
    of 1 even when Viterbi never uses them — hard EM would otherwise
    zero them out and destroy the char-level fallback that keeps every
    word segmentable (soft EM keeps them alive via fractional counts;
    the floor is the hard-EM stand-in)."""
    have = dict(counts)
    for p in vocab:
        if len(p) == 1 and have.get(p, 0) == 0:
            have[p] = 1
    return sorted(have.items())


def train_unigram_lm(docs: DataFrame, vocab_size: int = 64,
                     em_iters: int = 2, max_piece_len: int = 4,
                     seed_size: int = 256, text_col: str = "text",
                     lowercase: bool = True) -> list[tuple[str, float]]:
    """Train a unigram-LM subword vocabulary; returns the piece table
    [(piece, logp), ...] sorted by piece — the tokenizer artifact.

    Procedure: seed -> ``em_iters`` Viterbi-EM rounds on the full seed
    -> prune to ``vocab_size`` by (count desc, piece asc) keeping every
    single character -> one final EM round on the pruned vocabulary.
    """
    words = _word_freqs(docs, text_col, lowercase).localCheckpoint()
    seed = _seed_pieces(words, max_piece_len, seed_size)
    scores = _normalize(seed)

    def em_round(cur: dict[str, float]) -> list[tuple[str, int]]:
        rows = _piece_counts(words, cur, max_piece_len).collect()
        return sorted((r["piece"], int(r["c"])) for r in rows)

    for _ in range(em_iters):
        counts = _with_char_floor(em_round(scores), scores)
        scores = _normalize(counts)

    counts = _with_char_floor(em_round(scores), scores)
    chars = [(p, c) for p, c in counts if len(p) == 1]
    multi = sorted(((p, c) for p, c in counts if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    keep = dict(chars)
    for p, c in multi:
        if len(keep) >= vocab_size:
            break
        keep[p] = c
    scores = _normalize(sorted(keep.items()))
    counts = _with_char_floor(em_round(scores), scores)
    scores = _normalize(counts)
    return sorted(scores.items())


def apply_unigram_lm(docs: DataFrame, pieces: list[tuple[str, float]],
                     max_piece_len: int = 4, text_col: str = "text",
                     id_col: str = "doc_id",
                     lowercase: bool = True) -> DataFrame:
    """Segment every document with a trained piece table: (doc_id,
    n_words, n_lm_tokens, compression, avg_piece_logp). One
    Arrow-batched corpus pass, piece table in the closure (KB-sized);
    per-word memoization exploits the Zipfian head exactly like the
    BPE apply step."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.regexp_extract_all(text, F.lit(r"(\S+)"), 1).alias("words"))
    scores = dict(pieces)
    cols = [id_col, "n_words", "n_lm_tokens", "compression",
            "avg_piece_logp"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[int, float]] = {}

        def word_stats(w: str) -> tuple[int, float]:
            hit = memo.get(w)
            if hit is not None:
                return hit
            seg = _viterbi(w, scores, max_piece_len)
            # unsegmentable (piece pruned chars never seen at train
            # time): count each char as one OOV token at logp 0
            stats = ((len(w), 0.0) if seg is None else
                     (len(seg), sum(scores[p] for p in seg)))
            memo[w] = stats
            return stats

        for pdf in batches:
            rows = []
            for rid, words in zip(pdf[id_col], pdf["words"]):
                if words is None:        # NULL text -> empty doc row
                    words = []
                n_tok, lp = 0, 0.0
                for w in words:
                    t, l = word_stats(w)
                    n_tok += t
                    lp += l
                n_chars = sum(len(w) for w in words)
                rows.append({
                    id_col: int(rid), "n_words": len(words),
                    "n_lm_tokens": n_tok,
                    "compression": round(n_chars / n_tok, 9) if n_tok
                    else 0.0,
                    "avg_piece_logp": round(lp / n_tok, 9) if n_tok
                    else 0.0})
            yield (pd.DataFrame(rows, columns=cols) if rows else
                   pd.DataFrame(columns=cols))

    return base.mapInPandas(
        run, schema=f"{id_col} long, n_words long, n_lm_tokens long, "
                    "compression double, avg_piece_logp double")


def save_unigram_lm(spark, pieces: list[tuple[str, float]],
                    path: str) -> None:
    """Persist the trained piece table (piece, logp) as a parquet
    tokenizer artifact."""
    df = spark.createDataFrame([(p, float(lp)) for p, lp in pieces],
                               "piece string, logp double")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_unigram_lm(spark, path: str) -> list[tuple[str, float]]:
    """Reload a saved piece table, sorted by piece (the canonical order
    ``train_unigram_lm`` returns)."""
    rows = spark.read.parquet(path).orderBy("piece").collect()
    return [(r["piece"], float(r["logp"])) for r in rows]
