"""Distributed BPE (byte-pair-encoding) tokenizer training.

The classic Sennrich BPE learner: start from characters, repeatedly
merge the most frequent adjacent symbol pair. The key scale fact is
that after the first aggregation the working set is the DISTINCT-WORD
frequency table — vocabulary-sized (millions of rows at web scale),
thousands of times smaller than the corpus — so each merge iteration
is one pair-count aggregation over that small relation plus a
batch-applied merge, not a corpus pass.

Plan shape (100 TB): ONE corpus-wide shuffle builds (word, freq), and
ONE full pair-count aggregation seeds the (l, r, c) counts relation.
Every round after that maintains counts by DELTA — the heap-based
learner's insight, expressed distributively: merging (l, r) can change
the pair multiset only of words whose current segmentation contains
(l, r) adjacently, so each round (a) filters the word relation to
that affected subset with a JVM array_contains probe, (b) rewrites
just those words in an Arrow-batched ``mapInPandas``, (c) aggregates
pair counts over the affected words before and after the rewrite, and
(d) folds the signed delta into the counts relation in one keyed agg.
The full vocabulary is never re-AGGREGATED after the seed pass —
though the word relation is still SCANNED (JVM filter) and
re-checkpointed once per round; only the Python rewrite and the
shuffle volume are delta-sized. The top pairs are a small TakeOrdered
on the maintained counts relation, and ``batch_m`` top
non-interacting merges apply per round (frequency-batched BPE), so a
32k-merge vocabulary needs ~32k/batch_m driver round-trips rather
than 32k. Both the word and counts relations are localCheckpointed
per round (iterative-algorithm lineage cut, same pattern as Lloyd's
k-means in operators/similarity.py); driver state per round is the
top-pair sample only.

Determinism: ties in pair frequency break lexicographically on
(left, right); merge application is the standard greedy left-to-right
non-overlapping replacement — both mirrored by the naive twin in
tests/test_bpe.py.

Reference parity note: the reference has no tokenizer training
(SURVEY.md §2.7); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SYMS_SCHEMA = "word string, freq long, syms array<string>"


def _word_symbols(docs: DataFrame, text_col: str,
                  lowercase: bool) -> DataFrame:
    """(word, freq, syms) — the distinct-word frequency table with each
    word split into single-character symbols. One corpus shuffle."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = (docs.select(F.explode(
        F.regexp_extract_all(text, F.lit(r"(\S+)"), 1)).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    # one symbol per character ('.' can't match newline, but words come
    # from a \S+ extraction so none contain one)
    return words.select("word", "freq",
                        F.regexp_extract_all(F.col("word"), F.lit("(.)"), 1)
                        .alias("syms"))


def _merge_batch(rules: list[tuple[str, str]]):
    """mapInPandas body applying a list of merge rules, each greedily
    left-to-right (non-overlapping), in list order — the standard BPE
    apply step. Rules in one batch are mutually non-interacting
    (disjoint symbols and outputs, see ``learn_bpe_merges``), so the
    in-order application equals applying them in any order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                for l, r in rules:
                    merged, i = [], 0
                    while i < len(syms):
                        if (i + 1 < len(syms) and syms[i] == l
                                and syms[i + 1] == r):
                            merged.append(l + r)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    syms = merged
                out.append(syms)
            yield pd.DataFrame({"word": pdf["word"], "freq": pdf["freq"],
                                "syms": out})

    return run


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the symbol arrays —
    JVM transform-with-index, no Python."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS l, syms[i + 1] AS r))")
    return (syms.select("freq", F.explode(pairs).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c")))


def _contains_pair(l: str, r: str):
    """Boolean column: does the current segmentation contain the
    adjacent pair (l, r)? array_contains over the same struct stream
    the pair aggregation explodes — pure JVM, and safe for arbitrary
    symbol content (no SQL-string quoting of the symbols)."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS l, syms[i + 1] AS r))")
    return F.array_contains(
        pairs, F.struct(F.lit(l).alias("l"), F.lit(r).alias("r")))


def learn_bpe_merges(docs: DataFrame, n_merges: int = 16,
                     min_pair_freq: int = 2, text_col: str = "text",
                     lowercase: bool = True,
                     stats: list | None = None,
                     batch_m: int = 1) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.
    Returns [(left, right, pair_freq), ...] in merge order — feed to
    ``apply_bpe_merges`` or export as a tokenizer artifact.

    Stops early when no adjacent pair reaches ``min_pair_freq``.

    Pair counts are maintained incrementally (see the module
    docstring): after the seed aggregation, each round's Python
    rewrite and pair-count delta are sized to the words affected by
    that round's merges (the word relation is still scanned by a JVM
    filter and re-checkpointed once per round — only the Python and
    shuffle work is delta-sized).

    ``batch_m``: merges applied per round. 1 (default) is EXACT
    sequential Sennrich BPE. >1 selects up to ``batch_m`` top pairs
    that are mutually NON-INTERACTING — no shared input symbol and no
    rule's output equal to another's input or output — and applies
    them in one rewrite + one delta fold: the published
    frequency-batched BPE variant. Each selected rule's count is exact
    (non-interacting rules cannot change each other's counts), and
    within a round the rules commute; across rounds the learned merge
    ORDER can differ from sequential BPE when a merge's newly created
    pairs would have outranked a later rule in the same batch. Driver
    round-trips drop from n_merges to ~n_merges/batch_m — the
    sequential-latency fix for real 32k-merge vocabularies where each
    round is scheduler-bound, not data-bound.

    Pass ``stats`` (an empty list) to receive one dict per ROUND:
    ``{"n_affected": int}`` plus ``left``/``right`` when the round
    applied one rule, else ``rules`` — the test hook proving the delta
    property (affected counts come from the flag column the rewrite
    already carries, one cheap count on the checkpointed relation,
    only when requested).
    """
    cur = (_word_symbols(docs, text_col, lowercase)
           .withColumn("__m", F.lit(0)).localCheckpoint())
    n_parts = cur.rdd.getNumPartitions()
    counts = _pair_counts(cur).localCheckpoint()  # the ONLY full agg
    pairs_expr = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS l, syms[i + 1] AS r))")
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        want = min(batch_m, n_merges - len(merges))
        top = (counts.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
               .limit(max(8, 4 * want)).collect())
        top = [t for t in top if t["c"] >= min_pair_freq]
        if not top:
            break
        # greedy non-interacting selection in priority order: a rule
        # joins the batch only if its inputs AND its output are
        # disjoint from every already-accepted rule's inputs/output —
        # merging (x,l,r,y)->(x,l+r,y) then provably cannot create,
        # destroy, or consume any other accepted rule's occurrences,
        # so simultaneous application == sequential in any order and
        # each rule's round-start count is its exact apply-time count
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for t in top:
            if len(batch) >= want:
                break
            l, r, c = t["l"], t["r"], int(t["c"])
            if l in used or r in used or (l + r) in used:
                continue
            batch.append((l, r, c))
            used.update((l, r, l + r))
        merges.extend(batch)
        rules = [(l, r) for l, r, _ in batch]
        # one adjacent-pair stream probed against the whole batch with
        # a single arrays_overlap — NOT an OR-chain of array_contains,
        # which would rebuild the transform per rule
        if len(rules) == 1:
            hit = _contains_pair(*rules[0])
        else:
            probe = F.array(*[
                F.struct(F.lit(l).alias("l"), F.lit(r).alias("r"))
                for l, r in rules])
            hit = F.arrays_overlap(pairs_expr, probe)
        # rewrite ONLY the affected words; untouched words stream
        # through a JVM filter, never Python. __m flags the rewritten
        # rows inside the new checkpoint so the delta's "after" side
        # can key off them without a second rewrite. coalesce pins the
        # partition count — the two-branch union would otherwise
        # double it every iteration.
        nxt = (cur.filter(~hit).withColumn("__m", F.lit(0))
               .select("word", "freq", "syms", "__m")
               .unionByName(
                   cur.filter(hit).select("word", "freq", "syms")
                   .mapInPandas(_merge_batch(rules), schema=_SYMS_SCHEMA)
                   .withColumn("__m", F.lit(1)))
               .coalesce(n_parts)
               .localCheckpoint())
        if stats is not None:
            entry = {"n_affected": nxt.filter("__m = 1").count()}
            if len(rules) == 1:
                entry["left"], entry["right"] = rules[0]
            else:
                entry["rules"] = rules
            stats.append(entry)
        # fold the delta straight into the counts relation in ONE
        # keyed agg: prior counts ride as (l, r, +c) rows, the affected
        # words' pairs as signed freq rows (-freq before the rewrite,
        # +freq after), so counts' = sum per (l, r) — no join, one
        # shuffle, input sized |counts| + |affected-word pairs|.
        signed = (cur.filter(hit)
                  .select((-F.col("freq")).alias("w"), "syms")
                  .unionByName(nxt.filter("__m = 1")
                               .select(F.col("freq").alias("w"), "syms"))
                  .select("w", F.explode(pairs_expr).alias("p"))
                  .select("p.l", "p.r", "w"))
        counts = (counts.select("l", "r", F.col("c").alias("w"))
                  .unionByName(signed)
                  .groupBy("l", "r").agg(F.sum("w").alias("c"))
                  .filter(F.col("c") > 0)
                  .localCheckpoint())
        cur = nxt
    return merges


def apply_bpe_merges(docs: DataFrame, merges: list[tuple[str, str, int]],
                     text_col: str = "text", id_col: str = "doc_id",
                     lowercase: bool = True) -> DataFrame:
    """Segment every document with learned merge rules:
    (doc_id, n_words, n_bpe_tokens, compression) where compression =
    characters per BPE token (higher = merges are effective).

    One Arrow-batched pass over the corpus; the merge list (the trained
    tokenizer) rides inside the closure — KBs, effectively broadcast.
    """
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.regexp_extract_all(text, F.lit(r"(\S+)"), 1).alias("words"))
    rules = [(l, r) for l, r, _ in merges]

    out_cols = [id_col, "n_words", "n_bpe_tokens", "compression"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # memoize per distinct word — the Zipfian head dominates the
        # token stream, so the common case is a dict hit, mirroring the
        # learner's distinct-word working set
        cache: dict[str, int] = {}

        def segment(word: str) -> int:
            hit = cache.get(word)
            if hit is not None:
                return hit
            syms = list(word)
            for l, r in rules:
                merged, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            cache[word] = len(syms)
            return len(syms)

        for pdf in batches:
            rows = []
            for rid, words in zip(pdf[id_col], pdf["words"]):
                if words is None:        # NULL text -> empty doc row
                    words = []
                n_tok = sum(segment(w) for w in words)
                n_chars = sum(len(w) for w in words)
                rows.append({
                    id_col: int(rid), "n_words": len(words),
                    "n_bpe_tokens": n_tok,
                    "compression": round(n_chars / n_tok, 9)
                    if n_tok else 0.0})
            yield (pd.DataFrame(rows, columns=out_cols) if rows else
                   pd.DataFrame(columns=out_cols))

    return base.mapInPandas(
        run, schema=f"{id_col} long, n_words long, n_bpe_tokens long, "
                    "compression double")


def save_bpe_merges(spark, merges: list[tuple[str, str, int]],
                    path: str) -> None:
    """Persist a trained merge list as a parquet tokenizer artifact
    (rank-ordered; rank IS the merge priority). Tiny file — the point
    is an engine-portable, versionable artifact next to the corpus."""
    rows = [(i, l, r, int(c)) for i, (l, r, c) in enumerate(merges)]
    df = spark.createDataFrame(
        rows, "rank long, left string, right string, pair_freq long")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe_merges(spark, path: str) -> list[tuple[str, str, int]]:
    """Reload a saved merge list in training order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"], int(r["pair_freq"])) for r in rows]


def bpe_vocab(docs: DataFrame, merges: list[tuple[str, str, int]],
              text_col: str = "text",
              lowercase: bool = True) -> list[tuple[str, int]]:
    """Deterministic piece->id vocabulary for a trained merge list:
    id 0 is UNK, then the corpus's distinct base characters in sorted
    order, then one merged symbol per rule in rank order (the
    SentencePiece-style contract: ids are stable across runs and
    engines because every input is deterministic). One JVM
    character-explode aggregation over the corpus — the vocabulary is
    KB-sized by construction."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    chars = (docs.select(F.explode(F.split(
        F.regexp_replace(text, r"\s+", ""), "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct().orderBy("c").collect())
    pieces = ["<unk>"] + [r["c"] for r in chars] + \
        [l + r for l, r, _ in merges]
    return [(p, i) for i, p in enumerate(pieces)]


def encode_bpe_ids(docs: DataFrame, merges: list[tuple[str, str, int]],
                   vocab: list[tuple[str, int]] | None = None,
                   text_col: str = "text", id_col: str = "doc_id",
                   lowercase: bool = True) -> DataFrame:
    """Encode every document to BPE piece ids — the actual
    tokenizer-application output a training pipeline feeds to packing:
    (doc_id, n_pieces, ids, ids_checksum). Pieces outside the
    vocabulary (characters unseen at train time) encode as UNK (id 0).

    One Arrow-batched map pass with the merge rules + vocabulary in
    the closure (KBs); per-distinct-word memoization exploits the
    Zipfian head exactly like ``apply_bpe_merges``. ``ids_checksum``
    is an order-sensitive polynomial hash of the id sequence, so two
    encodings agree iff every position agrees.
    """
    if vocab is None:
        vocab = bpe_vocab(docs, merges, text_col, lowercase)
    piece_ids = dict(vocab)
    rules = [(l, r) for l, r, _ in merges]

    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.regexp_extract_all(text, F.lit(r"(\S+)"), 1).alias("words"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}

        def segment(word: str) -> list[int]:
            hit = cache.get(word)
            if hit is not None:
                return hit
            syms = list(word)
            for l, r in rules:
                merged, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            ids = [piece_ids.get(s, 0) for s in syms]
            cache[word] = ids
            return ids

        cols = [id_col, "n_pieces", "ids", "ids_checksum"]
        for pdf in batches:
            rows = []
            for rid, words in zip(pdf[id_col], pdf["words"]):
                ids: list[int] = []
                for w in (words if words is not None else []):
                    ids.extend(segment(w))
                ck = 0
                for x in ids:
                    ck = (ck * 1_000_003 + x + 1) % (1 << 61)
                rows.append({id_col: int(rid), "n_pieces": len(ids),
                             "ids": ids, "ids_checksum": ck})
            yield (pd.DataFrame(rows, columns=cols) if rows else
                   pd.DataFrame(columns=cols))

    return base.mapInPandas(
        run, schema=f"{id_col} long, n_pieces long, ids array<int>, "
                    "ids_checksum long")


def tokenizer_fertility(docs: DataFrame, merges: list[tuple[str, str, int]],
                        group_col: str = "lang", text_col: str = "text",
                        id_col: str = "doc_id",
                        lowercase: bool = True) -> DataFrame:
    """Per-group tokenizer quality profile — the fertility audit run
    before committing to a tokenizer for a multilingual corpus:
    (group, n_docs, n_words, n_tokens, n_chars, fertility, compression)
    where fertility = BPE tokens per whitespace word (lower = the
    tokenizer fits the group; >> 1 flags under-served languages) and
    compression = characters per BPE token.

    All group sums are exact int64 (partition-invariant); the two
    ratios are computed once from the totals and rounded to 9dp. The
    char count is taken on the same lowercased text the segmenter
    sees, so chars == sum of segmented word lengths exactly.

    Scale: one Arrow-batched segmentation pass (the ``apply_bpe_merges``
    shape — the merge list rides in the closure), one id-keyed join to
    recover the group column, one tiny per-group aggregate (groups =
    dozens). Nothing driver-side scales with the corpus.
    """
    per_doc = apply_bpe_merges(docs, merges, text_col=text_col,
                               id_col=id_col, lowercase=lowercase)
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    side = docs.select(
        F.col(id_col), F.col(group_col),
        F.length(F.regexp_replace(text, r"\s+", "")).alias("wc"))
    j = per_doc.join(side, id_col)
    agg = j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_bpe_tokens").cast("long").alias("n_tokens"),
        F.sum("wc").cast("long").alias("n_chars"))
    return agg.select(
        group_col, "n_docs", "n_words", "n_tokens", "n_chars",
        F.when(F.col("n_words") > 0,
               F.round(F.col("n_tokens") / F.col("n_words"), 9))
        .otherwise(F.lit(0.0)).alias("fertility"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("n_chars") / F.col("n_tokens"), 9))
        .otherwise(F.lit(0.0)).alias("compression"))
