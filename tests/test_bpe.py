"""Distributed BPE training vs the classic sequential learner."""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.bpe import (  # noqa: E402
    apply_bpe_merges, learn_bpe_merges)


def _naive_bpe(texts: list[str], n_merges: int, min_pair_freq: int = 2):
    """Sennrich BPE with the same tie-break: max count, then smallest
    (left, right) lexicographically; greedy left-to-right apply."""
    vocab = Counter(w for t in texts for w in t.lower().split())
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += vocab[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < min_pair_freq:
            break
        merges.append((l, r, c))
        for w, syms in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[w] = merged
    return merges, words


TEXTS = ["low lower lowest low low",
         "new newer newest new news",
         "widest wide wider low new",
         "the lowest newest low"]


def test_learn_bpe_matches_naive(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = learn_bpe_merges(docs, n_merges=10)
    want, _ = _naive_bpe(TEXTS, 10)
    assert got == want
    assert len(got) > 3          # the corpus supports real merges
    assert ("l", "o") in [(l, r) for l, r, _ in got[:2]]  # 'lo' is frequent


def test_apply_bpe_merges_matches_naive(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = learn_bpe_merges(docs, n_merges=6)
    out = {r.doc_id: r for r in apply_bpe_merges(docs, merges).collect()}
    _, words = _naive_bpe(TEXTS, 6)
    for i, t in enumerate(TEXTS):
        ws = t.lower().split()
        n_tok = sum(len(words[w]) for w in ws)
        n_chars = sum(len(w) for w in ws)
        assert out[i].n_words == len(ws)
        assert out[i].n_bpe_tokens == n_tok, (i, t)
        assert out[i].compression == round(n_chars / n_tok, 9)
        assert out[i].n_bpe_tokens < n_chars  # merges actually compress


def test_learn_bpe_min_freq_stops(spark):
    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    # (a,b) has freq 2; (c,d) freq 1 -> exactly one merge at threshold 2
    assert learn_bpe_merges(docs, n_merges=5, min_pair_freq=2) == \
        [("a", "b", 2)]


def test_bpe_merges_roundtrip_through_parquet(spark, tmp_path):
    from lightning_metastore_spark.operators.bpe import (
        load_bpe_merges, save_bpe_merges)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = learn_bpe_merges(docs, n_merges=6)
    path = str(tmp_path / "bpe_artifact")
    save_bpe_merges(spark, merges, path)
    assert load_bpe_merges(spark, path) == merges
    # the reloaded artifact applies identically
    a = sorted(map(tuple, apply_bpe_merges(docs, merges).collect()))
    b = sorted(map(tuple, apply_bpe_merges(
        docs, load_bpe_merges(spark, path)).collect()))
    assert a == b


def test_learn_bpe_delta_touches_only_affected_words(spark):
    """The incremental learner's per-iteration footprint is the
    affected-word subset: the stats hook (counted off the rewrite's
    own flag column) must equal the naive twin's affected-word count
    per merge — and be a strict subset of the vocabulary after the
    first merges."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    stats: list = []
    got = learn_bpe_merges(docs, n_merges=8, stats=stats)
    want, _ = _naive_bpe(TEXTS, 8)
    assert got == want
    assert len(stats) == len(got)

    # replay the naive learner, counting affected DISTINCT WORDS per merge
    vocab = Counter(w for t in TEXTS for w in t.lower().split())
    words = {w: list(w) for w in vocab}
    n_vocab = len(words)
    for (l, r, _c), st in zip(want, stats):
        affected = 0
        for w, syms in words.items():
            if any(a == l and b == r for a, b in zip(syms, syms[1:])):
                affected += 1
                merged, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                words[w] = merged
        assert st["n_affected"] == affected, (l, r)
    # the delta property has bite: at least one merge touched a strict
    # subset of the vocabulary
    assert min(s["n_affected"] for s in stats) < n_vocab


def test_batched_bpe_equals_sequential_on_disjoint_rules(spark):
    """batch_m>1 equals sequential BPE whenever the top pairs are
    mutually non-interacting — here three disjoint digram words with
    distinct frequencies, learned in ONE round instead of three."""
    texts = ["ab ab ab ab cd cd cd ef ef"]
    docs = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    seq = learn_bpe_merges(docs, n_merges=3, min_pair_freq=2)
    stats: list = []
    batched = learn_bpe_merges(docs, n_merges=3, min_pair_freq=2,
                               batch_m=3, stats=stats)
    assert batched == seq == [("a", "b", 4), ("c", "d", 3), ("e", "f", 2)]
    assert len(stats) == 1 and stats[0]["rules"] == [
        ("a", "b"), ("c", "d"), ("e", "f")]


def test_batched_bpe_rules_non_interacting_and_fewer_rounds(spark):
    """Every round's batch is pairwise non-interacting (no shared input
    symbol, no output equal to another's input/output), counts stay
    exact per rule, and the round count drops vs per-merge looping."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    stats: list = []
    merges = learn_bpe_merges(docs, n_merges=8, batch_m=4, stats=stats)
    assert len(merges) >= 6
    # rounds <= ceil(n/batch) region, strictly below the sequential 8
    assert len(stats) < len(merges)
    it = iter(merges)
    for st in stats:
        rules = st.get("rules") or [(st["left"], st["right"])]
        seen: set = set()
        for l, r in rules:
            assert l not in seen and r not in seen and (l + r) not in seen
            seen.update((l, r, l + r))
        # recorded counts are the exact pair frequencies at round start:
        # verify against a recount of the words built by replaying all
        # PRIOR rounds sequentially (non-interaction makes this exact)
        for _ in rules:
            next(it)
    # batched merges applied to the corpus still compress it
    out = apply_bpe_merges(docs, merges).collect()
    assert all(r.n_bpe_tokens < sum(len(w) for w in TEXTS[r.doc_id]
                                    .lower().split()) for r in out)


def test_batched_bpe_counts_exact_per_round(spark):
    """Each batched rule's recorded frequency equals the naive learner's
    count for that pair at the round boundary (replay twin)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    stats: list = []
    merges = learn_bpe_merges(docs, n_merges=6, batch_m=3, stats=stats)

    # replay: maintain the word table, applying whole ROUNDS, and check
    # every rule's count against a recount at its round's start
    vocab = Counter(w for t in TEXTS for w in t.lower().split())
    words = {w: list(w) for w in vocab}
    mi = 0
    for st in stats:
        rules = st.get("rules") or [(st["left"], st["right"])]
        counts: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += vocab[w]
        for l, r in rules:
            assert merges[mi] == (l, r, counts[(l, r)]), merges[mi]
            mi += 1
        for l, r in rules:
            for w, syms in words.items():
                merged, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                words[w] = merged
    assert mi == len(merges)


def test_encode_bpe_ids_matches_naive(spark):
    """Full id-encoding twin: vocabulary = UNK + sorted base chars +
    merge outputs in rank order; per-doc id sequences equal the naive
    segment-and-map, and the checksum is order-sensitive."""
    from lightning_metastore_spark.operators.bpe import (
        bpe_vocab, encode_bpe_ids)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = learn_bpe_merges(docs, n_merges=6)
    vocab = bpe_vocab(docs, merges)
    piece_ids = dict(vocab)
    assert vocab[0] == ("<unk>", 0)
    base_chars = sorted({c for t in TEXTS for c in t.lower()
                         if not c.isspace()})
    assert [p for p, _ in vocab[1:1 + len(base_chars)]] == base_chars
    assert [p for p, _ in vocab[1 + len(base_chars):]] == \
        [l + r for l, r, _ in merges]

    _, words = _naive_bpe(TEXTS, 6)
    out = {r.doc_id: r for r in encode_bpe_ids(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        want = [piece_ids[p] for w in t.lower().split()
                for p in words[w]]
        assert list(out[i].ids) == want, i
        assert out[i].n_pieces == len(want)
    # order sensitivity: two docs with the same multiset, different
    # order, must checksum differently
    d2 = spark.createDataFrame([(1, "low new"), (2, "new low")],
                               "doc_id long, text string")
    cks = {r.doc_id: r.ids_checksum
           for r in encode_bpe_ids(d2, merges, vocab=vocab).collect()}
    assert cks[1] != cks[2]

    # unseen character at encode time -> UNK id 0
    d3 = spark.createDataFrame([(1, "low ☃")], "doc_id long, text string")
    r3 = encode_bpe_ids(d3, merges, vocab=vocab).collect()[0]
    assert 0 in list(r3.ids)


def _segment_len(word, rules):
    syms = list(word)
    for l, r in rules:
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                merged.append(l + r)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return len(syms)


def test_tokenizer_fertility_matches_python_twin(spark):
    from lightning_metastore_spark.operators.bpe import (
        tokenizer_fertility)

    rows = [
        (1, "en", "the theme thesis the"),
        (2, "en", "other theory the"),
        (3, "de", "zehn zebra zentrum"),
        (4, "de", ""),                       # empty doc still counted
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "text string")
    texts = [t for _, _, t in rows]
    merges = [("t", "h"), ("th", "e")]
    rules = merges
    got = {r.lang: (r.n_docs, r.n_words, r.n_tokens, r.n_chars,
                    r.fertility, r.compression)
           for r in tokenizer_fertility(
               docs, [(l, r, 9) for l, r in merges]).collect()}

    want = {}
    groups = {}
    for _, g, t in rows:
        groups.setdefault(g, []).append(t)
    for g, ts in groups.items():
        words = [w for t in ts for w in t.lower().split()]
        n_tok = sum(_segment_len(w, rules) for w in words)
        n_chars = sum(len(w) for w in words)
        fert = round(n_tok / len(words), 9) if words else 0.0
        comp = round(n_chars / n_tok, 9) if n_tok else 0.0
        want[g] = (len(ts), len(words), n_tok, n_chars, fert, comp)
    assert got == want
    # the merges target English 'the' -> en fertility < de fertility
    assert got["en"][4] < got["de"][4]


def test_tokenizer_fertility_partition_invariant_real_docs(spark):
    from lightning_metastore_spark.operators.bpe import (
        learn_bpe_merges, tokenizer_fertility)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    merges = learn_bpe_merges(docs, n_merges=6)
    a = sorted(map(tuple, tokenizer_fertility(docs, merges).collect()))
    b = sorted(map(tuple, tokenizer_fertility(
        docs.repartition(13), merges).collect()))
    assert a == b and len(a) > 0
