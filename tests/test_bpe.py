"""Pins for operators/bpe.py against a from-scratch pure-python BPE
reference (Sennrich-style): identical merge sequences and identical
segmentations, plus determinism and edge cases."""

from __future__ import annotations

import collections

import pytest

from financial_big_data_spark.operators.bpe import (
    END,
    apply_bpe,
    learn_bpe_merges,
    word_frequencies,
)


def _py_bpe(texts, k):
    """Reference implementation: word-frequency table, best pair by
    (count desc, pair asc), sequential merge application."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    segs = {w: list(w) + [END] for w in vocab}
    merges = []
    for _ in range(k):
        counts = collections.Counter()
        for w, freq in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), c = best
        if c < 2:
            break
        merges.append((left, right, c))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest low new",
    "low lower newer news wide",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_frequencies(spark):
    freqs = {
        r["word"]: r["freq"] for r in word_frequencies(_docs(spark)).collect()
    }
    assert freqs["low"] == 5 and freqs["new"] == 3 and freqs["news"] == 2


def test_merge_sequence_matches_reference(spark):
    got = learn_bpe_merges(_docs(spark), k=8)
    want, _ = _py_bpe(TEXTS, 8)
    assert got == want
    assert len(got) == 8  # corpus is rich enough to sustain 8 merges


def test_segmentation_matches_reference(spark):
    merges = learn_bpe_merges(_docs(spark), k=8)
    _, segs = _py_bpe(TEXTS, 8)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(_docs(spark), merges).collect()
    }
    for i, t in enumerate(TEXTS):
        want = []
        for w in t.split(" "):
            want.extend(s.removesuffix(END) for s in segs[w])
        assert out[i] == want, (i, out[i], want)


def test_learning_is_deterministic(spark):
    a = learn_bpe_merges(_docs(spark), k=5)
    b = learn_bpe_merges(_docs(spark), k=5)
    assert a == b


def test_stops_when_no_repeating_pair(spark):
    # every word unique and share-nothing: best pair count is 1 -> stop
    merges = learn_bpe_merges(_docs(spark, ["ab cd", "ef gh"]), k=10)
    assert merges == []
