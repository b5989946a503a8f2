"""Distributed BPE (operators/bpe.py) vs a pure-Python reference learner:
identical merge sequences on literal and real-corpus samples, fold-merge
semantics on overlap edge cases, and tokenizer/trainer consistency."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    learn_bpe,
    merge_pair,
    word_freqs,
)


def ref_bpe(texts, n_merges, min_freq=2):
    wf = Counter()
    for t in texts:
        for w in (t or "").lower().strip().split():
            if w:
                wf[w] += 1
    words = {w: list(w) + [END_OF_WORD] for w in wf}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_freq:
            break
        merges.append((step, a, b, a + b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_learn_matches_reference_tiny(spark):
    texts = ["low lower lowest", "low low newer newest", "wider wide wide"]
    assert learn_bpe(_docs(spark, texts), n_merges=12) == ref_bpe(texts, 12)


def test_learn_matches_reference_real_corpus(spark, sf_smoke):
    texts = [
        r["text"]
        for r in load_table(spark, sf_smoke, "documents").limit(60).collect()
    ]
    assert learn_bpe(_docs(spark, texts), n_merges=8) == ref_bpe(texts, 8)


def test_merge_fold_equals_ltr_greedy(spark):
    cases = [
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
        (["a", "a", "b"], "a", "b", ["a", "ab"]),
        (["ab", "b", "b"], "ab", "b", ["abb", "b"]),
        (["x"], "a", "b", ["x"]),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, *_rest) in enumerate(cases)],
        "i int, symbols array<string>",
    )
    for i, (syms, a, b, want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(merge_pair(F.col("symbols"), a, b).alias("m"))
            .collect()[0]["m"]
        )
        assert got == want, (syms, a, b, got, want)


def test_min_freq_early_stop(spark):
    # every word unique → after char pairs with freq 1 only, nothing ≥ 2
    texts = ["qxz wvu"]
    assert learn_bpe(_docs(spark, texts), n_merges=5, min_freq=2) == []


def test_apply_bpe_consistent_with_training(spark):
    texts = ["low lower lowest low", "newer newest new low"]
    docs = _docs(spark, texts)
    merges = learn_bpe(docs, n_merges=10, min_freq=2)
    assert merges
    # re-derive the trained symbol table by folding the merges in order
    trained = word_freqs(docs)
    for _, a, b, _m, _c in merges:
        trained = trained.withColumn("symbols", merge_pair(F.col("symbols"), a, b))
    want = {r["word"]: r["symbols"] for r in trained.collect()}
    got_rows = apply_bpe(docs, merges).collect()
    for r in got_rows:
        toks = r["bpe_tokens"]
        # segment the token stream back into words at END_OF_WORD boundaries
        words, cur = [], []
        for t in toks:
            cur.append(t)
            if t.endswith(END_OF_WORD):
                words.append(cur)
                cur = []
        src = [w for w in r["text"].lower().split() if w]
        assert len(words) == len(src)
        for w, seg in zip(src, words):
            assert seg == want[w], (w, seg, want[w])
