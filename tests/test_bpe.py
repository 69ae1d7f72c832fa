"""BPE tokenizer training goldens (analytics/bpe.py).

The Spark path (string-replace merge over wrapped symbols, pair counts
via slice/zip_with) is checked against an independent pure-Python
reference implementation of classic BPE (Sennrich 2016: explicit symbol
lists, left-to-right non-overlapping merge walk) on corpora chosen to
stress the tricky cases: overlapping runs (``xxxx``), ties, merged
symbols that themselves merge again.
"""

from __future__ import annotations

from debezium_spark.analytics.bpe import (
    bpe_encode,
    bpe_train,
    word_frequencies,
)


def ref_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple]:
    """Reference BPE on explicit symbol lists."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, freq in word_freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (a, b), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        merges.append((step, a, b, a + b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def ref_tokenize(word: str, merges: list[tuple]) -> list[str]:
    syms = list(word)
    for _, a, b, _, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _words_df(spark, freqs: dict[str, int]):
    return spark.createDataFrame(
        list(freqs.items()), "w string, freq bigint"
    )


def test_merge_sequence_matches_reference_classic_corpus(spark):
    # the Sennrich paper's canonical example shape
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = bpe_train(_words_df(spark, freqs), 10)
    assert got == ref_bpe(freqs, 10)
    # es+t must have merged into 'est' somewhere (the canonical result)
    assert "est" in [m[3] for m in got]


def test_overlapping_runs_and_remerges(spark):
    """xxxx merges pairwise (xx xx), NOT greedily re-overlapping; a
    merged symbol can merge again (xx+xx -> xxxx)."""
    freqs = {"xxxx": 7, "xxx": 5, "ax": 1}
    got = bpe_train(_words_df(spark, freqs), 4)
    ref = ref_bpe(freqs, 4)
    assert got == ref
    assert got[0][1:4] == ("x", "x", "xx")  # first merge
    # after (x,x): xxxx=[xx,xx], xxx=[xx,x] -> (xx,xx) cnt 7 beats (xx,x) 5
    assert got[1][1:4] == ("xx", "xx", "xxxx")


def test_tie_break_is_lexicographic(spark):
    """Equal counts resolve by (left, right) ascending — the determinism
    the DuckDB oracle replay depends on."""
    freqs = {"zy": 3, "ab": 3}
    got = bpe_train(_words_df(spark, freqs), 1)
    assert got == [(0, "a", "b", "ab", 3)] == ref_bpe(freqs, 1)


def test_early_stop_when_fully_merged(spark):
    freqs = {"ab": 2}
    got = bpe_train(_words_df(spark, freqs), 5)
    assert got == [(0, "a", "b", "ab", 2)]  # round 2 has no pairs left


def test_encode_matches_reference_walk(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(_words_df(spark, freqs), 6)
    new_words = ["lowest", "newer", "wide", "x"]
    df = bpe_encode(
        spark.createDataFrame([(w,) for w in new_words], "w string"),
        merges,
    )
    got = {r["w"]: list(r["tokens"]) for r in df.collect()}
    for w in new_words:
        assert got[w] == ref_tokenize(w, merges), w


def test_word_frequencies_truncation_is_deterministic(spark):
    docs = spark.createDataFrame(
        [("The cat. the CAT; a dog!",), ("a b a",)], "text string"
    )
    rows = {
        r["w"]: r["freq"]
        for r in word_frequencies(docs, vocab_size=3).collect()
    }
    # counts: a=3, cat=2, the=2, b=1, dog=1; top-3 by (freq DESC, w ASC)
    assert rows == {"a": 3, "cat": 2, "the": 2}
