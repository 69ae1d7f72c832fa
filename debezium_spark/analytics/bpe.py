"""x41 — BPE tokenizer training over a corpus (the tokenizer half of
LLM training-data prep; the reference's embedding/model hooks — T20's
``debezium-ai`` model factories — are the inference half).

Algorithm: classic byte-pair encoding over a word-frequency table
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"): words start as character sequences; each round counts
adjacent symbol pairs weighted by word frequency, merges the single most
frequent pair everywhere (ties broken by (count DESC, left ASC, right
ASC) so training is fully deterministic and replayable), and repeats for
a bounded number of merges.

Spark shape at 100 TB: the ONLY corpus-wide pass is the word-frequency
aggregation (one shuffle with map-side combine — x15's vocabulary
count); training then runs on the bounded vocabulary table. Each merge
round is one pair-count hash aggregation over the vocab (pairs built
JVM-side with ``slice``/``zip_with``, never Python) plus a
``TakeOrdered(1)`` argmax — the per-round collect is a single row. The
merge loop is driver-sequenced by nature (round k+1's counts depend on
round k's merge), exactly like the reference's serial DDL fold; the
per-round work stays distributed.

Tokenization state is a flat string, not an array: each symbol is
wrapped ``|sym|`` and a merge of (a, b) is ``replace(W, '|a||b|',
'|ab|')`` — string ``replace`` scans left-to-right non-overlapping,
which IS BPE's merge order (``xxxx`` + merge (x,x) → ``xx xx``, and
``xxx`` → ``xx x``), and the per-symbol wrapping makes a token-boundary
false match impossible. One whole-stage-codegen expression per round;
no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: symbol separator in the flat tokenization string — any character that
#: cannot appear inside a symbol works; word extraction below is [a-z]+
SEP = "|"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", vocab_size: int = 200
) -> DataFrame:
    """The corpus pass: lowercase [a-z]+ words → (w, freq), truncated to
    the ``vocab_size`` most frequent (ties: word ASC — deterministic).
    Map-side combine carries one row per distinct word per partition into
    the shuffle; the truncation is a distributed TakeOrdered."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("w")
    )
    freq = words.groupBy("w").agg(F.count("*").alias("freq"))
    return freq.orderBy(F.col("freq").desc(), F.col("w")).limit(vocab_size)


def _wrap_chars(col: Column) -> Column:
    # "ab" -> "|a||b|": every character individually wrapped
    return F.regexp_replace(col, "(.)", r"|$1|")


def _toks(w_col: Column) -> Column:
    split = F.split(w_col, r"\|")
    return F.filter(split, lambda t: t != F.lit(""))


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "w",
    freq_col: str = "freq",
) -> list[tuple[int, str, str, str, int]]:
    """Train ``n_merges`` BPE merges over a (word, freq) table. Returns
    the merge sequence ``[(step, left, right, merged, pair_count), ...]``
    — the artifact a tokenizer ships. Stops early once every word is a
    single symbol (no adjacent pair remains)."""
    state = words.select(
        F.col(freq_col).alias("freq"),
        _wrap_chars(F.col(word_col)).alias("W"),
    ).localCheckpoint(eager=True)  # materialize: rounds must not re-run
    # the upstream corpus aggregation

    out: list[tuple[int, str, str, str, int]] = []
    for step in range(n_merges):
        toks = _toks(F.col("W"))
        df = state.select("freq", toks.alias("toks"))
        n = F.size("toks")
        pair = F.explode(
            F.zip_with(
                F.slice("toks", F.lit(1), n - 1),
                F.slice("toks", F.lit(2), n - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        )
        counts = (
            df.select("freq", pair.alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = counts.orderBy(
            F.col("cnt").desc(), F.col("a"), F.col("b")
        ).limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        out.append((step, a, b, a + b, cnt))
        state = state.withColumn(
            "W",
            F.replace(
                F.col("W"),
                F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                F.lit(f"{SEP}{a}{b}{SEP}"),
            ),
        )
    return out


def bpe_encode(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "w",
    out_col: str = "tokens",
) -> DataFrame:
    """Apply a trained merge sequence to tokenize ``text_col`` (one word
    per row) into subword arrays — a chain of ``n_merges`` codegen
    ``replace`` expressions applied in training order, then the unwrap.
    Fully JVM-side; tokenizing a 100 TB corpus is a scan-shaped map."""
    w = _wrap_chars(F.col(text_col))
    for m in merges:
        a, b = m[1], m[2]
        w = F.replace(
            w,
            F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
            F.lit(f"{SEP}{a}{b}{SEP}"),
        )
    return df.withColumn(out_col, _toks(w))
