"""x20 BPE vocabulary induction: the N-round iterative argmax is not
one-statement SQL, so its correctness pin is an EXACT replay — a
pure-Python reference BPE (Sennrich et al. 2016 greedy scan, same
freq-desc-then-lexicographic tie-break) over the same (word, freq)
table must produce the identical merge list, bit for bit."""

import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark import QUERIES
from real_time_event_streaming_analytics_platform_spark.functions.vocab import (
    END_MARK,
    N_MERGES,
    bpe_merges,
    word_freq,
)
from real_time_event_streaming_analytics_platform_spark.catalog import load

from .conftest import SF_DIR


def _reference_bpe(freqs: dict[str, int], n_merges: int):
    """Driver-side reference: dict-of-tuples symbol table, greedy
    left-to-right merge, ties broken (freq desc, left, right)."""
    syms = {w: tuple(list(w) + [END_MARK]) for w in freqs}
    out = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            f = freqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, a + b, cnt))
        merged = {}
        for w, s in syms.items():
            acc = []
            for tok in s:
                if acc and acc[-1] == a and tok == b:
                    acc[-1] = a + b
                else:
                    acc.append(tok)
            merged[w] = tuple(acc)
        syms = merged
    return out


def test_x20_matches_driver_reference_on_corpus(spark):
    docs = load(spark, SF_DIR, "documents")
    wf = word_freq(docs)
    freqs = {r.word: r.freq for r in wf.collect()}
    expect = _reference_bpe(freqs, N_MERGES)
    got = bpe_merges(spark, wf, N_MERGES)
    assert got == expect
    # registered query returns the same table
    rows = [tuple(r) for r in QUERIES["x20_bpe_vocab"](spark, SF_DIR).collect()]
    assert rows == expect


def test_x20_greedy_scan_consumes_merged_symbol(spark):
    """'aaaa' with top pair (a,a) must fold to [aa, aa, </w>], never
    [aa, aa] + a leftover — the left-to-right scan can't reuse the
    symbol it just produced."""
    wf = spark.createDataFrame([("aaaa", 10), ("ab", 1)], "word string, freq bigint")
    merges = bpe_merges(spark, wf, 2)
    assert merges[0][:4] == (1, "a", "a", "aa")
    # second round: pairs over ['aa','aa','</w>'] (x10) and ['a','b','</w>']
    expect = _reference_bpe({"aaaa": 10, "ab": 1}, 2)
    assert merges == expect


def test_x20_tie_breaks_lexicographically(spark):
    """Equal-frequency pairs must pick the lexicographically smallest
    (left, right) in both engines — the determinism the merge table's
    bit-stability claim rests on."""
    wf = spark.createDataFrame(
        [("zy", 5), ("bc", 5)], "word string, freq bigint"
    )
    merges = bpe_merges(spark, wf, 1)
    # pairs: (z,y)=5, (b,c)=5, (y,</w>)=5, (c,</w>)=5 -> (b,c) wins
    assert merges[0][:4] == (1, "b", "c", "bc")
    assert merges == _reference_bpe({"zy": 5, "bc": 5}, 1)


def test_x20_stops_when_no_pairs_remain(spark):
    """Single-char words collapse to one symbol after merging with the
    end marker; the loop must stop early instead of erroring."""
    wf = spark.createDataFrame([("a", 3)], "word string, freq bigint")
    merges = bpe_merges(spark, wf, 5)
    assert merges == _reference_bpe({"a": 3}, 5)
    assert len(merges) == 1  # (a, </w>) then nothing left
