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


def _reference_encode(word: str, merges) -> tuple[str, ...]:
    """Apply the merge list in rank order with the same greedy scan."""
    s = list(word) + [END_MARK]
    for m in merges:
        a, b = m[1], m[2]
        acc = []
        for tok in s:
            if acc and acc[-1] == a and tok == b:
                acc[-1] = a + b
            else:
                acc.append(tok)
        s = acc
    return tuple(s)


def test_x22_encode_matches_reference_tokenization(spark):
    """encode_words must emit, per distinct word, exactly the token
    sequence the rank-order greedy replay produces — and every emitted
    token must be a trained merge product, a single char, or the end
    marker (no partial merges leak)."""
    from real_time_event_streaming_analytics_platform_spark.functions.vocab import (
        encode_words,
    )

    docs = load(spark, SF_DIR, "documents")
    wf = word_freq(docs)
    merges = bpe_merges(spark, wf, N_MERGES)
    words = wf.select("word").orderBy(F.xxhash64("word")).limit(60)
    got = {r["word"]: tuple(r["toks"]) for r in encode_words(words, merges).collect()}
    legal = {m[3] for m in merges} | {END_MARK}
    for w in got:
        assert got[w] == _reference_encode(w, merges), w
        assert all(t in legal or len(t) == 1 for t in got[w]), (w, got[w])


def test_x22_trainer_state_equals_reencoding(spark):
    """The r14 x22 rewrite rides the trainer's final symbol state
    instead of re-applying all merges to the distinct-word table; the
    two frames must be BITWISE identical per word (same toks array,
    same count) — the invariant that makes the rewrite an optimization
    and not a semantics change."""
    from real_time_event_streaming_analytics_platform_spark.functions.vocab import (
        bpe_merges_with_state,
        encode_words,
    )

    docs = load(spark, SF_DIR, "documents")
    wf = word_freq(docs)
    merges, final_syms = bpe_merges_with_state(spark, wf, N_MERGES)
    ride = {
        r["word"]: tuple(r["syms"]) for r in final_syms.collect()
    }
    reenc = {
        r["word"]: tuple(r["toks"])
        for r in encode_words(wf.select("word").distinct(), merges).collect()
    }
    assert ride == reenc
    assert len(ride) > 20


def test_x22_doc_totals_match_reference(spark):
    """The registered per-document rollup: n_bpe_tokens must equal the
    sum of reference-encoded word lengths over the doc's words."""
    import re

    docs = load(spark, SF_DIR, "documents")
    merges = bpe_merges(spark, word_freq(docs), N_MERGES)
    rows = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in QUERIES["x22_bpe_encode"](spark, SF_DIR).collect()
    }
    sample = docs.select("doc_id", "text").orderBy("doc_id").limit(25).collect()
    cache: dict[str, int] = {}
    for r in sample:
        words = [w for w in re.split(r"[^a-z0-9]+", r["text"].lower().strip()) if w]
        for w in words:
            if w not in cache:
                cache[w] = len(_reference_encode(w, merges))
        n_words, n_toks = rows[r["doc_id"]]
        assert n_words == len(words), r["doc_id"]
        assert n_toks == sum(cache[w] for w in words), r["doc_id"]
