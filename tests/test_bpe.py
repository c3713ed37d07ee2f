"""BPE tokenizer: distributed counting + deterministic training + encoding.

Pure-Python training properties plus the Spark surfaces; the lossless
roundtrip (concat(tokens) == word + marker) is the core invariant."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.operators.bpe import (
    END, _encode_word, bpe_encode, bpe_token_counts, bpe_train,
    word_frequencies,
)


class TestTrain:
    def test_classic_example(self):
        # the canonical low/lower/newest/widest example (Sennrich et al.)
        freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = bpe_train(freqs, num_merges=10)
        assert merges[0] == ("e", "s")       # freq 9 beats everything
        assert merges[1] == ("es", "t")      # es+t also 9
        assert ("l", "o") in merges          # low family merges too

    def test_deterministic(self):
        freqs = [("abab", 3), ("abba", 3), ("baba", 2)]
        assert bpe_train(freqs, 20) == bpe_train(freqs, 20)

    def test_tie_breaks_lexicographic(self):
        # 'ab' and 'cd' both appear twice; ('a','b') < ('c','d')
        merges = bpe_train([("ab", 2), ("cd", 2)], num_merges=1)
        assert merges[0] == ("a", "b")

    def test_stops_below_freq_two(self):
        merges = bpe_train([("xyz", 1)], num_merges=50)
        assert merges == []  # nothing repeats; no merge is worth learning


class TestEncode:
    def test_trained_words_collapse(self):
        freqs = [("newest", 6), ("widest", 3)]
        merges = bpe_train(freqs, num_merges=50)
        ranks = {p: i for i, p in enumerate(merges)}
        assert _encode_word("newest", ranks) == ["newest" + END]

    def test_unseen_word_falls_back_to_chars_plus_learned(self):
        merges = bpe_train([("low", 5)], num_merges=50)
        ranks = {p: i for i, p in enumerate(merges)}
        toks = _encode_word("lowest", ranks)
        assert toks[0].startswith("low")  # learned prefix reused

    @settings(max_examples=50, deadline=None)
    @given(word=st.text(alphabet="abcde", min_size=1, max_size=12))
    def test_roundtrip_lossless(self, word):
        merges = bpe_train([("abc", 5), ("cde", 4), ("ab", 3)], 20)
        ranks = {p: i for i, p in enumerate(merges)}
        assert "".join(_encode_word(word, ranks)) == word + END


class TestSparkSurfaces:
    def test_word_frequencies_deterministic_topk(self, spark):
        df = spark.createDataFrame(
            [(0, "b b a a"), (1, "a c C c")], "doc_id bigint, text string"
        )
        wf = word_frequencies(df, top_k=3)
        assert wf == [("a", 3), ("c", 3), ("b", 2)]  # ties break on word

    def test_end_to_end_counts(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        merges = bpe_train(word_frequencies(docs, top_k=2000), num_merges=100)
        assert len(merges) == 100
        enc = {r.doc_id: r.tokens for r in bpe_encode(docs.limit(5), merges).collect()}
        counts = {
            r.doc_id: r.n_bpe_tokens
            for r in bpe_token_counts(docs.limit(5), merges).collect()
        }
        for doc_id, toks in enc.items():
            assert counts[doc_id] == len(toks) > 0
            # lossless: tokens re-concatenate to the normalized words
            row = docs.where(f"doc_id = {doc_id}").collect()[0]
            rebuilt = "".join(toks).replace(END, " ").strip()
            assert rebuilt == " ".join(row.text.lower().split())

    def test_more_merges_fewer_tokens(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        wf = word_frequencies(docs, top_k=2000)
        few = bpe_train(wf, num_merges=10)
        many = bpe_train(wf, num_merges=300)
        n_few = sum(
            r.n_bpe_tokens for r in bpe_token_counts(docs, few).collect()
        )
        n_many = sum(
            r.n_bpe_tokens for r in bpe_token_counts(docs, many).collect()
        )
        assert n_many < n_few  # a bigger vocab always compresses harder


class TestFrozenBPE:
    def test_frozen_matches_fresh_training_at_sf001(self, spark):
        from pdf_parser_spark.operators.bpe import bpe_train, word_frequencies
        from pdf_parser_spark.operators.models import load_frozen_bpe

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        fresh = bpe_train(word_frequencies(docs, top_k=5000), num_merges=200)
        assert load_frozen_bpe() == fresh
