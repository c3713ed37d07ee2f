"""Differential gate for the fast HTML tokenizer: its output must be
byte-identical to the html.parser ('exact') engine on every input — clean
markup takes the fast path, anything it can't replicate bit-for-bit falls
back to the exact path by construction."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.kernels.htmlmain import _fast_events, extract_main_content

CORNER_CASES = [
    "<3 x", "a < b", "</3>x", "</ div>x", "<!-- c -->x", "<!doctype html>x",
    "<?php ?>x", "<div a='1>2' b=\"3>4\">x</div>", "<br/>x", "<div/>x",
    "<script>if (a<b) {}</div></script>x", "<style>a>b{}</style>x",
    "a &amp; b &#65; &unknown; c", "<DIV CLASS=Y>x</DIV>", "<div",
    "<div class='a", "x</", "<!", "a<!>b", "<a href=x>y</a",
    "<script>never closed", "<div =>x", "<div a b >x", "<p>x<p>y", "< div>x",
    "</div foo>x", "</>x", "<a href=/x/>y", "<a href=/x />y",
    '<div a="x"b="y">z', "<![CDATA[ x ]]>y", "<!--->x", "<!-->x",
    "<scRiPt>a</ScRiPt>b", "<style>x</style  >y", "<script>a</script x>b",
    "<title>a<b</title>c", "<a<b>c", "x&y", "x& y", "<p>a&nbsp;b</p>",
]

_SOUP_TOKENS = [
    "<div>", "</div>", "<p>", "</p>", "<a href='x'>", "</a>", "text ",
    "&amp;", "<", "&", "<!--", "-->", "<script>", "</script>", "<br/>",
    "words and more words in a long enough sentence ", '<span q="a>b">',
    "</span>", "<!doctype x>", "]]>", "<![CDATA[", "?>", "<?pi ",
    "</ section>", "<h2>", "</h2>", "<nav>", "</nav>",
]


def _assert_equal(data: bytes):
    assert extract_main_content(data, engine="auto") == extract_main_content(
        data, engine="exact"
    )


class TestDifferential:
    @pytest.mark.parametrize("case", CORNER_CASES)
    def test_corner_cases(self, case):
        _assert_equal(case.encode())

    def test_corpus_html_uses_fast_path(self):
        import pyarrow.parquet as pq

        from pdf_parser_spark.corpus import ensure_corpus

        d = ensure_corpus(0.01)
        t = pq.read_table(f"{d}/pages.parquet", columns=["html"])
        n_fast = n = 0
        for h in t["html"].to_pylist():
            if h and not h.startswith(b"%PDF"):
                _assert_equal(h)
                n += 1
                if _fast_events(h.decode("utf-8", errors="replace")) is not None:
                    n_fast += 1
        assert n > 0 and n_fast == n  # realistic markup never falls back

    def test_random_tag_soup(self):
        rng = random.Random(11)
        for _ in range(500):
            s = "".join(
                rng.choice(_SOUP_TOKENS) for _ in range(rng.randrange(1, 40))
            )
            _assert_equal(s.encode())

    def test_random_bytes(self):
        rng = random.Random(13)
        for _ in range(300):
            _assert_equal(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300))))

    @settings(max_examples=80, deadline=None)
    @given(
        s=st.text(
            alphabet=st.sampled_from(list("<>/!&;#x- abpdiv'\"=?\n")),
            max_size=120,
        )
    )
    def test_hypothesis_markup_chars(self, s):
        _assert_equal(s.encode())

    def test_fast_engine_raises_on_bail(self):
        with pytest.raises(ValueError):
            extract_main_content(b"<!-- never closed", engine="fast")
