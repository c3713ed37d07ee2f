"""HTML main-content stripper tests (north-rule addition; goldens frozen here)."""

from pdf_parser_spark.kernels.htmlmain import extract_main_content, html_to_text

PAGE = b"""<!DOCTYPE html><html><head>
<title>t</title><style>p{color:red}</style><script>var x=1;</script></head>
<body>
<header><a href="/">Home</a> <a href="/about">About</a></header>
<nav><ul><li><a href="/a">AAA</a></li><li><a href="/b">BBB</a></li></ul></nav>
<article>
<h1>Headline</h1>
<p>This is the first real paragraph of the article with plenty of text.</p>
<p>Second paragraph, also long enough to count as content for sure.</p>
</article>
<aside><a href="/r1">related one</a> <a href="/r2">related two</a></aside>
<footer><a href="/terms">Terms</a> &copy; Example Corp</footer>
</body></html>"""


class TestStripping:
    def test_main_text(self):
        text = html_to_text(PAGE)
        assert text == (
            "Headline\n"
            "This is the first real paragraph of the article with plenty of text.\n"
            "Second paragraph, also long enough to count as content for sure."
        )

    def test_boilerplate_gone(self):
        text = html_to_text(PAGE)
        for noise in ["Home", "About", "AAA", "related one", "Terms", "var x=1", "color:red"]:
            assert noise not in text

    def test_spans_cover_text(self):
        text, spans = extract_main_content(PAGE)
        assert [s[0] for s in spans] == ["h1", "p", "p"]
        for tag, start, end in spans:
            assert "\n" not in text[start:end]
        # spans tile the output exactly (blocks joined by \n)
        rebuilt = "\n".join(text[s:e] for _, s, e in spans)
        assert rebuilt == text

    def test_link_density_kills_nav_blocks(self):
        page = (
            b"<html><body><div>"
            b'<a href="/1">navigation link one</a> <a href="/2">navigation link two</a>'
            b"</div><p>Real content paragraph that is long enough to be kept here.</p>"
            b"</body></html>"
        )
        assert html_to_text(page) == (
            "Real content paragraph that is long enough to be kept here."
        )

    def test_short_blocks_dropped(self):
        page = b"<html><body><p>tiny</p><p>A full-length paragraph with enough characters.</p></body></html>"
        assert html_to_text(page) == "A full-length paragraph with enough characters."

    def test_heading_kept_next_to_content(self):
        page = b"<html><body><h2>Short Head</h2><p>Long enough content paragraph right after the heading.</p></body></html>"
        assert html_to_text(page).startswith("Short Head\n")

    def test_lone_heading_dropped(self):
        page = b"<html><body><h2>Orphan</h2><div><a href='/'>x</a></div></body></html>"
        assert html_to_text(page) == ""


class TestRobustness:
    def test_malformed_html_no_crash(self):
        page = b"<html><body><p>Unclosed paragraph with plenty of text to keep it<div></html>"
        assert "Unclosed paragraph" in html_to_text(page)

    def test_non_utf8_bytes(self):
        page = b"<html><body><p>caf\xe9 content paragraph long enough to keep here</p></body></html>"
        out = html_to_text(page)
        assert "content paragraph" in out

    def test_whitespace_normalized(self):
        page = b"<html><body><p>spaced   out\n\n   words   making a long enough paragraph</p></body></html>"
        assert html_to_text(page) == "spaced out words making a long enough paragraph"

    def test_entities_decoded(self):
        page = b"<html><body><p>Fish &amp; chips &mdash; a long enough paragraph to keep</p></body></html>"
        assert html_to_text(page) == "Fish & chips — a long enough paragraph to keep"

    def test_deterministic(self):
        assert html_to_text(PAGE) == html_to_text(PAGE)
