"""Property-based robustness tests: the kernel must never raise and must be
deterministic on arbitrary crawl bytes (scale invariant #4, SURVEY.md §5.2)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from go_boilerpipe_spark.kernel import extract_article
from go_boilerpipe_spark.kernel.htmltok import Tokenizer

TAGS = ["p", "div", "a", "script", "style", "title", "body", "li", "h1",
        "span", "iframe", "time", "br", "foo-custom"]


@st.composite
def html_soup(draw):
    parts = []
    for _ in range(draw(st.integers(0, 25))):
        kind = draw(st.integers(0, 5))
        if kind == 0:
            parts.append(draw(st.text(max_size=40)))
        elif kind == 1:
            parts.append(f"<{draw(st.sampled_from(TAGS))}>")
        elif kind == 2:
            parts.append(f"</{draw(st.sampled_from(TAGS))}>")
        elif kind == 3:
            parts.append("<!-- " + draw(st.text(max_size=10)) + " -->")
        elif kind == 4:
            parts.append("&" + draw(st.text(st.characters(min_codepoint=97, max_codepoint=122), max_size=6)) + ";")
        else:
            parts.append(draw(st.sampled_from(["<![CDATA[x]]>", "<!doctype html>", "<?php ?>", "</>", "<", ">", "<a href='x y"])))
    return "".join(parts)


@given(html_soup())
@settings(max_examples=150, deadline=None)
def test_extract_never_raises_and_is_deterministic(s):
    d1 = extract_article(s)
    d2 = extract_article(s)
    assert d1.content() == d2.content()
    assert d1.title == d2.title


@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_arbitrary_bytes(b):
    doc = extract_article(b)
    assert isinstance(doc.content(), str)


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_tokenizer_terminates_and_covers_input(s):
    z = Tokenizer(s)
    steps = 0
    while True:
        tt, _, _ = z.next()
        steps += 1
        assert steps <= 2 * len(s) + 10, "tokenizer not making progress"
        if tt == 0:
            break
