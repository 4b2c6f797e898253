"""Metamorphic invariants: HTML mutations the reference provably ignores
must not change extraction output (extends confidence beyond the 7
goldens — each invariant is pinned to reference behavior)."""

import pytest

from go_boilerpipe_spark.kernel import extract_article
from go_boilerpipe_spark.sources.pages import golden_rows

ROWS = golden_rows()
IDS = [f"doc{i}" for i in range(len(ROWS))]


def out(html):
    d = extract_article(html)
    return (d.title, d.content())


@pytest.mark.parametrize("row", ROWS, ids=IDS)
def test_comments_between_tags_ignored(row):
    # CommentToken: do nothing (boilerpipe.go:151-152)
    html = row[1].decode("utf-8")
    mutated = html.replace("<p", "<!-- x --><p").replace(
        "</div>", "</div><!-- y -->"
    )
    assert out(mutated) == out(html)


@pytest.mark.parametrize("row", ROWS, ids=IDS)
def test_doctype_removal_ignored(row):
    html = row[1].decode("utf-8")
    low = html.lower()
    if "<!doctype" not in low:
        pytest.skip("no doctype")
    i = low.index("<!doctype")
    j = html.index(">", i)
    assert out(html[:i] + html[j + 1 :]) == out(html)


@pytest.mark.parametrize("row", ROWS, ids=IDS)
def test_attributes_on_inline_nows_tags_ignored(row):
    # tagActionInlineNoWhitespace reads nothing from attrs
    html = row[1].decode("utf-8")
    mutated = html.replace("<b>", '<b data-x="1">').replace(
        "<i>", '<i data-x="2">'
    )
    assert out(mutated) == out(html)


@pytest.mark.parametrize("row", ROWS, ids=IDS)
def test_crlf_normalization(row):
    # convertNewlines: \r\n and \r → \n before any processing
    html = row[1].decode("utf-8")
    if "\r" in html:
        pytest.skip("source already has CR")
    assert out(html.replace("\n", "\r\n")) == out(html)


@pytest.mark.parametrize("row", ROWS, ids=IDS)
def test_self_closing_void_spelling(row):
    # "<br>" (start tag on the skip list) and "<br/>" (SelfClosingTagToken)
    # are both no-ops for the handler
    html = row[1].decode("utf-8")
    if "<br>" not in html:
        pytest.skip("no <br>")
    assert out(html.replace("<br>", "<br/>")) == out(html)
