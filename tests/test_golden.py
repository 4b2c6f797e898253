"""Golden-corpus byte-parity gate (the must-pass of SURVEY.md §5).

Replicates the reference's ExampleParseDocument
(/root/reference/filter_test.go:15-112): for each of the 7 testdata HTML
files, the extracted title, the formatted date (URL date preferred over the
document date), the normalized URL and the content bytes must match the
expected output embedded in the reference test — byte-for-byte.

Fixtures were decoded from the base64 blocks of filter_test.go:78-110 by
scripts/; integrity anchors (sha256) are listed in FIXTURES.md §2.
"""

import hashlib
import json
import pathlib

import pytest

from go_boilerpipe_spark import normurl
from go_boilerpipe_spark.kernel import extract_article

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "golden"
META = json.loads((FIXTURES / "meta.json").read_text())
REF_TESTDATA = pathlib.Path("/root/reference/testdata")

_MONTH_NAMES = (
    "January February March April May June July August September "
    "October November December"
).split()


def _go_format_date(d) -> str:
    """Go layout "January 2, 2006"."""
    return f"{_MONTH_NAMES[d.month - 1]} {d.day}, {d.year}"


@pytest.fixture(scope="module")
def docs():
    out = {}
    for m in META:
        html = (REF_TESTDATA / f"{m['doc']}.html").read_bytes()
        out[m["doc"]] = extract_article(html)
    return out


@pytest.mark.parametrize("m", META, ids=[str(m["doc"]) for m in META])
def test_fixture_integrity(m):
    content = (FIXTURES / f"{m['doc']}.content.txt").read_bytes()
    assert hashlib.sha256(content).hexdigest() == m["content_sha256"]
    assert len(content) == m["content_bytes"]


@pytest.mark.parametrize("m", META, ids=[str(m["doc"]) for m in META])
def test_golden_content_byte_identical(docs, m):
    expected = (FIXTURES / f"{m['doc']}.content.txt").read_bytes()
    actual = docs[m["doc"]].content().encode("utf-8")
    assert actual == expected


@pytest.mark.parametrize("m", META, ids=[str(m["doc"]) for m in META])
def test_golden_title(docs, m):
    assert docs[m["doc"]].title == m["title"]


@pytest.mark.parametrize("m", META, ids=[str(m["doc"]) for m in META])
def test_golden_normalized_url(docs, m):
    assert str(normurl.parse(m["rawurl"])) == m["norm_url"]


@pytest.mark.parametrize("m", META, ids=[str(m["doc"]) for m in META])
def test_golden_date(docs, m):
    # filter_test.go:56-67: URL date wins; only printed when non-zero
    u = normurl.parse(m["rawurl"])
    d = u.date()
    if d is None:
        d = docs[m["doc"]].date
    actual = _go_format_date(d) if d is not None else None
    assert actual == m["date"]
