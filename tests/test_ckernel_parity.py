"""Parity gate for the compiled kernel (_ckernel.c).

The C extension must be byte-identical to the pure-Python kernel — which
is the executable spec — on titles, block streams (all counters, offsets,
tag levels, labels), ld+json capture, time attributes, and rendered
content. Runs the golden corpus through BOTH paths plus targeted quirk
inputs and a seeded tag-soup fuzz differential.

The 12k-doc corpus differential runs in scripts/ckernel_corpus_diff.py
(invoked by bench verification), not here.
"""

import random

import pytest

from go_boilerpipe_spark.kernel import ckernel
from go_boilerpipe_spark.kernel.document import (
    _finish_document,
    article_pipeline,
    parse_to_handler,
)
from go_boilerpipe_spark.kernel.rfc3339 import parse_rfc3339

ck = ckernel.load()

pytestmark = pytest.mark.skipif(
    ck is None, reason="compiled kernel unavailable (no gcc?)"
)


def pure_state(html):
    h = parse_to_handler(html)
    h.flush_block()
    blocks = [
        (tb.text, tb.num_words, tb.num_linked_words,
         tb.num_words_in_wrapped_lines, tb.num_wrapped_lines,
         tb.offset_blocks_start, tb.offset_blocks_end, tb.tag_level,
         tuple(sorted(tb.label_map.items())))
        for tb in h.text_blocks
    ]
    return h.title, blocks, list(h.ld_json), h.time


def c_state(html):
    title, blocks, ld_json, dts, filtered = ck.parse(html)
    assert filtered is False
    out = []
    for (text, nw, nlw, nwiwl, nwl, o1, o2, tl, is_content,
         label_pairs) in blocks:
        assert is_content is False  # raw parse: nothing classified yet
        out.append((text, nw, nlw, nwiwl, nwl, o1, o2, tl,
                    tuple(sorted(label_pairs))))
    t = None
    for v in dts:
        r = parse_rfc3339(v)
        if r is not None:
            t = r
    return title, out, list(ld_json), t


def assert_same(html, note=""):
    pt, pb, pl, ptime = pure_state(html)
    ct, cb, cl, ctime = c_state(html)
    assert pt == ct, (note, "title", pt, ct)
    assert pl == cl, (note, "ldjson", pl, cl)
    assert ptime == ctime, (note, "time", ptime, ctime)
    assert len(pb) == len(cb), (note, "nblocks", len(pb), len(cb))
    for k, (a, b) in enumerate(zip(pb, cb)):
        assert a == b, (note, "block", k, a, b)


def test_goldens_identical_block_streams():
    for i in range(7):
        html = open(f"/root/reference/testdata/{i}.html", "rb").read()
        assert_same(html.decode("utf-8", "surrogateescape"), f"golden {i}")


def test_goldens_bytewise_content_through_c():
    # the normative gate run through the C path explicitly
    from go_boilerpipe_spark.kernel.document import _CK, extract_article

    assert _CK is not None, "C kernel must be active in this test run"
    for i in range(7):
        html = open(f"/root/reference/testdata/{i}.html", "rb").read()
        doc = extract_article(html)
        exp = open(f"tests/fixtures/golden/{i}.content.txt", "rb").read()
        assert doc.content().encode() == exp, f"golden {i} byte diff"


def test_filter_blocks_equals_override_reparse():
    # VERDICT r3 item 4: the filters-only re-entry (filter_blocks on the
    # first call's raw blocks) must equal the old override re-parse path
    # block-for-block — including on ld+json documents where the merged
    # headline overrides the title F2 matches against.
    import json

    from go_boilerpipe_spark.kernel.document import extract_article
    from go_boilerpipe_spark.kernel.ldjson import (
        LinkedDataArticle,
        merge_linked_data,
    )

    ld = json.dumps({"@type": "Article", "headline": "The Real Headline"})
    body = "<p>" + " ".join(f"word{i} plain" for i in range(40)) + "</p>"
    docs = [
        "<html><head><title>Page | The Real Headline</title>"
        f'<script type="application/ld+json">{ld}</script></head>'
        f"<body><h1>The Real Headline</h1>{body}"
        f"<div><a href=x>nav nav nav</a></div></body></html>",
        # ld+json present but unparsable → headline stays the <title>
        '<html><head><title>T</title><script type="application/ld+json">'
        f"not json</script></head><body>{body}</body></html>",
        # no ld+json: single-call fast path (filtered=True)
        f"<html><head><title>T</title></head><body>{body}</body></html>",
    ]
    for i, html in enumerate(docs):
        title, blocks, ld_json, dts, filtered = ck.extract(html)
        if filtered:
            continue
        art = LinkedDataArticle()
        for s in ld_json:
            if merge_linked_data(art, s) and art.type == "Article":
                break
        ft = art.headline if art.headline else title
        old = ck.extract(html, ft)
        assert old[4] is True
        new_blocks = ck.filter_blocks(blocks, ft)
        assert new_blocks == old[1], f"doc {i} block diff"
        # and the public API end-to-end still extracts
        doc = extract_article(html)
        assert doc.content() is not None


QUIRKS = [
    # raw-text elements & escape states
    "<script>var a='</notscript>'</script><p>after script text here</p>",
    "<script><!-- if (a<b) { x='</script>'; } --></script><p>t</p>",
    "<script><!--<script>nested</script>--></script><p>t</p>",
    "<style>p:before{content:'</p>'}</style><p>visible words</p>",
    "<title>Page &amp; Title</title><body><p>body text words</p></body>",
    "<textarea>words &lt;b&gt; not tags</textarea>",
    "<iframe><p>hidden</p></iframe><p>shown</p>",
    "<xmp><p>raw</p></xmp><p>after</p>",
    "<plaintext><p>everything raw to eof",
    "<noscript>alt words</noscript><p>main</p>",
    # malformed markup recovery
    "<p>a </ b> c</p>",
    "<p>a <!-- comment --> b</p>",
    "<p>a <!--> b</p>",
    "<p>a <!---> b</p>",
    "<p>a <!----> b</p>",
    "<p>a <!doctype html> b</p>",
    "<p>a <? processing ?> b</p>",
    "<p>a </> b</p>",
    "<p>a < b</p>",
    "<p>a <3 b</p>",
    "<p>unclosed at eof",
    "<p>tag at eof <",
    "<p>end at eof </",
    "<p>truncated </p",
    "<p>truncated <di",
    "<div><p>mismatched</div></p>",
    "<foo><bar>unknown tags</bar></foo>",
    "<unknownone>text</unknowntwo>",
    # self-closing & should-be-self-closing
    "<p>a<br/>b</p>",
    "<p>a<br>b</p>",
    "<img src=x><p>words</p>",
    "<p>a<a href=x/>link</a>b</p>",
    # attributes
    "<time datetime=\"2019-03-30T08:04:00+08:00\">x</time>",
    "<time datetime='2019-03-30T08:04:00Z' datetime='2020-01-01T00:00:00Z'>x</time>",
    "<time datetime=bogus>x</time><time datetime=2021-05-06T01:02:03Z>y</time>",
    "<time =datetime=2019-01-01T00:00:00Z>x</time>",
    "<p class=\"a>b\">quoted gt</p>",
    "<p a b c>bare attrs</p>",
    "<p a=1 b = 2 c= '3'>spaced</p>",
    "<p a=>empty</p>",
    "<p =weird>leading eq</p>",
    "<p a=\"unterminated>words words",
    "<script type=\"application/ld+json\">{\"@type\":\"Article\",\"headline\":\"H\",\"articleBody\":\"B\"}</script><p>t</p>",
    "<script type=\"application/ld&#43;json\">{\"@type\":\"Article\",\"headline\":\"H2\"}</script><p>t</p>",
    "<script type=\"application/json\">{\"x\":1}</script><p>t</p>",
    # entities in text
    "<p>&lt;tag&gt; &amp; &notin; &notit; &#x48;i &#4294967361;</p>",
    "<p>&#x; &#1x &# &#</p>",
    "<p>fish &amp chips &ampere</p>",
    # tokenize edges through blocks
    "<body><p>a⁣.b and words</p></body>",
    "<body><p>don't stop (parens) and/or $5.99!</p></body>",
    "<body><p>中文 words 混合 text</p></body>",
    "<body><p>a&nbsp;b</p></body>",
    "<body><p>" + "word " * 60 + "</p></body>",
    # anchors / labels / title
    "<body><h1>Head</h1><p>some words <a href=x>linked words here</a> more</p></body>",
    "<body><ul><li>item one words</li><li>item two words</li></ul></body>",
    "<title>T</title><body><h2>H2</h2><h3>H3</h3><p>text</p></body>",
    "<title> spaced title </title><body><p>x</p></body>",
    "<title></title><body><p>x</p></body>",
    "<body><a>outer <a>inner</a> tail</a></body>",
    # whitespace shapes
    "<body><p>  leading</p><p>trailing  </p><p> 　</p></body>",
    "<body><p>a\r\nb\rc\nd</p></body>",
    "<body><p>\x00nul</p><script>a\x00b</script></body>",
    # invalid utf-8 surrogates (surrogateescape decode artifacts)
    "<body><p>bad \udc80\udcff bytes</p></body>",
    "<body narrow><p>words</p></body>",
]


def test_quirk_inputs_identical():
    for q in QUIRKS:
        assert_same(q, q[:48])


def test_fuzz_tag_soup_identical():
    rng = random.Random(20260816)
    pieces = [
        "<p>", "</p>", "<div>", "</div>", "<a href=x>", "</a>", "<br>",
        "<br/>", "<img>", "<script>", "</script>", "<style>", "</style>",
        "<title>", "</title>", "<li>", "</li>", "<h1>", "</h1>", "<body>",
        "</body>", "<!--", "-->", "<!", ">", "<", "</", "словo", "word",
        "words here", "&amp;", "&lt", "&#65;", "&#x;", " ", "\n", "\t",
        " ", "⁣", ".", ",", "'", '"', "=", "/", "中文", "a<b",
        "<time datetime=2020-01-01T00:00:00Z>", "</time>", "<foo bar=baz>",
        "</foo>", "x" * 90, "\udc80", "\x00", "<xmp>", "</xmp>",
        "<textarea>", "</textarea>", "<iframe>", "</iframe>", "<!doctype>",
        "<?php ?>", "<option>", "</option>", "<noscript>", "</noscript>",
    ]
    for t in range(800):
        s = "".join(
            rng.choice(pieces) for _ in range(rng.randint(0, 25))
        )
        assert_same(s, f"fuzz {t}: {s[:60]!r}")


def _pure_extract(html):
    h = parse_to_handler(html)
    h.flush_block()
    d = _finish_document(h.title, h.text_blocks, h.ld_json, h.time)
    article_pipeline(d)
    return d


def _doc_fingerprint(d):
    return (
        d.title, d.date, d.content(),
        [(tb.text, tb.is_content, tuple(sorted(tb.label_map.items())),
          tb.num_words, tb.num_linked_words, tb.tag_level,
          tb.offset_blocks_start, tb.offset_blocks_end)
         for tb in d.text_blocks],
    )


def test_full_pipeline_content_identical():
    # the C extract() path (parse + 12 filters in C for no-ld+json docs,
    # Python pipeline otherwise) must match the pure pipeline exactly —
    # content bytes, titles, dates, per-block flags and labels
    from go_boilerpipe_spark.kernel.document import extract_article

    docs = [open(f"/root/reference/testdata/{i}.html", "rb").read().decode(
        "utf-8", "surrogateescape") for i in range(7)]
    for html in docs + QUIRKS:
        d_c = extract_article(html)
        d_p = _pure_extract(html)
        assert _doc_fingerprint(d_c) == _doc_fingerprint(d_p), html[:60]


TITLE_QUIRKS = [
    # F2 exercises: separators, .com parts, removals, NBSP, apostrophes,
    # uppercase non-ascii (simple-vs-full lowercase parity), backspaces
    "<title>Real Title | Site Name</title><body><p>real title</p><p>%s</p></body>" % ("word " * 30),
    "<title>One - Two - Three</title><body><p>one</p><p>%s</p></body>" % ("word " * 30),
    "<title>example.com | The Story</title><body><p>the story</p><p>%s</p></body>" % ("word " * 30),
    "<title>НОВОСТИ СЕГОДНЯ</title><body><p>новости сегодня</p><p>%s</p></body>" % ("word " * 30),
    "<title>ΕΛΛΑΣ NEWS</title><body><p>ελλασ news</p><p>%s</p></body>" % ("word " * 30),
    "<title>İSTANBUL HABER</title><body><p>istanbul haber</p><p>%s</p></body>" % ("word " * 30),
    "<title>What?! A Title.</title><body><p>what a title</p><p>%s</p></body>" % ("word " * 30),
    "<title>Tale - of - many - dashes</title><body><p>tale</p><p>%s</p></body>" % ("word " * 30),
    "<title>NBSP Title</title><body><p>nbsp title</p><p>%s</p></body>" % ("word " * 30),
    "<title>Don't Stop</title><body><p>dont stop</p><p>%s</p></body>" % ("word " * 30),
    "<title>abcd spaced words</title><body><p>abcd</p><p>%s</p></body>" % ("word " * 30),
    "<title>x » y » z</title><body><p>y</p><p>%s</p></body>" % ("word " * 30),
    # F1 exercises
    "<body><p>%s</p><p>Comments</p><p>42 comments</p><p>Post a comment</p></body>" % ("word " * 30),
    "<body><p>%s</p><p>© Reuters All Rights</p><p>RÄTTA ARTIKELN här</p></body>" % ("word " * 30),
    "<body><p>%s</p><a href=x>Comment</a></body>" % ("word " * 30),
    "<body><p>%s</p><p>Thanks for your comments - this feedback is now closed</p></body>" % ("word " * 30),
    # ld+json override path: the merged headline replaces what F2
    # matches; these take the second C call with the title override
    '<script type="application/ld+json">{"@type":"Article","headline":"Merged Headline"}</script>'
    "<title>Original Title</title><body><p>merged headline</p><p>%s</p></body>" % ("word " * 30),
    '<script type="application/ld+json">{"@type":"Article","headline":""}</script>'
    "<title>Fallback Title</title><body><p>fallback title</p><p>%s</p></body>" % ("word " * 30),
    '<script type="application/ld+json">{broken json</script>'
    "<title>Broken LD</title><body><p>broken ld</p><p>%s</p></body>" % ("word " * 30),
    '<script type="application/ld+json">{"@type":"NewsArticle","headline":"News H"}</script>'
    "<body><p>news h</p><p>%s</p></body>" % ("word " * 30),
    # F12 list-at-end / F11 same-level
    "<body><div><p>%s</p></div><ul><li>item one two three</li></ul></body>" % ("word " * 200),
    "<body><p>%s</p><div><p>%s</p></div></body>" % ("word " * 200, "word " * 120),
]


def test_filter_chain_quirks_identical():
    from go_boilerpipe_spark.kernel.document import extract_article

    for html in TITLE_QUIRKS:
        d_c = extract_article(html)
        d_p = _pure_extract(html)
        assert _doc_fingerprint(d_c) == _doc_fingerprint(d_p), html[:70]


def test_fuzz_full_pipeline_identical():
    from tests.adversarial_inputs import full_pipeline_fuzz_cases

    from go_boilerpipe_spark.kernel.document import extract_article

    # same generator + seed the ASan build executes (VERDICT r3 item 8)
    for html in full_pipeline_fuzz_cases(400):
        d_c = extract_article(html)
        d_p = _pure_extract(html)
        assert _doc_fingerprint(d_c) == _doc_fingerprint(d_p), html[:80]


def _adversarial_params():
    from tests.adversarial_inputs import adversarial_classes

    return [
        pytest.param(case, id=f"{name}-{i}")
        for name, cases in adversarial_classes().items()
        for i, case in enumerate(cases)
    ]


def _pure_content_tuple(html):
    d = _pure_extract(html)
    return (d.title, d.author, d.date, d.content(), len(d.text_blocks),
            sum(1 for tb in d.text_blocks if tb.is_content))


def test_extract_content_identical():
    # the Spark hot-path entry (C-side Content() rendering, no TextBlock
    # materialization) must equal extract_article + .content() on every
    # golden, quirk, title-quirk (incl. ld+json override), fuzz, and
    # adversarial case
    from tests.adversarial_inputs import (
        adversarial_classes,
        full_pipeline_fuzz_cases,
    )

    from go_boilerpipe_spark.kernel.document import extract_content

    docs = [open(f"/root/reference/testdata/{i}.html", "rb").read().decode(
        "utf-8", "surrogateescape") for i in range(7)]
    cases = docs + QUIRKS + TITLE_QUIRKS + full_pipeline_fuzz_cases(400)
    for cls in adversarial_classes().values():
        cases.extend(cls)
    for html in cases:
        assert extract_content(html) == _pure_content_tuple(html), html[:80]


@pytest.mark.parametrize("html", _adversarial_params())
def test_adversarial_classes_identical(html):
    # VERDICT r3 item 8: attribute bombs, deep nesting, long
    # entities/tokens, lone-surrogate-dense documents - parse parity AND
    # full-pipeline fingerprint parity through both kernels
    from go_boilerpipe_spark.kernel.document import extract_article

    assert_same(html, html[:48])
    d_c = extract_article(html)
    d_p = _pure_extract(html)
    assert _doc_fingerprint(d_c) == _doc_fingerprint(d_p), html[:80]


def test_extract_from_zip_rejects_planted_so(monkeypatch, tmp_path):
    """ADVICE r3 (medium): a pre-existing .so at the predictable shared-tmp
    path must never be dlopened unless its content re-hashes to the digest
    of the zip's own bytes — a planted file is atomically replaced."""
    import hashlib
    import os
    import sys

    data = b"genuine so bytes from the --py-files zip"

    class FakeZipLoader:
        def get_data(self, path):
            return data

    pkg = sys.modules["go_boilerpipe_spark.kernel"]
    monkeypatch.setattr(pkg, "__loader__", FakeZipLoader(), raising=False)
    loaded = {}
    monkeypatch.setattr(
        ckernel, "_load_from_path", lambda p: loaded.setdefault("path", p)
    )
    monkeypatch.setattr(
        ckernel.tempfile, "gettempdir", lambda: str(tmp_path)
    )

    digest = hashlib.sha256(data).hexdigest()
    d = tmp_path / f"gbs_ckernel_u{os.getuid()}_{digest[:16]}"
    d.mkdir(mode=0o700)
    so = d / ckernel._SO_NAME
    so.write_bytes(b"EVIL PLANTED LIBRARY")

    assert ckernel._extract_from_zip() is not None
    assert so.read_bytes() == data          # planted content replaced
    assert loaded["path"] == str(so)

    # a matching pre-extracted file is reused as-is (no rewrite)
    before = so.stat().st_mtime_ns
    assert ckernel._extract_from_zip() is not None
    assert so.stat().st_mtime_ns == before
    assert (d.stat().st_mode & 0o777) == 0o700
