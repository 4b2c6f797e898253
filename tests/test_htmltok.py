"""Tokenizer state-machine tests: the x/net/html behaviors the goldens
depend on, pinned individually (kernel/htmltok.py)."""

from go_boilerpipe_spark.kernel.htmltok import (
    COMMENT,
    END_TAG,
    SELF_CLOSING,
    START_TAG,
    TEXT,
    Tokenizer,
    tokens,
)


def toks(s):
    return list(tokens(s))


class TestText:
    def test_entity_unescape_in_text(self):
        assert toks("a &amp; b") == [(TEXT, "a & b", None)]

    def test_legacy_entity_no_semicolon(self):
        assert toks("a &ampx") == [(TEXT, "a &x", None)]

    def test_newline_conversion(self):
        assert toks("a\r\nb\rc") == [(TEXT, "a\nb\nc", None)]

    def test_lone_lt_is_text(self):
        assert toks("a < b") == [(TEXT, "a < b", None)]

    def test_lt_at_eof_is_text(self):
        assert toks("ab<") == [(TEXT, "ab<", None)]


class TestTags:
    def test_attrs_quoted_unquoted_bare(self):
        (tt, name, attrs), = toks("<a href='x' CLASS=y disabled>")
        assert (tt, name) == (START_TAG, "a")
        assert attrs == [("href", "x"), ("class", "y"), ("disabled", "")]

    def test_self_closing_source_byte(self):
        assert toks("<br/>")[0][0] == SELF_CLOSING
        assert toks("<br >")[0][0] == START_TAG
        # unquoted value ending in '/' right before '>' counts (Go quirk)
        assert toks("<a href=/>")[0][0] == SELF_CLOSING

    def test_end_tag_attrs_discarded(self):
        assert toks("</div class='x'>") == [(END_TAG, "div", None)]

    def test_empty_end_tag_is_comment(self):
        assert toks("</>") == [(COMMENT, "", None)]

    def test_bogus_end_tag_until_angle(self):
        assert toks("</ div>x") == [(COMMENT, "", None), (TEXT, "x", None)]

    def test_quoted_gt_inside_attr(self):
        (tt, name, attrs), = toks('<a href="a>b">')
        assert attrs == [("href", "a>b")]

    def test_attr_value_entities(self):
        (_, _, attrs), = toks('<a href="x&amp;y">')
        assert attrs == [("href", "x&y")]


class TestComments:
    def test_basic(self):
        assert toks("<!-- c -->x") == [(COMMENT, "", None), (TEXT, "x", None)]

    def test_bang_close(self):
        assert toks("<!-- c --!>x")[-1] == (TEXT, "x", None)

    def test_immediate_close(self):
        assert toks("<!-->x") == [(COMMENT, "", None), (TEXT, "x", None)]

    def test_doctype_and_pi(self):
        assert toks("<!DOCTYPE html>x")[-1] == (TEXT, "x", None)
        assert toks("<?php ?>x") == [(COMMENT, "", None), (TEXT, "x", None)]

    def test_cdata_is_bogus_comment_to_first_gt(self):
        # no foreign content: "<![CDATA[" is a bogus comment ending at the
        # FIRST '>', so the tail leaks out as text
        out = toks("<![CDATA[a > b]]>x")
        assert out[0] == (COMMENT, "", None)
        assert out[1] == (TEXT, " b]]>x", None)


class TestRawText:
    def test_script_raw_no_unescape(self):
        out = toks("<script>a &amp; <b></script>")
        assert out[1] == (TEXT, "a &amp; <b>", None)

    def test_title_rcdata_unescapes_and_keeps_tags(self):
        out = toks("<title>a &amp; <b></title>")
        assert out[1] == (TEXT, "a & <b>", None)

    def test_iframe_raw(self):
        out = toks("<iframe><p>inner</p></iframe>after")
        assert out[1] == (TEXT, "<p>inner</p>", None)
        assert out[2] == (END_TAG, "iframe", None)

    def test_script_escaped_state_hides_end_tag_in_double_escape(self):
        # inside <!-- ... <script ... -->, a </script> belongs to the text
        src = "<script><!--<script></script>--></script>x"
        out = toks(src)
        assert out[1] == (TEXT, "<!--<script></script>-->", None)
        assert out[2] == (END_TAG, "script", None)
        assert out[3] == (TEXT, "x", None)

    def test_script_escaped_end_tag_closes(self):
        # in (single) escaped state the real end tag still closes
        src = "<script><!-- x </script>after"
        out = toks(src)
        assert out[1] == (TEXT, "<!-- x ", None)
        assert out[2] == (END_TAG, "script", None)

    def test_script_string_with_lt_slash(self):
        src = "<script>var x = '</scr' + 'ipt>';</script>ok"
        out = toks(src)
        assert out[1][1] == "var x = '</scr' + 'ipt>';"

    def test_raw_end_tag_needs_terminator(self):
        out = toks("<style>a</styleX</style>b")
        assert out[1] == (TEXT, "a</styleX", None)

    def test_unterminated_raw_to_eof(self):
        out = toks("<script>never ends")
        assert out[1] == (TEXT, "never ends", None)

    def test_self_closing_script_still_sets_rawtag(self):
        # x/net/html sets rawTag in readStartTag before the self-closing
        # check, so content after <script/> is raw until </script>
        out = toks("<script/>a<b></script>c")
        assert out[0][0] == SELF_CLOSING
        assert out[1] == (TEXT, "a<b>", None)


class TestMalformed:
    def test_should_be_self_closing_skip_list_unaffected_here(self):
        # tokenizer still emits the start tag; the parse loop skips it
        assert toks("<img src=x>")[0][0] == START_TAG

    def test_weird_attr_equals_first(self):
        # '=' as first key char is part of the name (WHATWG 13.2.5.32)
        out = toks("<a =b>")
        assert out[0][0] == START_TAG
        assert out[0][2] == [("=b", "")]
