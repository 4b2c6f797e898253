"""Go x/net/html unescape parity (escape.go unescapeEntity quirks).

Pins the attribute-mode semicolon rules and the text-mode quirks that
Python's html.unescape does NOT share; exercised through the tokenizer's
time[datetime]/script[type] attribute reads (content_handler.go:103-113,
boilerpipe.go:124-126)."""

import datetime

from go_boilerpipe_spark.kernel import htmltok
from go_boilerpipe_spark.kernel.document import parse_document
from go_boilerpipe_spark.kernel.unescape import go_unescape

TEXT_CASES = [
    ("no entities here", "no entities here"),
    ("&lt;a&gt;", "<a>"),
    ("&lt", "<"),                      # legacy, no semicolon
    ("&lt=", "<="),                    # text mode DOES unescape before '='
    ("&ltx", "<x"),                    # prefix fallback (capped at 6)
    ("&notit;", "¬it;"),               # prefix fallback mid-name
    ("&notin", "¬in"),                 # 'notin' needs ';' → prefix 'not' hits
    ("&#65;", "A"),
    ("&#x41", "A"),
    ("&#X41;", "A"),
    ("&#0;", "�"),
    ("&#x;", "�"),                # Go quirk: spec leaves this literal
    ("&#1x", "&#1x"),                  # digit run too short without ';'
    ("&#xD800;", "�"),
    ("&#x110000;", "�"),
    ("&#x80;", "€"),                   # replacementTable (cp1252)
    ("&#x9F;", "Ÿ"),
    ("&#x81;", "\x81"),                # undefined cp1252 slot → same cp
    ("&", "&"),
    ("&;", "&;"),
    ("a & b &amp; c", "a & b & c"),
    ("&acE;", "∾̳"),         # two-codepoint entity
    # ≥10-digit numeric refs wrap like Go's int32 rune arithmetic
    # (VERDICT r2 item 8): residue mod 2^32, negative int32 → U+FFFD,
    # wrapped-POSITIVE values alias to real codepoints
    ("&#4294967361;", "A"),           # 2^32 + 65 wraps to 'A'
    ("&#4294967296;", "�"),      # 2^32 wraps to 0 → RuneError
    ("&#2147483648;", "�"),      # 2^31: negative int32 → RuneError
    ("&#12884901988;", "d"),          # 3·2^32 + 100 wraps to 'd'
    ("&#x100000041;", "A"),           # hex wrap: 0x1_0000_0041 → 'A'
    ("&#4294968346;", "К"),      # 2^32 + 1050 → Cyrillic К
]

ATTR_CASES = [
    ("&lt;", "<"),
    ("&lt", "<"),                      # no ';' but next char is EOF → ok
    ("&lt=", "&lt="),                  # attribute quirk: next char '=' → literal
    ("&ltx", "&ltx"),                  # no prefix fallback in attributes
    ("&notit;", "&notit;"),
    ("&#43;", "+"),                    # numeric refs identical in both modes
    ("x=&lty=2", "x=&lty=2"),
]


def test_text_mode_quirks():
    for raw, want in TEXT_CASES:
        assert go_unescape(raw) == want, raw


def test_attribute_mode_quirks():
    for raw, want in ATTR_CASES:
        assert go_unescape(raw, True) == want, raw


def test_entity_bearing_datetime_attribute():
    # &#43; is '+' — the RFC3339 offset must survive attribute unescaping
    html = (
        '<html><body><time datetime="2017-04-20T10:00:00&#43;07:00">x</time>'
        "</body></html>"
    )
    doc = parse_document(html)
    assert doc.date == datetime.datetime(
        2017, 4, 20, 10, 0, 0,
        tzinfo=datetime.timezone(datetime.timedelta(hours=7)),
    )


def test_attr_mode_literal_in_datetime():
    # '&lt=' stays literal in attributes → invalid datetime → no date
    html = '<html><body><time datetime="2017&lt=01">x</time></body></html>'
    doc = parse_document(html)
    assert doc.date is None


def test_script_type_attr_unescaped():
    # application/ld&#43;json → application/ld+json via attribute unescape
    html = (
        '<html><body><script type="application/ld&#43;json">'
        '{"@type":"Article","headline":"H","articleBody":"B"}'
        "</script></body></html>"
    )
    doc = parse_document(html)
    assert doc.title == "H"


def test_tokenizer_text_uses_go_rules():
    toks = list(htmltok.tokens("<p>&#x;</p>"))
    texts = [d for t, d, _ in toks if t == htmltok.TEXT]
    assert texts == ["�"]
