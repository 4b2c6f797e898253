"""HTML tokenizer replicating golang.org/x/net/html's ``Tokenizer``.

The reference (jlubawy/go-boilerpipe) drives its SAX parse off
``html.NewTokenizer`` (/root/reference/boilerpipe.go:108-158). Byte-identical
extraction therefore requires the *same token stream*: the same raw-text
element handling (script/style/iframe/... contents arrive as one un-escaped
text token, title/textarea as RCDATA), the same malformed-markup recovery
(bogus comments, "</>" placeholders, text-ending rules), the same
self-closing detection (source byte before '>' is '/'), and the same entity
unescaping. Python's ``html.parser`` diverges on several of these (it parses
tags inside <title>/<iframe>, allows whitespace in "</ script", etc.), so we
implement the tokenizer directly. State names follow the WHATWG HTML5
tokenizer spec, which is what the Go implementation follows.

This is pure Python with ``str.find`` jump-scanning on the hot paths; it runs
inside the Arrow-batched extraction UDF (one call per document).
"""

from __future__ import annotations

from .unescape import go_unescape

# Token types (subset the parse loop distinguishes; mirrors html.TokenType).
ERROR = 0  # EOF
TEXT = 1
START_TAG = 2
END_TAG = 3
SELF_CLOSING = 4
COMMENT = 5  # also used for doctype/bogus comments (parse loop ignores all)

_RAW_TAGS = frozenset(
    (
        "iframe",
        "noembed",
        "noframes",
        "noscript",
        "plaintext",
        "script",
        "style",
        "textarea",
        "title",
        "xmp",
    )
)

# RCDATA raw tags: entities are unescaped in their text.
_RCDATA_TAGS = frozenset(("textarea", "title"))

_WS = " \n\r\t\f"
import re as _re  # tag fast-path patterns


# Whole-tag fast path: matches exactly the tags the per-char walk would
# parse to the same end position (well-formed names/attrs). Anything the
# pattern rejects falls back to the exact Go-semantics loop.
_TAG_RE = _re.compile(
    r"([a-zA-Z][^ \n\r\t\f/>]*)"
    r"((?:[ \n\r\t\f]+[^ \n\r\t\f/>=]+"
    r"(?:[ \n\r\t\f]*=[ \n\r\t\f]*"
    r"(?:\"[^\"]*\"|'[^']*'|[^ \n\r\t\f>]*))?)*)"
    r"[ \n\r\t\f]*/?>"
)
_ATTR_RE = _re.compile(
    r"[ \n\r\t\f]+([^ \n\r\t\f/>=]+)"
    r"(?:[ \n\r\t\f]*=[ \n\r\t\f]*"
    r"(\"[^\"]*\"|'[^']*'|[^ \n\r\t\f>]*))?"
)
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


_LOWER_CACHE: dict = {}


def _lower(s: str) -> str:
    # Go's lower() only folds ASCII A-Z. Tag/attribute names repeat
    # constantly → memoize (capped so adversarial random names cannot
    # grow the dict unboundedly).
    r = _LOWER_CACHE.get(s)
    if r is None:
        r = s.translate(_ASCII_LOWER)
        if len(_LOWER_CACHE) < 4096:
            _LOWER_CACHE[s] = r
    return r


def _convert_newlines(s: str) -> str:
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    return s


def _is_alpha(c: str) -> bool:
    return "a" <= c <= "z" or "A" <= c <= "Z"


class Tokenizer:
    """Pull tokenizer over a decoded document string.

    ``next()`` returns ``(tt, data, attrs)`` where ``data`` is the processed
    text for TEXT tokens or the lower-cased tag name for tag tokens, and
    ``attrs`` is a list of ``(key, value)`` for START_TAG/SELF_CLOSING.
    """

    __slots__ = ("s", "n", "i", "raw_tag", "attr_tags", "_gen")

    def __init__(self, s: str, attr_tags=None):
        """``attr_tags``: when given, attribute extraction runs only for
        those tag names (the boilerpipe parse loop reads attrs solely on
        <script> and <time> — skipping the rest removes most per-tag
        unescape work). None = extract for every start tag."""
        self.s = s
        self.n = len(s)
        self.i = 0
        self.raw_tag = ""
        self.attr_tags = attr_tags
        self._gen = None

    # -- raw text ---------------------------------------------------------

    def _read_raw_end_tag(self, i: int) -> int:
        """If ``s[i:]`` starts with "</" + raw_tag + terminator, return the
        position of the "<"; else -1. Caller guarantees s[i:i+2] == "</"."""
        s, tag = self.s, self.raw_tag
        j = i + 2
        end = j + len(tag)
        if s[j:end].translate(_ASCII_LOWER) != tag:
            return -1
        if end >= self.n:
            return -1  # EOF right after the name: not an end tag (Go: err)
        if s[end] in " \n\r\t\f/>":
            return i
        return -1

    def _read_raw_or_rcdata(self) -> int:
        """Scan raw text; return its end position (start of "</tag" or EOF).
        Mirrors Tokenizer.readRawOrRCDATA."""
        s, n = self.s, self.n
        i = self.i
        while True:
            j = s.find("</", i)
            if j == -1:
                return n
            k = self._read_raw_end_tag(j)
            if k != -1:
                return k
            i = j + 2

    def _read_script(self) -> int:
        """Scan script data with the spec's escaped / double-escaped states;
        return end position of the script text. Mirrors Tokenizer.readScript."""
        s, n = self.s, self.n
        i = self.i

        # state: 0 = script data, 1 = escaped, 2 = double escaped
        state = 0
        while i < n:
            if state == 0:
                j = s.find("<", i)
                if j == -1:
                    return n
                c = s[j + 1] if j + 1 < n else ""
                if c == "/":
                    k = self._read_raw_end_tag(j)
                    if k != -1:
                        return k
                    i = j + 2
                elif c == "!":
                    # script data escape start: needs "--"
                    if s[j + 2 : j + 4] == "--":
                        state = 1
                        i = j + 4
                    else:
                        i = j + 2
                else:
                    i = j + 1
            elif state == 1:
                # escaped: watch for "-->" (back to script data), "</script"
                # (end), "<script" (double escape)
                j = i
                found = False
                while j < n:
                    c = s[j]
                    if c == "-":
                        # count dash run, then check '>'
                        k = j
                        while k < n and s[k] == "-":
                            k += 1
                        if k - j >= 2 and k < n and s[k] == ">":
                            state = 0
                            i = k + 1
                            found = True
                            break
                        j = k
                    elif c == "<":
                        if s[j + 1 : j + 2] == "/":
                            k = self._read_raw_end_tag(j)
                            if k != -1:
                                return k
                            j += 2
                        elif j + 1 < n and _is_alpha(s[j + 1]):
                            # double escape start: "<script" + terminator
                            name = s[j + 1 : j + 7].translate(_ASCII_LOWER)
                            if (
                                name == "script"
                                and j + 7 < n
                                and s[j + 7] in " \n\r\t\f/>"
                            ):
                                state = 2
                                i = j + 8
                                found = True
                                break
                            j += 1
                        else:
                            j += 1
                    else:
                        j += 1
                if not found:
                    if j >= n:
                        return n
            else:
                # double escaped: "-->" → script data; "</script" + term →
                # back to escaped (the end tag is script text)
                j = i
                found = False
                while j < n:
                    c = s[j]
                    if c == "-":
                        k = j
                        while k < n and s[k] == "-":
                            k += 1
                        if k - j >= 2 and k < n and s[k] == ">":
                            state = 0
                            i = k + 1
                            found = True
                            break
                        j = k
                    elif c == "<":
                        if s[j + 1 : j + 2] == "/":
                            name = s[j + 2 : j + 8].translate(_ASCII_LOWER)
                            if (
                                name == "script"
                                and j + 8 < n
                                and s[j + 8] in " \n\r\t\f/>"
                            ):
                                state = 1
                                i = j + 9
                                found = True
                                break
                            j += 2
                        else:
                            j += 1
                    else:
                        j += 1
                if not found:
                    if j >= n:
                        return n
        return n

    # -- tags ---------------------------------------------------------------

    def _skip_ws(self, i: int) -> int:
        s, n = self.s, self.n
        while i < n and s[i] in _WS:
            i += 1
        return i

    def _read_tag_name(self, i: int):
        """Read tag name starting at the first name char; return (name_lower,
        next_pos). Mirrors readTagName (terminators: WS consumed, '/' '>'
        unconsumed)."""
        s, n = self.s, self.n
        j = i
        while j < n:
            c = s[j]
            if c in _WS:
                return _lower(s[i:j]), j + 1
            if c == "/" or c == ">":
                return _lower(s[i:j]), j
            j += 1
        return _lower(s[i:j]), j

    def _read_tag(self, i: int, save_attr: bool):
        """Parse a tag starting at the first name char. Returns
        (name, attrs, end_pos, eof). end_pos is just past '>'.

        Fast path: a single whole-tag regex match; the per-char walk (exact
        x/net/html semantics) handles whatever the pattern rejects."""
        s, n = self.s, self.n
        m = _TAG_RE.match(s, i)
        if m is not None:
            name = _lower(m.group(1))
            attrs = None
            if save_attr:
                if self.attr_tags is not None and name not in self.attr_tags:
                    attrs = ()
                else:
                    attrs = []
                    for k, v in _ATTR_RE.findall(m.group(2)):
                        if v and (v[0] == '"' or v[0] == "'"):
                            v = v[1:-1]
                        attrs.append(
                            (_lower(k), go_unescape(_convert_newlines(v), True))
                        )
            return name, attrs, m.end(), False
        name, i = self._read_tag_name(i)
        if save_attr and self.attr_tags is not None and name not in self.attr_tags:
            save_attr = False
            attrs = ()
        else:
            attrs = [] if save_attr else None
        i = self._skip_ws(i)
        while True:
            if i >= n:
                return name, attrs, i, True
            c = s[i]
            if c == ">":
                return name, attrs, i + 1, False
            # readTagAttrKey
            k0 = i
            while i < n:
                c = s[i]
                if c == "=" and i == k0:
                    # leading '=' is part of the name (WHATWG 13.2.5.32)
                    i += 1
                    continue
                if c in _WS or c == "/" or c == ">" or c == "=":
                    break
                i += 1
            key = s[k0:i]
            # readTagAttrVal
            val = ""
            i = self._skip_ws(i)
            if i >= n:
                if save_attr and key:
                    attrs.append((_lower(key), val))
                return name, attrs, i, True
            c = s[i]
            if c == "/":
                i += 1
            elif c == "=":
                i = self._skip_ws(i + 1)
                if i >= n:
                    if save_attr and key:
                        attrs.append((_lower(key), val))
                    return name, attrs, i, True
                q = s[i]
                if q == ">":
                    pass  # unconsumed; loop sees it
                elif q == '"' or q == "'":
                    j = s.find(q, i + 1)
                    if j == -1:
                        val = s[i + 1 :]
                        i = n
                    else:
                        val = s[i + 1 : j]
                        i = j + 1
                else:
                    j = i
                    while j < n and s[j] not in _WS and s[j] != ">":
                        j += 1
                    val = s[i:j]
                    i = j if (j < n and s[j] == ">") else j + 1
                    if i > n:
                        i = n
            if save_attr and key:
                attrs.append(
                    (_lower(key), go_unescape(_convert_newlines(val), True))
                )
            i = self._skip_ws(i)

    # -- comments / declarations ---------------------------------------------

    def _read_until_close_angle(self, i: int) -> int:
        j = self.s.find(">", i)
        return self.n if j == -1 else j + 1

    def _read_comment(self, i: int) -> int:
        """Position just past the end of a "<!--" comment starting at ``i``
        (just past the opening dashes). Mirrors readComment."""
        s, n = self.s, self.n
        dash_count = 2
        while i < n:
            c = s[i]
            i += 1
            if c == "-":
                dash_count += 1
            elif c == ">":
                if dash_count >= 2:
                    return i
                dash_count = 0
            elif c == "!":
                if dash_count >= 2:
                    if i < n and s[i] == ">":
                        return i + 1
                    i += 1  # the checked byte was consumed
                dash_count = 0
            else:
                dash_count = 0
        return n

    def _read_markup_declaration(self, i: int) -> int:
        """Handle "<!..." starting just past "<!"; return end position."""
        s, n = self.s, self.n
        if s[i : i + 2] == "--":
            return self._read_comment(i + 2)
        if s[i : i + 7].translate(_ASCII_LOWER) == "doctype":
            return self._read_until_close_angle(i + 7)
        return self._read_until_close_angle(i)

    # -- main ---------------------------------------------------------------

    def iter_tokens(self):
        """Generator form of the token stream — the hot path. Locals
        persist across yields (no per-token function-call prologue); the
        semantics are exactly the per-call ``next()`` loop's."""
        s, n = self.s, self.n
        find = s.find
        text_of = self._text
        read_tag = self._read_tag
        while True:
            i = self.i
            if i >= n:
                return

            if self.raw_tag:
                tag = self.raw_tag
                if tag == "plaintext":
                    end = n
                    raw = True
                elif tag == "script":
                    end = self._read_script()
                    raw = True
                else:
                    end = self._read_raw_or_rcdata()
                    raw = tag not in _RCDATA_TAGS
                self.raw_tag = ""
                if end > i:
                    self.i = end
                    text = _convert_newlines(s[i:end])
                    if raw:
                        if "\x00" in text:
                            text = text.replace("\x00", "�")
                    else:
                        text = go_unescape(text)
                    yield (TEXT, text, None)
                    continue
                # empty raw text: fall through to normal scanning
                i = self.i

            text_start = i
            while True:
                j = find("<", i)
                if j == -1:
                    # EOF: all remaining is text
                    self.i = n
                    if text_start < n:
                        yield (TEXT, text_of(s[text_start:n]), None)
                    return
                if j + 1 >= n:
                    # '<' then EOF → text includes it
                    self.i = n
                    yield (TEXT, text_of(s[text_start:n]), None)
                    return
                c = s[j + 1]
                if "a" <= c <= "z" or "A" <= c <= "Z":
                    tok_type = START_TAG
                elif c == "/":
                    tok_type = END_TAG
                elif c == "!" or c == "?":
                    tok_type = COMMENT
                else:
                    i = j + 1  # '<' is part of text
                    continue

                if text_start < j:
                    # emit accumulated text first; re-scan the tag after
                    self.i = j
                    yield (TEXT, text_of(s[text_start:j]), None)
                    break

                if tok_type == START_TAG:
                    name, attrs, end, eof = read_tag(j + 1, True)
                    if eof:
                        self.i = n
                        return
                    self.i = end
                    if name in _RAW_TAGS:
                        # rawTag is set even when the tag turns out
                        # self-closing (x/net/html readStartTag does the same).
                        self.raw_tag = name
                    # self-closing iff the source byte before '>' is '/'
                    if end - 2 >= 0 and s[end - 2] == "/":
                        yield (SELF_CLOSING, name, attrs)
                    else:
                        yield (START_TAG, name, attrs)
                    break

                if tok_type == END_TAG:
                    if j + 2 >= n:
                        # "</" then EOF → becomes text
                        self.i = n
                        yield (TEXT, text_of(s[text_start:n]), None)
                        return
                    c = s[j + 2]
                    if c == ">":
                        # "</>" yields no real token (empty comment)
                        self.i = j + 3
                        yield (COMMENT, "", None)
                    elif "a" <= c <= "z" or "A" <= c <= "Z":
                        name, _, end, eof = read_tag(j + 2, False)
                        if eof:
                            self.i = n
                            return
                        self.i = end
                        yield (END_TAG, name, None)
                    else:
                        self.i = self._read_until_close_angle(j + 2)
                        yield (COMMENT, "", None)
                    break

                # COMMENT-ish
                if c == "!":
                    self.i = self._read_markup_declaration(j + 2)
                else:  # "<?"
                    self.i = self._read_until_close_angle(j + 2)
                yield (COMMENT, "", None)
                break

    def next(self):
        """Pull-style wrapper over :meth:`iter_tokens` (single source of
        truth for the tokenizer logic)."""
        g = self._gen
        if g is None:
            g = self._gen = self.iter_tokens()
        return next(g, (ERROR, "", None))

    def _text(self, raw: str) -> str:
        return go_unescape(_convert_newlines(raw))


def tokens(s: str):
    """Iterate ``(tt, data, attrs)`` until EOF."""
    z = Tokenizer(s)
    while True:
        t = z.next()
        if t[0] == ERROR:
            return
        yield t
