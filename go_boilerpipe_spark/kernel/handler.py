"""SAX-style content handler: HTML token events → TextBlocks.

Port of the *semantics* of /root/reference/content_handler.go (the
contentHandler type, tag actions P3-P17, tokenize/isWord P6-P7 and
FlushBlock P8), re-expressed for the Arrow-batched extraction UDF. Every
quirk that the golden corpus encodes is kept:

- unconditional ``labelStack.Pop()`` on every end element
  (content_handler.go:151);
- early-return on end-tag/stack mismatch comparing *atoms*, so two unknown
  tags compare equal (content_handler.go:129-132 + atom zero semantics);
- ``FlushBlock`` returning without clearing buffers when numTokens == 0
  (content_handler.go:328-330);
- byte-length (not rune-length) test for the 1-byte buffer fast path
  (bytes.Buffer.Len, content_handler.go:277-286);
- Go ``unicode.IsSpace`` whitespace set (not Python's ``str.isspace``).
"""

from __future__ import annotations

import re

from ._unicode_classes import LETTER_CLASS, NUMERIC_WORD_CLASS
from .atoms import KNOWN_ATOMS, atom_of  # noqa: F401 (atom_of is public API)
from .rfc3339 import parse_rfc3339
from .textblock import (
    HEADING,
    HEADING1,
    HEADING2,
    HEADING3,
    LIST,
    TextBlock,
)

ANCHOR_TEXT_START = "$<"
ANCHOR_TEXT_END = ">$"

# unicode.IsSpace's exact set (White_Space property).
GO_SPACE = (
    "\t\n\v\f\r \x85\xa0        "
    "        　"
)
_GO_SPACE_SET = frozenset(GO_SPACE)
_SPACE_RUN = re.compile("[" + GO_SPACE + "]+")


def go_trim_space(s: str) -> str:
    return s.strip(GO_SPACE)


# content_handler.go:237-241 — Go \d is ASCII [0-9].
_RE_WORD_BOUNDARY = re.compile("[" + LETTER_CLASS + "0-9_]+")
# capturing variant: ONE split pass yields [piece0, word0, piece1, word1, …]
# (identical to split + findall interleave, at half the regex work)
_RE_WORD_BOUNDARY_CAP = re.compile("([" + LETTER_CLASS + "0-9_]+)")
_RE_NOT_WORD_BOUNDARY = re.compile("⁣*([\"'.,!@\\-:;$?()/])⁣*")
_RE_INVISIBLE_SEPARATOR = re.compile("⁣+")
_RE_SPACE = re.compile("[ ]+")
# content_handler.go:257
_RE_VALID_WORD_CHARACTER = re.compile("[" + LETTER_CLASS + NUMERIC_WORD_CLASS + "]")


# The NOT_WORD_BOUNDARY punctuation (content_handler.go:239): a U+2063
# marker adjacent (through this char) to a word edge is consumed, gluing
# the punctuation to the word.
_TOKEN_PUNCT = frozenset("\"'.,!@-:;$?()/")


def _junction_slow(p: str, lead: bool, trail: bool) -> str:
    """Rare path for junction pieces that contain a literal U+2063: run the
    original marker-machine regexes over the piece with its word-adjacent
    edge markers attached. Marker runs cannot cross word characters, so
    per-piece processing is exactly equivalent to the whole-string passes
    (content_handler.go:243-255)."""
    s = ("⁣" if lead else "") + p + ("⁣" if trail else "")
    s = "".join(_RE_NOT_WORD_BOUNDARY.split(s))
    return _RE_INVISIBLE_SEPARATOR.sub(" ", s)


def tokenize(text: str):
    """content_handler.go:243-255 (UnicodeTokenizer port).

    Implementation note: Go's three regex passes (wrap words in U+2063
    markers; strip markers around NOT_WORD_BOUNDARY punctuation; marker
    runs → space; split on spaces) reduce to a single rule per junction
    piece between words: the word-adjacent marker survives (→ space,
    separating tokens) iff the piece's adjacent char is NOT one of the
    listed punctuation chars. One capturing split + a parts walk computes
    exactly that; tests/test_tokenize_differential.py pins the equivalence
    (alphabet includes literal U+2063). Pieces containing a literal U+2063
    take _junction_slow, which reproduces the marker-run merge semantics."""
    text = text.strip(GO_SPACE)
    parts = _RE_WORD_BOUNDARY_CAP.split(text)
    np = len(parts)
    if np == 1:
        # no words: the punctuation-marker and marker-run passes still
        # apply to literal U+2063 input, then the space split
        if "⁣" in text:
            text = _junction_slow(text, False, False).strip(GO_SPACE)
        if not text:
            return [""]
        return [t for t in text.split(" ") if t]
    P = _TOKEN_PUNCT
    p = parts[0]
    if "⁣" in p:
        buf = [_junction_slow(p, False, True)]
        ap = buf.append
    else:
        buf = [p]
        ap = buf.append
        if not (p and p[-1] in P):
            ap(" ")
    last = np - 1
    for k in range(1, last, 2):
        ap(parts[k])  # the word run
        p = parts[k + 1]
        if k + 1 == last:
            # trailing piece: only its leading edge touches a marker
            if "⁣" in p:
                ap(_junction_slow(p, True, False))
            else:
                if not (p and p[0] in P):
                    ap(" ")
                ap(p)
        else:
            # interior junction: both edges touch markers
            if "⁣" in p:
                ap(_junction_slow(p, True, True))
            else:
                if p[0] not in P:
                    ap(" ")
                ap(p)
                if p[-1] not in P:
                    ap(" ")
    text = "".join(buf).strip(GO_SPACE)
    # "[ ]+"-split via str.split: runs collapse to interior '' entries,
    # dropped by the filter; the one observable difference is the empty
    # string, where regex split returns [''] — preserved explicitly.
    if not text:
        return [""]
    return [t for t in text.split(" ") if t]


def is_word(tok: str) -> bool:
    return _RE_VALID_WORD_CHARACTER.search(tok) is not None


# Tag-action codes (content_handler.go:499-553).
_IGNORABLE = 1
_ANCHOR = 2
_BODY = 3
_INLINE_WS = 4
_INLINE_NO_WS = 5
_BLOCK_LABEL = 6
_VOID = 7
_TIME = 8

# Which actions change tag level (ChangesTagLevel implementations).
_CHANGES_TAG_LEVEL = {_IGNORABLE, _ANCHOR, _BODY, _BLOCK_LABEL, _TIME}

TAG_ACTION_MAP = {}
for _t in ("applet", "figcaption", "figure", "noscript", "object", "option",
           "script", "style"):
    TAG_ACTION_MAP[_t] = _IGNORABLE
TAG_ACTION_MAP["a"] = _ANCHOR
TAG_ACTION_MAP["body"] = _BODY
TAG_ACTION_MAP["abbr"] = _INLINE_WS
for _t in ("b", "code", "em", "font", "i", "span", "strike", "strong", "sub",
           "sup", "tt", "u", "var"):
    TAG_ACTION_MAP[_t] = _INLINE_NO_WS
BLOCK_TAG_LABELS = {
    "li": (LIST,),
    "h1": (HEADING, HEADING1),
    "h2": (HEADING, HEADING2),
    "h3": (HEADING, HEADING3),
}
for _t in BLOCK_TAG_LABELS:
    TAG_ACTION_MAP[_t] = _BLOCK_LABEL
for _t in ("area", "base", "br", "col", "embed", "hr", "img", "input", "link",
           "menuitem", "meta", "param", "source", "track", "wbr"):
    TAG_ACTION_MAP[_t] = _VOID
TAG_ACTION_MAP["time"] = _TIME

# boilerpipe.go:556-574
SHOULD_BE_SELF_CLOSING = frozenset(
    ("area", "base", "br", "embed", "hr", "iframe", "img", "input", "link",
     "meta", "param", "source", "track")
)


class ContentHandler:
    __slots__ = (
        "title", "time", "token_buffer", "text_buffer", "depth_body",
        "depth_anchor", "depth_ignoreable", "depth_tag", "depth_block_tag",
        "last_was_whitespace", "text_element_index", "text_blocks",
        "last_start_tag", "last_end_tag", "offset_blocks", "flush",
        "in_anchor_text", "label_stack", "atom_stack", "in_ld_json",
        "ld_json",
    )

    def __init__(self):
        self.title = ""
        self.time = None
        self.token_buffer = []  # list of str fragments
        self.text_buffer = []
        self.depth_body = 0
        self.depth_anchor = 0
        self.depth_ignoreable = 0
        self.depth_tag = 0
        self.depth_block_tag = -1
        self.last_was_whitespace = False
        self.text_element_index = 0
        self.text_blocks = []
        self.last_start_tag = ""
        self.last_end_tag = ""
        self.offset_blocks = 0
        self.flush = False
        self.in_anchor_text = False
        self.label_stack = []
        self.atom_stack = []
        self.in_ld_json = False
        self.ld_json = []

    # -- events --------------------------------------------------------------

    def start_element(self, name: str, attrs):
        # inline atom_of: one set lookup
        self.atom_stack.append(name if name in KNOWN_ATOMS else "")

        ta = TAG_ACTION_MAP.get(name)
        if ta is not None:
            if ta == _TIME:
                for k, v in attrs:
                    if k == "datetime":
                        t = parse_rfc3339(v)
                        if t is not None:
                            self.time = t
                        break

            if ta in _CHANGES_TAG_LEVEL:
                self.depth_tag += 1
            self.flush = self._action_start(ta, name) or self.flush
        else:
            self.depth_tag += 1
            self.flush = True

        self.last_start_tag = name

    def end_element(self, name: str):
        stack = self.atom_stack
        pa = stack.pop() if stack else ""
        if pa != (name if name in KNOWN_ATOMS else ""):
            return  # malformed HTML, missing closing tag

        ta = TAG_ACTION_MAP.get(name)
        if ta is not None:
            self.flush = self._action_end(ta) or self.flush
        else:
            self.flush = True

        if ta is None or ta in _CHANGES_TAG_LEVEL:
            self.depth_tag -= 1

        if self.flush and self.token_buffer:
            self.flush_block()

        self.last_end_tag = name

        # content_handler.go:151 — unconditional pop (Go-port quirk)
        if self.label_stack:
            self.label_stack.pop()

    def _action_start(self, ta: int, name: str) -> bool:
        if ta == _IGNORABLE:
            self.depth_ignoreable += 1
            return True
        if ta == _ANCHOR:
            self.depth_anchor += 1
            if self.depth_ignoreable == 0:
                self._add_whitespace_if_necessary()
                self.token_buffer.append(ANCHOR_TEXT_START)
                self.token_buffer.append(" ")
                self.last_was_whitespace = True
            return False
        if ta == _BODY:
            self.flush_block()
            self.depth_body += 1
            return False
        if ta == _INLINE_WS:
            self._add_whitespace_if_necessary()
            return False
        if ta == _INLINE_NO_WS:
            return False
        if ta == _BLOCK_LABEL:
            self.label_stack.extend(BLOCK_TAG_LABELS[name])
            return True
        if ta == _VOID:
            return False
        return True  # _TIME

    def _action_end(self, ta: int) -> bool:
        if ta == _IGNORABLE:
            self.depth_ignoreable -= 1
            return True
        if ta == _ANCHOR:
            self.depth_anchor -= 1
            if self.depth_anchor == 0 and self.depth_ignoreable == 0:
                self._add_whitespace_if_necessary()
                self.token_buffer.append(ANCHOR_TEXT_END)
                self.token_buffer.append(" ")
                self.last_was_whitespace = True
            return False
        if ta == _BODY:
            self.flush_block()
            self.depth_body -= 1
            return False
        if ta == _INLINE_WS:
            self._add_whitespace_if_necessary()
            return False
        if ta == _INLINE_NO_WS:
            return False
        if ta == _BLOCK_LABEL:
            return True
        if ta == _VOID:
            return False
        return True  # _TIME

    def text_token(self, data: str):
        self.text_element_index += 1

        if self.flush:
            if self.token_buffer:
                self.flush_block()
            self.flush = False

        if self.depth_ignoreable != 0:
            return
        if not data:
            return

        # fast path: all-whitespace tokens (newline+indent runs between
        # tags dominate markup-dense HTML). strip(GO_SPACE) is the exact
        # Go White_Space set, so this is equivalent to the spaceRemover
        # with empty collapsed text and was_first == was_last == True.
        if not data.strip(GO_SPACE):
            if not self.last_was_whitespace:
                self.text_buffer.append(" ")
                self.token_buffer.append(" ")
                self.last_was_whitespace = True
            return

        # spaceRemover (content_handler.go:154-235): collapse whitespace runs
        # to single spaces, remembering whether the first/last rune was space.
        was_first = data[0] in _GO_SPACE_SET
        was_last = data[-1] in _GO_SPACE_SET
        ch = _SPACE_RUN.sub(" ", data).strip(GO_SPACE)

        if not ch:
            if was_first or was_last:
                if not self.last_was_whitespace:
                    self.text_buffer.append(" ")
                    self.token_buffer.append(" ")
                self.last_was_whitespace = True
            else:
                self.last_was_whitespace = False
            return

        if was_first and not self.last_was_whitespace:
            self.text_buffer.append(" ")
            self.token_buffer.append(" ")

        if self.depth_block_tag == -1:
            self.depth_block_tag = self.depth_tag

        self.text_buffer.append(ch)
        self.token_buffer.append(ch)
        if was_last:
            self.text_buffer.append(" ")
            self.token_buffer.append(" ")

        self.last_was_whitespace = was_last

    def _add_whitespace_if_necessary(self):
        if not self.last_was_whitespace:
            self.token_buffer.append(" ")
            self.text_buffer.append(" ")
            self.last_was_whitespace = True

    # -- block emission -------------------------------------------------------

    def flush_block(self):
        if not self.token_buffer:
            # empty buffer: Go's case-0 return (and the depthBody==0 path
            # degenerates to clearing already-empty buffers) — fast exit.
            return

        token_str = "".join(self.token_buffer)

        if self.depth_body == 0:
            if self.last_start_tag == "title":
                title = go_trim_space(token_str)
                if title:
                    self.title = title
            self.text_buffer.clear()
            self.token_buffer.clear()
            return

        # bytes.Buffer.Len() is a *byte* length (content_handler.go:277-286).
        # surrogateescape: invalid-UTF-8 input decoded with surrogateescape
        # round-trips to its original bytes, so the byte count equals Go's
        # (which operates on the raw bytes) and never raises.
        blen = (
            len(token_str)
            if token_str.isascii()
            else len(token_str.encode("utf-8", "surrogateescape"))
        )
        if blen == 0:
            return
        if blen == 1 and self.last_was_whitespace:
            self.text_buffer.clear()
            self.token_buffer.clear()
            return

        toks = tokenize(token_str)

        num_words = 0
        num_linked_words = 0
        num_wrapped_lines = 0
        num_tokens = 0
        num_words_current_line = 0
        current_line_length = -1  # don't count the first space

        in_anchor = self.in_anchor_text
        word_search = _RE_VALID_WORD_CHARACTER.search  # inlined is_word
        for tok in toks:
            if tok == ANCHOR_TEXT_START:
                in_anchor = True
            elif tok == ANCHOR_TEXT_END:
                in_anchor = False
            elif word_search(tok) is not None:
                num_tokens += 1
                num_words += 1
                num_words_current_line += 1
                if in_anchor:
                    num_linked_words += 1
                tok_length = len(tok)
                current_line_length += tok_length + 1
                if current_line_length > 80:  # max line length
                    num_wrapped_lines += 1
                    current_line_length = tok_length
                    num_words_current_line = 1
            else:
                num_tokens += 1
        self.in_anchor_text = in_anchor

        if num_tokens == 0:
            # Go-port quirk: buffers are NOT reset (content_handler.go:328-330)
            return

        if num_wrapped_lines == 0:
            num_words_in_wrapped_lines = num_words
            num_wrapped_lines = 1
        else:
            num_words_in_wrapped_lines = num_words - num_words_current_line

        text = go_trim_space("".join(self.text_buffer))

        if text:
            tb = TextBlock()
            tb.text = text
            tb.num_words = num_words
            tb.num_linked_words = num_linked_words
            tb.num_words_in_wrapped_lines = num_words_in_wrapped_lines
            tb.num_wrapped_lines = num_wrapped_lines
            tb.offset_blocks_start = self.offset_blocks
            tb.offset_blocks_end = self.offset_blocks
            tb.tag_level = self.depth_block_tag

            if num_words_in_wrapped_lines == 0:
                tb.num_words_in_wrapped_lines = num_words
                tb.num_wrapped_lines = 1

            # labelStack.PopAll() returns reverse order (textblock.go:47-60)
            if self.label_stack:
                tb.add_labels(reversed(self.label_stack))
                self.label_stack.clear()

            self.text_blocks.append(tb)
            self.offset_blocks += 1

        self.text_buffer.clear()
        self.token_buffer.clear()
        self.depth_block_tag = -1
