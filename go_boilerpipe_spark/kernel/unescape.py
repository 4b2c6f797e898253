"""Go x/net/html entity unescaping (escape.go ``unescape``/``unescapeEntity``).

Python's ``html.unescape`` implements the WHATWG spec's *text* rules only.
The Go tokenizer the reference drives (boilerpipe.go:108-158) has its own
variant with byte-level quirks this port keeps:

- attribute mode: a named reference without a trailing ``;`` is left
  literal when the next char is ``=``, and the shorter-prefix fallback
  (``&notin`` → ``¬in``) never runs in attributes;
- the prefix fallback in text mode is capped at 6 chars
  (``longestEntityWithoutSemicolon``);
- ``&#x;`` yields U+FFFD (the spec leaves it literal);
- a numeric reference whose digit run ends before position 4 without a
  ``;`` (e.g. ``&#1x``) stays literal;
- decimal/hex accumulation wraps like Go's int32 ``rune`` arithmetic
  (wrapped-negative values encode as U+FFFD via utf8.EncodeRune).

The entity table is ``html.entities.html5`` — generated from the same
WHATWG entities.json as Go's entity.go (union of its ``entity`` and
``entity2`` maps, with and without trailing semicolons).
"""

from __future__ import annotations

from html.entities import html5 as _HTML5

# escape.go replacementTable: Windows-1252 mappings for &#x80;..&#x9F;.
_REPLACEMENT_TABLE = (
    "€", "", "‚", "ƒ", "„", "…", "†",
    "‡", "ˆ", "‰", "Š", "‹", "Œ", "",
    "Ž", "", "", "‘", "’", "“", "”",
    "•", "–", "—", "˜", "™", "š", "›",
    "œ", "", "ž", "Ÿ",
)

_LONGEST_NO_SEMI = 6  # longestEntityWithoutSemicolon


def _entity(s: str, src: int, n: int, attribute: bool):
    """unescapeEntity: parse one reference at s[src] == '&'.

    Returns (next_src, replacement_text)."""
    if src + 1 >= n:
        return src + 1, "&"
    c = s[src + 1]

    if c == "#":
        if n - src <= 3:  # need at least "&#."
            return src + 1, "&"
        i = 2
        hexmode = False
        if s[src + 2] in "xX":
            hexmode = True
            i = 3
        x = 0
        while src + i < n:
            c = s[src + i]
            i += 1
            if hexmode:
                if "0" <= c <= "9":
                    x = (16 * x + ord(c) - 48) & 0xFFFFFFFF
                    continue
                if "a" <= c <= "f":
                    x = (16 * x + ord(c) - 87) & 0xFFFFFFFF
                    continue
                if "A" <= c <= "F":
                    x = (16 * x + ord(c) - 55) & 0xFFFFFFFF
                    continue
            elif "0" <= c <= "9":
                x = (10 * x + ord(c) - 48) & 0xFFFFFFFF
                continue
            if c != ";":
                i -= 1
            break
        if i <= 3:  # no digits matched
            return src + 1, "&"
        if x >= 0x80000000:  # Go rune (int32) went negative → RuneError
            x = 0xFFFD
        elif 0x80 <= x <= 0x9F:
            x = ord(_REPLACEMENT_TABLE[x - 0x80])
        elif x == 0 or 0xD800 <= x <= 0xDFFF or x > 0x10FFFF:
            x = 0xFFFD
        return src + i, chr(x)

    # named reference: consume [a-zA-Z0-9]* and an optional ';'
    i = 1
    while src + i < n:
        c = s[src + i]
        i += 1
        if ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9"):
            continue
        if c != ";":
            i -= 1
        break
    name = s[src + 1 : src + i]
    if name == "":
        pass
    elif (
        attribute
        and name[-1] != ";"
        and src + i < n
        and s[src + i] == "="
    ):
        pass  # attribute quirk: &name= stays literal
    else:
        rep = _HTML5.get(name)
        if rep is not None:
            return src + i, rep
        if not attribute:
            max_len = min(len(name) - 1, _LONGEST_NO_SEMI)
            for j in range(max_len, 1, -1):
                rep = _HTML5.get(name[:j])
                if rep is not None:
                    return src + j + 1, rep
    return src + i, s[src : src + i]


def go_unescape(s: str, attribute: bool = False) -> str:
    """escape.go unescape(): replace entities; everything else copies."""
    i = s.find("&")
    if i == -1:
        return s
    out = [s[:i]]
    n = len(s)
    ap = out.append
    while True:
        j, rep = _entity(s, i, n, attribute)
        ap(rep)
        k = s.find("&", j)
        if k == -1:
            ap(s[j:])
            return "".join(out)
        ap(s[j:k])
        i = k
