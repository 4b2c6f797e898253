"""Differential regression gate for the tokenize hot-path rewrite.

Round 2 replaced the reference's three-regex U+2063 marker machine
(content_handler.go:243-255) with a junction-rule parts walk. This test
keeps the ORIGINAL marker-machine implementation as the executable spec
and checks equivalence over random strings drawn from an alphabet that
covers every branch: word chars (ascii/unicode), the NOT_WORD_BOUNDARY
punctuation, other punctuation, whitespace variants, CJK.
"""

import random
import re

from go_boilerpipe_spark.kernel.handler import (
    GO_SPACE,
    _RE_INVISIBLE_SEPARATOR,
    _RE_NOT_WORD_BOUNDARY,
    _RE_WORD_BOUNDARY_CAP,
    tokenize,
)


def marker_machine_tokenize(text):
    """The original algorithm: wrap words in U+2063, strip markers around
    NOT_WORD_BOUNDARY punctuation, marker runs → space, split on spaces."""
    text = text.strip(GO_SPACE)
    parts = _RE_WORD_BOUNDARY_CAP.split(text)
    if len(parts) > 1:
        buf = [parts[0]]
        for k in range(1, len(parts) - 1, 2):
            buf += ["⁣", parts[k], "⁣", parts[k + 1]]
        text = "".join(buf)
    if "⁣" in text:
        text = "".join(_RE_NOT_WORD_BOUNDARY.split(text))
        text = _RE_INVISIBLE_SEPARATOR.sub(" ", text)
    return re.split("[ ]+", text.strip(GO_SPACE))


ALPHABET = (
    list("abz ABZ 019 _ .,!@-:;$?()/ \"'€…中文\t\xa0~^&*[]{}=+<>#%")
    + ["ß", "é", "  ", "--", "..", "' ", "⁣", "⁣⁣", "⁣.", ".⁣", "a⁣b"]
)

HAND_CASES = [
    "",
    " ",
    "hello world",
    "don't stop",
    "end.",
    "(parens) and/or slash/e",
    "a--b",
    "…ellipsis…",
    "中文 words 混合 text",
    "a , b",
    "$5.99!",
    "x" * 200,
    ". . .",
    "-leading and trailing-",
    # literal U+2063 in the input (the ADVICE r2 divergence): the marker
    # machine merges input markers with the word-wrap markers
    "a⁣.b",
    "a⁣b",
    "⁣",
    "⁣⁣⁣",
    "a⁣",
    "⁣a",
    ".⁣.",
    "⁣.⁣",
    "x ⁣, y",
    "⁣-word-⁣",
]


def test_hand_cases():
    for s in HAND_CASES:
        assert tokenize(s) == marker_machine_tokenize(s), repr(s)


def test_random_differential():
    rng = random.Random(20260816)
    for _ in range(5000):
        s = "".join(
            rng.choice(ALPHABET) for _ in range(rng.randint(0, 40))
        )
        assert tokenize(s) == marker_machine_tokenize(s), repr(s)
