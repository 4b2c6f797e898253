"""The Article filter chain: 12 sequential passes over a document's blocks.

Port of /root/reference/filter.go semantics. These run per document inside
the Arrow extraction UDF (order-sensitive, stateful — SURVEY.md §2.2).
Normative Go-port quirks preserved:

- BlockProximityFusion computes the distance from the *current block's own*
  offsets (filter.go:362), so the distance test is effectively always true;
- ExpandTitleToContent promotes a *prefix* of the document
  (``doc.TextBlocks[i]`` with i ranging over 0..contentStart-title-1,
  filter.go:598-599), not the title..contentStart slice;
- TerminatingBlocks' length test is a *byte* length (filter.go:76);
- addPotentialTitles splits on single spaces first, so its word counter
  never reaches minWords — it adds nothing (filter.go:223-239);
- KeepLargestBlocks' percent thresholds truncate via int() (filter.go:507-519).
"""

from __future__ import annotations

import re

from .handler import go_trim_space
from .textblock import (
    EMPTY_END,
    EMPTY_START,
    HEADING,
    INDICATES_END_OF_TEXT,
    LIST,
    MIGHT_BE_CONTENT,
    TITLE,
    VERY_LIKELY_CONTENT,
    MAX_INT32,
)

# -- F1 TerminatingBlocks (filter.go:58-128) ---------------------------------

_TERMINATING_CONTAINS = (
    "what you think...",
    "add your comment",
    "add comment",
    "reader views",
    "have your say",
    "reader comments",
    "rätta artikeln",
)


def _starts_with_number(text: str, *prefixes: str) -> bool:
    i = 0
    n = len(text)
    while i < n and "0" <= text[i] <= "9":
        i += 1
    if i != 0:
        rest = text[i:]
        for p in prefixes:
            if rest.startswith(p):
                return True
    return False


def terminating_blocks(doc) -> bool:
    has_changed = False
    for tb in doc.text_blocks:
        if tb.num_words < 15:
            text = go_trim_space(tb.text)
            blen = (
                len(text)
                if text.isascii()
                else len(text.encode("utf-8", "surrogateescape"))
            )
            if blen >= 8:
                text_lc = go_to_lower(text)
                if (
                    text_lc.startswith("comments")
                    or _starts_with_number(
                        text_lc, " comments", " users responded in"
                    )
                    or text_lc.startswith("© reuters")
                    or text_lc.startswith("please rate this")
                    or text_lc.startswith("post a comment")
                    or any(c in text_lc for c in _TERMINATING_CONTAINS)
                    or text_lc
                    == "thanks for your comments - this feedback is now closed"
                ):
                    tb.add_labels((INDICATES_END_OF_TEXT,))
                    has_changed = True
            elif tb.link_density() == 1.0:
                if text == "Comment":
                    tb.add_labels((INDICATES_END_OF_TEXT,))
    return has_changed


# -- F2 DocumentTitleMatchClassifier (filter.go:130-267) ----------------------

_TITLE_SEP_PATTERNS = [
    re.compile(p)
    for p in (
        "[ ]*[\\|»|-][ ]*",
        "[ ]*[\\|»|:][ ]*",
        "[ ]*[\\|»|:\\(\\)][ ]*",
        "[ ]*[\\|»|:\\(\\)\\-][ ]*",
        "[ ]*[\\|»|,|:\\(\\)\\-][ ]*",
        "[ ]*[\\|»|,|:\\(\\)\\- ][ ]*",
    )
]
# Go source "[\b ]+": \b in a Go string literal is the backspace character.
_RE_WORD_SPLIT = re.compile("[\x08 ]+")
_RE_TITLE_PUNCT = re.compile("[\\?\\!\\.\\-\\:]+")
_RE_REMOVE_TRAIL = re.compile(" - [^\\-]+$")
_RE_REMOVE_LEAD = re.compile("^[^\\-]+ - ")


def _get_longest_part(title: str, pattern) -> str:
    parts = pattern.split(title)
    if len(parts) == 1:
        return ""
    longest_num_words = 0
    longest_part = ""
    for p in parts:
        if ".com" in p:
            continue
        num_words = len(_RE_WORD_SPLIT.split(p))
        if num_words > longest_num_words or len(p) > len(longest_part):
            longest_num_words = num_words
            longest_part = p
    if not longest_part:
        return ""
    return go_trim_space(longest_part)


def _add_potential_titles(potential, title: str, min_words: int):
    # filter.go:223-239 — split on single spaces leaves no multi-word parts,
    # so in practice nothing is ever added; kept for parity.
    parts = title.split(" ")
    if len(parts) == 1:
        return
    for p in parts:
        if ".com" in p:
            continue
        if len(_RE_WORD_SPLIT.split(p)) >= min_words:
            potential.add(p)


def _remove_first(s: str, pattern) -> str:
    m = pattern.search(s)
    if m is None:
        return s
    return s.replace(m.group(0), "", 1)


# Go strings.ToLower applies SIMPLE per-rune case mappings; Python
# str.lower() applies the full SpecialCasing rules. The two unconditional
# divergences (VERDICT r1 missing-item 3): U+0130 \u0130 -> Python 'i' +
# combining dot vs Go plain 'i', and Final_Sigma (Python lowers word-final
# \u03a3 to \u03c2, Go always to \u03c3). Pre-translating both makes
# .lower() reproduce Go exactly.
_GO_LOWER_FIX = str.maketrans({"\u0130": "i", "\u03a3": "\u03c3"})


def go_to_lower(s: str) -> str:
    """Go strings.ToLower (filter.go:76, filter.go:168 call sites)."""
    if s.isascii():
        return s.lower()
    if "İ" in s or "Σ" in s:
        s = s.translate(_GO_LOWER_FIX)
    return s.lower()


def _normalize_title_text(text: str) -> str:
    if "\xa0" in text:
        text = text.replace("\xa0", " ")
    if "'" in text:
        text = text.replace("'", "")
    return go_to_lower(go_trim_space(text))


def document_title_match_classifier(doc) -> bool:
    if not doc.title:
        return False
    title = _normalize_title_text(doc.title)
    if not title:
        return False

    potential = {title}
    for pat in _TITLE_SEP_PATTERNS:
        pot = _get_longest_part(title, pat)
        if pot:
            potential.add(pot)
    _add_potential_titles(potential, title, 4)
    potential.add(_remove_first(title, _RE_REMOVE_TRAIL))
    potential.add(_remove_first(title, _RE_REMOVE_LEAD))

    for tb in doc.text_blocks:
        text = _normalize_title_text(tb.text)
        if text in potential:
            tb.add_labels((TITLE,))
            return True
        text = go_trim_space(_RE_TITLE_PUNCT.sub("", text))
        if text in potential:
            tb.add_labels((TITLE,))
            return True
    return False


# -- F3 NumWordsRulesClassifier (filter.go:682-758) ---------------------------

def _classify(prev, curr, nxt) -> bool:
    if curr.link_density() <= 0.333333:
        if prev.link_density() <= 0.555556:
            if curr.num_words <= 16:
                if nxt.num_words <= 15:
                    is_content = prev.num_words > 4
                else:
                    is_content = True
            else:
                is_content = True
        else:
            if curr.num_words <= 40:
                is_content = nxt.num_words > 17
            else:
                is_content = True
    else:
        is_content = False
    curr.is_content = is_content
    return is_content


def num_words_rules_classifier(doc) -> bool:
    blocks = doc.text_blocks
    if not blocks:
        return False
    has_changed = False
    prev = EMPTY_START
    curr = blocks[0]
    nxt = blocks[1] if len(blocks) >= 2 else EMPTY_START
    has_changed = _classify(prev, curr, nxt) or has_changed
    if nxt is not EMPTY_START:
        for i in range(2, len(blocks)):
            prev, curr, nxt = curr, nxt, blocks[i]
            has_changed = _classify(prev, curr, nxt) or has_changed
        prev, curr, nxt = curr, nxt, EMPTY_END
        has_changed = _classify(prev, curr, nxt) or has_changed
    return has_changed


# -- F4 IgnoreBlocksAfterContent (filter.go:647-680) --------------------------

def _get_num_full_text_words(tb) -> int:
    # filter.go:760-768 (minTextDensity = 9)
    if tb.text_density() >= 9.0:
        return tb.num_words
    return 0


def ignore_blocks_after_content(doc, min_num_words: int = 60) -> bool:
    has_changed = False
    num_words = 0
    found_end_of_text = False
    for tb in doc.text_blocks:
        eot = tb.has_label(INDICATES_END_OF_TEXT)
        if tb.is_content:
            num_words += _get_num_full_text_words(tb)
        if eot and num_words >= min_num_words:
            found_end_of_text = True
        if found_end_of_text:
            has_changed = True
            tb.is_content = False
    return has_changed


# -- F5 TrailingHeadlineToBoilerplate (filter.go:269-292) ---------------------

def trailing_headline_to_boilerplate(doc) -> bool:
    has_changed = False
    for tb in reversed(doc.text_blocks):
        if tb.is_content:
            if tb.has_label(HEADING):
                tb.is_content = False
                has_changed = True
            else:
                break
    return has_changed


# -- F6/F8 BlockProximityFusion (filter.go:294-392) ---------------------------

def block_proximity_fusion(doc, max_blocks_distance: int, content_only: bool,
                           same_tag_level_only: bool) -> bool:
    blocks = doc.text_blocks
    if len(blocks) < 2:
        return False
    has_changed = False

    prev_block = None
    start_block = 0
    if content_only:
        for tb in blocks:
            start_block += 1
            if tb.is_content:
                prev_block = tb
                break
        if prev_block is None:
            return False
    else:
        prev_block = blocks[0]
        start_block = 1

    i = start_block
    while i < len(blocks):
        tb = blocks[i]
        if not tb.is_content:
            prev_block = tb
            i += 1
            continue
        # Go-port quirk: the current block's *own* offsets (filter.go:362)
        diff_blocks = tb.offset_blocks_start - tb.offset_blocks_end - 1
        if diff_blocks <= max_blocks_distance:
            merge = True
            if content_only and (not prev_block.is_content or not tb.is_content):
                merge = False
            if merge and same_tag_level_only and prev_block.tag_level != tb.tag_level:
                merge = False
            if merge:
                prev_block.merge_next(tb)
                del blocks[i]
                has_changed = True
                continue  # i stays (Go: i-- then i++)
            prev_block = tb
        else:
            prev_block = tb
        i += 1
    return has_changed


# -- F7 BoilerplateBlock (filter.go:394-414) ----------------------------------

def boilerplate_block(doc) -> bool:
    blocks = doc.text_blocks
    n0 = len(blocks)
    doc.text_blocks = [
        tb for tb in blocks if tb.is_content or tb.has_label(TITLE)
    ]
    return len(doc.text_blocks) != n0


# -- F9 KeepLargestBlocks (filter.go:416-519) ---------------------------------

EXPAND_TO_SAME_TAG_LEVEL_MINIMUM_WORDS = 150


def _is_largest_block(max_num_words: int, tb) -> bool:
    if max_num_words >= 1000:
        min_word_percent = 0.25
    elif max_num_words >= 500:
        min_word_percent = 0.6
    else:
        return tb.is_content and tb.num_words == max_num_words
    return tb.is_content and tb.num_words >= int(min_word_percent * max_num_words)


def keep_largest_blocks(doc, expand_to_same_level_text: bool = True,
                        min_words: int = EXPAND_TO_SAME_TAG_LEVEL_MINIMUM_WORDS) -> bool:
    blocks = doc.text_blocks
    if len(blocks) < 2:
        return False

    max_num_words = -1
    largest_block = None
    level = -1
    n = -1
    for j, tb in enumerate(blocks):
        if tb.is_content:
            nw = tb.num_words
            if nw > max_num_words:
                largest_block = tb
                max_num_words = nw
                n = j
                if expand_to_same_level_text:
                    level = tb.tag_level

    for tb in blocks:
        if tb is largest_block:
            tb.is_content = True
            tb.add_labels((VERY_LIKELY_CONTENT,))
        else:
            tb.is_content = _is_largest_block(max_num_words, tb)
            tb.add_labels((MIGHT_BE_CONTENT,))

    if expand_to_same_level_text and n != -1:
        for tb in reversed(blocks):
            tl = tb.tag_level
            if tl < level:
                break
            if tl == level and tb.num_words >= min_words:
                tb.is_content = True
        for tb in blocks:
            tl = tb.tag_level
            if tl < level:
                break
            if tl == level and tb.num_words >= min_words:
                tb.is_content = True

    return True


# -- F10 ExpandTitleToContent (filter.go:567-608) -----------------------------

def expand_title_to_content(doc) -> bool:
    title = -1
    content_start = -1
    for j, tb in enumerate(doc.text_blocks):
        if content_start == -1 and tb.has_label(TITLE):
            title = j
        if content_start == -1 and tb.is_content:
            content_start = j
    if content_start <= title or title == -1:
        return False

    has_changed = False
    # Go-port quirk (filter.go:598-599): iterates a *prefix* of the doc.
    for i in range(content_start - title):
        tb = doc.text_blocks[i]
        if tb.has_label(MIGHT_BE_CONTENT):
            has_changed = (not tb.is_content) or has_changed
            tb.is_content = True
    return has_changed


# -- F11 LargeBlockSameTagLevelToContent (filter.go:610-645) ------------------

def large_block_same_tag_level_to_content(doc) -> bool:
    has_changed = False
    tag_level = -1
    for tb in doc.text_blocks:
        if tb.is_content and tb.has_label(VERY_LIKELY_CONTENT):
            tag_level = tb.tag_level
            break
    if tag_level == -1:
        return False
    for tb in doc.text_blocks:
        if not tb.is_content:
            if tb.num_words >= 100 and tb.tag_level == tag_level:
                tb.is_content = True
                has_changed = True
    return has_changed


# -- F12 ListAtEnd (filter.go:770-798) ----------------------------------------

def list_at_end(doc) -> bool:
    has_changed = False
    tag_level = MAX_INT32
    for tb in doc.text_blocks:
        if tb.is_content and tb.has_label(VERY_LIKELY_CONTENT):
            tag_level = tb.tag_level
        else:
            if (
                tb.tag_level > tag_level
                and tb.has_label(MIGHT_BE_CONTENT)
                and tb.has_label(LIST)
                and tb.link_density() == 0.0
            ):
                tb.is_content = True
                has_changed = True
            else:
                tag_level = MAX_INT32
    return has_changed


# -- F13 KeepLargestFulltextBlock (filter.go:521-565; not in ArticlePipeline) --

def keep_largest_fulltext_block(doc) -> bool:
    blocks = doc.text_blocks
    if len(blocks) < 2:
        return False
    mx = -1
    largest_block = None
    for tb in blocks:
        if not tb.is_content:
            continue
        num_words = _get_num_full_text_words(tb)
        if num_words > mx:
            largest_block = tb
            mx = num_words
    if largest_block is None:
        return False
    for tb in blocks:
        if tb is largest_block:
            tb.is_content = True
        else:
            tb.is_content = False
            tb.add_labels((MIGHT_BE_CONTENT,))
    return True


# -- the Article pipeline (filter.go:30-46) -----------------------------------

def article_pipeline(doc) -> bool:
    """Run all 12 filters unconditionally in order, OR-ing hasChanged
    (filter.go:23-28: no short-circuiting)."""
    has_changed = False
    has_changed = terminating_blocks(doc) or has_changed
    has_changed = document_title_match_classifier(doc) or has_changed
    has_changed = num_words_rules_classifier(doc) or has_changed
    has_changed = ignore_blocks_after_content(doc) or has_changed
    has_changed = trailing_headline_to_boilerplate(doc) or has_changed
    has_changed = block_proximity_fusion(doc, 1, False, False) or has_changed
    has_changed = boilerplate_block(doc) or has_changed
    has_changed = block_proximity_fusion(doc, 1, True, True) or has_changed
    has_changed = keep_largest_blocks(doc) or has_changed
    has_changed = expand_title_to_content(doc) or has_changed
    has_changed = large_block_same_tag_level_to_content(doc) or has_changed
    has_changed = list_at_end(doc) or has_changed
    return has_changed


ARTICLE_FILTERS = (
    ("TerminatingBlocks", terminating_blocks),
    ("DocumentTitleMatchClassifier", document_title_match_classifier),
    ("NumWordsRulesClassifier", num_words_rules_classifier),
    ("IgnoreBlocksAfterContent", ignore_blocks_after_content),
    ("TrailingHeadlineToBoilerplate", trailing_headline_to_boilerplate),
    ("BlockProximityFusionMaxDistanceOne",
     lambda doc: block_proximity_fusion(doc, 1, False, False)),
    ("BoilerplateBlock", boilerplate_block),
    ("BlockProximityFusionMaxDistanceOneContentOnlySameTagLevel",
     lambda doc: block_proximity_fusion(doc, 1, True, True)),
    ("KeepLargestBlocks", keep_largest_blocks),
    ("ExpandTitleToContent", expand_title_to_content),
    ("LargeBlockSameTagLevelToContent", large_block_same_tag_level_to_content),
    ("ListAtEnd", list_at_end),
)
