"""TextBlock: the atomic unit of the boilerpipe data model.

Replicates the semantics of /root/reference/textblock.go: label counting
(textblock.go:105-114), MergeNext (textblock.go:131-166, including min
TagLevel), LinkDensity/TextDensity (textblock.go:168-177) and the empty
sentinel blocks used by the classifier window (textblock.go:84-97).
"""

from __future__ import annotations

MIN_INT32 = -(2**31)
MAX_INT32 = 2**31 - 1

# Label enum — textblock.go:11-21
INDICATES_END_OF_TEXT = 0
MIGHT_BE_CONTENT = 1
VERY_LIKELY_CONTENT = 2
TITLE = 3
LIST = 4
HEADING = 5
HEADING1 = 6
HEADING2 = 7
HEADING3 = 8

# Label.String() names (generated stringer table, label_string.go:7-16);
# out-of-range values render as "Label(n)" like the Go fallback.
_LABEL_NAMES = (
    "LabelIndicatesEndOfText", "LabelMightBeContent",
    "LabelVeryLikelyContent", "LabelTitle", "LabelList", "LabelHeading",
    "LabelHeading1", "LabelHeading2", "LabelHeading3",
)


def label_name(label: int) -> str:
    if 0 <= label < len(_LABEL_NAMES):
        return _LABEL_NAMES[label]
    return f"Label({label})"


class TextBlock:
    __slots__ = (
        "text",
        "offset_blocks_start",
        "offset_blocks_end",
        "num_words",
        "num_linked_words",
        "num_words_in_wrapped_lines",
        "num_wrapped_lines",
        "tag_level",
        "is_content",
        "label_map",
    )

    def __init__(self):
        self.text = ""
        self.offset_blocks_start = 0
        self.offset_blocks_end = 0
        self.num_words = 0
        self.num_linked_words = 0
        self.num_words_in_wrapped_lines = 0
        self.num_wrapped_lines = 0
        self.tag_level = 0
        self.is_content = False
        self.label_map = {}

    def add_labels(self, labels):
        for label in labels:
            self.label_map[label] = self.label_map.get(label, 0) + 1

    def has_label(self, label) -> bool:
        return label in self.label_map

    def merge_next(self, nxt: "TextBlock"):
        # textblock.go:131-166
        self.text = self.text + "\n" + nxt.text
        self.offset_blocks_start = min(
            self.offset_blocks_start, nxt.offset_blocks_start
        )
        self.offset_blocks_end = max(self.offset_blocks_end, nxt.offset_blocks_end)
        self.num_words += nxt.num_words
        self.num_linked_words += nxt.num_linked_words
        self.num_words_in_wrapped_lines += nxt.num_words_in_wrapped_lines
        self.num_wrapped_lines += nxt.num_wrapped_lines
        self.is_content = self.is_content or nxt.is_content
        for label, count in nxt.label_map.items():
            self.label_map[label] = self.label_map.get(label, 0) + count
        self.tag_level = min(self.tag_level, nxt.tag_level)

    def link_density(self) -> float:
        if self.num_words == 0:
            return 0.0
        return self.num_linked_words / self.num_words

    def text_density(self) -> float:
        return self.num_words_in_wrapped_lines / self.num_wrapped_lines


def _empty(offset):
    tb = TextBlock()
    tb.offset_blocks_start = offset
    tb.offset_blocks_end = offset
    return tb


EMPTY_START = _empty(MIN_INT32)
EMPTY_END = _empty(MAX_INT32)
