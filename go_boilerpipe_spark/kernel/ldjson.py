"""JSON-LD Article extraction replicating Go ``encoding/json`` semantics.

The reference unmarshals every captured ``application/ld+json`` script body
into the *same* struct (boilerpipe.go:48-55), which gives three behaviors the
goldens can encode:

1. field *merge*: keys absent from a later JSON leave earlier values;
2. *partial application on type errors*: Go's decoder saves the first error
   but keeps decoding the remaining fields (``decodeState.saveError``), so a
   script with one bad field still contributes its good fields — while the
   reference's ``continue`` skips only the ``@type == "Article"`` break;
3. syntax errors apply nothing (``json.Unmarshal`` runs ``checkValid`` before
   decoding).

``datePublished`` uses ``time.Time.UnmarshalJSON`` = strict RFC3339.
Field-name matching is case-insensitive (Go's fold matching).
"""

from __future__ import annotations

import json

from .rfc3339 import parse_rfc3339


class _Obj:
    """Marker wrapper distinguishing JSON objects from arrays; keeps the
    key order + duplicates that Go's sequential decoding sees."""

    __slots__ = ("pairs",)

    def __init__(self, pairs):
        self.pairs = pairs


def _reject_constant(_):
    raise ValueError("Go encoding/json rejects NaN/Infinity")


def loads_go(s: str):
    """Parse with Go-compatible strictness; raises on what Go rejects."""
    return json.loads(s, object_pairs_hook=_Obj, parse_constant=_reject_constant)


class LinkedDataArticle:
    __slots__ = ("type", "headline", "date_published", "author_type",
                 "author_name", "body")

    def __init__(self):
        self.type = ""
        self.headline = ""
        self.date_published = None  # zero time.Time
        self.author_type = ""
        self.author_name = ""
        self.body = ""


_TOP_FIELDS = {
    "@type": "type",
    "headline": "headline",
    "datepublished": "date_published",
    "author": "author",
    "articlebody": "body",
}
_AUTHOR_FIELDS = {"@type": "author_type", "name": "author_name"}


def merge_linked_data(article: LinkedDataArticle, script_body: str) -> bool:
    """Merge one script body into ``article``; returns True iff Go's
    ``json.Unmarshal`` would have returned nil error."""
    try:
        root = loads_go(script_body)
    except Exception:
        return False
    if not isinstance(root, _Obj):
        return False  # array/scalar root: type error, nothing applied

    ok = True
    for key, val in root.pairs:
        field = _TOP_FIELDS.get(key if key in _TOP_FIELDS else key.lower())
        if field is None:
            continue  # unknown keys ignored
        if val is None:
            continue  # JSON null: no-op, no error
        if field == "date_published":
            if isinstance(val, str):
                t = parse_rfc3339(val)
                if t is None:
                    ok = False
                else:
                    article.date_published = t
            else:
                ok = False
        elif field == "author":
            if isinstance(val, _Obj):
                for k2, v2 in val.pairs:
                    f2 = _AUTHOR_FIELDS.get(k2 if k2 in _AUTHOR_FIELDS else k2.lower())
                    if f2 is None:
                        continue
                    if v2 is None:
                        continue
                    if isinstance(v2, str):
                        setattr(article, f2, v2)
                    else:
                        ok = False
            else:
                ok = False
        else:
            if isinstance(val, str):
                setattr(article, field, val)
            else:
                ok = False
    return ok
