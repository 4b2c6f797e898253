"""Outlink extraction: (href, resolved_url, anchor_text) per page.

The web-scale companion to article extraction — the link graph feeds
crawl-frontier scheduling and host-authority ranking (operators/graph.py
pagerank). Runs the same x/net/html-semantics tokenizer as the article
kernel (kernel/htmltok.py) so malformed markup, raw-text elements, and
entity unescaping behave identically to the parse the reference's loop
performs (reference: boilerpipe.go:108-158 drives the same tokenizer;
link capture itself is NEW functionality the reference does not have —
there is nothing to be byte-identical to, so the contract here is the
tokenizer's, plus WHATWG base-href resolution via urllib).

Pure Python by design: this is not the byte-parity hot path, and the
operator layer (operators/links.py) Arrow-batches it so the per-row cost
is a tokenizer scan, not IPC.
"""

from __future__ import annotations

from urllib.parse import urljoin

from . import htmltok

# The boilerpipe ignorable set (kernel/handler.py TAG_ACTION_MAP
# _IGNORABLE entries): no anchor text and no links are collected inside.
_IGNORABLE = frozenset(
    ("applet", "figcaption", "figure", "noscript", "object", "option",
     "script", "style")
)

_ATTR_TAGS = frozenset(("a", "base"))


def _collapse_ws(s: str) -> str:
    return " ".join(s.split())


def page_links(html: str, page_url: str | None = None):
    """Return ``[(href, resolved, anchor_text), ...]`` in document order.

    - ``href``: the raw attribute value after entity unescape (first
      href attribute of each <a>, matching browser behavior for
      duplicate attributes).
    - ``resolved``: href joined against the first <base href> if
      present, else ``page_url`` (None when neither exists or the join
      fails).
    - ``anchor_text``: whitespace-collapsed text between the <a> and its
      close; a new <a> implicitly closes an open one (the HTML tree
      builder would, and the tokenizer alone does not); EOF flushes an
      open anchor.
    """
    z = htmltok.Tokenizer(html, attr_tags=_ATTR_TAGS)
    TEXT, START, END = htmltok.TEXT, htmltok.START_TAG, htmltok.END_TAG
    SELF = htmltok.SELF_CLOSING

    base = None
    links = []
    href = None          # open anchor's href (None = no open anchor)
    text_parts = []
    ignore_depth = 0

    def flush():
        nonlocal href, text_parts
        if href is not None:
            resolved = None
            root = base if base is not None else page_url
            try:
                resolved = urljoin(root, href) if root else None
            except ValueError:
                resolved = None
            links.append((href, resolved, _collapse_ws("".join(text_parts))))
        href = None
        text_parts = []

    for tt, data, attrs in z.iter_tokens():
        if tt == TEXT:
            if href is not None and not ignore_depth:
                text_parts.append(data)
        elif tt == START or tt == SELF:
            if data in _IGNORABLE:
                if tt == START:
                    ignore_depth += 1
                continue
            if ignore_depth:
                continue
            if data == "base" and base is None:
                for k, v in attrs:
                    if k == "href" and v:
                        base = v
                        break
            elif data == "a":
                flush()  # implicit close of a still-open anchor
                for k, v in attrs:
                    if k == "href":
                        href = v
                        break
                if tt == SELF:
                    flush()  # <a href=x/> emits an empty-anchor link
        elif tt == END:
            if data in _IGNORABLE:
                if ignore_depth:
                    ignore_depth -= 1
            elif data == "a" and not ignore_depth:
                flush()
    flush()  # EOF with an open anchor
    return links
