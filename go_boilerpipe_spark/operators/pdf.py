"""PDF/layout extraction plumbing (north-rule "PDF/layout parse" seam).

Same design as operators/multimodal.py: the payload is an opaque
``binary`` column; the per-document parse runs in one Arrow-batched
``mapInPandas`` stage (schema, batch shape, null handling, error capture
are real and tested); the *parser* itself is a deterministic fake (STUB)
because PDF libraries (pypdf/pdfminer/poppler) are not in this runtime.
Swap ``_fake_parse_pdf`` for a real parser without touching the plan —
the operator contract (never fail the task on one document; one Python
stage; pruned inputs) is the part that matters at 10^12 documents.

The fake derives page count and per-page text deterministically from the
payload hash, so the DuckDB oracle can value-check the plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

PDF_SCHEMA = (
    "doc_id long, n_pages int, n_chars int, text string, parse_error string"
)

_REAL_PDF_PARSER_AVAILABLE = False  # pypdf / pdfminer absent here


def _fake_parse_pdf(payload: bytes):
    """STUB parser: n_pages = 1 + h16(0:4) % 32; page p's text is
    'page <p> <md5[:8]>' — deterministic and SQL-reproducible."""
    h = hashlib.md5(payload).hexdigest()
    n_pages = 1 + int(h[0:4], 16) % 32
    text = "\n".join(f"page {p} {h[:8]}" for p in range(n_pages))
    return n_pages, text


def parse_pdf_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) → PDF_SCHEMA rows."""
    if _REAL_PDF_PARSER_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real PDF parser not wired in this runtime")
    for pdf in batches:
        out = {"doc_id": [], "n_pages": [], "n_chars": [], "text": [],
               "parse_error": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_pages = 0
            text = None
            err = None
            if payload is None:
                err = "payload is null"
            else:
                try:
                    n_pages, text = _fake_parse_pdf(bytes(payload))
                except Exception as e:  # never fail the task on one doc
                    err = f"{type(e).__name__}: {e}"
            out["doc_id"].append(doc_id)
            out["n_pages"].append(n_pages)
            out["n_chars"].append(len(text) if text is not None else 0)
            out["text"].append(text)
            out["parse_error"].append(err)
        yield pd.DataFrame(out)


def parse_pdfs(df):
    """Declare PDF parsing over a (doc_id, payload binary) DataFrame;
    inputs pruned so column pruning reaches the scan."""
    return df.select("doc_id", "payload").mapInPandas(
        parse_pdf_batches, PDF_SCHEMA
    )
