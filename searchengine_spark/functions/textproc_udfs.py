"""Arrow-vectorized UDF wrappers around the quirk-faithful tokenizer.

These are the ONLY Python crossings on the index-build hot path (SURVEY.md
§2.9). Everything arrives/leaves as Arrow batches via ``mapInPandas``; the
regex passes are pandas ``.str`` vectorized, the Porter stemmer is a cached
dict map (amortized per unique token — text columns are highly repetitive).

Per-row semantics are defined by ``functions/textproc.py`` — the exact same
Python functions the pure-Python oracle uses, so fixture equality is by
construction and any divergence is a Spark-plumbing bug, not a tokenizer one.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from searchengine_spark.functions.textproc import index_tokenize

_HEADING = re.compile(r"(?m)^(#{1,3})\s*(.*)$")

POSTINGS_SCHEMA = (
    "doc_id long, term string, tf int, positions array<int>, doc_len long, "
    "term_h1 boolean, term_h2 boolean, term_h3 boolean"
)


def _heading_lines(content: str) -> tuple[list[str], list[str], list[str]]:
    """Markdown heading text per level — the corpus analog of the page's
    h1/h2/h3 elements (Indexer.java:216-219)."""
    h: tuple[list[str], list[str], list[str]] = ([], [], [])
    for m in _HEADING.finditer(content):
        h[len(m.group(1)) - 1].append(m.group(2).lower())
    return h


def emit_postings(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (doc_id, content) batches → one row per (doc, term).

    tf / positions / doc_len follow computeTFWithPositions exactly (quirks
    Q1/Q2/Q4/Q15); term_h{1,2,3} is the reference's per-term header flag —
    the *stemmed* term substring-matched against raw lowercased heading text
    (Indexer.java:257-270, quirk in SURVEY.md T5).
    """
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "term": [], "tf": [], "positions": [], "doc_len": [],
            "term_h1": [], "term_h2": [], "term_h3": [],
        }
        for doc_id, content in zip(pdf["doc_id"].values, pdf["content"].values):
            tf, positions, total = index_tokenize(content)
            if not tf:
                continue
            h1, h2, h3 = _heading_lines(content)
            for term, freq in tf.items():
                out["doc_id"].append(doc_id)
                out["term"].append(term)
                out["tf"].append(freq)
                out["positions"].append(positions[term])
                out["doc_len"].append(total)
                out["term_h1"].append(any(term in t for t in h1))
                out["term_h2"].append(any(term in t for t in h2))
                out["term_h3"].append(any(term in t for t in h3))
        yield pd.DataFrame(out)


DOCMETA_SCHEMA = "doc_id long, doc_len long, h1 boolean, h2 boolean, h3 boolean"


def emit_docmeta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-doc totalTerms + page-level heading-presence flags
    (Indexer.java:216-219)."""
    for pdf in batches:
        rows = []
        for doc_id, content in zip(pdf["doc_id"].values, pdf["content"].values):
            _, _, total = index_tokenize(content)
            h1, h2, h3 = _heading_lines(content)
            rows.append((doc_id, total, bool(h1), bool(h2), bool(h3)))
        yield pd.DataFrame(rows, columns=["doc_id", "doc_len", "h1", "h2", "h3"])
