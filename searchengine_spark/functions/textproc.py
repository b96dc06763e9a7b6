"""Reference-faithful text processing (the rank-identity crux).

Two distinct tokenizer modes, mirroring the reference's index/query mismatch
(quirk Q2, SURVEY.md §4.3):

- **index mode** (TextProcessor.normalize → Indexer.computeTFWithPositions):
  lowercase → strip ``[^a-z\\s]`` → split ``\\s+`` → drop 15 stopwords and
  len≤2 → crude stem (``-ing``/``-ed`` chop **3** chars, quirk Q1) → join;
  then re-split, and for tokens len>2: Porter stem, count tf, record the
  position ``i`` over the *entire* split array (skipped tokens consume
  positions, quirk Q4); ``totalTerms`` counts kept tokens only (quirk Q15).

- **query mode** (SearchService.handleTermSearch): lowercase → split
  ``[\\s\\-_.!@#'\"]+`` → Porter stem each → drop empties. No stopword strip,
  no crude stem.

All of this is exposed both as plain Python (shared with tests/oracle.py —
one code path, fixture equality by construction) and as vectorized pandas
UDF wrappers (functions/textproc_udfs.py).
"""

from __future__ import annotations

import re

from searchengine_spark.functions.porter import porter_stem

# TextProcessor.java:6-8
STOPWORDS = frozenset(
    ["the", "is", "in", "at", "of", "on", "and", "a", "to", "an", "by", "for", "with", "it", "as"]
)

_NON_ALPHA = re.compile(r"[^a-z\s]")
_WS = re.compile(r"\s+")
# SearchService.java:465
_QUERY_SPLIT = re.compile(r"[\s\-_.!@#'\"]+")
# SearchService.java:75 — broken on purpose (quirk Q3): separator chars must be
# followed by literal '"' then "'" for a split to occur, so Query_Words is
# almost always [whole lowercased query]
_QUERY_WORDS_SPLIT = re.compile(r"[\s\-_.!@#]+\"\'")


def crude_stem(word: str) -> str:
    """TextProcessor.stem (quirk Q1): ``-ing`` OR ``-ed`` → chop 3 chars."""
    if word.endswith("ing") or word.endswith("ed"):
        return word[: len(word) - 3]
    return word


def normalize_text(text: str) -> str:
    """TextProcessor.normalize: the index-side normalizer."""
    text = _NON_ALPHA.sub("", text.lower())
    out = []
    for word in _WS.split(text):
        if word not in STOPWORDS and len(word) > 2:
            out.append(crude_stem(word))
    return " ".join(out).strip()


def index_tokenize(text: str) -> tuple[dict[str, int], dict[str, list[int]], int]:
    """computeTFWithPositions over normalize(text).

    Returns (tf_map, positions_map, total_terms). Positions index the raw
    ``\\s+`` split of the normalized text (quirk Q4); totalTerms counts only
    kept tokens (quirk Q15).
    """
    normalized = normalize_text(text)
    tf: dict[str, int] = {}
    positions: dict[str, list[int]] = {}
    total = 0
    if normalized:
        words = _WS.split(normalized)
        for i, word in enumerate(words):
            if len(word) > 2:
                stemmed = porter_stem(word)
                tf[stemmed] = tf.get(stemmed, 0) + 1
                positions.setdefault(stemmed, []).append(i)
                total += 1
    return tf, positions, total


def query_tokenize(query: str) -> list[str]:
    """handleTermSearch tokenization: Porter only, no stopword/crude stem."""
    out = []
    for term in _QUERY_SPLIT.split(query.lower()):
        stemmed = porter_stem(term)
        if stemmed:
            out.append(stemmed)
    return out


def query_words(query: str) -> list[str]:
    """The reference's Query_Words list for title matching (quirk Q3 —
    broken split regex reproduced verbatim)."""
    return _QUERY_WORDS_SPLIT.split(query.lower())


def snippet_windows(term: str, raw_text: str, snippet_length: int = 60) -> list[str]:
    """getCenteredTermSnippets (Indexer.java:354-394, quirk Q5): split raw
    (punctuated) text on ``\\s+``, Porter-stem each lowercased word (no crude
    stem!), 60-word window centered on each occurrence, ``<b>`` bolding by
    re-stemming window words, ellipses when clipped."""
    snippets: list[str] = []
    if not raw_text or not term:
        return snippets
    words = _WS.split(raw_text)
    for i, w in enumerate(words):
        if porter_stem(w.lower()) == term:
            half = snippet_length // 2
            start = max(0, i - half)
            end = min(len(words), start + snippet_length)
            if end - start < snippet_length:
                start = max(0, end - snippet_length)
            parts = []
            for j in range(start, end):
                cur = words[j]
                if porter_stem(cur.lower()) == term:
                    parts.append(f"<b>{cur}</b> ")
                else:
                    parts.append(cur + " ")
            snippet = "".join(parts)
            if start > 0:
                snippet = "... " + snippet
            if end < len(words):
                snippet = snippet + "..."
            snippets.append(snippet.strip())
    return snippets


def find_exact_sentence(sentence: str, text: str) -> int:
    """Boundary-delimited exact phrase locator
    (SearchService.findExactSentence, :487-530)."""
    sentence = sentence.strip()
    sl, tl = len(sentence), len(text)
    if sl == 0:
        return 0 if tl == 0 else -1
    boundary = set(" \t\n\r\x0b\x0c.!?,;:()[]{}")

    def is_boundary(c: str) -> bool:
        return c.isspace() or c in boundary

    index = 0
    while index < tl:
        index = text.find(sentence, index)
        if index == -1:
            break
        valid_start = index == 0 or is_boundary(text[index - 1])
        valid_end = index + sl == tl or is_boundary(text[index + sl])
        if valid_start and valid_end:
            return index
        index += 1
    return -1
