"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Generates the Iceberg-shaped corpus table `(repo, path, commit, lang,
content)` — the analog of the reference's crawled ``VisitedPages``
(DBController.java:197-206) — with seeded content that exercises every quirk
path: Zipf-skewed hot terms (stopword-skew trigger), stemmer-quirk words,
stopwords, short tokens, punctuation, planted phrases (including one spanning
a 60-word snippet window), markdown headings, import lines (edges graph), and
~2% exact duplicates (fingerprint dedup path).

Pure-Python + numpy; no external data; same rows for any parallelism level.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.schemas import CORPUS

_LANG_EXT = {"python": "py", "java": "java", "js": "js", "md": "md", "txt": "txt"}
_LANGS = list(_LANG_EXT)

# Zipf-ish vocabulary: first few are the hot "code stopwords" driving skew
_HOT = ["return", "import", "def", "class", "self"]
_VOCAB = _HOT + [
    "index", "search", "engine", "query", "token", "parser", "lexer", "builder",
    "tested", "testing", "ponies", "caresses", "meetings", "umm", "kulthum",
    "relational", "conditional", "rational", "valenci", "hesitanci", "digitizer",
    "operator", "spark", "shuffle", "partition", "broadcast", "segment", "varint",
    "posting", "ranker", "snippet", "crawler", "frontier", "graph", "pagerank",
    "compression", "block", "skip", "pointer", "heap", "merge", "inverted",
    "the", "is", "in", "at", "of", "on", "and", "a", "to", "an", "by", "for",
    "with", "it", "as",  # stopwords (TextProcessor.java:6-8)
    "io", "os", "db", "x", "y",  # short tokens (len<=2 skip path)
]
_PUNCT_WORDS = ["foo();", "bar[3],", "baz{x}!", "qux.y:", "a+b=c?", "don't"]
_PHRASE = ["inverted", "index", "build"]


def _zipf_choice(rng: random.Random, vocab: list[str]) -> str:
    # Zipf-skewed rank sampling: p(rank r) ∝ 1/(r+1)
    n = len(vocab)
    weights = [1.0 / (r + 1.0) for r in range(n)]
    return rng.choices(vocab, weights=weights, k=1)[0]


def generate_corpus_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        lang = _LANGS[i % len(_LANGS)]
        ext = _LANG_EXT[lang]
        if i % 17 == 0:
            path = f"README.md" if i % 34 == 0 else f"docs/guide{i}.md"
            lang = "md"
        else:
            path = f"src/pkg{i % 11}/mod{i}.{ext}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()

        n_tokens = 30 + rng.randrange(120)
        words = [_zipf_choice(rng, _VOCAB) for _ in range(n_tokens)]
        # sprinkle punctuation-bearing words
        for _ in range(rng.randrange(4)):
            words.insert(rng.randrange(len(words)), rng.choice(_PUNCT_WORDS))
        # plant the exact phrase in ~10% of docs
        if i % 10 == 3:
            pos = rng.randrange(len(words))
            words[pos:pos] = _PHRASE
        # one doc per 50 gets the phrase straddling a 60-word snippet boundary
        if i % 50 == 7 and len(words) > 70:
            words[58:61] = _PHRASE
        content_lines = []
        if lang == "md":
            content_lines.append(f"# heading one {rng.choice(_VOCAB)}")
            if i % 2 == 0:
                content_lines.append(f"## heading two {rng.choice(_VOCAB)}")
            if i % 3 == 0:
                content_lines.append(f"### heading three {rng.choice(_VOCAB)}")
        # deterministic import lines -> edges graph (Indexer.java:86-103 analog)
        for k in (31, 17):
            tgt = (i * k + 7) % n_docs
            content_lines.append(f"import pkg{tgt % 11}.mod{tgt}")
        content_lines.append(" ".join(words))
        content = "\n".join(content_lines)
        rows.append((repo, path, commit, lang, content))

    # ~2% exact duplicate contents (dedup/fingerprint path, Crawler.java:71-78)
    n_dups = max(1, n_docs // 50)
    for d in range(n_dups):
        src = rows[(d * 13) % n_docs]
        repo = f"org{(d + 3) % 7}/repo{(d + 5) % 23}"
        path = f"src/dup/copy{d}.{_LANG_EXT.get(src[3], 'txt')}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        rows.append((repo, path, commit, src[3], src[4]))

    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_corpus(spark: SparkSession, n_docs: int, seed: int = 42, n_partitions: int | None = None) -> DataFrame:
    pdf = generate_corpus_pdf(n_docs, seed)
    df = spark.createDataFrame(pdf, schema=CORPUS)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def generate_corpus_fast(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Vectorized (numpy) corpus generator for benchmark scales (10^4-10^6
    docs). Same schema and flavor as ``generate_corpus_pdf`` (Zipf vocab,
    import lines, ~2% dups) but not row-identical to it — bench only; the
    oracle-checked tests use the reference generator above."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vocab = np.array(_VOCAB)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    lens = 30 + rng.integers(0, 120, size=n_docs)
    total = int(lens.sum())
    flat = rng.choice(vocab, size=total, p=probs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    langs = [_LANGS[i % len(_LANGS)] for i in range(n_docs)]
    rows = []
    for i in range(n_docs):
        body = " ".join(flat[offsets[i] : offsets[i + 1]])
        lang = langs[i]
        ext = _LANG_EXT[lang]
        path = f"src/pkg{i % 11}/mod{i}.{ext}"
        repo = f"org{i % 7}/repo{i % 23}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        t1 = (i * 31 + 7) % n_docs
        t2 = (i * 17 + 3) % n_docs
        content = f"import pkg{t1 % 11}.mod{t1}\nimport pkg{t2 % 11}.mod{t2}\n{body}"
        rows.append((repo, path, commit, lang, content))
    n_dups = max(1, n_docs // 50)
    for d in range(n_dups):
        src = rows[(d * 13) % n_docs]
        repo = f"org{(d + 3) % 7}/repo{(d + 5) % 23}"
        path = f"src/dup/copy{d}.txt"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        rows.append((repo, path, commit, src[3], src[4]))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_zipf_docs_pdf(
    n_docs: int, vocab_size: int = 100_000, seed: int = 7, s: float = 1.05
) -> pd.DataFrame:
    """Documents-table-shaped corpus with a REALISTIC vocabulary: ~10^5
    distinct terms drawn Zipf(s) — the input the serving tiers are designed
    for (VERDICT r04 ask #3: the driver corpus has ~31 distinct terms, so
    term-level machinery — block-max WAND skipping, champion lists, trigram
    pruning, front-coded dictionaries — is otherwise measured on degenerate
    input and Heaps' law pins β=0).

    Terms are ``t<rank:05d>`` (6 chars: alphanumeric, above the short-token
    skip length, fixed width so a term is never a substring of another term
    mid-token — clean trigram-pruning semantics). Vectorized numpy; seeded;
    same rows at any parallelism. Columns match /root/testdata documents:
    (doc_id, text, lang, source, n_chars)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks**-s
    probs /= probs.sum()
    lens = 80 + rng.integers(0, 80, size=n_docs)
    total = int(lens.sum())
    draw = rng.choice(vocab_size, size=total, p=probs)
    words = np.char.add("t", np.char.zfill(draw.astype("U5"), 5))
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    texts = [
        " ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n_docs)
    ]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n_docs,
            "source": ["zipf"] * n_docs,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
