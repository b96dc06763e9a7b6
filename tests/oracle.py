"""Pure-Python reference-faithful oracle (SURVEY.md §4.3).

Reimplements the reference pipeline imperatively — ingest/dedup → tokenize →
df/idf → PageRank → Ranker.score → result assembly — with every quirk
Q1-Q15, over the synthetic corpus DataFrame (pandas). The Spark engine in
compat mode must match its top-k (doc ids; scores to 1e-9); BM25 mode has
its own 20-line textbook scorer here.

Shares ONLY the token-level primitives with the engine
(searchengine_spark.functions.textproc) — those are pinned separately by
hand-written vectors in test_porter/test_tokenizer. Everything relational
(ids, df, idf, PR, scoring, assembly) is independently re-derived here in
plain dict/loop form, so an engine bug cannot self-confirm.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from searchengine_spark.functions.textproc import (
    find_exact_sentence,
    index_tokenize,
    query_tokenize,
    query_words,
    snippet_windows,
)

DAMPING = 0.85
MAX_ITER = 50
EPS = 1e-4

_HEADING = re.compile(r"(?m)^(#{1,3})\s*(.*)$")
_IMPORT = re.compile(r"import pkg\d+\.mod(\d+)")
_PATH_KEY = re.compile(r"mod(\d+)\.")


class OracleIndex:
    def __init__(self, corpus: pd.DataFrame):
        # ingest: url, fingerprint, dedup (url then fingerprint, min key wins)
        rows = []
        for r in corpus.itertuples(index=False):
            url = f"{r.repo}/{r.path}@{r.commit}"
            norm = re.sub(r"\s+", " ", r.content).strip().lower()
            fp = hashlib.md5(norm.encode()).hexdigest()
            rows.append((r.repo, r.path, r.commit, r.lang, r.content, url, fp))
        rows.sort(key=lambda x: (x[0], x[1], x[2]))
        # Crawler.java:56-78 semantics: URL marked visited at first encounter
        # (even if the page is then rejected as duplicate content);
        # fingerprint marked only for accepted pages.
        seen_url, seen_fp, kept = set(), set(), []
        for r in rows:
            if r[5] in seen_url:
                continue
            seen_url.add(r[5])
            if r[6] in seen_fp:
                continue
            seen_fp.add(r[6])
            kept.append(r)
        self.docs = {}  # doc_id -> dict
        for doc_id, r in enumerate(kept):
            repo, path, commit, lang, content, url, fp = r
            tf, positions, total = index_tokenize(content)
            h = ([], [], [])
            for m in _HEADING.finditer(content):
                h[len(m.group(1)) - 1].append(m.group(2).lower())
            self.docs[doc_id] = {
                "repo": repo, "path": path, "commit": commit, "url": url,
                "title": path.split("/")[-1], "content": content,
                "tf": tf, "positions": positions, "doc_len": total,
                "headings": h,
            }
        self.n_docs = len(self.docs)

        # postings + df/idf
        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, d in self.docs.items():
            for term, freq in d["tf"].items():
                self.postings.setdefault(term, {})[doc_id] = freq
        self.df = {t: len(p) for t, p in self.postings.items()}
        self.idf_compat = {t: math.log(self.n_docs / (1 + df)) for t, df in self.df.items()}
        self.idf_bm25 = {
            t: math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)) for t, df in self.df.items()
        }

        # edges (import lines → docs whose path has mod{I}.)
        key_to_doc = {}
        for doc_id, d in self.docs.items():
            m = _PATH_KEY.search(d["path"])
            if m:
                key_to_doc[m.group(1)] = doc_id
        self.out_links: dict[int, set[int]] = {i: set() for i in self.docs}
        for doc_id, d in self.docs.items():
            for m in _IMPORT.finditer(d["content"]):
                tgt = key_to_doc.get(m.group(1))
                if tgt is not None and tgt != doc_id:
                    self.out_links[doc_id].add(tgt)

        self.pagerank = self._pagerank()
        self.avgdl = (
            sum(d["doc_len"] for d in self.docs.values()) / self.n_docs if self.n_docs else 1.0
        )

    def _pagerank(self) -> dict[int, float]:
        n = self.n_docs
        if n == 0:
            return {}
        rev: dict[int, set[int]] = {i: set() for i in self.docs}
        for src, dsts in self.out_links.items():
            for dst in dsts:
                rev[dst].add(src)
        ranks = {i: 1.0 / n for i in self.docs}
        for _ in range(MAX_ITER):
            dangling = sum(r for i, r in ranks.items() if not self.out_links[i])
            dangling_factor = DAMPING * dangling / n
            new = {}
            for i in self.docs:
                s = 0.0
                for src in rev[i]:
                    od = len(self.out_links[src])
                    if od > 0:
                        s += ranks[src] / od
                new[i] = (1.0 - DAMPING) / n + DAMPING * s + dangling_factor
            converged = all(abs(new[i] - ranks[i]) <= EPS for i in self.docs)
            ranks = new
            if converged:
                break
        return ranks

    # ---------------------------------------------------------------- compat

    def term_header_flags(self, term: str, doc_id: int) -> tuple[bool, bool, bool]:
        h1, h2, h3 = self.docs[doc_id]["headings"]
        return (
            any(term in t for t in h1),
            any(term in t for t in h2),
            any(term in t for t in h3),
        )

    def search_compat(self, query: str, k: int = 10) -> list[dict]:
        is_phrase = query.startswith('"') and query.endswith('"') and len(query) > 2
        phrase = query[1:-1] if is_phrase else None
        terms = query_tokenize(phrase if phrase is not None else query)
        qwords = query_words(query)
        if not terms:
            return []

        # matched (term, doc) pairs; phrase mode filters by snippet scan (Q10)
        matched: dict[int, list[str]] = {}
        for term in sorted(dict.fromkeys(terms)):
            for doc_id in self.postings.get(term, {}):
                if phrase is not None:
                    snips = snippet_windows(term, self.docs[doc_id]["content"], 60)
                    ok = any(
                        find_exact_sentence(phrase, s.replace("<b>", "").replace("</b>", "")) != -1
                        for s in snips
                    )
                    if not ok:
                        continue
                matched.setdefault(doc_id, []).append(term)
        if not matched:
            return []

        comp = {}
        for doc_id, dterms in matched.items():
            d = self.docs[doc_id]
            tfidf = 0.0
            hdr = 0.0
            tm = 0
            for term in sorted(dterms):  # pinned deterministic order (Q12)
                tf_rel = self.postings[term][doc_id] / d["doc_len"]
                tfidf += tf_rel * self.idf_compat[term]
                f1, f2, f3 = self.term_header_flags(term, doc_id)
                hdr += (0.45 if f1 else 0.0) + (0.25 if f2 else 0.0) + (0.1 if f3 else 0.0)
                for w in qwords:
                    if w.lower() in d["title"].lower():
                        tm += 1
            comp[doc_id] = {
                "tfidf": tfidf, "hdr": hdr, "tm": tm,
                "pr": self.pagerank[doc_id], "last_term": sorted(dterms)[-1],
            }

        max_tfidf = max(c["tfidf"] for c in comp.values())
        max_pr = max(c["pr"] for c in comp.values())
        out = []
        for doc_id, c in comp.items():
            # degenerate-max guard mirrored from the engine (see
            # operators/query.py): all-zero max normalizer → term is 0,
            # where the reference would produce NaN (it never hits this)
            tfidf_term = (c["tfidf"] / max_tfidf) if max_tfidf != 0.0 else 0.0
            pr_term = (c["pr"] / max_pr) if max_pr != 0.0 else 0.0
            score = (
                0.4 * tfidf_term
                + 0.3 * pr_term
                + 0.7 * (c["tm"] / len(qwords))
                + min(c["hdr"], 0.45)
            )
            d = self.docs[doc_id]
            snips = snippet_windows(c["last_term"], d["content"], 60)
            if phrase is not None:
                chosen = None
                for s in snips:
                    plain = s.replace("<b>", "").replace("</b>", "")
                    if find_exact_sentence(phrase, plain) != -1:
                        start = plain.find(phrase)
                        end = start + len(phrase)
                        if end >= len(plain):
                            end = len(plain) - 1
                        chosen = plain[:start] + "<b>" + phrase + "</b>" + plain[end:]
                        break
                if chosen is None:
                    continue
                snippet = chosen
            else:
                if not snips:  # Q11: empty-snippet rows dropped
                    continue
                snippet = snips[0]
            out.append(
                {"doc_id": doc_id, "url": d["url"], "title": d["title"], "score": score, "snippet": snippet}
            )
        out.sort(key=lambda r: (-r["score"], r["doc_id"]))
        for rank, r in enumerate(out[:k], start=1):
            r["rank"] = rank
        return out[:k]

    # ---------------------------------------------------------------- bm25

    def search_bm25(self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75) -> list[dict]:
        is_phrase = query.startswith('"') and query.endswith('"') and len(query) > 2
        phrase = query[1:-1] if is_phrase else None
        terms = query_tokenize(phrase if phrase is not None else query)
        if not terms:
            return []
        scores: dict[int, float] = {}
        cand: dict[int, list[str]] = {}
        for term in sorted(dict.fromkeys(terms)):
            for doc_id in self.postings.get(term, {}):
                cand.setdefault(doc_id, []).append(term)
        if phrase is not None and len(terms) >= 2:
            cand = {d: ts for d, ts in cand.items() if self._phrase_at_positions(d, terms)}
        for doc_id, dterms in cand.items():
            dl = self.docs[doc_id]["doc_len"]
            s = 0.0
            for term in sorted(dterms):
                tf = self.postings[term][doc_id]
                s += self.idf_bm25[term] * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl / self.avgdl)
                )
            scores[doc_id] = s
        out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [
            {"rank": i + 1, "doc_id": d, "url": self.docs[d]["url"], "score": s}
            for i, (d, s) in enumerate(out)
        ]

    def _phrase_at_positions(self, doc_id: int, terms: list[str]) -> bool:
        pos0 = self.docs[doc_id]["positions"].get(terms[0], [])
        for p in pos0:
            if all(
                (p + i) in self.docs[doc_id]["positions"].get(t, [])
                for i, t in enumerate(terms[1:], start=1)
            ):
                return True
        return False
