"""ANSI/DuckDB oracle SQL for every oracle-checkable query in
``__spark_entry__.queries()``.

Each SQL string is the *semantic* twin of the corresponding Spark DataFrame
plan: same tokenizer regex, same float expression trees, same
round-to-bigint-micros trick so sums are exact and order-insensitive in both
engines. Column aliases match the Spark side exactly (the driver sorts
columns by name before hashing).
"""

from __future__ import annotations

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# shared CTE: non-empty tokens per doc over the `documents` view
_TOKENS_CTE = f"""
toks AS (
  SELECT doc_id, string_split_regex(lower(text), '{TOKEN_SPLIT_RE}') AS t
  FROM documents
),
terms_ne AS (
  SELECT doc_id, unnest(t) AS term FROM toks
),
terms AS (
  SELECT doc_id, term FROM terms_ne WHERE term <> ''
),
post AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf FROM terms GROUP BY 1, 2
),
dls AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                         x -> x <> ''))::BIGINT AS dl
  FROM documents
)
"""


def _terms_values(terms: list[str]) -> str:
    rows = ", ".join(f"('{t}')" for t in terms)
    return f"(VALUES {rows}) AS q(term)"


def postings_sql() -> str:
    return f"WITH {_TOKENS_CTE} SELECT term, doc_id, tf FROM post"


def lexicon_sql() -> str:
    return f"""
WITH {_TOKENS_CTE},
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
SELECT term,
       count(DISTINCT doc_id)::BIGINT AS df,
       CAST(round(ln(1.0 + (n.n_docs - count(DISTINCT doc_id) + 0.5)
                            / (count(DISTINCT doc_id) + 0.5)) * 1e6) AS BIGINT)
         AS idf_bm25_micros,
       CAST(round(ln(n.n_docs / (count(DISTINCT doc_id) + 1.0)) * 1e6) AS BIGINT)
         AS idf_compat_micros
FROM post, n
GROUP BY term, n.n_docs
"""


def bm25_topk_sql(terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {_TOKENS_CTE},
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
avg_dl AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl FROM dls),
q AS (SELECT term FROM {_terms_values(terms)}),
lex AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM post GROUP BY 1
),
idf AS (
  SELECT lex.term,
         ln(1.0 + (n.n_docs - lex.df + 0.5) / (lex.df + 0.5)) AS idf_bm25
  FROM lex, n
  WHERE lex.term IN (SELECT term FROM q)
),
scored AS (
  SELECT post.doc_id,
         CAST(round(idf.idf_bm25 * (post.tf * {k1 + 1.0})
                    / (post.tf + {k1} * (1.0 - {b} + {b} * dls.dl / avg_dl.avgdl))
                    * 1e6) AS BIGINT) AS c_micros
  FROM post
  JOIN q ON post.term = q.term
  JOIN idf ON post.term = idf.term
  JOIN dls ON post.doc_id = dls.doc_id
  CROSS JOIN avg_dl
)
SELECT doc_id, sum(c_micros)::BIGINT AS score_micros
FROM scored GROUP BY doc_id
ORDER BY score_micros DESC, doc_id ASC
LIMIT {k}
"""


def tfidf_topk_sql(terms: list[str], k: int = 10) -> str:
    return f"""
WITH {_TOKENS_CTE},
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
q AS (SELECT term FROM {_terms_values(terms)}),
lex AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM post GROUP BY 1),
idf AS (
  SELECT lex.term, ln(n.n_docs / (lex.df + 1.0)) AS idf_compat
  FROM lex, n WHERE lex.term IN (SELECT term FROM q)
),
scored AS (
  SELECT post.doc_id,
         CAST(round((post.tf::DOUBLE / dls.dl::DOUBLE) * idf.idf_compat * 1e6)
              AS BIGINT) AS c_micros
  FROM post
  JOIN q ON post.term = q.term
  JOIN idf ON post.term = idf.term
  JOIN dls ON post.doc_id = dls.doc_id
)
SELECT doc_id, sum(c_micros)::BIGINT AS score_micros
FROM scored GROUP BY doc_id
ORDER BY score_micros DESC, doc_id ASC
LIMIT {k}
"""


def term_search_all_sql(terms: list[str]) -> str:
    n = len(set(terms))
    return f"""
WITH {_TOKENS_CTE},
q AS (SELECT term FROM {_terms_values(terms)})
SELECT terms.doc_id
FROM terms JOIN q ON terms.term = q.term
GROUP BY terms.doc_id
HAVING count(DISTINCT terms.term) = {n}
"""


def phrase_match_sql(phrase_terms: list[str]) -> str:
    # positions over the RAW split array (empties retained) — matches
    # posexplode on the Spark side
    conds = " AND ".join(
        f"p{i}.term = '{t}' AND p{i}.pos = p0.pos + {i}"
        for i, t in enumerate(phrase_terms)
        if i > 0
    )
    joins = "\n".join(
        f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
        for i in range(1, len(phrase_terms))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '{TOKEN_SPLIT_RE}') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) - 1 AS pos
  FROM toks
)
SELECT DISTINCT p0.doc_id
FROM pos p0
{joins}
WHERE p0.term = '{phrase_terms[0]}' AND {conds}
"""
