"""Oracle-checkable iterative graph compute: integer-arithmetic PageRank.

The production PageRank (operators/pagerank.py) is float and
reference-faithful (Indexer.java:106-169). This variant exists so the
*iterative* operator class is covered by the DuckDB correctness gate too:
all arithmetic is bigint with explicit integer division —
``((r * 85) div 100) div outdeg`` — so sums are exact and the DuckDB
recursive-CTE oracle matches bit-for-bit after any number of iterations.

Edges derive deterministically from the documents table:
src = doc_id → dst ∈ {(doc_id*31+7) mod N, (doc_id*17+3) mod N}, dst ≠ src.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank unit: 1e-12 of total mass
DAMP_NUM, DAMP_DEN = 85, 100


DEFAULT_GENERATORS = ((31, 7), (17, 3))
# affine maps alone never close triangles; the local chords (i+1, i+2)
# make the triangle family's graph clustered (ring + chords)
TRIANGLE_GENERATORS = ((31, 7), (17, 3), (1, 1), (1, 2))


def synthetic_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    generators: tuple[tuple[int, int], ...] = DEFAULT_GENERATORS,
) -> DataFrame:
    # reduce BEFORE multiplying: ids from hashed/sparse key spaces would
    # overflow ANSI long arithmetic in `id * 31` (for the dense 0..n-1 gate
    # corpus `id % n == id`, so edge values — and the SQL twin — are
    # unchanged)
    n = docs.count()
    ids = docs.select(F.col(id_col).alias("src"))
    m = F.col("src") % n
    arms = [
        ids.select("src", ((m * a + b) % n).alias("dst")) for a, b in generators
    ]
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionByName(arm)
    return out.filter(F.col("src") != F.col("dst")).distinct()


def pagerank_integer(
    docs: DataFrame, iterations: int = 5, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, rank_scaled) after ``iterations`` exact-integer PR steps."""
    spark = docs.sparkSession
    n = docs.count()
    nodes = docs.select(F.col(id_col).alias("doc_id"))
    edges = synthetic_edges(docs, id_col)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    e = edges.join(outdeg, "src")
    src_set = outdeg.select(F.col("src").alias("doc_id"))
    # loop-invariants: cut lineage ONCE so each iteration joins a
    # materialized edge table instead of re-deriving it from source
    # (pagerank.py:71 pattern — at scale this is the difference between
    # one edge shuffle per iteration and a full recompute per iteration)
    e = e.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    src_set = src_set.localCheckpoint(eager=True)

    base = (SCALE * 15 // 100) // n
    ranks = nodes.withColumn("r", F.lit(SCALE // n).cast("long"))
    for _ in range(iterations):
        # dangling mass stays IN-PLAN (1-row broadcast) instead of a
        # blocking driver collect, and the per-iteration checkpoint is
        # lazy: the loop builds ONE composed job with progressive lineage
        # cuts rather than 2 driver round-trips per iteration (same exact
        # integers — div truncates like Python // for the non-negative
        # rank masses)
        dang_row = (
            ranks.join(src_set, "doc_id", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dt"))
            .select(
                F.expr(f"(dt * {DAMP_NUM} div {DAMP_DEN}) div {n}").alias("dang")
            )
        )
        contrib = (
            e.join(ranks, e.src == ranks.doc_id)
            .select(
                F.col("dst").alias("doc_id"),
                F.expr(f"(r * {DAMP_NUM} div {DAMP_DEN}) div od").alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "doc_id", "left")
            .crossJoin(F.broadcast(dang_row))
            .select(
                "doc_id",
                (F.lit(base) + F.coalesce(F.col("in_sum"), F.lit(0)) + F.col("dang")).cast("long").alias("r"),
            )
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("doc_id", F.col("r").alias("rank_scaled"))


def personalized_pagerank_integer(
    docs: DataFrame, iterations: int = 5, seed_below: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, rank_scaled) — personalized PageRank: teleport (and
    dangling) mass returns to the SEED set (doc_id < seed_below) instead of
    the whole graph, so ranks measure proximity to the seeds — the
    "related pages" / topic-sensitive variant (Haveliwala 2002).

    Same exact-integer contract and per-iteration plan as
    :func:`pagerank_integer` (one edge join + aggregate, O(1)-row driver
    scalars for the dangling mass, localCheckpoint lineage cuts); only the
    base/dangling deposit is seed-gated. Initial mass = the teleport
    distribution (SCALE/|S| on seeds, 0 elsewhere)."""
    n_seeds = docs.filter(F.col(id_col) < seed_below).count()
    if n_seeds == 0:
        raise ValueError(f"no seeds: no {id_col} < {seed_below}")
    nodes = docs.select(F.col(id_col).alias("doc_id"))
    edges = synthetic_edges(docs, id_col)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    e = edges.join(outdeg, "src")
    src_set = outdeg.select(F.col("src").alias("doc_id"))
    # loop-invariant lineage cuts (pagerank.py:71 pattern)
    e = e.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    src_set = src_set.localCheckpoint(eager=True)
    is_seed = F.col("doc_id") < seed_below

    base = (SCALE * 15 // 100) // n_seeds
    ranks = nodes.withColumn(
        "r", F.when(is_seed, F.lit(SCALE // n_seeds)).otherwise(F.lit(0)).cast("long")
    )
    for _ in range(iterations):
        # in-plan dangling mass + lazy checkpoint (see pagerank_integer)
        dang_row = (
            ranks.join(src_set, "doc_id", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dt"))
            .select(
                F.expr(f"(dt * {DAMP_NUM} div {DAMP_DEN}) div {n_seeds}").alias("dang")
            )
        )
        contrib = (
            e.join(ranks, e.src == ranks.doc_id)
            .select(
                F.col("dst").alias("doc_id"),
                F.expr(f"(r * {DAMP_NUM} div {DAMP_DEN}) div od").alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "doc_id", "left")
            .crossJoin(F.broadcast(dang_row))
            .select(
                "doc_id",
                (
                    F.when(is_seed, F.lit(base) + F.col("dang")).otherwise(F.lit(0))
                    + F.coalesce(F.col("in_sum"), F.lit(0))
                )
                .cast("long")
                .alias("r"),
            )
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("doc_id", F.col("r").alias("rank_scaled"))


def hits_integer(
    docs: DataFrame, iterations: int = 5, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, auth, hub) after ``iterations`` Kleinberg HITS steps over the
    synthetic edge graph, in exact (unnormalized) integer arithmetic.

    Sequential update per iteration — a_i(v) = sum of h_{i-1}(u) over in-edges
    u->v, then h_i(v) = sum of a_i(w) over out-edges v->w — so hub scores see
    the fresh authorities, as in the published algorithm. Skipping the
    per-iteration normalization keeps every value a bigint (degrees are
    bounded by the two hash maps, so growth is <= ~8x/iteration): ranks are
    identical to the normalized variant and sums stay exact in both engines.
    Each iteration is two edge-joins + two aggregates; only ``h`` is
    localCheckpointed (one lineage cut per iteration): ``a`` is a single
    join+agg off the checkpointed ``h``, so recomputing it where referenced
    is cheaper than a second eager checkpoint round-trip per iteration
    (measured ~25% faster, identical output)."""
    nodes = docs.select(F.col(id_col).alias("doc_id"))
    edges = synthetic_edges(docs, id_col)
    # loop-invariant lineage cuts (pagerank.py:71 pattern): edges are
    # joined twice per iteration — materialize once, not 2×iterations times
    edges = edges.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    h = nodes.withColumn("h", F.lit(1).cast("long"))
    a = nodes.withColumn("a", F.lit(1).cast("long"))
    for _ in range(iterations):
        in_sum = (
            edges.join(h, edges.src == h.doc_id)
            .groupBy("dst")
            .agg(F.sum("h").alias("s"))
        )
        a = nodes.join(in_sum, nodes.doc_id == in_sum.dst, "left").select(
            "doc_id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("a")
        )
        out_sum = (
            edges.join(a, edges.dst == a.doc_id)
            .groupBy("src")
            .agg(F.sum("a").alias("s"))
        )
        h = nodes.join(out_sum, nodes.doc_id == out_sum.src, "left").select(
            "doc_id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("h")
        )
        h = h.localCheckpoint(eager=False)  # lazy: one composed job, lineage
        # still cut per iteration when the final action materializes it
    return a.join(h, "doc_id").select(
        "doc_id", F.col("a").alias("auth"), F.col("h").alias("hub")
    )


def _edges_sql(
    generators: tuple[tuple[int, int], ...] = DEFAULT_GENERATORS,
) -> str:
    """The shared synthetic edge model as DuckDB CTEs, one UNION ALL arm
    per affine generator — the single source the graph twins build on."""
    arms = "\n    UNION ALL\n".join(
        f"    SELECT doc_id AS src, ((doc_id % n.n) * {a} + {b}) % n.n AS dst\n"
        f"    FROM documents, n"
        for a, b in generators
    )
    return f"""
n AS (SELECT count(*)::BIGINT AS n FROM documents),
nodes AS (SELECT doc_id FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
{arms}
  ) WHERE src <> dst
)"""


_EDGES_SQL = _edges_sql()


def hits_integer_sql(iterations: int = 5) -> str:
    """DuckDB twin: the fixed iteration count unrolls into a CTE chain
    (a1 <- h0, h1 <- a1, a2 <- h1, ...) — plain left-join aggregates, no
    recursion needed."""
    ctes = [
        f"WITH {_EDGES_SQL},",
        "h0 AS (SELECT doc_id, 1::BIGINT AS h FROM nodes)",
        # a0 mirrors hits_integer's initial authority seed so the twin pair
        # agrees at iterations=0 as well
        "a0 AS (SELECT doc_id, 1::BIGINT AS a FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""a{i} AS (
  SELECT nd.doc_id, coalesce(s.v, 0)::BIGINT AS a
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS doc_id, sum(p.h)::BIGINT AS v
    FROM edges e JOIN h{i - 1} p ON p.doc_id = e.src GROUP BY 1
  ) s USING (doc_id)
)"""
        )
        ctes.append(
            f"""h{i} AS (
  SELECT nd.doc_id, coalesce(s.v, 0)::BIGINT AS h
  FROM nodes nd LEFT JOIN (
    SELECT e.src AS doc_id, sum(p.a)::BIGINT AS v
    FROM edges e JOIN a{i} p ON p.doc_id = e.dst GROUP BY 1
  ) s USING (doc_id)
)"""
        )
    with_block = ctes[0] + "\n" + ",\n".join(ctes[1:])
    return (
        with_block
        + f"\nSELECT a{iterations}.doc_id, a{iterations}.a AS auth, h{iterations}.h AS hub"
        + f"\nFROM a{iterations} JOIN h{iterations} USING (doc_id)"
    )


def personalized_pagerank_sql(iterations: int = 5, seed_below: int = 3) -> str:
    """DuckDB twin of personalized_pagerank_integer: the fixed iteration
    count unrolls into a CTE chain (the HITS pattern) — per step one
    dangling-sum scalar and one contribution aggregate, seed-gated base
    deposit."""
    ctes = [
        f"WITH {_EDGES_SQL},",
        "outdeg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY 1)",
        f"ns AS (SELECT count(*)::BIGINT AS ns FROM nodes WHERE doc_id < {seed_below})",
        f"""pr0 AS (
  SELECT nd.doc_id,
         (CASE WHEN nd.doc_id < {seed_below} THEN {SCALE} // ns.ns ELSE 0 END)::BIGINT AS r
  FROM nodes nd, ns
)""",
    ]
    for i in range(1, iterations + 1):
        p = f"pr{i - 1}"
        ctes.append(
            f"""d{i} AS (
  SELECT (coalesce(sum(r), 0) * {DAMP_NUM} // {DAMP_DEN})::BIGINT AS dt
  FROM {p} WHERE doc_id NOT IN (SELECT src FROM outdeg)
)"""
        )
        ctes.append(
            f"""pr{i} AS (
  SELECT nd.doc_id,
         (CASE WHEN nd.doc_id < {seed_below}
               THEN (({SCALE} * 15 // 100) // ns.ns) + (d.dt // ns.ns)
               ELSE 0 END
          + coalesce(c.v, 0))::BIGINT AS r
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS doc_id, sum((p.r * {DAMP_NUM} // {DAMP_DEN}) // o.od)::BIGINT AS v
    FROM edges e JOIN {p} p ON p.doc_id = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY 1
  ) c USING (doc_id)
  CROSS JOIN ns CROSS JOIN d{i} d
)"""
        )
    return (
        ctes[0]
        + "\n"
        + ",\n".join(ctes[1:])
        + f"\nSELECT doc_id, r AS rank_scaled FROM pr{iterations}"
    )


def pagerank_integer_sql(iterations: int = 5) -> str:
    """DuckDB recursive-CTE twin (multiple working-table references are a
    DuckDB extension; this is the oracle, not a portability claim). Shares
    the edge-derivation CTEs (_EDGES_SQL) with the HITS twin so the rule
    exists once."""
    return f"""
WITH RECURSIVE {_EDGES_SQL},
outdeg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY 1),
pr(it, doc_id, r) AS (
  SELECT 0, doc_id, ({SCALE} // n.n)::BIGINT FROM nodes, n
  UNION ALL
  SELECT it + 1, doc_id, base + contrib + dang FROM (
    SELECT p.it AS it, nd.doc_id AS doc_id,
           (({SCALE} * 15 // 100) // (SELECT n FROM n))::BIGINT AS base,
           coalesce((SELECT sum((p2.r * {DAMP_NUM} // {DAMP_DEN}) // o.od)
                     FROM pr p2 JOIN edges e ON e.src = p2.doc_id
                     JOIN outdeg o ON o.src = e.src
                     WHERE e.dst = nd.doc_id AND p2.it = p.it), 0)::BIGINT AS contrib,
           (((SELECT coalesce(sum(p3.r), 0) FROM pr p3
              WHERE p3.it = p.it AND p3.doc_id NOT IN (SELECT src FROM outdeg))
             * {DAMP_NUM} // {DAMP_DEN}) // (SELECT n FROM n))::BIGINT AS dang
    FROM (SELECT DISTINCT it FROM pr) p, nodes nd
    WHERE p.it < {iterations}
  )
)
SELECT doc_id, r AS rank_scaled FROM pr WHERE it = {iterations}
"""


def symbol_rank(
    docs: DataFrame,
    iterations: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(node, rank_scaled) — PageRank over the SYMBOL dependency graph:
    an edge runs from every symbol a document defines to every symbol the
    same document references, so mass flows toward heavily-depended-upon
    symbols (the code-search ranking signal of Google Code Search /
    Sourcegraph-style "importance" ordering, PageRank-on-call-graph).

    Nodes are ``kind:symbol`` strings (function/class namespaces kept
    apart); self-loops drop. Per-doc fanout is |defs|×|refs| — bounded by
    the declarations per file (single digits), never corpus-quadratic; a
    popular symbol concentrates rows only in edge-distinct and the
    per-iteration in-sum aggregate, both map-side combinable.

    Exact-integer contract of :func:`pagerank_integer` (bigint arithmetic,
    ``(r*85 div 100) div od``, dangling mass redistributed uniformly, one
    edge join + hash agg per iteration, localCheckpoint lineage cuts), so
    the DuckDB recursive-CTE twin matches bit-for-bit."""
    from searchengine_spark.operators.textstats import (
        symbol_definitions,
        symbol_references,
    )

    node = lambda kind, sym: F.concat_ws(":", F.col(kind), F.col(sym))  # noqa: E731
    defs = symbol_definitions(docs, id_col=id_col, text_col=text_col).select(
        id_col, node("kind", "symbol").alias("src")
    )
    refs = symbol_references(docs, id_col=id_col, text_col=text_col).select(
        id_col, node("kind", "symbol").alias("dst")
    )
    edges = (
        defs.join(refs, id_col)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        defs.select(F.col("src").alias("node"))
        .unionByName(refs.select(F.col("dst").alias("node")))
        .distinct()
    )
    return _integer_pr_loop(nodes, edges, iterations, key="node")


def _integer_pr_loop(
    nodes: DataFrame, edges: DataFrame, iterations: int, key: str = "node"
) -> DataFrame:
    """The exact-integer PageRank fixpoint shared by :func:`symbol_rank`
    and :func:`repo_rank`: loop-invariant lineage cuts (edges/nodes
    checkpointed eagerly ONCE — the upstream extraction is the expensive
    part), in-plan 1-row-broadcast dangling mass, lazy per-iteration
    checkpoints so the whole loop composes into one job. ``nodes`` must be
    one column named ``key``; ``edges`` two columns (src, dst) in the same
    key space. Returns (key, rank_scaled)."""
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    e = edges.join(outdeg, "src").localCheckpoint(eager=True)
    src_set = outdeg.select(F.col("src").alias(key)).localCheckpoint(eager=True)

    base = (SCALE * 15 // 100) // n
    ranks = nodes.withColumn("r", F.lit(SCALE // n).cast("long"))
    for _ in range(iterations):
        # in-plan dangling mass + lazy checkpoint (see pagerank_integer)
        dang_row = (
            ranks.join(src_set, key, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dt"))
            .select(
                F.expr(f"(dt * {DAMP_NUM} div {DAMP_DEN}) div {n}").alias("dang")
            )
        )
        contrib = (
            e.join(ranks, e.src == ranks[key])
            .select(
                F.col("dst").alias(key),
                F.expr(f"(r * {DAMP_NUM} div {DAMP_DEN}) div od").alias("c"),
            )
            .groupBy(key)
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, key, "left")
            .crossJoin(F.broadcast(dang_row))
            .select(
                key,
                (F.lit(base) + F.coalesce(F.col("in_sum"), F.lit(0)) + F.col("dang"))
                .cast("long")
                .alias("r"),
            )
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(key, F.col("r").alias("rank_scaled"))


def repo_rank(
    docs: DataFrame,
    iterations: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    repo_col: str = "source",
) -> DataFrame:
    """(repo, rank_scaled) — PageRank over the REPO dependency graph
    (:func:`repo_dependency_edges`, unweighted distinct edges): mass flows
    from dependent repos toward their dependencies, so heavily-depended-
    upon repos rank highest — the repo-importance ordering a code-search
    engine uses to rank results across repositories (the repo-granularity
    sibling of :func:`symbol_rank`). Nodes are ALL repos in the corpus, so
    leaf repos (no outgoing deps) contribute dangling mass exactly like
    dangling pages. Same exact-integer contract; DuckDB recursive-CTE twin
    matches bit-for-bit."""
    edges = repo_dependency_edges(
        docs, id_col=id_col, text_col=text_col, repo_col=repo_col
    ).select(F.col("from_repo").alias("src"), F.col("to_repo").alias("dst"))
    nodes = docs.select(F.col(repo_col).alias("repo")).distinct()
    return _integer_pr_loop(nodes, edges, iterations, key="repo")


def symbol_rank_sql(iterations: int = 5) -> str:
    """DuckDB recursive-CTE twin of :func:`symbol_rank` — the seasoned
    def/ref extraction CTEs of the xref oracles feed a symbol-edge table,
    then the pagerank_integer_sql iteration scheme runs over it."""
    season_def = (
        "'def fn_' || (doc_id % 37)::VARCHAR || '(arg):' || chr(10) || "
        "'    pass' || chr(10) || 'class Cls_' || (doc_id % 23)::VARCHAR || "
        "':' || chr(10) || '    pass' || chr(10) || text"
    )
    season_ref = (
        "'call fn_' || ((doc_id + 1) % 37)::VARCHAR || "
        "'(0) new Cls_' || ((doc_id + 5) % 23)::VARCHAR || '(0) ' || text"
    )
    return f"""
WITH RECURSIVE
dseason AS (SELECT doc_id, {season_def} AS s FROM documents),
rseason AS (SELECT doc_id, {season_ref} AS s FROM documents),
defs AS (
  SELECT doc_id, 'function:' ||
         unnest(regexp_extract_all(s, 'def ([a-zA-Z_][a-zA-Z0-9_]*)\\s*\\(', 1)) AS src
  FROM dseason
  UNION ALL
  SELECT doc_id, 'class:' ||
         unnest(regexp_extract_all(s, 'class ([a-zA-Z_][a-zA-Z0-9_]*)', 1)) AS src
  FROM dseason
),
refs AS (
  SELECT doc_id, 'function:' ||
         unnest(regexp_extract_all(s, 'call ([a-zA-Z_][a-zA-Z0-9_]*)\\s*\\(', 1)) AS dst
  FROM rseason
  UNION ALL
  SELECT doc_id, 'class:' ||
         unnest(regexp_extract_all(s, 'new ([a-zA-Z_][a-zA-Z0-9_]*)\\s*\\(', 1)) AS dst
  FROM rseason
),
edges AS (
  SELECT DISTINCT d.src, r.dst FROM defs d JOIN refs r USING (doc_id)
  WHERE d.src <> r.dst
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM defs
                                     UNION ALL SELECT dst FROM refs)),
n AS (SELECT count(*)::BIGINT AS n FROM nodes),
outdeg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY 1),
pr(it, node, r) AS (
  SELECT 0, node, ({SCALE} // n.n)::BIGINT FROM nodes, n
  UNION ALL
  SELECT it + 1, node, base + contrib + dang FROM (
    SELECT p.it AS it, nd.node AS node,
           (({SCALE} * 15 // 100) // (SELECT n FROM n))::BIGINT AS base,
           coalesce((SELECT sum((p2.r * {DAMP_NUM} // {DAMP_DEN}) // o.od)
                     FROM pr p2 JOIN edges e ON e.src = p2.node
                     JOIN outdeg o ON o.src = e.src
                     WHERE e.dst = nd.node AND p2.it = p.it), 0)::BIGINT AS contrib,
           (((SELECT coalesce(sum(p3.r), 0) FROM pr p3
              WHERE p3.it = p.it AND p3.node NOT IN (SELECT src FROM outdeg))
             * {DAMP_NUM} // {DAMP_DEN}) // (SELECT n FROM n))::BIGINT AS dang
    FROM (SELECT DISTINCT it FROM pr) p, nodes nd
    WHERE p.it < {iterations}
  )
)
SELECT node, r AS rank_scaled FROM pr WHERE it = {iterations}
"""


def anchor_terms(
    docs: DataFrame,
    n_anchor_tokens: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, anchor_tf) — anchor-text propagation: the classic
    web-ranking signal that the words AROUND a link describe its TARGET
    (what lets engines rank pages for terms they never contain).

    The deterministic anchor analog for the synthetic graph: each edge
    carries the first ``n_anchor_tokens`` tokens of its SOURCE doc as the
    link's anchor phrase; ``anchor_tf`` counts, per target doc and term,
    how many in-links anchor with that term.

    Scale shape: the anchor projection is a slim map over the corpus scan
    (token array sliced in-Project, no per-element re-split risk — no
    lambda references the alias); the edge join is a co-partitioned equi
    join on src; the rollup is one map-side-combinable count. Linear in
    |edges| * n_anchor_tokens. A hot target (popular page) concentrates
    rows only in the final count aggregate, which partial-aggregates
    map-side."""
    from searchengine_spark.functions.tokenize import tokens_array

    arr = F.filter(tokens_array(F.col(text_col)), lambda t: t != F.lit(""))
    anchors = docs.select(
        F.col(id_col).alias("src"), F.slice(arr, 1, n_anchor_tokens).alias("a")
    )
    return (
        synthetic_edges(docs, id_col)
        .join(anchors, "src")
        .select(F.col("dst").alias("doc_id"), F.explode("a").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("anchor_tf"))
    )


def anchor_terms_sql(n_anchor_tokens: int = 3) -> str:
    """DuckDB twin of :func:`anchor_terms` over the shared edge model."""
    from searchengine_spark.functions.tokenize import TOKEN_SPLIT_RE

    return f"""
WITH {_EDGES_SQL},
anch AS (
  SELECT doc_id AS src,
         (list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                      x -> x <> ''))[1:{n_anchor_tokens}] AS a
  FROM documents
),
j AS (
  SELECT e.dst AS doc_id, unnest(an.a) AS term
  FROM edges e JOIN anch an USING (src)
)
SELECT doc_id, term, count(*)::BIGINT AS anchor_tf
FROM j GROUP BY 1, 2
"""


def triangle_count(
    docs: DataFrame,
    id_col: str = "doc_id",
    generators: tuple[tuple[int, int], ...] = TRIANGLE_GENERATORS,
) -> DataFrame:
    """Global triangle count over the (undirected) link graph — the classic
    distributed graph-analytics kernel beside PageRank/HITS, and the usual
    clustering-coefficient numerator.

    Degree-orientation algorithm (the MapReduce-era standard, cf. Suri &
    Vassilvitskii WWW'11): orient every undirected edge from its lower-
    (degree, id) endpoint to the higher one, generate wedges only at each
    edge's SOURCE, and close them against the oriented edge set. Wedge
    work is Σ out_deg², and orientation caps out-degree by O(sqrt(|E|))
    on any graph — a star's hub generates NO wedges because all its edges
    point away from the leaves into it. Both the wedge self-join and the
    closing join are equi-joins on node keys.

    Output: one row (n_nodes, n_edges, n_triangles). The default edge set
    adds the local chords (TRIANGLE_GENERATORS) — the two affine maps
    alone form a triangle-free graph, which would gate nothing."""
    e = synthetic_edges(docs, id_col, generators)
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    j = und.join(
        deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    orient = j.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    w1 = orient.select("u", F.col("v").alias("x"))
    w2 = orient.select("u", F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") != F.col("y")).select("x", "y")
    tri = wedges.join(
        orient.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
    )
    n_nodes = docs.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


def triangle_count_sql(
    generators: tuple[tuple[int, int], ...] = TRIANGLE_GENERATORS,
) -> str:
    """Twin of triangle_count: degree-orientation wedge close over the
    shared synthetic edge model (chord-augmented by default)."""
    return f"""
WITH {_edges_sql(generators)},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
deg AS (
  SELECT v, count(*)::BIGINT AS d FROM (
    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
  ) GROUP BY 1
),
orient AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND und.a < und.b)
              THEN und.a ELSE und.b END AS u,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND und.a < und.b)
              THEN und.b ELSE und.a END AS v
  FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b
),
wedges AS (
  SELECT e1.v AS x, e2.v AS y
  FROM orient e1 JOIN orient e2 ON e1.u = e2.u
  WHERE e1.v <> e2.v
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM wedges JOIN orient ON wedges.x = orient.u AND wedges.y = orient.v
)
SELECT (SELECT count(*)::BIGINT FROM documents) AS n_nodes,
       (SELECT count(*)::BIGINT FROM und) AS n_edges,
       tri.n_triangles
FROM tri
"""


def link_prediction_aa(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    generators: tuple[tuple[int, int], ...] = TRIANGLE_GENERATORS,
) -> DataFrame:
    """Adamic–Adar link prediction (Adamic & Adar 2003) over the undirected
    chord graph: score every NON-edge pair by the sum of 1/ln(degree) over
    its common neighbors, and return the top-k predicted links — the
    "pages that should link but don't" / related-pages-by-structure signal
    beside the content-based MoreLikeThis.

    Per-neighbor credit is pre-rounded to integer micros
    (``round(1e6/ln(deg))``) so the pair score is an exact integer sum —
    associative under any partitioning and bit-identical in the DuckDB
    twin. Common neighbors have degree ≥ 2 by construction, so ln > 0.

    Shape: wedges are generated at each common neighbor (one equi-join on
    the neighbor key), existing edges are removed with a left-anti join,
    and the pair aggregate is one hash agg. Wedge work is Σ deg² — at web
    scale the standard defusal applies (cap or sample hub adjacency; hubs
    contribute ≈0 credit anyway since 1/ln(deg)→0, so a degree cap changes
    scores by a bounded ε while removing the quadratic key).

    Output: (src, dst, common_neighbors, aa_micros), src < dst, top-k by
    (aa_micros DESC, src, dst)."""
    e = synthetic_edges(docs, id_col, generators)
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("x")).unionByName(
        und.select(F.col("b").alias("z"), F.col("a").alias("x"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    credit = deg.select(
        "z", F.round(F.lit(1e6) / F.log(F.col("d").cast("double"))).cast("long").alias("c")
    )
    wedges = (
        adj.join(adj.select("z", F.col("x").alias("y")), "z")
        .filter(F.col("x") < F.col("y"))
        .join(credit, "z")
    )
    non_edges = wedges.join(
        und, (wedges.x == und.a) & (wedges.y == und.b), "left_anti"
    )
    scored = non_edges.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum("c").alias("aa_micros"),
    )
    return (
        scored.orderBy(F.desc("aa_micros"), F.asc("x"), F.asc("y"))
        .limit(k)
        .select(
            F.col("x").alias("src"), F.col("y").alias("dst"),
            "common_neighbors", "aa_micros",
        )
    )


def link_prediction_aa_sql(
    k: int = 20,
    generators: tuple[tuple[int, int], ...] = TRIANGLE_GENERATORS,
) -> str:
    """Twin of link_prediction_aa over the shared synthetic edge model."""
    return f"""
WITH {_edges_sql(generators)},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
adj AS (
  SELECT a AS z, b AS x FROM und UNION ALL SELECT b AS z, a AS x FROM und
),
credit AS (
  SELECT z, CAST(round(1e6 / ln(count(*)::DOUBLE)) AS BIGINT) AS c
  FROM adj GROUP BY 1
),
wedges AS (
  SELECT a1.x AS x, a2.x AS y, credit.c
  FROM adj a1 JOIN adj a2 ON a1.z = a2.z JOIN credit ON credit.z = a1.z
  WHERE a1.x < a2.x
),
non_edges AS (
  SELECT w.* FROM wedges w
  LEFT JOIN und ON w.x = und.a AND w.y = und.b
  WHERE und.a IS NULL
)
SELECT x AS src, y AS dst, count(*)::BIGINT AS common_neighbors,
       sum(c)::BIGINT AS aa_micros
FROM non_edges
GROUP BY 1, 2
ORDER BY aa_micros DESC, src ASC, dst ASC
LIMIT {k}
"""


def label_propagation(
    docs: DataFrame,
    iterations: int = 5,
    id_col: str = "doc_id",
    generators: tuple[tuple[int, int], ...] = TRIANGLE_GENERATORS,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007), made deterministic: every node starts as its own label; each
    round it adopts the most frequent label among its neighbors, ties to
    the SMALLEST label; isolated nodes keep their own. A fixed iteration
    count (not convergence) keeps the output a pure function of the graph —
    the same determinism contract as the exact-integer PageRank/HITS twins,
    so the gate hash-checks community assignments directly.

    One edges⋈labels join + one (node, label) count + one per-node argmax
    per round — the PageRank iteration shape; at scale labels are long ids,
    state is one row per node, and AQE's skew handling covers hub fan-in.

    Output: (doc_id, community)."""
    nodes = docs.select(F.col(id_col).alias("doc_id"))
    e = synthetic_edges(docs, id_col, generators)
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    # loop-invariant lineage cuts (pagerank.py:71 pattern)
    adj = adj.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    labels = nodes.select("doc_id", F.col("doc_id").alias("lbl"))
    for i in range(iterations):
        nbr = adj.join(
            labels.select(F.col("doc_id").alias("u"), "lbl"), "u"
        ).select("v", "lbl")
        counts = nbr.groupBy("v", "lbl").agg(F.count(F.lit(1)).alias("n"))
        from pyspark.sql import Window

        w = Window.partitionBy("v").orderBy(F.desc("n"), F.asc("lbl"))
        mode = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("v").alias("doc_id"), F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(mode, "doc_id", "left")
            .select("doc_id", F.coalesce("new_lbl", "lbl").alias("lbl"))
        )
        if (i + 1) % 3 == 0:
            labels = labels.localCheckpoint()  # cap the iterative lineage
    return labels.select("doc_id", F.col("lbl").alias("community"))


def label_propagation_sql(
    iterations: int = 5,
    generators: tuple[tuple[int, int], ...] = TRIANGLE_GENERATORS,
) -> str:
    """Twin of label_propagation: the rounds unrolled as CTEs (the
    HITS/k-means oracle pattern), same most-frequent/min-label tie rule."""
    parts = [
        f"""{_edges_sql(generators)},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
adj AS (
  SELECT a AS v, b AS u FROM und UNION ALL SELECT b AS v, a AS u FROM und
),
l0 AS (SELECT doc_id, doc_id AS lbl FROM documents)"""
    ]
    for t in range(iterations):
        parts.append(
            f"""m{t} AS (
  SELECT v AS doc_id, lbl AS new_lbl FROM (
    SELECT adj.v, l.lbl, count(*) AS n,
           row_number() OVER (PARTITION BY adj.v
                              ORDER BY count(*) DESC, l.lbl ASC) AS rn
    FROM adj JOIN l{t} l ON adj.u = l.doc_id
    GROUP BY adj.v, l.lbl
  ) WHERE rn = 1
),
l{t + 1} AS (
  SELECT l.doc_id, coalesce(m.new_lbl, l.lbl) AS lbl
  FROM l{t} l LEFT JOIN m{t} m USING (doc_id)
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT doc_id, lbl AS community FROM l{iterations}"
    )


def repo_dependency_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    repo_col: str = "source",
) -> DataFrame:
    """(from_repo, to_repo, n_symbols) — the REPO-level dependency graph:
    an edge from the repo whose file REFERENCES a symbol to the repo that
    DEFINES it (weight = distinct shared symbols), the cross-repo import
    graph a monorepo-scale code-search/build system maintains (Bazel-style
    reverse-deps, Sourcegraph's repo graph). A symbol defined in several
    repos contributes an edge to each definer — linker ambiguity is kept
    visible rather than resolved away.

    Plan: the def/ref symbol extractions (one corpus regex pass each)
    slim to DISTINCT (symbol, repo) pairs BEFORE the join — the join is
    symbol-keyed over vocabulary-sized tables, never the posting stream;
    the rollup is one associative aggregate on (from, to). At 10^12 files
    the distinct pass is the only corpus-mass stage and it is map-side
    combinable."""
    from searchengine_spark.operators.textstats import (
        symbol_definitions,
        symbol_references,
    )

    repos = docs.select(F.col(id_col), F.col(repo_col))
    sym = F.concat_ws(":", F.col("kind"), F.col("symbol"))
    d = (
        symbol_definitions(docs, id_col=id_col, text_col=text_col)
        .join(repos, id_col)
        .select(sym.alias("sym"), F.col(repo_col).alias("to_repo"))
        .distinct()
    )
    r = (
        symbol_references(docs, id_col=id_col, text_col=text_col)
        .join(repos, id_col)
        .select(sym.alias("sym"), F.col(repo_col).alias("from_repo"))
        .distinct()
    )
    return (
        r.join(d, "sym")
        .filter(F.col("from_repo") != F.col("to_repo"))
        .groupBy("from_repo", "to_repo")
        .agg(F.countDistinct("sym").cast("long").alias("n_symbols"))
    )
