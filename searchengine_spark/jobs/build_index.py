"""spark-submit entry point: build the inverted index.

Cluster usage (north rule: ``spark-submit --py-files``)::

    python -m zipfile -c /tmp/sespark.zip searchengine_spark
    spark-submit --master <cluster> --py-files /tmp/sespark.zip \\
        searchengine_spark/jobs/build_index.py \\
        --corpus <parquet dir | iceberg table id> --out <index_dir> \\
        [--partitions N] [--no-pagerank] [--shard-span 1048576]

Local smoke::

    python searchengine_spark/jobs/build_index.py --synthetic 2000 --out /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", help="corpus parquet dir or catalog table id")
    p.add_argument("--synthetic", type=int, help="generate N synthetic docs instead")
    p.add_argument("--out", required=True)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--shard-span", type=int, default=None)
    p.add_argument("--no-pagerank", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from searchengine_spark.session import get_spark
    from searchengine_spark.plans.build_index import build_index

    spark = get_spark(master=args.master, app_name="build_index")
    if args.synthetic:
        from searchengine_spark.sources.corpus import generate_corpus

        corpus = spark.read.parquet(args.corpus) if args.corpus else generate_corpus(
            spark, args.synthetic, seed=42
        )
    else:
        if not args.corpus:
            p.error("--corpus or --synthetic required")
        if "/" in args.corpus:
            corpus = spark.read.parquet(args.corpus)
        else:
            corpus = spark.read.table(args.corpus)

    metrics = build_index(
        spark,
        corpus,
        args.out,
        n_partitions=args.partitions,
        with_pagerank=not args.no_pagerank,
        shard_span=args.shard_span,
    )
    print(json.dumps(metrics, default=str))
    return 0


if __name__ == "__main__":
    # bare-script invocation: sys.path[0] is jobs/, not the repo root
    import os as _os
    sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
    sys.exit(main())
