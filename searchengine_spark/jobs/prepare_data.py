"""spark-submit entry point: the end-to-end training-data prep pipeline.

Runs plans/prepare.py::prepare_training_chunks (quality filter -> exact
dedup -> benchmark decontamination -> stratified sample -> token-window
chunking) over a ``documents`` table and publishes the chunk table
atomically (write-tmp + rename) with a one-line JSON manifest beside it —
the same publish discipline as the index build, so a killed export never
leaves a half-written dataset and a re-run is idempotent.

Cluster usage::

    python -m zipfile -c /tmp/sespark.zip searchengine_spark
    spark-submit --master <cluster> --py-files /tmp/sespark.zip \\
        searchengine_spark/jobs/prepare_data.py \\
        --sf-dir <dir with documents.parquet> --out <chunks_dir> \\
        [--chunk-size 64] [--stride 48] [--rate-ppm en=300000] \\
        [--default-ppm 700000]

Local smoke::

    python searchengine_spark/jobs/prepare_data.py \\
        --sf-dir /root/testdata/sf0.001 --out /tmp/chunks
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--chunk-size", type=int, default=64)
    p.add_argument("--stride", type=int, default=48)
    p.add_argument(
        "--rate-ppm",
        action="append",
        default=[],
        metavar="LANG=PPM",
        help="per-language keep rate (repeatable), e.g. en=300000",
    )
    p.add_argument("--default-ppm", type=int, default=700_000)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    rates = {}
    for spec in args.rate_ppm:
        lang, _, ppm = spec.partition("=")
        rates[lang] = int(ppm)

    from searchengine_spark.plans.prepare import prepare_training_chunks
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.tables import load_table

    spark = get_spark(master=args.master, app_name="prepare_data")
    docs = load_table(spark, args.sf_dir, "documents")

    t0 = time.monotonic()
    chunks = prepare_training_chunks(
        docs,
        rates,
        args.default_ppm,
        chunk_size=args.chunk_size,
        stride=args.stride,
    )
    tmp = args.out.rstrip("/") + f".tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    chunks.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(args.out, ignore_errors=True)
    os.rename(tmp, args.out)  # atomic publish

    written = spark.read.parquet(args.out)
    manifest = {
        "n_chunks": written.count(),
        "n_docs": written.select("doc_id").distinct().count(),
        "n_input_docs": docs.count(),
        "chunk_size": args.chunk_size,
        "stride": args.stride,
        "rates_ppm": rates,
        "default_ppm": args.default_ppm,
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    with open(os.path.join(args.out, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    # bare-script invocation: sys.path[0] is jobs/, not the repo root
    import os as _os

    sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    )
    sys.exit(main())
