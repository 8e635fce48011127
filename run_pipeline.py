#!/usr/bin/env python
"""spark-submit entry for the kgforge KG-construction pipeline.

Usage (sandbox):
    /opt/spark/bin/spark-submit --master local[32] \
        --py-files kgforge.zip run_pipeline.py \
        --sf-tag sf0.01 --work-dir /tmp/kgforge_run --resume

``--sf-tag`` resolves the committed fixture set (transcripts/gazetteer/
patterns); ``--input`` overrides with any transcript parquet of the
contract shape (conv_id, turn_idx, role, text, tool, ts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path (overrides --sf-tag)")
    ap.add_argument("--sf-tag", default="sf0.001", help="fixture tag: unit|sf0.001|sf0.01|sf0.1")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--fixture-dir", help="dir with gazetteer.parquet/patterns.parquet")
    ap.add_argument("--model", default="transe", choices=["transe", "transh", "transr", "transd"])
    ap.add_argument("--norm", type=int, default=1, choices=[1, 2])
    ap.add_argument("--out-partitions", type=int, default=16)
    ap.add_argument(
        "--embeddings-path", default=None,
        help="A20 Parquet embedding checkpoint dir (io_openke.write_embeddings_parquet "
             "layout); default: seeded frozen embeddings checkpointed under work-dir",
    )
    ap.add_argument(
        "--export-ntriples", action="store_true",
        help="also write the canonical triples as W3C N-Triples "
             "(materialize/openke/ntriples/, distributed io_rdf export)",
    )
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--stages", default=None, help="comma-separated subset")
    ap.add_argument("--master", default=None, help="override master (else spark-submit's)")
    ap.add_argument(
        "--warmup", action="store_true",
        help="run a throwaway unit-fixture pipeline first (same JVM) so "
             "codegen/Arrow/Python-worker warm-up is excluded from timings",
    )
    args = ap.parse_args()

    from kgforge.fixtures import ensure_fixtures
    from kgforge.pipeline import Pipeline
    from kgforge.session import get_spark

    if args.input:
        input_path = args.input
        fdir = args.fixture_dir or ensure_fixtures("unit")
    else:
        fdir = args.fixture_dir or ensure_fixtures(args.sf_tag)
        input_path = os.path.join(fdir, "transcripts.parquet")

    spark = get_spark(master=args.master, app_name="kgforge-pipeline")
    stages = args.stages.split(",") if args.stages else None
    if args.warmup:
        import shutil
        import tempfile

        wdir = ensure_fixtures("unit")
        wtmp = tempfile.mkdtemp(prefix="kgforge_warmup_")
        Pipeline(
            spark,
            input_path=os.path.join(wdir, "transcripts.parquet"),
            work_dir=wtmp,
            gazetteer_path=os.path.join(wdir, "gazetteer.parquet"),
            patterns_path=os.path.join(wdir, "patterns.parquet"),
            model=args.model,
            norm=args.norm,
            out_partitions=4,
        ).run(stages)
        shutil.rmtree(wtmp, ignore_errors=True)
    pipe = Pipeline(
        spark,
        input_path=input_path,
        work_dir=args.work_dir,
        gazetteer_path=os.path.join(fdir, "gazetteer.parquet"),
        patterns_path=os.path.join(fdir, "patterns.parquet"),
        model=args.model,
        norm=args.norm,
        out_partitions=args.out_partitions,
        resume=args.resume,
        embeddings_path=args.embeddings_path,
        export_ntriples=args.export_ntriples,
    )
    report = pipe.run(stages)
    print(json.dumps(report, indent=1, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
