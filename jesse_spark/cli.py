"""spark-submit entrypoint (north_rule: packaged for --py-files).

Usage::

    zip -r jesse_spark.zip jesse_spark
    spark-submit --py-files jesse_spark.zip -m jesse_spark.cli ...   # or
    spark-submit --py-files jesse_spark.zip cli.py validate \\
        --input  <parquet/iceberg path or table>            \\
        --schema schema.json                                 \\
        --output /out/violations                             \\
        [--codecs <ref table path>] [--checkpoint-dir /ckpt] \\
        [--run-id r1] [--shards 256] [--json-reports /out/reports]

Mirrors the reference CLI contract (jesse_cli.erl:36-97): load
schema(s), validate every instance, emit verdicts + error reports,
non-zero exit when any instance failed (halt(1), jesse_cli.erl:80-87).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def _read_input(spark, path: str):
    if path.endswith(".parquet") or "/" in path:
        return spark.read.parquet(path)
    return spark.read.table(path)  # Iceberg / catalog table


def cmd_validate(args) -> int:
    from jesse_spark.plans.checkpoint import (
        CheckpointManager, input_snapshot_id, shard_verdicts, with_shard)
    from jesse_spark.plans.pipeline import run_full_suite
    from jesse_spark.plans.report import write_json_reports, write_violations
    from jesse_spark.session import get_spark
    from jesse_spark.sources.fixtures import codecs_df

    spark = get_spark("jesse-spark-validate", master=args.master)
    clips = _read_input(spark, args.input)
    schema = json.loads(open(args.schema).read()) if args.schema else None
    codecs = _read_input(spark, args.codecs) if args.codecs else codecs_df(spark)

    t0 = time.time()
    cm = snap = None
    if args.checkpoint_dir:
        snap = input_snapshot_id(spark, args.input)
        cm = CheckpointManager(spark, args.checkpoint_dir)
        clips = with_shard(clips, args.key, args.shards)
        clips = cm.pending(clips, args.run_id, snap)

    res = run_full_suite(clips, codecs, schema=schema,
                         with_audio=not args.no_audio)
    write_violations(res.violations, args.output)
    if args.json_reports:
        write_json_reports(res.validated, args.json_reports, key_col=args.key)

    if cm is not None:
        cm.record(args.run_id, snap, shard_verdicts(res.validated),
                  wall_sec=time.time() - t0)

    verd = res.verdicts.agg(
        F.sum("rows").alias("rows"),
        F.sum("invalid_rows").alias("invalid")).head()
    print(json.dumps({
        "rows": verd["rows"] or 0,
        "invalid_rows": verd["invalid"] or 0,
        "wall_sec": round(time.time() - t0, 2),
        "violations_path": args.output,
    }))
    spark.stop()
    # halt(1) on any failing instance, like the reference CLI
    return 1 if (verd["invalid"] or 0) > 0 else 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jesse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("validate")
    v.add_argument("--input", required=True)
    v.add_argument("--schema", default=None, help="JSON-Schema file; default = clips suite")
    v.add_argument("--output", required=True)
    v.add_argument("--codecs", default=None)
    v.add_argument("--key", default="clip_id")
    v.add_argument("--master", default=None)
    v.add_argument("--checkpoint-dir", default=None)
    v.add_argument("--run-id", default="run-default")
    v.add_argument("--shards", type=int, default=256)
    v.add_argument("--json-reports", default=None)
    v.add_argument("--no-audio", action="store_true")
    v.set_defaults(fn=cmd_validate)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
