"""CLI entry point — the `just stream` / `just backfill` analog
(reference ``justfile:28-49``).

    python -m arcane_stream_sqlserver_change_tracking_ray stream --spec spec.json [--max-cycles N] [--max-seconds S]
    python -m arcane_stream_sqlserver_change_tracking_ray backfill --spec spec.json
    python -m arcane_stream_sqlserver_change_tracking_ray prepare-watermark --target DIR [--version V] [--partitions P]
    python -m arcane_stream_sqlserver_change_tracking_ray maintenance --spec spec.json
    python -m arcane_stream_sqlserver_change_tracking_ray gen-ctlog --out DIR --events N --keys K

The spec may also come from the ``STREAMCONTEXT__SPEC`` env var, and
``STREAMCONTEXT__BACKFILL=true`` switches mode — the reference's env
contract (``dev.env.example:39``, ``StreamRunner.scala:209-210``).

This script OWNS its Ray session (guarded init), unlike the library.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_ctx(args):
    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext

    if getattr(args, "spec", None):
        with open(args.spec, encoding="utf-8") as f:
            ctx = StreamContext.from_json(f.read())
        env_ctx = StreamContext.from_env()
        ctx.stream_mode.backfill = ctx.stream_mode.backfill or env_ctx.stream_mode.backfill
        if env_ctx.stream_mode.backfill_id:
            ctx.stream_mode.backfill_id = env_ctx.stream_mode.backfill_id
        return ctx
    return StreamContext.from_env()


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="arcane_stream_sqlserver_change_tracking_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("stream", help="run the change-capture stream loop")
    sp.add_argument("--spec")
    sp.add_argument("--max-cycles", type=int, default=None)
    sp.add_argument("--max-seconds", type=float, default=None)

    bp = sub.add_parser("backfill", help="run a backfill (overwrite|merge)")
    bp.add_argument("--spec")

    wp = sub.add_parser("prepare-watermark", help="bootstrap a target's manifest")
    wp.add_argument("--target", required=True)
    wp.add_argument("--version", type=int, default=0)
    wp.add_argument("--partitions", type=int, default=16)

    mp = sub.add_parser("maintenance", help="run OPTIMIZE/expire/ANALYZE now")
    mp.add_argument("--spec")

    gp = sub.add_parser("gen-ctlog", help="generate a synthetic change log")
    gp.add_argument("--out", required=True)
    gp.add_argument("--events", type=int, default=100_000)
    gp.add_argument("--keys", type=int, default=10_000)
    gp.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    if args.cmd == "prepare-watermark":
        from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
            prepare_watermark,
        )

        m = prepare_watermark(args.target, args.version, num_partitions=args.partitions)
        print(json.dumps({"version": m.version, "watermark": m.watermark}))
        return 0

    if args.cmd == "gen-ctlog":
        from arcane_stream_sqlserver_change_tracking_ray.gen import CtLogSpec, write_ctlog

        _init_ray()
        paths = write_ctlog(
            args.out,
            CtLogSpec(n_keys=args.keys, n_events=args.events, seed=args.seed),
            use_ray=True,
        )
        print(json.dumps({"segments": len(paths), "out": args.out}))
        return 0

    ctx = _load_ctx(args)
    _init_ray()
    if args.cmd == "maintenance":
        # explicit subcommand wins: a leftover STREAMCONTEXT__BACKFILL=true
        # in the environment must not turn a compaction into a backfill
        from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
            run_maintenance,
        )
        from arcane_stream_sqlserver_change_tracking_ray.state.manifest import ManifestLog

        out = run_maintenance(ManifestLog(ctx.sink.target_root), ctx)
        print(json.dumps(out))
        return 0
    if args.cmd == "backfill" or ctx.stream_mode.backfill:
        from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import StreamRunner

        m = StreamRunner(ctx).run_backfill()
        print(json.dumps({"version": m.version, "watermark": m.watermark}))
        return 0
    if args.cmd == "stream":
        from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
            PosixLifetime,
            StreamRunner,
        )

        # SIGTERM/SIGINT drain the in-flight cycle and stop cleanly
        # between cycles (reference PosixStreamLifetimeService)
        lifetime = PosixLifetime()
        metrics = StreamRunner(ctx).run(
            max_cycles=args.max_cycles,
            max_seconds=args.max_seconds,
            stop_check=lifetime.stopped,
        )
        print(
            json.dumps(
                {
                    "cycles": len(metrics),
                    "stopped_by_signal": lifetime.stopped(),
                    "metrics": metrics[-1] if metrics else {},
                }
            )
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
