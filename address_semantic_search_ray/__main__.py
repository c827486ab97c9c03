"""CLI entry point — usable directly or via ``ray job submit``:

    python -m address_semantic_search_ray kg --data /tmp/asr_synth/sf0.01 \
        --work /tmp/kg_work [--mode checkpoint|streaming] [--concurrency 28]
    ray job submit -- python -m address_semantic_search_ray kg --data ... --work ...

Owns the Ray session (guarded init), unlike the library/driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="address_semantic_search_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="run the KG-construction pipeline")
    kg.add_argument("--data", required=True, help="dir with addresses.parquet + transcripts.parquet")
    kg.add_argument("--work", required=True, help="output/checkpoint dir")
    kg.add_argument("--mode", choices=["checkpoint", "streaming"], default="checkpoint")
    kg.add_argument("--concurrency", type=int, default=8)
    kg.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init num_cpus (omit on a cluster: uses existing resources)")
    kg.add_argument("--no-resume", action="store_true")

    synth = sub.add_parser("synth", help="generate a synthetic dataset")
    synth.add_argument("--sf", type=float, default=0.01)
    synth.add_argument("--root", default="/tmp/asr_synth")
    synth.add_argument("--multiplier", type=float, default=1.0)

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from .data.synth import ensure_dataset

        out = ensure_dataset(args.sf, root=args.root, multiplier=args.multiplier)
        print(json.dumps({"dataset": out}))
        return 0

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if args.num_cpus is not None:
            kwargs["num_cpus"] = args.num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.kg import run_kg_pipeline, run_kg_streaming

    t0 = time.time()
    if args.mode == "streaming":
        res = run_kg_streaming(args.data, args.work, concurrency=args.concurrency)
    else:
        res = run_kg_pipeline(args.data, args.work, concurrency=args.concurrency,
                              resume=not args.no_resume)
    wall = time.time() - t0
    print(json.dumps({"mode": args.mode, "wall_sec": round(wall, 2),
                      "triples": res["triples"],
                      "stages": res.get("metrics", "streaming: single job")},
                     default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
