"""Deterministic single-core microbench for the fused mention+link stage.

Measures ``time.process_time`` over a fixed turn sample (no Ray, no wall-clock
noise — this sandbox has ±20% machine-level variance; CPU time is stable to
~2%). This is the verification harness for scaling work: the fused stage is
memory-bandwidth-bound at high actor counts, so cutting per-turn allocation
both raises single-core throughput AND improves the 8→32 efficiency.

Usage:
    python tools/microbench.py [--turns 20000] [--profile] [--stage mention|fused]
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")


def build_state(sf: float = 0.01):
    import pyarrow.parquet as pq

    from address_semantic_search_ray.data.synth import ensure_dataset
    from address_semantic_search_ray.kernel.interpreter import Interpreter
    from address_semantic_search_ray.kernel.npindex import NpCorpusIndex
    from address_semantic_search_ray.kernel.regions import RegionDict
    from address_semantic_search_ray.pipelines.oracle import default_region_dict_path
    from address_semantic_search_ray.stages.idf import driver_idf
    from address_semantic_search_ray.stages.interpret import CorpusInterpretStage

    data_dir = ensure_dataset(sf)
    regions = RegionDict.from_parquet(default_region_dict_path())
    trie = Interpreter(regions).trie
    region_bytes = pickle.dumps((regions, trie), protocol=5)

    stage = CorpusInterpretStage(region_bytes)
    import glob
    import os

    addr_dir = os.path.join(data_dir, "addresses.parquet")
    files = sorted(glob.glob(os.path.join(addr_dir, "*.parquet")))
    import pyarrow as pa

    tbl = pa.concat_tables(pq.read_table(f, columns=["addr_id", "text"]) for f in files)
    corpus_tbl = stage(tbl)
    idf_tbl = driver_idf(corpus_tbl)
    payload = NpCorpusIndex.from_tables(
        corpus_tbl.drop_columns(["term_keys"]), idf_tbl).to_payload()

    tr_dir = os.path.join(data_dir, "transcripts.parquet")
    tfiles = sorted(glob.glob(os.path.join(tr_dir, "*.parquet")))
    turns = pa.concat_tables(
        pq.read_table(f, columns=["conv_id", "turn_idx", "role", "text"]) for f in tfiles)
    return region_bytes, payload, turns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--stage", default="fused", choices=["fused", "mention"])
    args = ap.parse_args()

    region_bytes, payload, turns = build_state(args.sf)
    n = min(args.turns, turns.num_rows)
    turns = turns.slice(0, n)

    if args.stage == "fused":
        from address_semantic_search_ray.stages.fused import MentionLinkTriplesStage

        st = MentionLinkTriplesStage(region_bytes, payload)
    else:
        from address_semantic_search_ray.stages.interpret import MentionStage

        st = MentionStage(region_bytes)

    batches = [turns.slice(i, args.batch) for i in range(0, n, args.batch)]
    # warm-up (jit-free python, but warms caches / memo)
    st(batches[0])

    def run():
        rows = 0
        for b in batches:
            rows += st(b).num_rows
        return rows

    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run()
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(40)
        return

    t0 = time.process_time()
    rows = run()
    dt = time.process_time() - t0
    print(f"stage={args.stage} turns={n} out_rows={rows} "
          f"cpu_sec={dt:.3f} turns_per_sec={n / dt:.1f}")


if __name__ == "__main__":
    main()
