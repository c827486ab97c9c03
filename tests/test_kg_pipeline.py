"""End-to-end: Ray KG pipeline triples == single-process oracle triples.

This is the binding P/R gate (BASELINE.md): both sides share the kernel, so
the comparison isolates orchestration — partitioning, shuffles, stable turn
ordering, dedup. Also covers resume-from-checkpoint semantics.
"""

from __future__ import annotations

import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from address_semantic_search_ray.data.synth import ensure_dataset
from address_semantic_search_ray.pipelines.oracle import run_oracle


@pytest.fixture(scope="module")
def tiny_data():
    return ensure_dataset(0.001, root="/tmp/asr_synth_test")


def _triple_set(table):
    return set(zip(
        table.column("subj").to_pylist(),
        table.column("pred").to_pylist(),
        table.column("obj").to_pylist(),
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("district_key").to_pylist(),
        [round(s, 9) for s in table.column("score").to_pylist()],
    ))


@pytest.fixture(scope="module")
def pipeline_result(ray_session, tiny_data, tmp_path_factory):
    from address_semantic_search_ray.pipelines.kg import run_kg_pipeline

    work = str(tmp_path_factory.mktemp("kgwork"))
    result = run_kg_pipeline(tiny_data, work, concurrency=2, salt=1)
    return result


def test_triples_match_oracle(tiny_data, pipeline_result):
    oracle = run_oracle(tiny_data)
    ray_triples = pq.read_table(pipeline_result["triples"])
    o, r = _triple_set(oracle), _triple_set(ray_triples)
    missing = o - r
    extra = r - o
    precision = 1 - len(extra) / max(len(r), 1)
    recall = 1 - len(missing) / max(len(o), 1)
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.3f} R={recall:.3f}; missing={list(missing)[:3]} extra={list(extra)[:3]}"
    )
    # both sides share the kernel: expect exact equality, not just >=0.95
    assert o == r


def test_per_turn_text_equality(tiny_data, pipeline_result):
    """Mentions checkpoint must reflect the source turns exactly: every
    (conv_id, turn_idx) it references exists in the input with the same text
    ordering (stable turn ordering invariant)."""
    transcripts = pq.read_table(tiny_data + "/transcripts.parquet",
                                columns=["conv_id", "turn_idx", "text"])
    turns = {(c, t): x for c, t, x in zip(
        transcripts.column("conv_id").to_pylist(),
        transcripts.column("turn_idx").to_pylist(),
        transcripts.column("text").to_pylist())}
    mentions = pq.read_table(pipeline_result["mentions"])
    for c, t, residual in zip(
        mentions.column("conv_id").to_pylist(),
        mentions.column("turn_idx").to_pylist(),
        mentions.column("residual").to_pylist(),
    ):
        assert (c, t) in turns
        # the mention's residual text must be a derivation of that exact turn
        assert residual == "" or any(ch in turns[(c, t)] for ch in residual[:3])


def test_linking_accuracy_vs_truth(tiny_data, pipeline_result):
    """Top-1 link recovers the embedded ground-truth address (>=0.9 of
    linkable mentions; small-district idf degeneracy is expected tail)."""
    truth = pq.read_table(tiny_data + "/mentions_truth.parquet")
    tt = {(c, t): a for c, t, a in zip(
        truth.column("conv_id").to_pylist(),
        truth.column("turn_idx").to_pylist(),
        truth.column("addr_id").to_pylist())}
    links = pq.read_table(pipeline_result["links"])
    hit = wrong = 0
    for c, t, linked in zip(
        links.column("conv_id").to_pylist(),
        links.column("turn_idx").to_pylist(),
        links.column("linked_addr").to_pylist(),
    ):
        want = tt.get((c, t))
        if want is None:
            continue
        if linked == want:
            hit += 1
        else:
            wrong += 1
    assert hit / max(hit + wrong, 1) >= 0.9


def test_resume_skips_completed_stages(ray_session, tiny_data, pipeline_result):
    from address_semantic_search_ray.pipelines.kg import run_kg_pipeline

    work = pipeline_result["triples"].rsplit("/", 1)[0]
    # rerun: everything skipped
    res2 = run_kg_pipeline(tiny_data, work, concurrency=2, salt=1)
    assert all(m["skipped"] for m in res2["metrics"])
    # invalidate one mid-pipeline stage: only it and downstream rerun
    shutil.rmtree(pipeline_result["links"])
    res3 = run_kg_pipeline(tiny_data, work, concurrency=2, salt=1)
    by_stage = {m["stage"]: m["skipped"] for m in res3["metrics"]}
    assert by_stage["doc_vectors"] and by_stage["idf"] and by_stage["mentions"]
    assert not by_stage["links"] and not by_stage["triples"]
    # and the re-built output still matches the oracle
    oracle = run_oracle(tiny_data)
    assert _triple_set(oracle) == _triple_set(pq.read_table(res3["triples"]))


def test_salted_linking_is_invariant(ray_session, tiny_data, tmp_path_factory, pipeline_result):
    from address_semantic_search_ray.pipelines.kg import run_kg_pipeline

    work = str(tmp_path_factory.mktemp("kgwork_salted"))
    res = run_kg_pipeline(tiny_data, work, concurrency=2, salt=4)
    a = pq.read_table(res["triples"])
    b = pq.read_table(pipeline_result["triples"])
    assert _triple_set(a) == _triple_set(b)


def test_streaming_mode_matches_checkpointed(ray_session, tiny_data, tmp_path_factory, pipeline_result):
    """Broadcast-index streaming mode must emit byte-identical triples."""
    from address_semantic_search_ray.pipelines.kg import run_kg_streaming

    out = str(tmp_path_factory.mktemp("kgstream"))
    res = run_kg_streaming(tiny_data, out, concurrency=2)
    a = pq.read_table(res["triples"])
    b = pq.read_table(pipeline_result["triples"])
    assert _triple_set(a) == _triple_set(b)


def test_streaming_distributed_corpus_path_matches(ray_session, tiny_data, tmp_path_factory,
                                                   pipeline_result, monkeypatch):
    """The big-corpus branch (distributed interpret + sharded per-bucket
    index build, no driver funnel) must emit the same triples as the
    small-corpus overlapped single-task branch."""
    from address_semantic_search_ray.pipelines import kg

    monkeypatch.setattr(kg, "SMALL_INDEX_OVERLAP_MAX_BYTES", 0)  # force sharded
    out = str(tmp_path_factory.mktemp("kgstream_dist"))
    res = kg.run_kg_streaming(tiny_data, out, concurrency=2)
    a = pq.read_table(res["triples"])
    b = pq.read_table(pipeline_result["triples"])
    assert _triple_set(a) == _triple_set(b)


def test_streaming_oversized_corpus_routes_to_checkpointed(ray_session, tiny_data,
                                                           tmp_path_factory,
                                                           pipeline_result, monkeypatch):
    """A corpus whose estimated index exceeds the broadcast budget must fall
    back to the checkpointed pipeline — and still produce the same triples."""
    from address_semantic_search_ray.pipelines import kg

    monkeypatch.setattr(kg, "BROADCAST_INDEX_MAX_BYTES", 0)
    out = str(tmp_path_factory.mktemp("kgstream_over"))
    res = kg.run_kg_streaming(tiny_data, out, concurrency=2)
    assert res.get("mode") == "checkpointed-fallback"
    a = pq.read_table(res["triples"])
    b = pq.read_table(pipeline_result["triples"])
    assert _triple_set(a) == _triple_set(b)


def test_estimate_index_bytes_tracks_measured(ray_session, tiny_data):
    """The footer-only estimator must bound the real payload size from above
    without absurd overshoot (x1..x3)."""
    import numpy as np

    from address_semantic_search_ray.pipelines import kg
    from address_semantic_search_ray.stages.interpret import put_region_table

    est = kg.estimate_index_bytes(tiny_data + "/addresses.parquet")
    region_ref = put_region_table(
        kg.default_region_dict_path())
    payload = kg._build_small_corpus_index_impl(
        tiny_data + "/addresses.parquet", region_ref)
    real = sum(a.nbytes for a in payload.values() if isinstance(a, np.ndarray))
    assert real <= est <= real * 3


def test_linker_pool_balances_under_district_skew(ray_session, tiny_data,
                                                  tmp_path, monkeypatch):
    """North-rule skew handling, asserted rather than argued: ONE district
    carries 90% of all mentions. The checkpointed link stage's shape —
    sort(district_key) clusters the hot key, the order-preserving
    repartition slices it into many bundles, small link_batch_size bounds
    each bundle — must let the actor pool spread the hot district: per-actor
    processed-row counts within ~2x of each other (the same effect salting
    would buy, without a second shuffle)."""
    import glob
    import os

    import pyarrow as pa

    from address_semantic_search_ray.kernel.interpreter import Interpreter
    from address_semantic_search_ray.kernel.regions import RegionDict
    from address_semantic_search_ray.pipelines import kg as kgmod
    from address_semantic_search_ray.pipelines.oracle import default_region_dict_path
    from address_semantic_search_ray.stages.link import LinkerActor

    data_dir = str(tmp_path / "skewdata")
    os.makedirs(data_dir)
    # the synth addresses checkpoint is a multi-file dir: fold to one file
    addr_all = pq.read_table(os.path.join(tiny_data, "addresses.parquet"))
    pq.write_table(addr_all, os.path.join(data_dir, "addresses.parquet"))
    addr = addr_all.select(["text"])
    it = Interpreter(RegionDict.from_parquet(default_region_dict_path()))
    interpretable = []
    for t in addr.column("text").to_pylist():
        if not t:
            continue
        a = it.interpret(t)
        if a is not None and a.city is not None and a.district is not None:
            interpretable.append(t)
        if len(interpretable) >= 100:
            break
    hot, others = interpretable[0], interpretable[1:]
    n = 12000
    texts = [hot if i % 10 else others[(i // 10) % len(others)]
             for i in range(n)]
    pq.write_table(pa.table({
        "conv_id": pa.array([f"conv{i % 500}" for i in range(n)], pa.string()),
        "turn_idx": pa.array([i // 500 for i in range(n)], pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(data_dir, "transcripts.parquet"))

    cnt_dir = str(tmp_path / "cnt")
    os.makedirs(cnt_dir)

    class CountingLinker(LinkerActor):
        def __call__(self, batch):
            out = super().__call__(batch)
            self._rows = getattr(self, "_rows", 0) + batch.num_rows
            with open(os.path.join(cnt_dir, f"{os.getpid()}.cnt"), "w") as f:
                f.write(str(self._rows))
            return out

    monkeypatch.setattr(kgmod, "LinkerActor", CountingLinker)
    kgmod.run_kg_pipeline(data_dir, str(tmp_path / "work"), concurrency=2,
                          link_batch_size=128, resume=False)

    counts = [int(open(f).read())
              for f in glob.glob(os.path.join(cnt_dir, "*.cnt"))]
    assert sum(counts) >= n  # every turn carries >=1 mention by construction
    assert len(counts) == 2, counts  # both pool actors actually participated
    assert max(counts) <= 2.0 * min(counts), counts


def test_streaming_invariant_under_tiny_blocks(ray_session, tiny_data,
                                               tmp_path_factory,
                                               pipeline_result):
    """Block partitioning must not leak into results: forcing Ray Data to
    split the stream into ~64 KiB blocks (hundreds of blocks where the
    default makes a handful — the memory-bounded regime a 100 TB run lives
    in, where the object store spills rather than holding whole partitions)
    emits the same triples byte-for-byte."""
    from ray.data import DataContext

    from address_semantic_search_ray.pipelines.kg import run_kg_streaming

    ctx = DataContext.get_current()
    before = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        out = str(tmp_path_factory.mktemp("kgstream_tinyblocks"))
        res = run_kg_streaming(tiny_data, out, concurrency=2, batch_size=64)
        a = pq.read_table(res["triples"])
    finally:
        ctx.target_max_block_size = before
    b = pq.read_table(pipeline_result["triples"])
    assert _triple_set(a) == _triple_set(b)
