"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE itself is stubbed
(gated behind an import-try; deterministic fake metadata otherwise) — but the
Ray-side plumbing is real: binary column in Arrow batches, actor-pool stage
with per-actor setup, small batch sizes for wide rows, metadata-only output.
"""

from __future__ import annotations

import pyarrow as pa


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, payload:binary) — deterministic fake 'image' bytes."""
    texts = batch.column("text").to_pylist()
    payloads = [t.encode("utf-8") for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "payload": pa.array(payloads, pa.binary()),
    })


class ImageDecodeStub:
    """Actor-pool decode stage. Real decoders load once per actor in
    ``__init__``; without codecs we emit deterministic fake metadata derived
    from the payload bytes (SQL-checkable)."""

    def __init__(self):
        try:  # pragma: no cover - codec not present in this container
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_bytes, widths, heights = [], [], []
        for p in payloads:
            nb = len(p)
            n_bytes.append(nb)
            if self._pil:
                # real path would be: PIL.Image.open(io.BytesIO(p)).size
                raise NotImplementedError("real image decode not wired in this container")
            widths.append(64 + nb % 577)
            heights.append(64 + (nb * 31) % 419)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
        })


class AudioFrameSampleStub:
    """Frame-sampling plumbing for audio/video payloads: fixed-stride byte
    windows as 'frames' (real decoder would yield PCM frames)."""

    def __init__(self, frame_bytes: int = 64, stride: int = 128):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for doc_id, p in zip(batch.column("doc_id").to_pylist(),
                             batch.column("payload").to_pylist()):
            for off in range(0, max(len(p) - self.frame_bytes, 0) + 1, self.stride):
                ids.append(doc_id)
                offs.append(off)
                frames.append(p[off:off + self.frame_bytes])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_off": pa.array(offs, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })
