"""Multimodal column plumbing: opaque binary/media-ref columns with typed
metadata, processed by actor-pool decode/feature stages.

The container has no image/audio libraries, so the DECODE KERNEL is stubbed
(`_decode_stub`, deterministic fake pixels from the ref hash; a real PIL
decode slots into the same actor `__call__` behind the import-try).  The
Ray-side plumbing — schema, batch sizing for large binary payloads, actor
signature, output layout — is real and tested (the graft spec asks exactly
for this split).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32(), 8)),
    ]
)


def _decode_stub(ref: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decode: dimensions + an 8-dim feature derived from
    the md5 of the media ref.  Replaced by a real decoder when PIL exists."""
    digest = hashlib.md5(ref.encode()).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_bytes = width * height * 3
    feat = np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, n_bytes, feat


class MediaFeatureExtractor:
    """Actor-pool stage over media spans: one 'model load' per actor in
    __init__ (stubbed), per-batch decode + feature extraction in __call__.
    Keep ``batch_size`` small for real binary payloads (ray_guide
    memory-aware sizing)."""

    def __init__(self):
        if HAVE_PIL:  # pragma: no cover
            self.decode = None  # a real decoder would be constructed here
        self.decode = _decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, widths, heights, n_bytes, feats = [], [], [], [], [], []
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for s in spans:
                if s["kind"] != "media":
                    continue
                w, h, nb, f = self.decode(s["media_ref"])
                doc_ids.append(doc_id)
                refs.append(s["media_ref"])
                widths.append(w)
                heights.append(h)
                n_bytes.append(nb)
                feats.append(f)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "media_ref": pa.array(refs, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), 8)
                ),
            },
            schema=MEDIA_SCHEMA,
        )


def media_features(docs: Dataset) -> Dataset:
    """docs(doc_id, spans) -> one row per media span with decode metadata +
    feature vector."""
    return docs.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=16,  # small: real media payloads are large
        concurrency=(1, 8),
    )
