"""Multimodal column plumbing: opaque binary/media-ref columns with typed
metadata, processed by actor-pool decode/feature stages.

Decode kernels, most-capable first: PIL for general formats (import-gated —
the wheel is absent in this container), a zero-dependency numpy PPM (P6)
parser for refs that resolve to real files (`_decode_ppm`, test-covered
end-to-end through the actor stage), and a deterministic stub for
unresolvable refs (always the case for the synthetic corpus, whose media
refs are opaque strings).  The Ray-side plumbing — schema, batch sizing for
large binary payloads, actor signature, output layout — is identical across
kernels (the graft spec asks exactly for this split).
"""

from __future__ import annotations

import hashlib
import os

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
    the md5 of the media ref.  Used when the ref does not resolve to a real
    decodable file (always the case for the synthetic corpus)."""
    digest = hashlib.md5(ref.encode()).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_bytes = width * height * 3
    feat = np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, n_bytes, feat


def _feature8(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """The 8-dim summary feature shared by every real decode branch:
    per-channel mean/std, aspect ratio, log-area."""
    return np.array(
        [
            arr[..., 0].mean(), arr[..., 1].mean(), arr[..., 2].mean(),
            arr[..., 0].std(), arr[..., 1].std(), arr[..., 2].std(),
            w / (h or 1), np.log1p(float(w) * h) / 20.0,
        ],
        dtype=np.float32,
    )


def _decode_ppm(path: str) -> tuple[int, int, int, np.ndarray]:
    """Real decode kernel, zero dependencies: binary PPM (P6) — header
    'P6 <w> <h> <maxval>' with comment support, then raw RGB rows — parsed
    with numpy.  This is the container-proof real path; PIL (below) covers
    general formats where the wheel exists."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P6"):
        raise ValueError(f"not a P6 PPM: {path}")
    # tokenize header: magic, width, height, maxval (comments start with #)
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(data) and not data[i : i + 1].isspace():
            i += 1
        tokens.append(data[start:i])
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    arr = px.reshape(h, w, 3).astype(np.float32) / 255.0
    return w, h, os.path.getsize(path), _feature8(arr, w, h)


def _decode_pil(path: str) -> tuple[int, int, int, np.ndarray]:  # pragma: no cover — exercised only where the PIL wheel exists
    """Real decode kernel: PIL open + an 8-dim summary feature (per-channel
    mean/std, aspect ratio, log-area).  Deterministic for a fixed file."""
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return w, h, os.path.getsize(path), _feature8(arr, w, h)


class MediaFeatureExtractor:
    """Actor-pool stage over media spans: one 'model load' per actor in
    __init__, per-batch decode + feature extraction in __call__.  A media
    ref that resolves to an on-disk file decodes through PIL when the wheel
    exists (``_decode_pil``, skipif-gated test); anything else uses the
    deterministic stub.  Keep ``batch_size`` small for real binary payloads
    (ray_guide memory-aware sizing)."""

    def __init__(self, media_root: str = ""):
        self.media_root = media_root
        self.use_pil = HAVE_PIL

    def decode(self, ref: str) -> tuple[int, int, int, np.ndarray]:
        path = os.path.join(self.media_root, ref) if self.media_root else ref
        if os.path.isfile(path):
            if self.use_pil:
                return _decode_pil(path)
            with open(path, "rb") as f:
                if f.read(2) == b"P6":
                    return _decode_ppm(path)
        return _decode_stub(ref)

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


def media_features(docs: Dataset, media_root: str = "") -> Dataset:
    """docs(doc_id, spans) -> one row per media span with decode metadata +
    feature vector.  ``media_root`` prefixes refs so refs that resolve to
    real files decode for real (PPM always; any format where PIL exists)."""
    return docs.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"media_root": media_root},
        batch_format="pyarrow",
        batch_size=16,  # small: real media payloads are large
        concurrency=(1, 8),
    )
