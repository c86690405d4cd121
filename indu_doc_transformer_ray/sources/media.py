"""Binary media sources: read a directory of image files as a Dataset and
decode through the multimodal kernels.

``read_media_files`` is the production on-ramp for the multimodal ops: it
streams raw bytes via ``ray.data.read_binary_files`` (each file stays one
row, never driver-collected), then an actor-pool stage decodes with the
SAME kernel ladder the span pipeline uses (PIL where the wheel exists,
the zero-dependency PPM parser, else the deterministic stub keyed by the
file path).  Reference analogue: the file frontend of
eplan_pdf_plugin.py:28-82, which walks a directory and yields per-file
records.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..functions.multimodal import (
    MEDIA_SCHEMA,
    _decode_stub,
    _feature8,
)


class _BytesDecoder:
    """Actor-pool stage over (bytes, path) rows: decode from MEMORY (no
    re-read), emit MEDIA_SCHEMA rows keyed by the file path."""

    def __init__(self):
        try:  # pragma: no cover - wheel absent in this container
            from PIL import Image  # noqa: F401

            self.have_pil = True
        except ImportError:
            self.have_pil = False

    def _decode(self, data: bytes, path: str):
        if self.have_pil:  # pragma: no cover - wheel absent here
            import io

            from PIL import Image

            try:
                with Image.open(io.BytesIO(data)) as im:
                    w, h = im.size
                    arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
                return w, h, len(data), _feature8(arr, w, h)
            except Exception:  # noqa: BLE001 - fall through to PPM/stub
                pass
        if data[:2] == b"P6":
            # in-memory P6 parse (the file-based kernel re-reads from disk;
            # here the bytes are already a Ray block)
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
            i += 1
            w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
            if maxval == 255:
                px = np.frombuffer(data, np.uint8, count=w * h * 3, offset=i)
                arr = px.reshape(h, w, 3).astype(np.float32) / 255.0
                return w, h, len(data), _feature8(arr, w, h)
        return _decode_stub(path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_SCHEMA.names}
        for data, path in zip(
            batch.column("bytes").to_pylist(), batch.column("path").to_pylist()
        ):
            w, h, nb, feat = self._decode(data, path)
            rows["doc_id"].append(os.path.basename(path))
            rows["media_ref"].append(path)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_bytes"].append(nb)
            rows["feature"].append(
                feat.tolist() if hasattr(feat, "tolist") else list(feat)
            )
        return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def read_media_files(path: str) -> Dataset:
    """Directory of image files -> MEDIA_SCHEMA Dataset (doc_id = file
    name, media_ref = full path).  Bytes stream block-by-block; decode is
    an actor pool with small batches (memory-aware: decoded planes are
    large)."""
    raw = ray.data.read_binary_files(path, include_paths=True)
    return raw.map_batches(
        _BytesDecoder,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 8),
    )
