"""Multimodal column plumbing (task-brief first-class op).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata.  The Spark-side plumbing — schema, batch shape, partition-safe
mapInPandas signatures — is real and tested; the codec calls themselves
are STUBBED (this container ships no image/audio libraries): decode is a
deterministic fake when ``ALLOW_FAKE_DECODE`` and raises
``NotImplementedError`` otherwise, with the integration point documented.

At 100 TB the contract matters more than the codec: blobs ride the Arrow
batches (small maxRecordsPerBatch, see session.py), metadata columns stay
prunable, and frame-sampling fans one row out to N without shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

ALLOW_FAKE_DECODE = True  # flip off in production to surface the stub

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, "
    "feat array<double>"
)
FRAME_SCHEMA = "media_id long, frame_no int, frame binary"


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder.

    Production integration point: replace with PIL/torchvision/librosa
    decode + model forward inside the same batch loop — the Arrow batch
    shape and output schema stay identical.
    """
    if not ALLOW_FAKE_DECODE:
        raise NotImplementedError(
            "real media decode requires image/audio libs not present here"
        )
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(media_df):
    """binary payload -> fixed-dim feature vector via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feat": pdf["payload"].map(_fake_decode_features),
                }
            )
            yield out

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media_df, every_n_bytes: int = 1024, max_frames: int = 4):
    """Frame sampling: 1 video row -> N frame rows (UDTF-style fan-out).

    The fake 'frame' is a byte slice; a real implementation swaps the
    slicer for a container demuxer with the same 1->N output contract.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not ALLOW_FAKE_DECODE:
                    raise NotImplementedError("real demux not available")
                data = payload or b""
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    ids.append(mid)
                    frame_nos.append(i)
                    frames.append(data[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame": frames}
            )

    return media_df.mapInPandas(batches, FRAME_SCHEMA)
