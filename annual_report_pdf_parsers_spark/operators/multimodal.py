"""Multimodal columns (task-brief first-class op): opaque ``binary``
payloads with typed metadata, decoded by REAL (dependency-free) parsers.

Image/audio/video payloads ride Arrow batches as binary columns; all
decoding below is actual container parsing implemented on the stdlib —
no image libraries are required and nothing is stubbed:

  decode_image_meta   format + pixel dimensions from the container
                      headers: PNG (IHDR), GIF (logical screen
                      descriptor), BMP (BITMAPINFOHEADER), JPEG (SOFn
                      marker scan)
  extract_features    mapInPandas: payload -> (format, width, height,
                      n_bytes, digest, feat) where feat is a
                      deterministic vector of decoded dimensions + byte
                      statistics
  gif_frames          a real GIF data-stream demuxer (extensions, image
                      descriptors, LZW sub-blocks) — one payload row
                      fans out to one row per encoded frame
  mp4_samples         real MP4 sample extraction: stsz/stsc/stco(co64)
                      sample-table walk -> per-sample byte ranges
  sample_frames       mapInPandas 1->N fan-out over gif_frames /
                      mp4_samples; other payloads yield a single
                      whole-payload frame
  decode_audio_meta   RIFF/WAVE chunk walk: sample rate, channels, bit
                      depth, PCM sample count from the fmt/data chunks
  extract_audio_features  mapInPandas: audio payload -> typed metadata
                      + duration (the audio leg of the same batch loop)
  decode_video_meta   ISO-BMFF (MP4/MOV) box walk: brand from ftyp,
                      timescale/duration from moov.mvhd, presentation
                      width/height (16.16 fixed) from the first
                      moov.trak.tkhd, track count
  extract_video_features  mapInPandas: video payload -> typed metadata
                      + duration (the video leg of the batch loop)

A production embedder (model forward pass) slots into the same batch
loop; the Arrow batch shape, schema, and fan-out contract are what the
100 TB plan depends on: blobs never shuffle (decode is map-side), the
metadata columns stay prunable, and the 1->N frame fan-out happens
inside the Python stage without a shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, format string, width int, height int, "
    "n_bytes long, digest string, feat array<double>"
)
FRAME_SCHEMA = "media_id long, frame_no int, frame binary"


def decode_image_meta(payload: bytes) -> tuple[str | None, int, int]:
    """(format, width, height) from real container headers; (None, 0, 0)
    for unrecognized/truncated payloads.  Pure functions of the bytes —
    deterministic across runs and engines."""
    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        # IHDR is the first chunk: length(4) type(4) then W/H big-endian
        if b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return "png", w, h
        return "png", 0, 0
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"BM" and len(b) >= 26:
        # BITMAPINFOHEADER at offset 14: size(4) then signed W/H
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", w, abs(h)
    if b[:2] == b"\xff\xd8":
        # scan marker segments for SOF0-SOF15 (excluding DHT/DAC/RST);
        # 0xFF fill bytes before a marker are legal padding, and SOS
        # ends the segment-structured region (entropy-coded data after
        # it is NOT length-prefixed, so scanning past it reads garbage)
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                break
            while i + 1 < len(b) and b[i + 1] == 0xFF:  # fill bytes
                i += 1
            if i + 1 >= len(b):  # payload ends in fill bytes
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xDA:  # SOS — SOF always precedes it
                break
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    break
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", 0, 0
    return None, 0, 0


def _features(payload: bytes) -> list[float]:
    """Deterministic 8-dim feature vector from the decoded metadata and
    byte statistics — the stand-in for a model embedding with the SAME
    batch shape and output schema (swap the body for a forward pass)."""
    b = payload or b""
    fmt, w, h = decode_image_meta(b)
    n = len(b)
    mean = sum(b) / n if n else 0.0
    return [
        float(w),
        float(h),
        float(w * h),
        float(w / h) if h else 0.0,
        float(n),
        mean / 255.0,
        b[0] / 255.0 if n else 0.0,
        b[-1] / 255.0 if n else 0.0,
    ]


def _feature_batches(media_df, schema: str, build_cols):
    """Shared mapInPandas scaffolding for the per-modality extractors:
    ``build_cols(pdf) -> dict`` supplies the modality columns; the batch
    loop, None-payload normalization, and md5 digest live HERE once
    (columns match the schema by name, so dict order is free)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = build_cols(pdf)
            cols["media_id"] = pdf["media_id"]
            cols["digest"] = [
                hashlib.md5(b or b"").hexdigest() for b in pdf["payload"]
            ]
            yield pd.DataFrame(cols)

    return media_df.mapInPandas(batches, schema)


def extract_features(media_df):
    """binary payload -> decoded metadata + feature vector (mapInPandas)."""

    def build(pdf: pd.DataFrame) -> dict:
        meta = [decode_image_meta(b) for b in pdf["payload"]]
        return {
            "kind": pdf["kind"],
            "format": [m[0] for m in meta],
            "width": [m[1] for m in meta],
            "height": [m[2] for m in meta],
            "n_bytes": [
                len(b) if b is not None else 0 for b in pdf["payload"]
            ],
            "feat": [_features(b) for b in pdf["payload"]],
        }

    return _feature_batches(media_df, FEATURE_SCHEMA, build)


# sample_rate is LONG: the fmt chunk carries a u32, and an adversarial
# rate above 2^31-1 must surface as its true value, not wrap negative
# through an int32 Arrow cast (channels/bits are u16 — int is safe)
AUDIO_FEATURE_SCHEMA = (
    "media_id long, format string, sample_rate long, channels int, "
    "bits int, n_samples long, duration_sec double, digest string"
)


def decode_audio_meta(
    payload: bytes,
) -> tuple[str | None, int, int, int, int]:
    """(format, sample_rate, channels, bits_per_sample, n_samples) from
    a real RIFF/WAVE chunk walk (fmt + data chunks, word-aligned).
    (None, 0, 0, 0, 0) for unrecognized/truncated payloads — same
    graceful-degrade contract as decode_image_meta."""
    b = payload or b""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None, 0, 0, 0, 0
    sr = ch = bits = block_align = 0
    data_len = 0
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            _tag, ch, sr, _byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", b[i + 8 : i + 24]
            )
        elif cid == b"data":
            data_len = min(clen, max(len(b) - i - 8, 0))
        i += 8 + clen + (clen & 1)  # chunks are 16-bit word aligned
    n_samples = data_len // block_align if block_align else 0
    return "wav", sr, ch, bits, n_samples


def extract_audio_features(media_df):
    """audio payload -> typed metadata + duration (mapInPandas) — the
    audio leg of the multimodal batch loop; a production featurizer
    (spectrogram/embedding) slots into the same batch body."""

    def build(pdf: pd.DataFrame) -> dict:
        meta = [decode_audio_meta(b) for b in pdf["payload"]]
        return {
            "format": [m[0] for m in meta],
            "sample_rate": [m[1] for m in meta],
            "channels": [m[2] for m in meta],
            "bits": [m[3] for m in meta],
            "n_samples": [m[4] for m in meta],
            "duration_sec": [
                m[4] / m[1] if m[1] else 0.0 for m in meta
            ],
        }

    return _feature_batches(media_df, AUDIO_FEATURE_SCHEMA, build)


VIDEO_FEATURE_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "timescale long, duration_sec double, n_tracks int, digest string"
)


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in
    b[start:end]; handles 64-bit largesize; stops on malformed sizes."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", b[i : i + 4])[0]
        btype = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
            body = i + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, body, i + size
        i += size


def decode_video_meta(
    payload: bytes,
) -> tuple[str | None, int, int, int, int, int]:
    """(format, width, height, timescale, duration_units, n_tracks)
    from a real ISO-BMFF box walk: brand from ``ftyp``, movie timescale
    and duration from ``moov.mvhd`` (v0 and v1 layouts), presentation
    width/height from the FIRST ``moov.trak.tkhd`` with nonzero
    dimensions (16.16 fixed point), track count = number of ``trak``
    boxes.  (None, 0...) for non-BMFF payloads; truncated boxes degrade
    to whatever was parsed before the damage."""
    b = payload or b""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None, 0, 0, 0, 0, 0
    fmt = b[8:12].decode("ascii", "replace").strip() or "mp4"
    width = height = timescale = duration = n_tracks = 0
    for btype, s, e in _iter_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _iter_boxes(b, s, e):
            if ityp == b"mvhd" and is_ + 4 <= ie:
                ver = b[is_]
                if ver == 1 and is_ + 32 <= ie:
                    timescale = struct.unpack(
                        ">I", b[is_ + 20 : is_ + 24]
                    )[0]
                    duration = struct.unpack(
                        ">Q", b[is_ + 24 : is_ + 32]
                    )[0]
                elif ver == 0 and is_ + 20 <= ie:
                    timescale, duration = struct.unpack(
                        ">II", b[is_ + 12 : is_ + 20]
                    )
            elif ityp == b"trak":
                n_tracks += 1
                for ttyp, ts, te in _iter_boxes(b, is_, ie):
                    if ttyp != b"tkhd" or ts + 4 > te:
                        continue
                    # body-relative: v0 = 4 hdr + 20 times/ids + 16
                    # reserved/layer/volume + 36 matrix = 76; v1 adds
                    # 12 for the 64-bit ctime/mtime/duration
                    off = ts + (88 if b[ts] == 1 else 76)
                    if off + 8 <= te and not (width or height):
                        w_fx, h_fx = struct.unpack(
                            ">II", b[off : off + 8]
                        )
                        width, height = w_fx >> 16, h_fx >> 16
    return fmt, width, height, timescale, duration, n_tracks


def extract_video_features(media_df):
    """video payload -> typed metadata + duration (mapInPandas) — the
    video leg of the multimodal batch loop; a production frame sampler
    or embedder slots into the same batch body."""

    def build(pdf: pd.DataFrame) -> dict:
        meta = [decode_video_meta(b) for b in pdf["payload"]]
        return {
            "format": [m[0] for m in meta],
            "width": [m[1] for m in meta],
            "height": [m[2] for m in meta],
            "timescale": [m[3] for m in meta],
            "duration_sec": [
                m[4] / m[3] if m[3] else 0.0 for m in meta
            ],
            "n_tracks": [m[5] for m in meta],
        }

    return _feature_batches(media_df, VIDEO_FEATURE_SCHEMA, build)


def _skip_subblocks(b: bytes, i: int) -> int:
    """Advance past a GIF sub-block chain (length-prefixed, 0-terminated)."""
    while i < len(b) and b[i] != 0:
        i += 1 + b[i]
    return i + 1  # past the terminator


def gif_frames(payload: bytes) -> list[bytes]:
    """Real GIF demux: split the data stream into per-frame byte spans
    (graphic-control extension + image descriptor + local color table +
    LZW sub-blocks).  Returns the raw bytes of each frame's blocks."""
    b = payload or b""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return []
    flags = b[10]
    i = 13
    if flags & 0x80:  # global color table: 3 * 2^(N+1) bytes
        i += 3 * (2 << (flags & 0x07))
    frames: list[bytes] = []
    # the pending graphic-control extension is carried as its own span:
    # a comment/application extension sitting between a GCE and its
    # image descriptor (legal per GIF89a) must not drop the GCE
    gce = b""
    while i < len(b):
        block = b[i]
        if block == 0x21 and i + 1 < len(b):  # extension
            label = b[i + 1]
            j = _skip_subblocks(b, i + 2)
            if label == 0xF9:  # graphic control: belongs to next frame
                gce = b[i:j]
            i = j
        elif block == 0x2C and i + 10 <= len(b):  # image descriptor
            # 10 descriptor bytes (separator + left/top/w/h + flags),
            # then optional local color table, one LZW min-code-size
            # byte, then the data sub-blocks
            lflags = b[i + 9]
            j = i + 10
            if lflags & 0x80:
                j += 3 * (2 << (lflags & 0x07))
            j += 1  # LZW minimum code size
            j = _skip_subblocks(b, j)
            frames.append(gce + b[i:j])
            gce = b""
            i = j
        elif block == 0x3B:  # trailer
            break
        else:  # corrupt stream: stop at the last complete frame
            break
    return frames


def mp4_samples(payload: bytes, max_samples: int = 32) -> list[bytes]:
    """Real MP4 sample extraction: walk the first track's sample table
    (``stsz`` sizes, ``stsc`` chunk mapping, ``stco``/``co64`` chunk
    offsets) and slice the media samples' byte ranges out of the file —
    the ISO-BMFF analogue of the GIF demuxer.  Samples whose declared
    range falls outside the payload are skipped (truncated files yield
    the frames that exist).  Returns [] for non-BMFF payloads or tracks
    with incomplete tables."""
    b = payload or b""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return []

    def find(path: list[bytes], s: int, e: int):
        for btype, bs, be in _iter_boxes(b, s, e):
            if btype == path[0]:
                if len(path) == 1:
                    return bs, be
                return find(path[1:], bs, be)
        return None

    moov = find([b"moov"], 0, len(b))
    if not moov:
        return []
    for ttyp, ts, te in _iter_boxes(b, *moov):
        if ttyp != b"trak":
            continue
        stbl = find([b"mdia", b"minf", b"stbl"], ts, te)
        if not stbl:
            continue
        sizes: list[int] = []
        chunk_offs: list[int] = []
        stsc: list[tuple[int, int]] = []  # (first_chunk, per_chunk)
        for styp, ss, se in _iter_boxes(b, *stbl):
            if styp == b"stsz" and ss + 12 <= se:
                uniform, count = struct.unpack(">II", b[ss + 4 : ss + 12])
                if uniform:
                    # count is an untrusted u32 — unclamped, a malformed
                    # file declaring ~2^32 samples allocates a multi-GB
                    # list before max_samples applies.  The walk never
                    # consumes more than a bounded prefix, so cap it —
                    # honoring callers who legitimately ask for more
                    # than the default bound.
                    sizes = [uniform] * min(count, max(max_samples, 4096))
                else:
                    n = min(count, (se - ss - 12) // 4)
                    sizes = [
                        struct.unpack(">I", b[ss + 12 + 4 * i : ss + 16 + 4 * i])[0]
                        for i in range(n)
                    ]
            elif styp == b"stsc" and ss + 8 <= se:
                n = min(
                    struct.unpack(">I", b[ss + 4 : ss + 8])[0],
                    (se - ss - 8) // 12,
                )
                stsc = [
                    struct.unpack(
                        ">II", b[ss + 8 + 12 * i : ss + 16 + 12 * i]
                    )
                    for i in range(n)
                ]
            elif styp in (b"stco", b"co64") and ss + 8 <= se:
                w = 4 if styp == b"stco" else 8
                fmt = ">I" if w == 4 else ">Q"
                n = min(
                    struct.unpack(">I", b[ss + 4 : ss + 8])[0],
                    (se - ss - 8) // w,
                )
                chunk_offs = [
                    struct.unpack(
                        fmt, b[ss + 8 + w * i : ss + 8 + w * (i + 1)]
                    )[0]
                    for i in range(n)
                ]
        if not (sizes and chunk_offs and stsc):
            continue
        out: list[bytes] = []
        si = 0
        for ci, coff in enumerate(chunk_offs):
            # samples-per-chunk for 1-based chunk ci+1: last stsc entry
            # whose first_chunk <= ci+1
            spc = 0
            for first, per in stsc:
                if first <= ci + 1:
                    spc = per
                else:
                    break
            off = coff
            for _ in range(spc):
                if si >= len(sizes) or len(out) >= max_samples:
                    return out
                sz = sizes[si]
                if off + sz <= len(b):
                    out.append(b[off : off + sz])
                off += sz
                si += 1
        return out
    return []


def sample_frames(media_df, max_frames: int = 32):
    """Frame extraction: 1 media row -> N frame rows (UDTF-style fan-out,
    no shuffle — the expansion happens inside the Python stage).  GIF
    payloads demux into real encoded frames, MP4 payloads into real
    media samples via the track's sample table; other formats yield one
    whole-payload frame (a container with one image IS its only frame)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fs = (
                    gif_frames(payload)[:max_frames]
                    or mp4_samples(payload, max_frames)
                    or [payload or b""]
                )
                for i, fr in enumerate(fs):
                    ids.append(mid)
                    frame_nos.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame": frames}
            )

    return media_df.mapInPandas(batches, FRAME_SCHEMA)


def chunk_dedup_stats(
    df,
    chunk_bytes: int = 64,
    blob_col: str = "blob",
    id_col: str = "doc_id",
):
    """Fixed-chunk BINARY dedup stats — the storage/backup-family
    dedup move (public knowledge: chunk-hash dedup as in venti/LBFS;
    content-defined chunking is the rolling-hash refinement) applied to
    opaque media blobs: split each blob into ``chunk_bytes`` chunks,
    hash each, and report how much of every blob is shared with ANY
    other blob — re-encoded thumbnails and byte-identical mirrors of
    media assets surface long before any decoder runs.

    Implementation detail shared with the DuckDB oracle: chunks are
    taken on the HEX encoding of the blob (2 hex chars per byte — a
    per-byte bijection, so chunk identity over hex == chunk identity
    over raw bytes).  DuckDB's md5() only accepts VARCHAR, and Spark's
    hex() and DuckDB's hex() produce the same uppercase encoding, so
    hashing hex substrings is the engine-portable form; blobs stay
    binary at rest and convert once per row.

    Returns one row per input: (doc_id, n_bytes, n_chunks,
    n_shared_chunks, shared_frac) — 0/0.0 for empty or NULL blobs.
    The tail chunk is short (no padding), matching byte-range chunking.

    100 TB shape: the hex projection + chunk hashing is narrow
    (pin()-staged hex so the per-chunk substrings don't re-encode the
    blob); the cross-doc test is min(id) != max(id) per chunk hash —
    ONE exchange keyed by the hash (the dup_span_stats shape); blobs
    themselves never shuffle (only 32-hex chunk hashes move).
    """
    from pyspark.sql import functions as F

    from ..functions.numeric import pin

    if chunk_bytes < 1:
        raise ValueError("chunk_bytes must be >= 1")
    w = 2 * chunk_bytes
    base = df.withColumn("_ck_hx", pin(F.hex(F.col(blob_col))))
    hx = F.col("_ck_hx")
    n_hex = F.length(hx)
    n_chunks = F.ceil(n_hex / F.lit(w)).cast("int")
    hashes = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.md5(F.substring(hx, (i - 1) * w + 1, w)),
    )
    chunks = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(n_hex > 0, hashes).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("h"),
    )
    sizes = base.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce((n_hex / 2).cast("long"), F.lit(0)).alias("n_bytes"),
    )
    return _chunk_share_stats(sizes, chunks)


def _chunk_share_stats(sizes, chunks):
    """Shared tail of the two binary-dedup ops: cross-doc test =
    min(id) != max(id) per chunk hash (ONE hash-keyed exchange), join
    back, per-doc counts, 0/0.0 for chunkless blobs.  ``sizes`` is
    (doc_id, n_bytes) for EVERY input row; ``chunks`` is (doc_id, h)
    exploded chunk hashes."""
    from pyspark.sql import functions as F

    # r06 PERF (the LADDER rule): ``chunks`` has TWO consumers (the
    # cross-doc agg and the join-back), and the chunk-hash derivation
    # above it is a pin()-staged chain — nondeterministic projections
    # never canonicalize equal, so exchange reuse cannot fire and the
    # whole boundary/hash computation ran once PER CONSUMER (measured
    # ~2x the media_cdc_dedup cost at sf1.0).  A lazy localCheckpoint
    # materializes the (doc_id, h) rows once at first use — only the
    # 40-byte hash rows are stored, never the blobs.
    chunks = chunks.localCheckpoint(eager=False)
    cross = chunks.groupBy("h").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("is_shared")
    )
    per_doc = (
        chunks.join(cross, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(
                F.when(F.col("is_shared"), 1).otherwise(0)
            ).alias("n_shared_chunks"),
        )
    )
    return sizes.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_bytes",
        F.coalesce(F.col("n_chunks"), F.lit(0)).cast("long").alias(
            "n_chunks"
        ),
        F.coalesce(F.col("n_shared_chunks"), F.lit(0)).cast(
            "long"
        ).alias("n_shared_chunks"),
        F.when(
            F.coalesce(F.col("n_chunks"), F.lit(0)) > 0,
            F.round(
                F.col("n_shared_chunks") / F.col("n_chunks"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("shared_frac"),
    )


def cdc_chunk_stats(
    df,
    window_bytes: int = 8,
    boundary_hex: str = "0",
    blob_col: str = "blob",
    id_col: str = "doc_id",
):
    """CONTENT-DEFINED chunking (CDC) dedup stats — the rolling-hash
    refinement of `chunk_dedup_stats` (public knowledge: LBFS/rsync-
    family CDC; gear/Rabin hashing in production dedup stores).  Fixed
    grids break under INSERTION: one prepended byte shifts every
    64-byte chunk and nothing matches.  CDC places boundaries where a
    hash of the trailing ``window_bytes`` window hits a target (first
    md5-hex char in ``boundary_hex`` — expected chunk length =
    16/len(boundary_hex) bytes plus the window), so boundaries re-
    synchronize after an edit and everything past it still matches.

    Same output contract as `chunk_dedup_stats`::

        (doc_id, n_bytes, n_chunks, n_shared_chunks, shared_frac)

    Engine-portability note: the per-position window hash is md5 over
    the hex encoding (the DuckDB-portable form — see
    `chunk_dedup_stats`); a production deployment swaps in a gear/
    Rabin rolling hash (O(1)/byte instead of O(window)/byte) with the
    same boundary semantics.  Production CDC also clamps chunk sizes
    (min/max); the unclamped form keeps both engines' restatement
    exact.

    100 TB shape: boundary detection and chunk hashing are one narrow
    pin()-staged array chain per blob; the cross-doc test is the same
    ONE hash-keyed exchange as the fixed-grid op (shared tail) —
    blobs never shuffle, only 32-hex chunk hashes move.
    """
    from pyspark.sql import functions as F

    from ..functions.numeric import pin

    if window_bytes < 1:
        raise ValueError("window_bytes must be >= 1")
    # md5() emits LOWERCASE hex — normalize so 'A' and 'a' both work
    # (an uppercase-only comparison could never fire for a-f)
    boundary_hex = boundary_hex.lower()
    if not boundary_hex or any(
        c not in "0123456789abcdef" for c in boundary_hex
    ):
        raise ValueError("boundary_hex must be hex chars")
    clash = sorted({"_cd_hx", "_cd_bp", "_cd_en"} & set(df.columns))
    if clash:
        raise ValueError(f"cdc_chunk_stats staging columns clash: {clash}")
    w = window_bytes
    base = df.withColumn("_cd_hx", pin(F.hex(F.col(blob_col))))
    hx = F.col("_cd_hx")
    n = (F.length(hx) / 2).cast("int")
    bpos = F.filter(
        F.sequence(F.lit(w), F.greatest(n, F.lit(w))),
        lambda i: (i <= n)
        & F.substring(
            F.md5(F.substring(hx, (i - w) * 2 + 1, 2 * w)), 1, 1
        ).isin(*list(boundary_hex)),
    )
    base = base.withColumn("_cd_bp", pin(bpos))
    bp = F.col("_cd_bp")
    ends = F.when(
        (F.size(bp) > 0) & (F.element_at(bp, -1) == n), bp
    ).otherwise(F.concat(bp, F.array(n)))
    base = base.withColumn("_cd_en", pin(ends))
    en = F.col("_cd_en")
    hashes = F.transform(
        F.sequence(F.lit(1), F.size(en)),
        lambda j: F.md5(
            F.substring(
                hx,
                F.coalesce(F.get(en, j - 2), F.lit(0)) * 2 + 1,
                (
                    F.element_at(en, j.cast("int"))
                    - F.coalesce(F.get(en, j - 2), F.lit(0))
                )
                * 2,
            )
        ),
    )
    chunks = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(n > 0, hashes).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("h"),
    )
    sizes = base.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(n.cast("long"), F.lit(0)).alias("n_bytes"),
    )
    return _chunk_share_stats(sizes, chunks)


# SRT/VTT cue-timing line: HH:MM:SS,mmm --> HH:MM:SS.mmm (SRT uses
# the comma, WebVTT the dot — both accepted; the oracle restates the
# identical class).  Only Java+RE2-identical constructs.
SRT_TIME_RE = (
    "([0-9]{2}):([0-9]{2}):([0-9]{2})[,.]([0-9]{3})"
    " *--> *"
    "([0-9]{2}):([0-9]{2}):([0-9]{2})[,.]([0-9]{3})"
)


def srt_cues(
    df: DataFrame, srt_col: str = "srt", id_col: str = "doc_id"
) -> DataFrame:
    """SRT/WebVTT-style subtitle cues as relational rows — the media
    SIDECAR text that pairs a transcript with timestamps (the
    video-text alignment feed of a multimodal corpus; the binary
    decoders above handle the media track, this handles its text
    track).

    Blocks split on blank lines (CR stripped first); per block the
    timing line yields integer-millisecond start/end (pure integer
    arithmetic — no duration float exists), the declared index is
    kept separately from the 1-based ``cue_no`` source order, and
    multi-line cue text joins with single spaces (trimmed).  Blocks
    without a parseable timing line keep their row with NULL fields
    (``is_valid`` false — corruption is countable, the warc_records
    convention); blocks that are ONLY whitespace do not exist (the
    split eats them).

    100 TB shape: zero-exchange narrow chain, ONE posexplode; the
    per-cue regexes run on the exploded block only.
    """
    from pyspark.sql import Column, Window
    from pyspark.sql import functions as F

    clash = sorted({"_srt_b"} & set(df.columns))
    if clash:
        raise ValueError(f"srt_cues staging columns clash: {clash}")
    blocks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(
                F.replace(
                    F.coalesce(F.col(srt_col).cast("string"), F.lit("")),
                    F.lit("\r"),
                    F.lit(""),
                ),
                "\n[ \\t]*\n+",
            )
        ).alias("_srt_no", "_srt_b"),
    ).filter(F.regexp_replace(F.col("_srt_b"), "[ \\t\\n]+", "") != "")
    b = F.col("_srt_b")

    def grp(i: int) -> Column:
        return F.regexp_extract(b, SRT_TIME_RE, i)

    has_time = grp(1) != ""
    to_ms_start = (
        grp(1).cast("long") * 3_600_000
        + grp(2).cast("long") * 60_000
        + grp(3).cast("long") * 1_000
        + grp(4).cast("long")
    )
    to_ms_end = (
        grp(5).cast("long") * 3_600_000
        + grp(6).cast("long") * 60_000
        + grp(7).cast("long") * 1_000
        + grp(8).cast("long")
    )
    idx = F.regexp_extract(b, "^[ \\t]*([0-9]+)[ \\t]*\\n", 1)
    cue_text = F.regexp_extract(b, "(?s)--> *[^\\n]*\\n(.*)$", 1)
    cue_text = F.trim(
        F.regexp_replace(cue_text, "[ \\t]*\\n[ \\t]*", " ")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_srt_no").asc())
    return blocks.select(
        id_col,
        F.row_number().over(w).cast("long").alias("cue_no"),
        F.when(idx != "", idx.cast("long")).alias("declared_idx"),
        F.when(has_time, to_ms_start).alias("start_ms"),
        F.when(has_time, to_ms_end).alias("end_ms"),
        F.when(has_time, to_ms_end - to_ms_start).alias("dur_ms"),
        F.when(has_time, cue_text).alias("text"),
        has_time.alias("is_valid"),
    )
