"""Multimodal (binary-payload) stages: metadata, decode, feature-extract.

Binary media columns (image/audio/video) are opaque ``binary`` Arrow columns
with typed metadata travelling beside them. The Ray-side plumbing here is
real — schema, actor-pool hosting, batch sizing for large payloads — while
the decode itself is STUBBED: the image/audio codec libraries are not in this
container, so ``decode_image`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected (the default for tests/benchmarks).

Batch-size guidance: payload bytes × batch_size × concurrency must fit the
worker heap — for multi-MB media, ``batch_size`` of 8-64, not thousands
(BASELINE.md memory rule). Payload columns should be dropped as soon as the
features are extracted so the big bytes never cross a shuffle.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def decode_image(payload: bytes):  # pragma: no cover - real decoder absent
    """Real decoder entry point (PIL/libjpeg): NOT available in this
    environment. The actor below uses the deterministic fake instead."""
    raise NotImplementedError(
        "image codecs are not installed in this container; "
        "use fake_decode_meta (deterministic) or install PIL at deployment"
    )


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for decode: derives plausible media metadata
    purely from the bytes (stable across runs/processes)."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    return {
        "width": 16 + digest[0] % 240,
        "height": 16 + digest[1] % 240,
        "channels": 1 + digest[2] % 3,
    }


class PayloadFeatures:
    """Actor-pool kernel: binary column → typed metadata columns.

    A real model/codec would load in ``__init__`` (once per actor); the batch
    path is identical either way.
    """

    def __init__(self, payload_col: str = "html", key_col: str = "url"):
        self.payload_col = payload_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        keys = batch.column(self.key_col)
        n_bytes = [len(p or b"") for p in payloads]
        # digest the RAW bytes: decoding first would rewrite non-UTF-8
        # payloads with U+FFFD and collapse distinct payloads to one digest
        md5s = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        metas = [fake_decode_meta(p or b"") for p in payloads]
        return pa.table(
            {
                self.key_col: keys,
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "payload_md5": pa.array(md5s, pa.string()),
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "channels": pa.array([m["channels"] for m in metas], pa.int32()),
            }
        )


def payload_stage(ds, payload_col: str = "html", key_col: str = "url",
                  batch_size: int = 64, concurrency=(1, 4)):
    """Actor-pool metadata extraction over a binary column; small batches by
    design (payload-heavy rows)."""
    return ds.map_batches(
        PayloadFeatures,
        fn_constructor_kwargs={"payload_col": payload_col, "key_col": key_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def fake_frame_digest(payload: bytes, offset: int) -> str:
    """Deterministic stand-in for a decoded frame's feature digest."""
    h = hashlib.blake2b(digest_size=8)
    h.update(offset.to_bytes(8, "big"))
    h.update(payload[offset : offset + 64])
    return h.hexdigest()


class FrameSampler:
    """Flat-map actor kernel: one input row → ``n_frames`` output rows.

    Treats the binary payload as an opaque media stream and samples evenly
    spaced byte offsets (``offset_i = i * n_bytes // n_frames``) — the
    deterministic skeleton of video frame-sampling. The offsets and explode
    shape are exactly verifiable (SQL arithmetic over octet_length); the
    per-frame decode is the declared fake (real codecs absent here; a real
    deployment decodes at each timestamp instead)."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 n_frames: int = 4):
        self.payload_col = payload_col
        self.key_col = key_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys_in = batch.column(self.key_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        keys, idxs, offs, digests = [], [], [], []
        for key, p in zip(keys_in, payloads):
            p = p or b""
            n = len(p)
            for i in range(self.n_frames):
                off = i * n // self.n_frames
                keys.append(key)
                idxs.append(i)
                offs.append(off)
                digests.append(fake_frame_digest(p, off))
        return pa.table(
            {
                self.key_col: pa.array(keys, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "frame_offset": pa.array(offs, pa.int64()),
                "frame_digest": pa.array(digests, pa.string()),
            }
        )


def frame_sample_stage(ds, payload_col: str = "html", key_col: str = "url",
                       n_frames: int = 4, batch_size: int = 64,
                       concurrency=(1, 4)):
    """Actor-pool frame sampling over a binary column (small batches —
    payload-heavy rows; the payload is dropped in the output)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={
            "payload_col": payload_col, "key_col": key_col, "n_frames": n_frames
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class PayloadResizer:
    """Resize-to-fit metadata transform over the fake-decoded dimensions:
    scale so max(width, height) == max_side, preserving aspect ratio
    (integer floor). Real deployments decode + resample pixels; the
    arithmetic, schema and actor hosting are what this stage pins."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 max_side: int = 64):
        self.payload_col = payload_col
        self.key_col = key_col
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        out_w, out_h = [], []
        for p in payloads:
            meta = fake_decode_meta(p or b"")
            w, h = meta["width"], meta["height"]
            # integer arithmetic: float scale*side can land at 63.999..
            # and floor below max_side
            if w >= h:
                nw, nh = self.max_side, max(1, h * self.max_side // w)
            else:
                nw, nh = max(1, w * self.max_side // h), self.max_side
            out_w.append(nw)
            out_h.append(nh)
        return pa.table(
            {
                self.key_col: batch.column(self.key_col),
                "resized_w": pa.array(out_w, pa.int32()),
                "resized_h": pa.array(out_h, pa.int32()),
            }
        )


def resize_stage(ds, payload_col: str = "html", key_col: str = "url",
                 max_side: int = 64, batch_size: int = 64, concurrency=(1, 4)):
    """Actor-pool resize-metadata stage (decode stubbed, plumbing real)."""
    return ds.map_batches(
        PayloadResizer,
        fn_constructor_kwargs={
            "payload_col": payload_col, "key_col": key_col, "max_side": max_side
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
