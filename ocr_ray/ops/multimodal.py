"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are carried as Arrow ``binary`` columns with metadata
columns; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The decode libraries are not in this container, so
the decoders are STUBS behind ``fake=True`` (a deterministic bytes->features
hash) or ``NotImplementedError`` — the Ray-side plumbing (schema, batch
sizing for large binaries, actor signatures, output layout) is real and
tested (per the round brief: stub the codec, keep the dataflow honest).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

_FEAT_DIM = 8


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    import random

    rows = {k: [] for k in MEDIA_SCHEMA.names}
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = random.Random((seed << 20) ^ i)
        kind = kinds[i % 3]
        size = rng.randint(256, 4096)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(rng.getrandbits(8 * size).to_bytes(size, "little"))
        rows["width"].append(rng.choice([0, 640, 1280]) if kind != "audio" else 0)
        rows["height"].append(rng.choice([0, 480, 720]) if kind != "audio" else 0)
        rows["duration_ms"].append(rng.randint(1000, 60000) if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: blake2b(payload) -> 8 floats."""
    dg = hashlib.blake2b(payload, digest_size=8 * _FEAT_DIM // 2).digest()
    ints = np.frombuffer(dg, dtype=np.uint32).astype(np.float64)
    return (ints % 1000) / 1000.0


class MediaDecoder:
    """Actor-pool stage: binary payload -> feature vector.

    ``fake=False`` is the real-decoder slot (PIL/ffmpeg/torchaudio in a real
    deployment) — it raises NotImplementedError here. Keep ``batch_size``
    small: payloads are large, and batch bytes = batch_size x payload size.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg (not in this container); "
                "use fake=True for the deterministic stub"
            )
        feats = [
            _fake_decode(p) for p in batch.column("payload").to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
                "payload_bytes": pa.array(
                    [len(p) for p in batch.column("payload").to_pylist()], pa.int64()
                ),
            }
        )


def decode_media(ds: Dataset, *, fake: bool = True, batch_size: int = 16) -> Dataset:
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payload-heavy rows
        concurrency=(1, 8),
        num_cpus=1,
    )


def media_features(sf_dir: str) -> Dataset:
    """queries() entry: synth media -> actor-pool decode -> scalar features.

    (sf_dir scales the row count deterministically; no external data.)"""
    from ocr_ray.sources.transcripts import n_convs_for_sf

    n = max(30, n_convs_for_sf(sf_dir) // 10)
    ds = rd.from_arrow(synth_media_table(n))
    out = decode_media(ds, fake=True)

    def scalars(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f0 = pc.list_element(t.column("features"), 0)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "payload_bytes": t.column("payload_bytes"),
                "feat0_millis": pc.cast(pc.round(pc.multiply(f0, 1000.0)), pa.int64()),
            }
        )

    return out.map_batches(scalars, batch_format="pyarrow")
