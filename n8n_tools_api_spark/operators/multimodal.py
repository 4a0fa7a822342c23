"""Multimodal column plumbing — image/audio/video as opaque binary.

The container has no image/audio codecs, so the *decode kernels* are
stubbed (deterministic fake behind ``decode_stub``; a real deployment
swaps in PIL/ffmpeg inside the same mapInPandas signature). What IS real
and tested: the schema, the Arrow batch shape, the partitioning, and
the UDF plumbing — the Spark side is real and tested even where the
codec is a stub.

Typed layout::

    media_assets (
      media_key  STRING,      -- sha256[:16] of payload
      kind       STRING,      -- 'image' | 'audio' | 'video'
      media_bytes BINARY,     -- opaque payload
      meta       STRUCT<ext:STRING, n_bytes:INT>
    )
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "media_key string, kind string, width int, height int, "
    "n_channels int, feature_hash bigint"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (w, h, channels)
    from the payload digest. Replace with PIL/imageio in deployment —
    the UDF signature and batch shape stay identical.
    """
    d = hashlib.sha256(payload).digest()
    return (d[0] % 64 + 1, d[1] % 64 + 1, (d[2] % 3) + 1)


def real_decode(payload: bytes):  # pragma: no cover - deployment hook
    """The real codec hook. Not available in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "swap _fake_decode for a PIL/ffmpeg implementation at deployment"
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        keys, kinds, ws, hs, cs, fh = [], [], [], [], [], []
        for key, kind, payload in zip(pdf["media_key"], pdf["kind"],
                                      pdf["media_bytes"]):
            payload = bytes(payload) if payload is not None else b""
            w, h, c = _fake_decode(payload)
            keys.append(key)
            kinds.append(kind)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            # feature extraction stub: stable 64-bit content feature
            fh.append(int.from_bytes(hashlib.sha256(payload).digest()[:8],
                                     "big", signed=True))
        yield pd.DataFrame({
            "media_key": keys, "kind": kinds, "width": ws, "height": hs,
            "n_channels": cs, "feature_hash": fh,
        })


def decode_media(assets: DataFrame) -> DataFrame:
    """Decode/feature-extract stage over a media_assets table.

    Narrow mapInPandas over (media_key, kind, media_bytes); Arrow moves
    the binary column zero-copy; output is slim typed metadata so the
    fat payload column never crosses a shuffle.
    """
    return assets.select("media_key", "kind", "media_bytes").mapInPandas(
        _decode_batches, schema=DECODED_SCHEMA
    )
