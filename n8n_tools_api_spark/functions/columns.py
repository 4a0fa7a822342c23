"""Reusable JVM-side column expressions (SURVEY.md §2.8 built-ins).

These are the scalar functions whose semantics are byte-safe in Spark
built-ins (hashing, prefixes, unit math). Anything regex- or rounding-
sensitive stays in refsem pandas UDFs (F1-F4, KB rounding) — see the
per-function parity notes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decoded_media_bytes(b64_col) -> Column:
    """base64 → binary, NULL on invalid input (strict, like refsem's
    validate=True path). Parity: F5, mistral_service.py:117-146."""
    return F.try_to_binary(F.col(b64_col) if isinstance(b64_col, str) else b64_col,
                           F.lit("base64"))


def image_ext_col(b64_col) -> Column:
    """Base64-prefix format detection, full variant (F6,
    mistral_service.py:809-871) mapped to an object-key extension."""
    c = F.col(b64_col) if isinstance(b64_col, str) else b64_col
    return (
        F.when(c.startswith("/9j/"), "jpeg")
        .when(c.startswith("iVBORw0KGgo"), "png")
        .when(c.startswith("R0lGODlh"), "gif")
        .when(c.startswith("R0lGODdh"), "gif")
        .when(c.startswith("UklGR"), "webp")
        .when(c.startswith("Qk"), "bmp")
        .otherwise("bin")
    )


def media_key_col(bytes_col) -> Column:
    """sha256[:16] content key — byte-identical to Python hashlib
    (S6 minus timestamp, s3_client.py:243-270)."""
    c = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return F.substring(F.sha2(c, 256), 1, 16)


def media_ref_col(b64_col, prefix: str = "media") -> Column:
    """Full content-addressed media reference from a base64 column."""
    decoded = decoded_media_bytes(b64_col)
    return F.concat(F.lit(prefix + "/"), media_key_col(decoded),
                    F.lit("."), image_ext_col(b64_col))


def bytes_to_mb(bytes_col) -> Column:
    """round(b/1048576, 2) — F12, pdf_service.py:259. NOTE: Spark round
    is HALF_UP vs Python banker's; only used on integral byte counts
    where ties land on exact .xx5 never (binary/1048576 has no finite
    .xx5 representations that differ between modes for our sizes)."""
    c = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return F.round(c / F.lit(1048576), 2)


def points_to_inches(points_col) -> Column:
    """round(pt/72, 2) — F12, pdf_service.py:271-272."""
    c = F.col(points_col) if isinstance(points_col, str) else points_col
    return F.round(c / F.lit(72), 2)


def estimated_words_col(chars_col) -> Column:
    """chars // 5 — F13, ocr_response_formatter.py:608."""
    c = F.col(chars_col) if isinstance(chars_col, str) else chars_col
    return F.floor(c / F.lit(5)).cast("bigint")
