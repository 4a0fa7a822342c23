"""URL-landing classification stage — S3's deterministic core as pure
column expressions.

The reference downloads each URL inline in the request handler
(ocr_utils.py:257-371); at 10^12 documents the fetch belongs to a
landing fleet that delivers ``(url, http_status, content_type,
content_length_header, payload)`` rows into bronze, and THIS stage
classifies them: filename derivation, gate order, the
extension → content-type → magic-sniff type ladder, and magic
validation, each with the reference's exact strings
(refsem/landing.py is the Python twin the tests replay).

Everything is a single narrow projection over JVM string/byte
expressions — no UDF, no shuffle, whole-stage codegen; magic checks
compare hex prefixes of the binary payload so the fat column is never
converted to Python. Contract: absolute http(s)/ftp-style URLs
(scheme://authority/path...) — the only shape the reference's HttpUrl
request model admits.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..refsem.landing import (
    MAX_FILE_SIZE,
    MSG_EMPTY,
    MSG_TOO_LARGE,
    MSG_UNKNOWN_TYPE,
    OCR_ALLOWED_EXTENSIONS,
)

# (type, appended ext, hex prefixes) in the reference's sniff order
_SNIFF = (
    ("pdf", "pdf", ("25504446",)),
    ("png", "png", ("89504E470D0A1A0A",)),
    ("jpg", "jpg", ("FFD8FF",)),
    ("tiff", "tiff", ("49492A00", "4D4D002A")),
)


def _hex_prefix(payload: Column, n: int) -> Column:
    # SQL substring on BINARY yields a binary slice; shorter payloads
    # yield a shorter slice whose hex simply fails the equality, which
    # is exactly bytes.startswith semantics
    return F.upper(F.hex(F.substring(payload, 1, n)))


def _magic_ok(payload: Column, file_type: Column) -> Column:
    checks = [
        (F.lit(t), reduce(lambda a, b: a | b,
                          [_hex_prefix(payload, len(h) // 2) == h
                           for h in hexes]))
        for t, _, hexes in _SNIFF
    ]
    out = F.lit(False)
    for t, ok in checks:
        out = F.when(file_type == t, ok).otherwise(out)
    # 'jpeg' validates with the jpg signature (MAGIC_BYTES aliases both)
    return F.when(file_type == "jpeg",
                  _hex_prefix(payload, 3) == "FFD8FF").otherwise(out)


def url_landing_plan(requests: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """(url, filename, file_type, action, reason) per landed fetch.

    Input columns: ``url string, http_status int, content_type string,
    content_length_header bigint, payload binary`` (header NULL when
    the server sent none; payload NULL ≡ empty). Check order, ladder,
    and messages mirror refsem/landing.py / ocr_utils.py:272-343 —
    including the hidden-file quirk that makes the ladder reachable.
    """
    url = F.col(url_col)
    payload = F.coalesce(F.col("payload"), F.lit(b""))
    # urlparse path: strip scheme://authority, stop at query/fragment
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    basename = F.element_at(F.split(path, "/"), -1)
    fname0 = F.when(basename == "", "remote_document").otherwise(basename)
    has_allowed = reduce(
        lambda a, b: a | b,
        [F.lower(fname0).endswith(ext) for ext in OCR_ALLOWED_EXTENSIONS])
    fname1 = F.when(has_allowed, fname0) \
        .otherwise(F.concat(fname0, F.lit(".pdf")))

    # os.path.splitext: suffix from the last dot, unless every char
    # before it is itself a dot (leading dots are part of the name)
    stripped = F.regexp_replace(fname1, r"^\.+", "")
    ext = F.lower(F.regexp_extract(stripped, r"(\.[^.]*)$", 1))
    ext_type = (
        F.when(ext.isin(".jpg", ".jpeg"), "jpeg")
        .when(ext == ".png", "png")
        .when(ext == ".tiff", "tiff")
        .when(ext == ".pdf", "pdf")
        .otherwise("unknown")
    )

    ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
    sniffed = F.lit("unknown")
    for t, _, hexes in reversed(_SNIFF):
        ok = reduce(lambda a, b: a | b,
                    [_hex_prefix(payload, len(h) // 2) == h for h in hexes])
        sniffed = F.when(ok, F.lit(t)).otherwise(sniffed)
    ladder_type = (
        F.when(ct.contains("pdf"), "pdf")
        .when(ct.contains("png"), "png")
        .when(ct.contains("jpeg") | ct.contains("jpg"), "jpeg")
        .when(ct.contains("tiff"), "tiff")
        .otherwise(sniffed)
    )
    ladder_ext = (
        F.when(ladder_type == "jpeg", "jpg")
        .when(ladder_type == "unknown", F.lit(None).cast("string"))
        .otherwise(ladder_type)
    )
    file_type = F.when(ext_type != "unknown", ext_type).otherwise(ladder_type)
    fname2 = F.when(
        (ext_type == "unknown") & ladder_ext.isNotNull(),
        F.concat(fname1, F.lit("."), ladder_ext),
    ).otherwise(fname1)

    n_bytes = F.length(payload)
    invalid_msg = F.concat(F.lit("Invalid "), F.upper(file_type),
                           F.lit(" file format - incorrect file signature"))
    reason = (
        F.when(F.col("http_status") != 200,
               F.concat(F.lit("Failed to download file: HTTP "),
                        F.col("http_status").cast("string")))
        .when(F.col("content_length_header").isNotNull()
              & (F.col("content_length_header") > MAX_FILE_SIZE),
              MSG_TOO_LARGE)
        .when(n_bytes > MAX_FILE_SIZE, MSG_TOO_LARGE)
        .when(n_bytes == 0, MSG_EMPTY)
        .when((file_type != "unknown") & ~_magic_ok(payload, file_type),
              invalid_msg)
        .when(file_type == "unknown", MSG_UNKNOWN_TYPE)
    )
    # gates that fire before the ladder report the pre-ladder filename
    # and 'unknown' type (the reference raises before resolving them)
    pre_ladder_reject = (
        (F.col("http_status") != 200)
        | (F.col("content_length_header").isNotNull()
           & (F.col("content_length_header") > MAX_FILE_SIZE))
        | (n_bytes > MAX_FILE_SIZE) | (n_bytes == 0)
    )
    return requests.select(
        url.alias("url"),
        F.when(pre_ladder_reject, fname1).otherwise(fname2).alias("filename"),
        F.when(pre_ladder_reject, "unknown").otherwise(file_type)
        .alias("file_type"),
        F.when(reason.isNull(), "accept").otherwise("reject").alias("action"),
        reason.alias("reason"),
    )
