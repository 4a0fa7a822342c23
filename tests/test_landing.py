"""URL-landing classification (S3's deterministic core):
refsem/landing.py truth table incl. the reference's quirks, and the
column-expression plan's exact agreement with refsem."""

import pytest

from n8n_tools_api_spark.refsem.landing import (
    MSG_EMPTY,
    MSG_TOO_LARGE,
    MSG_UNKNOWN_TYPE,
    classify_url_landing,
    derive_url_filename,
)

PDF = b"%PDF-1.4 rest"
PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
JPG = b"\xff\xd8\xff\xe0 rest"
TIFF_BE = b"MM\x00*" + b"\x00" * 8


class TestDeriveFilename:
    def test_basename_excludes_query_and_fragment(self):
        assert derive_url_filename(
            "https://h/docs/a.pdf?session=1#p2") == "a.pdf"

    def test_missing_extension_defaults_to_pdf(self):
        assert derive_url_filename("https://h/dl/report") == "report.pdf"
        assert derive_url_filename("https://h/") == "remote_document.pdf"
        assert derive_url_filename("https://h") == "remote_document.pdf"

    def test_case_insensitive_extension_is_kept(self):
        assert derive_url_filename("https://h/photo.JPG") == "photo.JPG"

    def test_hidden_file_quirk_no_append(self):
        # '.pdf'.endswith('.pdf') is True → nothing appended, yet
        # splitext sees no extension (ocr_utils quirk, module docstring)
        assert derive_url_filename("https://h/.pdf") == ".pdf"


class TestClassify:
    def test_happy_paths(self):
        for url, ct, payload, ftype in [
            ("https://h/a.pdf", "application/pdf", PDF, "pdf"),
            ("https://h/i.png", "image/png", PNG, "png"),
            ("https://h/p.JPG", "image/jpeg", JPG, "jpeg"),
            ("https://h/t.tiff", "image/tiff", TIFF_BE, "tiff"),
        ]:
            out = classify_url_landing(url, 200, ct, len(payload), payload)
            assert out["action"] == "accept" and out["file_type"] == ftype

    def test_gate_order_and_messages(self):
        assert classify_url_landing("https://h/a.pdf", 404, None, None, PDF)[
            "reason"] == "Failed to download file: HTTP 404"
        assert classify_url_landing("https://h/a.pdf", 200, None,
                                    60 * 1024 * 1024, PDF)["reason"] \
            == MSG_TOO_LARGE
        assert classify_url_landing("https://h/a.pdf", 200, None, None,
                                    b"")["reason"] == MSG_EMPTY

    def test_defaulted_pdf_extension_rejects_png_payload(self):
        # reference quirk: extensionless PNG URL → 'x.pdf' → type pdf →
        # magic validation fails with the PDF message
        out = classify_url_landing("https://h/dl/x", 200,
                                   "application/octet-stream", None, PNG)
        assert out == {"filename": "x.pdf", "file_type": "pdf",
                       "action": "reject",
                       "reason": "Invalid PDF file format - "
                                 "incorrect file signature"}

    def test_hidden_file_reaches_content_type_ladder(self):
        out = classify_url_landing("https://h/.pdf", 200,
                                   "application/pdf", None, PDF)
        assert out["action"] == "accept"
        assert out["filename"] == ".pdf.pdf"  # ladder appends again

    def test_magic_sniff_yields_jpg_not_jpeg(self):
        # sniff path labels FFD8FF 'jpg'; the extension path says
        # 'jpeg' — the reference's two resolution paths disagree
        out = classify_url_landing("https://h/.png", 200,
                                   "application/octet-stream", None, JPG)
        assert out == {"filename": ".png.jpg", "file_type": "jpg",
                       "action": "accept", "reason": None}

    def test_unknown_everything_rejects(self):
        out = classify_url_landing("https://h/.tiff", 200, "text/plain",
                                   None, b"\xde\xad\xbe\xef")
        assert out["reason"] == MSG_UNKNOWN_TYPE


@pytest.fixture(scope="module")
def corpus():
    rows = [
        ("https://cdn.h.com/docs/a.pdf?sig=1", 200, "application/pdf",
         len(PDF), PDF),
        ("https://h/img/i.png", 200, "image/png", None, PNG),
        ("https://h/p.JPG", 200, "image/jpeg", len(JPG), JPG),
        ("https://h/t.tiff", 200, "image/tiff", None, TIFF_BE),
        ("https://h/t2.tiff", 200, None, None, b"II*\x00" + b"\x00" * 4),
        ("https://h/dl/report", 200, "application/pdf", None, PDF),
        ("https://h/dl/x", 200, "application/octet-stream", None, PNG),
        ("https://h/a.pdf", 404, None, None, PDF),
        ("https://h/big.pdf", 200, "application/pdf",
         60 * 1024 * 1024, PDF),
        ("https://h/empty.png", 200, "image/png", None, b""),
        ("https://h/.pdf", 200, "application/pdf", None, PDF),
        ("https://h/.png", 200, "application/octet-stream", None, JPG),
        ("https://h/.tiff", 200, "text/plain", None, b"\xde\xad\xbe\xef"),
        ("https://h/", 200, "application/pdf", None, PDF),
        ("https://h/noext", 200, None, None, b"garbage"),
        # fetch never completed: NULL status must reject ('HTTP None'),
        # never fall through NULL comparisons into acceptance
        ("https://h/pending.pdf", None, None, None, PDF),
    ]
    return rows


class TestPlanMatchesRefsem:
    def test_column_plan_agrees_with_refsem(self, spark, corpus):
        from n8n_tools_api_spark.operators.landing import url_landing_plan

        df = spark.createDataFrame(
            [(u, s, ct, cl, bytearray(p) if p is not None else None)
             for u, s, ct, cl, p in corpus],
            "url string, http_status int, content_type string, "
            "content_length_header bigint, payload binary",
        )
        got = {r["url"]: (r["filename"], r["file_type"], r["action"],
                          r["reason"])
               for r in url_landing_plan(df).collect()}
        for u, s, ct, cl, p in corpus:
            want = classify_url_landing(u, s, ct, cl, p)
            assert got[u] == (want["filename"], want["file_type"],
                              want["action"], want["reason"]), u

    def test_plan_is_narrow_and_udf_free(self, spark, corpus):
        from n8n_tools_api_spark.operators.landing import url_landing_plan

        df = spark.createDataFrame(
            [(u, s, ct, cl, bytearray(p) if p is not None else None)
             for u, s, ct, cl, p in corpus],
            "url string, http_status int, content_type string, "
            "content_length_header bigint, payload binary",
        )
        plan = url_landing_plan(df)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
