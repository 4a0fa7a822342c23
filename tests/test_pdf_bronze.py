"""PDF byte-stream parse stage: generator ↔ parser round-trip, the
reference's validation/metadata invariants (tests/unit/test_pdf_service.py
mirrored), and the bronze Spark stage incl. corrupted-input handling."""

import pytest

from n8n_tools_api_spark.operators.pdf_bronze import parse_pdf_staging
from n8n_tools_api_spark.refsem.pdfparse import (
    PdfParseError,
    build_pdf,
    get_pdf_metadata,
    parse_pdf_pages,
    validate_pdf_bytes,
)


class TestPdfRoundTrip:
    @pytest.mark.parametrize("n_pages", [1, 3, 5, 10, 20, 50])
    def test_pages_round_trip(self, n_pages):
        texts = [f"Page {i + 1} content with (parens) and \\ backslash"
                 for i in range(n_pages)]
        pdf = build_pdf(texts)
        assert validate_pdf_bytes(pdf)
        assert parse_pdf_pages(pdf) == texts

    def test_compressed_streams(self):
        texts = ["Compressed page one.", "Compressed page two."]
        pdf = build_pdf(texts, compress=True)
        assert parse_pdf_pages(pdf) == texts

    def test_metadata_invariants(self):
        # mirrors test_pdf_service.py metadata assertions: page_count>0,
        # file_size_bytes == len, MB rounding, 612x792pt = 8.5x11in
        pdf = build_pdf(["One.", "Two."], title="Test Doc", author="A. Author")
        meta = get_pdf_metadata(pdf)
        assert meta["page_count"] == 2
        assert meta["file_size_bytes"] == len(pdf)
        assert meta["file_size_mb"] == round(len(pdf) / 1048576, 2)
        assert meta["encrypted"] is False
        assert meta["metadata"] == {"Title": "Test Doc", "Author": "A. Author"}
        assert meta["page_dimensions"] == {
            "width": 612.0, "height": 792.0,
            "width_inches": 8.5, "height_inches": 11.0,
        }

    def test_invalid_inputs(self):
        with pytest.raises(PdfParseError):
            parse_pdf_pages(b"not a pdf at all")
        with pytest.raises(PdfParseError):
            parse_pdf_pages(b"%PDF-1.4\nno structure\n%%EOF")
        assert validate_pdf_bytes(b"") is False
        assert validate_pdf_bytes(b"%PDF-1.4 truncated, no eof") is False

    def test_corrupted_tail(self):
        pdf = bytearray(build_pdf(["Page."]))
        pdf[-200:] = b"\x00" * 200  # clobber xref+trailer incl. %%EOF
        assert validate_pdf_bytes(bytes(pdf)) is False


class TestBronzeStage:
    def test_parse_staging(self, spark):
        rows = [
            ("p1", build_pdf(["Alpha.", "Beta.", "Gamma."], title="T1")),
            ("p2", build_pdf(["Solo page."], compress=True)),
            ("bad", b"%PDF-1.4 garbage without structure %%EOF"),
            ("notpdf", b"PK\x03\x04 this is a zip"),
        ]
        staging = spark.createDataFrame(rows, "doc_id string, content binary")
        out = {r["doc_id"]: r for r in parse_pdf_staging(staging).collect()}

        p1 = out["p1"]
        assert p1["error"] is None
        assert p1["page_count"] == 3
        assert [s["text"] for s in p1["spans"]] == ["Alpha.", "Beta.", "Gamma."]
        assert [s["offset"] for s in p1["spans"]] == [0, 1, 2]
        assert all(s["kind"] == "pdf_page" for s in p1["spans"])
        assert p1["title"] == "T1"
        assert p1["width_inches"] == 8.5

        assert out["p2"]["page_count"] == 1
        assert out["p2"]["spans"][0]["text"] == "Solo page."

        for bad_id in ("bad", "notpdf"):
            assert out[bad_id]["error"] is not None
            assert out[bad_id]["spans"] == []
            assert out[bad_id]["page_count"] == 0

    def test_bronze_feeds_extraction(self, spark):
        """bronze → documents_interleaved → extract: the full §3.2 flow."""
        from n8n_tools_api_spark.operators import extract_spans
        from n8n_tools_api_spark.refsem import extract_document

        staging = spark.createDataFrame(
            [("d1", build_pdf(["Intro wordWord text.", "See ![fig](img-0.jpeg)."]))],
            "doc_id string, content binary",
        )
        bronze = parse_pdf_staging(staging).select("doc_id", "spans")
        got = extract_spans(bronze).collect()[0]
        expected = extract_document([
            {"kind": "pdf_page", "text": "Intro wordWord text.", "media_ref": "", "offset": 0},
            {"kind": "pdf_page", "text": "See ![fig](img-0.jpeg).", "media_ref": "", "offset": 1},
        ])
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in got["spans"]] == \
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected]
        # the markdown-ref fallback fired (no real images in the doc)
        assert got["spans"][-1]["text"].startswith("ref_1:fig")
