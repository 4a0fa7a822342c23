"""Property-based tests (hypothesis) over the refsem surface — the
fuzz layer the reference lacks entirely (SURVEY.md §5 'Absent')."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from n8n_tools_api_spark.refsem import (
    PageRangeError,
    batch_windows,
    clean_extracted_text,
    extract_document,
    merge_append_order,
    merge_interleave_order,
    parse_page_range,
    strip_boilerplate,
)

text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n.!?,:;#*()[]",
    max_size=400,
)


class TestCleanProperties:
    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_never_crashes_and_invariants(self, s):
        out = clean_extracted_text(s)
        assert out == out.strip()
        # pass 1+2 post-conditions hold on the final output
        assert "\n\n\n" not in out
        assert "\t" not in out
        assert "  " not in out.replace("\n", "x")

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_no_space_before_sentence_punct(self, s):
        out = clean_extracted_text(s)
        for p in ".!?,:;":
            assert f" {p}" not in out


class TestRangeParserProperties:
    @given(st.integers(1, 500), st.integers(1, 500), st.integers(1, 500))
    @settings(max_examples=200, deadline=None)
    def test_valid_ranges_roundtrip(self, a, b, total):
        lo, hi = min(a, b), max(a, b)
        if hi > total:
            lo, hi = 1, total
        s, e = parse_page_range(f"{lo}-{hi}", total)
        assert (s, e) == (lo - 1, hi - 1)
        assert 0 <= s <= e < total

    @given(st.text(max_size=12), st.integers(1, 100))
    @settings(max_examples=300, deadline=None)
    def test_arbitrary_strings_parse_or_raise_cleanly(self, s, total):
        try:
            lo, hi = parse_page_range(s, total)
        except PageRangeError:
            return
        assert 0 <= lo <= hi < total


class TestBatchMergeProperties:
    @given(st.integers(1, 2000), st.integers(1, 1000))
    @settings(max_examples=200, deadline=None)
    def test_batches_partition_the_document(self, total, bs):
        wins = batch_windows(total, bs)
        # contiguous, non-overlapping, covering 1..total
        assert wins[0]["page_lo"] == 1
        assert wins[-1]["page_hi"] == total
        for prev, cur in zip(wins, wins[1:]):
            assert cur["page_lo"] == prev["page_hi"] + 1
        assert all(w["page_hi"] - w["page_lo"] + 1 <= bs for w in wins)
        assert len(wins) == (total + bs - 1) // bs

    @given(st.lists(st.integers(0, 20), min_size=1, max_size=10))
    @settings(max_examples=200, deadline=None)
    def test_merge_orders_are_permutations(self, counts):
        total = sum(counts)
        app = merge_append_order(counts)
        inter = merge_interleave_order(counts)
        assert len(app) == len(inter) == total
        assert set(app) == set(inter)  # same multiset of pages
        # interleave emits rounds: page indices are non-decreasing
        assert [p for _, p in inter] == sorted(p for _, p in inter)


class TestExtractDocumentProperties:
    spans_strategy = st.lists(
        st.fixed_dictionaries({
            "kind": st.sampled_from(["text", "html", "pdf_page", "image", "junk"]),
            "text": st.one_of(st.none(), text_strategy),
            "media_ref": st.just(""),
            "offset": st.integers(0, 1000),
        }),
        max_size=12,
    )

    @given(spans_strategy)
    @settings(max_examples=150, deadline=None)
    def test_array_order_never_matters(self, spans):
        # W5: only offsets define order; any array permutation of the
        # same spans must extract identically
        out1 = extract_document([dict(s) for s in spans])
        out2 = extract_document([dict(s) for s in reversed(spans)])
        # ties on offset resolve by array position, so only compare when
        # offsets are unique
        offsets = [s["offset"] for s in spans]
        if len(set(offsets)) == len(offsets):
            assert out1 == out2

    @given(spans_strategy)
    @settings(max_examples=150, deadline=None)
    def test_output_contract(self, spans):
        out = extract_document(spans)
        assert [s["offset"] for s in out] == list(range(len(out)))
        assert all(s["kind"] in ("text", "image") for s in out)
        assert all(isinstance(s["text"], str) for s in out)


class TestPdfParseProperties:
    # PDF string objects are latin-1-representable by construction
    pdf_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=255),
        max_size=120,
    )

    @given(st.lists(pdf_text, min_size=1, max_size=8))
    @settings(max_examples=80, deadline=None)
    def test_build_parse_round_trip(self, texts):
        from n8n_tools_api_spark.refsem.pdfparse import build_pdf, parse_pdf_pages

        assert parse_pdf_pages(build_pdf(texts)) == texts

    @given(st.lists(pdf_text, min_size=1, max_size=4))
    @settings(max_examples=40, deadline=None)
    def test_compressed_round_trip(self, texts):
        from n8n_tools_api_spark.refsem.pdfparse import build_pdf, parse_pdf_pages

        assert parse_pdf_pages(build_pdf(texts, compress=True)) == texts

    @given(st.binary(max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_garbage_never_crashes(self, blob):
        from n8n_tools_api_spark.refsem.pdfparse import (
            PdfParseError, parse_pdf_pages, validate_pdf_bytes,
        )

        try:
            pages = parse_pdf_pages(blob)
        except PdfParseError:
            return
        assert validate_pdf_bytes(blob)
        assert isinstance(pages, list)


class TestPdfStreamEdgeCases:
    def test_indirect_length_falls_back_to_endstream_scan(self):
        # "/Length 12 0 R" must NOT match as direct length 1 via regex
        # backtracking (review finding) — the parser falls back to the
        # endstream scan and still decodes the stream
        import zlib

        from n8n_tools_api_spark.refsem.pdfparse import _stream_bytes

        payload = b"BT /F1 12 Tf (hello) Tj ET"
        comp = zlib.compress(payload)
        body = (b"<< /Length 12 0 R /Filter /FlateDecode >>\nstream\n"
                + comp + b"\nendstream")
        assert _stream_bytes(body) == payload

    def test_direct_multidigit_length_slices_exactly(self):
        import zlib

        from n8n_tools_api_spark.refsem.pdfparse import _stream_bytes

        payload = b"BT (x) Tj ET" * 20
        comp = zlib.compress(payload)
        body = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp + b"\nendstream")
        assert _stream_bytes(body) == payload

    def test_compressed_data_ending_in_cr_survives(self):
        # without /Length, the EOL-before-endstream strip must not eat a
        # data byte; with /Length the slice is exact either way
        from n8n_tools_api_spark.refsem.pdfparse import _stream_bytes

        data = b"abc\r"
        body = (b"<< /Length %d >>\nstream\n" % len(data)
                + data + b"\nendstream")
        assert _stream_bytes(body) == data


class TestBoilerplateProperties:
    @given(st.text(max_size=300))
    @settings(max_examples=150, deadline=None)
    def test_never_crashes_deterministic(self, s):
        assert strip_boilerplate(s) == strip_boilerplate(s)
