"""Official-format normalization + enhanced image records vs refsem
(FIXTURES.md §5 edge rows: missing fields, no-base64, zero dims)."""

import pytest

from n8n_tools_api_spark.operators.ocr_normalize import (
    enhanced_images,
    normalize_official,
)
from n8n_tools_api_spark.refsem import (
    analyze_image_position,
    detect_file_type,
    normalize_image_coordinates,
    validate_magic_bytes,
)

OCR_SCHEMA = (
    "doc_id string, "
    "pages array<struct<index:int, markdown:string, "
    "images:array<struct<id:string,top_left_x:int,top_left_y:int,"
    "bottom_right_x:int,bottom_right_y:int,image_base64:string,"
    "image_annotation:string>>, "
    "dimensions:struct<dpi:int,height:int,width:int>>>, "
    "model string, "
    "usage_info struct<pages_processed:int, doc_size_bytes:bigint>, "
    "document_annotation string"
)


@pytest.fixture(scope="module")
def responses(spark):
    # mirrors the reference formatter fixture page/image values plus
    # FIXTURES.md §5 edge rows (missing fields, zero-dim pages)
    rows = [
        ("ok", [
            (0, "Page one.", [("img_1_1", 100, 200, 300, 400, "b64==", "Sample")],
             (200, 792, 612)),
            (1, "Page two.", [
                ("img_2_1", 50, 100, 200, 250, "b64b==", ""),
                ("img_2_2", 400, 500, 550, 650, "", "Logo"),
            ], (200, 792, 612)),
        ], "mistral-ocr-latest", (2, 1024000), "ann"),
        ("defaults", [(None, None, None, (None, None, None))], None, (None, None), None),
        ("zerodim", [(0, "x", [("i", 10, 10, 20, 20, "d==", "a")], (0, 0, 0))],
         "m", (1, 10), ""),
        ("empty", [], "m", (0, 0), ""),
    ]
    return spark.createDataFrame(rows, OCR_SCHEMA)


class TestNormalizeOfficial:
    def test_defaults_filled(self, spark, responses):
        out = {r["doc_id"]: r for r in normalize_official(responses).collect()}
        d = out["defaults"]
        page = d["pages"][0]
        assert page["index"] == 0
        assert page["markdown"] == ""
        assert list(page["images"]) == []
        assert page["dimensions"].asDict() == {"dpi": 0, "height": 0, "width": 0}
        assert d["model"] == "mistral-ocr-latest"
        assert d["usage_info"]["pages_processed"] == 1
        assert d["usage_info"]["doc_size_bytes"] == 0
        assert d["document_annotation"] == ""
        assert out["empty"]["usage_info"]["pages_processed"] == 0

    def test_passthrough_preserved(self, spark, responses):
        out = {r["doc_id"]: r for r in normalize_official(responses).collect()}
        ok = out["ok"]
        assert ok["pages"][0]["images"][0]["id"] == "img_1_1"
        assert ok["usage_info"]["doc_size_bytes"] == 1024000


class TestEnhancedImages:
    def test_matches_refsem_coordinate_math(self, spark, responses):
        rows = {(r["doc_id"], r["image_id"]): r
                for r in enhanced_images(responses).collect()}
        r = rows[("ok", "img_1_1")]
        ref = normalize_image_coordinates(
            {"top_left_x": 100, "top_left_y": 200,
             "bottom_right_x": 300, "bottom_right_y": 400},
            {"width": 612, "height": 792},
        )
        assert r["width"] == ref["dimensions"]["width"]
        assert r["height"] == ref["dimensions"]["height"]
        assert r["top_left_x_percent"] == pytest.approx(
            ref["relative"]["top_left_x_percent"])
        assert r["width_percent"] == pytest.approx(
            ref["dimensions"]["width_percent"])
        pos = analyze_image_position(ref)
        assert (r["quadrant"], r["relative_size"], r["position_type"]) == \
            (pos["quadrant"], pos["relative_size"], pos["position_type"])

    def test_sequence_numbers_cross_pages(self, spark, responses):
        rows = [(r["image_id"], r["sequence_number"], r["page_number"])
                for r in enhanced_images(responses)
                .where("doc_id = 'ok'").orderBy("sequence_number").collect()]
        assert rows == [("img_1_1", 1, 1), ("img_2_1", 2, 2), ("img_2_2", 3, 2)]

    def test_zero_dims_unknown_positions(self, spark, responses):
        r = enhanced_images(responses).where("doc_id = 'zerodim'").collect()[0]
        assert r["quadrant"] == "unknown"
        assert r["relative_size"] == "unknown"
        assert r["position_type"] == "unknown"
        assert r["top_left_x_percent"] is None

    def test_quality_flags(self, spark, responses):
        rows = {r["image_id"]: r for r in
                enhanced_images(responses).where("doc_id = 'ok'").collect()}
        assert rows["img_1_1"]["has_annotation"] is True
        assert rows["img_2_1"]["has_annotation"] is False
        assert rows["img_2_2"]["has_base64_data"] is False


class TestQualityModel:
    def test_refsem_confidence_arithmetic(self):
        from n8n_tools_api_spark.refsem import assess_mistral_image_quality

        full = assess_mistral_image_quality(
            {"image_annotation": "note", "top_left_x": 1, "top_left_y": 2,
             "bottom_right_x": 3, "bottom_right_y": 4}, "b64")
        assert full["confidence"] == 0.9
        assert full["coordinate_precision"] == "standard"
        no_b64 = assess_mistral_image_quality(
            {"image_annotation": "note", "top_left_x": 1, "top_left_y": 2,
             "bottom_right_x": 3, "bottom_right_y": 4}, None)
        assert no_b64["confidence"] == 0.7
        assert no_b64["completeness"] == "coordinates_only"
        no_ann = assess_mistral_image_quality(
            {"image_annotation": " ", "top_left_x": 1.5, "top_left_y": 2,
             "bottom_right_x": 3, "bottom_right_y": 4}, "b64")
        assert no_ann["confidence"] == pytest.approx(0.8)
        assert no_ann["coordinate_precision"] == "high"
        no_coords = assess_mistral_image_quality({"image_annotation": ""}, None)
        assert no_coords["confidence"] == pytest.approx(0.3)
        assert no_coords["coordinate_precision"] == "none"

    def test_spark_confidence_matches_refsem_on_normalized_rows(self, spark, responses):
        from n8n_tools_api_spark.refsem import assess_mistral_image_quality

        rows = {(r["doc_id"], r["image_id"]): r
                for r in enhanced_images(responses).collect()}
        cases = {
            ("ok", "img_1_1"): ("b64==", "Sample"),
            ("ok", "img_2_1"): ("b64b==", ""),
            ("ok", "img_2_2"): ("", "Logo"),
        }
        for key, (b64, ann) in cases.items():
            ref = assess_mistral_image_quality(
                {"image_annotation": ann, "top_left_x": 1, "top_left_y": 1,
                 "bottom_right_x": 2, "bottom_right_y": 2}, b64 or None)
            assert rows[key]["confidence"] == pytest.approx(ref["confidence"]), key

    def test_document_scores_match_refsem(self, spark, responses):
        from n8n_tools_api_spark.operators.ocr_normalize import document_quality_scores
        from n8n_tools_api_spark.refsem import extraction_quality_score

        got = {r["doc_id"]: r for r in document_quality_scores(responses).collect()}
        # refsem composition for the 'ok' doc (coordinates always present
        # post-normalization)
        imgs = [
            {"base64_data": "b64==", "coordinates": {"x": 1}, "annotation": "Sample",
             "extraction_quality": {"confidence": 0.9}},
            {"base64_data": "b64b==", "coordinates": {"x": 1}, "annotation": "",
             "extraction_quality": {"confidence": 0.8}},
            {"base64_data": "", "coordinates": {"x": 1}, "annotation": "Logo",
             "extraction_quality": {"confidence": 0.7}},
        ]
        assert got["ok"]["extraction_quality_score"] == pytest.approx(
            round(extraction_quality_score(imgs), 4))
        assert got["empty"]["extraction_quality_score"] == 0.0
        assert got["empty"]["n_images"] == 0
        assert extraction_quality_score([]) == 0.0


class TestFileTypes:
    def test_magic_table(self):
        assert detect_file_type(b"%PDF-1.4 ...") == "pdf"
        assert detect_file_type(b"\x89PNG\r\n\x1a\n....") == "png"
        assert detect_file_type(b"\xff\xd8\xff\xe0JFIF") == "jpg"
        assert detect_file_type(b"II*\x00rest") == "tiff"
        assert detect_file_type(b"MM\x00*rest") == "tiff"
        assert detect_file_type(b"PK\x03\x04") == "unknown"
        assert detect_file_type(b"") == "unknown"
        assert validate_magic_bytes(b"\xff\xd8\xffdata", "jpeg") is True
        assert validate_magic_bytes(b"\xff\xd8\xffdata", "docx") is False


class TestImageLimit:
    def test_cap_applied_in_offset_order(self):
        from n8n_tools_api_spark.refsem import extract_document
        from n8n_tools_api_spark.sources.synthetic import CANONICAL_PNG_B64

        spans = [{"kind": "image", "text": CANONICAL_PNG_B64, "media_ref": "",
                  "offset": i} for i in range(55)]
        out = extract_document(spans)
        assert len(out) == 50
        out_unlimited = extract_document(spans, image_limit=None)
        assert len(out_unlimited) == 55
        # cap keeps the FIRST 50 by offset, even with shuffled array order
        shuffled = list(reversed(spans))
        assert extract_document(shuffled) == out


class TestCoordinateAliasCoalesce:
    # canonical, x1-style, left-style, the 0-falls-through quirk, all-falsy
    CASES = [
        {"top_left_x": 10, "top_left_y": 20, "bottom_right_x": 110,
         "bottom_right_y": 220},
        {"x1": 5, "y1": 6, "x2": 50, "y2": 60},
        {"left": 7, "top": 8, "right": 70, "bottom": 80},
        # reference quirk: 0 is falsy in `a or b or c`, so x1 wins
        {"top_left_x": 0, "x1": 9, "top_left_y": 3, "bottom_right_x": 33,
         "bottom_right_y": 44},
        # everything falsy → last alias's raw value survives (None here)
        {"top_left_x": 0, "x1": 0},
        {},
    ]

    def test_matches_refsem_or_semantics(self, spark):
        from n8n_tools_api_spark.operators.ocr_normalize import (
            coalesce_image_aliases)
        from n8n_tools_api_spark.refsem import coalesce_coordinate_aliases

        schema = (
            "doc_id string, "
            "pages array<struct<index:int, markdown:string, "
            "images:array<struct<id:string,"
            "top_left_x:int,x1:int,left:int,"
            "top_left_y:int,y1:int,top:int,"
            "bottom_right_x:int,x2:int,right:int,"
            "bottom_right_y:int,y2:int,bottom:int,"
            "image_base64:string,image_annotation:string>>, "
            "dimensions:struct<dpi:int,height:int,width:int>>>, "
            "model string, "
            "usage_info struct<pages_processed:int, doc_size_bytes:bigint>, "
            "document_annotation string"
        )
        keys = ["top_left_x", "x1", "left", "top_left_y", "y1", "top",
                "bottom_right_x", "x2", "right",
                "bottom_right_y", "y2", "bottom"]
        images = [
            tuple([f"img_{i}"] + [c.get(k) for k in keys] + ["b64==", ""])
            for i, c in enumerate(self.CASES)
        ]
        df = spark.createDataFrame(
            [("d0", [(0, "md", images, (200, 792, 612))], "m", (1, 10), "")],
            schema,
        )
        out = coalesce_image_aliases(df).collect()[0]
        got = {im["id"]: im for im in out["pages"][0]["images"]}
        for i, case in enumerate(self.CASES):
            expected = coalesce_coordinate_aliases(case)
            im = got[f"img_{i}"]
            for canon in ["top_left_x", "top_left_y",
                          "bottom_right_x", "bottom_right_y"]:
                assert im[canon] == expected[canon], (i, canon, dict(im.asDict()))
        # output struct is the canonical 7-field shape normalize_official
        # expects, so the silver path runs unchanged
        from n8n_tools_api_spark.operators.ocr_normalize import enhanced_images
        rows = enhanced_images(coalesce_image_aliases(df)).collect()
        assert len(rows) == len(self.CASES)

    def test_missing_alias_columns_are_fine(self, spark):
        from n8n_tools_api_spark.operators.ocr_normalize import (
            coalesce_image_aliases, enhanced_images)

        # schema with ONLY x1-style keys — canonical/left variants absent
        schema = (
            "doc_id string, "
            "pages array<struct<index:int, markdown:string, "
            "images:array<struct<id:string,x1:int,y1:int,x2:int,y2:int,"
            "image_base64:string,image_annotation:string>>, "
            "dimensions:struct<dpi:int,height:int,width:int>>>, "
            "model string, "
            "usage_info struct<pages_processed:int, doc_size_bytes:bigint>, "
            "document_annotation string"
        )
        df = spark.createDataFrame(
            [("d0", [(0, "md", [("a", 5, 6, 50, 60, "x", "")],
                      (200, 792, 612))], "m", (1, 9), "")],
            schema,
        )
        im = enhanced_images(coalesce_image_aliases(df)).collect()[0]
        assert (im["top_left_x"], im["top_left_y"]) == (5, 6)
        assert (im["bottom_right_x"], im["bottom_right_y"]) == (50, 60)
        assert im["width"] == 45 and im["height"] == 54
