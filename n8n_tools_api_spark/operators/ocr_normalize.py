"""Official-format normalization + enhanced image records as COLUMN
EXPRESSIONS (SURVEY.md §3.2 stage 2, FIXTURES.md §5 ocr_responses).

The reference normalizes raw Mistral responses into the *official*
shape with hard defaults (_process_ocr_response_official_format,
mistral_service.py:1158-1215: index→0, markdown→'', images→[],
image coords→0, base64/annotation→'') and then optionally enriches
each image with coordinate math, quality flags and position analysis
(F8 mistral_service.py:665-727 / F9-F10 formatter variants).

Everything here is arithmetic / conditionals on a typed struct — no
regex, no rounding traps — so it stays JVM-side and whole-stage
codegen'd, per the built-in-vs-UDF split in SURVEY.md §7.2. Exactness
vs the Python transliteration is pinned by tests/test_ocr_normalize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# raw Mistral responses name coordinates inconsistently; canonical key →
# alias fallback order (mistral_service.py:678-684)
_COORD_ALIASES = {
    "top_left_x": ("top_left_x", "x1", "left"),
    "top_left_y": ("top_left_y", "y1", "top"),
    "bottom_right_x": ("bottom_right_x", "x2", "right"),
    "bottom_right_y": ("bottom_right_y", "y2", "bottom"),
}


def _py_or_chain(cands):
    """Column twin of Python ``a or b or c``: first non-null NON-ZERO
    candidate, else the last candidate's raw value (refsem
    coalesce_coordinate_aliases — a 0 coordinate falls through, the
    reference quirk we must preserve for span parity)."""
    result = cands[-1]
    for c in reversed(cands[:-1]):
        result = F.when(c.isNotNull() & (c != 0), c).otherwise(result)
    return result


def coalesce_image_aliases(responses: DataFrame) -> DataFrame:
    """Bronze→silver alias normalization for raw OCR image structs.

    Parity: mistral_service.py:665-727 (_extract_image_coordinates raw
    path). Input images structs may carry any subset of the alias keys
    (x1/left, y1/top, x2/right, y2/bottom); output rewrites them to the
    canonical 7-field struct normalize_official expects. Fields absent
    from the schema contribute NULL — purely schema-driven, no UDF.
    """
    img_type = None
    for f in responses.schema["pages"].dataType.elementType.fields:
        if f.name == "images":
            img_type = f.dataType.elementType
    if img_type is None:
        raise ValueError(
            "coalesce_image_aliases: pages.images field missing from "
            "schema — expected pages: array<struct<..., images: "
            "array<struct<...>>, ...>>, got "
            f"{responses.schema['pages'].dataType.simpleString()}"
        )
    present = {f.name for f in img_type.fields}

    def coord(im, canonical):
        cands = [
            im[a] if a in present else F.lit(None).cast("int")
            for a in _COORD_ALIASES[canonical]
        ]
        return _py_or_chain(cands).cast("int").alias(canonical)

    def opt(im, name, default_type="string"):
        return (im[name] if name in present
                else F.lit(None).cast(default_type)).alias(name)

    pages = F.transform(
        F.coalesce(F.col("pages"), F.array()),
        lambda p: F.struct(
            p["index"].alias("index"),
            p["markdown"].alias("markdown"),
            F.transform(
                p["images"],
                lambda im: F.struct(
                    opt(im, "id"),
                    coord(im, "top_left_x"),
                    coord(im, "top_left_y"),
                    coord(im, "bottom_right_x"),
                    coord(im, "bottom_right_y"),
                    opt(im, "image_base64"),
                    opt(im, "image_annotation"),
                ),
            ).alias("images"),
            p["dimensions"].alias("dimensions"),
        ),
    )
    return responses.withColumn("pages", pages)


def normalize_official(responses: DataFrame) -> DataFrame:
    """Fill the official-format defaults and recompute usage_info.

    Input schema: FIXTURES.md §5 (doc_id, pages array<struct<index,
    markdown, images, dimensions>>, model, usage_info, document_annotation).
    """
    pages = F.transform(
        F.coalesce(F.col("pages"), F.array()),
        lambda p: F.struct(
            F.coalesce(p["index"], F.lit(0)).alias("index"),
            F.coalesce(p["markdown"], F.lit("")).alias("markdown"),
            F.coalesce(
                F.transform(
                    p["images"],
                    lambda im: F.struct(
                        F.coalesce(im["id"], F.lit("")).alias("id"),
                        F.coalesce(im["top_left_x"], F.lit(0)).alias("top_left_x"),
                        F.coalesce(im["top_left_y"], F.lit(0)).alias("top_left_y"),
                        F.coalesce(im["bottom_right_x"], F.lit(0)).alias("bottom_right_x"),
                        F.coalesce(im["bottom_right_y"], F.lit(0)).alias("bottom_right_y"),
                        F.coalesce(im["image_base64"], F.lit("")).alias("image_base64"),
                        F.coalesce(im["image_annotation"], F.lit("")).alias("image_annotation"),
                    ),
                ),
                F.array().cast(
                    "array<struct<id:string,top_left_x:int,top_left_y:int,"
                    "bottom_right_x:int,bottom_right_y:int,"
                    "image_base64:string,image_annotation:string>>"
                ),
            ).alias("images"),
            F.struct(
                F.coalesce(p["dimensions"]["dpi"], F.lit(0)).alias("dpi"),
                F.coalesce(p["dimensions"]["height"], F.lit(0)).alias("height"),
                F.coalesce(p["dimensions"]["width"], F.lit(0)).alias("width"),
            ).alias("dimensions"),
        ),
    )
    return responses.select(
        "doc_id",
        pages.alias("pages"),
        F.coalesce(F.col("model"), F.lit("mistral-ocr-latest")).alias("model"),
        F.struct(
            F.size(pages).alias("pages_processed"),
            F.coalesce(F.col("usage_info.doc_size_bytes"), F.lit(0).cast("bigint"))
            .alias("doc_size_bytes"),
        ).alias("usage_info"),
        F.coalesce(F.col("document_annotation"), F.lit("")).alias("document_annotation"),
    )


def enhanced_images(responses: DataFrame) -> DataFrame:
    """Exploded per-image records with F8 coordinates, F9 quality flags
    and F10 position analysis — one row per image.

    Sequencing (W1): row_number over (doc, page position, image
    position) — the reference's cross-page image_counter
    (mistral_service.py:493,529-539).
    """
    normalized = normalize_official(responses)
    img = (
        normalized.select("doc_id", F.posexplode("pages").alias("page_pos", "p"))
        .select("doc_id", "page_pos",
                (F.col("p.index") + 1).alias("page_number"),
                F.col("p.dimensions.width").alias("page_width"),
                F.col("p.dimensions.height").alias("page_height"),
                F.posexplode("p.images").alias("img_pos", "im"))
    )
    w = Window.partitionBy("doc_id").orderBy("page_pos", "img_pos")

    tlx, tly = F.col("im.top_left_x"), F.col("im.top_left_y")
    brx, bry = F.col("im.bottom_right_x"), F.col("im.bottom_right_y")
    has_dims = (F.col("page_width") > 0) & (F.col("page_height") > 0)
    rel = lambda a, d: (a / d) * 100  # noqa: E731

    tlx_pct = F.when(has_dims, rel(tlx, F.col("page_width")))
    tly_pct = F.when(has_dims, rel(tly, F.col("page_height")))
    brx_pct = F.when(has_dims, rel(brx, F.col("page_width")))
    bry_pct = F.when(has_dims, rel(bry, F.col("page_height")))
    width_pct = brx_pct - tlx_pct
    height_pct = bry_pct - tly_pct

    center_x = (tlx_pct + brx_pct) / 2
    center_y = (tly_pct + bry_pct) / 2
    area_pct = width_pct * height_pct / 100

    quadrant = (
        F.when(~has_dims, "unknown")
        .when((center_x < 50) & (center_y < 50), "top-left")
        .when((center_x >= 50) & (center_y < 50), "top-right")
        .when((center_x < 50) & (center_y >= 50), "bottom-left")
        .otherwise("bottom-right")
    )
    relative_size = (
        F.when(~has_dims, "unknown")
        .when(area_pct > 25, "large")
        .when(area_pct > 5, "medium")
        .otherwise("small")
    )
    position_type = (
        F.when(~has_dims, "unknown")
        .when((center_x > 20) & (center_x < 80), "centered-horizontal")
        .when(center_x <= 20, "left-aligned")
        .otherwise("right-aligned")
    )

    # F9 confidence (service variant, mistral_service.py:768-807) on the
    # NORMALIZED shape: coords are always present ints post-normalization
    # (precision 'standard', no coordinate penalty), so confidence =
    # (0.9 with base64 | 0.7 without) − 0.1 for a blank annotation.
    has_b64 = F.trim(F.col("im.image_base64")) != ""
    has_ann = F.trim(F.col("im.image_annotation")) != ""
    confidence = (
        F.when(has_b64, F.lit(0.9)).otherwise(F.lit(0.7))
        - F.when(has_ann, F.lit(0.0)).otherwise(F.lit(0.1))
    )

    return img.select(
        "doc_id",
        F.row_number().over(w).alias("sequence_number"),
        "page_number",
        F.col("im.id").alias("image_id"),
        tlx.alias("top_left_x"), tly.alias("top_left_y"),
        brx.alias("bottom_right_x"), bry.alias("bottom_right_y"),
        (brx - tlx).alias("width"),
        (bry - tly).alias("height"),
        tlx_pct.alias("top_left_x_percent"),
        tly_pct.alias("top_left_y_percent"),
        brx_pct.alias("bottom_right_x_percent"),
        bry_pct.alias("bottom_right_y_percent"),
        width_pct.alias("width_percent"),
        height_pct.alias("height_percent"),
        (F.trim(F.col("im.image_annotation")) != "").alias("has_annotation"),
        (F.trim(F.col("im.image_base64")) != "").alias("has_base64_data"),
        quadrant.alias("quadrant"),
        relative_size.alias("relative_size"),
        position_type.alias("position_type"),
        F.round(confidence, 4).alias("confidence"),
    )


def document_quality_scores(responses: DataFrame) -> DataFrame:
    """A4 extraction-quality score per document.

    Parity: mistral_service.py:967-1003 — average over images of
    0.4·base64 + 0.3·coordinates (always present post-normalization) +
    0.2·annotation + 0.1·confidence; 0.0 for image-less docs. Pure
    groupBy over the enhanced-image rows.
    """
    imgs = enhanced_images(responses)
    per_image = (
        F.when(F.col("has_base64_data"), 0.4).otherwise(0.0)
        + F.lit(0.3)
        + F.when(F.col("has_annotation"), 0.2).otherwise(0.0)
        + F.col("confidence") * 0.1
    )
    scored = imgs.groupBy("doc_id").agg(
        F.round(F.avg(per_image), 4).alias("extraction_quality_score"),
        F.count("*").alias("n_images"),
    )
    all_docs = responses.select("doc_id")
    return (
        all_docs.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("extraction_quality_score", F.lit(0.0))
            .alias("extraction_quality_score"),
            F.coalesce("n_images", F.lit(0).cast("bigint")).alias("n_images"),
        )
    )
