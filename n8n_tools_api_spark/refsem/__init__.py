"""refsem — pure-Python reference semantics (the exact-equality surface).

Every function here is a deterministic pure function transliterated from
the reference service's observable behavior (file:line citations in each
docstring point into /root/reference). The same module is imported by

* the golden-fixture generator (driver side), and
* the Arrow-batched pandas UDFs (executor side),

so the Spark pipeline and the expected outputs can never drift apart.
Python ``re`` is used on purpose: the reference runs CPython regexes and
Java regex semantics (``\\s``, unicode classes) differ subtly — this is
why these stay in pandas UDFs rather than ``regexp_replace``.
"""

from .textclean import (
    clean_extracted_text,
    render_document_text,
    apply_text_formatting_enhancements,
    detect_primary_language,
    calculate_confidence_score,
    extract_markdown_image_refs,
    CONFIDENCE_PATTERNS,
    LANGUAGE_PATTERNS,
)
from .images import (
    coalesce_coordinate_aliases,
    detect_image_format,
    detect_image_format_full,
    validate_base64_image,
    image_size_info,
    normalize_image_coordinates,
    analyze_image_position,
    assess_image_quality,
    assess_mistral_image_quality,
    extraction_quality_score,
    classify_image_span,
    media_ref_for,
)
from .pdfops import (
    PageRangeError,
    parse_page_range,
    parse_range_list,
    split_output_name,
    split_pages,
    batch_windows,
    batch_split_info,
    merge_append_order,
    merge_interleave_order,
    merge_pages_order,
    merge_ranges_order,
    sanitize_filename,
)
from .boilerplate import strip_boilerplate
from .filetypes import (
    CONTENT_TYPES,
    MAGIC_BYTES,
    detect_file_type,
    validate_magic_bytes,
)
from .pipeline import extract_document, EXTRACT_SPEC_VERSION

__all__ = [
    "clean_extracted_text",
    "render_document_text",
    "apply_text_formatting_enhancements",
    "detect_primary_language",
    "calculate_confidence_score",
    "extract_markdown_image_refs",
    "CONFIDENCE_PATTERNS",
    "LANGUAGE_PATTERNS",
    "coalesce_coordinate_aliases",
    "detect_image_format",
    "detect_image_format_full",
    "validate_base64_image",
    "image_size_info",
    "normalize_image_coordinates",
    "analyze_image_position",
    "assess_image_quality",
    "assess_mistral_image_quality",
    "extraction_quality_score",
    "classify_image_span",
    "media_ref_for",
    "PageRangeError",
    "parse_page_range",
    "parse_range_list",
    "split_output_name",
    "split_pages",
    "batch_windows",
    "batch_split_info",
    "merge_append_order",
    "merge_interleave_order",
    "merge_pages_order",
    "merge_ranges_order",
    "sanitize_filename",
    "strip_boilerplate",
    "CONTENT_TYPES",
    "MAGIC_BYTES",
    "detect_file_type",
    "validate_magic_bytes",
    "extract_document",
    "EXTRACT_SPEC_VERSION",
]
