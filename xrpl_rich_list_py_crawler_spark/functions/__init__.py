"""Scalar function layer: pure-Python reference twins + Arrow UDFs +
JVM-side Column expressions (preferred in hot paths)."""

from .parsers_ref import (  # noqa: F401
    canonical_label,
    canonicalize_url,
    extract_links,
    extract_text,
    format_label,
    host_of,
    parse_percentage,
    parse_xrp_amount,
)
from .udfs import (  # noqa: F401
    canonical_label_col,
    canonicalize_url_udf,
    canonicalize_urls_split,
    extract_links_col,
    extract_links_udf,
    extract_page_udf,
    extract_text_col,
    extract_text_udf,
    format_label_col,
    host_col,
    parse_percentage_udf,
    parse_xrp_amount_udf,
    safe_ratio_col,
    url_host_udf,
)
