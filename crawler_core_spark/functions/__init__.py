from crawler_core_spark.functions.url import (  # noqa: F401
    PARSE_RESULT_SCHEMA,
    canonical_url_col,
    canonicalize_urls_udf,
    parse_target_py,
    parse_targets_udf,
    url_key_col,
)
