from kgspark.functions.textfns import (  # noqa: F401
    age_literal_udf,
    mint_uri_col,
    multi_or_raw_col,
    slugify_udf,
    trim_all,
)
