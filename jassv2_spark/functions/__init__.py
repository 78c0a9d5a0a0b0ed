from jassv2_spark.functions.checksum import fletcher_16  # noqa: F401
from jassv2_spark.functions.tokenizer import (  # noqa: F401
    extract_text,
    extract_text_udf,
    fold,
    make_tokenize_udf,
    spark_tokens,
    tokenize,
    tokenize_raw,
)
