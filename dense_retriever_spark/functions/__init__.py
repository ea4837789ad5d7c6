from dense_retriever_spark.functions.tokenizer import (  # noqa: F401
    tokenize_code_expr,
    tokenize_code_pandas,
    tokenize_text_expr,
    TOKENIZE_TEXT_DUCKDB_SQL,
)
