from .readers import (  # noqa: F401
    excel_rows_source,
    jdbc_window_reader,
    read_table,
    rest_source,
    window_predicate,
    windowed_extract_sql,
)
