from tablite_spark.sources.io import (  # noqa: F401
    from_file, read_csv, read_json_columnar, read_parquet, from_pandas,
    save, load, to_csv, to_json_columnar, to_pandas, to_sql_script,
    get_headers,
)
