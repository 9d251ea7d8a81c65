from scabillmatch_spark.io.sources import (  # noqa: F401
    BILL_SCHEMA,
    read_bills_json,
    read_table,
    write_json,
    write_parquet,
)
