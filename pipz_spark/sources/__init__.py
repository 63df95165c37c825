"""Sources & sinks.

The reference has no scan/source concept — users call I/O inside
closures (SURVEY §2.4). The engine exposes Spark's readers/writers as
first-class, with the test-table catalog as a convenience. Column
pruning + predicate pushdown then reach the parquet scan for free.
"""

from .catalog import TABLES, load_table, load_tables, register_views
from .readers import read_binary_dir, read_csv, read_jdbc, read_json, read_orc, read_text
from .sinks import (
    append_log_sink,
    compact_log,
    dead_letter_handler,
    flatten_dead_letter,
    merge_parquet_sink,
    read_latest,
    read_merged,
    write_bucketed,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_shuffled_export,
    write_split,
)

__all__ = [
    "TABLES",
    "append_log_sink",
    "compact_log",
    "dead_letter_handler",
    "flatten_dead_letter",
    "load_table",
    "load_tables",
    "merge_parquet_sink",
    "read_binary_dir",
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_latest",
    "read_merged",
    "read_orc",
    "read_text",
    "register_views",
    "write_bucketed",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
    "write_shuffled_export",
    "write_split",
]
