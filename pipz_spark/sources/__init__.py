"""Sources & sinks.

The reference has no scan/source concept — users call I/O inside
closures (SURVEY §2.4). The engine exposes Spark's readers/writers as
first-class, with the test-table catalog as a convenience. Column
pruning + predicate pushdown then reach the parquet scan for free.
"""

from .catalog import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
