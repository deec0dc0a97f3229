from corral_spark.sources.tables import TABLES, load_table, load_tables
from corral_spark.sources.text import read_lines, read_kv_lines, parse_kv
from corral_spark.sources.sinks import write_tsv_kv, write_json_kv

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_lines",
    "read_kv_lines",
    "parse_kv",
    "write_tsv_kv",
    "write_json_kv",
]
