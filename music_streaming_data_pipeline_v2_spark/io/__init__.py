from .sources import load_table, load_testdata, read_csv, read_json, read_orc, read_parquet
from .sinks import JsonDirKvClient, write_kv_batched, write_partitioned
