from .sources import load_table, load_testdata, read_csv, read_parquet
from .sinks import write_partitioned
