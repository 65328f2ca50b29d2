from .dedup_ingest import run_incremental_dedup
from .index_ingest import query_index, run_incremental_index
from .semantic_ingest import run_incremental_semantic_dedup
from .pipeline import (
    stream_file_source,
    streaming_daily_kpis,
    run_incremental_pipeline,
    incremental_new_files_batch,
)
