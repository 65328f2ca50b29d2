from .scalar import (
    coerce_numeric,
    coerce_numeric_fill0,
    coerce_timestamp,
    genre_date_pk,
    date_pk,
    metric_sk,
    song_sk,
    genre_rank_sk,
    normalize_text,
)
