from .normalize import (  # noqa: F401
    align_to_schema,
    coerce_timestamps,
    flatten_struct,
    normalize_columns,
    normalize_name,
    stringify_id,
    structs_to_json,
    with_lineage,
)
