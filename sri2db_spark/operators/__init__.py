from .merge import (
    anti_join_missing,
    change_detecting_upsert,
    dedup_latest,
    insert_if_absent,
    merge_full,
    merge_incremental,
    semi_join_delete,
    set_difference_delete,
)
from .normalize import normalize_api_page, project_to_row, repair_resources
from .watermark import advance_watermark, max_modified_millis

__all__ = [
    "anti_join_missing",
    "change_detecting_upsert",
    "dedup_latest",
    "insert_if_absent",
    "merge_full",
    "merge_incremental",
    "semi_join_delete",
    "set_difference_delete",
    "normalize_api_page",
    "project_to_row",
    "repair_resources",
    "advance_watermark",
    "max_modified_millis",
]
