from .schema import (
    RESOURCE_ROW_FIELDS,
    SYNCTIMES_SCHEMA,
    TableLayout,
    resource_row_schema,
)

__all__ = [
    "RESOURCE_ROW_FIELDS",
    "SYNCTIMES_SCHEMA",
    "TableLayout",
    "resource_row_schema",
]
