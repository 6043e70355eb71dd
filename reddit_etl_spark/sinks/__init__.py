"""Sinks: append writers and the keyed-upsert stats sink (SURVEY §2.2)."""

from .versioned import (  # noqa: F401
    read_versioned,
    rollback,
    vacuum,
    versions,
    write_versioned,
)
from .writers import append_parquet, export_csv, upsert_partitioned  # noqa: F401
