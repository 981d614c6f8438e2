"""Save modes + merge options.

Reference: `definitions/SDLSaveMode.scala:32-98` (mode enum) and :126-153
(SaveModeMergeOptions: delete/update/insert conditions, column subsets,
additional join predicate used to prune the records read from the existing
table — the key scale lever for merge on a 100 TB table).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class SaveMode(str, Enum):
    OVERWRITE = "overwrite"
    APPEND = "append"
    ERROR_IF_EXISTS = "error"
    IGNORE = "ignore"
    # delete matching partitions, then append — avoids rewriting untouched
    # partitions (SDLSaveMode.OverwriteOptimized)
    OVERWRITE_OPTIMIZED = "overwrite_optimized"
    # preserve directory structure on overwrite (file DOs)
    OVERWRITE_PRESERVE_DIRECTORIES = "overwrite_preserve_directories"
    MERGE = "merge"


@dataclass
class SaveModeMergeOptions:
    """Options for SaveMode.MERGE (SDLSaveMode.scala:126-153)."""

    delete_condition: str | None = None
    update_condition: str | None = None
    update_columns: list[str] | None = None
    # second matched-update branch updating ALL columns from the source —
    # used by HistorizeAction to backfill dl_hash on existing tables
    # (SDLSaveMode.scala:129 updateExistingCondition)
    update_existing_condition: str | None = None
    insert_condition: str | None = None
    insert_columns_to_ignore: list[str] = field(default_factory=list)
    insert_values_override: dict[str, str] = field(default_factory=dict)
    # extra predicate ANDed into the merge join — lets the engine prune the
    # existing-table scan (e.g. "existing.dt >= '2024-01-01'")
    additional_merge_predicate: str | None = None
