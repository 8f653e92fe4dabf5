"""Shared operator utilities."""

from __future__ import annotations

import pyarrow as pa


def schema_guard(schema: pa.Schema):
    """Normalizer to place AFTER a Dataset.join whose output feeds
    another shuffle: join tasks emit EMPTY blocks with an empty schema
    for empty hash partitions, and a downstream groupby/join then fails
    with acero's 'no match for key field' (seen in q_dedup_clusters
    before it dropped joins entirely). Maps every block onto the
    expected schema; empty/schemaless blocks become typed empty
    tables."""
    names = schema.names

    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        if not set(names) <= set(b.column_names):
            # a DATA-BEARING block missing expected columns is schema
            # drift (e.g. a Ray upgrade renaming join outputs) — raise
            # loudly instead of silently dropping rows
            raise ValueError(
                f"join output columns {b.column_names} missing expected "
                f"{sorted(set(names) - set(b.column_names))}")
        return pa.table({n: b.column(n).cast(schema.field(n).type)
                         for n in names}, schema=schema)

    return fix
