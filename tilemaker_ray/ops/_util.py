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
        if b.num_rows == 0 or not set(names) <= set(b.column_names):
            return schema.empty_table()
        return pa.table({n: b.column(n).cast(schema.field(n).type)
                         for n in names}, schema=schema)

    return fix
