"""CDC fold — collapse a change log (insert/update/delete events) into
the latest snapshot per key.

The batch core of every incremental ingestion pipeline: given rows
(key, seq, op, payload) where op ∈ {I, U, D} and seq orders changes
within a key (commit LSN, kafka offset, updated_at), the snapshot is
the payload of the highest-seq change per key, with keys whose latest
change is a delete dropped.

One window over (key ORDER BY seq DESC) — a single keyed shuffle; at
100 TB the log is partitioned by ingest date so the fold reads only new
partitions and merges with the previous snapshot (see
materialize._incremental merge for the table-side half).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_snapshot(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest non-deleted row per key. Ties on seq resolve to the
    delete-last interpretation (delete wins a tied seq — the safe
    reading of an ambiguous log).  Two DISTINCT same-op rows at one
    (key, seq) — a corrupt or at-least-once log — resolve to a
    DETERMINISTIC keeper: the final tiebreak is an md5 over the whole
    row's JSON (portable across engines and rerun-stable; to_json
    serializes any column type, so the contract holds for array/map
    payloads too), never partition order.  Exact duplicate rows
    collapse to the same hash and are interchangeable by definition.

    NULL ``op`` rows (an unparseable log record) are IGNORED up front —
    comparison semantics, same as NULL timestamps in asof_join. Without
    the filter a NULL-op row at the key's max seq wins the window rank
    and then fails ``op != delete_op`` (NULL), silently erasing the
    key's valid lower-seq history from the snapshot — one corrupt op
    byte acting as a delete (probed r10). Any NON-NULL op other than
    ``delete_op`` is an upsert, as before."""
    keys = list(keys)
    changes = changes.filter(F.col(op_col).isNotNull())
    is_delete = (F.col(op_col) == delete_op).cast("int")
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        is_delete.desc(),
        # UTC-rendered to_json: the hash of a timestamp column must not
        # depend on spark.sql.session.timeZone, or the keeper flips
        # between cluster configs (r10 review)
        F.md5(F.to_json(F.struct(*changes.columns), {"timeZone": "UTC"})).desc(),
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Merge a new change batch into an existing snapshot: fold the
    batch, then anti-join the old snapshot against every touched key
    (updates AND deletes) and union the fresh rows — the no-MERGE
    parquet rewrite, one anti-join + one fold.

    ``touched`` is computed from the NON-NULL-op rows only (the same
    rows the fold sees): a key whose batch rows are ALL unparseable
    (NULL op) must leave the old snapshot row in place — counting it
    as touched would anti-join the row away with nothing to replace
    it, a delete driven entirely by corrupt records."""
    keys = list(keys)
    applicable = changes.filter(F.col(op_col).isNotNull())
    folded = cdc_snapshot(applicable, keys, seq_col, op_col, delete_op)
    touched = applicable.select(*keys).distinct()
    kept = snapshot.join(touched, keys, "left_anti")
    return kept.unionByName(folded.select(*snapshot.columns))
