"""Engine-level checkpoint strategy: one knob, two durability tiers.

Iterative operators (connected-components label propagation), stage
boundaries consumed by multiple downstream branches (corpus pipeline,
LSH banding), and read-then-act snapshots (tombstone folds, IVF probe
pins) all need to *pin* a DataFrame: truncate lineage so plans stay
O(1) across iterations, and freeze one materialization so two
consumers (or a count + a write) see the same rows even when the
upstream plan is nondeterministic (sampling, file re-listing).

``pin(df)`` is the single entry point.  Strategy:

* **default** — ``DataFrame.localCheckpoint``: blocks are cached on
  executors, zero external storage.  Correct and fastest on
  ``local[*]`` and on clusters where executor loss mid-query is
  acceptable (the query fails and is retried from source).
* **reliable** — set the session conf
  ``spark.dbt_foundation_spark.checkpointDir`` to a durable path
  (HDFS/S3A/ABFS on a real cluster, any directory locally) and every
  ``pin`` routes through ``DataFrame.checkpoint`` instead: blocks are
  written to that filesystem, so a lost executor replays from the
  checkpoint files rather than recomputing the whole lineage — the
  fault-tolerance tier a 1000-executor, hours-long dedup job needs.

The conf is read per-call (runtime-settable, no session restart); a
reliable ``pin`` installs the directory on the SparkContext via
``setCheckpointDir`` (Spark appends a per-context UUID subdir, so two
jobs sharing a root never collide) and RE-installs it whenever the
conf value changes mid-session (round-10 verdict #5: installing only
when unset silently kept the first directory forever).  Already-written
checkpoint files under the old root stay valid — Spark resolves each
checkpointed RDD against the directory captured at its own checkpoint
time — only NEW pins move.  An explicitly pre-set
``SparkContext.setCheckpointDir`` alone does NOT flip the strategy —
user RDD checkpointing is out of scope; only the engine conf opts in —
but once the conf IS set, the engine's root wins over a pre-set one.

Operational note: reliable checkpoint files are NOT auto-deleted at
job end unless ``spark.cleaner.referenceTracking.cleanCheckpoints`` is
``true``; on a shared durable root, schedule cleanup of the UUID
subdirs or enable the cleaner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_DIR_CONF = "spark.dbt_foundation_spark.checkpointDir"

# applicationId -> (conf root THIS module last installed, the resolved
# directory SparkContext reported right after).  ``getCheckpointDir``
# returns the UUID subdir Spark appends, never the root we passed, so
# equality against the conf can't be checked through the context alone
# — but remembering the RESOLVED dir lets a later pin detect that user
# code called ``sc.setCheckpointDir`` behind the engine's back and
# re-assert the conf root (the documented "once the conf is set, the
# engine's root wins" contract; r11 review).
_installed_roots: dict[str, tuple[str, str | None]] = {}


def checkpoint_dir(df_or_spark) -> str | None:
    """The configured reliable-checkpoint root, or None (local tier)."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    val = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    return val or None


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage and freeze one materialization of ``df``.

    ``localCheckpoint(eager=...)`` unless the session conf
    ``spark.dbt_foundation_spark.checkpointDir`` is set, in which case
    ``checkpoint(eager=...)`` against that directory.  Both tiers give
    the same single-materialization semantics the callers rely on
    (atomic read-then-act snapshots, O(1) iterative plans); they differ
    only in where the blocks live and therefore what survives executor
    loss.  See module docstring.
    """
    root = checkpoint_dir(df)
    if root is None:
        return df.localCheckpoint(eager=eager)
    spark = df.sparkSession
    sc = spark.sparkContext
    app = sc.applicationId
    current = sc.getCheckpointDir()
    installed = _installed_roots.get(app)
    if (
        current is None
        or installed is None
        or installed[0] != root  # conf changed mid-session (r10 #5)
        or installed[1] != current  # user setCheckpointDir override
    ):
        sc.setCheckpointDir(root)
        _installed_roots[app] = (root, sc.getCheckpointDir())
    return df.checkpoint(eager=eager)
