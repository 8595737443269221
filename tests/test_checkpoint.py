"""checkpoint.pin — the engine-level durability knob (VERDICT r9 #1).

Iterative operators (connected components), pipeline stage boundaries
(q_corpus_pipeline), and the IVF probe pin all truncate lineage through
``dbt_foundation_spark.checkpoint.pin``.  Default tier is
``localCheckpoint`` (executor-local, no external storage — the right
local[*] choice); setting the session conf
``spark.dbt_foundation_spark.checkpointDir`` flips every pin to
``DataFrame.checkpoint`` against that directory, the cluster-durable
tier that survives executor loss.  These tests pin the contract:

* default tier leaves the SparkContext checkpoint dir untouched;
* reliable tier actually writes checkpoint files under the configured
  root;
* both tiers produce hash-identical results for the two flagship
  iterative/staged queries.
"""

from __future__ import annotations

import os

import pytest

from dbt_foundation_spark.checkpoint import CHECKPOINT_DIR_CONF, pin


def _files_under(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files)
    return out


def _rows(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def reliable_dir(spark, tmp_path):
    """Configure the reliable tier for the duration of one test, then
    restore the default tier (conf unset AND SparkContext dir cleared,
    so later tests in the shared session see pristine state)."""
    root = str(tmp_path / "ckpt")
    spark.conf.set(CHECKPOINT_DIR_CONF, root)
    try:
        yield root
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
        # Scala setCheckpointDir(null) -> Option(null) = None: clears it
        spark.sparkContext._jsc.sc().setCheckpointDir(None)
        assert spark.sparkContext.getCheckpointDir() is None


def test_pin_default_is_local(spark):
    assert spark.conf.get(CHECKPOINT_DIR_CONF, None) in (None, "")
    df = pin(spark.range(10))
    assert df.count() == 10
    # the default tier must not install a reliable checkpoint dir
    assert spark.sparkContext.getCheckpointDir() is None


def test_pin_reliable_writes_checkpoint_files(spark, reliable_dir):
    df = pin(spark.range(100).withColumnRenamed("id", "v"))
    assert df.count() == 100
    assert df.columns == ["v"]
    files = _files_under(reliable_dir)
    assert files, "reliable pin produced no checkpoint files"
    # lazy pins materialize on first action too
    lazy = pin(spark.range(5), eager=False)
    assert lazy.count() == 5


def test_pin_follows_mid_session_dir_change(spark, tmp_path):
    """Changing the conf between pins moves NEW checkpoints to the new
    root (round-10 verdict #5: install-only-when-unset silently kept
    the first directory for the life of the session)."""
    root_a = str(tmp_path / "ckpt_a")
    root_b = str(tmp_path / "ckpt_b")
    spark.conf.set(CHECKPOINT_DIR_CONF, root_a)
    try:
        assert pin(spark.range(10)).count() == 10
        assert _files_under(root_a), "first pin wrote nothing under root A"
        spark.conf.set(CHECKPOINT_DIR_CONF, root_b)
        before_a = set(_files_under(root_a))
        assert pin(spark.range(20)).count() == 20
        assert _files_under(root_b), (
            "pin after a mid-session conf change still wrote to the old root"
        )
        # the old root's files are untouched (existing checkpoints stay
        # valid); only new pins moved
        assert set(_files_under(root_a)) == before_a
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
        spark.sparkContext._jsc.sc().setCheckpointDir(None)
        assert spark.sparkContext.getCheckpointDir() is None


def test_pin_reasserts_conf_root_over_user_override(spark, tmp_path):
    """Once the conf is set, the engine's root wins (r11 review): user
    code calling sc.setCheckpointDir() between pins must not silently
    redirect reliable checkpoints away from the configured durable
    root — the next pin detects the override and re-installs."""
    root = str(tmp_path / "ckpt_conf")
    rogue = str(tmp_path / "ckpt_rogue")
    spark.conf.set(CHECKPOINT_DIR_CONF, root)
    try:
        assert pin(spark.range(5)).count() == 5
        before = set(_files_under(root))
        assert before
        spark.sparkContext.setCheckpointDir(rogue)  # user override
        assert pin(spark.range(7)).count() == 7
        assert set(_files_under(root)) > before, (
            "pin after a user setCheckpointDir override wrote outside "
            "the configured reliable root"
        )
        assert not _files_under(rogue)
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
        spark.sparkContext._jsc.sc().setCheckpointDir(None)
        assert spark.sparkContext.getCheckpointDir() is None


def test_connected_components_reliable_matches_local(spark, sf_dir):
    from dbt_foundation_spark.queries import all_queries

    q = all_queries()["q_dedup_components"]
    local_rows = _rows(q(spark, sf_dir))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "ckpt")
        spark.conf.set(CHECKPOINT_DIR_CONF, root)
        try:
            reliable_rows = _rows(q(spark, sf_dir))
            assert _files_under(root), "no reliable checkpoint files"
        finally:
            spark.conf.unset(CHECKPOINT_DIR_CONF)
            spark.sparkContext._jsc.sc().setCheckpointDir(None)
    assert reliable_rows == local_rows


def test_corpus_pipeline_reliable_matches_local(spark, sf_dir):
    from dbt_foundation_spark.queries import all_queries

    q = all_queries()["q_corpus_pipeline"]
    local_rows = _rows(q(spark, sf_dir))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "ckpt")
        spark.conf.set(CHECKPOINT_DIR_CONF, root)
        try:
            reliable_rows = _rows(q(spark, sf_dir))
            assert _files_under(root), "no reliable checkpoint files"
        finally:
            spark.conf.unset(CHECKPOINT_DIR_CONF)
            spark.sparkContext._jsc.sc().setCheckpointDir(None)
    assert reliable_rows == local_rows


def test_ivf_probe_pin_reliable_matches_local(spark, tmp_path):
    """The knn_join_ivf probe pin (prune=True path) routes through the
    knob as well: the reliable tier writes checkpoint files and returns
    the same neighbors as the local tier."""
    from dbt_foundation_spark.operators.similarity import (
        build_ivf_index,
        knn_join_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(emb, "vec_id", "embedding", idx, n_lists=4)
    queries = emb.orderBy("vec_id").limit(5).select("vec_id", "embedding")

    def run():
        return _rows(
            knn_join_ivf(
                spark, idx, queries, "vec_id", "embedding", k=3, n_probe=2
            )
        )

    local_rows = run()
    root = str(tmp_path / "ckpt")
    spark.conf.set(CHECKPOINT_DIR_CONF, root)
    try:
        reliable_rows = run()
        assert _files_under(root), "probe pin wrote no checkpoint files"
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
        spark.sparkContext._jsc.sc().setCheckpointDir(None)
    assert reliable_rows == local_rows
    assert local_rows, "knn_join_ivf returned nothing"
