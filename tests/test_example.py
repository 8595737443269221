"""The examples/pipeline.py walkthrough must actually work end-to-end."""

from __future__ import annotations

import sys
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.curation_pipeline import run_curation_example
from examples.pipeline import build_project, run_example_tests


def test_curation_example_end_to_end(spark, sf_dir, tmp_path):
    out = run_curation_example(spark, sf_dir, str(tmp_path))
    assert 0 < out["admitted"] <= out["batch_size"]
    assert out["curated"] > 0
    assert out["shard_dirs"] == ["shard=0", "shard=1", "shard=2", "shard=3"]
    assert len(out["ann_top5"]) == 5 and 0 not in out["ann_top5"]
    assert out["semantic_dupes"] > 0  # the synthetic corpus plants near-dups
    # every appended vector self-retrieves through the batched ANN, and
    # compaction folds the ingest's micro-files to ~1 per list
    assert out["batch_self_hits"] == 20
    assert out["ivf_files_after_compact"] <= 8
    # takedown flank: retraction hides the vector, compaction clears the log
    assert out["retracted_gone"] is True
    assert out["tombstones_after_compact"] is True


def test_example_pipeline_end_to_end(spark, sf_dir):
    schema = f"ex_{uuid.uuid4().hex[:8]}"
    project = build_project(spark, sf_dir, schema=schema)
    try:
        results = project.run()
        assert {r.status for r in results} == {"success"}, results
        # re-run: incremental merge path (table now exists)
        results2 = project.run()
        assert {r.status for r in results2} == {"success"}, results2
        tests = run_example_tests(project)
        assert tests and all(t.status == "pass" for t in tests), tests
        mart = spark.table(f"{schema}.fct_pricing_summary")
        assert mart.count() > 0
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
