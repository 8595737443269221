from __future__ import annotations

import itertools
import os
import time
from pathlib import Path

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# --- deterministic file-stream batch ordering without sleeping ---
# The streaming tests feed a file source one "batch" (write) at a time
# and rely on the source replaying batches in write order, which Spark
# orders by file modification time. The old way was sleep(1.05s) between
# writes (~60 s of pure wall-clock across the suite); stamping explicit,
# strictly increasing mtimes is deterministic on any clock/filesystem
# and free. Stamps sit far in the PAST (base = import time − 10^7 s) so
# any file written after the last stamp (the final batch is never
# stamped) naturally sorts newest.
_MTIME_BASE = time.time() - 10_000_000
_MTIME_TICK = itertools.count(1)


def distinct_mtime(*dirs: str | os.PathLike) -> None:
    """Stamp every not-yet-stamped file under ``dirs`` with the next
    strictly increasing past timestamp. Call it exactly where the old
    ``time.sleep(1.05)  # distinct mtimes`` sat: after writing a batch,
    before writing the next."""
    t = _MTIME_BASE + next(_MTIME_TICK)
    for d in dirs:
        root = Path(d)
        if not root.exists():
            continue
        for f in root.rglob("*"):
            # unstamped = carries a current-clock mtime (>> base + ticks)
            if f.is_file() and f.stat().st_mtime > _MTIME_BASE + 1_000_000:
                os.utime(f, (t, t))


@pytest.fixture(scope="session")
def spark():
    from dbt_foundation_spark.session import get_spark

    s = get_spark(app_name="dbt_foundation_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
