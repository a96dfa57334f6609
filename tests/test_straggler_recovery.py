"""Actor-pool fault recovery: kill a stateful EnrichActor mid-stream and
assert the pipeline's output is byte-equal to an undisturbed run.

SURVEY §4 lists speculative retry / straggler handling as "provided
partially" by Ray; this test documents that Ray Data's actor-pool
reconstruction actually holds for the repo's stateful stages: with
``max_restarts``/``max_task_retries`` the pool replaces a crashed worker
(state rebuilt by ``__init__``) and re-runs its in-flight block, so an
at-least-once retry over a deterministic batch function stays
exactly-once at the output level (reference analog: the Postgres
idempotent-insert path, src/parse_logs.rs:121-214 — re-inserting a batch
after a crash must not change the table)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from security_log_analysis_rust_ray.stages.enrich import EnrichActor
from security_log_analysis_rust_ray.stages.parse import route_parse
from security_log_analysis_rust_ray.sources.readers import read_transcripts

SF_SMOKE = "/root/testdata/sf0.001"


class CrashingEnrich(EnrichActor):
    """EnrichActor that hard-kills its own worker process (os._exit — no
    exception Ray could catch, same as a node loss from the pool's view)
    on the FIRST batch any actor sees, once per test run (sentinel file
    keeps the replacement actors alive)."""

    def __init__(self, sentinel: str):
        super().__init__(resolve_misses=False)
        self.sentinel = sentinel

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            # O_EXCL: exactly one actor across the pool wins the crash slot
            fd = os.open(self.sentinel, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        return super().__call__(batch)


def _enriched(sf_dir: str, cls, **kwargs):
    ds = read_transcripts(sf_dir, columns=None, blocks=8) \
        .map_batches(route_parse, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        cls, batch_format="pyarrow", batch_size=None,
        concurrency=(1, 2),
        max_restarts=-1, max_task_retries=-1,
        **kwargs)
    return ds.to_pandas().sort_values(
        ["conv_id", "turn_idx", "sink"]).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_enrich_actor_crash_recovers_byte_equal(tmp_path):
    sentinel = str(tmp_path / "crash_once")
    baseline = _enriched(SF_SMOKE, EnrichActor)
    crashed = _enriched(SF_SMOKE, CrashingEnrich,
                        fn_constructor_args=(sentinel,))
    assert os.path.exists(sentinel), "the crash slot never fired"
    assert len(baseline) > 0
    import pandas as pd
    pd.testing.assert_frame_equal(baseline, crashed)
