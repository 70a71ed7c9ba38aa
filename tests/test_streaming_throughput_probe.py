"""Construction pins for tools/streaming_throughput_probe.py: the
rate-micro-batch event synthesizer must stay schema-compatible with
every streaming job builder it measures (the probe is perf evidence —
a schema drift should fail fast here, not 4 minutes into a reading)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.streaming_throughput_probe import JOBS, rate_events


@pytest.fixture(scope="module")
def rate_df(spark):
    return rate_events(spark, 1000)


def test_rate_events_schema_matches_jobs_contract(rate_df):
    assert rate_df.isStreaming
    got = {f.name: f.dataType.simpleString() for f in rate_df.schema.fields}
    assert got == {
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "ts": "timestamp",
        "value": "double",
    }


@pytest.mark.parametrize("name", sorted(JOBS))
def test_every_probed_job_builds_on_rate_events(rate_df, name):
    builder, mode = JOBS[name]
    out = builder(rate_df)
    assert out.isStreaming
    assert mode in ("append", "update")
