"""Schema constants validated at the pipeline boundaries (SURVEY §1.2)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from security_log_analysis_rust_ray import schemas
from security_log_analysis_rust_ray.pipelines import reports as R
from .conftest import SF_SMOKE


def _head_table(ds, n=5) -> pa.Table:
    # fully-consume a bounded plan (limit -> to_pandas); take_batch leaves a
    # partially-consumed streaming execution behind, which trips a Ray
    # teardown segfault when combined with earlier shuffle work
    import pyarrow as _pa
    df = ds.limit(n).to_pandas()
    sch = ds.schema()
    arrow = _pa.schema([_pa.field(nm, t) for nm, t in zip(sch.names, sch.types)])
    return _pa.Table.from_pandas(df, schema=arrow, preserve_index=False)


@pytest.mark.usefixtures("ray_session")
def test_sink_schemas_match_constants():
    schemas.validate(_head_table(R.parsed(SF_SMOKE)), schemas.PARSED,
                     where="parsed sink")
    schemas.validate(_head_table(R.messages(SF_SMOKE)), schemas.MESSAGES,
                     where="messages sink")


@pytest.mark.usefixtures("ray_session")
def test_transcripts_schema_validated_on_read():
    schemas.validate(_head_table(R.transcripts(SF_SMOKE)), schemas.TRANSCRIPTS)


def test_validate_raises_on_mismatch():
    bad = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64())])
    with pytest.raises(schemas.SchemaMismatch):
        schemas.validate(bad, schemas.TRANSCRIPTS)
