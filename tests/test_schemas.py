"""Schema constants validated at the pipeline boundaries (SURVEY §1.2)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from security_log_analysis_rust_ray import schemas
from security_log_analysis_rust_ray.pipelines import reports as R
from .conftest import SF_SMOKE


@pytest.mark.usefixtures("ray_session")
def test_sink_schemas_match_constants():
    pt = R.parsed(SF_SMOKE).take_batch(5, batch_format="pyarrow")
    schemas.validate(pa.table(pt), schemas.PARSED, where="parsed sink")
    mt = R.messages(SF_SMOKE).take_batch(5, batch_format="pyarrow")
    schemas.validate(pa.table(mt), schemas.MESSAGES, where="messages sink")


@pytest.mark.usefixtures("ray_session")
def test_transcripts_schema_validated_on_read():
    ds = R.transcripts(SF_SMOKE)
    b = ds.take_batch(5, batch_format="pyarrow")
    schemas.validate(pa.table(b), schemas.TRANSCRIPTS)


def test_validate_raises_on_mismatch():
    bad = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64())])
    with pytest.raises(schemas.SchemaMismatch):
        schemas.validate(bad, schemas.TRANSCRIPTS)
