from __future__ import annotations

import pytest

from log_analysis_ai_spark.fixtures import (
    gen_role_lookup,
    gen_tool_lookup,
    gen_transcripts,
)
from log_analysis_ai_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_pdf():
    return gen_transcripts(180)  # ~2k turns


@pytest.fixture(scope="session")
def lookups_pdf():
    return gen_tool_lookup(), gen_role_lookup()
