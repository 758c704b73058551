"""transformWithStateInPandas operator — skipped where the protobuf
dependency its worker protocol needs is unavailable (this container);
the oracle-parity suite picks it up automatically wherever it
registers."""

from __future__ import annotations

import pytest

from frinesis_spark.streaming import tws


@pytest.mark.skipif(
    not tws.HAVE_TWS_DEPS, reason="protobuf unavailable for TWS worker"
)
def test_tws_user_profile_matches_batch(spark, sf_dir, duck):
    from tests.parity import assert_frames_match

    s = tws.q_stream_tws_user_profile(spark, sf_dir).toPandas()
    d = duck.execute(tws.ORACLE_SQL).fetchdf()
    assert_frames_match(s, d, "stream_tws_user_profile")
