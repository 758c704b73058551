"""transformWithStateInPandas operator — skipped where the protobuf
dependency its worker protocol needs is unavailable (this container);
the oracle-parity suite picks it up automatically wherever it
registers."""

from __future__ import annotations

import pytest

from frinesis_spark.streaming import tws

# Reference oracle for the TWS user-profile path (moved here from the
# operator module, r8: the module ships no registry-shaped dead weight).
ORACLE_SQL = """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
"""


@pytest.mark.skipif(
    not tws.HAVE_TWS_DEPS, reason="protobuf unavailable for TWS worker"
)
def test_tws_user_profile_matches_batch(spark, sf_dir, duck):
    from tests.parity import assert_frames_match

    s = tws.q_stream_tws_user_profile(spark, sf_dir).toPandas()
    d = duck.execute(ORACLE_SQL).fetchdf()
    assert_frames_match(s, d, "stream_tws_user_profile")
