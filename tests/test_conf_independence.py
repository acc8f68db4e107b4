"""The driver runs queries() in ITS OWN session, not the repo factory's
(round 2's only unexplained red row was conf-sensitivity of absolute
hash values). This pins conf-independence: the oracle gate's
value-sensitive queries must pass in a bare session with NONE of the
factory confs and a deliberately hostile session timezone
(America/New_York) — which is how the timestamp-output bug in
time_bucket_rollup's min_plus30 was found (instant-typed midnight
minted in session tz, py-collected in machine tz; fixed to NTZ).

Runs as a subprocess because one JVM holds one SparkSession."""

from __future__ import annotations

import os

import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose OUTPUT carries time-, float-, or hash-typed values that a
# session conf could plausibly shift (the rest of the gate is covered by
# the full --plain-session harness run, documented in COVERAGE.md).
SENSITIVE = [
    "time_bucket_rollup",      # timestamp output column
    "sessionization",          # epoch-µs arithmetic + float row frame
                               # (absorbed moving_average, r7 rotation)
    "text_hashed_tfidf_embed",  # float idf/norm arithmetic end to end
    "asof_join_last_click",    # epoch-µs as-of semantics
    "key_set_facets",          # epoch-day derivation (except facet)
    "dedup_signatures",        # ABSOLUTE hash values (r2's red row)
    "q1_pricing_summary",      # decimal/double aggregate family
    "events_scalar_facets",    # datetime scalar family
]


@pytest.mark.heavy
def test_gate_passes_in_bare_hostile_tz_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "oracle_harness.py"),
         "--plain-session", "/root/testdata/sf0.01", *SENSITIVE],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO})
    assert proc.returncode == 0, \
        f"conf-dependent query result:\n{proc.stdout[-3000:]}"
    assert "0 failures" in proc.stdout
