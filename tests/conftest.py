"""Shared test setup.

AGN_RPC_MOCK must be in the environment BEFORE the first SparkSession
starts: Spark's Python worker daemon forks with the environment it was
launched with, so setting the variable in a later test module is too late
for the already-running workers. One session-wide default here keeps test
ordering irrelevant."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AGN_RPC_MOCK", "tests.mock_chain:transport")
