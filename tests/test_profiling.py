"""Misra-Gries summary invariants (profiling.topk_heavy_hitters pass 1).

The fixture key distribution is near-uniform and smaller than
MG_CAPACITY, so the oracle gate never exercises the overflow/decrement
path — these tests force it with skewed synthetic streams.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from motorway_spark.queries.profiling import _mg_summarize


def _run_mg(values, capacity, batch_size=997):
    batches = (
        pd.DataFrame({"k": pd.array(values[i : i + batch_size], dtype="int64")})
        for i in range(0, len(values), batch_size)
    )
    (out,) = list(_mg_summarize(batches, "k", capacity))
    return set(out["k"].tolist())


@pytest.mark.parametrize("capacity", [8, 32])
def test_mg_guarantee_zipf(capacity):
    """Every key with true count > n/(capacity+1) survives the summary,
    and the summary respects the capacity bound after overflow."""
    rng = np.random.default_rng(7)
    values = rng.zipf(1.5, size=20_000)
    values = values[values < 10_000]
    survivors = _run_mg(list(values), capacity)
    counts = Counter(values)
    threshold = len(values) / (capacity + 1)
    must_survive = {k for k, c in counts.items() if c > threshold}
    assert must_survive <= survivors, must_survive - survivors
    # summary bounded: at most capacity keys immediately after a
    # decrement; final set may be smaller, never unbounded
    assert len(survivors) <= max(capacity, len(counts))


def test_mg_overflow_actually_triggers():
    """Sanity: the adversarial stream exceeds capacity so the decrement
    path ran (survivors < distinct keys)."""
    values = list(range(5_000)) + [1] * 2_000  # long uniform tail + one heavy key
    survivors = _run_mg(values, capacity=16)
    assert len(survivors) < 5_000
    assert 1 in survivors  # the heavy hitter (2001/7000 > 1/17 of mass)
