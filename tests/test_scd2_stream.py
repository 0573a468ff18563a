"""Cross-batch splice semantics of the streaming CDC current-state op.

The oracle gate may deliver all fixture events in ONE micro-batch, so
the batch-boundary paths of stream_scd2_current's state update are
pinned here directly on the extracted _advance_runs helper.
"""

from __future__ import annotations

import pandas as pd

from motorway_spark.queries.streaming_queries import (
    _advance_batch,
    _advance_runs,
)


def _batch(rows):
    return pd.DataFrame(rows, columns=["event_id", "event_type", "ts_us"])


def test_run_continues_across_batch_boundary():
    """Same type across the boundary: run length accumulates, the
    valid_from of the ORIGINAL run start is preserved."""
    cur = _advance_runs(None, _batch([(1, "click", 100), (2, "click", 200)]))
    assert cur == ("click", 100, 2)
    cur = _advance_runs(cur, _batch([(3, "click", 300), (4, "view", 400)]))
    assert cur == ("view", 400, 1)


def test_type_change_at_batch_boundary_resets_run():
    cur = _advance_runs(None, _batch([(1, "click", 100)]))
    cur = _advance_runs(cur, _batch([(2, "view", 200), (3, "view", 300)]))
    assert cur == ("view", 200, 2)


def test_multiple_runs_within_one_batch_keeps_last():
    cur = _advance_runs(
        None,
        _batch(
            [
                (1, "click", 100),
                (2, "view", 200),
                (3, "view", 300),
                (4, "click", 400),
                (5, "click", 500),
            ]
        ),
    )
    assert cur == ("click", 400, 2)


def test_splice_then_change_in_same_batch():
    """Boundary continuation followed by an in-batch change: the
    continuation must count ONLY the pre-change prefix."""
    cur = _advance_runs(None, _batch([(1, "click", 100), (2, "click", 150)]))
    cur = _advance_runs(
        cur, _batch([(3, "click", 200), (4, "signup", 300), (5, "signup", 350)])
    )
    assert cur == ("signup", 300, 2)


def test_out_of_order_batch_is_sorted_by_event_time():
    cur = _advance_runs(
        None, _batch([(2, "view", 300), (1, "click", 100), (3, "view", 200)])
    )
    # sorted order: click@100, view@200, view@300 -> current = view since 200
    assert cur == ("view", 200, 2)


def test_empty_batch_is_noop():
    cur = ("click", 100, 3)
    assert _advance_runs(cur, _batch([])) == cur


# ---------------------------------------------------------------------------
# Property: folding _advance_runs over ANY batch split of a sorted event
# sequence equals computing the final run on the whole sequence at once.
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def _event_stream(draw):
        n = draw(st.integers(min_value=1, max_value=40))
        types = draw(
            st.lists(
                st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n
            )
        )
        # strictly increasing event times keep the reference trivial
        ts = sorted(
            draw(
                st.lists(
                    st.integers(min_value=0, max_value=10_000),
                    min_size=n,
                    max_size=n,
                    unique=True,
                )
            )
        )
        cuts = draw(
            st.lists(st.integers(min_value=1, max_value=n - 1), unique=True)
            if n > 1
            else st.just([])
        )
        return types, ts, sorted(cuts)

    def _reference_final_run(types, ts):
        start = 0
        for i in range(1, len(types)):
            if types[i] != types[i - 1]:
                start = i
        return (types[start], ts[start], len(types) - start)

    @given(_event_stream())
    @settings(max_examples=200, deadline=None)
    def test_advance_runs_split_invariance(stream):
        types, ts, cuts = stream
        bounds = [0, *cuts, len(types)]
        cur = None
        for lo, hi in zip(bounds, bounds[1:]):
            if lo == hi:
                continue
            cur = _advance_runs(
                cur,
                _batch(
                    [
                        (i, types[i], ts[i])
                        for i in range(lo, hi)
                    ]
                ),
            )
        assert cur == _reference_final_run(types, ts)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_advance_batch_unordered_arrow_chunks():
    """THE sf0.1 straddle bug (round-12 sweep catch): a key's rows can
    arrive as multiple arrow chunks in shuffle order — NO time
    ordering. _advance_batch assembles the micro-batch before the walk,
    so a later-timestamp chunk arriving FIRST changes nothing."""
    early = _batch([(1, "click", 100), (2, "click", 200)])
    late = _batch([(3, "view", 300), (4, "view", 400)])
    # late chunk delivered first — per-chunk advancing would end on
    # the click run (wrong); assembled advancing ends on the view run
    assert _advance_batch(None, iter([late, early])) == ("view", 300, 2)
    assert _advance_batch(None, iter([early, late])) == ("view", 300, 2)


def test_advance_batch_interleaved_run_split_across_chunks():
    """One RUN split across unordered chunks must keep its original
    start and full length."""
    a = _batch([(2, "click", 200), (4, "view", 400)])
    b = _batch([(1, "click", 100), (3, "click", 300)])
    # sorted: click@100, click@200, click@300, view@400
    assert _advance_batch(None, iter([a, b])) == ("view", 400, 1)
    cur = _advance_batch(None, iter([b]))
    assert cur == ("click", 100, 2)


def test_advance_batch_empty_and_state_carry():
    assert _advance_batch(None, iter([])) is None
    cur = ("click", 100, 3)
    assert _advance_batch(cur, iter([_batch([])])) == cur
    # carried run continues across the MICRO-batch boundary
    assert _advance_batch(cur, iter([_batch([(9, "click", 900)])])) == (
        "click",
        100,
        4,
    )
