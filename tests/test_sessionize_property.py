"""Property test for the streaming sessionization state machine.

Drives `_sessionize_fn_factory`'s kernel directly with a fake GroupState
(no Spark): for ANY event sequence and ANY split of it into ordered
micro-batches, the sessions emitted across batches — in-batch gap proofs
plus the final event-time timeout — must equal the batch lag/cumsum
sessionization of the full sequence. This is the contract the Spark
tests pin on fixed layouts, generalized over random layouts."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hawk_pack_spark.streaming.windows import _sessionize_fn_factory

GAP_S = 100
GAP_MS = GAP_S * 1000


class FakeState:
    """The subset of pyspark's GroupState the kernel touches."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False
        self.timeout_ts = None
        self.watermark_ms = 0

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        if self._val is None:
            raise ValueError("no state")
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts

    def getCurrentWatermarkMs(self):
        return self.watermark_ms


def _batch_sessions(secs: list[int]) -> list[tuple[int, int, int]]:
    """Reference lag/cumsum sessionization: (start, end, n) per session."""
    out = []
    start = end = secs[0]
    n = 0
    for t in sorted(secs):
        if n > 0 and t - end > GAP_S:
            out.append((start, end, n))
            start, n = t, 0
        end = t
        n += 1
    out.append((start, end, n))
    return out


def _pdf(secs: list[int]) -> pd.DataFrame:
    return pd.DataFrame({"ts": pd.to_datetime([s * 1_000_000_000 for s in secs])})


@given(
    secs=st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=40),
    splits=st.lists(st.integers(min_value=1, max_value=39), max_size=5),
)
@settings(max_examples=200, deadline=None)
def test_any_batch_split_equals_batch_sessionization(secs, splits):
    secs = sorted(secs)
    cuts = sorted({s for s in splits if s < len(secs)})
    batches, prev = [], 0
    for c in cuts + [len(secs)]:
        if c > prev:
            batches.append(secs[prev:c])
            prev = c

    fn = _sessionize_fn_factory(GAP_MS)
    state = FakeState()
    emitted = []
    for batch in batches:
        # the engine's watermark when a batch runs reflects data through
        # the PREVIOUS batches (delay 0): monotone ordered replay
        out = fn((7,), iter([_pdf(batch)]), state)
        for df in out:
            emitted.extend(
                (int(r.sess_start), int(r.sess_end), int(r.n_events))
                for r in df.itertuples()
            )
        state.watermark_ms = max(state.watermark_ms, batch[-1] * 1000)
    # end of stream: the watermark passes every timeout -> the timeout
    # branch fires for the key (no data in the batch)
    if state.exists:
        state.hasTimedOut = True
        for df in fn((7,), iter([]), state):
            emitted.extend(
                (int(r.sess_start), int(r.sess_end), int(r.n_events))
                for r in df.itertuples()
            )

    assert emitted == _batch_sessions(secs)
