"""Background batch prefetch (data/prefetch.py): order/values identical to
inline iteration, producer exceptions re-raise at the consumer, and an
abandoned generator stops the producer instead of leaking a blocked
thread.  The train loops (train/tacotron.py, train/waveglow.py) consume
their epoch iterators through this — the reference's DataLoader-worker
overlap."""

import threading
import time

import pytest

from text2speech_tpu.data.prefetch import prefetch


def test_order_and_values_identical():
    items = [(i, "x" * i) for i in range(57)]
    assert list(prefetch(iter(items), depth=3)) == items
    assert list(prefetch(iter(items), depth=0)) == items  # inline fallback


def test_producer_ahead_but_bounded():
    """The producer runs ahead of a slow consumer by at most depth+1
    items (queue depth + the one it's blocked putting)."""
    produced = []

    def gen():
        for i in range(20):
            produced.append(i)
            yield i

    depth = 2
    got = []
    for x in prefetch(gen(), depth=depth):
        time.sleep(0.02)
        assert len(produced) <= len(got) + depth + 2
        got.append(x)
    assert got == list(range(20))
    assert produced == got


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_abandoned_consumer_stops_producer():
    alive_threads = threading.active_count()

    def gen():
        for i in range(10_000):
            yield i

    it = prefetch(gen(), depth=1)
    assert next(it) == 0
    it.close()  # early break / interrupt-save path
    # the producer notices the stop event within its 0.1s put timeout
    deadline = time.time() + 5.0
    while threading.active_count() > alive_threads and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= alive_threads
