"""utils.stream.threaded_map: ordering, error propagation, and producer
cancellation when the consumer abandons the generator."""

import threading
import time

import pytest

from yolov4tpu.utils.stream import threaded_map


def test_ordered_results():
    assert list(threaded_map(lambda x: x * 2, range(10))) == [
        x * 2 for x in range(10)]


def test_error_propagates():
    def fn(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    out = []
    with pytest.raises(RuntimeError, match="boom"):
        for v in threaded_map(fn, range(10)):
            out.append(v)
    assert out == [0, 1, 2]


def test_abandoned_consumer_releases_producer():
    """Breaking out of the loop must unblock and terminate the producer
    thread even though the bounded queue was full."""
    produced = []

    def fn(x):
        produced.append(x)
        return x

    before = threading.active_count()
    gen = threaded_map(fn, range(1000), depth=2)
    assert next(gen) == 0
    gen.close()  # triggers the generator's finally: stop + drain

    # The daemon producer must wind down (it checks stop every 0.1s put).
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    # Far fewer than all items were produced: the producer actually stopped.
    assert len(produced) < 50
