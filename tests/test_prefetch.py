"""Prefetch iterator tests."""

import time

import numpy as np
import pytest

from transferable3d_tpu.utils.prefetch import prefetch


def test_yields_all_batches_in_order():
    batches = [{"x": np.full((2,), i)} for i in range(10)]
    out = list(prefetch(iter(batches), device_put=lambda b: b))
    assert len(out) == 10
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), i)


def test_overlaps_producer_with_consumer():
    def slow_gen():
        for i in range(5):
            time.sleep(0.05)
            yield i

    it = prefetch(slow_gen(), buffer_size=4, device_put=lambda b: b)
    time.sleep(0.3)  # producer fills the buffer while we "compute"
    t0 = time.time()
    out = list(it)
    drain_time = time.time() - t0
    assert out == [0, 1, 2, 3, 4]
    assert drain_time < 0.2  # buffered items drain fast


def test_propagates_producer_errors():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad_gen(), device_put=lambda b: b)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_device_put_applied():
    import jax

    out = list(prefetch([np.ones(4)], buffer_size=1))
    assert isinstance(out[0], jax.Array)
