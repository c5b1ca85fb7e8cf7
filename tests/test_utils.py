"""Utils tests (Timer, TermColor, misc — reference core/utils parity)."""
import time

import numpy as np
import jax.numpy as jnp

from visma_tpu.utils import (Timer, TermColor, any_nan, bilinear_sample,
                             generate_random_color_map, random_matrix)


def test_timer_accumulates():
    t = Timer("test")
    for _ in range(3):
        t.tick("ev")
        time.sleep(0.01)
        t.tock("ev")
    assert 8 < t.mean_ms("ev") < 100
    assert t.report()["ev"]["count"] == 3
    assert "ev" in str(t)


def test_timer_scope():
    t = Timer()
    with t.scope("s"):
        time.sleep(0.005)
    assert t.mean_ms("s") > 3


def test_any_nan_on_pytree():
    good = {"a": jnp.ones(3), "b": [jnp.zeros((2, 2))]}
    bad = {"a": jnp.array([1.0, jnp.nan])}
    assert not any_nan(good)
    assert any_nan(bad)


def test_bilinear_sample():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    v = bilinear_sample(img, jnp.asarray([1.5, 0.5]))
    assert abs(float(v) - 3.5) < 1e-5  # avg of 1,2,5,6


def test_colors_and_misc():
    s = TermColor.wrap("x", TermColor.red)
    assert s.startswith("\033[91m") and s.endswith("\033[0m")
    cm = generate_random_color_map(8)
    assert len(cm) == 8 and cm[0].shape == (3,)
    m = random_matrix(3, 4)
    assert m.shape == (3, 4) and (np.abs(m) <= 1).all()
