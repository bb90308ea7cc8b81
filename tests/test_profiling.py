"""Profiling utilities: throughput meter and FLOP accounting."""

import jax.numpy as jnp
import numpy as np

from wst_tpu.utils.profiling import (Throughput, flop_estimate_scattering,
                                     log_event)


def test_throughput_meter():
    fn = lambda x: x * 2.0  # noqa: E731
    m = Throughput(fn, warmup=1, iters=3)
    res = m.measure(jnp.ones((16, 4)))
    assert res["items"] == 16
    assert res["items_per_sec"] > 0


def test_flop_estimate_monotone():
    f2 = flop_estimate_scattering(2, 8, 128, 128)
    f4 = flop_estimate_scattering(4, 8, 128, 128)
    assert f4 > f2 > 1e8  # J=4 much heavier; J=2 ~ GFLOP-scale
    # Halving resolution cuts FLOPs by ~8x (n^3 matmuls)
    f2s = flop_estimate_scattering(2, 8, 64, 64)
    assert 4 < f2 / f2s < 12


def test_log_event(capsys):
    import sys
    log_event("bench", stream=sys.stdout, value=1.5)
    out = capsys.readouterr().out
    assert '"event": "bench"' in out and '"value": 1.5' in out
