"""utils layer: host parallel primitives (serial-equivalence testing, the
reference's strategy in test/parallel_test.hpp), Random facade, timer,
config, line search."""

import numpy as np
import pytest

from cdae_tpu.solver.line_search import line_search
from cdae_tpu.utils import parallel as P
from cdae_tpu.utils import random as R
from cdae_tpu.utils.timer import Timer, time_function


def test_parallel_for_matches_serial():
    n = 1000
    out_p = np.zeros(n)
    P.parallel_for(0, n, lambda i: out_p.__setitem__(i, i * i), num_threads=4)
    np.testing.assert_array_equal(out_p, np.arange(n) ** 2)


def test_dynamic_parallel_for_matches_serial():
    n = 500
    out = np.zeros(n)
    P.dynamic_parallel_for(0, n, lambda i: out.__setitem__(i, 2 * i),
                           num_threads=3)
    np.testing.assert_array_equal(out, 2 * np.arange(n))


def test_parallel_for_each():
    items = list(range(64))
    out = np.zeros(64)
    P.parallel_for_each(items, lambda x: out.__setitem__(x, x + 1))
    np.testing.assert_array_equal(out, np.arange(64) + 1)


def test_parallel_accumulate_matches_serial():
    got = P.parallel_accumulate(0, 10000, lambda i: float(i), num_threads=5)
    assert got == sum(range(10000))


def test_random_facade_deterministic():
    R.seed(42)
    a = R.uniform(size=5)
    R.seed(42)
    b = R.uniform(size=5)
    np.testing.assert_array_equal(a, b)
    R.seed(0)
    x = list(range(10))
    R.shuffle(x)
    assert sorted(x) == list(range(10))
    d = R.discrete([0.0, 1.0, 0.0], size=20)
    assert (np.asarray(d) == 1).all()
    v = R.uniform_int(3, 7, size=100)
    assert v.min() >= 3 and v.max() < 7


def test_timer_and_time_function():
    t = Timer()
    assert t.elapsed() >= 0.0
    out, dt = time_function(lambda: 41 + 1)
    assert out == 42 and dt >= 0.0


def test_line_search_quadratic():
    f = lambda x: float(np.sum((x - 3.0) ** 2))
    x = np.zeros(2)
    grad = 2 * (x - 3.0)
    step, f_new = line_search(f, x, -grad, grad, step0=1.0)
    assert f_new < f(x)
    assert 0 < step <= 1.0


def test_compile_cache_enable(tmp_path, monkeypatch):
    """compile_cache.enable points jax at the dir (env wins; off disables)."""
    import jax

    from cdae_tpu.utils.compile_cache import enable

    d = str(tmp_path / "xla")
    monkeypatch.delenv("CDAE_COMPILE_CACHE", raising=False)
    assert enable(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    import os
    assert os.path.isdir(d)
    monkeypatch.setenv("CDAE_COMPILE_CACHE", "off")
    assert enable() is None
