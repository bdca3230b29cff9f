"""C++ n-gram scorer parity vs the Python oracles, on randomized corpora."""

import numpy as np
import pytest

from dmi_tpu.evals.bleu import coco_bleu
from dmi_tpu.evals.cider import cider_d
from dmi_tpu.evals.native import cider_d_native, coco_bleu_native, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")

VOCAB = ["a", "dog", "runs", "on", "grass", "two", "people", "walk", "beach",
         "galaxy", "spiral", "bright", "the", "near", "water", "area"]


def random_corpus(seed, n_images=20, max_refs=4):
    rng = np.random.default_rng(seed)
    cands, refs = [], []
    for _ in range(n_images):
        cands.append([VOCAB[i] for i in rng.integers(0, len(VOCAB), rng.integers(3, 12))])
        rs = []
        for _ in range(int(rng.integers(1, max_refs + 1))):
            rs.append([VOCAB[i] for i in rng.integers(0, len(VOCAB), rng.integers(3, 12))])
        refs.append(rs)
    return cands, refs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cider_native_matches_python(seed):
    cands, refs = random_corpus(seed)
    py_score, py_per = cider_d(cands, refs)
    nat_score, nat_per = cider_d_native(cands, refs)
    assert nat_score == pytest.approx(py_score, rel=1e-9)
    np.testing.assert_allclose(nat_per, py_per, rtol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bleu_native_matches_python(seed):
    cands, refs = random_corpus(seed + 10)
    py_bleus, _ = coco_bleu(cands, refs)
    nat_bleus = coco_bleu_native(cands, refs)
    np.testing.assert_allclose(nat_bleus, py_bleus, rtol=1e-9)


def test_native_speedup_on_large_corpus():
    import time

    cands, refs = random_corpus(99, n_images=400, max_refs=5)
    t0 = time.perf_counter()
    py, _ = cider_d(cands, refs)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nat, _ = cider_d_native(cands, refs)
    t_nat = time.perf_counter() - t0
    assert nat == pytest.approx(py, rel=1e-9)
    # the C++ core should be clearly faster (typically 10-100x)
    assert t_nat < t_py
