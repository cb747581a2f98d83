# coding=utf-8
"""Fused Pallas k-medoids vs the jnp implementation (interpret mode on CPU;
the bench drives the compiled kernel on real TPU)."""
import numpy as np
import pytest

from centerclip_tpu.ops import batch_fast_kmedoids
from centerclip_tpu.ops.kmedoids_pallas import batch_fast_kmedoids_pallas
from tests.test_kmedoids import make_blobs


@pytest.mark.parametrize("shape", [(4, 60, 16, 5), (2, 98, 32, 49)])
def test_pallas_matches_jnp(rng, shape):
    B, N, D, K = shape
    x = make_blobs(rng, B, N, D, K if K <= 8 else 8)
    a1, m1 = batch_fast_kmedoids(x, K, iter_limit=40)
    a2, m2 = batch_fast_kmedoids_pallas(x, K, iter_limit=40, interpret=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_pallas_cosine(rng):
    x = make_blobs(rng, 3, 50, 12, 4)
    a1, m1 = batch_fast_kmedoids(x, 4, distance="cosine", iter_limit=40)
    a2, m2 = batch_fast_kmedoids_pallas(x, 4, distance="cosine",
                                        iter_limit=40, interpret=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_pallas_pre_norm(rng):
    x = make_blobs(rng, 2, 40, 8, 3)
    a1, m1 = batch_fast_kmedoids(x, 3, pre_norm=True)
    a2, m2 = batch_fast_kmedoids_pallas(x, 3, pre_norm=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
