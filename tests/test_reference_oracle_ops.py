# coding=utf-8
"""Cluster-op oracles vs the reference's ACTUAL torch code.

Companion to tests/test_reference_oracle.py (model-level pins): these pin
the remaining cluster algorithms — spectral clustering, temporal/token
shift, sparse sampling — directly against /root/reference's own
implementations on identical inputs, so none of them rests solely on a
self-written NumPy port that could share a misreading.

Pins:
* temporal_shift_wo_cls / token_shift — exact (pure tensor shuffles;
  reference: modules/cluster/shift.py:15-66).
* constructW (HeatKernel + KNN graph modes) and the L_sym Laplacian —
  1e-5 absolute (fp32 exp/normalisation; reference: spectral.py:77-106).
* batch_spectral_clustering end-to-end on well-separated blobs — identical
  partition, and medoids agree up to within-cluster ties (reference:
  spectral.py:17-73).  torch uses SVD where we use eigh; on separated data
  the K-smallest eigenbasis is stable enough that the assignment must agree
  exactly, but a cluster's rows map to nearly the SAME embedding point
  (indicator-like eigenvectors), so the medoid argmin inside a cluster is a
  genuine fp near-tie across frameworks — pinned to membership, not id.
* token_sparse_sampling — exact on the deterministic branch, support/shape
  checks on the randomised branch (reference: cluster_utils.py:136-174).
* DeepCluster — WCSS loss + medoid extraction exact-ish (fp32), and the
  full forward (token-MLP centroids -> medoid gather -> segment
  re-interleave -> CLS concat) vs the reference torch module with copied
  weights (reference: deepcluster.py:51-246).
* loop k-medoids (the reference's own oracle, kmeans.py:52-114) — exact on
  separated blobs; see the aliasing note at the test.
"""
import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from centerclip_tpu.ops import shift as our_shift  # noqa: E402
from centerclip_tpu.ops.sampling import token_sparse_sampling  # noqa: E402
from centerclip_tpu.ops.spectral import (  # noqa: E402
    batch_spectral_clustering, construct_affinity)

REF_DIR = "/root/reference"
# net-only deps of refcc.modules.__init__ -> base -> file are stubbed for
# the import and dropped right after (same dance + rationale as
# tests/test_reference_oracle.py: a lingering stub poisons later
# `import transformers` in other test modules).
_stubbed = []
for _name in ("boto3", "botocore", "botocore.exceptions", "ftfy", "regex"):
    if _name in sys.modules:
        continue
    try:
        importlib.import_module(_name)
        continue
    except ImportError:
        pass
    _m = types.ModuleType(_name)
    if _name == "botocore.exceptions":
        _m.ClientError = type("ClientError", (Exception,), {})
    sys.modules[_name] = _m
    _stubbed.append(_name)
if "refcc" not in sys.modules:
    _pkg = types.ModuleType("refcc")
    _pkg.__path__ = [REF_DIR]
    sys.modules["refcc"] = _pkg

ref_shift = importlib.import_module("refcc.modules.cluster.shift")
ref_spectral = importlib.import_module("refcc.modules.cluster.spectral")
ref_cutils = importlib.import_module("refcc.modules.cluster.cluster_utils")
ref_deep = importlib.import_module("refcc.modules.cluster.deepcluster")

for _name in _stubbed:
    sys.modules.pop(_name, None)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# ------------------------------------------------------------------- shifts
@pytest.mark.parametrize("fold_div", [2, 4, 8])
def test_temporal_shift_matches_reference(rng, fold_div):
    # [B*T, 1+HW, C] with a CLS slot, as inside the ViT block stack
    x = rng.standard_normal((3 * 4, 1 + 9, 16)).astype(np.float32)
    ours = np.asarray(our_shift.temporal_shift_wo_cls(
        jnp.asarray(x), n_segment=4, fold_div=fold_div))
    theirs = ref_shift.temporal_shift_wo_cls(
        torch.from_numpy(x), n_segment=4, fold_div=fold_div).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("fold_div", [2, 4, 8])
def test_token_shift_matches_reference(rng, fold_div):
    x = rng.standard_normal((2 * 6, 10, 16)).astype(np.float32)
    ours = np.asarray(our_shift.token_shift(
        jnp.asarray(x), n_segment=6, fold_div=fold_div))
    theirs = ref_shift.token_shift(
        torch.from_numpy(x), n_segment=6, fold_div=fold_div).numpy()
    np.testing.assert_array_equal(ours, theirs)


# ----------------------------------------------------------------- spectral
@pytest.mark.parametrize("mode", ["HeatKernel", "KNN"])
def test_affinity_graph_matches_reference(rng, mode):
    x = rng.standard_normal((2, 12, 8)).astype(np.float32)
    ours = np.asarray(construct_affinity(
        jnp.asarray(x), jnp.asarray(x), sigma=2.0, mode=mode, knn_k=5))
    theirs = ref_spectral.constructW(
        torch.from_numpy(x), torch.from_numpy(x), sigma=2.0, mode=mode,
        knn_k=5).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_affinity_spatial_temporal_graph_matches_reference(rng):
    # 2 frames x 4 tokens + CLS = 9 tokens, as cluster.py wires stg
    stg = ref_spectral.spatial_temporal_graph(9, 4, s_kernel=3, t_kernel=3)
    from centerclip_tpu.ops.spectral import spatial_temporal_graph as our_stg
    np.testing.assert_array_equal(
        np.asarray(our_stg(9, 4, s_kernel=3, t_kernel=3)),
        np.asarray(stg, dtype=np.float32))
    x = rng.standard_normal((2, 9, 8)).astype(np.float32)
    ours = np.asarray(construct_affinity(
        jnp.asarray(x), jnp.asarray(x), mode="HeatKernel",
        spatial_temporal_graph=jnp.asarray(np.asarray(stg, np.float32))))
    theirs = ref_spectral.constructW(
        torch.from_numpy(x), torch.from_numpy(x), mode="HeatKernel",
        spatial_temporal_graph=torch.as_tensor(
            np.asarray(stg, np.float32))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _blobs(rng, b, n, k, d, spread=0.05):
    """k well-separated clusters per batch row -> stable spectral embedding."""
    centers = rng.standard_normal((b, k, d)).astype(np.float32) * 4.0
    assign = np.concatenate([np.full(n // k, i) for i in range(k)] +
                            [np.full(n % k, k - 1)])
    x = centers[:, assign] + spread * rng.standard_normal(
        (b, len(assign), d)).astype(np.float32)
    return x.astype(np.float32)


def _assert_medoids_cluster_equivalent(a, m, a_ref, m_ref):
    """Medoids must represent the same clusters (see module docstring)."""
    a, m = np.asarray(a), np.asarray(m)
    a_ref, m_ref = np.asarray(a_ref), np.asarray(m_ref)
    for b in range(a.shape[0]):
        np.testing.assert_array_equal(a[b][m[b]], a_ref[b][m_ref[b]])
        # and each medoid belongs to the cluster it represents
        np.testing.assert_array_equal(a[b][m[b]], np.arange(m.shape[1]))


@pytest.mark.parametrize("solver", ["eigh", "subspace"])
def test_spectral_clustering_matches_reference(rng, solver):
    B, N, K, D = 3, 16, 4, 8
    x = _blobs(rng, B, N, K, D)
    a_ours, m_ours = batch_spectral_clustering(
        jnp.asarray(x), K, mode="HeatKernel", correct_sign=False,
        sigma=2.5, solver=solver)
    a_ref, m_ref = ref_spectral.batch_spectral_clustering(
        torch.from_numpy(x), K, mode="HeatKernel", split_size=1, sigma=2.5)
    np.testing.assert_array_equal(np.asarray(a_ours), a_ref.numpy())
    _assert_medoids_cluster_equivalent(a_ours, m_ours, a_ref, m_ref)


def test_spectral_knn_clustering_matches_reference(rng):
    B, N, K, D = 2, 18, 3, 6
    x = _blobs(rng, B, N, K, D)
    a_ours, m_ours = batch_spectral_clustering(
        jnp.asarray(x), K, mode="KNN", knn_k=6, correct_sign=False,
        sigma=2.5)
    a_ref, m_ref = ref_spectral.batch_spectral_clustering(
        torch.from_numpy(x), K, mode="KNN", knn_k=6, split_size=1,
        sigma=2.5)
    np.testing.assert_array_equal(np.asarray(a_ours), a_ref.numpy())
    _assert_medoids_cluster_equivalent(a_ours, m_ours, a_ref, m_ref)


# ----------------------------------------------------------------- sampling
@pytest.mark.parametrize("target,total", [(3, 12), (4, 10), (5, 5), (6, 4)])
def test_sparse_sampling_deterministic_matches_reference(target, total):
    ours = token_sparse_sampling(target, total, random_shift=False)
    theirs = np.asarray(ref_cutils.token_sparse_sampling(
        target, total, random_shift=False))
    np.testing.assert_array_equal(ours, theirs)


def test_sparse_sampling_random_branch_support(rng):
    # randomised branch: same segment structure as the reference
    # (offset i in [i*avg, (i+1)*avg))
    for _ in range(20):
        out = token_sparse_sampling(3, 12, random_shift=True, rng=rng)
        avg = 12 // 3
        assert out.shape == (3,)
        assert all(i * avg <= o < (i + 1) * avg for i, o in enumerate(out))


# -------------------------------------------------------------- deepcluster
def test_deepcluster_wcss_matches_reference(rng):
    from centerclip_tpu.ops.deepcluster import batch_within_cluster_sse
    x = rng.standard_normal((3, 14, 8)).astype(np.float32)
    c = rng.standard_normal((3, 4, 8)).astype(np.float32)
    loss_j, assign_j = batch_within_cluster_sse(jnp.asarray(x), jnp.asarray(c))
    loss_t, assign_t = ref_deep.batch_within_cluster_SSE(
        torch.from_numpy(x), torch.from_numpy(c))
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(assign_j), assign_t.numpy())


def test_deepcluster_get_medoids_matches_reference(rng):
    # L > K leaves some clusters empty in expectation -> also covers the
    # reference's all-zero mask row behaviour (min over zeros -> index 0)
    from centerclip_tpu.ops.deepcluster import get_medoids as our_medoids
    x = rng.standard_normal((4, 12, 8)).astype(np.float32)
    c = rng.standard_normal((4, 5, 8)).astype(np.float32)
    ours = np.asarray(our_medoids(jnp.asarray(x), jnp.asarray(c)))
    theirs = ref_deep.get_medoids(
        torch.from_numpy(x), torch.from_numpy(c)).numpy()
    np.testing.assert_array_equal(ours, theirs)


def _deepcluster_pair(rng):
    """Our flax DeepCluster + the reference torch module with the SAME
    weights (flax Dense kernel [in,out] -> torch Linear weight [out,in],
    flax LayerNorm scale/bias -> torch weight/bias)."""
    import jax
    from centerclip_tpu.config import BlockClusterSpec, ClusterConfig
    from centerclip_tpu.ops.deepcluster import DeepCluster as OurDeepCluster

    D, P, T, S, K, B = 16, 8, 4, 2, 3, 2
    spec = BlockClusterSpec(block_id=2, algo="deepcluster",
                            before_cluster_num=P, cluster_num=K,
                            before_frames=T, after_frames=S,
                            frame_duration=T // S)
    ours = OurDeepCluster(spec=spec, cfg=ClusterConfig(deep_cluster=True),
                          width=D)
    x = rng.standard_normal((B * T, 1 + P, D)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       train=True)["params"]

    theirs = ref_deep.DeepCluster(
        feature_dim=D, intermediate_dim=D, before_cluster_num=P,
        cluster_num=K, before_block_frames=T, after_block_frames=S,
        block_id=2, alpha=1.0, loss_type="wcss")
    mlp = theirs.token_mlp
    with torch.no_grad():
        for fc, ln in (("fc1", "ln1"), ("fc2", "ln2"), ("fc3", "ln3")):
            getattr(mlp, fc).weight.copy_(torch.from_numpy(
                np.array(params[fc]["kernel"]).T.copy()))
            getattr(mlp, fc).bias.copy_(torch.from_numpy(
                np.array(params[fc]["bias"])))
            getattr(mlp, ln).weight.copy_(torch.from_numpy(
                np.array(params[ln]["scale"])))
            getattr(mlp, ln).bias.copy_(torch.from_numpy(
                np.array(params[ln]["bias"])))
    return ours, params, theirs, x


@pytest.mark.parametrize("train", [True, False])
def test_deepcluster_forward_matches_reference(rng, train):
    ours, params, theirs, x = _deepcluster_pair(rng)
    out_j, loss_j = ours.apply({"params": params}, jnp.asarray(x),
                               train=train)
    theirs.train(train)
    with torch.no_grad():
        # reference forward takes/returns LND (deepcluster.py:99-151)
        out_t, loss_t = theirs(torch.from_numpy(x).permute(1, 0, 2))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(1, 0, 2).numpy(), atol=2e-5)
    if train:
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
    else:
        assert float(loss_j) == float(loss_t) == 0.0


# ----------------------------------------------------------- loop k-medoids
# The reference ships a SECOND k-medoids (the per-sample loop implementation
# its own test.py uses as the correctness oracle for fast_kmeans).  Worth
# knowing before pinning: `kmeans.py:78` does `pre_mediods = mediods`, an
# ALIAS of the tensor mutated in place at `kmeans.py:98` — center_shift is
# identically 0 and the loop always stops after ONE Lloyd iteration.  On
# well-separated blobs a single Lloyd step from KKZ init is already the
# fixed point, so both implementations (and ours, which iterates to real
# convergence) must agree there; that is what this pin uses.
ref_kmeans = importlib.import_module("refcc.modules.cluster.kmeans")


@pytest.mark.parametrize("distance", ["euclidean", "cosine"])
def test_loop_kmedoids_matches_reference(rng, distance):
    from centerclip_tpu.ops.kmedoids import batch_fast_kmedoids
    B, N, K, D = 3, 16, 4, 8
    x = _blobs(rng, B, N, K, D, spread=0.03)
    a_ours, m_ours = batch_fast_kmedoids(
        jnp.asarray(x), K, distance=distance)
    a_ref, m_ref = ref_kmeans.batch_kmedoids(
        torch.from_numpy(x), K, distance=distance)
    np.testing.assert_array_equal(np.asarray(a_ours), a_ref.numpy())
    np.testing.assert_array_equal(np.asarray(m_ours), m_ref.numpy())
