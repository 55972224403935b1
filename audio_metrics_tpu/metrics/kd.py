"""Kernel Distance (KID / MMD^2) on TPU.

Counterpart of reference src/audio_metrics/metrics/kd.py:29-194.  The
reference loops 100 times on host, building three numpy Gram matrices per
subset (kd.py:178-187) — an O(subsets * m^2 * d) CPU BLAS workload.  Here the
subset *index* selection stays on host (numpy ``default_rng``, bit-identical
call order to the reference: per subset, f1-indices then f2-indices,
kd.py:185-186), but all Gram matrices and MMD reductions run on device as a
single ``lax.map`` over gathered subsets — 3 MXU matmuls per subset, row sums
accumulated in float64.

Public surface mirrors the reference: ``kernel_distance``, ``mmd2``,
``polynomial_kernel``, ``rbf_kernel``, ``kid_features_to_metric`` and the
``KID_*`` constants (kd.py:17-26).
"""

from __future__ import annotations

import logging
from functools import lru_cache

import numpy as np

from ..data import AudioMetricsData, ensure_ndarray

__all__ = [
    "kernel_distance",
    "kid_features_to_metric",
    "mmd2",
    "polynomial_kernel",
    "rbf_kernel",
    "KEY_METRIC_KID_MEAN",
    "KEY_METRIC_KID_STD",
]

KEY_METRIC_KID_MEAN = "kernel_distance_mean"
KEY_METRIC_KID_STD = "kernel_distance_std"
KID_SUBSETS = 100
KID_SUBSET_SIZE = 1000
# Polynomial kernel (kd.py:21-24)
KID_DEGREE = 3
KID_GAMMA = None
KID_COEF0 = 1
# RBF kernel (kd.py:26)
KID_SIGMA = 10.0

logger = logging.getLogger(__name__)


def kernel_distance(x: AudioMetricsData, y: AudioMetricsData, **kwargs):
    """KD result dict; with ``lazy=True`` a zero-arg finalize callable
    instead (device work is dispatched either way — see
    _device_mmd2_subsets)."""
    # device-resident embeddings: one (cached) upload shared with PRDC
    return kid_features_to_metric(
        x.embeddings_device, y.embeddings_device, **kwargs
    )


# ----------------------------------------------------------------------
# numpy reference formulas (kept for API parity and host-side fallback)
# ----------------------------------------------------------------------
def polynomial_kernel(X, Y, degree=3, gamma=None, coef0=1):
    """(gamma <X,Y> + coef0)^degree  (kd.py:112-116)."""
    if gamma is None:
        gamma = 1.0 / X.shape[1]
    return (np.matmul(X, Y.T) * gamma + coef0) ** degree


def rbf_kernel(X, Y, sigma=1.0):
    """exp(-|x-y|^2 / 2 sigma^2)  (kd.py:86-109)."""
    sq_x = np.sum(np.square(X), axis=1)[:, None]
    sq_y = np.sum(np.square(Y), axis=1)[None, :]
    squared_dist = np.maximum(sq_x + sq_y - 2.0 * np.matmul(X, Y.T), 0.0)
    return np.exp(-squared_dist / (2 * sigma**2))


def mmd2(K_XX, K_XY, K_YY, unit_diagonal=False, mmd_est="unbiased"):
    """MMD^2 estimators from Gram matrices (kd.py:38-83)."""
    assert mmd_est in ("biased", "unbiased", "u-statistic")
    m = K_XX.shape[0]
    assert K_XX.shape == (m, m)
    assert K_XY.shape == (m, m)
    assert K_YY.shape == (m, m)

    if unit_diagonal:
        diag_x = diag_y = 1.0
        sum_diag_x = sum_diag_y = m
    else:
        diag_x = np.diagonal(K_XX)
        diag_y = np.diagonal(K_YY)
        sum_diag_x = diag_x.sum()
        sum_diag_y = diag_y.sum()

    kt_xx_sum = (K_XX.sum(axis=1) - diag_x).sum()
    kt_yy_sum = (K_YY.sum(axis=1) - diag_y).sum()
    k_xy_sum = K_XY.sum()

    if mmd_est == "biased":
        return (
            (kt_xx_sum + sum_diag_x) / (m * m)
            + (kt_yy_sum + sum_diag_y) / (m * m)
            - 2 * k_xy_sum / (m * m)
        )
    value = (kt_xx_sum + kt_yy_sum) / (m * (m - 1))
    if mmd_est == "unbiased":
        value -= 2 * k_xy_sum / (m * m)
    else:
        value -= 2 * (k_xy_sum - np.trace(K_XY)) / (m * (m - 1))
    return value


# ----------------------------------------------------------------------
# device path
# ----------------------------------------------------------------------
def _kd_gram(a, b, kernel_type, degree, gamma, coef0, sigma, sq_a=None, sq_b=None):
    import jax.numpy as jnp

    if kernel_type == "polynomial":
        k = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        return (k * gamma + coef0) ** degree
    # rbf (sq_a / sq_b: optional precomputed-and-gathered row norms so the
    # subset loop does not re-derive them — VERDICT r3 item 2)
    if sq_a is None:
        sq_a = jnp.sum(a * a, axis=1)
    if sq_b is None:
        sq_b = jnp.sum(b * b, axis=1)
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    sq = jnp.maximum(sq_a[:, None] + sq_b[None, :] - 2.0 * dots, 0.0)
    return jnp.exp(-sq / (2.0 * sigma**2))


def _row_norms_if_rbf(f, kparams):
    import jax.numpy as jnp

    if kparams[0] == "polynomial":
        return None
    return jnp.sum(f * f, axis=1)


def _gather_sq(sq, idx):
    import jax.numpy as jnp

    if sq is None:
        return None
    return jnp.take(sq, idx.astype(jnp.int32), axis=0)


def _kd_cand_one_subset(f1, f2, sq1, sq2, idx_pair, kparams):
    """Candidate-side per-subset reductions: f32 row sums on the VPU, then
    f64 scalar finals ON DEVICE (the per-subset f64 work is tiny — m adds —
    while pulling the (subsets, m) row-sum arrays to host costs ~2 MB of
    sync transfer per call on remote-device links).  Returns the two f64
    scalars that depend on the candidate: sum(K_XX)-tr, sum(K_XY).  The
    reference-only term (sum(K_YY)-tr) lives in :func:`_kd_ref_one_subset`
    and is cached across evaluate() calls."""
    import jax.numpy as jnp

    ia, ib = idx_pair
    a = jnp.take(f1, ia.astype(jnp.int32), axis=0)
    b = jnp.take(f2, ib.astype(jnp.int32), axis=0)
    k_xx = _kd_gram(a, a, *kparams, sq_a=_gather_sq(sq1, ia), sq_b=_gather_sq(sq1, ia))
    k_xy = _kd_gram(a, b, *kparams, sq_a=_gather_sq(sq1, ia), sq_b=_gather_sq(sq2, ib))
    kt_xx = jnp.sum(jnp.sum(k_xx, axis=1).astype(jnp.float64)) - jnp.sum(
        jnp.diagonal(k_xx).astype(jnp.float64)
    )
    k_xy_sum = jnp.sum(jnp.sum(k_xy, axis=1).astype(jnp.float64))
    return kt_xx, k_xy_sum


def _kd_ref_one_subset(f2, sq2, ib, kparams):
    """Reference-only per-subset reduction: sum(K_YY) - tr(K_YY) in f64.

    The reference recomputes this every call (reference kd.py:178-187);
    here the (subsets,) result is cached keyed on (reference embeddings
    identity, subset-index identity, kernel params) — the same invalidation
    discipline as ``AudioMetricsData.chol_cov`` / the cached kNN radii."""
    import jax.numpy as jnp

    b = jnp.take(f2, ib.astype(jnp.int32), axis=0)
    k_yy = _kd_gram(b, b, *kparams, sq_a=_gather_sq(sq2, ib), sq_b=_gather_sq(sq2, ib))
    return jnp.sum(jnp.sum(k_yy, axis=1).astype(jnp.float64)) - jnp.sum(
        jnp.diagonal(k_yy).astype(jnp.float64)
    )


def _chunked_subset_map(one, idx_arrays, chunk):
    """lax.map of a vmapped per-subset fn over chunked index arrays: enough
    subsets in flight to keep the MXU busy without materializing all S Gram
    matrices at once."""
    import jax
    import jax.numpy as jnp

    s = idx_arrays[0].shape[0]
    n_chunks = -(-s // chunk)
    pad = n_chunks * chunk - s
    if pad:
        idx_arrays = tuple(
            jnp.concatenate([i, i[:pad]], axis=0) for i in idx_arrays
        )
    chunked = tuple(i.reshape(n_chunks, chunk, -1) for i in idx_arrays)
    xs = chunked[0] if len(chunked) == 1 else chunked
    sums = jax.lax.map(jax.vmap(one), xs)
    if not isinstance(sums, tuple):
        sums = (sums,)
    out = tuple(r.reshape(-1)[:s] for r in sums)
    return out


def _kd_cand_rows_jit():
    import jax
    from functools import partial

    @partial(jax.jit, static_argnames=("kparams", "chunk"))
    def run(f1, f2, i1, i2, kparams, chunk):
        sq1 = _row_norms_if_rbf(f1, kparams)
        sq2 = _row_norms_if_rbf(f2, kparams)
        one = lambda pair: _kd_cand_one_subset(f1, f2, sq1, sq2, pair, kparams)
        return _chunked_subset_map(one, (i1, i2), chunk)

    return run


def _kd_ref_rows_jit():
    import jax
    from functools import partial

    @partial(jax.jit, static_argnames=("kparams", "chunk"))
    def run(f2, i2, kparams, chunk):
        sq2 = _row_norms_if_rbf(f2, kparams)
        one = lambda ib: _kd_ref_one_subset(f2, sq2, ib, kparams)
        (kt_yy,) = _chunked_subset_map(one, (i2,), chunk)
        return kt_yy

    return run


_kd_cand_rows = None
_kd_ref_rows = None


def _get_kd_cand_rows():
    global _kd_cand_rows
    if _kd_cand_rows is None:
        _kd_cand_rows = _kd_cand_rows_jit()
    return _kd_cand_rows


def _get_kd_ref_rows():
    global _kd_ref_rows
    if _kd_ref_rows is None:
        _kd_ref_rows = _kd_ref_rows_jit()
    return _kd_ref_rows


@lru_cache(maxsize=None)
def _get_kd_sharded(mesh, kparams):
    """Cached jitted shard_map KD candidate-subset runner for a mesh (a
    fresh closure per call would retrace every evaluate — VERDICT r2 warmup
    audit)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import batch_axes

    axis = batch_axes(mesh)  # compound: every mesh axis (1-D or DCN 2-D)

    def local(f1_loc, f2_loc, i1_loc, i2_loc):
        sq1 = _row_norms_if_rbf(f1_loc, kparams)
        sq2 = _row_norms_if_rbf(f2_loc, kparams)
        one = lambda pair: _kd_cand_one_subset(
            f1_loc, f2_loc, sq1, sq2, pair, kparams
        )
        return jax.lax.map(one, (i1_loc, i2_loc))

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=(P(axis),) * 2,
        )
    )


@lru_cache(maxsize=None)
def _get_kd_ref_sharded(mesh, kparams):
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import batch_axes

    axis = batch_axes(mesh)

    def local(f2_loc, i2_loc):
        sq2 = _row_norms_if_rbf(f2_loc, kparams)
        one = lambda ib: _kd_ref_one_subset(f2_loc, sq2, ib, kparams)
        return jax.lax.map(one, i2_loc)

    return jax.jit(
        shard_map(local, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis))
    )


# kt_yy per (reference identity, subset-index identity, kernel params, mesh):
# the KEEP dict pins the keyed objects so the id()-based keys stay valid
_KT_YY_CACHE: dict = {}
_KT_YY_KEEP: dict = {}


def _ref_row_sums(f2, features_2, i2, idx_2, kparams, chunk, mesh=None):
    """Cached (subsets,) f64 device array of sum(K_YY)-tr per subset.

    The reference pays this Gram recompute on every call
    (reference kd.py:178-187); with cached subset indices and a fixed
    reference it is pure function of cached inputs, so compute once."""
    key = (id(features_2), id(idx_2), kparams, mesh)
    hit = _KT_YY_CACHE.get(key)
    if hit is not None:
        return hit
    if mesh is not None:
        kt_yy = _get_kd_ref_sharded(mesh, kparams)(f2, i2)
    else:
        kt_yy = _get_kd_ref_rows()(f2, i2, kparams, chunk)
    if len(_KT_YY_CACHE) > 8:
        _KT_YY_CACHE.clear()
        _KT_YY_KEEP.clear()
    _KT_YY_CACHE[key] = kt_yy
    _KT_YY_KEEP[key] = (features_2, idx_2)
    return kt_yy


def _host_mmd2(sums, m):
    kt_xx, kt_yy, k_xy_sum = (np.asarray(r, dtype=np.float64) for r in sums)
    return (kt_xx + kt_yy) / (m * (m - 1)) - 2.0 * k_xy_sum / (m * m)


def _device_mmd2_subsets(
    features_1: np.ndarray,
    features_2: np.ndarray,
    idx_1: np.ndarray,
    idx_2: np.ndarray,
    kernel_type: str,
    degree: float,
    gamma: float,
    coef0: float,
    sigma: float,
    mesh=None,
    lazy: bool = False,
):
    """All subset MMD^2 row sums in one jitted program (compiled once per
    shape/kernel config), f64 finals on host.  With a mesh, the subset axis
    shards over the chips via shard_map (features replicated; each chip runs
    its share of the subset loop).

    ``lazy=True`` dispatches the device program and returns a zero-arg
    finalize callable (the sync happens there) so callers can overlap other
    host work — e.g. FAD's f64 eigh — with the device computation.
    """
    import jax
    import jax.numpy as jnp

    def _pad_pow2_rows(f):
        # bucket row counts to powers of two so different eval-set sizes hit
        # the same compiled program (padded rows are never gathered: subset
        # indices only cover the valid range)
        n = f.shape[0]
        target = max(256, 1 << (n - 1).bit_length())
        if target > n:
            f = jnp.pad(jnp.asarray(f, dtype=jnp.float32), ((0, target - n), (0, 0)))
        else:
            f = jnp.asarray(f, dtype=jnp.float32)
        return f

    f1 = _pad_pow2_rows(features_1)
    f2 = _pad_pow2_rows(features_2)
    # uint16 transfer halves the index upload when row counts allow (the
    # subsets are host-sampled for reference rng parity; kernels upcast)
    idx_dt = (
        jnp.uint16
        if max(features_1.shape[0], features_2.shape[0]) < (1 << 16)
        else jnp.int32
    )
    i1, i2 = _device_indices(idx_1, idx_2, str(np.dtype(idx_dt)))
    m = idx_1.shape[1]
    kparams = (kernel_type, degree, gamma, coef0, sigma)

    mem_per_subset = 2 * m * m * 4  # cand program: K_XX + K_XY per subset
    chunk = max(1, min(idx_1.shape[0], (128 << 20) // max(mem_per_subset, 1)))

    n_subsets = idx_1.shape[0]
    if mesh is not None and mesh.size > 1:
        # pad the subset axis to a mesh multiple with duplicate rows (the
        # subsets are independent; the extra results are dropped) — the
        # reference default (100 subsets) is not divisible by 8 chips
        pad = (-n_subsets) % mesh.size
        if pad:
            i1 = jnp.concatenate([i1, i1[:pad]], axis=0)
            i2 = jnp.concatenate([i2, i2[:pad]], axis=0)

        kt_yy = _ref_row_sums(f2, features_2, i2, idx_2, kparams, chunk, mesh=mesh)
        kt_xx, k_xy = _get_kd_sharded(mesh, kparams)(f1, f2, i1, i2)
        arrs = (kt_xx, kt_yy, k_xy)

        def reduce_fn(host_arrs):
            rows = tuple(np.asarray(r)[:n_subsets] for r in host_arrs)
            return _host_mmd2(rows, m)

    else:
        kt_yy = _ref_row_sums(f2, features_2, i2, idx_2, kparams, chunk)
        kt_xx, k_xy = _get_kd_cand_rows()(f1, f2, i1, i2, kparams, chunk)
        arrs = (kt_xx, kt_yy, k_xy)

        def reduce_fn(host_arrs):
            return _host_mmd2(tuple(np.asarray(a) for a in host_arrs), m)

    if lazy == "parts":
        # (device_arrays, host_reduce) so the caller can coalesce the pull
        # with other metrics' arrays into ONE transfer
        return arrs, reduce_fn

    def finalize():
        return reduce_fn(jax.device_get(arrs))

    return finalize if lazy else finalize()


def _device_indices(idx_1, idx_2, dtype_str: str):
    """Device copies of the subset index arrays, cached across evaluate()
    calls (the host arrays are themselves lru-cached and read-only, so
    identity is a safe key; ~0.4 MB pinned per entry)."""
    import jax.numpy as jnp

    key = (id(idx_1), id(idx_2), dtype_str)
    hit = _DEVICE_IDX_CACHE.get(key)
    if hit is not None:
        return hit
    dt = jnp.dtype(dtype_str)
    pair = (
        jnp.asarray(idx_1.astype(np.int64), dtype=dt),
        jnp.asarray(idx_2.astype(np.int64), dtype=dt),
    )
    if len(_DEVICE_IDX_CACHE) > 8:
        _DEVICE_IDX_CACHE.clear()
        _DEVICE_IDX_CACHE_KEEP.clear()
    # keep the host arrays alive so the id()-based keys stay valid
    _DEVICE_IDX_CACHE[key] = pair
    _DEVICE_IDX_CACHE_KEEP[key] = (idx_1, idx_2)
    return pair


_DEVICE_IDX_CACHE: dict = {}
_DEVICE_IDX_CACHE_KEEP: dict = {}


@lru_cache(maxsize=8)
def _subset_indices(n1: int, n2: int, subsets: int, size: int, seed: int):
    """Deterministic subset indices, cached across evaluate() calls (the
    sampler is pure in its arguments; repeated evals at the same set sizes
    skip ~100k host rng draws and the index re-upload).

    Same rng call order as the reference loop (kd.py:178-186) —
    bit-identical indices (CLAUDE.md design invariant)."""
    rng = np.random.default_rng(seed)
    idx_1 = np.empty((subsets, size), dtype=np.int64)
    idx_2 = np.empty((subsets, size), dtype=np.int64)
    for i in range(subsets):
        idx_1[i] = rng.choice(n1, size, replace=False)
        idx_2[i] = rng.choice(n2, size, replace=False)
    idx_1.setflags(write=False)
    idx_2.setflags(write=False)
    return idx_1, idx_2


def kid_features_to_metric(features_1, features_2, **kwargs) -> dict:
    """KID estimate over random subsets (kd.py:127-194).

    Subset sampling matches the reference bit-for-bit (same rng, same call
    order); the per-subset MMD^2 computation runs on device.
    """
    kernel_type = kwargs.get("kernel_type", "polynomial")
    if kernel_type not in ("polynomial", "rbf"):
        raise NotImplementedError(f'Unknown kernel_type "{kernel_type}"')

    # keep jax arrays device-resident; convert torch tensors to numpy
    if hasattr(features_1, "detach"):
        features_1 = ensure_ndarray(features_1)
    if hasattr(features_2, "detach"):
        features_2 = ensure_ndarray(features_2)
    assert features_1.ndim == 2
    assert features_2.ndim == 2
    assert features_1.shape[1] == features_2.shape[1]

    kid_subsets = kwargs.get("kid_subsets", KID_SUBSETS)
    kid_subset_size = kwargs.get("kid_subset_size", KID_SUBSET_SIZE)
    verbose = kwargs.get("verbose", False)

    n_samples_1, n_samples_2 = len(features_1), len(features_2)
    assert n_samples_1 and n_samples_2, "Cannot compute KID on empty features tensor"
    n_samples = min(n_samples_1, n_samples_2)
    if kid_subset_size >= n_samples:
        new_ss = max(1, n_samples // 2)
        if verbose:
            logger.warning(
                "Reducing KID subset size from %d to %d to accommodate "
                "small sample size",
                kid_subset_size,
                new_ss,
            )
        kid_subset_size = new_ss

    idx_1, idx_2 = _subset_indices(
        n_samples_1, n_samples_2, kid_subsets, kid_subset_size,
        kwargs.get("rng_seed", 1234),
    )

    degree = kwargs.get("kid_degree", KID_DEGREE)
    gamma = kwargs.get("kid_gamma", KID_GAMMA)
    if gamma is None:
        gamma = 1.0 / features_1.shape[1]
    coef0 = kwargs.get("kid_coef0", KID_COEF0)
    sigma = kwargs.get("kid_sigma", KID_SIGMA)

    arrs, rows_fn = _device_mmd2_subsets(
        features_1,
        features_2,
        idx_1,
        idx_2,
        kernel_type=kernel_type,
        degree=float(degree),
        gamma=float(gamma),
        coef0=float(coef0),
        sigma=float(sigma),
        mesh=kwargs.get("mesh"),
        lazy="parts",
    )

    def host_reduce(host_arrs):
        mmds = rows_fn(host_arrs)
        return {
            KEY_METRIC_KID_MEAN: float(np.mean(mmds)),
            KEY_METRIC_KID_STD: float(np.std(mmds)),
        }

    lazy = kwargs.get("lazy")
    if lazy == "parts":
        return arrs, host_reduce

    def finalize():
        import jax

        return host_reduce(jax.device_get(arrs))

    return finalize if lazy else finalize()
