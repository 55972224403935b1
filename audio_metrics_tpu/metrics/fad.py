"""Frechet Audio Distance.

Counterpart of reference src/audio_metrics/metrics/fad.py:8-31, which computes
``FAD = |mu_x - mu_y|^2 + Tr(Sx) + Tr(Sy) - 2 Tr sqrt(Sx Sy)`` using the trace
trick ``Tr sqrt(Sx Sy) = sum sqrt(eigvals(Sx Sy))`` via complex
``torch.linalg.eigvals``.

TPU has no complex eigendecomposition, and none is needed: for symmetric PSD
Sx, Sy the eigenvalues of ``Sx @ Sy`` equal those of the *symmetric* matrix
``Sx^{1/2} Sy Sx^{1/2}``, so two real ``eigh`` calls suffice.  Two backends:

- ``method="eigh"`` (default): float64 symmetric eigendecompositions.  The
  d x d matrices are tiny (d <= 512) relative to the N x d embedding work, so
  this runs on host LAPACK in f64 — the same precision profile as the
  reference's CPU torch path.
- ``method="newton_schulz"``: an on-device, matmul-only (MXU-friendly)
  Newton-Schulz iteration for ``Tr sqrt(.)``, for fully-on-device pipelines.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ..data import AudioMetricsData, ensure_ndarray, _unpack_tril_host

__all__ = [
    "frechet_distance",
    "_frechet_distance",
    "trace_sqrtm_product",
    "fad_device_tail",
    "fad_inf_parts",
]


def _sym_sqrtm(a: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh(a)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def trace_sqrtm_product(
    sigma_x: np.ndarray, sigma_y: np.ndarray, chol_x: np.ndarray | None = None
) -> float:
    """``Tr sqrt(sigma_x @ sigma_y)`` for symmetric PSD inputs.

    Fast path: with ``sigma_x = L L^T`` (Cholesky), ``eig(sigma_x sigma_y)
    = eig(L^T sigma_y L)`` (cyclic similarity), and ``L^T sigma_y L`` is
    symmetric PSD — one Cholesky + eigvalsh (~22 ms at d=512) instead of a
    full eigendecomposition for the matrix square root (~60 ms).  Falls
    back to the eigh route when sigma_x is numerically semidefinite.

    ``chol_x``: optional precomputed Cholesky factor of ``sigma_x``
    (callers that evaluate repeatedly against a fixed reference cache it —
    see :meth:`AudioMetricsData.chol_cov`)."""
    l = chol_x
    if l is None:
        try:
            l = np.linalg.cholesky(sigma_x)
        except np.linalg.LinAlgError:
            l = None
    if l is None:
        sx_half = _sym_sqrtm(sigma_x)
        m = sx_half @ sigma_y @ sx_half
    else:
        m = l.T @ sigma_y @ l
    vals = np.linalg.eigvalsh(m)
    return float(np.sqrt(np.clip(vals, 0.0, None)).sum())


def _ns_trace_sqrt_sym(m, n_iter: int = 30):
    """``Tr sqrt(M)`` for symmetric PSD ``M`` via coupled Newton-Schulz —
    matmuls only (MXU-friendly; no eigendecomposition anywhere).

    Iterates on ``A = M / ||M||_F`` with ``Y <- Y (3I - Z Y)/2,
    Z <- (3I - Z Y)/2 Z`` so that ``Y -> sqrt(A)``; then
    ``Tr sqrt(M) = sqrt(||M||_F) Tr(Y)``.  30 f32 iterations measured
    2.65e-7 rel err vs f64 eigh at d=512 (scripts/probe_fad_tail_ns.py) and
    ~1.6 ms on the v5e relay vs ~10 ms for device eigvalsh."""
    import jax
    import jax.numpy as jnp

    d = m.shape[0]
    eye = jnp.eye(d, dtype=m.dtype)
    hi = jax.lax.Precision.HIGHEST
    norm = jnp.sqrt(jnp.sum(m * m)) + 1e-30
    a = m / norm

    def body(carry, _):
        y, z = carry
        t = 0.5 * (3.0 * eye - jnp.dot(z, y, precision=hi))
        return (jnp.dot(y, t, precision=hi), jnp.dot(t, z, precision=hi)), None

    (y, _), _ = jax.lax.scan(body, (a, eye), None, length=n_iter)
    return jnp.sqrt(norm) * jnp.trace(y)


def _trace_sqrtm_product_ns(sigma_x, sigma_y, n_iter: int = 30):
    """On-device Newton-Schulz ``Tr sqrt(Sx Sy)`` (matmuls only).

    ``Tr sqrt(Sx Sy) = Tr sqrt(L^T Sy L)`` with ``L L^T = Sx`` (Cholesky,
    supported on TPU); the symmetric PSD trace-sqrt then runs via
    :func:`_ns_trace_sqrt_sym`.
    """
    import jax.numpy as jnp

    sx = jnp.asarray(sigma_x)
    sy = jnp.asarray(sigma_y)
    d = sx.shape[0]
    eye = jnp.eye(d, dtype=sx.dtype)
    # jitter for Cholesky of PSD (possibly singular) matrices
    eps = 1e-10 * jnp.trace(sx) / d + 1e-30
    chol = jnp.linalg.cholesky(sx + eps * eye)
    m = chol.T @ sy @ chol
    return _ns_trace_sqrt_sym(0.5 * (m + m.T), n_iter)


# ----------------------------------------------------------------------
# device-side evaluate tail
# ----------------------------------------------------------------------
# The single-core dev host pays ~33 ms per evaluate for the two f64 512^3
# gemms of M = L^T C L (plus ~15 ms eigvalsh); the MXU does the same gemms
# in ~us.  ``fad_device_tail`` moves the similarity transform (and, in
# "eigdev"/"nsdev" mode, the trace-sqrt itself) onto the device, so the host
# tail shrinks to one eigvalsh ("packed", pulls M as a packed lower triangle
# — same bytes as the moment pull it replaces), a sqrt-sum of 512 pulled
# eigenvalues ("eigdev" — the (d, d) moment never crosses the link at all),
# or nothing but three scalars ("nsdev" — Newton-Schulz trace-sqrt, matmuls
# only; device eigvalsh costs ~10 ms on the serialized relay stream where
# 30 NS gemm pairs cost ~1.6 ms, scripts/probe_fad_tail_ns.py).
#
# Numerics: the transform runs in f32 at Precision.HIGHEST.  Against the
# all-host f64 path this perturbs M by ~1e-7 rel, which perturbs
# Tr sqrt(M) by ~1e-7 rel on full-rank covariances (the fast path is gated
# on n > d so the candidate covariance is full-rank in practice; low-rank
# and host-fed candidates fall back to the f64 host path).  The NS
# iteration adds ~2.7e-7 rel on top (same f32 class).  Mode selection:
# AM_TPU_FAD_TAIL = nsdev | eigdev | packed | host (default set from the
# measured relay numbers — see BASELINE.md).


def _fad_tail_mode() -> str:
    return os.environ.get("AM_TPU_FAD_TAIL", "nsdev")


def _ns_iters() -> int:
    return int(os.environ.get("AM_TPU_FAD_NS_ITERS", "30"))


@lru_cache(maxsize=None)
def _tail_program(d: int, mode: str, ns_iter: int = 30):
    import jax
    import jax.numpy as jnp

    il = np.tril_indices(d)
    hi = jax.lax.Precision.HIGHEST

    def run(m2, s1, l, inv_nm1):
        c = m2 * inv_nm1  # candidate covariance, f32
        m = jnp.dot(l.T, jnp.dot(c, l, precision=hi), precision=hi)
        m = 0.5 * (m + m.T)  # exactly symmetric -> packable
        tr = jnp.sum(jnp.diagonal(c).astype(jnp.float64))
        if mode == "eigdev":
            return s1, tr, jnp.linalg.eigvalsh(m)
        if mode == "nsdev":
            return s1, tr, _ns_trace_sqrt_sym(m, ns_iter)
        return s1, tr, m[il]

    return jax.jit(run)


# 1/(n-1) device scalars cached per n: a numpy scalar argument is a fresh
# host->device transfer (one relay round trip) on every dispatch, and the
# candidate set size repeats across evaluates by construction.
_INV_NM1_CACHE: dict = {}


def _inv_nm1_dev(n: int):
    import jax.numpy as jnp

    v = _INV_NM1_CACHE.get(n)
    if v is None:
        if len(_INV_NM1_CACHE) > 256:
            _INV_NM1_CACHE.clear()
        v = _INV_NM1_CACHE[n] = jnp.asarray(1.0 / (n - 1), jnp.float32)
    return v


def _ref_chol_device(ref: AudioMetricsData, l: np.ndarray):
    """f32 device copy of the reference Cholesky factor, cached by factor
    identity (chol_cov() itself caches by cov identity, so the upload —
    ~1 MB, once per reference — amortizes across evaluates)."""
    import jax.numpy as jnp

    cached = getattr(ref, "_chol_dev_cache", None)
    if cached is not None and cached[0] is l:
        return cached[1]
    l_dev = jnp.asarray(l, dtype=jnp.float32)
    ref._chol_dev_cache = (l, l_dev)
    return l_dev


def fad_device_tail(cand: AudioMetricsData, ref: AudioMetricsData, mode=None):
    """Dispatch the FAD tail transform on device for a pending candidate.

    Applies when ``cand`` holds exactly one pending device moment triple
    with n > d (full-rank covariance) and ``ref`` has a Cholesky-factorable
    covariance.  Returns ``(device_arrays, finish, defer_pull)`` where
    ``finish`` maps the pulled host values to the FAD float, or None
    (caller falls back to :func:`frechet_distance`).  ``defer_pull`` is True
    in "eigdev"/"nsdev" mode: the outputs are tiny (s1 + trace + 512
    eigenvalues, or + one NS trace-sqrt scalar), so the pull should ride the
    caller's LAST coalesced transfer (zero extra round trips) instead of
    the post-embed flush.  ``cand``'s pending triple is left in place: its
    stats stay readable (the m2 pull just never happens unless someone
    asks).
    """
    if mode is None:
        mode = _fad_tail_mode()
    if mode == "host":
        return None
    with cand._pending_lock:
        if len(cand._pending) != 1:
            return None
        n, s1, m2 = cand._pending[0]
    if isinstance(m2, np.ndarray) or getattr(m2, "ndim", 0) != 2:
        return None
    d = m2.shape[0]
    if m2.shape[1] != d or n <= d:
        return None
    l = ref.chol_cov()
    if l is None or l.shape[0] != d:
        return None
    l_dev = _ref_chol_device(ref, l)
    arrs = _tail_program(d, mode, _ns_iters())(
        m2, s1, l_dev, _inv_nm1_dev(int(n))
    )

    def finish(host_vals) -> float:
        s1_h, tr_x, third = host_vals
        mu_x = np.asarray(s1_h, dtype=np.float64) / n
        mu_y = np.asarray(ref.mean, dtype=np.float64)
        a = float(np.sum(np.square(mu_x - mu_y)))
        b = float(tr_x) + float(np.trace(ref.cov))
        if mode == "nsdev":
            c = float(third)
        else:
            if mode == "eigdev":
                vals = np.asarray(third, dtype=np.float64)
            else:
                m = _unpack_tril_host(np.asarray(third), d).astype(np.float64)
                vals = np.linalg.eigvalsh(m)
            c = float(np.sqrt(np.clip(vals, 0.0, None)).sum())
        return a + b - 2.0 * c

    return arrs, finish, mode in ("eigdev", "nsdev")


def _frechet_distance(
    mu_x, sigma_x, mu_y, sigma_y, method: str = "eigh", chol_x=None
):
    mu_x = ensure_ndarray(mu_x).astype(np.float64)
    mu_y = ensure_ndarray(mu_y).astype(np.float64)
    sigma_x = ensure_ndarray(sigma_x).astype(np.float64)
    sigma_y = ensure_ndarray(sigma_y).astype(np.float64)
    a = float(np.sum(np.square(mu_x - mu_y)))
    b = float(np.trace(sigma_x) + np.trace(sigma_y))
    if method == "eigh":
        c = trace_sqrtm_product(sigma_x, sigma_y, chol_x=chol_x)
    elif method == "newton_schulz":
        c = float(_trace_sqrtm_product_ns(sigma_x, sigma_y))
    else:
        raise ValueError(f"Unknown FAD method {method!r}")
    return a + b - 2.0 * c


def frechet_distance(
    x: AudioMetricsData,
    y: AudioMetricsData,
    method: str = "eigh",
) -> float:
    """Frechet distance between the Gaussian fits of two embedding sets.

    When ``y``'s covariance has a Cholesky factor, the similarity transform
    runs on ``y``'s side (``Tr sqrt(Sx Sy) == Tr sqrt(Sy Sx)``, cyclic):
    ``y`` is the reference in every call site, so the factorization is
    cached across evaluates (:meth:`AudioMetricsData.chol_cov`).  When it
    doesn't (rank-deficient covariance, e.g. low-rank test embedders), the
    original ``x``-side orientation is kept — the eigh fallback's rounding
    on clipped near-zero eigenvalues is orientation-sensitive, and tests
    pin the original bits."""
    chol_y = y.chol_cov() if method == "eigh" and hasattr(y, "chol_cov") else None
    if chol_y is not None:
        return float(
            _frechet_distance(
                y.mean, y.cov, x.mean, x.cov, method=method, chol_x=chol_y
            )
        )
    return float(_frechet_distance(x.mean, x.cov, y.mean, y.cov, method=method))


# ----------------------------------------------------------------------
# FAD-inf (beyond-reference extension)
# ----------------------------------------------------------------------
# Plain FAD carries an O(d/N) positive sample bias: the candidate
# covariance estimated from N embeddings systematically inflates the
# distance, so FAD values at different eval-set sizes are not comparable.
# FAD-inf removes the bias the way FID-inf/KID do for images: compute the
# FAD at several subset sizes s and extrapolate linearly in 1/s to
# 1/s -> 0.  The reference library does not implement this; the key is
# exposed as ``fad_inf`` and documented as an extension (README).
#
# TPU shape: all subset statistics are computed in ONE jitted program —
# per-subset 0/1 row masks (no gathers: masked matmuls are MXU-native),
# batched similarity transforms against the cached reference Cholesky and
# a vmapped Newton-Schulz trace-sqrt.  Only (S, d) subset means and two
# (S,) scalar vectors cross the link; the intercept fit is a host
# least-squares on S points.


@lru_cache(maxsize=None)
def _fad_inf_program(d: int, s_points: int, ns_iter: int):
    import jax
    import jax.numpy as jnp

    hi = jax.lax.Precision.HIGHEST

    def run(emb, mask, counts, l):
        # emb (n, d) f32, mask (S, n) f32, counts (S,) f32, l (d, d) f32
        s1 = jnp.dot(mask, emb, precision=hi)  # (S, d)
        mu = s1 / counts[:, None]

        def subset_cov(m_row, mu_row, cnt):
            xc = (emb - mu_row[None, :]) * m_row[:, None]  # centered+masked
            return jnp.dot(xc.T, xc, precision=hi) / (cnt - 1.0)

        cov = jax.vmap(subset_cov)(mask, mu, counts)  # (S, d, d)
        tr = jnp.trace(cov, axis1=1, axis2=2)  # (S,)

        def transform(c):
            m = jnp.dot(l.T, jnp.dot(c, l, precision=hi), precision=hi)
            return _ns_trace_sqrt_sym(0.5 * (m + m.T), ns_iter)

        trsqrt = jax.vmap(transform)(cov)  # (S,)
        return mu, tr, trsqrt

    return jax.jit(run)


def fad_inf_parts(
    cand: AudioMetricsData,
    ref: AudioMetricsData,
    n_points: int = 8,
    min_frac: float = 0.25,
    seed: int = 1234,
):
    """Dispatch the FAD-inf subset sweep; returns ``(device_arrays,
    host_reduce)`` matching the lazy metric protocol (kd/prdc), or None
    when raw candidate embeddings or a reference Cholesky factor are
    unavailable (host_reduce then cannot run; the caller skips the key).

    Subset sizes are ``n_points`` distinct sizes from ``min_frac*n`` to n
    (the last point is the full set); each subset is drawn without
    replacement from ``default_rng(seed)``.  The returned reduce fits
    FAD(s) = fad_inf + c/s by least squares and emits
    ``{"fad_inf": intercept, "fad_inf_slope": c}``.
    """
    import jax.numpy as jnp

    emb = cand.embeddings_device
    if emb is None:
        e_host = cand.embeddings
        if e_host is None:
            return None
        emb = jnp.asarray(np.asarray(e_host, np.float32))
    n, d = int(emb.shape[0]), int(emb.shape[1])
    if n <= d + 1:
        return None  # subset covariances would all be rank-deficient
    l = ref.chol_cov()
    if l is None or l.shape[0] != d:
        return None
    l_dev = _ref_chol_device(ref, l)

    sizes = np.unique(
        np.round(np.linspace(max(d + 2, min_frac * n), n, n_points)).astype(
            np.int64
        )
    )
    rng = np.random.default_rng(seed)
    mask = np.zeros((len(sizes), n), np.float32)
    for i, s in enumerate(sizes):
        idx = np.arange(n) if s == n else rng.permutation(n)[:s]
        mask[i, idx] = 1.0

    run = _fad_inf_program(d, len(sizes), _ns_iters())
    arrs = run(
        jnp.asarray(emb, jnp.float32),
        jnp.asarray(mask),
        jnp.asarray(sizes, jnp.float32),
        l_dev,
    )
    mu_ref = np.asarray(ref.mean, np.float64)
    tr_ref = float(np.trace(np.asarray(ref.cov, np.float64)))

    def reduce_fn(host_arrs):
        mu_s, tr_s, trsqrt_s = (np.asarray(a, np.float64) for a in host_arrs)
        fads = (
            np.sum((mu_s - mu_ref[None, :]) ** 2, axis=1)
            + tr_s
            + tr_ref
            - 2.0 * trsqrt_s
        )
        slope, intercept = np.polyfit(1.0 / sizes.astype(np.float64), fads, 1)
        return {"fad_inf": float(intercept), "fad_inf_slope": float(slope)}

    return arrs, reduce_fn
