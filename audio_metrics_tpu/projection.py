"""Incremental PCA projection.

Counterpart of reference src/audio_metrics/projection.py:6-46, which wraps
``sklearn.decomposition.IncrementalPCA`` and returns torch tensors from
``transform``.  This is a dependency-free reimplementation of the same
algorithm (Ross et al. incremental SVD update, identical to sklearn's
``partial_fit`` math including the ``svd_flip(u_based_decision=False)`` sign
convention), validated against sklearn in tests/test_projection.py.

Fitting runs on host in float64 (it happens once per reference set); the
``transform`` — the per-evaluate hot path — is a single ``(N, d) @ (d, k)``
matmul executed on device in float32 when N is large.
"""

from __future__ import annotations

import numpy as np

from .data import ensure_ndarray

__all__ = ["IncrementalPCA"]

# device transform pays off only past this many rows
_DEVICE_TRANSFORM_MIN_ROWS = 4096


def _svd_flip_vt(u: np.ndarray, vt: np.ndarray):
    """Deterministic SVD signs based on rows of vt (sklearn svd_flip,
    u_based_decision=False)."""
    max_abs_rows = np.argmax(np.abs(vt), axis=1)
    signs = np.sign(vt[np.arange(vt.shape[0]), max_abs_rows])
    signs[signs == 0] = 1.0
    u = u * signs[np.newaxis, :]
    vt = vt * signs[:, np.newaxis]
    return u, vt


class IncrementalPCA:
    def __init__(self, n_components: int | None = None, whiten: bool = False):
        self.n_components = n_components
        self.whiten = whiten

    # -- fitting -------------------------------------------------------
    def _is_fitted(self) -> bool:
        return hasattr(self, "components_") and self.components_ is not None

    def partial_fit(self, X) -> "IncrementalPCA":
        X = ensure_ndarray(X).astype(np.float64, copy=True)
        if X.ndim != 2:
            raise ValueError("X must be 2-D")
        n_samples, n_features = X.shape

        first_pass = not self._is_fitted()
        if self.n_components is None:
            n_components = (
                min(n_samples, n_features)
                if first_pass
                else self.components_.shape[0]
            )
        else:
            if self.n_components > n_features:
                raise ValueError(
                    f"n_components={self.n_components} invalid for "
                    f"n_features={n_features}"
                )
            if first_pass and self.n_components > n_samples:
                raise ValueError(
                    f"n_components={self.n_components} must be <= batch size "
                    f"{n_samples} for the first partial_fit call."
                )
            n_components = self.n_components
        self.n_components_ = n_components

        if first_pass:
            self.n_samples_seen_ = 0
            self.mean_ = np.zeros(n_features)
            self.var_ = np.zeros(n_features)

        # incremental mean / variance (Chan, Golub, LeVeque)
        last_count = float(self.n_samples_seen_)
        last_sum = self.mean_ * last_count
        new_sum = X.sum(axis=0)
        new_count = float(n_samples)
        total_count = last_count + new_count
        col_mean = (last_sum + new_sum) / total_count

        t = new_sum / new_count
        temp = X - t
        correction = temp.sum(axis=0)
        new_unnorm_var = (temp**2).sum(axis=0) - correction**2 / new_count
        if last_count == 0:
            updated_unnorm_var = new_unnorm_var
        else:
            last_unnorm_var = self.var_ * last_count
            last_over_new = last_count / new_count
            updated_unnorm_var = (
                last_unnorm_var
                + new_unnorm_var
                + last_over_new
                / total_count
                * (last_sum / last_over_new - new_sum) ** 2
            )
        col_var = updated_unnorm_var / total_count

        if self.n_samples_seen_ == 0:
            X -= col_mean
        else:
            col_batch_mean = X.mean(axis=0)
            X -= col_batch_mean
            mean_correction = np.sqrt(
                (self.n_samples_seen_ / total_count) * n_samples
            ) * (self.mean_ - col_batch_mean)
            X = np.vstack(
                (
                    self.singular_values_.reshape((-1, 1)) * self.components_,
                    X,
                    mean_correction,
                )
            )

        u, s, vt = np.linalg.svd(X, full_matrices=False)
        u, vt = _svd_flip_vt(u, vt)
        explained_variance = s**2 / (total_count - 1)
        explained_variance_ratio = s**2 / np.sum(col_var * total_count)

        self.n_samples_seen_ = int(total_count)
        self.components_ = vt[:n_components]
        self.singular_values_ = s[:n_components]
        self.mean_ = col_mean
        self.var_ = col_var
        self.explained_variance_ = explained_variance[:n_components]
        self.explained_variance_ratio_ = explained_variance_ratio[:n_components]
        if n_components not in (n_samples, n_features):
            self.noise_variance_ = float(explained_variance[n_components:].mean())
        else:
            self.noise_variance_ = 0.0
        return self

    def fit(self, X) -> "IncrementalPCA":
        return self.partial_fit(X)

    # -- transform -----------------------------------------------------
    def transform(self, X) -> np.ndarray:
        """Project onto the principal components; returns float32 numpy.

        Reference returns a torch tensor (projection.py:20-21); downstream
        code here is numpy/jax-native so we return an ndarray.
        """
        if not self._is_fitted():
            raise RuntimeError("IncrementalPCA is not fitted")
        X = ensure_ndarray(X)
        if X.shape[0] >= _DEVICE_TRANSFORM_MIN_ROWS:
            import jax.numpy as jnp

            xd = jnp.asarray(X, dtype=jnp.float32)
            mean = jnp.asarray(self.mean_, dtype=jnp.float32)
            comp = jnp.asarray(self.components_, dtype=jnp.float32)
            out = jnp.dot(xd - mean, comp.T, preferred_element_type=jnp.float32)
            if self.whiten:
                out = out / jnp.sqrt(
                    jnp.asarray(self.explained_variance_, dtype=jnp.float32)
                )
            return np.asarray(out)
        out = (X.astype(np.float64) - self.mean_) @ self.components_.T
        if self.whiten:
            out = out / np.sqrt(self.explained_variance_)
        return out.astype(np.float32)

    # -- serialization (reference projection.py:23-46) ------------------
    _state_arrays = (
        "components_",
        "mean_",
        "var_",
        "singular_values_",
        "explained_variance_",
        "explained_variance_ratio_",
    )
    _state_scalars = (
        "n_components",
        "n_components_",
        "n_samples_seen_",
        "noise_variance_",
        "whiten",
    )

    def __getstate__(self) -> dict:
        state = {}
        for k in self._state_arrays:
            if hasattr(self, k):
                state[k] = np.asarray(getattr(self, k))
        for k in self._state_scalars:
            if hasattr(self, k):
                state[k] = getattr(self, k)
        return state

    def __setstate__(self, state: dict) -> None:
        for k, v in state.items():
            if k in self._state_arrays:
                setattr(self, k, np.asarray(v, dtype=np.float64))
            else:
                setattr(self, k, v)
