"""Graph position encodings: GCN over the page graph + Laplacian PE.

Model side mirrors the reference GCN (model/graph.py:6-31): two rounds of
concat(self, adjacency-aggregated) -> linear, with a null root node prepended
(the target section occupies index 0 of the adjacency built in
wikiweb2m/data.py:350-438).

Data side completes SURVEY Q4: the reference calls utils.compute_LPE /
utils.normalize_graph (data.py:434,438) but never defines them. We implement
the intended semantics: symmetric-normalized adjacency with self-loops for the
GCN, and the k smallest non-trivial eigenvectors of the normalized Laplacian
for the PE (k = 1 + max_text + max_image - 5, modelling_self_attention.py:137).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GCN(nn.Module):
    """2-layer GCN over a dense adjacency; returns embeddings minus the root."""

    output_dim: int
    hidden_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        """x: (B, N, D) neighbor embeddings; adj: (B, N+1, N+1) normalized."""
        b, n, d = x.shape
        null_root = jnp.zeros((b, 1, d), x.dtype)
        x = jnp.concatenate([null_root, x], axis=1)          # (B, N+1, D)

        dense = dict(use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        agg = jnp.einsum("bij,bjd->bid", adj.astype(x.dtype), x)
        x = nn.Dense(self.hidden_dim, name="w1", **dense)(
            jnp.concatenate([x, agg], axis=-1))
        x = jax.nn.relu(x)
        agg = jnp.einsum("bij,bjd->bid", adj.astype(x.dtype), x)
        x = nn.Dense(self.output_dim, name="w2", **dense)(
            jnp.concatenate([x, agg], axis=-1))
        return x[:, 1:, :]


def edges_to_dense_adjacency(edge_list: List[Tuple[int, int]],
                             node_num: int) -> np.ndarray:
    """Symmetric dense adjacency from the page-graph edge list (numpy, host)."""
    adj = np.zeros((node_num, node_num), np.float32)
    for a, b in edge_list:
        if a < node_num and b < node_num:
            adj[a, b] = 1.0
            adj[b, a] = 1.0
    return adj


def normalize_graph(adj: np.ndarray) -> np.ndarray:
    """D^-1/2 (A + I) D^-1/2 — the intended utils.normalize_graph (Q4)."""
    a = adj + np.eye(adj.shape[0], dtype=adj.dtype)
    deg = a.sum(axis=1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    return (a * d_inv_sqrt[:, None]) * d_inv_sqrt[None, :]


def compute_laplacian_pe(adj: np.ndarray, k: int) -> np.ndarray:
    """k smallest non-trivial eigenvectors of the sym-normalized Laplacian.

    Returns (node_num, k) with deterministic sign (first nonzero entry >= 0).
    The intended utils.compute_LPE (Q4).
    """
    n = adj.shape[0]
    deg = adj.sum(axis=1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    lap = np.eye(n, dtype=np.float32) - (
        (adj * d_inv_sqrt[:, None]) * d_inv_sqrt[None, :])
    # isolated nodes: D=0 rows become identity rows, eigvec support still fine
    vals, vecs = np.linalg.eigh(lap.astype(np.float64))
    order = np.argsort(vals)
    vecs = vecs[:, order][:, 1 : k + 1]               # drop the trivial mode
    if vecs.shape[1] < k:                             # tiny graphs: pad zeros
        vecs = np.pad(vecs, ((0, 0), (0, k - vecs.shape[1])))
    # sign convention for determinism
    for j in range(vecs.shape[1]):
        col = vecs[:, j]
        nz = np.flatnonzero(np.abs(col) > 1e-9)
        if nz.size and col[nz[0]] < 0:
            vecs[:, j] = -col
    return vecs.astype(np.float32)
