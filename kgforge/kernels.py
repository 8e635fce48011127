"""A7–A10 — translational-distance kernels as vectorized NumPy.

Score = distance: lower is better (a plausible triple has h + r ≈ t).
Semantics follow the reference models (OpenKEonSpark/OpenKE
``TransE.py/TransH.py/TransR.py/TransD.py::_calc``, recalled symbols —
SURVEY.md §0):

* TransE (Bordes 2013): ``f = ‖h + r − t‖_{1|2}``
* TransH (Wang 2014): project onto the relation hyperplane first,
  ``e⊥ = e − (wᵀe)w`` with unit normal ``w``.
* TransR (Lin 2015): map to relation space, ``e_r = M_r e``.
* TransD (Ji 2015): dynamic rank-1 map, ``e⊥ = e + (e_pᵀe) r_p``
  (the ``M = r_p e_pᵀ + I`` trick — never materializes the matrix).

All functions take ``[B, d]`` batches and return ``[B]`` float32 scores.
These run inside Arrow-batched pandas UDFs with embedding matrices
broadcast once per executor — never a per-row Python loop.
"""

from __future__ import annotations

import numpy as np

NORMS = (1, 2)


def _dist(x: np.ndarray, norm: int) -> np.ndarray:
    if norm == 1:
        return np.abs(x).sum(axis=-1)
    return np.sqrt((x * x).sum(axis=-1))


def transe(h: np.ndarray, r: np.ndarray, t: np.ndarray, norm: int = 1) -> np.ndarray:
    return _dist(h + r - t, norm)


def _hyperplane(e: np.ndarray, w: np.ndarray) -> np.ndarray:
    # e - (w·e) w ; w assumed unit-norm per relation
    return e - (e * w).sum(axis=-1, keepdims=True) * w


def transh(h: np.ndarray, r: np.ndarray, t: np.ndarray, w: np.ndarray, norm: int = 1) -> np.ndarray:
    """``w``: [B, d] per-row relation normal vectors (unit norm)."""
    return _dist(_hyperplane(h, w) + r - _hyperplane(t, w), norm)


def transr(h: np.ndarray, r: np.ndarray, t: np.ndarray, m: np.ndarray, norm: int = 1) -> np.ndarray:
    """``m``: [B, d_r, d_e] per-row transfer matrices."""
    h_r = np.einsum("bij,bj->bi", m, h)
    t_r = np.einsum("bij,bj->bi", m, t)
    return _dist(h_r + r - t_r, norm)


def transd(
    h: np.ndarray, r: np.ndarray, t: np.ndarray,
    h_p: np.ndarray, t_p: np.ndarray, r_p: np.ndarray,
    norm: int = 1,
) -> np.ndarray:
    """Rank-1 dynamic projection; ``*_p`` are [B, d] projection vectors."""
    h_proj = h + (h_p * h).sum(axis=-1, keepdims=True) * r_p
    t_proj = t + (t_p * t).sum(axis=-1, keepdims=True) * r_p
    return _dist(h_proj + r - t_proj, norm)


def score_batch(
    model: str,
    emb: dict[str, np.ndarray],
    h_ids: np.ndarray,
    r_ids: np.ndarray,
    t_ids: np.ndarray,
    norm: int = 1,
) -> np.ndarray:
    """Gather rows from broadcast embedding tables and score.

    ``emb`` keys: ent, rel (+ norm for TransH, mat for TransR,
    ent_p/rel_p for TransD) — the frozen-parameter layout of
    fixtures.gen_embeddings / the OpenKE checkpoint import.
    """
    # float64 throughout: rank semantics use strict < on scores, and the
    # SQL/NumPy oracles compute in double — upcasting removes f32 near-tie
    # rank flips (outputs follow input dtype otherwise).
    h = emb["ent"][h_ids].astype(np.float64)
    t = emb["ent"][t_ids].astype(np.float64)
    r = emb["rel"][r_ids].astype(np.float64)
    if model == "transe":
        return transe(h, r, t, norm)
    if model == "transh":
        return transh(h, r, t, emb["norm"][r_ids].astype(np.float64), norm)
    if model == "transr":
        return transr(h, r, t, emb["mat"][r_ids].astype(np.float64), norm)
    if model == "transd":
        return transd(
            h, r, t,
            emb["ent_p"][h_ids].astype(np.float64),
            emb["ent_p"][t_ids].astype(np.float64),
            emb["rel_p"][r_ids].astype(np.float64),
            norm,
        )
    raise ValueError(f"unknown model {model!r}")


#: margin ranking loss (A11) — not on the parity-critical path; used by the
#: optional NumPy training loop to produce fixture embeddings.
def margin_loss(pos_scores: np.ndarray, neg_scores: np.ndarray, margin: float) -> float:
    return float(np.maximum(0.0, margin + pos_scores - neg_scores).sum())
