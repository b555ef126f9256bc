"""Orthogonalization kernels (functional, jit/shard-friendly).

Semantics parity with the reference's ``src/arnoldi/ortho.py``:

* :func:`cgs_dgks` — classical Gram-Schmidt as two tall-skinny matmuls with
  the DGKS criterion (``beta < eta * beta_before`` with ``eta = sqrt(1/2)``)
  triggering exactly one re-orthogonalization pass (reference ``ortho.py:56-107``).
  The reference rationale holds even more strongly on TPU: CGS turns the
  projection into two MXU matmuls against the whole basis, where MGS is an
  inherently sequential chain of m vector ops (Giraud/Langou/Rozložník 2005).
* :func:`mgs_dgks` — modified Gram-Schmidt variant with the same DGKS-driven
  second pass (reference ``ortho.py:9-53``), kept for capability parity and
  for numerical cross-checks.

TPU-first design differences from the reference:

* No in-place mutation; kernels are pure functions returning
  ``(h, w_ortho, beta, breakdown)``.
* Static shapes: the basis is always the full ``(n, m+1)`` workspace; the
  number of *active* columns ``n_active`` is a traced integer and inactive
  columns are masked out of the projection.  This is what lets the Arnoldi
  hot loop live inside ``lax.while_loop`` instead of Python.
* Norms/dots are computed with ``preferred_element_type=float32`` (or f64
  under x64) so bf16/low-precision bases still reduce accurately.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

#: DGKS re-orthogonalization threshold, eta = sqrt(1/2) (reference ortho.py:6).
M_SQRT1_2 = math.sqrt(0.5)

#: All projection matmuls run at HIGHEST precision: the TPU MXU defaults to
#: single-pass bfloat16 for f32 operands, which destroys orthogonality (and
#: with it the Arnoldi invariant) long before float32 eps.
_PREC = lax.Precision.HIGHEST


def _column_mask(mp1, n_active, dtype):
    return (jnp.arange(mp1) < n_active).astype(dtype)


def _norm(w):
    # jnp.linalg.norm upcasts complex -> real correctly; keep f32/f64 accum.
    return jnp.linalg.norm(w)


def cgs_dgks(V, w, n_active, *, tol=1e-8, eta=M_SQRT1_2):
    """Classical Gram-Schmidt with DGKS-controlled re-orthogonalization.

    Orthogonalizes ``w`` against the first ``n_active`` columns of ``V``.

    Parameters
    ----------
    V : (n, m+1) array — basis workspace; inactive columns are masked.
    w : (n,) array — vector to orthogonalize (same dtype family as V).
    n_active : traced int — number of valid leading columns of ``V``.
    tol : breakdown threshold on the post-orthogonalization norm.
    eta : DGKS threshold.

    Returns
    -------
    h : (m+1,) array — projection coefficients (sum of both passes), zero in
        inactive slots.
    w : (n,) array — the orthogonalized (NOT normalized) vector.
    beta : real scalar — ``||w||`` after orthogonalization.
    breakdown : bool scalar — ``beta < tol``.
    """
    mp1 = V.shape[1]
    mask = _column_mask(mp1, n_active, V.dtype)

    def project(w):
        # Tall-skinny projection: one (m+1, n) x (n,) matmul on the MXU,
        # masked to the active columns, then the rank-(m+1) update.
        c = jnp.matmul(V.conj().T, w, precision=_PREC) * mask
        return c, w - jnp.matmul(V, c, precision=_PREC)

    beta_before = _norm(w)
    c1, w1 = project(w)
    beta1 = _norm(w1)

    def second_pass(args):
        c1, w1, _ = args
        c2, w2 = project(w1)
        return c1 + c2, w2, _norm(w2)

    h, w2, beta = lax.cond(
        beta1 < eta * beta_before,
        second_pass,
        lambda args: args,
        (c1, w1, beta1),
    )
    return h, w2, beta, beta < tol


def mgs_dgks(V, w, n_active, *, tol=1e-8, eta=M_SQRT1_2):
    """Modified Gram-Schmidt with DGKS-controlled second pass.

    Same contract as :func:`cgs_dgks`.  Sequential over columns — kept for
    parity and cross-validation; prefer :func:`cgs_dgks` on TPU.
    """
    mp1 = V.shape[1]

    def one_pass(w):
        def body(i, carry):
            w, h = carry
            active = i < n_active
            v_i = lax.dynamic_slice_in_dim(V, i, 1, axis=1)[:, 0]
            c = jnp.where(
                active,
                jnp.vdot(v_i, w, precision=_PREC),
                jnp.zeros((), V.dtype),
            )
            return w - c * v_i, h.at[i].set(c)

        return lax.fori_loop(0, mp1, body, (w, jnp.zeros(mp1, V.dtype)))

    beta_before = _norm(w)
    w1, h1 = one_pass(w)
    beta1 = _norm(w1)

    def second_pass(args):
        h1, w1, _ = args
        w2, h2 = one_pass(w1)
        return h1 + h2, w2, _norm(w2)

    h, w2, beta = lax.cond(
        beta1 < eta * beta_before,
        second_pass,
        lambda args: args,
        (h1, w1, beta1),
    )
    return h, w2, beta, beta < tol


#: Registry used by solver drivers ("ortho" kwarg).
ORTHO_KERNELS = {
    "cgs_dgks": cgs_dgks,
    "mgs_dgks": mgs_dgks,
    # CGS2: unconditional double orthogonalization ("twice is enough") — the
    # recommended kernel at float32 on TPU where a single pass may lose
    # orthogonality faster than at the reference's complex128.
    "cgs2": partial(cgs_dgks, eta=jnp.inf),
    "cgs": partial(cgs_dgks, eta=0.0),
    "mgs": partial(mgs_dgks, eta=0.0),
}


def resolve_ortho(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    try:
        return ORTHO_KERNELS[name_or_fn]
    except KeyError:
        raise ValueError(
            f"Unknown orthogonalization kernel {name_or_fn!r}; expected one of "
            f"{sorted(ORTHO_KERNELS)} or a callable"
        ) from None
