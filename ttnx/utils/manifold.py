"""TT-manifold optimization utilities — the Manopt-extension analog.

Reference: /root/reference/ext/TensorTrainNumericsManoptExt (flat-space
manifold with projection retraction ``orthogonalize(p + t X)``). Here the
same geometry plus a Riemannian gradient-descent driver; since ``TTVector`` is
a JAX pytree, ``jax.grad`` provides the Euclidean gradient natively (the
ChainRulesCore-extension analog) and optax optimizers apply directly.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ttnx.core import algebra
from ttnx.core.canonical import orthogonalize, tt_round
from ttnx.core.tt import TTVector

__all__ = [
    "inner",
    "manifold_norm",
    "distance",
    "zero_vector",
    "retract",
    "ttvector_manifold",
    "manifold_gradient_descent",
    "rayleigh_quotient",
]


def inner(p: TTVector, X: TTVector, Y: TTVector):
    """Flat-space inner product ``<X, Y>`` at base point ``p``
    (reference ManoptExt inner)."""
    del p
    return algebra.dot(X, Y)


def manifold_norm(p: TTVector, X: TTVector):
    return algebra.norm(X)


def distance(p: TTVector, q: TTVector):
    return algebra.euclidean_distance(p, q)


def zero_vector(p: TTVector) -> TTVector:
    from ttnx.core.tt import zeros_tt

    return zeros_tt(p.dims, p.ranks, dtype=p.dtype)


def retract(p: TTVector, X: TTVector, t: float = 1.0,
            max_bond: int | None = None) -> TTVector:
    """Projection retraction: orthogonalize (optionally round) ``p + t X``
    (reference ManoptExt retraction)."""
    moved = algebra.add(p, algebra.scale(t, X))
    if max_bond is not None:
        return tt_round(moved, max_bond=max_bond)
    return orthogonalize(moved, 0)


class TTVectorSpace:
    """Minimal manifold object bundling the operations above
    (reference ``TTVectorSpace <: AbstractManifold``)."""

    def __init__(self, template: TTVector):
        self.dims = template.dims
        self.ranks = template.ranks

    inner = staticmethod(inner)
    norm = staticmethod(manifold_norm)
    distance = staticmethod(distance)
    zero_vector = staticmethod(zero_vector)
    retract = staticmethod(retract)


def ttvector_manifold(x: TTVector) -> TTVectorSpace:
    """(reference entry point ``ttvector_manifold``)"""
    return TTVectorSpace(x)


def rayleigh_quotient(A) -> Callable[[TTVector], jax.Array]:
    """``x -> <x, A x> / <x, x>`` — the energy functional whose gradient
    descent reproduces the reference's AD/Manopt workloads
    (/root/reference/test/test_ad.jl:116, test_manopt.jl:107)."""

    def cost(x: TTVector):
        num = jnp.real(algebra.dot(x, algebra.matvec(A, x)))
        den = jnp.real(algebra.dot(x, x))
        return num / den

    return cost


def manifold_gradient_descent(cost: Callable, x0: TTVector, steps: int = 100,
                              lr: float = 0.05, max_bond: int | None = None,
                              tol: float = 0.0):
    """Riemannian gradient descent with projection retraction and
    backtracking line search (monotone descent; the step grows back between
    iterations — the reference's AD descent strategy,
    /root/reference/test/test_ad.jl:140-153).

    ``cost`` maps a TTVector to a real scalar and must be jax-differentiable
    (everything in ttnx.core.algebra is). Returns ``(x, history)``.
    """
    x = orthogonalize(x0, 0)
    value_and_grad = jax.value_and_grad(cost)
    history = []
    alpha = lr
    prev = float(cost(x))

    def step_cores(x, g, a):
        # the gradient lives in CORE space (the TT map is multilinear), so the
        # descent step is per-core — NOT TT-vector addition of the gradient
        return TTVector([c - a * gc for c, gc in zip(x.cores, g.cores)], x.ot)

    for _ in range(steps):
        _, g = value_and_grad(x)
        x_try = step_cores(x, g, alpha)
        val = float(cost(x_try))
        while val > prev and alpha > 1e-12:
            alpha /= 2
            x_try = step_cores(x, g, alpha)
            val = float(cost(x_try))
        x = x_try
        if max_bond is not None:
            x = tt_round(x, max_bond=max_bond)
        history.append(val)
        if tol > 0 and abs(prev - val) < tol:
            break
        prev = val
        alpha *= 1.5
    return x, np.asarray(history)
