"""External TT import converters — the InterpolativeQTT-extension analog.

Reference: /root/reference/ext/TensorTrainNumericsInterpolativeQTTExt
(``to_ttvector``: layout permutation bridge from TensorCrossInterpolation-style
trains). Our native layout already is ``(left, phys, right)``, so the TCI
bridge is a zero-copy wrap; the Julia-reference layout needs one transpose.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ttnx.core.tt import TTOperator, TTVector

__all__ = ["to_ttvector", "from_reference_layout", "to_reference_layout"]


def to_ttvector(cores: Sequence) -> TTVector:
    """Wrap a list of external cores in ``(left, phys, right)`` layout (the
    TensorCrossInterpolation / torchtt / ttpy convention) as a ``TTVector``
    (reference to_ttvector)."""
    out = [jnp.asarray(c) for c in cores]
    for k, c in enumerate(out):
        if c.ndim != 3:
            raise ValueError(f"core {k} must be rank-3, got shape {c.shape}")
        if k > 0 and out[k - 1].shape[2] != c.shape[0]:
            raise ValueError(
                f"bond mismatch between cores {k - 1} and {k}: "
                f"{out[k - 1].shape[2]} != {c.shape[0]}")
    if out[0].shape[0] != 1 or out[-1].shape[2] != 1:
        raise ValueError("boundary ranks must be 1")
    return TTVector(out)


def from_reference_layout(cores: Sequence) -> TTVector:
    """Import cores stored in the Julia reference's ``(phys, left, right)``
    layout (/root/reference/src/tt_tools.jl:23-29)."""
    return to_ttvector([jnp.transpose(jnp.asarray(c), (1, 0, 2))
                        for c in cores])


def to_reference_layout(x: TTVector) -> list:
    """Export cores in the reference's ``(phys, left, right)`` layout."""
    return [jnp.transpose(c, (1, 0, 2)) for c in x.cores]
