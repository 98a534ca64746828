"""TT-state checkpoint / resume (the reference has no serialization at all —
SURVEY §5 build obligation).

Simple, dependency-light ``.npz`` format: one array per core plus metadata
(orthogonality flags, QTT metadata when present). Suitable for long sweeps
and time evolution restart.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ttnx.core.tt import TTOperator, TTVector

__all__ = ["save_tt", "load_tt"]


def save_tt(path: str, tt) -> None:
    """Serialize a TTVector/TTOperator (including QTT subclasses) to ``path``."""
    meta = {
        "kind": ("operator" if isinstance(tt, TTOperator) else "vector"),
        "ot": list(tt.ot),
        "n_cores": tt.N,
    }
    for attr in ("n_dims", "bits_per_dim", "ordering"):
        if hasattr(tt, attr):
            meta[attr] = getattr(tt, attr)
    arrays = {f"core_{i}": np.asarray(c) for i, c in enumerate(tt.cores)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # numpy appends .npz to the temp name
    os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)


def load_tt(path: str):
    """Restore a TT object saved by :func:`save_tt`."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        cores = [jnp.asarray(data[f"core_{i}"])
                 for i in range(meta["n_cores"])]
    ot = meta.get("ot")
    if meta["kind"] == "operator":
        out = TTOperator(cores, ot)
        if "n_dims" in meta:
            from ttnx.ops.qtt import QTTOperator

            out = QTTOperator(out, meta["n_dims"], meta["bits_per_dim"],
                              meta["ordering"])
        return out
    out = TTVector(cores, ot)
    if "n_dims" in meta:
        from ttnx.ops.qtt import QTTVector

        out = QTTVector(out, meta["n_dims"], meta["bits_per_dim"],
                        meta["ordering"])
    return out
