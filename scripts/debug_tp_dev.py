"""Debug the tp-sharded batched ALS deviation seen in dryrun_multichip."""
import os
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from __graft_entry__ import _heat_problem
from ttnx.parallel.batch import (batched_als_sweeps, make_mesh,
                                 shard_batched_problem)
from ttnx.solvers.als_scan import unpack_tt
from ttnx.core.decomp import ttv_to_tensor
from jax.sharding import NamedSharding, PartitionSpec as P

n = 8
devices = jax.devices()[:n]

A_stack, b_stack, x_stack, masks = _heat_problem(d=6, rmax=4, dtype=jnp.float64)
batch = 8
b_batch = jnp.broadcast_to(b_stack, (batch,) + b_stack.shape)
x_batch = jnp.broadcast_to(x_stack, (batch,) + x_stack.shape)

ref = jax.jit(lambda A, bb, xb, m: batched_als_sweeps(
    A, bb, xb, m, sweep_count=2))(A_stack, b_batch, x_batch, masks)

for tp in (1, 2, 4):
    mesh = make_mesh(dp=n // tp, tp=tp, devices=devices)
    A_sh, b_sh, x_sh, m_sh = shard_batched_problem(
        mesh, A_stack, b_batch, x_batch, masks)
    with mesh:
        out = jax.jit(lambda A, bb, xb, m: batched_als_sweeps(
            A, bb, xb, m, sweep_count=2))(A_sh, b_sh, x_sh, m_sh)
        out.block_until_ready()
    err_stack = float(jnp.max(jnp.abs(out - ref)))
    # compare represented tensors (gauge-free)
    rks = (1, 2, 4, 4, 4, 2, 1)
    v_ref = np.asarray(ttv_to_tensor(unpack_tt(ref[0], rks))).reshape(-1)
    v_out = np.asarray(ttv_to_tensor(unpack_tt(out[0], rks))).reshape(-1)
    err_tensor = np.linalg.norm(v_out - v_ref) / np.linalg.norm(v_ref)
    # batch-element agreement within the sharded result (inputs identical)
    intra = float(jnp.max(jnp.abs(out - out[0:1])))
    print(f"tp={tp}: stack_err={err_stack:.3e} tensor_err={err_tensor:.3e} "
          f"intra_batch={intra:.3e}")
