"""Experiment: projection sort variants for the headline scan path.

The multi-key sort in `ops.projection.spherical_projection` is one of the
remaining e2e costs (stage breakdown: ~1.7-3 ms/scan).  This measures, at
the production shape (N=131072 padded points, 64x2048 grid):

  A. current:  lax.sort((flat_i32, r_f32, idx_i32), num_keys=2)
  B. u64 pack: key = flat<<32 | bits(r); lax.sort((key_u64, idx_i32), 1 key)
               (exact: r >= 0 so the IEEE bit pattern is order-preserving)
  C. u32 keys: lax.sort((flat_i32, bits(r)_u32, idx_i32), num_keys=2)
  D. scatter-min of packed u64 (r_bits<<17 | idx), no sort at all
  E. full spherical_projection (current) for context

Slope-timed per the bench.py methodology (chained fori_loop, slope between
1 and N+1 iterations cancels the tunnel RPC constant).

Run on TPU: python tools/exp_projection_sort.py
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)  # u64 keys in variants B/D
import jax.numpy as jnp

N = 1 << 17
H, W = 64, 2048
HW = H * W
N_ITERS = 30


def timed_slope(fn, n_iters=N_ITERS):
    def timed(n):
        t0 = time.perf_counter()
        int(fn(jnp.asarray(n)))
        return time.perf_counter() - t0
    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(n_iters + 1) for _ in range(3))
    return (tn - t1) / n_iters


def chain(body, init):
    @jax.jit
    def fn(n):
        out = jax.lax.fori_loop(0, n, body, init)
        return jax.tree_util.tree_reduce(
            lambda a, l: a + l.sum().astype(jnp.float32), out,
            jnp.float32(0)).astype(jnp.int32)
    return fn


def main():
    from semanticlidarunc_tpu.dataset.synthetic import make_scan
    from semanticlidarunc_tpu.ops.projection import (
        pad_points, projection_indices, spherical_projection)

    pc = make_scan(seed=0, n_beams=64, n_azimuth=2048)
    pts_np, valid_np = pad_points(pc, N)
    points = jnp.asarray(pts_np[:, :4])
    valid = jnp.asarray(valid_np)

    flat0 = projection_indices(points[:, :3], valid, H, W)
    r0 = jnp.linalg.norm(points[:, :3], axis=-1)
    r0 = jnp.where(valid, r0, jnp.inf)
    idx0 = jnp.arange(N, dtype=jnp.int32)

    results = {}
    only = [s for s in os.environ.get("EXP_ONLY", "").split(",") if s]

    def want(name):
        return not only or any(name.startswith(p) for p in only)

    # A. current 3-operand 2-key sort
    def body_a(i, carry):
        flat, r = carry
        fs, rs, ids = jax.lax.sort((flat, r, idx0), num_keys=2)
        return (flat + ids[0] * 0, r + rs[0] * 1e-12)
    if want("A_sort_cur"):
        results["A_sort_cur"] = timed_slope(chain(body_a, (flat0, r0)))

    # B. u64 packed single-key sort
    def body_b(i, carry):
        flat, r = carry
        key = (flat.astype(jnp.uint64) << 32) | \
            jax.lax.bitcast_convert_type(r, jnp.uint32).astype(jnp.uint64)
        ks, ids = jax.lax.sort((key, idx0), num_keys=1)
        return (flat + ids[0] * 0, r + ks[0].astype(jnp.float32) * 1e-12)
    if want("B_sort_u64"):
        results["B_sort_u64"] = timed_slope(chain(body_b, (flat0, r0)))

    # C. u32-bitcast range key (compare ints not floats)
    def body_c(i, carry):
        flat, r = carry
        rb = jax.lax.bitcast_convert_type(r, jnp.uint32)
        fs, rs, ids = jax.lax.sort((flat, rb, idx0), num_keys=2)
        return (flat + ids[0] * 0, r + rs[0].astype(jnp.float32) * 1e-12)
    if want("C_sort_u32key"):
        results["C_sort_u32key"] = timed_slope(chain(body_c, (flat0, r0)))

    # D. scatter-min, no sort
    def body_d(i, carry):
        flat, r = carry
        packed = (jax.lax.bitcast_convert_type(r, jnp.uint32)
                  .astype(jnp.uint64) << 17) | idx0.astype(jnp.uint64)
        grid = jnp.full((HW + 1,), jnp.uint64(0xFFFFFFFFFFFFFFFF))
        grid = grid.at[jnp.minimum(flat, HW)].min(packed, mode="drop")
        return (flat + (grid[0] & 1).astype(jnp.int32) * 0,
                r + grid[1].astype(jnp.float32) * 1e-12)
    if want("D_scatter_min"):
        results["D_scatter_min"] = timed_slope(chain(body_d, (flat0, r0)))

    # E. full projection for context
    def body_e(i, pts):
        img = spherical_projection(pts, valid, H, W)
        return pts + img.sum() * 1e-12
    if want("E_full_proj"):
        results["E_full_proj"] = timed_slope(chain(body_e, points))

    # F. projection_indices only (digitize etc)
    def body_f(i, pts):
        flat = projection_indices(pts[:, :3], valid, H, W)
        return pts + flat.sum().astype(pts.dtype) * 1e-12
    if want("F_indices_only"):
        results["F_indices_only"] = timed_slope(chain(body_f, points))

    # G. scatter only: (HW+1, 4) row scatter with precomputed dest
    fs0, rs0, ids0 = jax.lax.sort((flat0, r0, idx0), num_keys=2)
    first0 = jnp.concatenate([jnp.ones((1,), bool), fs0[1:] != fs0[:-1]])
    dest0 = jnp.where(first0 & (fs0 < HW), fs0, HW).astype(jnp.int32)

    def body_g(i, carry):
        dest, ids = carry
        img = jnp.zeros((HW + 1, 4), jnp.float32)
        img = img.at[dest].set(points[ids], mode="drop")
        return (dest + (img[0, 0] * 0).astype(jnp.int32), ids)
    if want("G_scatter_only"):
        results["G_scatter_only"] = timed_slope(chain(body_g, (dest0, ids0)))

    # H. gather-based winner materialization: scatter 1 int col, gather rows
    def body_h(i, carry):
        flat, r = carry
        rb = jax.lax.bitcast_convert_type(r, jnp.uint32)
        fs, rs, ids = jax.lax.sort((flat, rb, idx0), num_keys=2)
        first = jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
        dest = jnp.where(first & (fs < HW), fs, HW)
        start = jnp.full((HW + 1,), N, jnp.int32)
        start = start.at[dest].set(idx0, mode="drop")[:HW]   # run-start pos
        win_src = ids[jnp.minimum(start, N - 1)]
        pix = jnp.take(points, win_src, axis=0)
        img = jnp.where((start < N)[:, None], pix, 0.0)
        return (flat + (img[0, 0] * 0).astype(jnp.int32), r + img.sum() * 1e-12)
    if want("H_gather_variant"):
        results["H_gather_variant"] = timed_slope(chain(body_h, (flat0, r0)))

    # I. unique-indices scatter: non-winners get distinct dump slots past HW
    def body_i(i, carry):
        flat, r = carry
        rb = jax.lax.bitcast_convert_type(r, jnp.uint32)
        fs, rs, ids = jax.lax.sort((flat, rb, idx0), num_keys=2)
        first = jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
        winner = first & (fs < HW)
        dest = jnp.where(winner, fs, HW + idx0)
        img = jnp.zeros((HW + N, 4), jnp.float32)
        img = img.at[dest].set(points[ids], mode="drop",
                               unique_indices=True)
        img = img[:HW]
        return (flat + (img[0, 0] * 0).astype(jnp.int32),
                r + img.sum() * 1e-12)
    if want("I_scatter_uniq"):
        results["I_scatter_uniq"] = timed_slope(chain(body_i, (flat0, r0)))

    # J. unique scatter of presorted rows (rows carried through the sort)
    def body_j(i, carry):
        flat, r = carry
        rb = jax.lax.bitcast_convert_type(r, jnp.uint32)
        ops = jax.lax.sort(
            (flat, rb, points[:, 0], points[:, 1], points[:, 2],
             points[:, 3]), num_keys=2)
        fs = ops[0]
        first = jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
        winner = first & (fs < HW)
        dest = jnp.where(winner, fs, HW + idx0)
        rows = jnp.stack(ops[2:], axis=-1)
        img = jnp.zeros((HW + N, 4), jnp.float32)
        img = img.at[dest].set(rows, mode="drop", unique_indices=True)
        img = img[:HW]
        return (flat + (img[0, 0] * 0).astype(jnp.int32),
                r + img.sum() * 1e-12)
    if want("J_sortrows_uniq"):
        results["J_sortrows_uniq"] = timed_slope(chain(body_j, (flat0, r0)))

    for k, v in results.items():
        print(f"{k:16s} {v * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
