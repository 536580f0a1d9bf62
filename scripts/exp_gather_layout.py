"""A/B the [P, 30] bf16 pair-gather layout pathology at reference scale.

At N=2M/P=8M, XLA layout assignment flips the gather output (and the
table chain above it) to the transposed {0,1} layout to avoid the
post-gather transpose copy — but a {0,1} row gather writes 30 strided
2-byte elements per row: measured 136 ms vs the ~13 ms the bf16
row-gather rate implies. This script xplane-times isolated variants of
gather+reconstruct+transpose to find a formulation whose layouts stay
row-major at scale:

  v1_sublane : gather -> .T -> sublane-block adds   (round-3 original)
  v2_dot     : gather -> [P,30]@[30,16] dot -> .T   (round-4 attempt)
  v3_barrier : gather -> optimization_barrier -> v1
  v4_reshape : gather -> reshape(P*30) -> reshape back -> v1
  v5_u32     : uint32-packed table ([N,15] u32 rows), gather, bitcast
               to bf16 pairs -> v1 (bitcast pins physical adjacency)

    python -u scripts/exp_gather_layout.py --n 2000000 --p 8000000
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def device_ms(fn, args, iters, tag, tbase):
    import jax
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    jax.block_until_ready(fn(*args))
    d = os.path.join(tbase, tag)
    jax.profiler.start_trace(d)
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    jax.profiler.stop_trace()
    pbs = sorted(glob.glob(d + "/**/*.xplane.pb", recursive=True))
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(float)
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[meta[ev.metadata_id].name] += ev.duration_ps / 1e9
    tot = sum(agg.values()) / iters
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:3]
    return tot, [(round(ms / iters, 2), name[:72]) for ms, name in
                 ((v, k) for k, v in top)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--p", type=int, default=8_000_000)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.ops.rasterizer.bf16_transport import (
        PACK_TERMS, N_PACK_COLS, reconstruct_rows, term_sum_matrix,
        exact_term_dot, _split_table)
    from multiview_inpaint_tpu.ops.rasterizer.segment_reduce import (
        safe_gather)

    n, p = args.n, args.p
    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.normal(0, 100, (n, 16)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, n + 1, p).astype(np.int32))
    tbase = tempfile.mkdtemp(prefix="gl_")

    def table():
        split_bf = _split_table(packed)
        return jnp.concatenate(
            [split_bf, jnp.zeros((1, split_bf.shape[1]), jnp.bfloat16)])

    @jax.jit
    def v1_sublane(packed, gid):
        pairs = safe_gather(table(), gid)
        return reconstruct_rows(pairs.T, PACK_TERMS, N_PACK_COLS)

    @jax.jit
    def v2_dot(packed, gid):
        pairs = safe_gather(table(), gid)
        return exact_term_dot(
            pairs, term_sum_matrix(PACK_TERMS, N_PACK_COLS)).T

    @jax.jit
    def v3_barrier(packed, gid):
        pairs = jax.lax.optimization_barrier(safe_gather(table(), gid))
        return reconstruct_rows(pairs.T, PACK_TERMS, N_PACK_COLS)

    @jax.jit
    def v4_reshape(packed, gid):
        pairs = safe_gather(table(), gid)
        lanes = pairs.shape[1]
        pairs = pairs.reshape(-1).reshape(-1, lanes)
        return reconstruct_rows(pairs.T, PACK_TERMS, N_PACK_COLS)

    @jax.jit
    def v5_u32(packed, gid):
        t = table()                                   # [N+1, 30]
        u32 = jax.lax.bitcast_convert_type(
            t.reshape(t.shape[0], 15, 2), jnp.uint32)  # [N+1, 15]
        g = safe_gather(u32, gid)                      # [P, 15]
        pairs = jax.lax.bitcast_convert_type(
            g, jnp.bfloat16).reshape(g.shape[0], 30)
        return reconstruct_rows(pairs.T, PACK_TERMS, N_PACK_COLS)

    ref = None
    for name, fn in [("v1_sublane", v1_sublane), ("v2_dot", v2_dot),
                     ("v3_barrier", v3_barrier),
                     ("v4_reshape", v4_reshape), ("v5_u32", v5_u32)]:
        out = np.asarray(fn(packed, gid))
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(out, ref, err_msg=name)
        tot, top = device_ms(fn, (packed, gid), args.iters, name, tbase)
        print(f"{name}: {tot:7.2f} ms   top: {top}", flush=True)


if __name__ == "__main__":
    main()


def extra_variants():
    """v6: explicit layout constraints (jax.experimental.layout) on the
    table and the gather output."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--p", type=int, default=8_000_000)
    ap.add_argument("--iters", type=int, default=5)
    args, _ = ap.parse_known_args()

    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Layout, with_layout_constraint

    from multiview_inpaint_tpu.ops.rasterizer.bf16_transport import (
        PACK_TERMS, N_PACK_COLS, reconstruct_rows, _split_table)
    from multiview_inpaint_tpu.ops.rasterizer.segment_reduce import (
        safe_gather)

    n, p = args.n, args.p
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(0, 100, (n, 16)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, n + 1, p).astype(np.int32))
    tbase = tempfile.mkdtemp(prefix="gl2_")
    rm = Layout(major_to_minor=(0, 1))

    @jax.jit
    def v6_constraint(packed, gid):
        split_bf = _split_table(packed)
        t = jnp.concatenate(
            [split_bf, jnp.zeros((1, split_bf.shape[1]), jnp.bfloat16)])
        t = with_layout_constraint(t, rm)
        pairs = with_layout_constraint(safe_gather(t, gid), rm)
        return reconstruct_rows(pairs.T, PACK_TERMS, N_PACK_COLS)

    @jax.jit
    def v7_constraint_gather_only(packed, gid):
        split_bf = _split_table(packed)
        t = jnp.concatenate(
            [split_bf, jnp.zeros((1, split_bf.shape[1]), jnp.bfloat16)])
        pairs = with_layout_constraint(safe_gather(t, gid), rm)
        return reconstruct_rows(pairs.T, PACK_TERMS, N_PACK_COLS)

    for name, fn in [("v6_constraint", v6_constraint),
                     ("v7_gather_only", v7_constraint_gather_only)]:
        tot, top = device_ms(fn, (packed, gid), args.iters, name, tbase)
        print(f"{name}: {tot:7.2f} ms   top: {top}", flush=True)


if __name__ == "__main__" and os.environ.get("EXTRA"):
    extra_variants()


def extra_variants2():
    """v8: layout constraint + dot consumer; v10: 128-lane padded table
    (one exact lane-tile per row -> no padding ambiguity, {1,0} is the
    only sensible layout) + [P,128]@[128,16] dot."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--p", type=int, default=8_000_000)
    ap.add_argument("--iters", type=int, default=5)
    args, _ = ap.parse_known_args()
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Layout, with_layout_constraint

    from multiview_inpaint_tpu.ops.rasterizer.bf16_transport import (
        PACK_TERMS, N_PACK_COLS, term_sum_matrix, exact_term_dot,
        reconstruct_rows, _split_table)
    from multiview_inpaint_tpu.ops.rasterizer.segment_reduce import (
        safe_gather)

    n, p = args.n, args.p
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(0, 100, (n, 16)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, n + 1, p).astype(np.int32))
    tbase = tempfile.mkdtemp(prefix="gl3_")
    rm = Layout(major_to_minor=(0, 1))

    @jax.jit
    def v8_constraint_dot(packed, gid):
        split_bf = _split_table(packed)
        t = jnp.concatenate(
            [split_bf, jnp.zeros((1, split_bf.shape[1]), jnp.bfloat16)])
        t = with_layout_constraint(t, rm)
        pairs = with_layout_constraint(safe_gather(t, gid), rm)
        return exact_term_dot(
            pairs, term_sum_matrix(PACK_TERMS, N_PACK_COLS)).T

    @jax.jit
    def v10_pad128_dot(packed, gid):
        split_bf = _split_table(packed)                 # [N, 30]
        lanes = split_bf.shape[1]
        t = jnp.pad(split_bf, ((0, 1), (0, 128 - lanes)))
        pairs = safe_gather(t, gid)                     # [P, 128]
        m = jnp.pad(term_sum_matrix(PACK_TERMS, N_PACK_COLS),
                    ((0, 128 - lanes), (0, 0)))
        return exact_term_dot(pairs, m).T

    @jax.jit
    def v11_pad128_sublane(packed, gid):
        split_bf = _split_table(packed)
        lanes = split_bf.shape[1]
        t = jnp.pad(split_bf, ((0, 1), (0, 128 - lanes)))
        pairs = safe_gather(t, gid)[:, :lanes]
        return reconstruct_rows(pairs.T, PACK_TERMS, N_PACK_COLS)

    ref = None
    for name, fn in [("v8_constraint_dot", v8_constraint_dot),
                     ("v10_pad128_dot", v10_pad128_dot),
                     ("v11_pad128_sublane", v11_pad128_sublane)]:
        out = np.asarray(fn(packed, gid))
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(out, ref, err_msg=name)
        tot, top = device_ms(fn, (packed, gid), args.iters, name, tbase)
        print(f"{name}: {tot:7.2f} ms   top: {top}", flush=True)
