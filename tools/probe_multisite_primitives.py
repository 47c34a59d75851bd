"""On-chip probe: Mosaic primitives the multisite fused kernel wants.

Run on the real TPU (no JAX_PLATFORMS override). Each probe compares a tiny
pallas_call against the XLA-computed truth and prints PASS/FAIL with the max
abs diff. Probes:

1. reshape_split    — in-kernel (1, N*128) -> (N, 128)
2. reshape_collapse — in-kernel (N, 128) -> (1, N*128)
3. bcast_sublane    — (1, 128) -> (N, 128) broadcast
4. bcast_lane       — (N, 1) -> (N, 128) broadcast
5. row_select_dot   — chunk-row read of packed buffer via masked ones-dot
6. row_mask_write   — full-buffer masked row accumulate across grid steps
7. dyn_sublane_read — buf[pl.ds(c, 1), :] dynamic sublane slice read
8. iota_mod_indicator — (128, B) indicator A[s,i]=(i%128==s) + two dots
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 64
B = N * 128


def run(name, kernel, inputs, out_shape, truth, grid=None, in_specs=None,
        out_specs=None):
    try:
        f = pl.pallas_call(
            kernel,
            grid=grid if grid is not None else (1,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )
        got = jax.jit(f)(*inputs)
        got = jax.device_get(got)
        diff = float(np.max(np.abs(np.asarray(got) - np.asarray(truth))))
        status = "PASS" if diff < 1e-5 else "FAIL"
        print(f"{name:22s} {status}  maxdiff={diff:.3e}")
    except Exception as e:  # noqa: BLE001
        print(f"{name:22s} ERROR  {type(e).__name__}: {str(e)[:120]}")


def full(shape):
    return pl.BlockSpec(shape, lambda *a: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    row = jnp.asarray(rng.normal(size=(1, B)), jnp.float32)
    mat = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
    vec = jnp.asarray(rng.normal(size=(1, 128)), jnp.float32)
    col = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    packed = jnp.asarray(rng.normal(size=(80, 128)), jnp.float32)

    # 1. (1, B) -> (N, 128) reshape (time-major split)
    def k1(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(N, 128) * 2.0

    run("reshape_split", k1, [row], jax.ShapeDtypeStruct((N, 128), jnp.float32),
        np.asarray(row).reshape(N, 128) * 2.0,
        in_specs=[full((1, B))], out_specs=full((N, 128)))

    # 2. (N, 128) -> (1, B) reshape
    def k2(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(1, B) * 2.0

    run("reshape_collapse", k2, [mat], jax.ShapeDtypeStruct((1, B), jnp.float32),
        np.asarray(mat).reshape(1, B) * 2.0,
        in_specs=[full((N, 128))], out_specs=full((1, B)))

    # 3. sublane broadcast (1, 128) -> (N, 128)
    def k3(x_ref, o_ref):
        o_ref[...] = jnp.broadcast_to(x_ref[...], (N, 128)) * 2.0

    run("bcast_sublane", k3, [vec], jax.ShapeDtypeStruct((N, 128), jnp.float32),
        np.broadcast_to(np.asarray(vec), (N, 128)) * 2.0,
        in_specs=[full((1, 128))], out_specs=full((N, 128)))

    # 4. lane broadcast (N, 1) -> (N, 128)
    def k4(x_ref, o_ref):
        o_ref[...] = jnp.broadcast_to(x_ref[...], (N, 128)) * 2.0

    run("bcast_lane", k4, [col], jax.ShapeDtypeStruct((N, 128), jnp.float32),
        np.broadcast_to(np.asarray(col), (N, 128)) * 2.0,
        in_specs=[full((N, 1))], out_specs=full((N, 128)))

    # 5. masked ones-dot row select: row c of packed (80,128) -> (1,128),
    #    grid over c; write each result to output row c via masked write
    C = 8

    def k5(p_ref, o_ref):
        c = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, 80), 1)
        sel = (rows == c).astype(jnp.float32)  # (1, 80)
        picked = jax.lax.dot_general(
            sel, p_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, 128)
        # accumulate into output row c (full-buffer masked write)
        orow = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
        prev = jnp.where((pl.program_id(0) + 1) > 0, o_ref[...], 0.0)
        first = pl.program_id(0) == 0
        base = jnp.where(first, jnp.zeros((C, 128), jnp.float32), prev)
        contrib = jnp.where(orow == c, jnp.broadcast_to(picked, (C, 128)), 0.0)
        o_ref[...] = base + contrib

    run("row_select+maskwrite", k5, [packed],
        jax.ShapeDtypeStruct((C, 128), jnp.float32),
        np.asarray(packed)[:C],
        grid=(C,), in_specs=[full((80, 128))], out_specs=full((C, 128)))

    # 7. dynamic sublane slice read
    def k7(p_ref, o_ref):
        c = pl.program_id(0)
        picked = p_ref[pl.ds(c, 1), :]  # (1, 128)
        orow = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
        first = pl.program_id(0) == 0
        base = jnp.where(first, jnp.zeros((C, 128), jnp.float32), o_ref[...])
        o_ref[...] = base + jnp.where(
            orow == c, jnp.broadcast_to(picked, (C, 128)), 0.0
        )

    run("dyn_sublane_read", k7, [packed],
        jax.ShapeDtypeStruct((C, 128), jnp.float32),
        np.asarray(packed)[:C],
        grid=(C,), in_specs=[full((80, 128))], out_specs=full((C, 128)))

    # 8. iota-mod indicator + two dots: per-sample expand + per-site reduce
    def k8(v_ref, r_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, B), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, B), 1)
        A = (jax.lax.rem(cols, 128) == rows).astype(jnp.float32)  # (128,B)
        expanded = jax.lax.dot_general(
            v_ref[...], A, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1,128)@(128,B) -> (1,B)
        prod = expanded * r_ref[...]
        site_sum = jax.lax.dot_general(
            prod, A, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1,B) x_B (128,B) -> (1,128)
        o_ref[...] = site_sum

    v_np, r_np = np.asarray(vec), np.asarray(row)
    expanded_np = v_np[0, np.arange(B) % 128][None]
    truth8 = np.zeros((1, 128), np.float32)
    np.add.at(truth8[0], np.arange(B) % 128, (expanded_np * r_np)[0])
    run("iota_mod_indicator", k8, [vec, row],
        jax.ShapeDtypeStruct((1, 128), jnp.float32), truth8,
        in_specs=[full((1, 128)), full((1, B))], out_specs=full((1, 128)))


if __name__ == "__main__":
    main()
