"""On-chip probe round 2: EXACT (non-MXU) row select/accumulate patterns.

1. row_select_sum  — picked row c via masked sublane jnp.sum (must be EXACT)
2. row_mask_update — carried packed buffer updated one row per grid step via
                     full-buffer where(row==c, new, old); exactness across a
                     sequential grid
3. chunk_chain     — end-to-end mini chain: select row -> sublane-broadcast
                     -> elementwise -> reduce back -> masked accumulate
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 64
C = 8  # grid length / packed rows exercised


def full(shape):
    return pl.BlockSpec(shape, lambda *a: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def run(name, kernel, inputs, out_shape, truth, grid, in_specs, out_specs,
        tol=0.0):
    try:
        f = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                           out_specs=out_specs, out_shape=out_shape)
        got = jax.device_get(jax.jit(f)(*inputs))
        diff = float(np.max(np.abs(np.asarray(got) - np.asarray(truth))))
        status = "PASS" if diff <= tol else "FAIL"
        print(f"{name:18s} {status}  maxdiff={diff:.3e}")
    except Exception as e:  # noqa: BLE001
        print(f"{name:18s} ERROR  {type(e).__name__}: {str(e)[:110]}")


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(1)
    packed = jnp.asarray(rng.normal(size=(80, 128)), jnp.float32)

    # 1. exact row select via masked sublane sum
    def k1(p_ref, o_ref):
        c = pl.program_id(0)
        rows80 = jax.lax.broadcasted_iota(jnp.int32, (80, 128), 0)
        picked = jnp.sum(
            jnp.where(rows80 == c, p_ref[...], 0.0), axis=0, keepdims=True
        )  # (1, 128) EXACT: 1 nonzero + 79 zeros
        orow = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
        first = c == 0
        base = jnp.where(first, jnp.zeros((C, 128), jnp.float32), o_ref[...])
        o_ref[...] = jnp.where(
            orow == c, jnp.broadcast_to(picked, (C, 128)), base
        )

    run("row_select_sum", k1, [packed],
        jax.ShapeDtypeStruct((C, 128), jnp.float32), np.asarray(packed)[:C],
        (C,), [full((80, 128))], full((C, 128)))

    # 2. carried packed buffer: per-grid-step single-row update, rest carried
    def k2(p_ref, o_ref):
        c = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (80, 128), 0)
        cur = jnp.where(c == 0, p_ref[...], o_ref[...])
        o_ref[...] = jnp.where(rows == c, cur * 2.0 + 1.0, cur)

    truth2 = np.asarray(packed).copy()
    truth2[:C] = truth2[:C] * 2.0 + 1.0
    run("row_mask_update", k2, [packed],
        jax.ShapeDtypeStruct((80, 128), jnp.float32), truth2,
        (C,), [full((80, 128))], full((80, 128)))

    # 3. end-to-end chain: select row c -> broadcast (N,128) -> elementwise
    #    with a data block -> reduce axis 0 -> accumulate into packed out
    data = jnp.asarray(rng.normal(size=(C, N, 128)), jnp.float32)

    def k3(p_ref, d_ref, o_ref):
        c = pl.program_id(0)
        rows80 = jax.lax.broadcasted_iota(jnp.int32, (80, 128), 0)
        q = jnp.sum(jnp.where(rows80 == c, p_ref[...], 0.0), axis=0,
                    keepdims=True)                      # (1,128)
        qn = jnp.broadcast_to(q, (N, 128))              # sublane bcast
        prod = qn * d_ref[0]                            # (N,128) elementwise
        site = jnp.sum(prod, axis=0, keepdims=True)     # (1,128) reduce
        cur = jnp.where(c == 0, jnp.zeros((80, 128), jnp.float32), o_ref[...])
        o_ref[...] = jnp.where(
            rows80 == c, cur + jnp.broadcast_to(site, (80, 128)), cur
        )

    p_np, d_np = np.asarray(packed), np.asarray(data)
    truth3 = np.zeros((80, 128), np.float32)
    for c in range(C):
        truth3[c] = (p_np[c][None] * d_np[c]).sum(0)
    run("chunk_chain", k3, [packed, data],
        jax.ShapeDtypeStruct((80, 128), jnp.float32), truth3,
        (C,),
        [full((80, 128)),
         pl.BlockSpec((1, N, 128), lambda c: (c, 0, 0),
                      memory_space=pltpu.VMEM)],
        full((80, 128)), tol=2e-5)


if __name__ == "__main__":
    main()
