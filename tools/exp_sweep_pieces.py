#!/usr/bin/env python
"""Isolated piece timings of the batched sweep at bench shapes.

Times, each as its own jit with materialized inputs (no cross-fusion):
  build_rows   static-pad row placement [nG, GR, batch, P, D]
  build_xs     rows + the global transpose to [nG, S, K, P, batch, GR]
  scan_triv    lax.scan over prebuilt xs with a trivial cell (streaming floor)
  scan_cell    lax.scan over prebuilt xs with the real pair-cell chain
  unskew       transpose+reshape of prebuilt ys back to [nch, batch, nB, B]

This attributes the sweep's ~121 ms (profile_stages) to its phases so the
next optimization lands where the time is.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np


from tputime import timed  # noqa: E402  (floor-corrected)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB = 418
    B = 4096
    ch = 2
    longv = 6
    step = longv + 1
    K = int(os.environ.get("SST_SWEEP_UNROLL", "32"))
    GR = int(os.environ.get("SST_SWEEP_GROUP", "128"))
    P = 12
    nBp = -(-nB // 128) * 128
    nG = nBp // GR
    align = K * 128 // np.gcd(K, 128)
    D = -(-(B + (GR - 1) * step) // align) * align
    S = D // K
    nch = 2 * ch
    print(f"shapes: nG={nG} S={S} K={K} D={D} GR={GR} "
          f"xs={nG*S*K*P*batch*GR*4/2**30:.2f} GiB", flush=True)

    key = jax.random.PRNGKey(0)
    case = os.environ.get("SST_EXP_CASE", "base")
    packed = None
    if case == "base":
        packed = jax.block_until_ready(jax.jit(
            lambda k: jax.random.normal(k, (batch, P, nBp, B),
                                        jnp.float32))(key))

    def build_rows(pk):
        groups = []
        for g in range(nG):
            frames = []
            for r in range(GR):
                row = pk[:, :, g * GR + r]
                off = r * step
                frames.append(jnp.pad(
                    row, ((0, 0), (0, 0), (off, D - off - B))))
            groups.append(jnp.stack(frames, 0))
        return jnp.stack(groups)                     # [nG, GR, batch, P, D]

    f_rows = jax.jit(lambda pk: jnp.sum(build_rows(pk)))

    def build_xs(pk):
        rows = build_rows(pk)
        sk = jnp.transpose(rows, (0, 4, 3, 2, 1))    # [nG, D, P, batch, GR]
        return sk.reshape(nG, S, K, P, batch, GR)

    f_xs = jax.jit(lambda pk: jnp.sum(build_xs(pk)))

    xs_all = None
    if case in ("base", "dus"):
        src_arr = packed
        if src_arr is None:
            src_arr = jax.block_until_ready(jax.jit(
                lambda k: jax.random.normal(k, (batch, P, nBp, B),
                                            jnp.float32))(key))
        xs_all = jax.block_until_ready(jax.jit(build_xs)(src_arr))
        del src_arr
        if case == "dus":
            packed = None

    def scan_triv(xs):
        def group(c, xs_g):
            def body(acc, row):
                return acc + jnp.sum(row[:, 0]), jnp.sum(row[:, 1],
                                                         axis=(0, 1))
            acc, ys = jax.lax.scan(body, jnp.float32(0), xs_g)
            return c + acc, ys
        c, ys = jax.lax.scan(group, jnp.float32(0), xs)
        return c + jnp.sum(ys)

    f_triv = jax.jit(scan_triv)

    def cell_chain(ring, x):
        # the real pair-cell shape of work: V [K,4,2,b,r], PI [K,ch,2,b,r]
        V = x[:, :8].reshape(K, 4, 2, batch, GR)
        PI = x[:, 8:].reshape(K, ch, 2, batch, GR)
        PE = PI[:, :, 0] ** 2 + PI[:, :, 1] ** 2
        ring_list = [ring[l] for l in range(longv)]
        emitted = []
        for j in range(K):
            prevl, prev1 = ring_list[0], ring_list[-1]
            pe, pi = PE[j], PI[j]
            mc1 = pe[1] > pe[0]
            both = jnp.stack([prevl, prev1])
            sh = jnp.concatenate(
                [jnp.zeros(both.shape[:-1] + (1,), both.dtype),
                 both[..., :-1]], -1)
            cat = jnp.stack([sh[0], sh[1], both[1], both[0]])
            W = jnp.where(mc1, cat[:, 1], cat[:, 0])
            Pr = V[j, :, 0] * W[:, 0] - V[j, :, 1] * W[:, 1]
            Pi = V[j, :, 0] * W[:, 1] + V[j, :, 1] * W[:, 0]
            phr = ((Pr[0] + Pr[1]) + Pr[2]) + Pr[3]
            phi = ((Pi[0] + Pi[1]) + Pi[2]) + Pi[3]
            pe_m = jnp.where(mc1, pe[1], pe[0])
            pim = jnp.where(mc1, pi[1], pi[0])
            pn = phr * phr + phi * phi
            weak = pn <= jnp.float32(1e-15)
            s = jnp.sqrt(pe_m / jnp.where(weak, pe_m + 1e-15, pn))
            omr = jnp.where(weak, pim[0], phr) * s
            omi = jnp.where(weak, pim[1], phi) * s
            om = jnp.stack([omr, omi])
            ctr = pi[:, 0] * pim[0] + pi[:, 1] * pim[1]
            cti = pi[:, 1] * pim[0] - pi[:, 0] * pim[1]
            tr = omr * ctr - omi * cti
            ti = omr * cti + omi * ctr
            s2 = jnp.sqrt(pe / jnp.maximum(tr * tr + ti * ti, 1e-15))
            lk = jnp.stack([tr * s2, ti * s2], 1)
            mask = jnp.stack([~mc1, mc1])[:, None]
            outs = jnp.where(mask, om[None], lk)
            ring_list = ring_list[1:] + [outs]
            emitted.append(outs)
        return jnp.stack(ring_list), jnp.stack(emitted)

    def scan_cell(xs):
        def group(c, xs_g):
            ring0 = jnp.zeros((longv, ch, 2, batch, GR), jnp.float32)
            _, ys = jax.lax.scan(cell_chain, ring0, xs_g)
            return c, jnp.sum(ys, axis=(0, 1))
        _, ys = jax.lax.scan(group, jnp.float32(0), xs)
        return jnp.sum(ys)

    f_cell = jax.jit(scan_cell)

    ys_all = None
    if case == "base":
        ys_all = jax.block_until_ready(jax.jit(
            lambda k: jax.random.normal(k, (nG, D, nch, batch, GR),
                                        jnp.float32))(key))

    def unskew(ys):
        outs = []
        for g in range(nG):
            skc = jnp.transpose(ys[g], (1, 2, 3, 0))   # [nch, batch, GR, D]
            flat = skc.reshape(nch, batch, GR * D)
            tail = jnp.zeros((nch, batch, GR * step), jnp.float32)
            view = jnp.concatenate([flat, tail], 2).reshape(
                nch, batch, GR, D + step)
            outs.append(view[..., :B])
        og = jnp.stack(outs)                   # [nG, nch, batch, GR, B]
        out = jnp.transpose(og, (1, 2, 0, 3, 4)).reshape(nch, batch, nBp, B)
        return jnp.sum(out[:, :, :nB])

    f_unskew = jax.jit(unskew)

    # round-5 additions: the pieces the production (dus-emission) sweep
    # actually runs that the above do not isolate.  Run in isolation
    # (SST_EXP_CASE=pack / dus) — together with the base cases the live
    # arrays exceed HBM.
    planes12 = None
    if case == "pack":
        planes12 = jax.block_until_ready(jax.jit(
            lambda k: [jax.random.normal(jax.random.fold_in(k, i),
                                         (batch, nB, B), jnp.float32)
                       for i in range(P)])(key))

    def pack12(pls):
        stacked = jnp.pad(jnp.stack(pls, axis=1),
                          ((0, 0), (0, 0), (0, nBp - nB), (0, 0)))
        return jnp.sum(jax.lax.optimization_barrier(stacked))

    f_pack = jax.jit(pack12)

    def scan_dus(xs):
        """cell scan + windowed-DUS emission + unskew view + final-buffer
        DUS — the production emission path (SST_SWEEP_EMIT=dus)."""
        out = jnp.zeros((batch, nch, nBp, B), jnp.float32)
        for g in range(nG):
            def body(carry, xy):
                ring, buf = carry
                row, joff = xy
                ring2, em = cell_chain(ring, row)
                win = jnp.transpose(em, (3, 1, 2, 4, 0)).reshape(
                    batch, nch, GR, K)
                buf2 = jax.lax.dynamic_update_slice(buf, win, (0, 0, 0, joff))
                return (ring2, buf2), None

            ring0 = jnp.zeros((longv, ch, 2, batch, GR), jnp.float32)
            buf0 = jnp.zeros((batch, nch, GR, D), jnp.float32)
            offs = jnp.arange(S, dtype=jnp.int32) * K
            (_, buf), _ = jax.lax.scan(body, (ring0, buf0), (xs[g], offs))
            flat = buf.reshape(batch, nch, GR * D)
            tail = jnp.zeros((batch, nch, GR * step), jnp.float32)
            og = jnp.concatenate([flat, tail], 2).reshape(
                batch, nch, GR, D + step)[..., :B]
            out = jax.lax.dynamic_update_slice(out, og, (0, 0, g * GR, 0))
        return jnp.sum(out[:, :, :nB])

    f_dus = jax.jit(scan_dus)

    cases = {
        "base": (("build_rows", f_rows, packed),
                 ("build_xs  ", f_xs, packed),
                 ("scan_triv ", f_triv, xs_all),
                 ("scan_cell ", f_cell, xs_all),
                 ("unskew    ", f_unskew, ys_all)),
        "pack": (("pack12    ", f_pack, planes12),),
        "dus": (("scan_dus  ", f_dus, xs_all),),
    }
    for name, fn, arg in cases[case]:
        dt, cs = timed(fn, arg)
        print(f"{name}: {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
