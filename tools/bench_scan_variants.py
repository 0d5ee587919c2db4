#!/usr/bin/env python
"""Layout experiments for the wavefront sweep scan.

All variants compute the same cell math (4-vote phase + make_output + channel
locking) over synthetic data at the headline shape; they differ in xs layout
and loop structure.  Times include nothing but the scan (xs prebuilt on
device).

  A  current engine layout: xs [D/K, batch, K, P, nB], per-j P-dim slicing
  B  pytree-of-planes: each plane [D/K, K, batch, nB], j-slice on leading dim
  C  B with nested lax.scan over K instead of python unroll
  D  B with direct slab math: vectorize ring-independent prep over K

Run: SST_VAR=B SST_K=32 python tools/bench_scan_variants.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NOISE_FLOOR = np.float32(1e-15)
f32 = np.float32


def _make_output(pe, pi_r, pi_i, ph_r, ph_i):
    pn = ph_r * ph_r + ph_i * ph_i
    weak = pn <= f32(NOISE_FLOOR)
    fn_ = pi_r * pi_r + pi_i * pi_i
    p2r = jnp.where(weak, pi_r, ph_r)
    p2i = jnp.where(weak, pi_i, ph_i)
    pn2 = jnp.where(weak, fn_ + f32(NOISE_FLOOR), pn)
    s = jnp.sqrt(pe / pn2)
    return p2r * s, p2i * s


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "417"))
    B = int(os.environ.get("SST_BANDS", "4096"))
    ch = 2
    longv = 6
    K = int(os.environ.get("SST_K", "32"))
    var = os.environ.get("SST_VAR", "B")
    step = longv + 1
    D0 = B + (nB - 1) * step
    D = -(-D0 // K) * K
    S = D // K
    P = 14  # 8 coeff + 2 pe + 4 pi (re/im)

    key = jax.random.PRNGKey(0)

    if var == "A":
        xs = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
            k, (S, batch, K, P, nB), jnp.float32))(key))
        gb = xs.size * 4 / 1e9
    elif var not in ("H", "I", "J", "K2"):
        planes = []
        for p in range(P):
            key, k2 = jax.random.split(key)
            planes.append(jax.jit(lambda k: jax.random.normal(
                k, (S, K, batch, nB), jnp.float32))(k2))
        xs = jax.block_until_ready(tuple(planes))
        gb = sum(x.size for x in xs) * 4 / 1e9
    else:
        xs = None; gb = 0.0

    def cell_from_planes(vals, ring_list):
        """vals: dict of [batch, nB] planes for one diagonal."""
        pe0, pe1 = vals["pe0"], vals["pe1"]
        mc1 = pe1 > pe0   # channel 1 wins
        def sel(a, b):
            return jnp.where(mc1, b, a)
        prev1 = ring_list[-1]   # [(r,i) per ch]
        prevl = ring_list[0]

        def shift_k(x):
            if os.environ.get('SST_NOSHIFT') == '1':
                return x
            return jnp.concatenate(
                [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1]], -1)

        d1r = sel(prev1[0][0], prev1[1][0]); d1i = sel(prev1[0][1], prev1[1][1])
        dlr = sel(prevl[0][0], prevl[1][0]); dli = sel(prevl[0][1], prevl[1][1])
        u1r = sel(shift_k(prevl[0][0]), shift_k(prevl[1][0]))
        u1i = sel(shift_k(prevl[0][1]), shift_k(prevl[1][1]))
        ulr = sel(shift_k(prev1[0][0]), shift_k(prev1[1][0]))
        uli = sel(shift_k(prev1[0][1]), shift_k(prev1[1][1]))
        phr = (vals["d1r"] * d1r - vals["d1i"] * d1i
               + vals["d2r"] * dlr - vals["d2i"] * dli
               + vals["a1r"] * u1r - vals["a1i"] * u1i
               + vals["a2r"] * ulr - vals["a2i"] * uli)
        phi = (vals["d1r"] * d1i + vals["d1i"] * d1r
               + vals["d2r"] * dli + vals["d2i"] * dlr
               + vals["a1r"] * u1i + vals["a1i"] * u1r
               + vals["a2r"] * uli + vals["a2i"] * ulr)
        pe_m = sel(pe0, pe1)
        pim_r = sel(vals["pi0r"], vals["pi1r"])
        pim_i = sel(vals["pi0i"], vals["pi1i"])
        omr, omi = _make_output(pe_m, pim_r, pim_i, phr, phi)
        outs = []
        for c, (pir, pii, pec) in enumerate(
                [(vals["pi0r"], vals["pi0i"], pe0),
                 (vals["pi1r"], vals["pi1i"], pe1)]):
            ctr = pir * pim_r + pii * pim_i
            cti = pii * pim_r - pir * pim_i
            tr = omr * ctr - omi * cti
            ti = omr * cti + omi * ctr
            lr, li = _make_output(pec, pir, pii, tr, ti)
            is_m = mc1 if c == 1 else ~mc1
            outs.append((jnp.where(is_m, omr, lr), jnp.where(is_m, omi, li)))
        return outs

    NAMES = ["a1r", "a1i", "a2r", "a2i", "d1r", "d1i", "d2r", "d2i",
             "pe0", "pe1", "pi0r", "pi0i", "pi1r", "pi1i"]

    ring0 = jnp.zeros((longv, ch, 2, batch, nB), jnp.float32)

    if var == "A":
        def body(ring, row):
            # row [batch, K, P, nB]
            ring_list = [[(ring[l, c, 0], ring[l, c, 1]) for c in range(ch)]
                         for l in range(longv)]
            emitted = []
            for j in range(K):
                vals = {n: row[:, j, p] for p, n in enumerate(NAMES)}
                outs = cell_from_planes(vals, ring_list)
                ring_list = ring_list[1:] + [outs]
                emitted.append(outs)
            ring2 = jnp.stack([jnp.stack([jnp.stack(c, 0) for c in r], 0)
                               for r in ring_list], 0)
            em = jnp.stack([jnp.stack([jnp.stack(c, 0) for c in r], 0)
                            for r in emitted], 0)
            return ring2, em

        def run(xs):
            _, outs = jax.lax.scan(body, ring0, xs)
            return jnp.sum(jnp.abs(outs))

    elif var == "B":
        def body(ring, row):
            ring_list = [[(ring[l, c, 0], ring[l, c, 1]) for c in range(ch)]
                         for l in range(longv)]
            emitted = []
            for j in range(K):
                vals = {n: row[p][j] for p, n in enumerate(NAMES)}
                outs = cell_from_planes(vals, ring_list)
                ring_list = ring_list[1:] + [outs]
                emitted.append(outs)
            ring2 = jnp.stack([jnp.stack([jnp.stack(c, 0) for c in r], 0)
                               for r in ring_list], 0)
            em = jnp.stack([jnp.stack([jnp.stack(c, 0) for c in r], 0)
                            for r in emitted], 0)
            return ring2, em

        def run(xs):
            _, outs = jax.lax.scan(body, ring0, xs)
            return jnp.sum(jnp.abs(outs))

    elif var == "C":
        def inner(ring_flat, vals_row):
            # ring_flat [longv, ch, 2, batch, nB]; vals_row tuple of [batch,nB]
            ring_list = [[(ring_flat[l, c, 0], ring_flat[l, c, 1])
                          for c in range(ch)] for l in range(longv)]
            vals = {n: vals_row[p] for p, n in enumerate(NAMES)}
            outs = cell_from_planes(vals, ring_list)
            ring_list = ring_list[1:] + [outs]
            ring2 = jnp.stack([jnp.stack([jnp.stack(c, 0) for c in r], 0)
                               for r in ring_list], 0)
            em = jnp.stack([jnp.stack(c, 0) for c in outs], 0)
            return ring2, em

        def body(ring, row):
            ring2, em = jax.lax.scan(inner, ring, row)   # over K
            return ring2, em

        def run(xs):
            _, outs = jax.lax.scan(body, ring0, xs)
            return jnp.sum(jnp.abs(outs))


    elif var == "D":
        # C with the ring carried as a flat tuple (rotation = pytree rewiring)
        def inner(ring, vals_row):
            # ring: tuple of longv entries, each ((r,i) per ch)
            ring_list = list(ring)
            vals = {n: vals_row[p] for p, n in enumerate(NAMES)}
            outs = cell_from_planes(vals, ring_list)
            ring_list = ring_list[1:] + [tuple(outs)]
            em = jnp.stack([jnp.stack(c, 0) for c in outs], 0)
            return tuple(ring_list), em

        def body(ring, row):
            return jax.lax.scan(inner, ring, row)

        def run(xs):
            z = jnp.zeros((batch, nB), jnp.float32)
            ring0t = tuple(tuple((z, z) for _ in range(ch))
                           for _ in range(longv))
            _, outs = jax.lax.scan(body, ring0t, xs)
            return jnp.sum(jnp.abs(outs))

    elif var == "E":
        # C with the ring as [R=8, ch*2, batch, nB] buffer + rotating DUS index
        R = 8  # power of two >= longv+1
        def inner(carry, vals_row):
            buf, i = carry   # buf [R, ch*2, batch, nB]; i = next write slot
            i1 = (i - 1) & (R - 1)      # newest (t-1)
            il = (i - longv) & (R - 1)  # t-longv
            row1 = jax.lax.dynamic_index_in_dim(buf, i1, 0, False)
            rowl = jax.lax.dynamic_index_in_dim(buf, il, 0, False)
            ring_list = [None] * longv
            ring_list[-1] = [(row1[0], row1[1]), (row1[2], row1[3])]
            ring_list[0] = [(rowl[0], rowl[1]), (rowl[2], rowl[3])]
            vals = {n: vals_row[p] for p, n in enumerate(NAMES)}
            outs = cell_from_planes(vals, ring_list)
            em = jnp.stack([outs[0][0], outs[0][1], outs[1][0], outs[1][1]], 0)
            buf = jax.lax.dynamic_update_index_in_dim(buf, em, i, 0)
            return (buf, (i + 1) & (R - 1)), em

        def body(carry, row):
            return jax.lax.scan(inner, carry, row)

        def run(xs):
            buf0 = jnp.zeros((8, ch * 2, batch, nB), jnp.float32)
            (_, _), outs = jax.lax.scan(body, (buf0, jnp.int32(0)), xs)
            return jnp.sum(jnp.abs(outs))

    elif var == "F":
        # C without emitting per-cell outputs (isolate emission cost)
        def inner(ring_flat, vals_row):
            ring_list = [[(ring_flat[l, c, 0], ring_flat[l, c, 1])
                          for c in range(ch)] for l in range(longv)]
            vals = {n: vals_row[p] for p, n in enumerate(NAMES)}
            outs = cell_from_planes(vals, ring_list)
            ring_list = ring_list[1:] + [outs]
            ring2 = jnp.stack([jnp.stack([jnp.stack(c, 0) for c in r], 0)
                               for r in ring_list], 0)
            return ring2, None

        def body(ring, row):
            return jax.lax.scan(inner, ring, row)

        def run(xs):
            ring, _ = jax.lax.scan(body, ring0, xs)
            return jnp.sum(jnp.abs(ring))

    elif var == "G":
        # D + trivial cell (read all planes, no ring math) -> xs stream floor
        def inner(acc, vals_row):
            t = acc
            for p in range(P):
                t = t + vals_row[p]
            t = t * f32(0.999)
            return t, t[:1, :1]

        def body(acc, row):
            return jax.lax.scan(inner, acc, row)

        def run(xs):
            acc0 = jnp.zeros((batch, nB), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0, xs)
            return jnp.sum(jnp.abs(acc))


    elif var == "H":
        # packed xs: [S, K/U, U, batch, P, nB]; one contiguous slice per inner
        # step covering U cells; ring as tuple (rotation = rewiring)
        U = int(os.environ.get("SST_U", "2"))
        xs = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
            k, (S, K // U, U, batch, P, nB), jnp.float32))(key))
        gb = xs.size * 4 / 1e9

        def inner(ring, row):
            # row [U, batch, P, nB]
            ring_list = list(ring)
            ems = []
            for u in range(U):
                vals = {n: row[u, :, p] for p, n in enumerate(NAMES)}
                outs = cell_from_planes(vals, ring_list)
                ring_list = ring_list[1:] + [tuple(outs)]
                ems.append(jnp.stack([jnp.stack(c, 0) for c in outs], 0))
            return tuple(ring_list), jnp.stack(ems, 0)

        def body(ring, row):
            return jax.lax.scan(inner, ring, row)

        def run(xs):
            z = jnp.zeros((batch, nB), jnp.float32)
            ring0t = tuple(tuple((z, z) for _ in range(ch))
                           for _ in range(longv))
            _, outs = jax.lax.scan(body, ring0t, xs)
            return jnp.sum(jnp.abs(outs))


    elif var == "I":
        # single-level scan over U-diagonal slabs: packed xs one fetch/step,
        # carry = previous output slab only (U >= longv), static ring reads
        U = int(os.environ.get("SST_U", "8"))
        assert U >= longv
        S2 = D // U
        xs = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
            k, (S2, U, batch, P, nB), jnp.float32))(key))
        gb = xs.size * 4 / 1e9

        def body(prev_slab, row):
            # prev_slab [U, 4, batch, nB]; row [U, batch, P, nB]
            cells = []

            def ringval(idx):
                if idx >= 0:
                    o = cells[idx]
                    return [(o[0], o[1]), (o[2], o[3])]
                e = prev_slab[U + idx]
                return [(e[0], e[1]), (e[2], e[3])]

            for u in range(U):
                vals = {n: row[u, :, p] for p, n in enumerate(NAMES)}
                ring_list = [None] * longv
                ring_list[-1] = ringval(u - 1)
                ring_list[0] = ringval(u - longv)
                outs = cell_from_planes(vals, ring_list)
                cells.append((outs[0][0], outs[0][1], outs[1][0], outs[1][1]))
            slab = jnp.stack([jnp.stack(c, 0) for c in cells], 0)
            return slab, slab

        def run(xs):
            slab0 = jnp.zeros((U, 4, batch, nB), jnp.float32)
            _, outs = jax.lax.scan(body, slab0, xs)
            return jnp.sum(jnp.abs(outs))


    elif var == "J":
        # flat contiguous layout: xs [S2, U, P, F] with F = batch*nB padded to
        # a lane multiple; every per-cell plane slice row[u, p] is contiguous;
        # all cell math on flat [F] vectors; shift_k = flat shift + mask
        U = int(os.environ.get("SST_U", "8"))
        assert U >= longv
        S2 = D // U
        F = -(-(batch * nB) // 128) * 128
        xs = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
            k, (S2, U, P, F), jnp.float32))(key))
        gb = xs.size * 4 / 1e9

        # shift_k moves block row k -> k+1 within each batch: in flat
        # (batch*nB) order that is a shift by 1 with zeros at batch starts
        mask_np = np.ones((batch, nB), np.float32)
        mask_np[:, 0] = 0.0
        mask_flat = jnp.asarray(np.pad(mask_np.reshape(-1),
                                       (0, F - batch * nB)))

        def cell_flat(vals, r1v, rlv):
            pe0, pe1 = vals["pe0"], vals["pe1"]
            mc1 = pe1 > pe0

            def sel(a, b):
                return jnp.where(mc1, b, a)

            def shift_k(x):
                y = jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])
                return y * mask_flat

            d1r = sel(r1v[0], r1v[2]); d1i = sel(r1v[1], r1v[3])
            dlr = sel(rlv[0], rlv[2]); dli = sel(rlv[1], rlv[3])
            u1r = sel(shift_k(rlv[0]), shift_k(rlv[2]))
            u1i = sel(shift_k(rlv[1]), shift_k(rlv[3]))
            ulr = sel(shift_k(r1v[0]), shift_k(r1v[2]))
            uli = sel(shift_k(r1v[1]), shift_k(r1v[3]))
            phr = (vals["d1r"] * d1r - vals["d1i"] * d1i
                   + vals["d2r"] * dlr - vals["d2i"] * dli
                   + vals["a1r"] * u1r - vals["a1i"] * u1i
                   + vals["a2r"] * ulr - vals["a2i"] * uli)
            phi = (vals["d1r"] * d1i + vals["d1i"] * d1r
                   + vals["d2r"] * dli + vals["d2i"] * dlr
                   + vals["a1r"] * u1i + vals["a1i"] * u1r
                   + vals["a2r"] * uli + vals["a2i"] * ulr)
            pe_m = sel(pe0, pe1)
            pim_r = sel(vals["pi0r"], vals["pi1r"])
            pim_i = sel(vals["pi0i"], vals["pi1i"])
            omr, omi = _make_output(pe_m, pim_r, pim_i, phr, phi)
            res = []
            for c, (pir, pii, pec) in enumerate(
                    [(vals["pi0r"], vals["pi0i"], pe0),
                     (vals["pi1r"], vals["pi1i"], pe1)]):
                ctr = pir * pim_r + pii * pim_i
                cti = pii * pim_r - pir * pim_i
                tr = omr * ctr - omi * cti
                ti = omr * cti + omi * ctr
                lr, li = _make_output(pec, pir, pii, tr, ti)
                is_m = mc1 if c == 1 else ~mc1
                res += [jnp.where(is_m, omr, lr), jnp.where(is_m, omi, li)]
            return tuple(res)   # (r0, i0, r1, i1)

        def body(prev_slab, row):
            # prev_slab [U, 4, F]; row [U, P, F]
            cells = []

            def ringval(idx):
                if idx >= 0:
                    return cells[idx]
                e = prev_slab[U + idx]
                return (e[0], e[1], e[2], e[3])

            for u in range(U):
                vals = {n: row[u, p] for p, n in enumerate(NAMES)}
                outs = cell_flat(vals, ringval(u - 1), ringval(u - longv))
                cells.append(outs)
            slab = jnp.stack([jnp.stack(c, 0) for c in cells], 0)
            return slab, slab

        def run(xs):
            slab0 = jnp.zeros((U, 4, F), jnp.float32)
            _, outs = jax.lax.scan(body, slab0, xs)
            return jnp.sum(jnp.abs(outs))


    elif var == "K2":
        # plane-contiguous + 2-D tiles: xs [S2, U, P, batch, nB]; per-cell
        # slice row[u, p] is a contiguous [batch, nB] plane
        U = int(os.environ.get("SST_U", "8"))
        assert U >= longv
        S2 = D // U
        xs = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
            k, (S2, U, P, batch, nB), jnp.float32))(key))
        gb = xs.size * 4 / 1e9

        def body(prev_slab, row):
            # prev_slab [U, 4, batch, nB]; row [U, P, batch, nB]
            cells = []

            def ringval(idx):
                if idx >= 0:
                    o = cells[idx]
                    return [(o[0], o[1]), (o[2], o[3])]
                e = prev_slab[U + idx]
                return [(e[0], e[1]), (e[2], e[3])]

            for u in range(U):
                vals = {n: row[u, p] for p, n in enumerate(NAMES)}
                ring_list = [None] * longv
                ring_list[-1] = ringval(u - 1)
                ring_list[0] = ringval(u - longv)
                outs = cell_from_planes(vals, ring_list)
                cells.append((outs[0][0], outs[0][1], outs[1][0], outs[1][1]))
            slab = jnp.stack([jnp.stack(c, 0) for c in cells], 0)
            return slab, slab

        def run(xs):
            slab0 = jnp.zeros((U, 4, batch, nB), jnp.float32)
            _, outs = jax.lax.scan(body, slab0, xs)
            return jnp.sum(jnp.abs(outs))

    if os.environ.get("SST_DUMP_HLO") == "1":
        txt = jax.jit(run).lower(xs).compile().as_text()
        open("/tmp/sweep_hlo.txt", "w").write(txt)
        import re
        fus = re.findall(r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ fusion\(", txt, re.M)
        print(f"HLO dumped: {len(txt)} chars, {len(fus)} fusion ops", flush=True)
        body = txt
        return
    dt, cs = timed(jax.jit(run), xs)
    print(f"variant {var} K={K} batch={batch}: {dt*1e3:7.1f} ms "
          f"(compile {cs:.0f}s; xs {gb:.2f} GB -> {gb/dt:.0f} GB/s read)",
          flush=True)


if __name__ == "__main__":
    main()
# (appended experiments are driven via env flags; see main())
