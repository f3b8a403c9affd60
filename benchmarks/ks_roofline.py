"""Key-switch (relinearization) roofline — size-slope decomposition of
EvalMult(ct,ct)+relin+rescale at the BASELINE.json metric point
(N=8192, L=4). VERDICT r4 weak #8 / next-round #3: the one hot kernel
with no roofline analysis.

Method: identical to benchmarks/roofline.py — time each phase at two
chunk counts and take the slope, which cancels the remote-TPU tunnel RTT
and every other size-independent overhead. Phases mirror
ckks/keyswitch.py::key_switch exactly:

  tensor_products   d0/d1/d2 = a0*b0, a0*b1+a1*b0, a1*b1 (elementwise)
  intt_live         d2 -> coefficient domain          (live NTT batch)
  lift_ntt_ext      digit lift + forward NTT over the extended basis
                    {q_0..q_{live-1}, P} — live x ext transforms/chunk,
                    THE dominant phase
  gadget_reduce     x_hat * evk rows, modular sum over the digit axis
                    (both b and a rows)
  mod_down          divide-by-P basis correction (1 iNTT + 1 NTT + mul)
  mul_relin_full    the whole fused _mul_relin_impl + rescale

Run with FHE_FED_TPU_NO_MXU=1 for the butterfly-NTT variant (the A/B
for the r5 fix that keeps the MXU digit-plane transform engaged on the
extended basis — keyswitch._take_tables previously dropped the mxu
tables, demoting the dominant phase).

Usage: python -m benchmarks.ks_roofline [--chunks 64] [--tag label]
Appends rows to results/ks_roofline.jsonl.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import keyswitch as KS
from fhe_fed_tpu.ntt import ntt as ntt_mod
from fhe_fed_tpu.rns import modops
from .common import append_jsonl, enable_compile_cache

enable_compile_cache()

HBM_GBS = 819.0          # v5e peak HBM bandwidth


def timeit(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=64,
                    help="small size; the large size is 4x this")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--tag", default="")
    args = ap.parse_args(argv)

    params = P.make_params(batch=4096, scale_bits=52, mult_depth=1)
    ctx = P.make_context(params)
    n = ctx.ring_dim
    live = params.chain_len
    sk, pk = K.keygen(ctx, seed=0)
    rlk = KS.make_relin_key(ctx, sk, jax.random.key(17))
    idx = KS._ext_indices(ctx, live)
    ext = live + 1
    tb_live = ctx.tables.slice_limbs(0, live)
    tb_ext = KS._take_tables(ctx.tables, idx)
    q_ext = ctx.q[idx]
    qb_ext = q_ext[:, None]
    qb = ctx.q[:live, None]
    mu = ctx.mu[:live, None]

    c_s, c_b = args.chunks, args.chunks * 4
    rng = np.random.default_rng(1)

    def fresh_ct(chunks, seed):
        vals = jnp.asarray(
            rng.standard_normal((chunks, n)).astype(np.float32) * 0.1)
        return O.encrypt_symmetric(ctx, sk, vals, jax.random.key(seed))

    cts = {c: (fresh_ct(c, 2), fresh_ct(c, 3)) for c in (c_s, c_b)}

    # ---- phase functions (jitted once per shape) -------------------------

    @jax.jit
    def tensor_products(a, b):
        a0, a1 = a[:, 0], a[:, 1]
        b0, b1 = b[:, 0], b[:, 1]
        d0 = modops.mul_mod(a0, b0, qb, mu)
        d1 = modops.add_mod(modops.mul_mod(a0, b1, qb, mu),
                            modops.mul_mod(a1, b0, qb, mu), qb)
        d2 = modops.mul_mod(a1, b1, qb, mu)
        return d0, d1, d2

    @jax.jit
    def intt_live(d2):
        return ntt_mod.intt(d2, tb_live)

    @jax.jit
    def lift_ntt_ext(c):
        x = c[:, :, None, :]
        x = jnp.where(x >= qb_ext, x - qb_ext, x)
        x = jnp.broadcast_to(x, (c.shape[0], live, ext, n))
        return ntt_mod.ntt(x, tb_ext)

    b_sel = rlk.b[:live][:, idx]
    a_sel = rlk.a[:live][:, idx]
    b_sh = rlk.b_shoup[:live][:, idx]
    a_sh = rlk.a_shoup[:live][:, idx]
    pow32 = ctx.pow32[idx][:, None]
    pow32_sh = ctx.pow32_shoup[idx][:, None]

    @jax.jit
    def gadget_reduce(x_hat):
        def red(rows, rows_shoup):
            terms = modops.mul_mod_shoup(x_hat, rows[None], rows_shoup[None],
                                         qb_ext)
            terms = jnp.moveaxis(terms, 1, 0)
            return O.modsum_clients(terms, qb_ext, pow32, pow32_sh)
        return red(b_sel, b_sh), red(a_sel, a_sh)

    @jax.jit
    def mod_down2(u0, u1):
        return KS._mod_down(ctx, u0, live), KS._mod_down(ctx, u1, live)

    def mul_relin_full(a, b):
        return O.rescale(ctx, KS.mul_ct(ctx, a, b, rlk))

    # ---- intermediates at both sizes ------------------------------------

    inter = {}
    for c in (c_s, c_b):
        a, b = cts[c]
        _, _, d2 = tensor_products(a.data, b.data)
        coeffs = intt_live(d2)
        x_hat = lift_ntt_ext(coeffs)
        u0, u1 = gadget_reduce(x_hat)
        inter[c] = dict(d2=d2, coeffs=coeffs, x_hat=x_hat, u0=u0, u1=u1)
        jax.block_until_ready(inter[c])

    # bytes moved per chunk (u32 words x 4B), for GB/s vs the HBM peak
    w = 4 * n
    phases = [
        ("tensor_products",
         lambda c: timeit(tensor_products, cts[c][0].data, cts[c][1].data,
                          reps=args.reps),
         (4 + 3) * live * w),
        ("intt_live",
         lambda c: timeit(intt_live, inter[c]["d2"], reps=args.reps),
         2 * live * w),
        ("lift_ntt_ext",
         lambda c: timeit(lift_ntt_ext, inter[c]["coeffs"],
                          reps=args.reps),
         (live + live * ext) * w),
        ("gadget_reduce",
         lambda c: timeit(gadget_reduce, inter[c]["x_hat"],
                          reps=args.reps),
         (2 * live * ext + 2 * ext) * w),
        ("mod_down",
         lambda c: timeit(mod_down2, inter[c]["u0"], inter[c]["u1"],
                          reps=args.reps),
         (2 * ext + 2 * live) * w),
        ("mul_relin_full",
         lambda c: timeit(mul_relin_full, cts[c][0], cts[c][1],
                          reps=args.reps),
         None),
    ]

    mxu_off = bool(os.environ.get("FHE_FED_TPU_NO_MXU"))
    rows = []
    sum_slope = 0.0
    for name, run, bytes_pc in phases:
        t_s, t_b = run(c_s), run(c_b)
        if not (t_b > t_s > 0):
            print(f"{name:18s} INVALID (t_s={t_s*1e3:.3f} t_b={t_b*1e3:.3f}"
                  " ms) — row not emitted")
            continue
        slope = (t_b - t_s) / (c_b - c_s)
        r = {"op": name, "ns_per_chunk": round(slope * 1e9, 1),
             "us_per_ct": round(slope * 1e6, 2),
             "cts_per_s": round(1.0 / slope, 1),
             "t_small_ms": round(t_s * 1e3, 3),
             "t_big_ms": round(t_b * 1e3, 3),
             "chunks": [c_s, c_b],
             "mxu": not mxu_off, "tag": args.tag,
             "config": {"ring_dim": n, "live": live, "ext": ext},
             "backend": jax.default_backend()}
        if bytes_pc is not None:
            r["gbs"] = round(bytes_pc / slope / 1e9, 1)
            r["pct_hbm_peak"] = round(100 * bytes_pc / slope / 1e9
                                      / HBM_GBS, 1)
            sum_slope += slope
        else:
            r["phase_sum_ns_per_chunk"] = round(sum_slope * 1e9, 1)
            r["fusion_gain_pct"] = round(
                100 * (1 - slope / sum_slope), 1) if sum_slope else None
        rows.append(r)
        append_jsonl("ks_roofline.jsonl", r)
        extra = (f" {r['gbs']:7.1f} GB/s ({r['pct_hbm_peak']:4.1f}% peak)"
                 if bytes_pc is not None else
                 f"  (phase sum {sum_slope * 1e6:.1f} us/ct)")
        print(f"{name:18s} {slope*1e6:8.2f} us/ct "
              f"{1/slope:10.1f} cts/s{extra}")
    return rows


if __name__ == "__main__":
    main()
