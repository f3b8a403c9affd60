"""Butterfly (VPU) vs digit-plane matmul (MXU) NTT on the real chip.

Addresses round-2 VERDICT item 2: the roofline analysis (docs/ROOFLINE.md)
measured the butterfly NTT at 2.87 ms per (204, 5, 8192) batch —
int-multiply-bound on the VPU — and named MXU digit-plane matmuls as the
only unit with a higher multiply rate. This measures that path.

Slope method (two sizes, RTT cancels), same as benchmarks/roofline.py.
Appends results/mxu_ntt.jsonl. Run: python -m benchmarks.mxu_ntt_bench
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fhe_fed_tpu.rns import primes                         # noqa: E402
from fhe_fed_tpu.ntt import tables as tables_mod           # noqa: E402
from fhe_fed_tpu.ntt import ntt as ntt_mod                 # noqa: E402
from fhe_fed_tpu.ntt import mxu                            # noqa: E402
from .common import append_jsonl                           # noqa: E402


def timeit(fn, x, reps=8):
    out = fn(x)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring", type=int, default=8192)
    ap.add_argument("--limbs", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=256,
                    help="small size; large is 4x")
    ap.add_argument("--variants", type=str, default="butterfly,int8,bf16,f32",
                    help="comma list: butterfly,int8,bf16,f32 (run in "
                         "stages — first-ever compiles through the tunnel "
                         "are slow; the persistent cache makes reruns fast)")
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args(argv)
    variants = args.variants.split(",")

    # Every ntt_mod.ntt/intt call in this bench must be the TRUE butterfly
    # network: since the MXU kernel became ntt()'s TPU default, an
    # unpinned call would dispatch to the very kernel it is compared
    # against (both the 'butterfly' timing rows and the bit-exactness
    # oracle below would be MXU-vs-MXU). The MXU variants call
    # mxu/mxu_pallas directly, so this pin only affects the baseline.
    os.environ["FHE_FED_TPU_NO_MXU"] = "1"
    os.environ.pop("FHE_FED_TPU_PALLAS", None)

    n, L = args.ring, args.limbs
    mod = primes.ntt_primes(n, L)
    tb = tables_mod.make_tables(n, mod)
    mt = mxu.make_mxu_tables(n, tuple(mod))
    rng = np.random.default_rng(0)
    c_s, c_b = args.chunks, args.chunks * 4

    def make_x(chunks):
        return jnp.asarray(rng.integers(
            0, np.array(mod)[:, None], size=(chunks, L, n)).astype(np.uint32))

    x_s, x_b = make_x(c_s), make_x(c_b)
    print(f"backend={jax.default_backend()} N={n} L={L} chunks={c_s}/{c_b}")

    def emit(name, fn):
        t_s = timeit(fn, x_s)
        t_b = timeit(fn, x_b)
        if not (t_b > t_s > 0):
            print(f"{name}: INVALID (t_s={t_s*1e3:.3f} t_b={t_b*1e3:.3f})")
            return None
        slope = (t_b - t_s) / (c_b - c_s)
        ms204 = slope * 204 * 1e3
        r = {"op": name, "ms_per_204chunks": round(ms204, 3),
             "ns_per_chunk": round(slope * 1e9, 1),
             "ring": n, "limbs": L,
             "t_small_ms": round(t_s * 1e3, 3),
             "t_big_ms": round(t_b * 1e3, 3),
             "backend": jax.default_backend()}
        append_jsonl("mxu_ntt.jsonl", r)
        print(f"{name:24s} {ms204:7.3f} ms@204chunks")
        return ms204

    # Correctness on-device first (any mismatch voids the timing).
    if not args.skip_check:
        got = np.asarray(mxu.ntt_mxu(x_s[:2], mt))
        want = np.asarray(ntt_mod.ntt(x_s[:2], tb))
        assert np.array_equal(got, want), "MXU NTT mismatch on device!"
        gi = np.asarray(mxu.intt_mxu(jnp.asarray(want), mt))
        wi = np.asarray(ntt_mod.intt(jnp.asarray(want), tb))
        assert np.array_equal(gi, wi), "MXU iNTT mismatch on device!"
        print("device bit-exactness: OK", flush=True)

    if "butterfly" in variants:
        emit("ntt_butterfly", jax.jit(lambda x: ntt_mod.ntt(x, tb)))
        emit("intt_butterfly", jax.jit(lambda x: ntt_mod.intt(x, tb)))
    for dt in ("int8", "bf16", "f32"):
        if dt not in variants:
            continue
        os.environ["FHE_FED_TPU_MXU_DTYPE"] = dt
        emit(f"ntt_mxu_{dt}", jax.jit(lambda x: mxu.ntt_mxu(x, mt)))
        emit(f"intt_mxu_{dt}", jax.jit(lambda x: mxu.intt_mxu(x, mt)))

    from fhe_fed_tpu.ntt import mxu_pallas as MP
    for dt in ("int8", "bf16", "f32"):
        if f"pallas_{dt}" not in variants:
            continue
        got = np.asarray(MP.ntt_mxu_fused(x_s[:2], mt, dtype=dt))
        assert np.array_equal(got, np.asarray(ntt_mod.ntt(x_s[:2], tb))), \
            f"fused {dt} fwd mismatch on device!"
        gi = np.asarray(MP.intt_mxu_fused(jnp.asarray(got), mt, dtype=dt))
        assert np.array_equal(gi, np.asarray(ntt_mod.intt(jnp.asarray(got),
                                                          tb))), \
            f"fused {dt} inv mismatch on device!"
        emit(f"ntt_mxu_pallas_{dt}",
             jax.jit(lambda x, d=dt: MP.ntt_mxu_fused(x, mt, dtype=d)))
        emit(f"intt_mxu_pallas_{dt}",
             jax.jit(lambda x, d=dt: MP.intt_mxu_fused(x, mt, dtype=d)))


if __name__ == "__main__":
    main()
