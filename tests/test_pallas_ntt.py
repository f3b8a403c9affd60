"""Fused Pallas NTT kernels vs the jnp reference path (interpret mode on
CPU; the same kernels run compiled on TPU via the ntt()/intt() dispatch)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # opt-in backend (FHE_FED_TPU_PALLAS); default path covered by test_ntt/test_mxu_ntt

from fhe_fed_tpu.rns import primes as primes_mod
from fhe_fed_tpu.ntt import tables as tables_mod
from fhe_fed_tpu.ntt import ntt as ntt_mod
from fhe_fed_tpu.ntt import pallas_ntt


@pytest.fixture(scope="module", params=[256, 2048])
def tb(request):
    n = request.param
    moduli = primes_mod.ntt_primes(n, 3)
    return tables_mod.make_tables(n, moduli)


def _rand(tb, batch, seed=0):
    rng = np.random.default_rng(seed)
    n = tb.ring_dim
    L = int(tb.q.shape[0])
    q = np.asarray(tb.q, dtype=np.uint64)
    x = rng.integers(0, 1 << 32, size=(batch, L, n), dtype=np.uint64)
    return jnp.asarray((x % q[None, :, None]).astype(np.uint32))


def test_stage_tables_built(tb):
    assert tb.stages is not None
    n = tb.ring_dim
    sa = n.bit_length() - 1 - 7
    assert tb.stages.twA.shape[1] == sa
    assert tb.stages.twB.shape == tb.stages.itwB.shape


def test_fused_ntt_matches_jnp(tb):
    x = _rand(tb, 5)
    want = ntt_mod.ntt(x, tb)
    got = pallas_ntt.ntt_fused(x, tb.stages, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_intt_matches_jnp(tb):
    x = _rand(tb, 5, seed=1)
    want = ntt_mod.intt(x, tb)
    got = pallas_ntt.intt_fused(x, tb.stages, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_roundtrip(tb):
    x = _rand(tb, 3, seed=2)
    y = pallas_ntt.ntt_fused(x, tb.stages, interpret=True)
    back = pallas_ntt.intt_fused(y, tb.stages, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_fused_pads_odd_batch(tb):
    # batch not a multiple of the kernel block size
    x = _rand(tb, 33, seed=3)
    want = ntt_mod.ntt(x, tb)
    got = pallas_ntt.ntt_fused(x, tb.stages, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_slice_limbs_slices_stages(tb):
    sub = tb.slice_limbs(1, 3)
    assert sub.stages.twA.shape[0] == 2
    x = _rand(sub, 2, seed=4)
    want = ntt_mod.ntt(x, sub)
    got = pallas_ntt.ntt_fused(x, sub.stages, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
