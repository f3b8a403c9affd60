"""Threshold-CKKS secure aggregation as a first-class Scheme.

BEYOND the reference: its threshold/multiparty CKKS lives only in a
standalone C++ timing experiment (code/mkhe/mkhe.cpp) and is never wired
into the FL pipeline — the production path trusts every learner with the
single secret key (ckks.cpp:11-23 loads key-private everywhere). Here the
mkhe ceremony becomes a drop-in `Scheme`: **no party ever holds the joint
secret key**. Keys are additive shares (threshold.py), encryption is under
the joint public key, and decryption is the all-party
MultipartyDecryptLead/Main + Fusion ceremony — run as ONE jitted dispatch
(threshold.threshold_decrypt) in this single-process simulation, with the
per-party protocol functions available for a real multi-machine
deployment (each machine computing its own partial).

API surface is the reference binding's (scheme.h:23-30) via the CKKS base
class; `fedavg_round` / `fhe_fedavg` work unchanged (the fused symmetric
kernel is correctly bypassed — threshold mode has no single sk — so
rounds stage pk-encrypt -> fused weighted sum -> threshold decrypt).

    helper = ThresholdCKKS(parties=3, cryptodir=...)
    helper.genCryptoContextAndKeyGen()     # ceremony + persist shares
    agg = fhe_fedavg(helper, client_pytrees, weights)
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax

from ..ckks import keys as ckks_keys
from ..ckks import ops as ckks_ops
from ..ckks import serial as ckks_serial
from ..ckks import threshold as thr
from .api import CKKS, _CTX_FILE, _PK_FILE
from .scheme import register_scheme


def _share_file(i: int) -> str:
    return f"key-share-{i}.txt"


@register_scheme("ckks-threshold")
class ThresholdCKKS(CKKS):
    def __init__(self, scheme: str = "ckks-threshold",
                 batchSize: int = 4096, scaleFactorBits: int = 52,
                 cryptodir: str = "../resources/cryptoparams/",
                 parties: int = 3, mult_depth: int = 1,
                 dense_pack: bool = False, seed: int | None = None):
        super().__init__("ckks-threshold", batchSize, scaleFactorBits,
                         cryptodir, mult_depth=mult_depth,
                         dense_pack=dense_pack, symmetric=False, seed=seed)
        self.parties = int(parties)
        self._secrets: thr.PartySecrets | None = None

    # -- key lifecycle -----------------------------------------------------

    def genCryptoContextAndKeyGen(self) -> int:
        """Run the full multiparty keygen ceremony (chained MultipartyKeyGen,
        mkhe.cpp:281-304, batched to one dispatch) and persist the joint pk
        plus each party's share. SIMULATION-ONLY: this process runs every
        party's role and keeps all shares; a deployment keeps
        key-share-i.txt on party i's machine only and runs the per-party
        protocol functions (threshold.py) there. The full 128-bit PRNG
        key roots the ceremony (per-party streams are fold_in-derived,
        domain-separated — see threshold._root_key)."""
        ctx = self.ctx
        secrets, pk = thr.multiparty_keygen_batched(ctx, self.parties,
                                                    seed=self._next_key())
        self._secrets, self._pk = secrets, pk
        os.makedirs(self.cryptodir, exist_ok=True)
        meta = dict(scheme="ckks-threshold", batchSize=self.batchSize,
                    scaleFactorBits=self.scaleFactorBits,
                    mult_depth=self.mult_depth, parties=self.parties,
                    ring_dim=self._params.ring_dim,
                    moduli=list(self._params.moduli),
                    num_base=self._params.num_base)
        with open(os.path.join(self.cryptodir, _CTX_FILE), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(self.cryptodir, _PK_FILE), "wb") as f:
            f.write(ckks_serial.serialize_public_key(ctx, pk))
        for i in range(self.parties):
            blob = ckks_serial.serialize_secret_key(
                ctx, secrets.party(i))
            with open(os.path.join(self.cryptodir, _share_file(i)),
                      "wb") as f:
                f.write(blob)
        return 1

    def loadCryptoParams(self) -> None:
        with open(os.path.join(self.cryptodir, _CTX_FILE)) as f:
            meta = json.load(f)
        if (meta.get("scheme") != "ckks-threshold"
                or meta["batchSize"] != self.batchSize
                or meta["scaleFactorBits"] != self.scaleFactorBits
                or meta["parties"] != self.parties
                or meta.get("mult_depth") != self.mult_depth
                or meta.get("ring_dim") != self._params.ring_dim
                or meta.get("moduli") != list(self._params.moduli)):
            raise ValueError("persisted threshold context does not match "
                             "constructor parameters (scheme/batchSize/"
                             "scaleFactorBits/parties/mult_depth/ring_dim/"
                             "moduli must all agree)")
        with open(os.path.join(self.cryptodir, _PK_FILE), "rb") as f:
            self._pk = ckks_serial.deserialize_public_key(f.read())
        shares = []
        for i in range(self.parties):
            with open(os.path.join(self.cryptodir, _share_file(i)),
                      "rb") as f:
                shares.append(ckks_serial.deserialize_secret_key(f.read()))
        import jax.numpy as jnp
        self._secrets = thr.PartySecrets(
            s=jnp.stack([sk.s for sk in shares]),
            s_shoup=jnp.stack([sk.s_shoup for sk in shares]))

    # -- decryption: the threshold ceremony --------------------------------

    def _dec_keys(self):
        # split already yields a (P,)-shaped key array — one fresh
        # smudging stream per party per decryption
        return jax.random.split(self._next_key(), self.parties)

    def decrypt(self, learner_data: bytes,
                data_dimensions: int) -> np.ndarray:
        if self._secrets is None:
            raise RuntimeError("call loadCryptoParams() or "
                               "genCryptoContextAndKeyGen() first")
        ct = ckks_serial.deserialize_ct(self.ctx, learner_data)
        vals = np.asarray(thr.threshold_decrypt(
            self.ctx, self._secrets, ct, self._dec_keys()))
        return self._unpack(vals, int(data_dimensions))

    def decrypt_cohort(self, ct: ckks_ops.Ciphertext,
                       data_dimensions: int | None = None, *,
                       raw: bool = False):
        if self._secrets is None:
            raise RuntimeError("call loadCryptoParams() first")
        dev = thr.threshold_decrypt(self.ctx, self._secrets, ct,
                                    self._dec_keys())
        if raw:
            return dev
        return self._unpack(np.asarray(dev), int(data_dimensions))

    # -- fused one-dispatch threshold round --------------------------------

    def _round_slice(self, packed, scaling_factors, fused: bool):
        """One (K, chunks, N) slice of a round. fused=True runs joint-pk
        encrypt -> weighted sum -> threshold decrypt ceremony as ONE XLA
        computation (threshold.threshold_round_fused) — the threshold
        analogue of the symmetric fused round, which cannot apply here
        (no single sk exists)."""
        if fused and self._secrets is not None:
            return thr.threshold_round_fused(
                self.ctx, self._secrets, self._pk, packed,
                self._next_key(), self._dec_keys(),
                [float(s) for s in scaling_factors])
        return super()._round_slice(packed, scaling_factors, fused=False)

    # -- per-party protocol surface (deployment shape) ---------------------

    def partial_decrypt(self, party: int, learner_data: bytes,
                        rng_key=None) -> np.ndarray:
        """Party `party`'s published share for a serialized ciphertext:
        MultipartyDecryptLead (party 0) / Main (others), mkhe.cpp:392-401.
        In deployment each machine calls this with only its own share."""
        if self._secrets is None:
            raise RuntimeError("call loadCryptoParams() or "
                               "genCryptoContextAndKeyGen() first")
        if not 0 <= party < self.parties:
            raise ValueError(f"party {party} out of range "
                             f"[0, {self.parties})")
        ct = ckks_serial.deserialize_ct(self.ctx, learner_data)
        key = rng_key if rng_key is not None else self._next_key()
        fn = (thr.partial_decrypt_lead if party == 0
              else thr.partial_decrypt_main)
        return np.asarray(fn(self.ctx, self._secrets.party(party), ct, key))

    def fuse_partials(self, partials, learner_data: bytes,
                      data_dimensions: int) -> np.ndarray:
        """MultipartyDecryptFusion (mkhe.cpp:402) of published shares."""
        if self._secrets is None:
            raise RuntimeError("call loadCryptoParams() or "
                               "genCryptoContextAndKeyGen() first")
        ct = ckks_serial.deserialize_ct(self.ctx, learner_data)
        import jax.numpy as jnp
        vals = np.asarray(thr.fuse_decrypt(
            self.ctx, [jnp.asarray(p) for p in partials], ct.scale))
        return self._unpack(vals, int(data_dimensions))
