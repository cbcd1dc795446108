"""Quick interpret-mode equivalence check for the persistent staged window
(PallasConfig.persistent_stage): distances/finished must be bit-identical
with the feature on and off, banded and exact, including CIGAR choice
tables.  Small shapes so it runs in seconds on one CPU core."""
import sys

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties
import jax.numpy as jnp

rng = np.random.default_rng(17)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)


def mutate(p, err):
    out = list(p)
    for _ in range(int(len(p) * err)):
        op = rng.choice(list("XID"))
        pos = rng.integers(0, max(1, len(out)))
        if op == "X":
            out[pos : pos + 1] = [rng.choice(bases)]
        elif op == "I":
            out.insert(pos, rng.choice(bases))
        elif len(out) > 1:
            del out[pos]
    return bytes(out)


B = 8
pats = [rng.choice(bases, size=int(rng.integers(150, 400))).tobytes()
        for _ in range(B)]
txts = [mutate(p, 0.08) for p in pats]
nwp = 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))

pen = Penalties(2, 3, 1)
ok = True
for band, cigar, tsb in [(-1, False, 0), (10, False, 0), (-1, False, -1),
                         (10, False, -1), (10, True, 0)]:
    outs = {}
    for ps in (0, -1):
        cfg = PallasConfig(
            penalties=pen, max_steps=200, wf_width=128, tile_batch=8,
            band=band, compute_cigar=cigar, score_cap=150 if cigar else 0,
            two_score_body=tsb, persistent_stage=ps,
            debug_skip_dma=cigar,  # interpret mode can't run the DMA spill
            extend_span=6, extend_first_span=2,
        )
        with pltpu.force_tpu_interpret_mode():
            out = align_batch_pallas(cfg, *args)
        outs[ps] = {k: np.asarray(v) for k, v in out.items()
                    if k in ("distance", "finished")}
    same = all(
        (outs[0][k] == outs[-1][k]).all() for k in outs[0]
    )
    status = "OK" if same else "MISMATCH"
    if not same:
        ok = False
        print("  off:", outs[0]["distance"], outs[0]["finished"])
        print("  on: ", outs[-1]["distance"], outs[-1]["finished"])
    print(f"band={band} cigar={cigar} tsb={tsb}: {status} "
          f"dist={outs[-1]['distance'].tolist()}", flush=True)
sys.exit(0 if ok else 1)
