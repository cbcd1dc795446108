"""Profile the traceback kernel on the HiFi CIGAR workload."""
import sys
import time

sys.path.insert(0, ".")
import os
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/wfa_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.traceback_pallas import TracebackConfig, traceback_batch_device
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.schedule import build_schedule
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_seq_file
from pathlib import Path

batch = read_seq_file(Path("tests/data/test_hifi.seq"))
reps = 8
pats = batch.patterns * reps
txts = batch.texts * reps
n = len(pats)
lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
pen = Penalties(2, 3, 1)
sched = build_schedule(pen, 3000, None)
cfg = PallasConfig(
    penalties=pen, max_steps=3000, wf_width=512, tile_batch=8, band=25,
    compute_cigar=True, score_cap=sched.unfinished_score + 1,
)
args = (
    jnp.asarray(pat), jnp.asarray(txt),
    jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
)
tkd = jnp.asarray(tlen) - jnp.asarray(plen)
out = align_batch_pallas(cfg, *args)

for tb_b in [int(v) for v in sys.argv[1:]] or [8]:
    tb_cfg = TracebackConfig(
        penalties=pen, wf_width=512, score_cap=cfg.score_cap, banded=True,
        lo_pad=cfg.lo_pad, tile_batch=tb_b,
    )
    tb = traceback_batch_device(
        tb_cfg, out["choice_words"], out["lo_trace"],
        out["distance"], out["finished"], tkd,
    )
    no = np.asarray(tb["n_ops"])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        tb = traceback_batch_device(
            tb_cfg, out["choice_words"], out["lo_trace"],
            out["distance"], out["finished"], tkd,
        )
        tb["n_ops"].block_until_ready()
        best = min(best, time.time() - t0)
    print(f"TB={tb_b}: walk {best*1e3:.1f}ms for {n} aln "
          f"({best/n*1e6:.1f}us/aln), max n_ops={no.max()}, ok={(no>=0).all()}")
