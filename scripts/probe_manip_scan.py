#!/usr/bin/env python
"""End-to-end Manipulator.generate timing: per-batch dispatch loop vs the
scan-batched bulk path (round 4 serving work).

The scan path folds all full batches into ONE dispatched program, so bulk
generation pays one relay/host round trip instead of one per batch
(7-14 ms each measured; BASELINE.md r4 measurement note). This probe
times the PUBLIC API both ways — wall time including normalization and
the host fetch — which is the number a reference `visual.py` user
actually feels.

Timing hygiene (ROADMAP r4 postscript): distinct seeds per repetition so
no dispatch can be served memoized, and the API itself fetches results
to host (np.asarray), which forces completion.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sp_gan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax
    import numpy as np

    from sp_gan_tpu.config import Config
    from sp_gan_tpu.manipulate import Manipulator
    from sp_gan_tpu.train import create_train_state

    N, BS, n = 2048, 32, 1024
    cfg = Config(np=N, bs=BS, nk=20, nz=128, dtype="mixed_edge",
                 donate_state=False)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    man = Manipulator(cfg, state.g_params, state.g_stats)

    for mode, scan, wire in (("loop", False, None), ("scan", True, None),
                             ("scan+bf16wire", True, "bfloat16")):
        # warm at the FULL n: the scan program's length is a traced shape,
        # so a shorter warm-up would compile a different program
        man.generate(n, seed=999, batch=BS, scan=scan, wire_dtype=wire)
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            out = man.generate(n, seed=1000 * (rep + 1), batch=BS, scan=scan,
                               wire_dtype=wire)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(json.dumps({
            "measure": f"Manipulator.generate({n}) N={N} bs={BS} {mode}",
            "clouds_per_sec": round(n / dt, 1),
            "wall_s": round(dt, 3),
            "device": str(jax.devices()[0])}), flush=True)
        del out


if __name__ == "__main__":
    main()
