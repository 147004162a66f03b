"""Import the ACTUAL upstream SP-GAN torch modules for parity checks.

The north-star fidelity contract of this framework is that a checkpoint
trained here, exported with `compat.torch_export`, loads into the real
`/root/reference/Generation/Generator.py:91-198` / `Discriminator.py:48-114`
with `strict=True` and produces the same outputs — checked against the
upstream source itself, not a re-transcription (a transcription error common
to a replica oracle and the converter would pass silently).

The only obstacle to importing the upstream modules on a CUDA-less host is
`Generation/modules.py:17` (`from metrics.pointops import pointops`), which
loads a compiled CUDA extension at module-import time even though the live
Generator/Discriminator forward paths never call it. `load_reference_modules`
pre-seeds `sys.modules` with inert stand-ins for that import chain and then
imports the genuine modules.

This module never executes reference code beyond importing those class
definitions; everything else in this package remains an independent
TPU-native design.
"""

from __future__ import annotations

import os
import sys
import types
from typing import Tuple

REF_ROOT = "/root/reference"


def reference_available(ref_root: str = REF_ROOT) -> bool:
    return os.path.exists(os.path.join(ref_root, "Generation", "Generator.py"))


def load_reference_modules(ref_root: str = REF_ROOT) -> Tuple[type, type]:
    """Return the upstream `(Generator, Discriminator)` classes.

    Stubs `metrics` / `metrics.pointops` in `sys.modules` (the CUDA
    extension import at `Generation/modules.py:17`) before importing the
    real `Generation.Generator` / `Generation.Discriminator`.
    """
    for name in ("metrics", "metrics.pointops"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = None
            sys.modules[name] = mod
    # the `from metrics.pointops import pointops` form needs the attribute
    # to exist on the metrics.pointops module object
    if not hasattr(sys.modules["metrics.pointops"], "pointops"):
        stub = types.ModuleType("metrics.pointops.pointops")
        sys.modules["metrics.pointops"].pointops = stub
        sys.modules["metrics"].pointops = sys.modules["metrics.pointops"]
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    from Generation.Discriminator import Discriminator  # noqa: PLC0415
    from Generation.Generator import Generator  # noqa: PLC0415
    assert Generator.__module__ == "Generation.Generator", (
        "imported a shadowed Generator, not the upstream module")
    assert Discriminator.__module__ == "Generation.Discriminator", (
        "imported a shadowed Discriminator, not the upstream module")
    return Generator, Discriminator


def make_opts(cfg) -> types.SimpleNamespace:
    """The argparse-namespace surface the upstream constructors read
    (`Generator.py:93-101`, `Discriminator.py:53`), built from this
    framework's Config. `softmax` has no Config counterpart: it is read
    but unused on the live path (`Generator.py:98` binds a local that
    only the dead bilateral-interpolation block consumes)."""
    return types.SimpleNamespace(
        np=cfg.np, nk=cfg.nk, nz=cfg.nz, off=cfg.off, attn=cfg.attn,
        use_head=cfg.use_head, eql=cfg.eql, z_norm=cfg.z_norm,
        small_d=cfg.small_d, softmax=True,
    )
