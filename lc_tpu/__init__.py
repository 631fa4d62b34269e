"""lc_tpu — a TPU-native JAX/Flax/Pallas framework for linear-covariance 6D pose estimation.

Re-designed from scratch for TPU (reference: fulliu/lc, PyTorch+Ceres). The compute path is
pure JAX (jit/vmap/shard_map) with Pallas kernels for the hot ops; the runtime around it
(data decode, caching, native host ops) lives in `lc_tpu.data` and `native/`.

Layers (bottom-up):
  geom     — rotations, pinhole projection, affine-crop math, symmetry handling
  codec    — ZebraPose-style Gray-code NOC codec ("floatbits")
  pnp      — batched differentiable PnP: analytic jacobians, LM solver (Ceres replacement),
             RANSAC initializer (cv2.solvePnPRansac replacement), covariance machinery
  loss     — the Linear-Covariance loss and surrogate losses
  models   — Flax CDPN-ResNet34 and Zebra-DeepLabV3 dense-correspondence networks
  data     — BOP dataset loading, device-side crop/augment pipeline
  optim    — Ranger optimizer (optax), flat-and-anneal schedule
  parallel — mesh/pjit/shard_map data-parallel training step
  eval     — ADD(-S) / AUC evaluation, BOP CSV export
  utils    — config system, checkpointing, logging
"""

__version__ = "0.1.0"

import jax as _jax

# TPU default matmul precision is bf16, which is catastrophic for the PnP/geometry
# linear algebra (e.g. rotation-error trace loses ~5°, normal equations lose
# digits). Force true-f32 matmuls for f32 operands globally; the CNNs opt into
# bf16 explicitly via their compute dtype (models/layers.py), which this setting
# does not affect.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: first compiles through the TPU toolchain are
# minutes-long; cache them across processes (harmless on CPU). The directory
# is keyed by a host-CPU-feature fingerprint: XLA:CPU executables are AOT
# machine code, and jax's cache key does not fully cover the target machine
# features — loading an executable cached by a host with a different
# microarchitecture SIGILLs/segfaults (observed: cpu_aot_loader "machine type
# doesn't match" warnings followed by a segfault inside cache deserialization
# when a previous host's avx512-variant entries were reloaded).
import hashlib as _hashlib
import os as _os
import platform as _platform


def _machine_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return _hashlib.sha1(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    return _platform.machine() or "unknown"


# The persistent cache stays OFF for CPU runs (tests, TPU-less hosts): XLA:CPU
# executable deserialization has been observed to segfault on reload of large
# while-loop programs (reproducible at tests/test_parity_ransac.py with a
# clean same-machine cache), and CPU compiles here are ~a minute at worst.
# TPU compiles are the minutes-long ones and their serialized form is stable.
#
# The platform test must not initialize a backend (that can block on a remote
# TPU relay at import time), so it reads only the EXPLICIT selections: the
# JAX_PLATFORMS env var and jax.config's jax_platforms (set e.g. by a TPU
# plugin's sitecustomize before user imports). No explicit non-CPU selection →
# assume CPU and leave the cache off; an explicit LC_TPU_JAX_CACHE always wins.
_cache_dir = _os.environ.get("LC_TPU_JAX_CACHE")
_explicit_cache = _cache_dir is not None
if _cache_dir is None:
    _cache_dir = f"/tmp/lc_tpu_jax_cache_{_machine_tag()}"


def _platform_hint() -> str:
    env = _os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if env:
        return env
    try:
        cfg = getattr(_jax.config, "jax_platforms", None)
    except Exception:  # noqa: BLE001
        cfg = None
    if cfg:
        return str(cfg).strip().lower()
    # standard Cloud TPU hosts select the backend by PLUGIN DISCOVERY, not an
    # explicit JAX_PLATFORMS — find_spec is a metadata lookup that initializes
    # nothing, and a host with libtpu installed is there to run TPU programs
    # (whose minutes-long compiles are exactly what the cache is for)
    import importlib.util as _ilu
    try:
        if _ilu.find_spec("libtpu") is not None:
            return "tpu"
    except Exception:  # noqa: BLE001
        pass
    return ""


_hint = _platform_hint()
if _explicit_cache or (_hint and not _hint.startswith("cpu")):
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — older jax without these options
        pass

