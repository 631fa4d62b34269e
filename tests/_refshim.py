"""Import the in-image reference implementation (/root/reference, torch) for
golden-value parity tests.

The reference pins functorch 0.2 (scripts/req_1.txt); this image ships torch 2.13
where jacfwd/vmap live in torch.func, so we register a `functorch` alias module
before importing. trimesh/tabulate are import-time deps of lib/utils/evaluate.py
used only inside functions the parity tests never call; stub them when absent.

All reference modules used here are pure torch/numpy/scipy (verified:
lib/cov_mixed.py, lib/nll/*, lib/transforms/*, lib/optim/*, lib/utils/grad.py,
lib/utils/error6d.py, floatbits.py, symmetry.py, losses.py import no CUDA, mmcv,
torchvision, or dataset tooling).
"""
from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"

_cache = None


def _stub_module(name: str):
    if name in sys.modules:
        return
    try:
        __import__(name)
    except ImportError:
        sys.modules[name] = types.ModuleType(name)


def load_reference():
    """Import the reference modules once; returns a namespace object."""
    global _cache
    if _cache is not None:
        return _cache

    import torch.func as tf

    if "functorch" not in sys.modules:
        m = types.ModuleType("functorch")
        m.jacfwd = tf.jacfwd
        m.jacrev = tf.jacrev
        m.vmap = tf.vmap
        m.grad = tf.grad
        sys.modules["functorch"] = m

    for name in ("trimesh", "tabulate", "tqdm"):
        _stub_module(name)
    # lib/utils/evaluate.py does `from tabulate import tabulate` at import time
    tab = sys.modules.get("tabulate")
    if tab is not None and not hasattr(tab, "tabulate"):
        tab.tabulate = lambda *a, **k: ""

    if REF_ROOT not in sys.path:
        sys.path.append(REF_ROOT)  # append: never shadow repo/site modules

    import floatbits as ref_floatbits
    import symmetry as ref_symmetry
    import losses as ref_losses
    from lib import cov_mixed as ref_cov_mixed
    from lib import transforms as ref_xforms
    from lib.transforms import rotation_conversions as ref_rcvt
    from lib.nll import pnp_auto as ref_pnp_auto
    from lib.nll import pnp_utils as ref_pnp_utils
    from lib.optim import ranger as ref_ranger
    from lib.optim import lr_scheduler as ref_lr_scheduler
    from lib.utils import grad as ref_grad
    from lib.utils import error6d as ref_error6d

    ns = types.SimpleNamespace(
        floatbits=ref_floatbits,
        symmetry=ref_symmetry,
        losses=ref_losses,
        cov_mixed=ref_cov_mixed,
        xforms=ref_xforms,
        rcvt=ref_rcvt,
        pnp_auto=ref_pnp_auto,
        pnp_utils=ref_pnp_utils,
        ranger=ref_ranger,
        lr_scheduler=ref_lr_scheduler,
        grad=ref_grad,
        error6d=ref_error6d,
    )
    _cache = ns
    return ns


def evaluate_module():
    """lib.utils.evaluate needs trimesh/tabulate stubs; import on demand."""
    load_reference()
    from lib.utils import evaluate as ref_evaluate
    return ref_evaluate
