"""Shared harness: config -> model/loss/data/optimizer wiring, test loop.

The glue the reference spreads over train.py / test.py / utils.py, built once here
and used by both CLI entry points and the tests.
"""
from __future__ import annotations

import functools
import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import inference
from .data.pipeline import BOPDataset, Loader, device_preprocess
from .eval.evaluator import Evaluator, gen_score_table
from .geom.pose import pose7_to_RT
from .loss import LossConfig
from .models import build_model

logger = logging.getLogger(__name__)


def make_loss_config(cfg, steps_per_epoch: int, bit_cnt) -> LossConfig:
    lc = cfg.loss
    pose_cfg = lc.get('pose_loss_cfg', {})
    full = max(lc.get('pose_loss_start_step', 0),
               lc.get('pose_loss_start_epoch', 0) * steps_per_epoch)
    return LossConfig(
        w_loss_noc=lc.get('w_loss_noc', 0.0),
        w_loss_noc_bin=lc.get('w_loss_noc_bin', 0.0),
        w_loss_seg=lc.get('w_loss_seg', 0.0),
        w_loss_pose=lc.get('w_loss_pose', 0.0),
        w_loss_kpts=lc.get('w_loss_kpts', 0.0),
        seg_loss_type=lc.get('seg_loss_type', 'BCE').lower(),
        full_pose_loss_step=int(full),
        loss_pose_nz_step=lc.get('loss_pose_nz_step', 0),
        dense_sample=pose_cfg.get('dense_sample', 2),
        max_err_len=pose_cfg.get('max_err_len', 32),
        cov_2d=pose_cfg.get('cov_2d', False),
        clip_weight_grad=pose_cfg.get('clip_weight_grad', True),
        clip_scale_grad=pose_cfg.get('clip_scale_grad', False),
        clip_pts_grad=pose_cfg.get('clip_pts_grad', False),
        bit_cnt=tuple(bit_cnt) if bit_cnt else None,
        black_background=cfg.get('black_background', False),
        sparse=cfg.get('sparse_cnt', 0) > 3,
    )


def build_model_from_cfg(cfg, total_bit_cnt: int):
    return build_model(cfg.model.net_name, dict(cfg.model.get('net_config', {})),
                       sparse_cnt=cfg.get('sparse_cnt', 0),
                       total_bit_cnt=total_bit_cnt)


def make_datasets(cfg, train: bool = True, seed: int = 0):
    """Returns (dataset(s), loader) — a RatioMixLoader when train_dataset_1 exists
    (reference utils.py:79-147, MultiLoader).

    Train loaders are shard-aware on multi-process runs: each host assembles
    only its 1/process_count slice of every global batch (the streams are pure
    functions of global (seed, epoch, index) so the union is unchanged), and
    train() places the local rows directly via shard_local_batch."""
    import jax
    batch = cfg.dataloader.batch_size
    proc = dict(process_index=jax.process_index(),
                process_count=jax.process_count()) if train else {}
    if train and 'train_dataset_1' in cfg:
        import copy
        d1_cfg = copy.deepcopy(cfg.train_dataset_1)
        for k, v in cfg.train_dataset.items():
            if k not in d1_cfg:
                d1_cfg[k] = v
        b1 = int(batch * cfg.train_dataset_1.ratio)
        pc = proc.get('process_count', 1)
        if pc > 1 and (b1 % pc or (batch - b1) % pc):
            # each sub-stream is carved into equal per-process slices (the
            # concatenated local rows must be exactly this process's 1/pc of
            # the global mixed batch), so BOTH sub-batches must divide the
            # process count — stricter than the global batch_size check
            raise ValueError(
                f'ratio-mixed sharded loading: sub-batches {b1} and '
                f'{batch - b1} (batch_size {batch} × ratio '
                f'{cfg.train_dataset_1.ratio}) must each be divisible by '
                f'{pc} processes — adjust batch_size or ratio')
        ds1 = BOPDataset(d1_cfg, cfg, train=True)
        ds0 = BOPDataset(cfg.train_dataset, cfg, train=True)
        nw = max(cfg.dataloader.get('num_workers', 4) // 2, 1)
        l1 = Loader(ds1, b1, seed=seed, num_threads=nw, **proc)
        l0 = Loader(ds0, batch - b1, seed=seed + 1, num_threads=nw, **proc)
        return ds0, RatioMixLoader(l0, l1)
    ds_cfg = cfg.train_dataset if train else cfg.test_dataset
    if train and cfg.dataloader.get('multiprocess', False):
        from .data.pipeline import MPLoader
        loader = MPLoader(ds_cfg, cfg, batch_size=batch, train=True, seed=seed,
                          num_workers=cfg.dataloader.get('num_workers', 8),
                          **proc)
        return loader.ds, loader
    ds = BOPDataset(ds_cfg, cfg, train=train)
    loader = Loader(ds, batch, seed=seed, shuffle=train, drop_last=train,
                    num_threads=cfg.dataloader.get('num_workers', 4), **proc)
    return ds, loader


class RatioMixLoader:
    """Endless mixer of two loaders into one batch (real + PBR ratio mixing)."""

    def __init__(self, loader0: Loader, loader1: Loader):
        self.l0, self.l1 = loader0, loader1
        self.i0 = iter(self.l0)
        self.i1 = iter(self.l1)

    @property
    def process_count(self):
        # shard-aware when the sub-loaders are: the concatenated local batch
        # is this process's rows of both sub-streams (a fixed permutation of
        # the contiguous global carving — harmless, batch rows are exchangeable
        # under the data-parallel mean and GSPMD's cross-shard reductions)
        return self.l0.process_count

    def __len__(self):
        return max(len(self.l0), len(self.l1))

    def set_position(self, batch_index: int):
        """Resume both sub-streams at the given global (mixed-)batch index: each
        sub-loader has consumed exactly that many of its own batches."""
        self.l0.set_position(batch_index)
        self.l1.set_position(batch_index)
        self.i0 = iter(self.l0)
        self.i1 = iter(self.l1)

    def _next(self, which: int):
        it = self.i0 if which == 0 else self.i1
        try:
            return next(it)
        except StopIteration:
            if which == 0:
                self.i0 = iter(self.l0)
                return next(self.i0)
            self.i1 = iter(self.l1)
            return next(self.i1)

    def __iter__(self):
        return self

    def __next__(self):
        b0 = self._next(0)
        b1 = self._next(1)
        out = {}
        for k in b0:
            a, b = b0[k], b1[k]
            if a.ndim >= 3 and k == 'Rt_candi' and a.shape[1] != b.shape[1]:
                mk = max(a.shape[1], b.shape[1])
                a = np.concatenate(
                    (a, np.repeat(a[:, :1], mk - a.shape[1], 1)), 1)
                b = np.concatenate(
                    (b, np.repeat(b[:, :1], mk - b.shape[1], 1)), 1)
            out[k] = np.concatenate((a, b), axis=0)
        return out


def preprocess_kwargs(cfg, dataset, train: bool) -> dict:
    ds_cfg = cfg.train_dataset if train else cfg.test_dataset
    return dict(
        net_input_wh=tuple(dataset.net_input_wh),
        net_output_wh=tuple(dataset.net_output_wh),
        mask_nearest=dataset.mask_nearest,
        use_pepper_salt=ds_cfg.get('use_peper_salt', False),
        use_motion_blur=ds_cfg.get('use_motion_blur', False),
        use_invert=ds_cfg.get('use_invert', False),
        train=train,
    )


def get_evaluator(cfg) -> Evaluator:
    ds = cfg.test_dataset
    return Evaluator(list(ds.list_files), ds.dataset_root, ds.get('name'),
                     eval_model_dir=ds.get('eval_model_dir'),
                     obj_ids=cfg.get('obj_ids'),
                     use_eval_model=ds.get('use_eval_model', True),
                     visib_fract_th=ds.visib_frac)


@functools.lru_cache(maxsize=8)
def _jitted_apply(model, int8: bool):
    """One jitted eval-forward per (model, precision) — flax Modules hash by
    definition, so repeated run_test calls (e.g. in-training eval every
    test_every steps) reuse the compiled program instead of re-tracing a fresh
    lambda. int8=True traces the forward under models.quant.quantized_int8
    (interception is a trace-time effect, so it must be part of the jit cache
    key — hence an argument here, not a context around the call site).
    int8 is required-positional so every caller spells it and (model,) /
    (model, False) can't occupy two lru_cache slots with the same program."""
    if int8:
        from .models.quant import quantized_int8

        def apply_q(v, x):
            with quantized_int8():
                return model.apply(v, x, train=False)
        return jax.jit(apply_q)
    return jax.jit(lambda v, x: model.apply(v, x, train=False))


def run_test(cfg, model, variables, loader, dataset, evaluator,
             score_key: str = 'add(-s)_0.10', seed: int = 0, mesh=None) -> dict:
    """Full inference + evaluation pass (reference test.py:151-186).

    With a mesh, eval batches are padded to a device multiple (repeating the
    last crop; padded rows dropped from results) and sharded over the 'data'
    axis; the CNN, decode, RANSAC and LM refine then all run SPMD."""
    solver_cfg = cfg.pnp_solver
    bit_cnt = dataset.bit_cnt
    black_bg = cfg.get('black_background', False)
    pp_kwargs = preprocess_kwargs(cfg, dataset, train=False)
    sparse = cfg.get('sparse_cnt', 0) > 3
    key = jax.random.PRNGKey(seed)

    from .parallel.mesh import fetch_global, pad_to_multiple, replicate, \
        shard_batch
    if mesh is not None:
        variables = replicate(mesh, variables)

    # int8_inference: true (or --opts int8_inference=true) runs the CNN with
    # int8 convolutions on the MXU's 2x-rate path (models/quant.py); decode,
    # RANSAC and LM are unchanged. No reference counterpart (f32 CUDA there).
    # int8_act_scales: 'dynamic' (default; per-sample scales, calibration-free)
    # or 'static' — per-conv scales calibrated on the FIRST eval batch, then
    # fixed; removes the per-conv amax/rewrite HBM passes (the fast serving
    # mode — see BASELINE.md int8 roofline). Static eval results therefore
    # depend (weakly: scales only) on the first batch's composition.
    int8 = bool(cfg.get('int8_inference', False))
    int8_static = int8 and str(cfg.get('int8_act_scales',
                                       'dynamic')) == 'static'
    apply_fn = None if int8_static else _jitted_apply(model, int8)
    results: dict[str, list] = {}
    total_time = 0.0
    n_insts = 0
    first_time = first_insts = None       # first batch pays the JIT compile
    for batch in loader:
        t_start = time.perf_counter()
        n_valid = len(batch['im_id'])
        key, k_solve = jax.random.split(key)
        if mesh is not None:
            batch, n_valid = pad_to_multiple(batch, mesh.devices.size)
            dev_batch = shard_batch(mesh, batch)
        else:
            dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        gt = device_preprocess(dev_batch, key, **pp_kwargs)
        if apply_fn is None:            # int8_act_scales: static — calibrate
            from .models.quant import calibrate_act_scales, quantized_int8
            scales = calibrate_act_scales(
                lambda b: model.apply(variables, b, train=False),
                [gt['img_in']])

            def apply_static(v, x, _s=scales):
                with quantized_int8(act_scales=_s):
                    return model.apply(v, x, train=False)
            apply_fn = jax.jit(apply_static)
        out = apply_fn(variables, gt['img_in'])
        rel = solver_cfg.get('rel_reproj_err', False)
        # relative threshold = 2 px at full-image scale (reference test.py:57,115-117)
        thr = jnp.asarray(2.0 / np.asarray(batch['out_pix_scale']),
                          jnp.float32) if rel else None
        if sparse:
            states = inference.solve_pnp_sparse(
                out, gt, k_solve, solvers=tuple(solver_cfg.solvers),
                reproj_err=thr)
        else:
            states = inference.solve_pnp_dense(
                out, gt, k_solve, bit_cnt=bit_cnt, black_background=black_bg,
                sample=solver_cfg.get('dense_sample', 2),
                point_select=solver_cfg.get('dense_point_select', 'quantile'),
                quantile=solver_cfg.get('quantile', 0.3),
                seg_thresh=solver_cfg.get('seg_thresh', 0.5),
                solvers=tuple(solver_cfg.solvers), reproj_err=thr)

        im_ids = batch['im_id'].tolist()
        scene_ids = batch['scene_id'].tolist()
        obj_ids = batch['obj_id'].tolist()
        scores = batch.get('det_score', np.ones(len(im_ids), np.float32))
        states = {k: fetch_global(v) for k, v in states.items()}
        batch_time = time.perf_counter() - t_start
        total_time += batch_time
        n_insts += n_valid
        if first_time is None:
            first_time, first_insts = batch_time, n_valid
        for name, pose7 in states.items():
            R, t = pose7_to_RT(pose7)
            R = np.asarray(R)
            t = np.asarray(t)
            lst = results.setdefault(name, [])
            for i in range(n_valid):
                lst.append(dict(obj_id=obj_ids[i], im_id=im_ids[i],
                                scene_id=scene_ids[i], R_est=R[i], t_est=t[i],
                                score=float(scores[i])))

    # BOP 'time' column: the toolkit requires ONE value per image (all of an
    # image's estimates must agree, pysixd/inout.py:393-407), and crops of the
    # same image can land in different batches — so report the uniform
    # steady-state mean wall time per instance, EXCLUDING the first batch
    # (which pays the JIT compile and would inflate the figure well above the
    # per-instance cost BOP time is meant to capture). Falls back to the
    # all-batches mean on a single-batch run. Reference hardcodes -1
    # (test.py:191).
    if first_time is not None and n_insts > first_insts:
        mean_time = (total_time - first_time) / (n_insts - first_insts)
    else:
        mean_time = total_time / max(n_insts, 1)
    for lst in results.values():
        for r in lst:
            r['time'] = mean_time

    outputs = {}
    bop_scores = bool(cfg.get('eval_bop_scores', False))
    for name, res in results.items():
        per_obj, errors = evaluator.evaluate(res, bop=bop_scores)
        tables = gen_score_table(per_obj, dataset_name=evaluator.dataset_name)
        avg = sum(d[score_key] for d in per_obj.values()) / max(len(per_obj), 1)
        outputs[name] = dict(avg_score=avg, per_obj_score=per_obj,
                             errors=errors, tables=tables)
        logger.info('solver %s: %s = %.4f', name, score_key, avg)
    return outputs
