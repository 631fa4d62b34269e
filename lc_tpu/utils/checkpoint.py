"""Checkpointing with latest-N / best-N / persist rotations and robust resume.

Semantics match reference lib/utils/checkpoint.py:13-275: atomic tmp-write +
hardlink into ckpts/ (latest-N), ckpts/best/ (best-N, score in filename) and
ckpts/persist/ (every persist_period); resume scans newest-first and skips corrupt
files; finish() exports model_final + model_best and clears rotations.

Serialization: flax msgpack for the pytree (params/opt state/loss state) + a pickled
aux dict (step, score, numpy RNG state).
"""
from __future__ import annotations

import os
import os.path as osp
import pickle
import re

from flax import serialization


def _atomic_write(path: str, data: bytes):
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


class Checkpoint:
    def __init__(self, ckpt_dir: str, *, by: str = 'step', latest_keep: int = 2,
                 best_keep: int = 2, persist_period: int | None = None,
                 resume_period: int = 1):
        self.dir = ckpt_dir
        self.best_dir = osp.join(ckpt_dir, 'best')
        self.persist_dir = osp.join(ckpt_dir, 'persist')
        self.by = by
        self.latest_keep = latest_keep
        self.best_keep = best_keep
        self.persist_period = persist_period
        self.resume_period = resume_period
        self.best_score = -float('inf')
        self._counter = 0

    @classmethod
    def by_step(cls, ckpt_dir: str, resume_period: int = 5000, **kw):
        return cls(ckpt_dir, by='step', resume_period=resume_period, **kw)

    @classmethod
    def by_epoch(cls, ckpt_dir: str, **kw):
        return cls(ckpt_dir, by='epoch', resume_period=1, **kw)

    # ---------- save ----------

    def _serialize(self, state, aux: dict) -> bytes:
        return pickle.dumps({'state': serialization.to_bytes(state),
                             'aux': aux})

    def save(self, state, *, step: int, score: float = -1.0, aux: dict | None = None):
        os.makedirs(self.dir, exist_ok=True)
        aux = dict(aux or {})
        aux.update(step=step, score=score)
        blob = self._serialize(state, aux)
        path = osp.join(self.dir, f'{step:09d}.ckpt')
        _atomic_write(path, blob)
        self._rotate(self.dir, r'^(\d+)\.ckpt$', self.latest_keep)

        if score >= 0 and score > self.best_score:
            self.best_score = score
            os.makedirs(self.best_dir, exist_ok=True)
            best_path = osp.join(self.best_dir, f'{step:09d}_{score:.5f}.ckpt')
            _link_or_copy(path, best_path)
            self._rotate(self.best_dir, r'^\d+_([\d.]+)\.ckpt$', self.best_keep,
                         key='score')
        if self.persist_period and step and step % self.persist_period == 0:
            os.makedirs(self.persist_dir, exist_ok=True)
            _link_or_copy(path, osp.join(self.persist_dir, f'{step:09d}.ckpt'))
        return path

    def step(self, state, *, step: int, score: float = -1.0,
             aux: dict | None = None):
        """Cadence-respecting save (every resume_period steps or when scored)."""
        self._counter += 1
        if (step % self.resume_period == 0) or score >= 0:
            return self.save(state, step=step, score=score, aux=aux)
        return None

    def _rotate(self, directory: str, pattern: str, keep: int,
                key: str = 'name'):
        entries = []
        for f in os.listdir(directory):
            m = re.match(pattern, f)
            if m:
                k = float(m.group(1)) if key == 'score' else f
                entries.append((k, f))
        entries.sort()
        for _, f in entries[:-keep] if keep else entries:
            try:
                os.remove(osp.join(directory, f))
            except OSError:
                pass

    # ---------- load ----------

    def list_ckpts(self):
        if not osp.isdir(self.dir):
            return []
        out = [f for f in os.listdir(self.dir) if re.match(r'^\d+\.ckpt$', f)]
        return sorted(out, reverse=True)

    def resume(self, state_template, ckpt_path: str | None = None):
        """Returns (state, aux) from the newest loadable checkpoint, or
        (state_template, {'step': 0}) when none exists. Corrupt files are skipped
        with a warning (reference checkpoint.py:166-183)."""
        import logging
        logger = logging.getLogger(__name__)
        candidates = [ckpt_path] if ckpt_path else \
            [osp.join(self.dir, f) for f in self.list_ckpts()]
        for path in candidates:
            try:
                with open(path, 'rb') as f:
                    blob = pickle.loads(f.read())
                state = serialization.from_bytes(state_template, blob['state'])
                aux = blob['aux']
                self.best_score = max(self.best_score,
                                      aux.get('score', -float('inf')))
                return state, aux
            except Exception as e:  # noqa: BLE001 — skip corrupt, keep scanning
                logger.warning('skipping unloadable checkpoint %s: %s', path, e)
        logger.warning('no checkpoint to resume from in %s; starting fresh '
                       '(finish() clears resume checkpoints on normal exit)',
                       ckpt_path or self.dir)
        return state_template, {'step': 0}

    def finish(self, state, final_path: str, best_prefix: str):
        """Export model_final + best (by score) and delete rotations
        (reference checkpoint.py:92-110). `state` here is conventionally the
        inference variables ({'params','batch_stats'}), not the full TrainState —
        final exports load without optimizer reconstruction."""
        _atomic_write(final_path, self._serialize(state, {'step': -1}))
        best = []
        if osp.isdir(self.best_dir):
            for f in os.listdir(self.best_dir):
                m = re.match(r'^(\d+)_([\d.]+)\.ckpt$', f)
                if m:
                    best.append((float(m.group(2)), int(m.group(1)), f))
        if best:
            best.sort()
            score, step, fname = best[-1]
            _link_or_copy(osp.join(self.best_dir, fname),
                          f'{best_prefix}_{step}_{score:.5f}.ckpt')
        for d in (self.dir,):
            if osp.isdir(d):
                for f in os.listdir(d):
                    if re.match(r'^\d+\.ckpt$', f):
                        os.remove(osp.join(d, f))


def _link_or_copy(src: str, dst: str):
    try:
        if osp.exists(dst):
            os.remove(dst)
        os.link(src, dst)
    except OSError:
        import shutil
        shutil.copy2(src, dst)


def read_checkpoint(path: str) -> dict:
    """Read the pickled checkpoint envelope once. The 'state' entry stays raw
    msgpack bytes — no tensor restore happens here."""
    with open(path, 'rb') as f:
        return pickle.loads(f.read())


def restore_state(blob: dict, state_template):
    return serialization.from_bytes(state_template, blob['state']), blob['aux']


def load_state(path: str, state_template):
    return restore_state(read_checkpoint(path), state_template)


def state_keys(blob: dict) -> set:
    """Top-level field names of the msgpack payload WITHOUT needing a
    template — lets callers sniff the checkpoint format (full TrainState has
    'opt_state'/'step'; a plain variables export has only
    'params'/'batch_stats') instead of try/except-probing with the wrong
    template, which turned corrupt checkpoints into confusing structure
    errors. Values are skipped, not restored: sniffing a multi-GB checkpoint
    costs only the map-header walk."""
    import io

    import msgpack
    state = blob.get('state') if isinstance(blob, dict) else None
    if not isinstance(state, (bytes, bytearray)):
        # not the lc_tpu envelope at all (foreign pickle): no keys — callers
        # report "unrecognized checkpoint payload" instead of a bare KeyError
        return set()
    up = msgpack.Unpacker(io.BytesIO(state), raw=True,
                          max_buffer_size=0)
    try:
        n = up.read_map_header()
    except Exception:  # noqa: BLE001 — not a map / truncated payload
        return set()
    keys = set()
    try:
        for _ in range(n):
            k = up.unpack()
            keys.add(k.decode() if isinstance(k, bytes) else str(k))
            up.skip()
    except Exception:  # noqa: BLE001 — truncated payload: report what parsed
        pass
    return keys
