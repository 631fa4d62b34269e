"""All five experiment configs parse and wire into models/losses/optimizers
(data paths aren't present in this image, so dataset construction is excluded)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu import harness
from lc_tpu.optim.factory import build_optimizer
from lc_tpu.utils.config import load_config

CONFIGS = ['configs/glmo.yaml', 'configs/gycbv.yaml', 'configs/gsplmo.yaml',
           'configs/zlmo.yaml', 'configs/zycbv.yaml',
           # synthetic-demo configs (same schema, synthetic data roots)
           'configs/syn.yaml', 'configs/zsyn.yaml', 'configs/gspsyn.yaml']


@pytest.mark.parametrize('path', CONFIGS)
def test_config_wires(path):
    cfg = load_config(path)
    # bit counts come from the dataset normally; emulate the zebra case
    bit_cnt = (7, 7, 7) if cfg.get('max_bit_cnt', 0) > 0 else None
    total_bits = sum(bit_cnt) if bit_cnt else 0
    model = harness.build_model_from_cfg(cfg, total_bits)
    loss_cfg = harness.make_loss_config(cfg, steps_per_epoch=1000,
                                        bit_cnt=bit_cnt)
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, total_iters=10000)

    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)

    if cfg.get('sparse_cnt', 0) > 3:
        assert 'pts2d' in out and loss_cfg.sparse
        assert out['pts2d'].shape[1] == cfg.sparse_cnt
    elif bit_cnt:
        assert out['xyz_noc_bin'].shape[-1] == total_bits
        assert loss_cfg.bit_cnt == bit_cnt
        assert loss_cfg.black_background == cfg.get('black_background', False)
    else:
        assert out['xyz_noc'].shape[-1] == 3

    params = variables['params']
    opt_state = tx.init(params)
    assert opt_state is not None

    # the weighted sums the trainer consumes
    weights = [k for k in ('w_loss_noc', 'w_loss_noc_bin', 'w_loss_seg',
                           'w_loss_pose', 'w_loss_kpts') if cfg.loss.get(k, 0)]
    assert weights, 'config defines no active loss terms'


def test_opts_override():
    cfg = load_config('configs/glmo.yaml',
                      ['train.num_epochs=2', 'optimizer.lr=0.001'])
    assert cfg.train.num_epochs == 2
    assert cfg.optimizer.lr == 0.001


def test_opts_value_forms():
    """mmcv DictAction accepts bare-comma lists AND bracketed literals; the
    bracketed form must parse whole (a bare comma split shredded '[64,64]')."""
    from lc_tpu.utils.config import parse_opts
    out = parse_opts(['a=[64,64]', 'b=1,2', 'c=x,y', "d=['p.txt']",
                      'e=(3,4)', 'f=true', 'g=0.5'])
    assert out['a'] == [64, 64]
    assert out['b'] == [1, 2]
    assert out['c'] == ['x', 'y']
    assert out['d'] == ['p.txt']
    assert out['e'] == [3, 4]
    assert out['f'] is True
    assert out['g'] == 0.5
    # a malformed bracketed literal (shell typo) must be rejected, not
    # silently shredded by the comma fallback into ['[64', '64']
    import pytest
    with pytest.raises(ValueError, match='malformed bracketed'):
        parse_opts(['a=[64,64'])
