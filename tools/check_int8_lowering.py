"""Verify the int8 quantized forward actually lowers to int8 MXU convolutions.

VERDICT round 3 asked for trace/HLO-level evidence that `models/quant.py`'s
interceptor produces convolutions the TPU executes on the MXU's int8 fast
path (2x bf16 peak on v5e: 394 vs 197 TOPS) — including the `lhs_dilation`
deconvolution (quant.py `Deconv2x` branch), which is the op most at risk of
silently falling back to a wider dtype.

Method: jit + lower + compile the CDPN and Zebra int8 forwards on the real
backend and walk the optimized (post-layout, post-fusion) HLO text for
`convolution` ops, classifying each by operand dtype (s8 in / s32 out vs
bf16/f32). The optimized HLO is what the TPU executes, so an s8xs8->s32
convolution there IS the int8 MXU path — no wider-dtype fallback survives
to runtime. Prints ONE JSON line with the counts.

Reference framing: the path this replaces is the reference's f32 CUDA
forward (/root/reference/test.py:164); the reference has no int8 mode.
"""
import json
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp


def conv_dtype_counts(hlo_text):
    """Count optimized-HLO convolution ops by accumulator (output) dtype.

    The optimized TPU HLO prints operands without dtypes, so we classify by
    output dtype: XLA only emits an s32-accumulating `convolution` for
    integer (s8) operands, so `-> s32` IS the int8 MXU path. Two families of
    ops lower to `convolution`:
      - real convolutions (op_name …/conv_general_dilated) — the quantized
        nn.Conv/Deconv2x stack; all must be s32 except the bf16 S2D stem;
      - decoder upsample einsums (op_name …/dot_general) — 1x1-conv-shaped
        matmuls that were never nn.Conv applications and legitimately stay
        f32/bf16.
    `lhs_dilate=` in the window marks the transposed-conv (Deconv2x) form.
    """
    counts = {}
    dilated = {}
    for line in hlo_text.splitlines():
        if 'convolution(' not in line:
            continue
        m = re.search(r'=\s*([a-z0-9]+)\[[^\]]*\]\S*\s+convolution\(', line)
        if not m:
            continue
        out_dt = m.group(1)
        kind = 'conv' if '/conv_general_dilated' in line else (
            'einsum' if '/dot_general' in line else 'other')
        key = f'{kind}->{out_dt}'
        counts[key] = counts.get(key, 0) + 1
        if 'lhs_dilate=' in line:
            dilated[key] = dilated.get(key, 0) + 1
    return counts, dilated


def check_family(name, net_name, net_config, total_bits=0):
    from lc_tpu.models import build_model
    from lc_tpu.models.quant import quantized_int8

    kwargs = dict(net_config)
    model = build_model(net_name, kwargs, total_bit_cnt=total_bits) \
        if total_bits else build_model(net_name, kwargs)
    x = jnp.zeros((16, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def fwd(v, x):
        with quantized_int8():
            return model.apply(v, x, train=False)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    hlo = compiled.as_text()
    counts, dilated = conv_dtype_counts(hlo)
    n_int8 = counts.get('conv->s32', 0)
    n_wide = sum(v for k, v in counts.items()
                 if k.startswith('conv->') and k != 'conv->s32')
    return {'family': name, 'conv_dtypes': counts, 'dilated_conv_dtypes': dilated,
            'int8_convs': n_int8, 'non_int8_convs': n_wide}


def main():
    platform = jax.devices()[0].platform
    device_kind = jax.devices()[0].device_kind
    out = {'backend': platform, 'device': device_kind}
    fams = []
    fams.append(check_family('cdpn', 'cdpn_resnet', {'concat': False}))
    fams.append(check_family('zebra', 'zebra_DeepLabV3',
                             {'back_layers_num': 34, 'output_kernel_size': 1,
                              'concat': True}, total_bits=21))
    out['families'] = fams
    # Pass criterion: every family's real-conv stack is all-int8 except the
    # bf16 S2D stem (1 conv), at least one int8 conv carries lhs_dilation
    # (the Deconv2x transposed-conv path, the op most at risk of fallback),
    # and no wide convolution escaped classification: a conv whose op_name
    # metadata was rewritten/stripped by XLA shows up as 'other-><wide>' and
    # must count against the gate, not slip past it (a metadata-stripped
    # fallen-back conv would otherwise be invisible).
    for f in fams:
        f['unclassified_wide_convs'] = sum(
            v for k, v in f['conv_dtypes'].items()
            if k.startswith('other->') and not k.endswith('->s32'))
    ok = all(f['int8_convs'] >= 10 and f['non_int8_convs'] <= 1
             and f['unclassified_wide_convs'] == 0 for f in fams)
    any_dilated_s8 = any(k == 'conv->s32' for f in fams
                         for k in f['dilated_conv_dtypes'])
    out['dilated_deconv_is_int8'] = any_dilated_s8
    # The docstring's claim (optimized HLO == what the chip executes) only
    # holds when the HLO was compiled FOR a TPU; a CPU-compiled run proves
    # nothing about the MXU path and must not print ok=true.
    is_tpu = 'tpu' in f'{platform} {device_kind}'.lower()
    if not is_tpu:
        out['warning'] = (f'compiled for backend={platform!r} '
                          f'({device_kind!r}), not a TPU — the s8 lowering '
                          'claim is only evidence on TPU-compiled HLO')
    out['ok'] = bool(ok and any_dilated_s8 and is_tpu)
    print(json.dumps(out))
    return 0 if out['ok'] else 1


if __name__ == '__main__':
    sys.exit(main())
