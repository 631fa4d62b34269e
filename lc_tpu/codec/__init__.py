from .floatbits import (
    calc_bit_count,
    noc_to_bits,
    bits_to_int,
    logits_to_noc,
    logits_to_noc_with_gt,
    noc_to_nn_target,
)
