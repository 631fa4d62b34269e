from .cov_mixed import (
    twice_huber,
    clamp_error,
    robust_weights_cov,
    jac_update_to_alter,
    transformed_cov_from_jac,
    xform_3d,
    xform_2d,
    loss_cov_mixed,
)
from .clip import grad_tap, ClipperState, update_clipper_state, init_clipper_state
from .surrogate import (
    xyz_bin_loss,
    init_bin_histogram,
    seg_bce_loss,
    seg_l1_loss,
    sparse_kpt_nll_loss,
)
from .loss_fn import (LossConfig, LossState, compute_losses, init_loss_state,
                      finalize_loss_state, zero_taps)
from .targets import (nn_out_to_xyz, xyz_to_nn_target, select_best_pose,
                      annots_on_the_fly)
