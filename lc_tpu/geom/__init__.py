from .rotations import (
    quaternion_to_matrix,
    matrix_to_quaternion,
    axis_angle_to_quaternion,
    quaternion_to_axis_angle,
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    quaternion_raw_multiply,
    quaternion_invert,
    standardize_quaternion,
    axis_angle_to_quaternion_near_zero,
    skew_symmetric,
    quaternion_apply,
    rotation_6d_to_matrix,
    matrix_to_rotation_6d,
    euler_angles_to_matrix,
    matrix_to_euler_angles,
)
from .pose import (
    pose7_to_RT,
    RT_to_pose7,
    apply_perturb,
)
from .projection import (
    project_apply,
    gen_uv,
    xyz_from_homo_z,
)
from .affine import (
    crop_affine,
    invert_affine,
    affine33,
)
from .symmetry import (
    symmetry_pose_candidates,
    select_pose_2d,
    select_pose_3d,
)
