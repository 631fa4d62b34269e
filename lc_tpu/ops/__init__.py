from .smallmat import rot_pts, matvec3, mm_small, outer_accum_6, weighted_jtr_6
