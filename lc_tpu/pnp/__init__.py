from .residual import residual_with_jac6d, reproj_cost
from .solver import lm_refine, lm_refine_auto, LMResult
from .ransac import ransac_pnp, dlt_pnp
from .epnp import epnp
from .covariance import weighted_pnp_jac_cov, safe_cholesky, pnp_update
