from .ranger import ranger
from .schedule import flat_and_anneal_schedule
from .factory import build_optimizer
