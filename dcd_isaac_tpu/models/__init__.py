from .common import RNNCore, mlp
from .multigrid_models import MultigridNetwork
from . import distributions, popart
