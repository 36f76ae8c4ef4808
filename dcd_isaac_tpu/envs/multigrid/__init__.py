from .core import (
    MultiGridParams, MultiGridState, encode_grid, decode_grid, gen_obs,
    step_agent, reset_agent, init_state, empty_grid, compute_metrics,
    shortest_path,
)
from .adversarial import AdversarialMultiGrid, EDITOR_ACTION_SPACES
