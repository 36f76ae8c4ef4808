from .storage import (
    Rollout, compute_gae, compute_discounted_returns, batched_value_loss,
)
from .ppo import PPOConfig, AgentTrainState, make_ppo_update, init_agent_state
from .rollout import (
    RolloutConfig, StepCarry, make_student_rollout, make_adversary_rollout,
    initial_step_carry,
)
