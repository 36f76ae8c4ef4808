"""CarRacing actor-critic networks (flax).

Parity with reference models/car_racing_models.py: student = 6-layer conv
stack on stacked 96×96 (or cropped 84×84) frames → 100-d fc → Beta(α, β)
policy per action dim with α,β = 1 + softplus(fc) (:18-165);
teacher = conv embed of the 10×10 sketch + time-step embedding + random_z →
Beta(x, y, skip) heads (+ optional PopArt critic) (:168-530).

``process_action`` maps Beta samples in [0,1] to the env action bounds
(steer ∈ [-1,1], gas/brake ∈ [0,1]) — folded into sample_action here.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .common import ortho, xavier_uniform, zeros
from .distributions import (
    beta_entropy, beta_log_prob, beta_mode, beta_sample,
)

relu_gain = float(np.sqrt(2))


class CarRacingNetwork(nn.Module):
    """Student CNN + Beta policy (car_racing_models.py:18-165)."""
    action_dim: int = 3
    hidden_size: int = 100
    crop: bool = False
    # action bounds: steer [-1, 1], gas [0, 1], brake [0, 1]
    action_low: Tuple[float, ...] = (-1.0, 0.0, 0.0)
    action_high: Tuple[float, ...] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32    # compute dtype (--bf16); params stay f32

    dist_type = 'beta'
    recurrent_arch = None

    @property
    def is_recurrent(self):
        return False

    def initial_carry(self, batch_dims):
        return ()

    def setup(self):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding='VALID',
            kernel_init=xavier_uniform(), dtype=self.dtype,
            bias_init=nn.initializers.constant(0.1), name=name)
        if self.crop:
            specs = [(8, 2, 2), (16, 2, 2), (32, 2, 2), (64, 2, 2),
                     (128, 3, 1), (256, 3, 1)]
        else:
            specs = [(8, 4, 2), (16, 3, 2), (32, 3, 2), (64, 3, 2),
                     (128, 3, 1), (256, 3, 1)]
        self.convs = [conv(f, k, s, f'conv{i}')
                      for i, (f, k, s) in enumerate(specs)]
        self.actor_fc = nn.Dense(
            self.hidden_size, kernel_init=ortho(relu_gain), bias_init=zeros,
            dtype=self.dtype)
        self.fc_alpha = nn.Dense(
            self.action_dim, kernel_init=ortho(relu_gain), bias_init=zeros,
            dtype=self.dtype)
        self.fc_beta = nn.Dense(
            self.action_dim, kernel_init=ortho(relu_gain), bias_init=zeros,
            dtype=self.dtype)
        self.critic_fc = nn.Dense(
            self.hidden_size, kernel_init=ortho(relu_gain), bias_init=zeros,
            dtype=self.dtype)
        self.critic_head = nn.Dense(
            1, kernel_init=ortho(1.0), bias_init=zeros, dtype=self.dtype,
            name='critic_head')

    def _embed(self, obs):
        x = obs.astype(self.dtype)  # in [-1, 1] (wrapper preprocessing)
        for c in self.convs:
            x = nn.relu(c(x))
        return x.reshape(*x.shape[:-3], -1)

    def __call__(self, obs, carry, mask):
        x = self._embed(obs)
        ha = nn.relu(self.actor_fc(x))
        # Beta params and value in float32 (sampling/losses full-precision)
        alpha = 1.0 + nn.softplus(
            self.fc_alpha(ha).astype(jnp.float32))
        beta = 1.0 + nn.softplus(self.fc_beta(ha).astype(jnp.float32))
        hc = nn.relu(self.critic_fc(x))
        value = self.critic_head(hc).squeeze(-1).astype(jnp.float32)
        return {'alpha': alpha, 'beta': beta}, value, carry

    def sequence(self, obs, carry, masks):
        return self(obs, carry, masks)

    # --- distribution protocol ------------------------------------------
    def sample_action(self, rng, out):
        u = beta_sample(rng, out['alpha'], out['beta'])
        lp = beta_log_prob(out['alpha'], out['beta'], u)
        low = jnp.asarray(self.action_low)
        high = jnp.asarray(self.action_high)
        # store the scaled action; log-prob refers to the raw Beta sample
        return u * (high - low) + low, lp

    def _unscale(self, actions):
        low = jnp.asarray(self.action_low)
        high = jnp.asarray(self.action_high)
        return (actions - low) / (high - low)

    def log_prob_entropy(self, out, actions):
        u = self._unscale(actions)
        lp = beta_log_prob(out['alpha'], out['beta'], u)
        ent = beta_entropy(out['alpha'], out['beta']).mean()
        return lp, ent

    def deterministic_action(self, out):
        u = beta_mode(out['alpha'], out['beta'])
        low = jnp.asarray(self.action_low)
        high = jnp.asarray(self.action_high)
        return u * (high - low) + low


class CarRacingAdversaryNetwork(nn.Module):
    """Sketch teacher (car_racing_models.py:168-530).

    Variants: Beta(x, y, skip) heads (default) or a masked Categorical over
    the 10×10 sketch grid + skip (use_categorical, :288-296, :406-424);
    sparse-reward mode adds a goal-bin obs embedding and a Categorical
    goal-bin head used on the final design step (:263-276, :397-404).

    Action layout (stored): (x, y, skip) ∈ [0,1]^3, plus a trailing
    goal-bin slot in sparse mode.  The categorical variant stores the
    processed grid coordinates; the flat action index is reconstructed
    exactly in log_prob_entropy (grid snapping is lossless).
    """
    action_dim: int = 3           # x, y, skip
    time_step_dim: int = 13       # adversary_max_steps + 1
    random_z_dim: int = 4
    scalar_fc: int = 8
    sketch_dim: int = 10
    use_categorical: bool = False
    use_skip: bool = False
    use_goal: bool = False        # sparse_rewards
    num_goal_bins: int = 24
    set_start_pos: bool = False
    n_control_points: int = 12

    dist_type = 'beta'
    recurrent_arch = None

    @property
    def is_recurrent(self):
        return False

    @property
    def num_cells(self):
        return self.sketch_dim * self.sketch_dim

    def initial_carry(self, batch_dims):
        return ()

    def setup(self):
        self.conv1 = nn.Conv(8, (2, 2), padding='VALID',
                             kernel_init=xavier_uniform(), bias_init=zeros)
        self.conv2 = nn.Conv(16, (2, 2), padding='VALID',
                             kernel_init=xavier_uniform(), bias_init=zeros)
        self.ts_embedding = nn.Dense(self.scalar_fc)
        if self.use_categorical:
            self.actor_fc = nn.Dense(
                256, kernel_init=ortho(relu_gain), bias_init=zeros)
            self.actor_head = nn.Dense(
                self.num_cells + 1, kernel_init=ortho(1.0), bias_init=zeros)
        else:
            self.fc_alpha = nn.Dense(
                self.action_dim, kernel_init=ortho(relu_gain),
                bias_init=zeros)
            self.fc_beta = nn.Dense(
                self.action_dim, kernel_init=ortho(relu_gain),
                bias_init=zeros)
        if self.use_goal:
            self.goal_embedding = nn.Dense(self.scalar_fc)
            self.goal_fc = nn.Dense(
                256, kernel_init=ortho(relu_gain), bias_init=zeros)
            self.goal_head = nn.Dense(
                self.num_goal_bins, kernel_init=ortho(1.0), bias_init=zeros)
        self.critic_head = nn.Dense(
            1, kernel_init=ortho(1.0), bias_init=zeros, name='critic_head')

    def _embed(self, obs):
        x = self.conv2(self.conv1(obs['image']))
        x = nn.relu(x.reshape(*x.shape[:-3], -1))
        ts = jax.nn.one_hot(
            obs['time_step'].astype(jnp.int32), self.time_step_dim)
        parts = [x, self.ts_embedding(ts), obs['random_z']]
        if self.use_goal:
            gb = jax.nn.one_hot(
                obs['goal_bin'].astype(jnp.int32), self.num_goal_bins + 1)
            parts.append(self.goal_embedding(gb))
        return jnp.concatenate(parts, axis=-1)

    def _sketch_logits_mask(self, obs):
        """Invalid-action mask: occupied cells + conditional skip
        (reference _sketch_to_mask + act(), :326-332, :406-424).
        True = masked out."""
        sketch = obs['image'][..., 0]
        occupied = sketch.reshape(*sketch.shape[:-2], -1) > 0.5
        n_placed = occupied.sum(-1)
        t = obs['time_step'].astype(jnp.int32)
        if not self.use_skip:
            no_skip = jnp.ones_like(n_placed, bool)
        else:
            no_skip = n_placed < 3
            if self.set_start_pos:
                no_skip = no_skip | (t == self.n_control_points)
        return jnp.concatenate(
            [no_skip[..., None], occupied], axis=-1)

    def _is_goal_step(self, obs):
        t = obs['time_step'].astype(jnp.int32)
        return t == self.time_step_dim - 2  # last design step

    def __call__(self, obs, carry, mask):
        x = self._embed(obs)
        out = {}
        if self.use_categorical:
            logits = self.actor_head(nn.relu(self.actor_fc(x)))
            amask = self._sketch_logits_mask(obs)
            out['logits'] = jnp.where(
                amask, jnp.finfo(logits.dtype).min, logits)
        else:
            out['alpha'] = 1.0 + nn.softplus(self.fc_alpha(x))
            out['beta'] = 1.0 + nn.softplus(self.fc_beta(x))
        if self.use_goal:
            out['goal_logits'] = self.goal_head(nn.relu(self.goal_fc(x)))
            out['is_goal_step'] = self._is_goal_step(obs)
        value = self.critic_head(x).squeeze(-1)
        return out, value, carry

    def sequence(self, obs, carry, masks):
        return self(obs, carry, masks)

    def _cells_to_xys(self, a):
        """Flat index (0 = skip, 1.. = cell) → processed (x, y, skip)
        (reference process_action, :305-316)."""
        d = self.sketch_dim
        x = ((a - 1) % d).astype(jnp.float32) / d
        y = ((a - 1) // d).astype(jnp.float32) / d
        skip = (a == 0).astype(jnp.float32)
        return jnp.stack([x, y, skip], axis=-1)

    def _xys_to_cells(self, actions):
        d = self.sketch_dim
        cell_x = jnp.round(actions[..., 0] * d).astype(jnp.int32)
        cell_y = jnp.round(actions[..., 1] * d).astype(jnp.int32)
        skip = actions[..., 2] > 0.5
        return jnp.where(skip, 0, 1 + cell_y * d + cell_x)

    def sample_action(self, rng, out):
        r_base, r_goal = jax.random.split(rng)
        if self.use_categorical:
            logd = jax.nn.log_softmax(out['logits'], axis=-1)
            a = jax.random.categorical(r_base, out['logits'], axis=-1)
            lp = jnp.take_along_axis(logd, a[..., None], -1).squeeze(-1)
            base = self._cells_to_xys(a)
        else:
            u = beta_sample(r_base, out['alpha'], out['beta'])
            lp = beta_log_prob(out['alpha'], out['beta'], u)
            base = u
        if not self.use_goal:
            return base, lp
        g_logd = jax.nn.log_softmax(out['goal_logits'], axis=-1)
        g = jax.random.categorical(r_goal, out['goal_logits'], axis=-1)
        g_lp = jnp.take_along_axis(g_logd, g[..., None], -1).squeeze(-1)
        action = jnp.concatenate(
            [base, g.astype(jnp.float32)[..., None]], axis=-1)
        return action, jnp.where(out['is_goal_step'], g_lp, lp)

    def random_action(self, rng, out):
        """Uniform design policy (act_random, :346-384): uniform [0,1]
        Beta samples / uniform non-skip cells, random goal bins."""
        r_base, r_goal = jax.random.split(rng)
        if self.use_categorical:
            shape = out['logits'].shape[:-1]
            a = jax.random.randint(
                r_base, shape, 1, self.num_cells + 1)
            base = self._cells_to_xys(a)
        else:
            base = jax.random.uniform(
                r_base, out['alpha'].shape)
        if not self.use_goal:
            return base
        g = jax.random.randint(
            r_goal, base.shape[:-1], 0, self.num_goal_bins)
        return jnp.concatenate(
            [base, g.astype(jnp.float32)[..., None]], axis=-1)

    def log_prob_entropy(self, out, actions):
        if self.use_categorical:
            logd = jax.nn.log_softmax(out['logits'], axis=-1)
            a = self._xys_to_cells(actions)
            lp = jnp.take_along_axis(logd, a[..., None], -1).squeeze(-1)
            p = jnp.exp(logd)
            ent = -(p * jnp.where(jnp.isfinite(logd), logd, 0.0)).sum(-1)
        else:
            lp = beta_log_prob(out['alpha'], out['beta'], actions[..., :3])
            ent = beta_entropy(out['alpha'], out['beta'])
        if not self.use_goal:
            return lp, ent.mean()
        g_logd = jax.nn.log_softmax(out['goal_logits'], axis=-1)
        g = jnp.round(actions[..., -1]).astype(jnp.int32)
        g_lp = jnp.take_along_axis(g_logd, g[..., None], -1).squeeze(-1)
        g_p = jnp.exp(g_logd)
        g_ent = -(g_p * g_logd).sum(-1)
        is_goal = out['is_goal_step']
        lp = jnp.where(is_goal, g_lp, lp)
        ent = jnp.where(is_goal, g_ent, ent)
        return lp, ent.mean()


def make_carracing_model(args, env, agent_type: str):
    if agent_type == 'adversary_env':
        sparse = getattr(args, 'sparse_rewards', False)
        return CarRacingAdversaryNetwork(
            action_dim=3,
            time_step_dim=env.adversary_rollout_steps + 1,
            random_z_dim=env.adversary_obs_shapes['random_z'][0],
            use_categorical=args.use_categorical_adv,
            use_skip=args.use_skip,
            use_goal=sparse,
            num_goal_bins=getattr(args, 'num_goal_bins', 24),
            set_start_pos=args.choose_start_pos,
            n_control_points=args.num_control_points)
    from ..utils.make_agent import resolve_bf16
    dtype = jnp.bfloat16 if resolve_bf16(args) else jnp.float32
    return CarRacingNetwork(crop=args.crop_frame, dtype=dtype)
