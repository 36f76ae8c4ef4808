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

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ortho, xavier_uniform, zeros
from .distributions import (
    beta_entropy, beta_log_prob, beta_mode, beta_sample,
)

relu_gain = jnp.sqrt(2)


class CarRacingNetwork(nn.Module):
    """Student CNN + Beta policy (car_racing_models.py:18-165)."""
    action_dim: int = 3
    hidden_size: int = 100
    crop: bool = False
    # action bounds: steer [-1, 1], gas [0, 1], brake [0, 1]
    action_low: Tuple[float, ...] = (-1.0, 0.0, 0.0)
    action_high: Tuple[float, ...] = (1.0, 1.0, 1.0)

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
            kernel_init=xavier_uniform(),
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
            self.hidden_size, kernel_init=ortho(relu_gain), bias_init=zeros)
        self.fc_alpha = nn.Dense(
            self.action_dim, kernel_init=ortho(relu_gain), bias_init=zeros)
        self.fc_beta = nn.Dense(
            self.action_dim, kernel_init=ortho(relu_gain), bias_init=zeros)
        self.critic_fc = nn.Dense(
            self.hidden_size, kernel_init=ortho(relu_gain), bias_init=zeros)
        self.critic_head = nn.Dense(
            1, kernel_init=ortho(1.0), bias_init=zeros, name='critic_head')

    def _embed(self, obs):
        x = obs  # already float32 in [-1, 1] (wrapper preprocessing)
        for c in self.convs:
            x = nn.relu(c(x))
        return x.reshape(*x.shape[:-3], -1)

    def __call__(self, obs, carry, mask):
        x = self._embed(obs)
        ha = nn.relu(self.actor_fc(x))
        alpha = 1.0 + nn.softplus(self.fc_alpha(ha))
        beta = 1.0 + nn.softplus(self.fc_beta(ha))
        hc = nn.relu(self.critic_fc(x))
        value = self.critic_head(hc).squeeze(-1)
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


class CarRacingAdversaryNetwork(nn.Module):
    """Sketch teacher (car_racing_models.py:168-530), Beta variant."""
    action_dim: int = 3           # x, y, skip
    time_step_dim: int = 13       # adversary_max_steps + 1
    random_z_dim: int = 4
    scalar_fc: int = 8

    dist_type = 'beta'
    recurrent_arch = None

    @property
    def is_recurrent(self):
        return False

    def initial_carry(self, batch_dims):
        return ()

    def setup(self):
        self.conv1 = nn.Conv(8, (2, 2), padding='VALID',
                             kernel_init=xavier_uniform(), bias_init=zeros)
        self.conv2 = nn.Conv(16, (2, 2), padding='VALID',
                             kernel_init=xavier_uniform(), bias_init=zeros)
        self.ts_embedding = nn.Dense(self.scalar_fc)
        self.fc_alpha = nn.Dense(
            self.action_dim, kernel_init=ortho(relu_gain), bias_init=zeros)
        self.fc_beta = nn.Dense(
            self.action_dim, kernel_init=ortho(relu_gain), bias_init=zeros)
        self.critic_head = nn.Dense(
            1, kernel_init=ortho(1.0), bias_init=zeros, name='critic_head')

    def _embed(self, obs):
        x = self.conv2(self.conv1(obs['image']))
        x = nn.relu(x.reshape(*x.shape[:-3], -1))
        ts = jax.nn.one_hot(
            obs['time_step'].astype(jnp.int32), self.time_step_dim)
        return jnp.concatenate(
            [x, self.ts_embedding(ts), obs['random_z']], axis=-1)

    def __call__(self, obs, carry, mask):
        x = self._embed(obs)
        alpha = 1.0 + nn.softplus(self.fc_alpha(x))
        beta = 1.0 + nn.softplus(self.fc_beta(x))
        value = self.critic_head(x).squeeze(-1)
        return {'alpha': alpha, 'beta': beta}, value, carry

    def sequence(self, obs, carry, masks):
        return self(obs, carry, masks)

    def sample_action(self, rng, out):
        u = beta_sample(rng, out['alpha'], out['beta'])
        lp = beta_log_prob(out['alpha'], out['beta'], u)
        return u, lp

    def log_prob_entropy(self, out, actions):
        lp = beta_log_prob(out['alpha'], out['beta'], actions)
        ent = beta_entropy(out['alpha'], out['beta']).mean()
        return lp, ent


def make_carracing_model(args, env, agent_type: str):
    if agent_type == 'adversary_env':
        return CarRacingAdversaryNetwork(
            time_step_dim=env.adversary_rollout_steps + 1,
            random_z_dim=env.adversary_obs_shapes['random_z'][0])
    return CarRacingNetwork(crop=args.crop_frame)
