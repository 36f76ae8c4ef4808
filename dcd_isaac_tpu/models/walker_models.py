"""BipedalWalker actor-critic networks (flax).

Parity with reference models/walker_models.py: student = MLPBase twin 64-64
tanh trunks → DiagGaussian over 4 motor torques (state-independent log-std,
zero-init); teacher = MLP on concat(level-params, random_z, time_step) →
DiagGaussian(1) whose sampled action is tanh-squashed with the log-prob
evaluated at the squashed value (walker_models.py:236-239 — reproduced
exactly, including that quirk).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import RNNCore, ortho, rnn_initial_carry, zeros
from .distributions import normal_entropy, normal_log_prob, normal_sample


class DiagGaussianHead(nn.Module):
    num_outputs: int

    @nn.compact
    def __call__(self, x):
        mean = nn.Dense(self.num_outputs, kernel_init=ortho(1.0),
                        bias_init=zeros, name='mean')(x)
        log_std = self.param('log_std', zeros, (self.num_outputs,))
        return {'mean': mean, 'log_std': jnp.broadcast_to(
            log_std, mean.shape)}


class WalkerStudentPolicy(nn.Module):
    """MLPBase + DiagGaussian (walker_models.py:113-167)."""
    action_dim: int = 4
    hidden_size: int = 64
    recurrent_arch: str = None   # optional 'gru'

    dist_type = 'normal'
    squash_tanh = False

    def setup(self):
        h = self.hidden_size
        init = ortho(jnp.sqrt(2))
        self.actor1 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.actor2 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.critic1 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.critic2 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.critic_head = nn.Dense(1, kernel_init=ortho(1.0),
                                    bias_init=zeros, name='critic_head')
        self.dist = DiagGaussianHead(self.action_dim)
        self.core = RNNCore(self.hidden_size, self.recurrent_arch or 'none')

    @property
    def is_recurrent(self):
        return self.recurrent_arch in ('lstm', 'gru')

    def initial_carry(self, batch_dims):
        return rnn_initial_carry(
            self.recurrent_arch or 'none', self.hidden_size, batch_dims)

    def _trunks(self, x, carry, mask):
        if self.is_recurrent:
            carry, x = self.core(carry, x, mask)
        ha = nn.tanh(self.actor2(nn.tanh(self.actor1(x))))
        hc = nn.tanh(self.critic2(nn.tanh(self.critic1(x))))
        return ha, hc, carry

    def __call__(self, obs, carry, mask):
        x = obs if not isinstance(obs, dict) else obs['obs']
        ha, hc, carry = self._trunks(x, carry, mask)
        value = self.critic_head(hc).squeeze(-1)
        return self.dist(ha), value, carry

    def sequence(self, obs, carry, masks):
        x = obs if not isinstance(obs, dict) else obs['obs']
        if self.is_recurrent:
            carry, x = self.core.sequence(carry, x, masks)
        ha = nn.tanh(self.actor2(nn.tanh(self.actor1(x))))
        hc = nn.tanh(self.critic2(nn.tanh(self.critic1(x))))
        value = self.critic_head(hc).squeeze(-1)
        return self.dist(ha), value, carry

    # --- distribution protocol (pure; safe unbound) --------------------
    def sample_action(self, rng, out):
        a = normal_sample(rng, out['mean'], out['log_std'])
        if self.squash_tanh:
            a = jnp.tanh(a)
        lp = normal_log_prob(out['mean'], out['log_std'], a)
        return a, lp

    def log_prob_entropy(self, out, actions):
        lp = normal_log_prob(out['mean'], out['log_std'], actions)
        ent = normal_entropy(out['log_std']).mean()
        return lp, ent

    def deterministic_action(self, out):
        return out['mean']


class WalkerAdversaryPolicy(nn.Module):
    """Teacher MLP (walker_models.py:170-256); tanh-squashed design actions."""
    design_dim: int = 8
    random_z_dim: int = 10
    action_dim: int = 1
    hidden_size: int = 64

    dist_type = 'normal'
    squash_tanh = True
    recurrent_arch = None

    def setup(self):
        h = self.hidden_size
        init = ortho(jnp.sqrt(2))
        self.actor1 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.actor2 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.critic1 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.critic2 = nn.Dense(h, kernel_init=init, bias_init=zeros)
        self.critic_head = nn.Dense(1, kernel_init=ortho(1.0),
                                    bias_init=zeros, name='critic_head')
        self.dist = DiagGaussianHead(self.action_dim)

    @property
    def is_recurrent(self):
        return False

    def initial_carry(self, batch_dims):
        return ()

    def _embed(self, obs):
        return jnp.concatenate([
            obs['image'].astype(jnp.float32),
            obs['random_z'],
            obs['time_step'].astype(jnp.float32)[..., None],
        ], axis=-1)

    def __call__(self, obs, carry, mask):
        x = self._embed(obs)
        ha = nn.tanh(self.actor2(nn.tanh(self.actor1(x))))
        hc = nn.tanh(self.critic2(nn.tanh(self.critic1(x))))
        value = self.critic_head(hc).squeeze(-1)
        return self.dist(ha), value, carry

    def sequence(self, obs, carry, masks):
        return self(obs, carry, masks)

    def sample_action(self, rng, out):
        a = jnp.tanh(normal_sample(rng, out['mean'], out['log_std']))
        # log-prob evaluated at the squashed action (reference quirk,
        # walker_models.py:236-239)
        lp = normal_log_prob(out['mean'], out['log_std'], a)
        return a, lp

    def log_prob_entropy(self, out, actions):
        lp = normal_log_prob(out['mean'], out['log_std'], actions)
        ent = normal_entropy(out['log_std']).mean()
        return lp, ent

    def deterministic_action(self, out):
        return jnp.tanh(out['mean'])


def make_walker_model(args, env, agent_type: str):
    if agent_type == 'adversary_env':
        return WalkerAdversaryPolicy(
            design_dim=env.adversary_obs_shapes['image'][0],
            random_z_dim=env.adversary_obs_shapes['random_z'][0])
    recurrent = args.recurrent_arch if args.recurrent_agent and \
        args.recurrent_arch == 'gru' else None
    return WalkerStudentPolicy(
        action_dim=4, recurrent_arch=recurrent)
