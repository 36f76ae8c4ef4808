"""Policy distributions as pure-jnp helpers.

Replaces reference models/distributions.py (FixedCategorical) and the
torch.distributions usage in walker/car-racing models with stateless
log-prob/entropy/sample math over raw parameter arrays — everything stays
traceable and fuses into the surrounding computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------- Categorical -----------------------------------

def categorical_sample(rng, logits):
    return jax.random.categorical(rng, logits, axis=-1)


def categorical_log_prob(logits, actions):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(
        logp, actions[..., None].astype(jnp.int32), axis=-1
    ).squeeze(-1)


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_mode(logits):
    return jnp.argmax(logits, axis=-1)


# --------------------------- Diagonal Gaussian ------------------------------

def normal_sample(rng, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(rng, mean.shape)


def normal_log_prob(mean, log_std, actions):
    var = jnp.exp(2 * log_std)
    lp = -((actions - mean) ** 2) / (2 * var) - log_std - 0.5 * jnp.log(2 * jnp.pi)
    return lp.sum(-1)


def normal_entropy(log_std):
    ent = log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)
    return ent.sum(-1)


# --------------------------- Beta -------------------------------------------

def beta_sample(rng, alpha, beta):
    r1, r2 = jax.random.split(rng)
    ga = jax.random.gamma(r1, alpha)
    gb = jax.random.gamma(r2, beta)
    return ga / (ga + gb)


def beta_log_prob(alpha, beta, actions):
    x = jnp.clip(actions, 1e-6, 1 - 1e-6)
    log_b = (
        jax.scipy.special.gammaln(alpha)
        + jax.scipy.special.gammaln(beta)
        - jax.scipy.special.gammaln(alpha + beta)
    )
    lp = (alpha - 1) * jnp.log(x) + (beta - 1) * jnp.log1p(-x) - log_b
    return lp.sum(-1)


def beta_entropy(alpha, beta):
    from jax.scipy.special import digamma, gammaln
    log_b = gammaln(alpha) + gammaln(beta) - gammaln(alpha + beta)
    ent = (
        log_b
        - (alpha - 1) * digamma(alpha)
        - (beta - 1) * digamma(beta)
        + (alpha + beta - 2) * digamma(alpha + beta)
    )
    return ent.sum(-1)


def beta_mode(alpha, beta):
    return jnp.where(
        (alpha > 1) & (beta > 1),
        (alpha - 1) / (alpha + beta - 2),
        jnp.where(alpha > beta, 1.0, jnp.where(beta > alpha, 0.0, 0.5)),
    )
