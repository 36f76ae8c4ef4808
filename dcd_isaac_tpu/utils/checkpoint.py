"""Atomic checkpointing of the full runner state.

Reference semantics (util/__init__.py:59-69 + adversarial_runner
state_dict): single-writer tmp-then-replace atomic writes, `_index` archive
copies, and the curriculum state (PLR buffers) saved alongside model/optimizer
state so training is fully resumable.

Serialization is flax msgpack over the RunnerState pytree (device arrays are
pulled to host once per checkpoint).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, runner_state: Any, host_state: dict):
    """Atomic write of (pytree bytes, host counters)."""
    state = jax.device_get(runner_state)
    payload = {
        'pytree': serialization.to_bytes(state),
        'host': host_state,
    }
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any):
    """Restore into the structure of ``template`` → (runner_state, host)."""
    with open(path, 'rb') as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(template, payload['pytree'])
    return state, payload['host']


def load_agent_finetune(path: str, agent_template: Any):
    """Extract ONLY the student agent train state from a checkpoint.

    Fine-tuning init (reference train.py:112-141): loads the base run's
    agent model + optimizer, leaving everything else (teacher, PLR buffers,
    counters) fresh — so the base run's config need not match the new one.
    """
    with open(path, 'rb') as f:
        payload = pickle.load(f)
    raw = serialization.msgpack_restore(payload['pytree'])
    return serialization.from_state_dict(agent_template, raw['agent'])


def archive_path(base_path: str, index: int) -> str:
    root, ext = os.path.splitext(base_path)
    return f'{root}_{index}{ext}'
